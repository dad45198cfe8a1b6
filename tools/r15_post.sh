#!/usr/bin/env bash
# Dev-only round-15 post-chain analysis: gate + fit + A/B summary.
set -uo pipefail
cd "$(dirname "$0")/.."
echo "== sf10->sf30 gate (mult 3, tolerance 0.2) =="
python3 tools/scale_curve.py bench_sf10_r15.json bench_sf30_r15.json 3 0.2 \
  | tail -30 || true
echo
echo "== jaccard affine fit over the isolated rungs =="
python3 tools/linear_fit.py q_dedup_jaccard -- \
  bench_sf1_jacc_r15.json bench_sf3_jacc_r15.json \
  bench_sf10_jacc_r15.json bench_sf30_jacc_r15.json || true
echo
echo "== A/B + leg summary =="
python3 - <<'EOF'
import json
def q(f, name="q_dedup_jaccard"):
    try:
        d = json.load(open(f)); m = d.get("_meta", {})
        r = d.get(name, {})
        return (r.get("min_s"), r.get("median_s"), r.get("shuffle_write_mb"),
                r.get("spill_mb"), m.get("probe_floor_ms"), m.get("steal_probes"),
                m.get("mem_probe_ms"), m.get("total_min_s"))
    except Exception as e:
        return ("ERR", e)
for f in ["bench_sf30_jaccOld_r15.json", "bench_sf30_jacc_r15.json",
          "bench_sf1_jacc_r15.json", "bench_sf3_jacc_r15.json",
          "bench_sf10_jacc_r15.json", "bench_sf10_r15.json", "bench_sf30_r15.json"]:
    print(f, q(f))
EOF
