#!/usr/bin/env bash
# Dev-only round-17 leg chain (VERDICT r16 items 1-4, 6):
#   1. sf50 same-night A/B of the residency-priority lever
#      (spark.graft.index.residencyPriority off = r16 build-order
#      demotion, on = bytes-per-consumer-read demotion) on the
#      jaccard + exact_fp subset — the two queries that read the
#      frames the ladder decides about.
#   2. sf30 full sweep (round record; the exact_fp eviction check
#      rides here).
#   3. sf10 full sweep (the clean gate-pair rung).
#   4. sf20 probe for the clean-pair 3x-line crossers — converts the
#      two-point night ratios into three-point affine fits.
#   5. sf100 subset promoted to include the three most expensive
#      plans (bucketed mart, jaccard, resample) under the multi-frame
#      demotion regime.
#   6. streaming throughput refresh at sf1 (raw leg lines; assembled
#      into bench_streaming_r17.json afterwards).
# NOTHING recompiles while this chain runs.
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # side sfdir only attempts extra_conf
  local side=$1 sfdir=$2 only=$3 attempts=$4 conf=${5:-}
  local extra=()
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  [ -n "$conf" ] && extra+=("SPARK_GRAFT_CONF=$conf")
  echo "=== $(date +%H:%M:%S) leg $side start" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS="$attempts" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" "${extra[@]}" \
    SPARK_DRIVER_MEM=8g tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}

# --- 1. the lever A/B (same night, A then B, identical subset) -----
AB_SUBSET="q_dedup_jaccard,q_dedup_exact_fp"
run bench_sf50_residencyAB_buildorder_r17.json /tmp/graft_sf50 "$AB_SUBSET" 3 \
  "spark.graft.index.residencyPriority=off"
run bench_sf50_residencyAB_priority_r17.json /tmp/graft_sf50 "$AB_SUBSET" 3 \
  "spark.graft.index.residencyPriority=on"

# --- 2. sf30 full sweep --------------------------------------------
run bench_sf30_r17.json /tmp/graft_sf30 "" 2

# --- 3. sf10 full sweep --------------------------------------------
run bench_sf10_r17.json /tmp/graft_sf10 "" 2

# --- 4. sf20 probe rung (generate corpus if absent) ----------------
if [ ! -d /tmp/graft_sf20 ]; then
  echo "=== $(date +%H:%M:%S) generating /tmp/graft_sf20 (mult 200)" >&2
  python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf20 200 \
    > /tmp/gen_sf20.log 2>&1 || { echo "sf20 gen FAILED" >&2; }
fi
if [ -d /tmp/graft_sf20 ]; then
  run bench_sf20_probe_r17.json /tmp/graft_sf20 \
    "q_join_inner,q_sim_topk,q_sim_ivf_topk,q_approx_stats,q_join_left_fill,vendas_mart" 2
fi

# --- 5. sf100 subset, promoted -------------------------------------
df -m /tmp >&2
run bench_sf100_subset_r17.json /tmp/graft_sf100 \
  "q_corpus_pack,q_dedup_cluster,q_dedup_exact_fp,q_dedup_minhash,q_text_fingerprint,q_text_quality,q_text_tokens,q_vendas_mart_bucketed,q_dedup_jaccard,q_resample_ffill" 2

# --- 6. streaming refresh at sf1 -----------------------------------
echo "=== $(date +%H:%M:%S) streaming leg start" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BATCH_SF_DIR=/root/testdata/sf0.1 \
  SPARK_DRIVER_MEM=8g tools/run_bench.sh graft.tools.StreamingBench \
  > /tmp/leg_streaming_r17.log 2>&1
echo "=== $(date +%H:%M:%S) streaming leg exit $?" >&2

echo "=== $(date +%H:%M:%S) r17 chain done" >&2
