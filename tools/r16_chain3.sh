#!/usr/bin/env bash
# Dev-only round-16 leg chain, part 3: sf50 re-runs with the counted
# verify-build width live (the shjfail leg is the committed A side).
# Isolated jaccard first (clean number for the sf10/sf30/sf50 fit),
# then the full subset for the family record, then an isolated sf50
# resample rung (the subset's resample ran under index-cache pressure;
# the isolated rung is the like-for-like fit point vs sf10/sf30).
set -uo pipefail
cd "$(dirname "$0")/.."
run() { # side sfdir only attempts
  local side=$1 sfdir=$2 only=$3 attempts=$4
  local extra=()
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  echo "=== $(date +%H:%M:%S) leg $side start" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS="$attempts" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" "${extra[@]}" \
    SPARK_DRIVER_MEM=8g tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}
run bench_sf50_jacc_r16.json /tmp/graft_sf50 q_dedup_jaccard 3
run bench_sf50_subset_r16.json /tmp/graft_sf50 \
  "q_dedup_jaccard,q_dedup_minhash,q_dedup_cluster,q_dedup_exact_fp,q_text_tokens,q_text_quality,q_text_fingerprint,q_corpus_pack,vendas_mart,q_resample_ffill" 2
run bench_sf50_resample_r16.json /tmp/graft_sf50 q_resample_ffill 3
echo "=== $(date +%H:%M:%S) chain3 done" >&2
