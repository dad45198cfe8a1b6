#!/usr/bin/env bash
# Dev-only round-16 leg chain, part 2 (after the resample root-cause
# rework). The part-1 legs bench_sf{10,30}_resample_r16.json measured
# the r15-shipped form (serial grid explode + counted sort width) and
# stay committed as the A side; these legs are the B side (parallel
# explode, default sort width) plus the deferred sf50 probe and the
# full-sweep gate pair.
set -uo pipefail
cd "$(dirname "$0")/.."
run() { # side sfdir only attempts extra_env...
  local side=$1 sfdir=$2 only=$3 attempts=$4; shift 4
  local extra=("$@")
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  echo "=== $(date +%H:%M:%S) leg $side start" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS="$attempts" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" "${extra[@]}" \
    SPARK_DRIVER_MEM=8g tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}
# 1. resample B-side rungs (parallel explode; isolated; attempts=3)
run bench_sf10_resampleB_r16.json /tmp/graft_sf10 q_resample_ffill 3
run bench_sf30_resampleB_r16.json /tmp/graft_sf30 q_resample_ffill 3
# 2. sf50 subset probe (fourth decade + live demotion; attempts=2)
run bench_sf50_subset_r16.json /tmp/graft_sf50 \
  "q_dedup_jaccard,q_dedup_minhash,q_dedup_cluster,q_dedup_exact_fp,q_text_tokens,q_text_quality,q_text_fingerprint,q_corpus_pack,vendas_mart,q_resample_ffill" 2
# 3. matched full-sweep gate pair (attempts=2)
run bench_sf10_r16.json /tmp/graft_sf10 "" 2
run bench_sf30_r16.json /tmp/graft_sf30 "" 2
echo "=== $(date +%H:%M:%S) chain2 done" >&2
