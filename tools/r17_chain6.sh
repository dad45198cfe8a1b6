#!/usr/bin/env bash
# Dev-only round-17 leg chain, part 6: sf100 subset RETAKE (the first
# attempt hit disk-full during the bucketed-silver sort-write — a
# 13 GB orphaned blockmgr dir from an intentionally-killed chain-4 leg
# had eaten the headroom; freed before this run), then a clean-window
# retake of the shipped-defaults sf30 tier confirm leg.
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

df -m /tmp >&2
run bench_sf100_subset_r17.json /tmp/graft_sf100 \
  "q_corpus_pack,q_dedup_cluster,q_dedup_exact_fp,q_dedup_minhash,q_text_fingerprint,q_text_quality,q_text_tokens,q_vendas_mart_bucketed,q_dedup_jaccard,q_resample_ffill" 2

run bench_sf30_tierAB_auto2b_r17.json /tmp/graft_sf30 \
  "q_dedup_jaccard,q_dedup_simhash,q_dedup_exact_fp,q_text_boilerplate" 2

echo "=== $(date +%H:%M:%S) r17 chain6 done" >&2
