#!/usr/bin/env bash
# Dev-only round-17 leg chain, part 5 — final shipped defaults
# (auto tier v2: multi-read frames heal directly; headroom 0.35):
#   1. sf30 ladder-reader subset confirm under shipped defaults.
#   2. sf100 subset promoted with bucketed mart, jaccard, resample.
#   3. streaming throughput refresh at sf1.
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

run bench_sf30_tierAB_auto2_r17.json /tmp/graft_sf30 \
  "q_dedup_jaccard,q_dedup_simhash,q_dedup_exact_fp,q_text_boilerplate" 2

df -m /tmp >&2
run bench_sf100_subset_r17.json /tmp/graft_sf100 \
  "q_corpus_pack,q_dedup_cluster,q_dedup_exact_fp,q_dedup_minhash,q_text_fingerprint,q_text_quality,q_text_tokens,q_vendas_mart_bucketed,q_dedup_jaccard,q_resample_ffill" 2

echo "=== $(date +%H:%M:%S) streaming leg start" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BATCH_SF_DIR=/root/testdata/sf0.1 \
  SPARK_DRIVER_MEM=8g tools/run_bench.sh graft.tools.StreamingBench \
  > /tmp/leg_streaming_r17.log 2>&1
echo "=== $(date +%H:%M:%S) streaming leg exit $?" >&2

echo "=== $(date +%H:%M:%S) r17 chain5 done" >&2
