#!/usr/bin/env bash
# Dev-only round-17 leg chain, part 2 — all legs on the SHIPPED ladder
# (fewest-reads-first priority demotion, MEMORY_AND_DISK heal path).
# The part-1 chain produced the sf50 build-order A side and the
# first-formulation (bytes-per-read, live sizes) B side, then was cut
# before sf30 so every committed rung runs final code:
#   1. sf50 B2: the lever's committed B side (defaults).
#   2. sf30 full sweep (round record; exact_fp adjudication vs the
#      r16 sf30 leg rides here).
#   3. sf10 full sweep (clean gate-pair rung).
#   4. sf20 probe for the clean-pair 3x-line crossers.
#   5. sf100 subset promoted with bucketed mart, jaccard, resample.
#   6. streaming throughput refresh at sf1.
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

run bench_sf50_residencyAB_priority2_r17.json /tmp/graft_sf50 \
  "q_dedup_jaccard,q_dedup_exact_fp" 3

run bench_sf30_r17.json /tmp/graft_sf30 "" 2

run bench_sf10_r17.json /tmp/graft_sf10 "" 2

if [ ! -d /tmp/graft_sf20 ]; then
  echo "=== $(date +%H:%M:%S) generating /tmp/graft_sf20 (mult 200)" >&2
  python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf20 200 \
    > /tmp/gen_sf20.log 2>&1 || { echo "sf20 gen FAILED" >&2; }
fi
if [ -d /tmp/graft_sf20 ]; then
  run bench_sf20_probe_r17.json /tmp/graft_sf20 \
    "q_join_inner,q_sim_topk,q_sim_ivf_topk,q_approx_stats,q_join_left_fill,vendas_mart" 2
fi

df -m /tmp >&2
run bench_sf100_subset_r17.json /tmp/graft_sf100 \
  "q_corpus_pack,q_dedup_cluster,q_dedup_exact_fp,q_dedup_minhash,q_text_fingerprint,q_text_quality,q_text_tokens,q_vendas_mart_bucketed,q_dedup_jaccard,q_resample_ffill" 2

echo "=== $(date +%H:%M:%S) streaming leg start" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BATCH_SF_DIR=/root/testdata/sf0.1 \
  SPARK_DRIVER_MEM=8g tools/run_bench.sh graft.tools.StreamingBench \
  > /tmp/leg_streaming_r17.log 2>&1
echo "=== $(date +%H:%M:%S) streaming leg exit $?" >&2

echo "=== $(date +%H:%M:%S) r17 chain2 done" >&2
