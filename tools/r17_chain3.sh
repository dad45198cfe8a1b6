#!/usr/bin/env bash
# Dev-only round-17 leg chain, part 3.
#   1. sf30 cache-tier A/B/C on the ladder-reading regressors from the
#      r17 sf30 sweep (jaccard 30->50 s, simhash 57->75 s) vs the
#      heal-path winners (exact_fp 3.25->0.93 s, boilerplate
#      31.7->19.3 s): memory_only (r16 tier) vs memory_and_disk
#      (shipped) vs memory_and_disk + headroomFraction=0.35
#      (preemptive demotion shrinks the evictable resident mass).
#   2. sf20 corpus gen + probe rung for the clean-pair 3x crossers.
#   3. sf100 subset promoted with bucketed mart, jaccard, resample.
#   4. streaming throughput refresh at sf1.
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

TIER_SUBSET="q_dedup_jaccard,q_dedup_simhash,q_dedup_exact_fp,q_text_boilerplate"
run bench_sf30_tierAB_memonly_r17.json /tmp/graft_sf30 "$TIER_SUBSET" 2 \
  "spark.graft.index.cacheLevel=memory_only"
run bench_sf30_tierAB_mad_r17.json /tmp/graft_sf30 "$TIER_SUBSET" 2 \
  "spark.graft.index.cacheLevel=memory_and_disk"
run bench_sf30_tierAB_madhead_r17.json /tmp/graft_sf30 "$TIER_SUBSET" 2 \
  "spark.graft.index.cacheLevel=memory_and_disk;spark.graft.index.headroomFraction=0.35"

if [ ! -d /tmp/graft_sf20 ]; then
  echo "=== $(date +%H:%M:%S) generating /tmp/graft_sf20 (mult 200)" >&2
  python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf20 200 \
    > /tmp/gen_sf20.log 2>&1 || { echo "sf20 gen FAILED" >&2; rm -rf /tmp/graft_sf20; }
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

echo "=== $(date +%H:%M:%S) r17 chain3 done" >&2
