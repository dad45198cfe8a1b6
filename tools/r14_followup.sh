#!/usr/bin/env bash
# Dev-only round-14 follow-up: (1) A/B the AQE initial-fan-out lever
# on the six queries the sf10->sf30 gate flagged super-linear — all
# but one show fresh spill onset at sf30 under the pinned 32-way
# shuffle (per-task sort state crosses the 8 GiB/32-thread execution
# budget); initialPartitionNum is the idiomatic Spark lever (AQE
# coalesces it back when small) and SPARK_GRAFT_INIT_PARTS has carried
# it since the r10 A/B. (2) Dump the off-floor oracle subset at sf30
# (rung-crossing queries) for the DuckDB differential.
set -uo pipefail
cd "$(dirname "$0")/.."
FLAGGED=q_dedup_jaccard,q_dedup_embed,q_sim_ivf_topk,q_sim_topk,q_join_inner,q_join_left_fill
for parts in 96 256; do
  echo "=== $(date +%H:%M:%S) init$parts probe start" >&2
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ROUND=14 SPARK_GRAFT_ATTEMPTS=2 \
  SPARK_GRAFT_INIT_PARTS=$parts \
  SPARK_GRAFT_BENCH_ONLY=$FLAGGED \
  SPARK_GRAFT_BENCH_SIDE=bench_sf30_init${parts}_r14.json \
  SPARK_DRIVER_MEM=8g tools/quiet_leg.sh \
    > /tmp/leg_init${parts}.log 2>&1
  echo "=== $(date +%H:%M:%S) init$parts probe exit $?" >&2
done
echo "=== $(date +%H:%M:%S) off-floor verify start" >&2
SPARK_DRIVER_MEM=8g tools/run_bench.sh graft.Verify /tmp/graft_sf30 \
  /tmp/verify_sf30 q_dedup_simhash q_dedup_embed vendas_mart \
  q_vendas_mart_bucketed > /tmp/verify_sf30.log 2>&1
echo "=== $(date +%H:%M:%S) off-floor verify exit $?" >&2
