#!/usr/bin/env bash
# Round-19 index_build cold/warm controlled pair, RE-RUN.
#
# Why a re-run: commit a72fc02 adjudicated the r17→r18 1.85× sf30
# index_build swing from a controlled pair whose sidecars
# (bench_sf30_idx{cold,warm}_r19.json) were never committed — they died
# with a sandbox reset, leaving SCALE.md citing files that exist
# nowhere in git history. This script reproduces the pair on the
# current host so the committed table has committed inputs again.
# Geometry matches the original: full prewarm surface via a subset
# that needs both the dedup indexes and the bucketed silver
# (q_dedup_funnel + q_vendas_mart_bucketed), attempts=1, lz4 both
# sides; COLD wipes the on-disk silver donors and drops page caches,
# WARM re-runs immediately on whatever the cold leg left.
set -uo pipefail
cd "$(dirname "$0")/.."

IDX_ONLY="q_dedup_funnel,q_vendas_mart_bucketed"

run() { # side
  local side=$1
  echo "=== $(date +%H:%M:%S) leg $side start" >&2
  env SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS=1 LEG_MIN_FREE_GB=20 \
    SPARK_GRAFT_CODEC=lz4 SPARK_GRAFT_SPILL_COMPRESS=true \
    SPARK_GRAFT_BENCH_ONLY="$IDX_ONLY" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" \
    SPARK_DRIVER_MEM=8g QUIET_MAX_WAIT_S=600 tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}

# COLD: wipe silver donors + drop page cache.
rm -rf spark-warehouse/graft_silver_lineitem_b_tmp_graft_sf30 \
       spark-warehouse/graft_silver_orders_b_tmp_graft_sf30
sync; echo 3 > /proc/sys/vm/drop_caches || echo "[idx_pair] drop_caches FAILED" >&2
run bench_sf30_idxcold_r19.json
# WARM: donors exactly as the cold leg left them.
run bench_sf30_idxwarm_r19.json
echo "=== $(date +%H:%M:%S) r19 idx pair done" >&2
