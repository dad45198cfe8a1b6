#!/usr/bin/env bash
# Dev-only round-14 leg chain: the same-night matched pair for the
# sf10->sf30 gate, then the sf30 mart regime A/Bs. Every leg launches
# through quiet_leg.sh (parks until the host sentinels read quiet) and
# the WHOLE chain runs with attempts=2 (sf30 full sweeps run ~1.5 h
# each; _meta.attempts self-describes, and the gate pair is matched).
# No recompiles may happen while this runs: mid-run classfile
# replacement killed the r13 sf30 leg at its final (lazily loaded)
# lambda with NoSuchMethodError after 1.5 h of work.
set -uo pipefail
cd "$(dirname "$0")/.."
run() { # name sfdir side extra_java_opts [extra env...]
  local side=$1 sfdir=$2 only=$3 jopts=$4
  local extra=()
  # Only export a subset when one is requested: an exported-but-empty
  # SPARK_GRAFT_BENCH_ONLY would select zero queries.
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  echo "=== $(date +%H:%M:%S) leg $side start" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ROUND=14 \
  SPARK_GRAFT_ATTEMPTS=2 SPARK_GRAFT_BENCH_SIDE="$side" \
  SPARK_GRAFT_JAVA_OPTS="$jopts" "${extra[@]}" \
  SPARK_DRIVER_MEM=8g tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}
# 1-2: the matched full-sweep pair for the sf10->sf30 gate.
run bench_sf10_r14.json /tmp/graft_sf10 "" ""
run bench_sf30_r14.json /tmp/graft_sf30 "" ""
# 3-6: dim-ladder regime A/B at sf30, mart-only probes. auto at sf30
# = part:SHUFFLE_HASH (576 MB est > 512 MB budget) + customer:
# broadcast (432 MB est); on = both broadcast; shj = both hinted
# SHUFFLE_HASH; off = no hint (Catalyst's static estimate decides).
run bench_sf30_dimAB_auto_r14.json  /tmp/graft_sf30 vendas_mart ""
run bench_sf30_dimAB_bcast_r14.json /tmp/graft_sf30 vendas_mart "-Dspark.graft.mart.dimBroadcast=on"
run bench_sf30_dimAB_shj_r14.json   /tmp/graft_sf30 vendas_mart "-Dspark.graft.mart.dimBroadcast=shj"
run bench_sf30_dimAB_off_r14.json   /tmp/graft_sf30 vendas_mart "-Dspark.graft.mart.dimBroadcast=off"
# 7: pivot rung probe — at sf30 the user-count bound (est 288 MB >
# 256 MB) degrades the pivot join to SMJ by design; pin broadcast to
# measure what the safety bound costs at the first rung past it.
run bench_sf30_pivotAB_bcast_r14.json /tmp/graft_sf30 vendas_mart "-Dspark.graft.mart.pivotBroadcast=on"
echo "=== $(date +%H:%M:%S) chain done" >&2
