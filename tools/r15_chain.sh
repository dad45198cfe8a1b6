#!/usr/bin/env bash
# Dev-only round-15 leg chain: the same-night matched sf10/sf30 pair
# for the gate re-take after the jaccard verifier rework (positional
# filter, single-consumer candidate subtree, sizes folded into the
# index, SHJ self-join), plus the per-rung isolated jaccard readings
# the affine fit needs (sf1/sf3, where a full sweep would add nothing
# to this round's question). attempts=2 matches the r14 gate pair.
# No recompiles and no corpus regeneration while this runs (r13/r14
# standing rule: pgrep -f graft.Bench first).
set -uo pipefail
cd "$(dirname "$0")/.."
run() { # side sfdir only
  local side=$1 sfdir=$2 only=$3
  local extra=()
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  echo "=== $(date +%H:%M:%S) leg $side start" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ROUND=15 \
  SPARK_GRAFT_ATTEMPTS=2 SPARK_GRAFT_BENCH_SIDE="$side" \
  "${extra[@]}" \
  SPARK_DRIVER_MEM=8g tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}
# 1-2: fit rungs, isolated jaccard (prefix rung starts at sf3; sf1 is
# the plain rung's last reading for the ladder-flip context).
run bench_sf1_jacc_r15.json /tmp/graft_sf1 q_dedup_jaccard
run bench_sf3_jacc_r15.json /tmp/graft_sf3 q_dedup_jaccard
# 3-4: the matched full-sweep pair for the sf10->sf30 gate.
run bench_sf10_r15.json /tmp/graft_sf10 ""
run bench_sf30_r15.json /tmp/graft_sf30 ""
echo "=== $(date +%H:%M:%S) chain done" >&2
