#!/usr/bin/env bash
# Round-20 after-measurement: one full 83-query sf30 sweep of the r20
# operator edits (dedup_embed first-collision candidates, join_anti /
# join_left_fill counted-ladder build sides, approx_stats shuffle-first
# distinct, frontier cluster propagation) under the SHIPPED defaults
# (lz4 + compressed spill after the r20 codec revert). Control:
# bench_sf30_codecAB_lz4_r19.json — r19-end code, same codec, same
# geometry (attempts=1, 8g heap, 32 cores, /tmp/graft_sf30), clean
# window — so the leg isolates the CODE deltas, codec-identical.
#
# Then the approx_stats distinct-shape A/B (the knob's sf30 pair that
# decides the committed default): one single-query leg per shape, same
# session geometry, sidecars bench_sf30_approxAB_{map,shuffle}_r20.json.
set -uo pipefail
cd "$(dirname "$0")/.."

SNAP=/tmp/graft_classes_r20b
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"

df -m /tmp >&2
echo "=== $(date +%H:%M:%S) sf30 r20-edits full sweep start" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ATTEMPTS=1 LEG_MIN_FREE_GB=25 \
  SPARK_GRAFT_CLASSES="$SNAP" \
  SPARK_GRAFT_BENCH_SIDE=/root/repo/bench_sf30_edits_lz4_r20.json \
  SPARK_DRIVER_MEM=8g QUIET_MAX_WAIT_S=600 tools/quiet_leg.sh \
  > /tmp/leg_sf30_edits_lz4_r20.log 2>&1
echo "=== $(date +%H:%M:%S) full sweep exit $?" >&2

for shape in map shuffle; do
  echo "=== $(date +%H:%M:%S) approx_stats shape=$shape leg start" >&2
  env SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS=2 LEG_MIN_FREE_GB=25 \
    SPARK_GRAFT_CLASSES="$SNAP" \
    SPARK_GRAFT_JAVA_OPTS="-Dspark.graft.approx.distinctShape=$shape" \
    SPARK_GRAFT_BENCH_ONLY=q_approx_stats \
    SPARK_GRAFT_BENCH_SIDE=/root/repo/bench_sf30_approxAB_${shape}_r20.json \
    SPARK_DRIVER_MEM=8g QUIET_MAX_WAIT_S=300 tools/quiet_leg.sh \
    > /tmp/leg_sf30_approxAB_${shape}_r20.log 2>&1
  echo "=== $(date +%H:%M:%S) shape=$shape exit $?" >&2
done
df -m /tmp >&2
