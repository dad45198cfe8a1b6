#!/usr/bin/env bash
# Round-20 A/B leg for the AQE SMJ→SHJ conversion bound
# (GraftSession.ShjThresholdKey, default candidate 64m): one full
# 83-query sf30 sweep with the conversion ON, same geometry as the
# control (bench_sf30_edits_lz4_r20.json — identical code except the
# conf, same codec lz4+csp, attempts=1, 8g heap, 32 cores,
# /tmp/graft_sf30).
#
# PRE-REGISTERED gate (written before this leg ran; OPTIMIZATION_r20.md
# §shj): ship DefaultShjThreshold=64m iff errors=[], total sum-of-mins
# ≤ the control's, and no single query regresses >10% past the
# zero-shuffle text-kernel noise band of the pair; else revert the
# default to "0" (Spark's own default, conversion off) and keep the
# knob for per-regime use.
set -uo pipefail
cd "$(dirname "$0")/.."

SNAP=/tmp/graft_classes_r20c
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"

df -m /tmp >&2
echo "=== $(date +%H:%M:%S) sf30 shj sweep start" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ATTEMPTS=1 LEG_MIN_FREE_GB=25 \
  SPARK_GRAFT_CLASSES="$SNAP" \
  SPARK_GRAFT_BENCH_SIDE=/root/repo/bench_sf30_shj_lz4_r20.json \
  SPARK_DRIVER_MEM=8g QUIET_MAX_WAIT_S=900 tools/quiet_leg.sh \
  > /tmp/leg_sf30_shj_lz4_r20.log 2>&1
echo "=== $(date +%H:%M:%S) shj sweep exit $?" >&2
df -m /tmp >&2
