#!/usr/bin/env bash
# Round-20 clean-window confirm leg for the SHIPPED session defaults
# (zstd exchanges + compressed spill — the r19 flip whose two
# confirming full sweeps both stamped bandwidth_class=degraded;
# VERDICT r19 item 1). One full 83-query sf30 sweep, codec env-pinned
# to the shipped values so the leg documents what it measures, same
# geometry as the committed clean lz4 control
# (bench_sf30_codecAB_lz4_r19.json: attempts=1, 8g heap, 32 cores,
# same /tmp/graft_sf30 corpus, same sandbox):
#   - gate to confirm: total sum-of-mins <= lz4's 1,593.1 s AND the
#     zero-shuffle text-kernel class inside +/-5%;
#   - else: revert GraftSession.DefaultCodec to lz4.
# Classes run from a frozen snapshot of the r19-end tree so the
# comparison is code-identical to the lz4 control even while r20
# operator work lands in the working tree.
set -uo pipefail
cd "$(dirname "$0")/.."

SNAP=${SPARK_GRAFT_CLASSES:-/tmp/graft_classes_r20}

df -m /tmp >&2
echo "=== $(date +%H:%M:%S) sf30 zstdcsp clean-confirm leg start" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ATTEMPTS=1 LEG_MIN_FREE_GB=25 \
  SPARK_GRAFT_CODEC=zstd SPARK_GRAFT_SPILL_COMPRESS=true \
  SPARK_GRAFT_CLASSES="$SNAP" \
  SPARK_GRAFT_BENCH_SIDE=/root/repo/bench_sf30_codecAB_zstdcsp_clean_r20.json \
  SPARK_DRIVER_MEM=8g QUIET_MAX_WAIT_S=1200 tools/quiet_leg.sh \
  > /tmp/leg_sf30_zstdcsp_clean_r20.log 2>&1
echo "=== $(date +%H:%M:%S) leg exit $?" >&2
df -m /tmp >&2
