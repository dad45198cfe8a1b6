#!/usr/bin/env bash
# Round-19 sf30 clean-for-clean codec pair — NOTE (ADVICE r19): this
# pair is the PRE-REGISTERED COMPOSITE probe (lz4+compressed vs
# zstd+RAW spill), i.e. the leg pair whose zstd side lost 4.2% and
# REJECTED the raw-spill composite; it is not the pair that justified
# the shipped zstd+compressed-spill default. The decisive zstdcsp legs
# were run with the same env plumbing but SPARK_GRAFT_SPILL_COMPRESS=
# true (see tools/r20_codec_confirm.sh for the committed runner of
# that configuration, and GraftSession.DefaultCodec's scaladoc for the
# evidence chain). Originally re-planned for r19's slower, burstier
# host:
#
#   - attempts=1 per side (the r18 rung ran 2): halves the window a
#     burst can poison; the per-attempt spin probes in each sidecar
#     adjudicate any single-query contamination, and the two sides run
#     back-to-back so they share the night's host regime.
#   - codecs pinned per leg (never the compiled default), so the pair
#     is immune to a mid-round default flip and _meta.io_codec is the
#     ground truth of what ran.
#   - lz4 side FIRST (the incumbent), zstd composite second.
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # side codec spill
  local side=$1 codec=$2 spill=$3
  echo "=== $(date +%H:%M:%S) leg $side start (codec=$codec spill=$spill)" >&2
  env SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS=1 LEG_MIN_FREE_GB=25 \
    SPARK_GRAFT_CODEC="$codec" SPARK_GRAFT_SPILL_COMPRESS="$spill" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" \
    SPARK_DRIVER_MEM=8g QUIET_MAX_WAIT_S=600 tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}

df -m /tmp >&2
run bench_sf30_codecAB_lz4_r19.json  lz4  true
run bench_sf30_codecAB_zstd_r19.json zstd false
echo "=== $(date +%H:%M:%S) r19 codec pair done" >&2
