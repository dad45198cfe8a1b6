#!/usr/bin/env bash
# Dev-only round-18 leg chain, part 8 — does the r16 "don't widen the
# resample sort" rule INVERT at the fourth decade?
#
# The r16 profile matrix at sf30 rejected the counted sort width:
# widths 32/128/192 all read 38-41 s while the counted 344 read
# 53.4 s — spill writes were free (page-cache-absorbed) and the wide
# fan-out's bookkeeping was not. But at sf100 the committed rung
# (subsetA) shows the sort-spill regime with its mask off: 79.3 GB of
# spill on an 11 GB shuffle, wall 5.5x for the 3.33x data step from
# sf30 — the spill has left page cache and competes with the shuffle
# for one disk. The counted width exists for exactly this geometry
# (64 MB/task sort sets, cap 1024); measure it rather than extrapolate
# the sf30 rejection.
#
# Same-night A/B, identical engine/corpus/heap, zstd sysprop both
# sides (disk-fit; the off side's lz4 spill alone brushes the free
# space), resample ONLY (no dedup index build — prewarm is
# subset-aware):
#   A: fanOut=off  (shipped default, AQE-coalescible sort exchange)
#   B: fanOut=auto (counted 64 MB/task width -> cap 1024 at sf100)
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # side fanout
  local side=$1 fanout=$2
  echo "=== $(date +%H:%M:%S) leg $side start (fanOut=$fanout)" >&2
  env SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS=2 LEG_MIN_FREE_GB=50 \
    SPARK_GRAFT_BENCH_ONLY=q_resample_ffill \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" \
    SPARK_GRAFT_JAVA_OPTS="-Dspark.io.compression.codec=zstd" \
    SPARK_GRAFT_CONF="spark.graft.resample.fanOut=$fanout;spark.graft.note.sysprop.io.compression.codec=zstd" \
    SPARK_DRIVER_MEM=16g tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}

run bench_sf100_resampleAB_off_r18.json off
run bench_sf100_resampleAB_auto_r18.json auto

echo "=== $(date +%H:%M:%S) r18 chain8 done" >&2
