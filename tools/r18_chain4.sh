#!/usr/bin/env bash
# Dev-only round-18 leg chain, part 4: q_dedup_jaccard ALONE at sf100.
# In subsetA (9 queries, round-robin) jaccard hit ENOSPC on both
# attempts: the SESSION's accumulated shuffle files — above all the
# 79 GB-spilling q_resample_ffill's — squeezed the disk under
# jaccard's own ~20 GB working set (116 "No space left on device"
# hits in /tmp/leg_bench_sf100_subsetA_r18.log). Alone, the dedup
# index set (~5 GB DISK_ONLY) plus jaccard's shuffle+spill fits with
# >20 GB slack. Same engine, same heap, same attempts as subsetA.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== $(date +%H:%M:%S) leg bench_sf100_jaccC_r18.json start (mem=16g)" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ATTEMPTS=2 LEG_MIN_FREE_GB=50 \
  SPARK_GRAFT_BENCH_ONLY=q_dedup_jaccard \
  SPARK_GRAFT_BENCH_SIDE=/root/repo/bench_sf100_jaccC_r18.json \
  SPARK_DRIVER_MEM=16g tools/quiet_leg.sh \
  > /tmp/leg_bench_sf100_jaccC_r18.log 2>&1
echo "=== $(date +%H:%M:%S) leg bench_sf100_jaccC_r18.json exit $?" >&2
