#!/usr/bin/env bash
# Dev-only round-18 leg chain, part 6 — the sf100 jaccard rung,
# disk-fitted. Part 5's jaccard-alone leg ENOSPC'd exactly like
# subsetA: extrapolating the sf30 shape (14.2 GB shuffle + 4.8 GB
# spill, lz4) to sf100 gives a ~60+ GB concurrent scratch set against
# ~56 GB free — the "alone it fits" estimate in chain 4 was wrong.
# Fix is the conf a real 100 TB cluster runs anyway: zstd shuffle/
# spill compression (spark.io.compression.codec=zstd), ~35-40%
# smaller shuffle files than lz4 for this text-heavy corpus. Core
# conf, so it must ride the JVM sysprop (SPARK_GRAFT_JAVA_OPTS ->
# SparkConf at context creation); the SPARK_GRAFT_CONF copy is the
# _meta stamp that keeps the leg self-describing (runtime-set is a
# no-op for a core conf — the sysprop is what makes it effective).
# The other corpora are deleted for the leg's duration (regenerated
# afterwards, deterministically) so the disk is jaccard's alone.
#
# Then the sf30 + sf10 full sweeps (shipped tier, lz4 as always —
# those rungs fit; zstd stays an sf100 disk-fit condition, not a
# default flip without an A/B).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== $(date +%H:%M:%S) leg bench_sf100_jaccC_r18.json start (mem=16g, zstd shuffle)" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ATTEMPTS=2 LEG_MIN_FREE_GB=55 \
  SPARK_GRAFT_BENCH_ONLY=q_dedup_jaccard \
  SPARK_GRAFT_BENCH_SIDE=/root/repo/bench_sf100_jaccC_r18.json \
  SPARK_GRAFT_JAVA_OPTS="-Dspark.io.compression.codec=zstd" \
  SPARK_GRAFT_CONF="spark.io.compression.codec=zstd" \
  SPARK_DRIVER_MEM=16g tools/quiet_leg.sh \
  > /tmp/leg_bench_sf100_jaccC_r18.log 2>&1
echo "=== $(date +%H:%M:%S) leg bench_sf100_jaccC_r18.json exit $?" >&2

echo "=== $(date +%H:%M:%S) regenerating sf1/sf10/sf30 corpora" >&2
python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf1 10 > /tmp/gen_sf1.log 2>&1
python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf10 100 > /tmp/gen_sf10.log 2>&1
python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf30 300 > /tmp/gen_sf30.log 2>&1

run() { # side sfdir attempts
  local side=$1 sfdir=$2 attempts=$3
  echo "=== $(date +%H:%M:%S) leg $side start (mem=8g)" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS="$attempts" LEG_MIN_FREE_GB=20 \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" \
    SPARK_DRIVER_MEM=8g tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}

run bench_sf30_r18.json /tmp/graft_sf30 2

run bench_sf10_r18.json /tmp/graft_sf10 2

echo "=== $(date +%H:%M:%S) r18 chain6 done" >&2
