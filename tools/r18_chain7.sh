#!/usr/bin/env bash
# Dev-only round-18 leg chain, part 7 — the sf100 jaccard retake,
# correctly plumbed. Chain 6's attempt crashed at launch:
# spark.io.compression.codec is a CORE conf and Spark 4 refuses
# runtime modification (CANNOT_MODIFY_CONFIG), so it must ride ONLY
# the JVM sysprop (run_bench.sh's SPARK_GRAFT_JAVA_OPTS -> SparkConf
# at context creation). For the self-describing-leg contract the
# SPARK_GRAFT_CONF stamp carries a graft-namespaced NOTE key
# (runtime-settable, lands verbatim in _meta.conf) naming the
# sysprop actually in effect.
#
# Why zstd at this rung and only this rung: the jaccard candidate
# join at sf100 writes ~47 GB of lz4 shuffle plus ~16 GB spill
# (extrapolating the measured sf30 shape x3.33) against ~59 GB free
# after the corpora — both the 10-query subsetA and the lz4
# jaccard-alone leg ENOSPC'd on exactly that arithmetic
# (bench_sf100_jaccC_enospc_r18.json, preserved). zstd shuffle
# compression is the standard large-cluster setting and measured
# ~35-40% smaller than lz4 on text-heavy shuffles; the non-sf100
# corpora are also cleared for the leg (regenerated afterwards,
# deterministic) so the disk is jaccard's alone.
set -uo pipefail
cd "$(dirname "$0")/.."

# NOTE: the original waiter (`while pgrep -f tools/r18_chain6.sh`)
# deadlocked on its own launcher: the interactive shell that spawned
# this script carried the literal pattern in its cmdline and outlived
# the launch, so pgrep matched forever. Chain 6 had already finished;
# the waiter is dropped rather than outsmarted — launch this chain
# only once the sweeps are done.

rm -rf /tmp/graft_sf1 /tmp/graft_sf10 /tmp/graft_sf30

echo "=== $(date +%H:%M:%S) leg bench_sf100_jaccC_r18.json start (mem=16g, zstd sysprop)" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ATTEMPTS=2 LEG_MIN_FREE_GB=55 \
  SPARK_GRAFT_BENCH_ONLY=q_dedup_jaccard \
  SPARK_GRAFT_BENCH_SIDE=/root/repo/bench_sf100_jaccC_r18.json \
  SPARK_GRAFT_JAVA_OPTS="-Dspark.io.compression.codec=zstd" \
  SPARK_GRAFT_CONF="spark.graft.note.sysprop.io.compression.codec=zstd" \
  SPARK_DRIVER_MEM=16g tools/quiet_leg.sh \
  > /tmp/leg_bench_sf100_jaccC_r18.log 2>&1
echo "=== $(date +%H:%M:%S) leg bench_sf100_jaccC_r18.json exit $?" >&2

echo "=== $(date +%H:%M:%S) r18 chain7 done" >&2
