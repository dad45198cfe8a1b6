#!/usr/bin/env bash
# Dev-only round-18 leg chain, part 1 — the short adjudication legs,
# run FIRST so their verdicts can flip shipped defaults before the
# long committed rungs (part 2) run on final classes:
#   1. q_join_inner SMJ-vs-SHJ A/B at sf30 (VERDICT r17 item 5): the
#      SpillProfile walk attributed the full 5.4 GB spill to the SORT
#      of the 180M-row lineitem side feeding the SortMergeJoin, while
#      the part build side is ~100 MB total (~3 MB/partition after the
#      32-way exchange). AQE's SMJ->SHJ conversion
#      (spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold, off
#      by default) removes that sort entirely; measure it rather than
#      assume it (the jaccard SHUFFLE_HASH rejection shows build maps
#      can starve in-pipeline aggregates).
#   2. transformWithState provider A/B at sf1 (VERDICT r17 item 6):
#      tws reads 162k rows/s vs fMGWS 309k on the same merge body.
#      Sides: RocksDB defaults / changelog checkpointing /
#      changelog + trackTotalNumberOfRows=false (skips the read-
#      before-write the default row counter forces on every put).
#      fMGWS runs in every side as the in-window control.
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # side sfdir only attempts [conf]
  local side=$1 sfdir=$2 only=$3 attempts=$4 conf=${5:-}
  local extra=()
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  [ -n "$conf" ] && extra+=("SPARK_GRAFT_CONF=$conf")
  echo "=== $(date +%H:%M:%S) leg $side start" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS="$attempts" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" "${extra[@]}" \
    SPARK_DRIVER_MEM=8g tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}

stream() { # tag conf
  local tag=$1 conf=${2:-}
  local extra=()
  [ -n "$conf" ] && extra+=("SPARK_GRAFT_CONF=$conf")
  echo "=== $(date +%H:%M:%S) streaming side $tag start" >&2
  env SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BATCH_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_STREAM_ONLY=sessionize_fmgws,sessionize_tws \
    "${extra[@]}" \
    SPARK_DRIVER_MEM=8g tools/quiet_leg.sh graft.tools.StreamingBench \
    > "/tmp/leg_streaming_twsAB_${tag}_r18.log" 2>&1
  echo "=== $(date +%H:%M:%S) streaming side $tag exit $?" >&2
}

df -m /tmp >&2

# --- 1. q_join_inner A/B (attempts=3: a 6-15 s query needs min-of-3)
run bench_sf30_joinInnerAB_smj_r18.json /tmp/graft_sf30 q_join_inner 3
run bench_sf30_joinInnerAB_shj_r18.json /tmp/graft_sf30 q_join_inner 3 \
  "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m"

# --- 2. transformWithState provider A/B (3 sides, fMGWS control each)
stream base
stream changelog \
  "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true"
stream notrack \
  "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true;spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false"

echo "=== $(date +%H:%M:%S) r18 chain1 done" >&2
