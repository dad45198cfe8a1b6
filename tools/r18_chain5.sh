#!/usr/bin/env bash
# Dev-only round-18 leg chain, part 5 — the session's remaining
# committed rungs, in dependency order:
#   1. q_dedup_jaccard ALONE at sf100 (chain4's leg, re-issued after
#      the host wiped /tmp between sessions; corpora regenerated
#      bit-identically by tools/gen_scale.py — deterministic, no RNG).
#      Alone, the dedup index set (~5 GB DISK_ONLY) plus jaccard's
#      ~20 GB shuffle+spill fits; in subsetA the session-accumulated
#      shuffle files (above all resample's 79 GB spill) squeezed it to
#      ENOSPC on both attempts.
#   2. sf30 FULL sweep on the shipped auto tier (VERDICT item 2): the
#      committed r17 rung carries the interim mad-everywhere tier's
#      eviction-write tax on jaccard/simhash; this is the clean-tier
#      replacement, and the shipped-form confirm for the joinInner
#      dim-ladder fix.
#   3. sf10 FULL sweep, matched same-night pair for the r18 gate
#      ratio (sum-of-mins sf10 -> sf30 vs 3x data).
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # side sfdir only attempts minfree mem
  local side=$1 sfdir=$2 only=$3 attempts=$4 minfree=${5:-20} mem=${6:-8g}
  local extra=()
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  echo "=== $(date +%H:%M:%S) leg $side start (mem=$mem)" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS="$attempts" LEG_MIN_FREE_GB="$minfree" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" "${extra[@]}" \
    SPARK_DRIVER_MEM="$mem" tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}

df -m /tmp >&2

run bench_sf100_jaccC_r18.json /tmp/graft_sf100 q_dedup_jaccard 2 50 16g

run bench_sf30_r18.json /tmp/graft_sf30 "" 2

run bench_sf10_r18.json /tmp/graft_sf10 "" 2

echo "=== $(date +%H:%M:%S) r18 chain5 done" >&2
