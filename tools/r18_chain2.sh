#!/usr/bin/env bash
# Dev-only round-18 leg chain, part 2 — the committed rungs, on final
# r18 classes (joinInner dim-ladder fix + shipped auto tier):
#   1. sf30 tier-confirm subset on SHIPPED defaults (the clean-window
#      auto2 retake SCALE.md names): the shipped auto rule's ladder
#      state matched madhead's in r17 but its absolutes drew a
#      degraded window — this is the direct subset comparable.
#   2. sf100 subset retake WITH the three most expensive plans
#      (VERDICT r17 item 1): the r17 attempt died on an environmental
#      disk-full; the new ENOSPC guard in quiet_leg.sh fails fast
#      instead. 55 GB floor = the measured sf100 jaccard/mart/resample
#      concurrent shuffle+spill envelope (~50 GB) + slack.
#   3. sf30 FULL sweep on the shipped auto tier (VERDICT item 2) —
#      replaces the committed interim-tier rung whose jaccard/simhash
#      carry the since-removed eviction-write tax.
#   4. matched sf10 FULL sweep — the r18 gate pair partner.
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

run bench_sf30_tierAB_auto2_r18.json /tmp/graft_sf30 \
  "q_dedup_jaccard,q_dedup_simhash,q_dedup_exact_fp,q_text_boilerplate" 2

# 16g heap: the r17 relaunch OOMed at 8g inside the bucketed-silver
# sort-write (Spark Context Cleaner heap exhaustion, preserved in
# /tmp/leg_bench_sf100_subset_r17.log) — at sf100 the 600M-row
# lineitem bucket sort plus the index set does not fit an 8g JVM.
# The leg's _meta.heap_gb stamp makes the change self-describing; the
# 100 TB analogue is executors sized to the rung, not a code change.
run bench_sf100_subset_r18.json /tmp/graft_sf100 \
  "q_corpus_pack,q_dedup_cluster,q_dedup_exact_fp,q_dedup_minhash,q_text_fingerprint,q_text_quality,q_text_tokens,q_vendas_mart_bucketed,q_dedup_jaccard,q_resample_ffill" 2 55 16g

run bench_sf30_r18.json /tmp/graft_sf30 "" 2

run bench_sf10_r18.json /tmp/graft_sf10 "" 2

echo "=== $(date +%H:%M:%S) r18 chain2 done" >&2
