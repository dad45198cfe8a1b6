#!/usr/bin/env bash
# Dev-only round-18 leg chain, part 3 — chain 2's remainder with the
# sf100 subset SPLIT in two. The combined 10-query leg cannot fit this
# host's disk: its concurrent working set (dedup index frames demoted
# DISK_ONLY ~5 GB + the bucketed-silver sort-write of 600M rows
# ~40 GB of blockmgr scratch + the 15 GB corpus) ate 59 GB to a 3 GB
# floor mid-prewarm — the same physics that killed both r17 attempts
# (first ENOSPC, then heap OOM at 8g). Split, the two working sets
# never coexist:
#   A: the 7 cheap queries + jaccard + resample (dedup index set, no
#      warehouse writes).
#   B: q_vendas_mart_bucketed alone (bucketed-silver build + mart; no
#      dedup index build — prewarm is subset-aware).
# Then the sf30 FULL sweep on the shipped auto tier and the matched
# sf10 full sweep (the r18 gate pair).
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

run bench_sf100_subsetA_r18.json /tmp/graft_sf100 \
  "q_corpus_pack,q_dedup_cluster,q_dedup_exact_fp,q_dedup_minhash,q_text_fingerprint,q_text_quality,q_text_tokens,q_dedup_jaccard,q_resample_ffill" 2 50 16g

run bench_sf100_martB_r18.json /tmp/graft_sf100 \
  "q_vendas_mart_bucketed" 2 50 16g

run bench_sf30_r18.json /tmp/graft_sf30 "" 2

run bench_sf10_r18.json /tmp/graft_sf10 "" 2

echo "=== $(date +%H:%M:%S) r18 chain3 done" >&2
