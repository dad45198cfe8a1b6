#!/usr/bin/env bash
# Round-20 sf100 ALL-TEN leg (VERDICT r19 item 2, carried from r18
# item 5): one session, one green sidecar with the 9-query subsetA set
# AND q_vendas_mart_bucketed — dedup index build, bucketed-silver
# build, and all three expensive plans (jaccard, resample, mart)
# coexisting inside the fourth decade's disk budget.
#
# Codec env-pinned to zstd + compressed spill: after the r20 revert
# the SESSION default is lz4 (clean-window sf30 gate), but sf100 is
# the disk-bound regime where zstd is the documented fit condition —
# lz4 shuffle ENOSPC'd this exact leg in r18 (~60 GB scratch vs ~59
# free; zstd jaccard scratch ~30 GB). This pin is the "production
# values justified per regime" knob, not a default.
#
# Classes from the r20 HEAD snapshot (the edits leg's), so the leg
# also exercises the r20 operator edits at the deepest rung.
set -uo pipefail
cd "$(dirname "$0")/.."

SNAP=${SPARK_GRAFT_CLASSES:-/tmp/graft_classes_r20b}

ALL_TEN="q_corpus_pack,q_dedup_cluster,q_dedup_exact_fp,q_dedup_minhash,q_text_fingerprint,q_text_quality,q_text_tokens,q_dedup_jaccard,q_resample_ffill,q_vendas_mart_bucketed"

if [ ! -d /tmp/graft_sf100 ]; then
  echo "=== $(date +%H:%M:%S) generating /tmp/graft_sf100 (mult=1000 of sf0.1)" >&2
  python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft_sf100 1000 \
    > /tmp/gen_sf100_r20.log 2>&1 || { echo "gen FAILED"; exit 1; }
fi

df -m /tmp >&2
echo "=== $(date +%H:%M:%S) sf100 all-ten leg start" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ATTEMPTS=1 LEG_MIN_FREE_GB=50 \
  SPARK_GRAFT_CODEC=zstd SPARK_GRAFT_SPILL_COMPRESS=true \
  SPARK_GRAFT_CLASSES="$SNAP" \
  SPARK_GRAFT_BENCH_ONLY="$ALL_TEN" \
  SPARK_GRAFT_BENCH_SIDE="/root/repo/bench_sf100_allten_r20.json" \
  SPARK_DRIVER_MEM=16g QUIET_MAX_WAIT_S=900 tools/quiet_leg.sh \
  > /tmp/leg_bench_sf100_allten_r20.log 2>&1
echo "=== $(date +%H:%M:%S) sf100 all-ten leg exit $?" >&2
df -m /tmp >&2
