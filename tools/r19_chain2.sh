#!/usr/bin/env bash
# Dev-only round-19 leg chain, part B — the sf100 ALL-TEN leg
# (VERDICT r18 item 5): one session, one green sidecar containing the
# 9-query subsetA set AND q_vendas_mart_bucketed, i.e. the dedup index
# build, the bucketed-silver build, and all three expensive plans
# (jaccard, resample, mart) coexisting within the fourth decade's disk
# budget. The r18 combined attempt ENOSPC'd under lz4 (~60 GB scratch
# vs ~59 GB free); the fit is the r18-proven codec geometry:
#   - zstd exchanges (SPARK_GRAFT_CODEC=zstd — shuffle 4.55x smaller
#     on resample's grid, jaccard scratch ~30 GB vs lz4's 60+),
#   - spill compression ON (SPARK_GRAFT_SPILL_COMPRESS=true): at this
#     rung local disk is the binding budget, the exact per-regime rule
#     in GraftSession.SpillCompressKey's scaladoc — raw spill would
#     double resample's 69-79 GB spill footprint and re-ENOSPC.
# Codec env-pinned (not compiled default) so the leg is immune to the
# default flip landing mid-night; _meta.io_codec records what ran.
#
# Classes are run from a FROZEN snapshot (SPARK_GRAFT_CLASSES) so the
# working tree can recompile the flip while this leg runs.
set -uo pipefail
cd "$(dirname "$0")/.."

SNAP=/tmp/graft_classes_r19
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"

ALL_TEN="q_corpus_pack,q_dedup_cluster,q_dedup_exact_fp,q_dedup_minhash,q_text_fingerprint,q_text_quality,q_text_tokens,q_dedup_jaccard,q_resample_ffill,q_vendas_mart_bucketed"

df -m /tmp >&2
echo "=== $(date +%H:%M:%S) sf100 all-ten leg start" >&2
env SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ATTEMPTS=2 LEG_MIN_FREE_GB=50 \
  SPARK_GRAFT_CODEC=zstd SPARK_GRAFT_SPILL_COMPRESS=true \
  SPARK_GRAFT_CLASSES="$SNAP" \
  SPARK_GRAFT_BENCH_ONLY="$ALL_TEN" \
  SPARK_GRAFT_BENCH_SIDE="/root/repo/bench_sf100_subset_r19.json" \
  SPARK_DRIVER_MEM=16g QUIET_MAX_WAIT_S=900 tools/quiet_leg.sh \
  > /tmp/leg_bench_sf100_subset_r19.log 2>&1
echo "=== $(date +%H:%M:%S) sf100 all-ten leg exit $?" >&2
df -m /tmp >&2
