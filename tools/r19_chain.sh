#!/usr/bin/env bash
# Dev-only round-19 leg chain, part A — the verdict's gating evidence,
# in risk order (cheap validation first, the flip-gating pair last so
# its windows are the night's quietest):
#
#   1. sf0.1 codec pair (lz4 vs zstd+raw-spill composite), attempts=3,
#      full 83-query sweep. Protects the DRIVER bench: if the flip
#      lands, BENCH_r19 runs at sf0.1 under the new default, and the
#      committed record needs evidence the composite does not regress
#      the page-cache-trivial rung. Also the first end-to-end exercise
#      of the shipped GraftSession codec conf (SPARK_GRAFT_CODEC /
#      SPARK_GRAFT_SPILL_COMPRESS resolve at session build).
#   2. index_build cold-vs-warm A/B at sf30 (VERDICT r18 item 4): the
#      r17→r18 1.85× index_build swing (196.0 → 362.6 s) was explained
#      as warm-donor asymmetry (r17 inherited bucketed_silver +
#      clusters warm from same-night legs; r18 built post-wipe cold)
#      but never closed by a controlled pair. COLD = silver tables
#      wiped + page caches dropped; WARM = immediate re-run, donors
#      left in place. Both lz4 (the context both committed sweeps ran
#      under). Expect cold ≈ r18's 362, warm ≈ r17's 196 — that spread
#      reproducing under control closes the item.
#   3. sf30 full-sweep codec pair, SAME NIGHT, attempts=2 (matching
#      the committed r18 rung): lz4/compressed-spill (control) vs
#      zstd/raw-spill (the r19 composite). The r18 zstd sweep ran a
#      degraded window; this clean-for-clean pair is the only thing
#      blocking the default flip. Falsifier: if the clean zstd side
#      still loses the zero-shuffle kernels, that is a real codec CPU
#      tax and the flip dies with this evidence.
#
# Codec is pinned EXPLICITLY on every leg (no leg reads the compiled
# default) so the chain is immune to a mid-round default flip and each
# side file's _meta.io_codec says exactly what ran.
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # side sfdir only attempts codec spillcomp minfree mem
  local side=$1 sfdir=$2 only=$3 attempts=$4 codec=$5 spill=$6
  local minfree=${7:-20} mem=${8:-8g}
  local extra=()
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  echo "=== $(date +%H:%M:%S) leg $side start (codec=$codec spill=$spill mem=$mem)" >&2
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ATTEMPTS="$attempts" LEG_MIN_FREE_GB="$minfree" \
    SPARK_GRAFT_CODEC="$codec" SPARK_GRAFT_SPILL_COMPRESS="$spill" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" "${extra[@]}" \
    SPARK_DRIVER_MEM="$mem" QUIET_MAX_WAIT_S=900 tools/quiet_leg.sh \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}

df -m /tmp >&2

# Stale donors from rounds whose corpora no longer exist: free the
# disk before the night's legs need it.
rm -rf spark-warehouse/graft_silver_lineitem_b_tmp_graft_sf10 \
       spark-warehouse/graft_silver_orders_b_tmp_graft_sf10

# --- 1. sf0.1 codec pair -------------------------------------------
run bench_sf01_codecAB_lz4_r19.json  /root/testdata/sf0.1 "" 3 lz4  true
run bench_sf01_codecAB_zstd_r19.json /root/testdata/sf0.1 "" 3 zstd false

# --- 2. index_build cold vs warm at sf30 ---------------------------
IDX_ONLY="q_dedup_funnel,q_vendas_mart_bucketed"
# COLD side: wipe the on-disk donors (sf30 silver tables) and drop
# the page cache so neither donor class survives.
rm -rf spark-warehouse/graft_silver_lineitem_b_tmp_graft_sf30 \
       spark-warehouse/graft_silver_orders_b_tmp_graft_sf30
sync; echo 3 > /proc/sys/vm/drop_caches || echo "[chain] drop_caches FAILED" >&2
run bench_sf30_idxcold_r19.json /tmp/graft_sf30 "$IDX_ONLY" 1 lz4 true
# WARM side: donors exactly as the cold leg left them (silver tables
# rebuilt on disk, corpus + index inputs warm in page cache).
run bench_sf30_idxwarm_r19.json /tmp/graft_sf30 "$IDX_ONLY" 1 lz4 true

# --- 3. sf30 full-sweep codec pair (the flip gate) -----------------
run bench_sf30_codecAB_lz4_r19.json  /tmp/graft_sf30 "" 2 lz4  true
run bench_sf30_codecAB_zstd_r19.json /tmp/graft_sf30 "" 2 zstd false

echo "=== $(date +%H:%M:%S) r19 chainA done" >&2
