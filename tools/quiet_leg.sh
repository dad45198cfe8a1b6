#!/usr/bin/env bash
# Dev-only quiet-window leg launcher: poll the standalone host
# sentinels (tools/host_probe.java) until two consecutive samples read
# quiet, then exec the bench leg. Thresholds are this host's measured
# quiet baselines (spin ~68-72 ms, par ~74-90 ms, mem ~13-15 ms) with
# a small allowance; a degraded host parks here instead of committing
# a 30-120 min leg to a window that contaminates it.
#   Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_SIDE=... tools/quiet_leg.sh
# Extra: QUIET_SPIN_MS / QUIET_PAR_MS / QUIET_MEM_MS override
# thresholds; QUIET_MAX_WAIT_S (default 1800) gives up and runs anyway
# LOUDLY (the leg still self-records its own probes).
set -euo pipefail
cd "$(dirname "$0")/.."

# ENOSPC guard (r18, after the r17 sf100 loss to a 13 GB orphaned
# blockmgr dir): sweep scratch dirs no live JVM owns, then fail FAST —
# naming the biggest eaters — if /tmp headroom is below the rung's
# measured working set (LEG_MIN_FREE_GB; default 20, sf100-class legs
# set 55+: concurrent shuffle+spill there measured up to ~50 GB).
MIN_FREE_GB=${LEG_MIN_FREE_GB:-20}
if [ "$(ps -eo args | grep -c '^java .*graft')" -eq 0 ]; then
  for d in /tmp/blockmgr-* /tmp/spark-*; do
    [ -d "$d" ] || continue
    echo "[quiet_leg] sweeping orphaned scratch dir $d ($(du -sh "$d" 2>/dev/null | cut -f1))" >&2
    rm -rf "$d"
  done
fi
FREE_GB=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)
if [ "$FREE_GB" -lt "$MIN_FREE_GB" ]; then
  echo "[quiet_leg] ENOSPC GUARD: /tmp has ${FREE_GB} GB free < required ${MIN_FREE_GB} GB — refusing to launch. Biggest /tmp eaters:" >&2
  du -sm /tmp/* 2>/dev/null | sort -rn | head -8 >&2
  exit 28  # ENOSPC
fi
echo "[quiet_leg] disk guard ok: ${FREE_GB} GB free >= ${MIN_FREE_GB} GB required" >&2

SPIN_MAX=${QUIET_SPIN_MS:-73}
PAR_MAX=${QUIET_PAR_MS:-95}
MEM_MAX=${QUIET_MEM_MS:-16}
MAX_WAIT=${QUIET_MAX_WAIT_S:-1800}
t0=$(date +%s)
streak=0
while true; do
  line=$(java tools/host_probe.java 1)
  spin=$(sed -E 's/.*"spin_ms":([0-9.]+).*/\1/' <<<"$line")
  par=$(sed -E 's/.*"par_ms":([0-9.]+).*/\1/' <<<"$line")
  mem=$(sed -E 's/.*"mem_ms":([0-9.]+).*/\1/' <<<"$line")
  ok=$(awk -v s="$spin" -v p="$par" -v m="$mem" \
       -v S="$SPIN_MAX" -v P="$PAR_MAX" -v M="$MEM_MAX" \
       'BEGIN{print (s<=S && p<=P && m<=M) ? 1 : 0}')
  echo "[quiet_leg] $(date +%H:%M:%S) $line ok=$ok streak=$streak" >&2
  if [ "$ok" = 1 ]; then
    streak=$((streak+1))
    [ "$streak" -ge 2 ] && break
  else
    streak=0
  fi
  if [ $(( $(date +%s) - t0 )) -ge "$MAX_WAIT" ]; then
    echo "[quiet_leg] WAIT BUDGET EXHAUSTED (${MAX_WAIT}s) — launching anyway; the leg's own probe record adjudicates" >&2
    break
  fi
  sleep 20
done
echo "[quiet_leg] launching leg at $(date +%H:%M:%S)" >&2
exec tools/run_bench.sh "$@"
