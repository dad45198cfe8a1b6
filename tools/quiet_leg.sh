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
