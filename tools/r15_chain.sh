#!/usr/bin/env bash
# Dev-only round-15 leg chain.
#
# 1. Same-night A/B on the reworked jaccard verifier at sf30:
#    OLD = the r14 snapshot (4c36253) compiled into /tmp/graft_old,
#    NEW = HEAD. Both isolated (BENCH_ONLY=q_dedup_jaccard), same
#    harness, same corpus, quiet-window launched.
# 2. Isolated jaccard fit rungs on NEW at sf1/sf3/sf10 (attempts=3)
#    so the affine fit reads four same-night isolated rungs.
# 3. The matched full-sweep sf10/sf30 pair for the gate re-take
#    (attempts=2, mirroring the r14 gate pair).
#
# Standing rule: nothing recompiles and no corpus regenerates while
# this runs (pgrep -f graft.Bench first).
set -uo pipefail
cd "$(dirname "$0")/.."
run() { # repo_dir side sfdir only attempts
  local dir=$1 side=$2 sfdir=$3 only=$4 attempts=$5
  local extra=()
  [ -n "$only" ] && extra+=("SPARK_GRAFT_BENCH_ONLY=$only")
  echo "=== $(date +%H:%M:%S) leg $side start (dir=$dir)" >&2
  (cd "$dir" && env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ROUND=15 SPARK_GRAFT_ATTEMPTS="$attempts" \
    SPARK_GRAFT_BENCH_SIDE="/root/repo/$side" "${extra[@]}" \
    SPARK_DRIVER_MEM=8g tools/quiet_leg.sh) \
    > "/tmp/leg_${side%.json}.log" 2>&1
  echo "=== $(date +%H:%M:%S) leg $side exit $?" >&2
}
# A/B pair, old first (its writeback residue then decays during the
# old->new prewarm, matching how every leg follows a predecessor).
run /tmp/graft_old bench_sf30_jaccOld_r15.json /tmp/graft_sf30 q_dedup_jaccard 2
run /root/repo     bench_sf30_jacc_r15.json    /tmp/graft_sf30 q_dedup_jaccard 3
# Fit rungs (NEW, isolated, attempts=3).
run /root/repo bench_sf1_jacc_r15.json  /tmp/graft_sf1  q_dedup_jaccard 3
run /root/repo bench_sf3_jacc_r15.json  /tmp/graft_sf3  q_dedup_jaccard 3
run /root/repo bench_sf10_jacc_r15.json /tmp/graft_sf10 q_dedup_jaccard 3
# Matched full-sweep gate pair (attempts=2).
run /root/repo bench_sf10_r15.json /tmp/graft_sf10 "" 2
run /root/repo bench_sf30_r15.json /tmp/graft_sf30 "" 2
echo "=== $(date +%H:%M:%S) chain done" >&2
