#!/usr/bin/env python3
"""Dev-only scaling-curve report: compare per-query bench side files
across scale factors and flag super-linear growth.

Usage:
  python3 tools/scale_curve.py bench_sf01.json bench_sf1.json 10

Prints a per-query table of min_s at each SF, the sf-to-sf ratio, and
a family rollup; queries whose ratio exceeds the data multiplier are
flagged (anything growing faster than the input is a scale risk; the
multiplier itself is linear). Queries missing from either file, or
with no successful run at either SF, are listed explicitly — a query
that cannot be ratio'd must not silently pass the zero-flags check.

Flagging carries a 10% measurement tolerance (override with a 4th
arg): a query at its linear asymptote (map-only text kernels, fully
amortized shuffles) reads exactly `mult` ± run noise, and the r8/r9
legs measured that noise at 5-10% even on 0-steal runs (probe floor
spread, JIT state, page cache). Ratios in (mult, mult*(1+eps)] print
as MARGINAL without failing the gate; ratios above the tolerance
exit 1. A real quadratic term blows straight past 10% at the next
doubling — the tolerance can't hide it — while a strict > mult gate
re-flags exactly-linear queries forever (r8 flagged two zero-shuffle
map kernels at 3.07x/3.12x for 3x data). Strategy-flip steps
(broadcast->SMJ at a size threshold, ladder rung crossings) can
legitimately exceed even the tolerance ONCE; those need a recorded
adjudication in SCALE.md with a matched-phase step measured ~linear
(the r9 sf1.5->sf3 mult-2 legs are the template).

Standing per-query adjudications live in SCALE_EXEMPTIONS.json (repo
root, next to this tools/ dir): a query whose super-linear step is a
measured, controlled regime artifact of the local harness (e.g. the
jaccard verifier's spill-regime onset at a fixed 8 GiB) is listed
there with its regime, a matched-regime step measured ~linear, and
the control experiments. Exempted queries that exceed the tolerance
print EXEMPT with the regime — loudly, never silently — and do not
gate; every other query gates exactly as before."""
import json
import os
import re
import sys


def sf_of(meta):
    """Scale factor parsed from the leg's corpus dir name (.../sf10,
    .../sf0.1); None when the dir doesn't carry one."""
    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)/?$", str(meta.get("sf", "")))
    return float(m.group(1)) if m else None


def exemption_applies(e, meta_s, meta_b):
    """A flip-step exemption is honored ONLY on the adjudicated step.

    When the entry records a corpus straddle (flip_docs + docs_per_sf),
    the cap applies iff the two legs' corpus sizes cross the flip:
    small < flip_docs <= big. Same-rung steps (both below or both at/
    above the flip) gate exactly as unexempted queries — a genuine
    regression on one rung must not hide under the flip's cap. Entries
    without a straddle keep the old behavior (cap on any step). If a
    leg's sf can't be parsed, be conservative: the cap is NOT honored.
    """
    flip = e.get("flip_docs")
    per_sf = e.get("docs_per_sf")
    if flip is None or per_sf is None:
        return True, None
    fs, fb = sf_of(meta_s), sf_of(meta_b)
    if fs is None or fb is None:
        return False, "leg sf unparseable; straddle unverifiable, gating"
    ds, db = fs * per_sf, fb * per_sf
    if ds < flip <= db:
        return True, None
    return False, (f"same-rung step ({ds:.0f} -> {db:.0f} docs, flip at "
                   f"{flip:.0f}); exemption scoped to the flip step, gating")


def fam(name):
    for p in ("q_dedup", "q_sim", "q_text", "q_corpus", "q_window",
              "q_join", "q_agg"):
        if name.startswith(p):
            return p
    return "other"


def main():
    small, big, mult = sys.argv[1], sys.argv[2], float(sys.argv[3])
    eps = float(sys.argv[4]) if len(sys.argv) > 4 else 0.10
    exemptions_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_EXEMPTIONS.json")
    exemptions = {}
    if os.path.exists(exemptions_path):
        exemptions = json.load(open(exemptions_path))
        exemptions.pop("_meta", None)
    s = json.load(open(small))
    b = json.load(open(big))
    meta_s, meta_b = s.pop("_meta"), b.pop("_meta")
    missing = sorted(set(s) ^ set(b))
    rows = []
    unratioed = []
    for name in sorted(s):
        if name not in b:
            continue
        ms, mb = s[name]["min_s"], b[name]["min_s"]
        if ms <= 0 or mb <= 0:
            rows.append((name, ms, mb, None))
            unratioed.append(name)
        else:
            rows.append((name, ms, mb, mb / ms))
    print(f"{'query':28s} {'small':>8s} {'big':>8s} {'ratio':>7s}  "
          f"(mult={mult:g}, tolerance {eps:.0%})")
    flagged = []
    marginal = []
    exempted = []
    for name, ms, mb, r in rows:
        mark = ""
        if r is not None and r > mult * (1.0 + eps):
            # An exemption is BOUNDED: it covers the adjudicated regime
            # (ratios up to max_normalized_ratio x linear), not any
            # future regression of any magnitude. A 10x-from-a-plan-bug
            # step on an exempted query must still gate.
            cap = exemptions.get(name, {}).get("max_normalized_ratio")
            applies, why = (exemption_applies(exemptions[name], meta_s, meta_b)
                            if name in exemptions else (False, None))
            if name in exemptions and not applies:
                mark = f" <-- SUPER-LINEAR ({why})"
                flagged.append(name)
            elif name in exemptions and (cap is None or r / mult <= cap):
                mark = " <-- EXEMPT (adjudicated: see SCALE_EXEMPTIONS.json)"
                exempted.append(name)
            elif name in exemptions:
                mark = (f" <-- SUPER-LINEAR (normalized {r / mult:.2f}x exceeds"
                        f" the exemption's bound {cap:g}x)")
                flagged.append(name)
            else:
                mark = " <-- SUPER-LINEAR"
                flagged.append(name)
        elif r is not None and r > mult:
            mark = " (marginal)"
            marginal.append(name)
        rs = f"{r:.2f}" if r is not None else "n/a"
        print(f"{name:28s} {ms:8.3f} {mb:8.3f} {rs:>7s}{mark}")
    fams = {}
    for name, ms, mb, r in rows:
        if r is None:
            continue
        f = fams.setdefault(fam(name), [0.0, 0.0])
        f[0] += ms
        f[1] += mb
    print("\nfamily rollup (sum of per-query mins):")
    for f, (ms, mb) in sorted(fams.items()):
        print(f"  {f:10s} {ms:8.3f} -> {mb:8.3f}  ratio {mb / ms:6.2f}")
    print(f"\nindex_build: {meta_s['index_build_s']:.2f} -> "
          f"{meta_b['index_build_s']:.2f} s "
          f"(ratio {meta_b['index_build_s'] / max(meta_s['index_build_s'], 1e-9):.2f})")
    print(f"total_min:   {meta_s['total_min_s']:.2f} -> {meta_b['total_min_s']:.2f} s")
    print(f"steal probes: small {meta_s['steal_probes']}/{meta_s['n_probes']}, "
          f"big {meta_b['steal_probes']}/{meta_b['n_probes']}")
    # MACHINE-DRIFT check: each leg records the min wall time of a
    # fixed constant-work sentinel (probe_floor_ms). The two legs ran
    # the SAME sentinel, so their floors should match within noise; a
    # divergent pair means the machine itself ran at different speeds
    # when the legs were taken (observed r11: a VM whose single-core
    # throughput silently halved with zero reported steal — vmstat
    # idle, /proc/stat steal flat, python spin-loop 0.85 -> 1.79 s).
    # Ratios from a drifted pair are scaled by the drift in BOTH
    # directions, so print it loudly next to every verdict rather than
    # silently normalizing (per-query sensitivity to machine state is
    # not uniform — IO-bound and CPU-bound queries drift differently).
    fs = meta_s.get("probe_floor_ms")
    fb = meta_b.get("probe_floor_ms")
    if fs and fb:
        fr = fb / fs
        print(f"probe floor: small {fs:.1f} ms, big {fb:.1f} ms "
              f"(machine-speed ratio {fr:.2f})")
        if fr > 1.25 or fr < 0.8:
            print(f"  !! MACHINE DRIFT: the legs ran on materially "
                  f"different machine speeds ({fr:.2f}x). Per-query "
                  f"ratios are contaminated by ~that factor; re-run "
                  f"the drifted leg before trusting flags either way.")
    # The parallel (all-cores) probe catches the drift mode the
    # single-thread floor cannot: a host capping aggregate throughput
    # while single threads run full speed. Compare the min of each
    # leg's [start, end] pair.
    ps = meta_s.get("par_probe_ms")
    pb = meta_b.get("par_probe_ms")
    if ps and pb:
        pr = min(pb) / min(ps)
        print(f"par probe:   small {min(ps):.0f} ms, big {min(pb):.0f} ms "
              f"(aggregate-throughput ratio {pr:.2f}; this host "
              f"normally wanders +/-50%, so only >=2x is actionable)")
        if pr > 2.0 or pr < 0.5:
            print(f"  !! AGGREGATE-THROUGHPUT DRIFT ({pr:.2f}x) with "
                  f"single-thread floors possibly clean — same caveat "
                  f"as MACHINE DRIFT above.")
    if flagged:
        print(f"\nFLAGGED super-linear: {', '.join(flagged)}")
    if exempted:
        print(f"\nEXEMPTED (super-linear but adjudicated, not gating):")
        for name in exempted:
            e = exemptions[name]
            print(f"  {name}: {e.get('regime', '(no regime recorded)')}")
            print(f"    matched step: {e.get('matched_step', '(none)')}")
    if marginal:
        print(f"MARGINAL (> mult, within {eps:.0%} tolerance — not gating): "
              f"{', '.join(marginal)}")
    if missing:
        print(f"\nNOT COMPARED (absent from one file): {', '.join(missing)}")
    if unratioed:
        print(f"\nNOT RATIO'D (no successful run at one SF): "
              f"{', '.join(unratioed)}")
    # Non-zero exit when anything is flagged, missing, or unratioed so
    # scripted "zero flags" gates can rely on the exit status instead
    # of scraping stdout.
    if flagged or missing or unratioed:
        sys.exit(1)


if __name__ == "__main__":
    main()
