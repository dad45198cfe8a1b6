#!/usr/bin/env python3
"""Dev-only two-term scaling fit: decompose a query's measured wall
across bench legs into t(sf) = a + b*sf by least squares and report
how much of the top-step ratio the constant term explains.

The scale gate flags RATIOS; a query sitting at its linear asymptote
(map-side kernel whose one-time costs amortize out) reads just above
`mult` at every step and keeps landing in the MARGINAL band. The
discriminating question — VERDICT r11 item 5 — is whether the
measured curve is affine (constant floor + linear term, ratio -> mult
from ABOVE as sf grows) or carries a genuine super-linear term
(ratio grows PAST mult at the next doubling). A two-term fit over
3+ rungs answers it: report per-rung residuals, the fitted floor `a`,
and the predicted vs measured top-step ratio. R^2 ~ 1 with small
residuals and a positive floor = linear asymptote, adjudicated; a
systematic positive residual at the top rung = super-linear term,
fix required.

Usage:
  python3 tools/linear_fit.py q_text_term_freq q_text_bigrams -- \
      bench_sf1_r12.json bench_sf3_r12.json bench_sf10_r12.json \
      bench_sf30_r12.json
"""
import json
import re
import sys


def sf_of(meta):
    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)/?$", str(meta.get("sf", "")))
    return float(m.group(1)) if m else None


def main():
    argv = sys.argv[1:]
    if "--" in argv:
        i = argv.index("--")
        queries, files = argv[:i], argv[i + 1:]
    else:
        queries = [a for a in argv if not a.endswith(".json")]
        files = [a for a in argv if a.endswith(".json")]
    legs = []
    for f in files:
        d = json.load(open(f))
        sf = sf_of(d["_meta"])
        if sf is None:
            print(f"SKIP {f}: no sf in _meta")
            continue
        legs.append((sf, f, d))
    legs.sort()
    if len(legs) < 3:
        sys.exit("need >= 3 legs for a meaningful fit")

    for q in queries:
        pts = [(sf, d[q]["min_s"]) for sf, _, d in legs
               if q in d and d[q].get("min_s", -1) > 0]
        if len(pts) < 3:
            print(f"{q}: only {len(pts)} usable legs, skipping")
            continue
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        ybar = sy / n
        ss_res = sum((y - (a + b * x)) ** 2 for x, y in pts)
        ss_tot = sum((y - ybar) ** 2 for x, y in pts)
        r2 = 1 - ss_res / ss_tot if ss_tot else float("nan")
        print(f"== {q}: t(sf) = {a:.3f} + {b:.4f}*sf   R^2={r2:.5f}")
        for x, y in pts:
            pred = a + b * x
            print(f"   sf{x:<5g} measured {y:8.3f}  fit {pred:8.3f}  "
                  f"resid {y - pred:+7.3f} ({(y - pred) / y * 100:+5.1f}%)")
        (x1, y1), (x2, y2) = pts[-2], pts[-1]
        mult = x2 / x1
        meas = y2 / y1
        pred = (a + b * x2) / (a + b * x1)
        asym = "linear asymptote (ratio approaches the multiplier from "\
               "above as the floor amortizes)" if a > 0 else \
               "no positive floor: inspect"
        print(f"   top step sf{x1:g}->sf{x2:g} mult {mult:.2f}: measured "
              f"ratio {meas:.2f}, affine-fit ratio {pred:.2f} -> {asym}")


if __name__ == "__main__":
    main()
