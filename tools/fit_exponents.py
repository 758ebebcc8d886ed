"""Fit per-query scaling exponents from BENCH_LOCAL records (VERDICT r9 #4).

The sf1 table answered "is anything super-linear at 10x?" but two ops
(semantic_dedup_served, winnow_fingerprint) could not be separated into
"constant-overhead amortization" vs "the quadratic term arriving" from a
single ratio.  A third datapoint closes that: with records at sf0.1, sf1
and sf3 (1x / 10x / 30x the sf0.1 row counts) the least-squares slope of
log(seconds) vs log(scale) is the empirical cost exponent —

    t(s) = c * s^e  =>  e = cov(log s, log t) / var(log s)

e ~ 0 means fixed overhead dominates (the query is cheaper than Spark's
scheduling floor at every tested size), e ~ 1 is linear scale-out, and
e > 1.1 sustained across the upper interval is a super-linear term that
would bite at 100 TB and needs a root cause in SCALE.md.

Because the sf0.1 point is floor-dominated for most queries (median query
~0.3 s of which ~0.2 s is scheduling), the tool also reports the
UPPER-interval exponent e_hi = log(t3/t1)/log(3) from the sf1->sf3 pair
alone — the honest number for "what arrives next at 10x more", already
past the amortization knee.

    python tools/fit_exponents.py BENCH_sf0.1.json BENCH_sf1.json BENCH_sf3.json

Each argument is a record written by tools/record_bench.py (detail JSON
with a "queries" map and a "scale" hint parsed from the filename's
sf<N>).  Prints a markdown table sorted by e_hi DESC plus one JSON line
for machine diffing.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys


def scale_of(path: str) -> float:
    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(path))
    if not m:
        raise SystemExit(f"cannot parse sf<N> from {path}")
    return float(m.group(1))


def fit(xs: list[float], ys: list[float]) -> float:
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    mx = sum(lx) / len(lx)
    my = sum(ly) / len(ly)
    var = sum((a - mx) ** 2 for a in lx)
    cov = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    return cov / var


def main() -> None:
    paths = sys.argv[1:]
    if len(paths) < 2:
        raise SystemExit(__doc__.split("\n\n")[-2])
    recs = []
    for p in paths:
        d = json.load(open(p))
        recs.append((scale_of(p), d["queries"], os.path.basename(p)))
    recs.sort()
    scales = [s for s, _, _ in recs]
    common = set(recs[0][1])
    for _, q, _ in recs[1:]:
        common &= set(q)
    rows = []
    for name in sorted(common):
        ts = [q[name] for _, q, _ in recs]
        if any(t <= 0 for t in ts):
            continue
        e_all = fit(scales, ts)
        e_hi = math.log(ts[-1] / ts[-2]) / math.log(scales[-1] / scales[-2])
        rows.append((name, ts, round(e_all, 2), round(e_hi, 2)))
    rows.sort(key=lambda r: -r[3])
    hdr = " | ".join(f"sf{s:g} s" for s in scales)
    print(f"| query | {hdr} | e_fit | e_hi |")
    print("|---" * (len(scales) + 3) + "|")
    for name, ts, e_all, e_hi in rows:
        tss = " | ".join(f"{t:.2f}" for t in ts)
        print(f"| {name} | {tss} | {e_all} | {e_hi} |")
    print()
    print(
        json.dumps(
            {
                "metric": "scale_exponents",
                "scales": scales,
                "records": [r[2] for r in recs],
                "n_queries": len(rows),
                "worst_e_hi": rows[0][3] if rows else None,
                "over_1.1_e_hi": {n: e for n, _, _, e in rows if e > 1.1},
            }
        )
    )


if __name__ == "__main__":
    main()
