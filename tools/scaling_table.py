#!/usr/bin/env python3
"""ONE authoritative scaling table across up to three decades.

Usage: scaling_table.py BENCH_sf01 BENCH_sf1 [BENCH_sf10]

Each artifact may be the one-line Bench stdout JSON (headline map), a
raw full per-query map, or a SPARK_GRAFT_BENCH_SPREAD_OUT file
({q: [min, med, max]} -> median taken). The table covers the UNION of
queries seen in any artifact; a decade a query was not measured at
prints "—" (gaps are explicit, per the round-11 verdict's ask — three
partially-overlapping tables consolidate to this one).

Verdict per query uses the widest measured span: ratio vs the data
ratio between its first and last measured decades. > 2x the data
ratio = super-linear; < 2x absolute = constant-dominated.
"""
import json, sys

def load(path):
    raw = open(path).read().strip()
    try:
        j = json.loads(raw)  # pretty-printed driver artifact
    except json.JSONDecodeError:
        j = json.loads(raw.splitlines()[-1])  # last-line Bench stdout

    if "parsed" in j:  # driver BENCH_r{N}.json wrapper
        j = j["parsed"]
    if "queries" in j:
        return j["queries"]
    qs = j.get("spread_min_med_max", j)
    return {k: (v[1] if isinstance(v, list) else v) for k, v in qs.items()}

paths = sys.argv[1:]
assert 2 <= len(paths) <= 3, __doc__
decades = [load(p) for p in paths]
labels = ["sf0.1", "sf1.0", "sf10"][: len(decades)]
# data ratio between consecutive decades is 10x
allq = sorted(set().union(*[set(d) for d in decades]))

rows = []
for q in allq:
    ts = [d.get(q) for d in decades]
    measured = [(i, t) for i, t in enumerate(ts) if t is not None]
    if len(measured) >= 2 and measured[0][1] > 0:
        (i0, t0), (i1, t1) = measured[0], measured[-1]
        data_ratio = 10 ** (i1 - i0)
        r = t1 / t0
        # thresholds scale with the span width (r12 advice #2): over a
        # two-decade span a 5x ratio is strongly constant-dominated,
        # not ~linear — ~linear means r within [0.2, 2]x of data_ratio
        verdict = ("**super-linear**" if r > 2 * data_ratio else
                   "~linear" if r > 0.2 * data_ratio
                   else "constant-dominated")
        span = f"{r:.1f}x/{data_ratio}x data"
    else:
        r, span, verdict = -1.0, "—", "single-decade"
    rows.append((q, ts, span, verdict, r))
rows.sort(key=lambda x: -x[4])

print("| query | " + " s | ".join(labels) + " s | widest span | verdict |")
print("|---" * (len(decades) + 3) + "|")
for q, ts, span, verdict, _ in rows:
    cells = " | ".join("—" if t is None else f"{t:.2f}" for t in ts)
    print(f"| {q} | {cells} | {span} | {verdict} |")

for i in range(1, len(decades)):
    common = [q for q in allq
              if decades[i - 1].get(q) and decades[i].get(q)]
    ta = sum(decades[i - 1][q] for q in common)
    tb = sum(decades[i][q] for q in common)
    print(f"\n{labels[i-1]} -> {labels[i]}: {ta:.1f} s -> {tb:.1f} s "
          f"({tb/ta:.1f}x on 10x data, {len(common)} common queries)")
sup = [q for q, _, _, v, _ in rows if v == "**super-linear**"]
print(f"super-linear: {sup if sup else 'none'}")
gaps = {lab: [q for q in allq if decades[i].get(q) is None]
        for i, lab in enumerate(labels)}
for lab, g in gaps.items():
    if g:
        print(f"not measured at {lab} ({len(g)}): {', '.join(g)}")
