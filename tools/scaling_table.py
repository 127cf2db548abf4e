#!/usr/bin/env python3
"""sf0.1 -> sf1.0 scaling-ratio table from two BENCH artifacts.

Usage: scaling_table.py BENCH_sf01.json BENCH_sf1.json [--full FULL01 FULL1]

The headline artifacts carry the headline-query map; if the stderr
"BENCH FULL {...}" maps were saved, pass them for all-query coverage.
Flags every query whose sf1/sf0.1 ratio exceeds the data ratio (10x)
by more than 2x (i.e. > 20x) as super-linear, and annotates near-fixed
queries (< 2x) as constant-dominated.
"""
import json, sys

def load(path):
    line = open(path).read().strip().splitlines()[-1]
    j = json.loads(line)
    # accept the one-line Bench artifact, a raw full map, or the
    # spread file ({q: [min, med, max]} -> median)
    if "queries" in j:
        return j
    qs = j.get("spread_min_med_max", j)
    qs = {k: (v[1] if isinstance(v, list) else v) for k, v in qs.items()}
    return {"queries": qs, "value": sum(qs.values()), "n": len(qs)}

a, b = load(sys.argv[1]), load(sys.argv[2])
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))

rows = []
for q in common:
    r = qb[q] / qa[q] if qa[q] > 0 else float("inf")
    rows.append((q, qa[q], qb[q], r))
rows.sort(key=lambda x: -x[3])

print(f"| query | sf0.1 s | sf1.0 s | ratio | verdict |")
print(f"|---|---|---|---|---|")
for q, t1, t2, r in rows:
    verdict = ("**super-linear**" if r > 20 else
               "~linear" if r > 2 else "constant-dominated")
    print(f"| {q} | {t1:.2f} | {t2:.2f} | {r:.1f}x | {verdict} |")

tot_r = b["value"] / a["value"]
print(f"\ntotal: {a['value']:.1f} s -> {b['value']:.1f} s "
      f"({tot_r:.1f}x on 10x data, {a['n']}/{b['n']} queries)")
sup = [q for q, _, _, r in rows if r > 20]
print(f"super-linear (> 20x): {sup if sup else 'none'}")
