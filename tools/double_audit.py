#!/usr/bin/env python3
"""Fleet audit of double-derived hashed output columns.

The round-12 lesson (pipe_pagerank, red twice): the correctness gate
hashes PRINTED values, and any output column whose value passes through
a double on both engines is only as stable as both stacks' libm /
round(DOUBLE, k) / double->DECIMAL behaviour — even a terminal
"half-ulp-safe" reconstruction flipped a digit on the driver's
duckdb/pandas stack. This tool makes the failure class visible for the
WHOLE fleet instead of per-gate whack-a-mole:

  1. every floating (float32/float64) output column in a verify dump —
     these hash the double's shortest-roundtrip repr, so the BITS must
     match across engines and stacks;
  2. every DECIMAL output column whose oracle SQL derives it via
     round(<double expr>, k) or a ::DOUBLE cast — the pagerank class:
     exact-looking type, double-derived value;
  3. every oracle whose final SELECT applies round( to a double
     expression (k-dp grids: stable only away from .5 boundaries).

Usage: python3 tools/double_audit.py <verify_dump_dir> [--json out]

The output is a per-query, per-column table with a heuristic SOURCE
class; dispositions (why each flagged column is safe, or what hardened
it) live in the round notes — the tool finds, a human (or a spec)
argues.
"""
import json
import os
import re
import sys

import pyarrow.parquet as pq

FLOAT_KINDS = {"float", "double", "halffloat"}


def parquet_of(dump, q):
    d = os.path.join(dump, q)
    if not os.path.isdir(d):
        return None
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    return os.path.join(d, files[0]) if files else None


def float_cols(path):
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = str(field.type)
        if t in ("float", "double", "halffloat") or t.startswith("float"):
            out.append((field.name, t))
    return out


def decimal_cols(path):
    schema = pq.read_schema(path)
    return [(f.name, str(f.type)) for f in schema
            if str(f.type).startswith("decimal")]


# final-SELECT extraction: the text after the LAST top-level SELECT
def final_select(sql):
    idx = sql.upper().rfind("SELECT")
    return sql[idx:] if idx >= 0 else sql


LIBM = ("pow(", "exp(", "ln(", "log(", "log10(", "log2(", "sqrt(",
        "erfc(", "erf(", "gamma(", "lgamma(", "sin(", "cos(", "tan(",
        "atan(", "atan2(", "asin(", "acos(", "cbrt(", "exp2(")


def defining_expr(sql, name):
    """Backscan: the balanced expression before the LAST `AS <name>`.

    Finds where a column alias was last defined (CTE or final select)
    and returns that expression text — good enough to classify its
    arithmetic class; not a SQL parser."""
    pat = re.compile(r"\bAS\s+" + re.escape(name) + r"\b", re.I)
    last = None
    for m in pat.finditer(sql):
        last = m
    if last is None:
        return None
    end = last.start()
    depth = 0
    i = end - 1
    # scan back over one balanced expression: stop at a comma, SELECT,
    # or WITH at depth 0
    while i >= 0:
        c = sql[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0 and c == ",":
            break
        elif depth == 0 and sql[max(0, i - 6):i + 1].upper().endswith(
                "SELECT"):
            i -= 6
            break
        i -= 1
    return sql[i + 1:end].strip()


def classify(expr_text):
    """Heuristic class of ONE defining expression (case-insensitive):

    GRID      — outermost op is round(...): boundary risk only within
                ~1 ULP of a .5 grid line (the documented one-shot class)
    LIBM_RAW  — a libm call NOT inside any round(): the repr-hashed
                bits depend on each stack's libm — the class the r13
                audit exists to eliminate
    AGG_RAW   — avg/stddev/corr/covar/var over doubles, unrounded:
                order- and algorithm-sensitive across engines
    ARITH     — +,-,*,/ of stored/integer values: IEEE 754 exact ops,
                bit-identical on any compliant engine
    """
    t = expr_text.lower()
    has_libm = any(fn in t for fn in LIBM)
    outer_round = re.match(r"^\s*(least\s*\(\s*[\d.]+\s*,\s*)?"
                           r"(cast\s*\(\s*)?round\s*\(", t) is not None
    if has_libm and not outer_round:
        # a round( anywhere that ENCLOSES every libm call is fine; the
        # cheap approximation: flag only if some libm call sits outside
        # the last round( span — conservative: any round( present and
        # libm present => GRID(check), none => LIBM_RAW
        if "round(" in t:
            return "GRID?"
        return "LIBM_RAW"
    if outer_round or "round(" in t:
        return "GRID" if has_libm else "GRID_ARITH"
    if re.search(r"\b(avg|stddev|stddev_samp|stddev_pop|var_samp|"
                 r"var_pop|corr|covar_samp|covar_pop)\s*\(", t):
        return "AGG_RAW"
    return "ARITH"


def arm_rounds(sql):
    """Rewrite every round(EXPR, k) to round(__bg(EXPR, k), k) — the
    __bg macro errors when EXPR sits within eps of a .5 rounding
    boundary on the 10^-k grid. Text-level, balanced-paren; k must be
    a literal (it is, fleet-wide)."""
    out = []
    i = 0
    low = sql.lower()
    n = len(sql)
    while i < n:
        m = re.compile(r"\bround\s*\(").search(low, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i:m.end()])
        # find the matching close paren, tracking the last top-level comma
        depth = 1
        j = m.end()
        last_comma = None
        while j < n and depth > 0:
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                last_comma = j
            j += 1
        inner = sql[m.end():j - 1]
        if last_comma is None:
            expr_txt, k = inner, "0"
        else:
            expr_txt = sql[m.end():last_comma]
            k = sql[last_comma + 1:j - 1].strip()
        expr_txt = arm_rounds(expr_txt)  # nested rounds
        out[-1] = out[-1] + f"__bg({expr_txt}, {k}), {k})"
        i = j
    return "".join(out)


def boundaries(dump, sf_dir, queries=None):
    """Bracket, per libm-bearing oracle, the minimum distance of any
    pre-round value to a .5 rounding boundary (in grid-cell units) by
    running the armed query under a descending epsilon ladder. A 1-ULP
    libm divergence moves the scaled fraction by ≈ value × 10^(k-16),
    so a green eps of 1e-6 on 6dp values ≤ ~30 is ≥3 orders of margin."""
    import duckdb
    with open(os.path.join(dump, "oracle_sql.json")) as fh:
        oracles = json.load(fh)
    con = duckdb.connect()
    import glob as _g
    for p in _g.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    ladder = [1e-6, 1e-8, 1e-10, 1e-12]
    report = {}
    for q in sorted(oracles):
        sql = oracles[q]
        low = sql.lower()
        if queries and q not in queries:
            continue
        if not queries and not (
                any(fn in low for fn in LIBM) and "round(" in low):
            continue
        armed = arm_rounds(sql)
        green = None
        tripped_at = None
        for eps in ladder:
            con.execute("CREATE OR REPLACE MACRO __bg(x, p) AS "
                        "CASE WHEN x IS NOT NULL AND abs(abs("
                        "CAST(x AS DOUBLE)*pow(10,p) - "
                        "floor(CAST(x AS DOUBLE)*pow(10,p))) - 0.5) "
                        f"< {eps} THEN error('boundary') ELSE x END")
            try:
                con.execute(
                    "CREATE OR REPLACE TEMP TABLE __probe AS " + armed)
                green = eps
                break
            except Exception as e:
                if "boundary" in str(e):
                    tripped_at = eps
                else:
                    report[q] = f"PROBE_ERROR: {str(e)[:120]}"
                    break
        if q in report:
            continue
        if green is None:
            report[q] = f"min boundary distance < {ladder[-1]:.0e}"
        elif tripped_at is None:
            report[q] = f"min boundary distance > {green:.0e}"
        else:
            report[q] = (f"min boundary distance in "
                         f"({green:.0e}, {tripped_at:.0e}]")
    for q in sorted(report):
        print(f"  {q:32s} {report[q]}")
    return report


def main():
    dump = sys.argv[1]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    with open(os.path.join(dump, "oracle_sql.json")) as fh:
        oracles = json.load(fh)

    rows = []
    for q in sorted(oracles):
        path = parquet_of(dump, q)
        if path is None:
            rows.append({"query": q, "column": "-", "kind": "NO_DUMP",
                         "note": "no verify dump directory"})
            continue
        sql = oracles[q]
        fin = final_select(sql)
        for name, typ in float_cols(path):
            d = defining_expr(sql, name)
            cls = classify(d) if d else "PASSTHRU"
            rows.append({"query": q, "column": name, "kind": f"FLOAT:{typ}",
                         "cls": cls, "note": (d or "")[:90]})
        for name, typ in decimal_cols(path):
            # pagerank class: DECIMAL output derived via round(double)
            # or an explicit double cast in the final select
            if re.search(r"round\s*\(", fin, re.I) and \
                    re.search(r"as\s+double|::\s*double", fin, re.I):
                rows.append({"query": q, "column": name,
                             "kind": f"DECIMAL_FROM_DOUBLE:{typ}",
                             "note": "final select rounds a double cast"})
    flt = [r for r in rows if r["kind"].startswith("FLOAT")]
    dfd = [r for r in rows if r["kind"].startswith("DECIMAL_FROM_DOUBLE")]
    nod = [r for r in rows if r["kind"] == "NO_DUMP"]
    print(f"queries audited: {len(oracles)}")
    print(f"floating output columns: {len(flt)} across "
          f"{len(set(r['query'] for r in flt))} queries")
    order = {"LIBM_RAW": 0, "AGG_RAW": 1, "GRID?": 2, "PASSTHRU": 3,
             "GRID": 4, "GRID_ARITH": 5, "ARITH": 6}
    for r in sorted(flt, key=lambda r: (order.get(r["cls"], 9),
                                        r["query"])):
        print(f"  {r['cls']:10s} {r['query']:30s} {r['column']:22s} "
              f"{r['note'][:70]}")
    print(f"decimal-from-double finals: {len(dfd)}")
    for r in dfd:
        print(f"  DEC<DBL {r['query']:32s} {r['column']:24s} {r['note']}")
    for r in nod:
        print(f"  NO_DUMP {r['query']}")
    from collections import Counter
    print("class counts:", dict(Counter(r["cls"] for r in flt)))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(rows, fh, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
