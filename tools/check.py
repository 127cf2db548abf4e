#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB on the same parquet tables and diff per query."""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # Spark-written tables are DIRECTORIES of part files (the sf1 scale
    # corpus); single-file tables are the driver's testdata layout
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def fail(name, why):
    print(f"FAIL(now) {name}: {why.splitlines()[0][:160]}", flush=True)
    fails.append((name, why))

# Per-scale-factor DEFAULT skip lists, machine-enforced (round-14
# advice: the skip set used to live only in docs + a hand-copied env
# var). Keyed on the SF parsed from the data dir name:
#   - sf > 0.01: the four content-golden oracles whose literal VALUES
#     are pinned to the driver's sf0.01 corpus by contract;
#   - sf > 0.1: also pipe_ppjoin, whose oracle is a deliberately
#     independent brute-force all-pairs join that goes quadratic past
#     sf0.1 (~90 s at sf0.1, ~100x at sf1) — the operator itself stays
#     spec-pinned equal to brute force in PipelineSpec.
# CHECK_SKIP adds to these; CHECK_NO_DEFAULT_SKIP=1 disables them.
CONTENT_GOLDEN = {"pipe_bpe_merges", "pipe_bpe_encode",
                  "pipe_compress_ratio", "pipe_quality_classifier"}
ORACLE_QUADRATIC = {"pipe_ppjoin"}
import re as _re
# Anchored to the known corpus naming (sf0.01, sf1, scale_sf10 — an
# "sf<NUM>" token bounded on both sides, where <NUM> has no leading
# zero unless it is "0.<frac>"), so e.g. zipf_sf01 does NOT parse at
# all (its "01" is an abbreviation, not a number — round-14 advice;
# round-15 review caught that \d+ still accepted it as 1.0). When the
# SF cannot be determined we fail LOUDLY instead of silently applying
# the widest skip set; CHECK_SF=<num> overrides such dirs.
_base = os.path.basename(sf_dir.rstrip("/"))
_m = _re.search(r"(?:^|[_-])sf(0\.\d+|[1-9]\d*(?:\.\d+)?)(?:$|[_-])",
                _base)
if os.environ.get("CHECK_SF"):
    try:
        _sf = float(os.environ["CHECK_SF"])
    except ValueError:
        sys.exit(f"cannot parse CHECK_SF='{os.environ['CHECK_SF']}' as a "
                 "number (expected e.g. CHECK_SF=0.01 or CHECK_SF=10); "
                 "unset it to parse the SF from the data dir name, or "
                 "set CHECK_NO_DEFAULT_SKIP=1 to disable SF-keyed skips")
elif _m:
    _sf = float(_m.group(1))
elif os.environ.get("CHECK_NO_DEFAULT_SKIP"):
    _sf = None  # skips disabled anyway; no decision rides on the SF
else:
    sys.exit(f"cannot parse scale factor from data dir name '{_base}' "
             "(expected an sf<NUM> token, e.g. sf0.01 or scale_sf10); "
             "set CHECK_SF=<num> or CHECK_NO_DEFAULT_SKIP=1")
default_skip = set()
if not os.environ.get("CHECK_NO_DEFAULT_SKIP"):
    if _sf > 0.01:
        default_skip |= CONTENT_GOLDEN
    if _sf > 0.1:
        default_skip |= ORACLE_QUADRATIC
only = set(os.environ.get("CHECK_ONLY", "").split(",")) - {""}
skip = (set(os.environ.get("CHECK_SKIP", "").split(",")) - {""}) \
    | (default_skip - only)  # CHECK_ONLY overrides a default skip
if default_skip - only:
    print(f"default-skip at sf={_sf}: {sorted(default_skip - only)}")
results = {}
fails = []
# CHECK_RESUME=1: reuse PASS results already recorded in CHECK_JSON
# (long scale runs that died mid-way continue instead of restarting)
if os.environ.get("CHECK_RESUME") and os.environ.get("CHECK_JSON") \
        and os.path.exists(os.environ["CHECK_JSON"]):
    prior = json.load(open(os.environ["CHECK_JSON"]))["queries"]
    results = {k: v for k, v in prior.items() if v.get("pass")}
    print(f"resuming past {len(results)} recorded passes")
import time
for name, sql in sorted(oracle.items()):
    if (only and name not in only) or name in skip or name in results:
        continue
    t0 = time.time()
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        fail(name, "missing spark output"); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        # materialize before .df(): duckdb 1.0's direct pandas
        # conversion of a streaming unnest projection degrades from
        # seconds to tens of minutes at ~10M rows; CTAS + table scan
        # is the fast path for every query shape
        con.execute("CREATE OR REPLACE TEMP TABLE __want AS " + sql)
        want = con.execute("SELECT * FROM __want").df()
    except Exception as e:
        fail(name, f"exec error: {e}"); continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        fail(name, f"schema: {list(got.columns)} vs {list(want.columns)}")
        continue
    if len(got) != len(want):
        fail(name, f"rows: {len(got)} vs {len(want)}"); continue
    # dtype-strict: the driver's hash distinguishes int 2 from float 2.0
    # (DuckDB sum()->HUGEINT->float64 vs Spark BIGINT), so flag kind
    # mismatches even when values compare == .
    kind_bad = [
        (c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
        if got[c].dtype.kind != want[c].dtype.kind
        and {got[c].dtype.kind, want[c].dtype.kind} - {"i", "u"}
        # nullable columns surface as object/float; only flag int-vs-float
        and {got[c].dtype.kind, want[c].dtype.kind} <= {"i", "u", "f", "b"}
    ]
    if kind_bad:
        fail(name, f"dtype kind mismatch (spark vs duck): {kind_bad}")
        continue
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].apply(
                    lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                    str(type(v)).find('ndarray') >= 0 else v)
            # normalize tz-aware vs naive timestamps
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype(str)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        # repr-strict: hash on the printed value, like the driver —
        # catches -0.0 vs 0.0 and int-vs-float that == would mask
        for c in df.columns:
            if df[c].dtype.kind == "f":
                df[c] = df[c].map(lambda v: None if pd.isna(v) else repr(v))
            elif df[c].dtype.kind in "iu":
                # width is immaterial to the driver's repr-hash
                df[c] = df[c].astype("int64")
        return df
    g, w = norm(got), norm(want)
    if not g.equals(w):
        diff_mask = ~(g == w) & ~(g.isna() & w.isna())
        ndiff = int(diff_mask.any(axis=1).sum())
        i = diff_mask.any(axis=1).idxmax() if ndiff else 0
        fail(name, f"{ndiff} differing rows; first:\n  spark={g.loc[i].to_dict()}\n  duck ={w.loc[i].to_dict()}")
        continue
    results[name] = {"pass": True, "rows": len(got),
                     "sec": round(time.time() - t0, 1)}
    print(f"PASS {name} ({len(got)} rows, {results[name]['sec']}s)",
          flush=True)
for name, why in fails:
    results[name] = {"pass": False,
                     "err": why.split("\n")[0][:200]}
    print(f"FAIL {name}: {why}")
n_run = len(results)
print(f"\n{n_run - len(fails)}/{n_run} pass"
      + (f" ({len(skip)} skipped: {','.join(sorted(skip))})" if skip
         else ""))
if os.environ.get("CHECK_JSON"):
    with open(os.environ["CHECK_JSON"], "w") as f:
        json.dump({"sf_dir": sf_dir, "pass": n_run - len(fails),
                   "run": n_run, "skipped": sorted(skip),
                   "queries": results}, f, indent=1, sort_keys=True)
sys.exit(1 if fails else 0)
