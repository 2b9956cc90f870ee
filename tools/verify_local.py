#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
  1. (caller) sbt "runMain graft.Verify <sfDir> <outDir>" first
  2. this script loads each <outDir>/<name> parquet, runs the matching
     oracle SQL from <outDir>/oracle_sql.json in DuckDB over <sfDir>'s
     tables, and compares: row count, column names/types, and values
     (columns sorted by name, rows sorted by all columns).

Memory contract (r16 lesson): each gate's frames are freed before the
next gate starts — the compare runs inside a function (locals die on
return) followed by an explicit gc.collect(). Without this, a full-scale
sf10 pass accumulated every gate's pandas frames and hit DuckDB's
100 GiB ceiling, forcing one-process-per-gate certification runs.
"""
import sys, json, glob, os, gc
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    # DRIVER-FAITHFUL: sort RAW cells exactly like the driver's comparator.
    # Round 9's two red rows shipped because this used to stringify first
    # (df.astype(str)) — arrays sorted fine locally and crashed only at the
    # driver ("TypeError: unhashable type: 'numpy.ndarray'"). A crash here
    # is the correct local signal; Verify.dump also rejects array/map/struct
    # gate columns in-JVM before it can get this far.
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def cell(v):
    import math
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(cell(x) for x in v)
    if isinstance(v, float):
        return "__nan__" if math.isnan(v) else round(v, 9)
    return v

def check_gate(con, oracle, name, d):
    """One gate's load + oracle + compare. Returns 'pass' / 'fail' /
    'rows-only'. All frames are locals: they are freed on return, so the
    process footprint is ONE gate's data, not the whole run's."""
    # a failed query leaves a marker dir with _ERROR.txt instead of
    # parquet (Verify.dump) — record an err row, don't crash the gate
    marker = os.path.join(d, "_ERROR.txt")
    if os.path.exists(marker):
        msg = open(marker).read()
        print(f"[FAIL] {name}: query error: {msg.splitlines()[0][:160]}")
        return "fail"
    try:
        got = pd.read_parquet(d)
    except Exception as e:
        print(f"[FAIL] {name}: unreadable result: {e}")
        return "fail"
    if name not in oracle:
        print(f"[rows-only] {name}: rows={len(got)}")
        return "rows-only"
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"[FAIL] {name}: oracle error: {e}")
        return "fail"
    if sorted(got.columns) != sorted(exp.columns):
        print(f"[FAIL] {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
        return "fail"
    if len(got) != len(exp):
        print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}")
        return "fail"
    try:
        g, e = canon(got), canon(exp)
    except Exception as ex:
        # mirrors the driver's `err` row for comparator crashes
        print(f"[FAIL] {name}: comparator error (driver-faithful "
              f"raw sort): {type(ex).__name__}: {ex}")
        return "fail"
    gv = [tuple(cell(v) for v in row) for row in g.itertuples(index=False)]
    ev = [tuple(cell(v) for v in row) for row in e.itertuples(index=False)]
    gv.sort(key=str); ev.sort(key=str)
    if gv != ev:
        diffs = [(a, b) for a, b in zip(gv, ev) if a != b][:3]
        print(f"[FAIL] {name}: value mismatch; first diffs: {diffs}")
        return "fail"
    print(f"[ok] {name}: rows={len(got)}")
    return "pass"

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Spill, don't die: an in-memory DuckDB has NO temp directory, so a
    # big sort/agg that would spill instead aborts the process — on this
    # host the practical per-process allocation ceiling (~13 GiB) is hit
    # by the heaviest single sf10 oracle. A bounded memory_limit + a temp
    # dir turns that into disk spill; the wordpiece sf10 oracle measures
    # FASTER spilled at 8 GB (89 s) than unspilled at the default (143 s).
    con.execute("SET memory_limit='8GB'")
    con.execute("SET temp_directory='/tmp/graft_duckdb_spill'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        # a table may be a single file (driver tiers) or a directory of
        # part files (GenScale multi-file layout)
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        r = check_gate(con, oracle, name, d)
        if r == "pass":
            n_pass += 1
        elif r == "fail":
            n_fail += 1
        gc.collect()  # drop this gate's frames before the next loads
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
