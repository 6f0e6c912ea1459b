#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py <verifyOutDir> <sfDir> [query ...]

Reads each Spark result parquet written by graft.Verify, runs the paired
oracle SQL in DuckDB over the same fixture parquet, sorts columns by name
and rows by all columns (the driver's compare sorts columns by name before
hashing values), and diffs exactly.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df, name, side):
    # Faithful to the driver: NO coercion of array/struct cells. The real
    # driver's pandas compare sorts rows by all columns and throws
    # "unhashable type: numpy.ndarray" on array cells — so we hard-FAIL any
    # result that contains one, BEFORE sorting, with an actionable message.
    import numpy as np
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (list, tuple, dict, np.ndarray))).any()
            if bad:
                raise TypeError(
                    f"{name} ({side}) column '{c}' contains array/struct cells — "
                    "serialize to string (concat_ws / array_to_string): the driver "
                    "cannot hash arrays")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (ScaleUp fixtures): directory of part files
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"ok?  {name}: rows-only check, {len(got)} rows" + (" (EMPTY!)" if len(got) == 0 else ""))
            n_ok += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        try:
            g, w = canon(got, name, "spark"), canon(want, name, "oracle")
        except TypeError as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}"); n_bad += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_bad += 1; continue
        bad_cols = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a.astype(object).where(a.notna(), None) == b.astype(object).where(b.notna(), None)) | (a.isna() & b.isna())
                same = bool(eq.all())
            except Exception:
                same = list(a) == list(b)
            if not same:
                bad_cols.append(c)
        if bad_cols:
            n_bad += 1
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                mask = ~((g[c].astype(object).where(g[c].notna(), None) == w[c].astype(object).where(w[c].notna(), None)) | (g[c].isna() & w[c].isna()))
                idx = list(mask[mask].index[:3])
                for i in idx:
                    print(f"    [{c}] row {i}: spark={g[c][i]!r} oracle={w[c][i]!r}")
        else:
            dt = [f"{c}:{g[c].dtype}!={w[c].dtype}" for c in g.columns if g[c].dtype != w[c].dtype]
            note = f" (dtype drift: {dt})" if dt else ""
            print(f"OK   {name}: {len(g)} rows{note}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
