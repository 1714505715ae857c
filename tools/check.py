#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify output parquet,
run each oracle SQL in DuckDB over the same sf dir, compare (columns sorted
by name, rows sorted, values exact + approx report). Usage:
  python3 tools/check.py <outDir> <sfDir> [query ...]
"""
import json, sys, glob, os
import duckdb, pandas as pd, numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_df = pd.read_parquet(f"{outdir}/{name}")
    duck_df = con.sql(sql).df()
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        # list/array cells aren't orderable; stringify them so the row
        # sort (and value compare) still works for array-valued queries
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                    lambda v: isinstance(v, (list, np.ndarray))).any():
                df[c] = df[c].map(
                    lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else str(v))
        return df.sort_values(by=list(df.columns), ignore_index=True)
    s, d = norm(spark_df), norm(duck_df)
    status = []
    if list(s.columns) != list(d.columns):
        status.append(f"COLS spark={list(s.columns)} duck={list(d.columns)}")
    elif len(s) != len(d):
        status.append(f"ROWS spark={len(s)} duck={len(d)}")
    else:
        for c in s.columns:
            sv, dv = s[c].values, d[c].values
            if s[c].dtype.kind == 'f':
                both_nan = pd.isna(sv) & pd.isna(dv)
                eq = (sv == dv) | both_nan
                if not eq.all():
                    mx = np.nanmax(np.abs(sv.astype(float) - dv.astype(float)))
                    status.append(f"VAL {c}: {np.sum(~eq)} diffs, maxabs={mx:.3e}")
            else:
                sv2 = pd.Series(sv).astype(str).values
                dv2 = pd.Series(dv).astype(str).values
                if not (sv2 == dv2).all():
                    n = np.sum(sv2 != dv2)
                    i = np.argmax(sv2 != dv2)
                    status.append(f"VAL {c}: {n} diffs e.g. [{i}] {sv2[i]!r} vs {dv2[i]!r}")
        # dtype report (schema-match risk)
        dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
              if str(s[c].dtype) != str(d[c].dtype)]
        if dt:
            status.append(f"DTYPE {dt}")
    if status:
        fail += 1
        print(f"FAIL {name} ({len(s)} rows): " + "; ".join(status))
    else:
        print(f"OK   {name} ({len(s)} rows)")
print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
