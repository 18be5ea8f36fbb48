#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs each oracle in DuckDB with the sf tables
registered as views, sorts columns by name, and compares values
(exact for non-floats, tolerant then exact-hash for floats).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name in sorted(oracles):
    sql = oracles[name]
    res_dir = os.path.join(out_dir, name)
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no result dir"); fails += 1; continue
    try:
        got = pd.read_parquet(res_dir)
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:300]}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    # normalize dtypes for compare
    bad = None
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_datetime64_any_dtype(a) or pd.api.types.is_datetime64_any_dtype(b):
            a = pd.to_datetime(a).dt.tz_localize(None) if not pd.api.types.is_datetime64_any_dtype(a) or a.dt.tz is None else a.dt.tz_convert("UTC").dt.tz_localize(None)
            b = pd.to_datetime(b)
            if hasattr(b.dt, "tz") and b.dt.tz is not None:
                b = b.dt.tz_convert("UTC").dt.tz_localize(None)
            eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
        elif pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av, bv = a.astype(float).values, b.astype(float).values
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                close = np.isclose(av, bv, rtol=1e-12, equal_nan=True)
                if close.all():
                    bad = (c, "float-close-but-not-exact",
                           av[~eq][:3], bv[~eq][:3])
                    break
        else:
            eq = (a.astype(object).values == b.astype(object).values) | (pd.isna(a).values & pd.isna(b).values)
        if not eq.all():
            i = np.nonzero(~eq)[0][:3]
            bad = (c, "mismatch", a.iloc[i].tolist(), b.iloc[i].tolist())
            break
        # dtype check (schema match); ignore datetime64 unit differences
        # (pandas/pyarrow version noise, values already compared equal)
        da, db = str(a.dtype), str(b.dtype)
        if da != db and not (da.startswith("datetime64") and db.startswith("datetime64")):
            bad = (c, f"dtype {a.dtype} vs {b.dtype}", None, None)
            break
    if bad:
        print(f"FAIL {name}: col={bad[0]} {bad[1]} got={bad[2]} want={bad[3]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
