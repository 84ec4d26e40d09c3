#!/usr/bin/env python3
"""Replay the driver's correctness gate locally.

Usage: oracle_check.py <verify_out_dir> <sf_dir> [query ...]

Reads <verify_out_dir>/oracle_sql.json, runs each SQL in DuckDB with the
sf_dir parquet tables registered as views, loads the Spark result from
<verify_out_dir>/<name>.parquet, and compares rows/schema/values the way
the driver does (columns sorted by name, rows sorted, float tolerance).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet"))) \
            or sorted(glob.glob(os.path.join(outdir, name + ".parquet", "*.parquet"))) \
            or [os.path.join(outdir, name + ".parquet")]
    con = duckdb.connect()
    df = con.execute("SELECT * FROM read_parquet(" + json.dumps(files) + ")").df()
    con.close()
    return df

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # REFUSE array/map/struct cells instead of papering over them: the
    # driver's differ crashes on them ('unhashable type: numpy.ndarray'),
    # so a local pass here would not mean a pass at the driver. Entries
    # must be unpivoted to fixed-width rows (posexplode) — the
    # q74/q91/q92 lesson.
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (np.ndarray, list, tuple, dict))).any()
            if bad:
                raise RuntimeError(
                    f"column '{c}' holds array/map cells — the driver differ cannot "
                    "sort arrays; unpivot the entry to fixed-width rows (posexplode)")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None: return True
    try:
        if pd.isna(a) and pd.isna(b): return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (float, np.floating)) or isinstance(b, (float, np.floating)):
        try:
            fa, fb = float(a), float(b)
            if np.isnan(fa) and np.isnan(fb): return True
            return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
        except (TypeError, ValueError):
            return False
    return a == b

def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sqls = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    unknown = only - set(sqls)
    if unknown:
        # a typo'd filter must not skip everything and read as a pass
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    ran = 0
    for name, sql in sorted(sqls.items()):
        if only and name not in only: continue
        ran += 1
        try:
            oracle = canon(con.execute(sql).df())
            spark = canon(load_spark(outdir, name))
            rows_ok = len(oracle) == len(spark)
            schema_ok = list(oracle.columns) == list(spark.columns)
            vals_ok = rows_ok and schema_ok and all(
                cmp_cell(spark.iat[i, j], oracle.iat[i, j])
                for i in range(len(spark)) for j in range(len(spark.columns)))
            ok = rows_ok and schema_ok and vals_ok
            if not ok:
                fails += 1
                print(f"FAIL {name}: rows {len(spark)}/{len(oracle)} schema_ok={schema_ok} "
                      f"spark_cols={list(spark.columns)} oracle_cols={list(oracle.columns)}")
                if rows_ok and schema_ok:
                    for i in range(len(spark)):
                        for j in range(len(spark.columns)):
                            if not cmp_cell(spark.iat[i, j], oracle.iat[i, j]):
                                print(f"  first diff at row {i} col {spark.columns[j]}: "
                                      f"spark={spark.iat[i, j]!r} oracle={oracle.iat[i, j]!r}")
                                break
                        else: continue
                        break
            else:
                print(f"ok   {name} ({len(spark)} rows)")
        except Exception as e:
            fails += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    verdict = "ALL GREEN" if fails == 0 else f"{fails} FAILURES"
    print(f"\n{verdict} ({ran} queries checked)")
    sys.exit(1 if fails else 0)

main()
