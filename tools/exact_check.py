#!/usr/bin/env python3
"""EXACT (no-tolerance) local correctness gate.

Usage: exact_check.py <verify_out_dir> <sf_dir> [query ...]

Same harness as oracle_check.py but cells must match EXACTLY (bit-equal
floats; NaN==NaN and null==null allowed). The driver's t2 gate is an
exact hash over round-6-rendered values, so tolerance passes locally can
still hash-mismatch at the driver (the r11 q184/q200/q211 lesson) — run
THIS at both sf0.01 and sf0.1 before claiming green.
"""
import json, sys, glob, os, math
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
    for c in df.columns:
        if df[c].dtype == object:
            if df[c].map(lambda v: isinstance(v, (np.ndarray, list, tuple, dict))).any():
                raise RuntimeError(f"column '{c}' holds array/map cells — unpivot the entry")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

def cmp_cell(a, b):
    if a is None and b is None: return True
    try:
        if pd.isna(a) and pd.isna(b): return True
        if pd.isna(a) != pd.isna(b): return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (float, np.floating)) or isinstance(b, (float, np.floating)):
        try:
            fa, fb = float(a), float(b)
            if np.isnan(fa) and np.isnan(fb): return True
            if fa != fb: return False  # EXACT — no tolerance
            # The driver hashes RENDERED values, and -0.0 renders as
            # "-0.0" while +0.0 renders as "0.0" — IEEE fa == fb is TRUE
            # for that pair, so value equality alone is blind to the
            # exact divergence class that failed q184 at the r12 driver
            # gate. Require matching zero sign too.
            if fa == 0.0 and math.copysign(1.0, fa) != math.copysign(1.0, fb):
                return False
            return True
        except (TypeError, ValueError):
            return False
    return a == b

def selftest():
    # Planted signed-zero divergence: the gate MUST flag -0.0 vs 0.0
    # (the r12 q184 driver-hash failure mode) while still passing
    # genuinely-equal cells.
    assert cmp_cell(0.0, 0.0)
    assert cmp_cell(-0.0, -0.0)
    assert not cmp_cell(-0.0, 0.0), "gate blind to signed zero"
    assert not cmp_cell(0.0, -0.0), "gate blind to signed zero"
    assert cmp_cell(float("nan"), float("nan"))
    assert cmp_cell(None, None)
    assert not cmp_cell(1.0, 1.0000000001)
    assert cmp_cell(np.float64(-0.0), -0.0)
    assert not cmp_cell(np.float64(-0.0), np.float64(0.0))
    print("selftest OK (signed-zero divergence is caught)")
    sys.exit(0)

def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--selftest":
        selftest()
    if len(sys.argv) < 3:
        print(__doc__); sys.exit(2)
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sqls = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    unknown = only - set(sqls)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}"); sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = ran = 0
    for name, sql in sorted(sqls.items()):
        if only and name not in only: continue
        ran += 1
        try:
            oracle = canon(con.execute(sql).df())
            spark = canon(load_spark(outdir, name))
            rows_ok = len(oracle) == len(spark)
            schema_ok = list(oracle.columns) == list(spark.columns)
            ok = rows_ok and schema_ok and all(
                cmp_cell(spark.iat[i, j], oracle.iat[i, j])
                for i in range(len(spark)) for j in range(len(spark.columns)))
            if not ok:
                fails += 1
                print(f"FAIL {name}: rows {len(spark)}/{len(oracle)} schema_ok={schema_ok}")
                if rows_ok and schema_ok:
                    shown = 0
                    for i in range(len(spark)):
                        for j in range(len(spark.columns)):
                            if not cmp_cell(spark.iat[i, j], oracle.iat[i, j]):
                                print(f"  diff row {i} col {spark.columns[j]}: "
                                      f"spark={spark.iat[i, j]!r} oracle={oracle.iat[i, j]!r}")
                                shown += 1
                                break
                        if shown >= 3: break
            else:
                print(f"ok   {name} ({len(spark)} rows)")
        except Exception as e:
            fails += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{'ALL EXACT-GREEN' if fails == 0 else str(fails) + ' FAILURES'} ({ran} queries checked)")
    sys.exit(1 if fails else 0)

main()
