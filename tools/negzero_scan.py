#!/usr/bin/env python3
"""Sweep every oracle SQL for -0.0 cells in its DuckDB result.

Usage: negzero_scan.py <oracle_sql.json> <sf_dir> [sf_dir ...]

The driver hashes RENDERED values; DuckDB round() preserves the sign of
zero while Spark's BigDecimal round() cannot, so any oracle that emits a
-0.0 cell at the gate scale hash-mismatches a value-identical Spark
result (the r12 q184 failure). This sweep finds every such oracle on the
actual gate data so its final select can be normalized with `+ 0`.
"""
import json, sys, os, math
import duckdb
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def scan(sqls, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    hits = []
    for name, sql in sorted(sqls.items()):
        if sql is None:
            continue
        try:
            df = con.execute(sql).df()
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:160]}")
            continue
        cells = []
        for c in df.columns:
            col = df[c]
            if col.dtype.kind != "f":
                continue
            vals = col.to_numpy()
            negz = (vals == 0.0) & np.signbit(vals)
            if negz.any():
                idx = np.flatnonzero(negz)
                cells.append((c, idx[:5].tolist(), int(negz.sum())))
        if cells:
            hits.append(name)
            print(f"NEGZERO {name} @ {os.path.basename(sfdir)}: {cells}")
    con.close()
    return hits

def main():
    if len(sys.argv) < 3:
        print(__doc__); sys.exit(2)
    sqls = json.load(open(sys.argv[1]))
    allhits = set()
    for sfdir in sys.argv[2:]:
        print(f"--- scanning {sfdir} ({len(sqls)} oracles) ---")
        allhits.update(scan(sqls, sfdir))
    print(f"\n{len(allhits)} oracle(s) with -0.0 cells: {sorted(allhits)}"
          if allhits else "\nclean: no -0.0 cells in any oracle result")
    sys.exit(1 if allhits else 0)

main()
