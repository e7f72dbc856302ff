#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 bin/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Loads each table parquet in sfDir as a DuckDB view, runs every entry of
verifyOutDir/oracle_sql.json, reads the Spark result parquet for the same
query, and compares them as multisets (column order as declared; exact
value equality — the queries are designed bit-stable). Prints PASS/FAIL
per query and a summary.
"""
import json
import math
import sys

import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ("documents", "events", "orders", "lineitem", "part", "nation",
          "region", "customer", "supplier", "embeddings"):
    try:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    except Exception:
        pass

oracles = json.load(open(f"{out}/oracle_sql.json"))


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


fails = []
for name in sorted(oracles):
    if only and name not in only:
        continue
    sql = oracles[name]
    try:
        o = con.execute(sql).fetchall()
        ocols = [d[0] for d in con.description]
        s = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchall()
        scols = [d[0] for d in con.description]
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            # align by name
            idx = [scols.index(c) if c in scols else
                   [i for i, sc in enumerate(scols) if sc.lower() == c.lower()][0]
                   for c in ocols]
            s = [tuple(r[i] for i in idx) for r in s]
        om = sorted(tuple(canon(v) for v in r) for r in o)
        sm = sorted(tuple(canon(v) for v in r) for r in s)
        if om == sm:
            print(f"PASS {name} rows={len(om)}")
        else:
            fails.append(name)
            diff_o = [r for r in om if r not in set(sm)][:3]
            diff_s = [r for r in sm if r not in set(om)][:3]
            print(f"FAIL {name} oracle_rows={len(om)} spark_rows={len(sm)}")
            print(f"  oracle-only: {diff_o}")
            print(f"  spark-only:  {diff_s}")
    except Exception as e:
        fails.append(name)
        print(f"ERR  {name}: {e}")

print(f"\n{'ALL PASS' if not fails else 'FAILURES: ' + ', '.join(fails)}")
sys.exit(1 if fails else 0)
