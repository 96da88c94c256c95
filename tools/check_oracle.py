#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, registers each test table as a DuckDB view
over <sf_dir>/<name>.parquet, runs every oracle, loads the matching
Spark-written parquet, sorts columns by name and rows by all values,
and compares cell-by-cell (floats exactly — determinism is the point).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # decimals -> float-compatible string; timestamps/dates -> isoformat
    import decimal
    import datetime
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            odf = con.sql(sql)
            ocols = [d[0] for d in odf.description]
            orows = odf.fetchall()
            sdf = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in sdf.description]
            srows = sdf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        oc, orows = canon(orows, ocols)
        sc, srows = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns oracle={oc} spark={sc}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(orows, srows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  oracle={bad[1]}\n  spark ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
