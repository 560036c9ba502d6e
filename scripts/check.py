#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Mimics the driver: for each query dir under <verifyOutDir>, read the Spark
parquet result, run the matching oracle SQL from oracle_sql.json in DuckDB
(with each fixture table registered as a view over <sfDir>/<t>.parquet),
sort columns by name, and compare values row-by-row (exact; floats exact
after both sides' own rounding).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    results = {}
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in qdirs:
        spark_path = os.path.join(out_dir, name, "*.parquet")
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}')").fetch_arrow_table()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({sdf.num_rows} rows)" if sdf.num_rows else "EMPTY (rows-only)"
            continue
        try:
            odf = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"
            continue
        scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
        if scols != ocols:
            results[name] = f"SCHEMA-MISMATCH spark={scols} oracle={ocols}"
            continue
        srows = [tuple(norm(r[c]) for c in scols) for r in sdf.to_pylist()]
        orows = [tuple(norm(r[c]) for c in ocols) for r in odf.to_pylist()]
        if len(srows) != len(orows):
            results[name] = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            results[name] = f"VALUE-MISMATCH {len(bad)}/{len(srows)} rows; first row {i}:\n  spark : {a}\n  oracle: {b}"
        else:
            results[name] = f"OK ({len(srows)} rows)"

    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith(('OK', 'rows-only')) else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{n_ok}/{len(results)} pass")
    missing_dirs = set(oracle) - set(qdirs)
    if missing_dirs:
        print(f"oracle entries with no spark output: {sorted(missing_dirs)}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
