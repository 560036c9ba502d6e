#!/usr/bin/env python3
"""Arrow-level output-TYPE alignment gate (r11).

The driver's hash compare is sensitive to the PHYSICAL Arrow type of a
column, not just its values: DuckDB exports HUGEINT as decimal128(38,0),
so an oracle column that drifts to int128 hashes differently from a
value-equal Spark BIGINT (the r10 hash-red lesson: embedding_covariance_
topk / hard_negative_mining / incremental_stats_merge were value-exact
yet red). Rule: oracle output type = Spark output type, always — a
HUGEINT never reaches a SELECT list.

This script enforces the rule mechanically: for every query in a Verify
dump it compares the Arrow schema of the Spark parquet result against
the Arrow schema of the DuckDB oracle result and flags any column whose
types differ, EXCEPT the int-width family (int8/16/32/64), which the
driver's ten INTEGER-vs-BIGINT rows prove hash-compatible.

Usage: python3 scripts/typecheck.py <sfDir> <verifyOutDir>
Exit 0 = aligned; 1 = at least one risky mismatch.
"""
import json
import os
import sys

import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Widths within one integer family hash identically in the driver
# (proven by the ten passing INTEGER-vs-BIGINT rows).
INT_FAMILY = {"int8", "int16", "int32", "int64"}


def family(t: pa.DataType) -> str:
    s = str(t)
    return "int" if s in INT_FAMILY else s


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    bad = []
    n_checked = 0
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        sschema = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet') LIMIT 0"
        ).fetch_arrow_table().schema
        oschema = con.execute(
            f"SELECT * FROM ({oracle[name]}) q LIMIT 0"
        ).fetch_arrow_table().schema
        n_checked += 1
        stypes = {f.name: f.type for f in sschema}
        otypes = {f.name: f.type for f in oschema}
        for c in sorted(set(stypes) & set(otypes)):
            st, ot = stypes[c], otypes[c]
            if st == ot:
                continue
            if family(st) == family(ot) == "int":
                continue
            bad.append((name, c, str(st), str(ot)))

    for name, c, st, ot in bad:
        print(f"TYPE-MISMATCH {name}.{c}: spark={st} oracle={ot}")
    print(f"\n{n_checked} oracled queries checked, "
          f"{len(bad)} risky column-type mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
