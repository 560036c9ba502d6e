#!/usr/bin/env python3
"""Arrow-level output-TYPE gate (r11 alignment + r12 decimal ban).

The driver's hash compare is sensitive to the PHYSICAL Arrow type of a
column, not just its values. Two rules, both enforced here:

1. ALIGNMENT (r11): oracle output type = Spark output type, always —
   DuckDB exports HUGEINT as decimal128(38,0), so an oracle column that
   drifts to int128 hashes differently from a value-equal Spark BIGINT.
   Widths within the int family (int8/16/32/64) are exempt (proven
   hash-compatible by the driver's ten INTEGER-vs-BIGINT rows).

2. DECIMAL BAN (r12): NO decimal128 column may appear in ANY query
   output, on EITHER engine. The r11 controlled experiment proved
   alignment alone is insufficient for decimals: the four queries whose
   outputs were value-identical, type-aligned decimal128(38,0) on both
   sides all stayed driver hash-red, while the BIGINT-landing fix
   (hard_negative_mining) greened. Decimal128 is allowed internally;
   at the SELECT boundary wide values must be emitted as BIGINT (when
   they fit) or canonical digit strings (both engines render plain
   digits, sign included, no exponent).

Usage: python3 scripts/typecheck.py <sfDir> <verifyOutDir>
Exit 0 = aligned and decimal-free; 1 = at least one violation.
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
        # r12 decimal ban: presence on either side is a failure, even
        # when the sides agree (alignment did not green decimals).
        # ONE violation per (query, column) however many sides/checks
        # trip (ADVICE r13: a both-sides decimal column previously
        # counted up to 3×, inflating the summary line).
        flagged = set()
        for side, types in (("spark", stypes), ("oracle", otypes)):
            for c, t in sorted(types.items()):
                if pa.types.is_decimal(t) and (name, c) not in flagged:
                    flagged.add((name, c))
                    sides = [sd for sd, ty in (("spark", stypes),
                                               ("oracle", otypes))
                             if c in ty and pa.types.is_decimal(ty[c])]
                    # both sides' actual types in the detail (ADVICE
                    # r13): a spark-decimal vs oracle-non-decimal column
                    # skips the mismatch check below, so the cross-engine
                    # detail must survive in THIS record
                    both = " vs ".join(
                        f"{sd}={ty[c]}" for sd, ty in (("spark", stypes),
                                                       ("oracle", otypes))
                        if c in ty)
                    bad.append((name, c,
                                f"DECIMAL-OUTPUT[{'+'.join(sides)}]",
                                both))
        for c in sorted(set(stypes) & set(otypes)):
            if (name, c) in flagged:
                continue
            st, ot = stypes[c], otypes[c]
            if st == ot:
                continue
            if family(st) == family(ot) == "int":
                continue
            bad.append((name, c, str(st), str(ot)))

    for name, c, st, ot in bad:
        print(f"TYPE-VIOLATION {name}.{c}: {st} vs {ot}")
    print(f"\n{n_checked} oracled queries checked, "
          f"{len(bad)} type violations (mismatch or decimal128 output)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
