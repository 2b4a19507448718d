"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + sorted-column value multisets."""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from linref_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(",".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest(), len(lines)


def main():
    only = sys.argv[1:] or None
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        shash, sn = table_hash(srows, scols)
        if name not in oracles:
            print(f"{name:24s} rows-only  spark_rows={sn}")
            continue
        res = con.sql(oracles[name])
        ocols = res.columns
        orows = res.fetchall()
        ohash, on = table_hash(orows, ocols)
        ok_schema = sorted(scols) == sorted(ocols)
        status = "OK " if (shash == ohash and sn == on and ok_schema) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status} rows {sn}/{on} schema={'ok' if ok_schema else (scols, ocols)} hash={'ok' if shash == ohash else 'MISMATCH'}"
        )
        if status == "FAIL" and shash != ohash and sn == on and ok_schema:
            # show a few differing lines
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted(",".join(canon(r[i]) for i in order) for r in srows)
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oset = sorted(",".join(canon(r[i]) for i in oorder) for r in orows)
            diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            for a, b in diff:
                print(f"   spark:  {a}\n   oracle: {b}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
