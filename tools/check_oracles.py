"""Local stand-in for the driver's CORRECTNESS check: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at sf0.01,
compare row count + order-insensitive normalized values.

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import decimal
import math
import sys

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return str(v)


def rowset(df_pandas):
    cols = sorted(df_pandas.columns)
    out = []
    for _, row in df_pandas[cols].iterrows():
        out.append(tuple(norm(v) for v in row))
    return sorted(out, key=repr), cols  # repr-key: rows may hold None/bool/str mixes


def main():
    import os

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from ont_d2rq_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracle:
            print(f"skip  {name}: no oracle (rows-only), rows={len(sdf)}")
            continue
        try:
            ddf = con.sql(oracle[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        srows, scols = rowset(sdf)
        drows, dcols = rowset(ddf)
        if scols != dcols:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} duck={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(drows)}")
            continue
        if srows != drows:
            failures.append(name)
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            continue
        print(f"ok    {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
