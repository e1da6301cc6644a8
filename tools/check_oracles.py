"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row counts + order-insensitive value multisets (columns sorted by name).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from defuddle_spark.spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        spark_rows = df.collect()
        spark_cols = df.columns
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(spark_rows)} rows"
                  f" cols={spark_cols}")
            continue
        res = con.sql(oracles[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ms_s = rows_to_multiset(spark_cols, [tuple(r) for r in spark_rows])
        ms_d = rows_to_multiset(duck_cols, duck_rows)
        ok_vals = ms_s == ms_d
        status = "OK " if (ok_cols and ok_vals) else "FAIL"
        print(f"{name:22s} {status} spark={len(spark_rows)} duck={len(duck_rows)}"
              f" cols_match={ok_cols}")
        if not ok_cols:
            print(f"   spark cols: {spark_cols}\n   duck cols:  {duck_cols}")
        if not ok_vals and ok_cols:
            only_s = list((ms_s - ms_d).items())[:3]
            only_d = list((ms_d - ms_s).items())[:3]
            print(f"   only-in-spark: {only_s}\n   only-in-duck:  {only_d}")
        if not (ok_cols and ok_vals):
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
