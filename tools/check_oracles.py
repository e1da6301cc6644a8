"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row counts + schema + a TYPE-EXACT value multiset (columns sorted by name).

Type-exactness matters: the driver canonicalizes both sides through pandas
and hashes raw cell values, so an uncast DuckDB sum() (BIGINT -> HUGEINT ->
pandas float64 `10343.0`) must NOT compare equal to Spark's int64 `10343`.
Round-1's two hash-FAILs were exactly this class and the old norm_cell
(round floats, coerce ints) masked them. Cells are compared as
(type-name, value) pairs; floats additionally print at full repr on
mismatch so off-by-rounding is visible.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Type-exact canonical cell: keep the numpy/pandas scalar kind visible.

    numpy int64(5) == float64(5.0) under ==, so the type name is part of
    the key. All integer kinds collapse to 'int' and all float kinds to
    'float' (the driver compares pandas values after both sides round-trip
    through Arrow, where Spark LongType and DuckDB BIGINT are both int64 —
    width differences like int32-vs-int64 are caught by the dtype check,
    not the value hash).
    """
    t = type(v).__name__
    if "int" in t:
        return ("int", int(v))
    if "float" in t or t == "double":
        f = float(v)
        if math.isnan(f):
            return ("float", "nan")
        return ("float", f)
    if t in ("Decimal",):
        return ("decimal", str(v))
    return (t, v)


def canon(pdf):
    """Sort columns by name; return (dtypes-by-col, value multiset)."""
    pdf = pdf[sorted(pdf.columns)]
    dtypes = {c: str(pdf[c].dtype) for c in pdf.columns}
    ms = Counter(tuple(norm_cell(v) for v in row)
                 for row in pdf.itertuples(index=False, name=None))
    return dtypes, ms


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
        pdf_s = df.toPandas()
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(pdf_s)} rows"
                  f" cols={list(pdf_s.columns)}")
            continue
        pdf_d = con.sql(oracles[name]).df()
        ok_cols = sorted(pdf_s.columns) == sorted(pdf_d.columns)
        ok_rows = len(pdf_s) == len(pdf_d)
        ok_vals = False
        dt_diff = {}
        if ok_cols:
            dt_s, ms_s = canon(pdf_s)
            dt_d, ms_d = canon(pdf_d)
            # informational only: int width / datetime unit differences are
            # invisible to the driver's value hash, so they don't fail here
            dt_diff = {c: (dt_s[c], dt_d[c]) for c in dt_s if dt_s[c] != dt_d[c]}
            ok_vals = ms_s == ms_d
        ok = ok_cols and ok_rows and ok_vals
        status = "OK " if ok else "FAIL"
        print(f"{name:22s} {status} spark={len(pdf_s)} duck={len(pdf_d)}"
              f" cols={ok_cols} vals={ok_vals}"
              + (f" dtype_diffs={dt_diff}" if dt_diff else ""))
        if not ok_cols:
            print(f"   spark cols: {list(pdf_s.columns)}\n"
                  f"   duck cols:  {list(pdf_d.columns)}")
        elif not ok_vals:
            only_s = list((ms_s - ms_d).items())[:3]
            only_d = list((ms_d - ms_s).items())[:3]
            print(f"   only-in-spark: {only_s}\n   only-in-duck:  {only_d}")
        if not ok:
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
