"""Classic relational benchmarks over the TPC-H-ish testdata tables —
the §2.9 checklist exercised natively (scan → filter pushdown → join →
aggregate → sort), with plan-quality choices spelled out:

- Q1: single hash aggregate after a pushed-down date filter (no join).
- Q3: 3-way join; the filtered `customer` side is explicitly broadcast;
  final TopK runs as TakeOrderedAndProject (no full sort).
- Q5: region/nation are tiny dimensions — explicitly broadcast so the
  fact-side joins stay shuffle-free on the dimension side.

Money aggregates run in DECIMAL (exact, order-independent — double
summation order differs between engines/partitionings and would break
the driver's value-hash), then round+cast back to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_DEC = "decimal(18,4)"
_DEC_WIDE = "decimal(30,8)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _disc_price():
    return (F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))).cast(_DEC_WIDE)


def tpch_q1(spark: SparkSession, sf_dir: str, ship_date: str = "1998-09-02") -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    cnt = F.count("*")
    return (li.filter(F.col("l_shipdate") <= F.lit(ship_date).cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
                 F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
                 F.round(F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / cnt, 6).alias("avg_qty"),
                 F.round(F.sum(F.col("l_discount").cast(_DEC)).cast("double") / cnt, 6).alias("avg_disc"),
                 cnt.alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def tpch_q3(spark: SparkSession, sf_dir: str, segment: str = "BUILDING",
            date: str = "1995-03-15", k: int = 10) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape) — joins + agg + deterministic top-k."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(date).cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(date).cast("timestamp"))
    return (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
            .limit(k)
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"))


def tpch_q5(spark: SparkSession, sf_dir: str, region: str = "ASIA",
            date_lo: str = "1996-01-01", date_hi: str = "1997-01-01") -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape) — 6-way join, broadcast dims."""
    region_df = _t(spark, sf_dir, "region").filter(F.col("r_name") == region)
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    return (li
            .join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .join(cust, orders["o_custkey"] == cust["c_custkey"])
            .join(supplier, (li["l_suppkey"] == supplier["s_suppkey"])
                  & (cust["c_nationkey"] == supplier["s_nationkey"]))
            .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
            .join(F.broadcast(region_df), nation["n_regionkey"] == region_df["r_regionkey"])
            .groupBy("n_name")
            .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"))
            .select("n_name", "revenue"))
