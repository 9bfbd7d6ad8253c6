"""Tpch core queries (split from the former monolithic plans/queries.py).

Importing this module REGISTERS its queries (oracle SQL inline) into
the shared registry — plans/queries.py imports every family module in
the original definition order, so driver-facing ordering is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from ._registry import QUERIES, _ctx, _dsum6, _fsum6, _register

# =====================================================================
# TPC-H-style analytics (scans, joins, aggregation, sort/limit)
# =====================================================================


@_register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum_qty, sum_base_price, sum_disc_price, sum_charge,
           sum_qty        / count_order AS avg_qty,
           sum_base_price / count_order AS avg_price,
           sum_disc       / count_order AS avg_disc,
           count_order
    FROM (
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1000000.0                          AS sum_qty,
             CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1000000.0     AS sum_base_price,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * 1000000.0 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1000000.0     AS sum_disc_price,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 1000000.0 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1000000.0     AS sum_charge,
             CAST(sum(CAST(floor(l_discount * 1000000.0 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1000000.0                          AS sum_disc,
             count(*)                                             AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus)
    """,
    survey="S4 A1 O2 (flagship: TPC-H Q1 shape)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All money sums accumulate exactly in int64 micro-units (_fsum6):
    every addend has <= 6 intrinsic decimals (2dp price x 2dp discount x
    2dp tax), so floor(x*1e6+0.5) recovers the exact integer per row and
    the sum is exact and associative at ANY scale factor — the plain
    double sum verified green at sf0.1 flipped its last ulp at 100x
    (sum_charge ~2.8e11), and even _dsum6's decimal->double final cast
    diverged there (DuckDB double-rounds int128/1e6). The avgs divide
    the identically-derived double sum by the count (one IEEE division
    on identical operands in both engines) instead of avg()'s own
    order-dependent double accumulation."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cnt = F.col("count_order")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _fsum6(F.col("l_quantity")).alias("sum_qty"),
            _fsum6(F.col("l_extendedprice")).alias("sum_base_price"),
            _fsum6(disc).alias("sum_disc_price"),
            _fsum6(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            _fsum6(F.col("l_discount")).alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            (F.col("sum_qty") / cnt).alias("avg_qty"),
            (F.col("sum_base_price") / cnt).alias("avg_price"),
            (F.col("sum_disc") / cnt).alias("avg_disc"),
            "count_order",
        )
    )


@_register(
    "q03_top_revenue_orders",
    """
    SELECT o_orderkey,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 6)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           epoch_us(o_orderdate)                   AS orderdate_us
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    survey="J1-shape S4 A1 O3 (TPC-H Q3 shape; broadcast dim join)",
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _ctx(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        li.join(
            orders.join(
                F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
                F.col("o_custkey") == F.col("c_custkey"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            # addends have exactly 4 intrinsic decimals (2dp price ×
            # 2dp discount): the per-row round recovers the exact value
            # and the decimal accumulation is exact at ANY n — see _dsum6
            _dsum6(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@_register(
    "q05_nation_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * 1000000.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000.0 AS revenue,
           count(*) AS n_items
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
    survey="J1-shape S4 A1 (snowflake join chain; broadcast dims)",
)
def q05_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, cust, orders, li = _ctx(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem"
    )
    dims = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            # nation-level totals pass 1e11 at 100x — exact micro-unit
            # accumulation (_fsum6), not an order-dependent double sum
            _fsum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "o03_topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    survey="O3 (top-k: TakeOrdered, no full sort)",
)
def o03_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _ctx(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@_register(
    "u01_union_slices",
    """
    SELECT o_orderkey, o_totalprice, 'high' AS slice
    FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'urgent' AS slice
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    survey="U1 (unionByName collation)",
)
def u01_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _ctx(spark, sf_dir, "orders")
    a = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_totalprice")
        .withColumn("slice", F.lit("high"))
    )
    b = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice")
        .withColumn("slice", F.lit("urgent"))
    )
    return a.unionByName(b)


@_register(
    "w01_rank_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    survey="O2 window-rank (per-group top-k)",
)
def w01_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _ctx(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


