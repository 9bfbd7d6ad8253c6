"""Driver-contract query registry (SURVEY.md §2 coverage).

Every entry pairs an idiomatic-Spark implementation with an equivalent
DuckDB oracle SQL over the same parquet tables; the driver hash-compares
them at sf=0.01 (BASELINE.md "t2"). Each entry is tagged with the
SURVEY.md §2 operator IDs it covers so coverage is auditable line by
line.

Conventions (the driver compare sorts columns by name and hashes values
order-insensitively):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- timestamps are output as integer epoch-microseconds (``*_us``) —
  bit-exact across engines, immune to session-timezone differences;
- nondeterministic selections (top-k, argmin/argmax) always carry a
  total tie-break;
- queries set session timezone UTC and read via sources.tables so they
  behave identically under the driver's own SparkSession.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    survey: str = ""  # SURVEY.md §2 operator IDs covered
    note: str = ""


QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, survey: str, note: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(spark=fn, oracle=oracle, survey=survey, note=note)
        return fn

    return deco


def _ctx(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load tables (nanos-compat parquet read; see sources/tables.py).

    The LOADERS are session-timezone independent at the storage layer
    (verified: tests/test_timezone_independence.py), and ``load_table``
    additionally pins ``spark.sql.session.timeZone=UTC`` so the
    calendar-function queries (year/weekofyear/date_trunc, date
    literals on LTZ columns) evaluate on the same UTC calendar as the
    DuckDB oracle's naive timestamps regardless of how the driver
    built its session. Measured boundary: none — a full driver_check
    sweep under ``--tz America/New_York`` is green (round 4; rounds
    1-3 it failed exactly the 14 calendar queries).
    """
    return [load_table(spark, sf_dir, n) for n in names]


def _dsum6(col) -> F.Column:
    """Exact sum of fixed-decimal data, scale-independent.

    ``round(sum(x), 6)`` of a double sum is only stable while the
    accumulated double error stays under the 5e-7 half-grid — that
    error grows with n·magnitude, so a form verified at sf0.1 can flip
    at larger scale factors. This form instead rounds each ADDEND to
    the 1e-6 grid (bit-identical per row on both engines — the same
    per-row round the old form applied once at the end) and accumulates
    in DECIMAL(38,6): exact, associative, partition-layout and
    scale-factor independent up to 1e32 totals. Oracle mirror:
    ``CAST(sum(CAST(round(x, 6) AS DECIMAL(38,6))) AS DOUBLE)``.
    """
    return F.sum(F.round(col, 6).cast("decimal(38,6)")).cast("double")


#: Driver-facing registration order. The correctness driver checks a
#: PREFIX window of the registry (50 queries in rounds 1-2), so the
#: highest-value coverage heads are listed first: the TPC-H plan-shape
#: family, the streaming family, and the north-star dedup/similarity/
#: text/multimodal heads — every one oracle-backed and green in the
#: full driver_check sweep. Everything not listed follows in
#: definition order, so the full registry is always exported.
#:
#: Round-4 rotation: the driver's correctness window covers a 50-query
#: prefix, so the prefix is swapped each round until every query has an
#: EXTERNAL verdict in some CORRECTNESS_r*.json. Rounds 1-3 verdicted
#: 80 distinct queries; this prefix is 50 drawn from the 62 that have
#: never been driver-checked (the 12 remaining — simple family siblings
#: a13/a15/a22/o05/o07/o13/w05/w06/c12/u02/j04/t06/e03/d07 minus two —
#: rotate in next round). Union of r01-r05 windows then covers all 142.
_DRIVER_PREFIX = [
    # events / time-series alignment family
    "e03_range_join",
    "e05_ewma",
    "e06_interval_coverage",
    "e07_funnel",
    "e08_spatial_join",
    "e09_running_distinct",
    "e10_twap",
    "e11_ohlc_bars",
    "e12_asof_forward",
    "e13_interarrival_histogram",
    # relational / aggregate surface
    "a18_promo_ratio",
    "a19_priority_counts",
    "a20_approx_distinct_bound",
    "a25_approx_percentile_bound",
    "j08_salted_skew_agg",
    "j13_param_grid",
    "w10_navigation_functions",
    "c13_variant_shred",
    "c14_calendar_rollup",
    "c15_map_column_ops",
    "u04_bag_set_ops",
    "u05_bag_counts_derived",
    # iterative / sketch / layout / ops
    "g01_pagerank",
    "o06_stratified_sample",
    "o08_weighted_sample",
    "o09_zorder_layout",
    "o10_table_profile",
    "o11_compaction_bins",
    "o12_cohort_retention",
    "o14_gaps_islands",
    # sources + Python-integration surface
    "src01_jsonl_roundtrip",
    "src02_csv_fallback",
    "src03_python_datasource",
    "a23_scalar_pandas_udf",
    "a24_grouped_agg_pandas_udf",
    "u03_udtf_sentences",
    # streaming family (never-verdicted members)
    "st03_stream_dedup",
    "st05_stream_stream_join",
    "st06_stream_upsert_snapshot",
    # north-star: dedup / similarity / text / multimodal
    "d07_signlsh_neardup",
    "d11_url_dedup",
    "s05_kmeans_iteration",
    "s06_label_centroids",
    "t07_winnow_fingerprint",
    "t09_pii_redact",
    "t10_unigram_logprob",
    "t11_feature_hashing",
    "t12_explode_outer",
    "t13_curation_funnel",
    "m04_byte_features",
]


def _driver_order() -> list[str]:
    rest = [n for n in QUERIES if n not in _DRIVER_PREFIX]
    return [n for n in _DRIVER_PREFIX if n in QUERIES] + rest


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].spark for name in _driver_order()}


def oracle_sqls() -> dict[str, str]:
    return {
        n: QUERIES[n].oracle
        for n in _driver_order()
        if QUERIES[n].oracle is not None
    }


# =====================================================================
# TPC-H-style analytics (scans, joins, aggregation, sort/limit)
# =====================================================================


@_register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                        AS sum_qty,
           sum(l_extendedprice)                                   AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
           avg(l_quantity)                                        AS avg_qty,
           avg(l_extendedprice)                                   AS avg_price,
           avg(l_discount)                                        AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="S4 A1 O2 (flagship: TPC-H Q1 shape)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _ctx(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
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
    SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue,
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
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
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


# =====================================================================
# Cycler-operator analogs over the events table
# (user_id ≈ cell, ts ≈ sample time, value ≈ measured quantity)
# =====================================================================


@_register(
    "a02_last_non_null",
    """
    WITH ranked AS (
      SELECT user_id, value, epoch_us(ts) AS ts_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, value AS last_value, ts_us AS last_ts_us
    FROM ranked WHERE rn = 1
    """,
    survey="A2 (last-in-order via max_by; explicit ordered aggregation)",
)
def a02_last_non_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    ordkey = F.array(ts_us.cast("double"), F.col("event_id").cast("double"))
    return ev.groupBy("user_id").agg(
        F.max_by("value", ordkey).alias("last_value"),
        F.max_by(ts_us, ordkey).alias("last_ts_us"),
    )


@_register(
    "a03_guarded_ratio",
    """
    SELECT user_id,
           CASE WHEN coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0) = 0
                THEN NULL
                ELSE sum(CASE WHEN event_type = 'purchase' THEN value END)
                     / sum(CASE WHEN event_type = 'view' THEN value END)
           END AS purchase_view_ratio
    FROM events GROUP BY user_id
    """,
    survey="A3 C9 (guarded ratio; NULL on zero/absent denominator)",
)
def a03_guarded_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    num = F.sum(F.when(F.col("event_type") == "purchase", F.col("value")))
    den = F.sum(F.when(F.col("event_type") == "view", F.col("value")))
    agg = ev.groupBy("user_id").agg(num.alias("_n"), den.alias("_d"))
    return agg.select(
        "user_id",
        F.when(
            F.coalesce(F.col("_d"), F.lit(0.0)) == 0, F.lit(None).cast("double")
        )
        .otherwise(F.col("_n") / F.col("_d"))
        .alias("purchase_view_ratio"),
    )


@_register(
    "a04_first_norm",
    """
    SELECT event_id, user_id,
           value / first_value(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_norm
    FROM events
    """,
    survey="A4 (first-row normalization window, q_norm shape)",
)
def a04_first_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", (F.col("value") / F.first("value").over(w)).alias("v_norm")
    )


@_register(
    "a05_trapezoid",
    """
    WITH e AS (
      SELECT user_id, value,
             epoch_us(ts) / 1000000.0 AS t,
             lag(value)              OVER w AS pv,
             lag(epoch_us(ts) / 1000000.0) OVER w AS pt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           CASE WHEN count(*) >= 2
                THEN abs(CAST(sum(CAST(floor(0.5 * (value + pv) * (t - pt)
                       * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                     / 1000000.0) / 3600.0 END AS area_vh
    FROM e GROUP BY user_id
    """,
    survey="A5 C8 F3 (lag-window trapezoid, np.trapz algebra)",
)
def a05_trapezoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts")) / F.lit(1000000.0)
    v = F.col("value")
    seg = 0.5 * (v + F.lag(v).over(w)) * (t - F.lag(t).over(w))
    # segments quantized to integer micro-units (floor(x*1e6+0.5) is
    # IEEE-deterministic; the int64 sum is exact and associative) so
    # the group sum is partition-layout and engine independent — plain
    # double sums differ in the last ulp at sf0.1 group sizes
    seg_u = F.floor(seg * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        ev.select("user_id", seg_u.alias("_seg_u"))
        .groupBy("user_id")
        .agg(
            F.when(
                F.count(F.lit(1)) >= 2,
                F.abs(F.sum("_seg_u").cast("double") / F.lit(1000000.0))
                / F.lit(3600.0),
            ).alias("area_vh")
        )
    )


@_register(
    "a06_argmin_nearest",
    """
    WITH e AS (
      SELECT user_id, event_id, abs(value - 100.0) AS ad,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
      FROM events),
    sel AS (
      SELECT user_id, event_id, ad,
             row_number() OVER (PARTITION BY user_id ORDER BY ad, pos) AS rn
      FROM e),
    mins AS (SELECT user_id, min(ad) AS min_absdiff FROM e GROUP BY user_id)
    SELECT s.user_id, s.event_id AS nearest_event_id, m.min_absdiff
    FROM sel s JOIN mins m ON s.user_id = m.user_id
    WHERE s.rn = 1
    """,
    survey="A6 (first-occurrence argmin via min_by struct ordering)",
)
def a06_argmin_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    pos_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.withColumn("pos", F.row_number().over(pos_w))
    absdiff = F.abs(F.col("value") - 100.0)
    return e.groupBy("user_id").agg(
        F.min_by(
            "event_id", F.array(absdiff, F.col("pos").cast("double"))
        ).alias("nearest_event_id"),
        F.min(absdiff).alias("min_absdiff"),
    )


@_register(
    "a07_neighbor_median_delta",
    """
    WITH e AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
      FROM events),
    sel AS (
      SELECT user_id, pos AS idx FROM (
        SELECT user_id, pos,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY abs(value - 100.0), pos) AS rn
        FROM e) WHERE rn = 1)
    SELECT e.user_id,
           median(CASE WHEN e.pos BETWEEN s.idx - 2 AND s.idx - 1 THEN e.value END)
             AS pre_med,
           median(CASE WHEN e.pos BETWEEN s.idx AND s.idx + 2 THEN e.value END)
             AS post_med
    FROM e JOIN sel s ON e.user_id = s.user_id
    GROUP BY e.user_id
    """,
    survey="A7 (neighbor-window exact medians around argmin row, IR shape)",
)
def a07_neighbor_median_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    pos_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id", "value", F.row_number().over(pos_w).alias("pos"),
        F.abs(F.col("value") - 100.0).alias("_ad"),
    )
    sel = e.groupBy("user_id").agg(
        F.min_by("pos", F.array(F.col("_ad"), F.col("pos").cast("double"))).alias("idx")
    )
    j = e.join(F.broadcast(sel), "user_id")
    return j.groupBy("user_id").agg(
        F.median(
            F.when(F.col("pos").between(F.col("idx") - 2, F.col("idx") - 1), F.col("value"))
        ).alias("pre_med"),
        F.median(
            F.when(F.col("pos").between(F.col("idx"), F.col("idx") + 2), F.col("value"))
        ).alias("post_med"),
    )


@_register(
    "a08_min_subtract",
    """
    SELECT event_id, user_id,
           value - min(value) OVER (PARTITION BY user_id) AS v_rel
    FROM events
    """,
    survey="A8 (per-group min broadcast window)",
)
def a08_min_subtract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id", "user_id", (F.col("value") - F.min("value").over(w)).alias("v_rel")
    )


@_register(
    "a10_running_first_shift",
    """
    SELECT event_id, user_id,
           CASE WHEN value IS NOT NULL THEN
             (value - first_value(CASE WHEN event_type = 'purchase' THEN value END
                                  IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1000.0
           END AS shift_milli
    FROM events
    """,
    survey="A10 (running first-valid reference + shift, dQdV-shift shape)",
)
def a10_running_first_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = F.first(
        F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.col("value").isNotNull(), (F.col("value") - ref) * 1000.0).alias(
            "shift_milli"
        ),
    )


@_register(
    "a11_regr_fade",
    """
    WITH e AS (
      -- x centered at the per-group origin: raw epoch-seconds (~1.7e9,
      -- x^2 ~ 3e18) eat double precision and make slope/intercept
      -- summation-order-sensitive across engines; centered x is small
      -- and exact (integer microsecond delta / 1e6)
      SELECT user_id, value,
             (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
               / 1000000.0 AS x
      FROM events)
    SELECT user_id,
           -- round(.,9): regr_* internal summation order still differs in
           -- the last ulp across engines; 9 decimals is far inside both
           -- engines' agreement and the rounded doubles are bit-identical.
           -- t_to_80 is derived from the ROUNDED slope/intercept so the
           -- final division sees identical operands on both sides.
           CASE WHEN count(*) >= 2 THEN round(regr_slope(value, x), 9) END
             AS slope,
           CASE WHEN count(*) >= 2 THEN round(regr_intercept(value, x), 9) END
             AS intercept,
           CASE WHEN count(*) >= 2 AND round(regr_slope(value, x), 9) <> 0
                THEN (80.0 - round(regr_intercept(value, x), 9))
                     / round(regr_slope(value, x), 9) END
             AS t_to_80
    FROM e GROUP BY user_id
    """,
    survey="A11 A12 (OLS fade fit via regr_slope/regr_intercept + RUL arithmetic; "
    "x centered per group for cross-engine bit-stability)",
)
def a11_regr_fade(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    ev = ev.withColumn("_x0", F.min(us).over(Window.partitionBy("user_id")))
    x = (us - F.col("_x0")) / F.lit(1000000.0)
    y = F.col("value")
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.round(F.regr_slope(y, x), 9).alias("_m"),
        F.round(F.regr_intercept(y, x), 9).alias("_b"),
    )
    ok = F.col("_n") >= 2
    m, b = F.col("_m"), F.col("_b")
    return agg.select(
        "user_id",
        F.when(ok, m).alias("slope"),
        F.when(ok, b).alias("intercept"),
        F.when(ok & (m != 0), (F.lit(80.0) - b) / m).alias("t_to_80"),
    )


@_register(
    "c05_c06_labels",
    """
    SELECT event_id,
           CASE upper(event_type)
             WHEN 'PURCHASE' THEN 'CC_DIS' WHEN 'VIEW' THEN 'CC_CHG'
             WHEN 'ERROR' THEN 'REST' ELSE upper(event_type) END AS label,
           CASE WHEN value < 50 THEN 'LOW' WHEN value > 150 THEN 'HIGH'
                ELSE 'MID' END AS band
    FROM events
    """,
    survey="C5 C6 (dictionary replace with passthrough + sign-style conditional)",
)
def c05_c06_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    up = F.upper(F.col("event_type"))
    mapping = F.create_map(
        F.lit("PURCHASE"), F.lit("CC_DIS"),
        F.lit("VIEW"), F.lit("CC_CHG"),
        F.lit("ERROR"), F.lit("REST"),
    )
    return ev.select(
        "event_id",
        F.coalesce(F.element_at(mapping, up), up).alias("label"),
        F.when(F.col("value") < 50, "LOW")
        .when(F.col("value") > 150, "HIGH")
        .otherwise("MID")
        .alias("band"),
    )


@_register(
    "c07_substring_filter",
    """
    SELECT event_id, user_id, event_type
    FROM events WHERE contains(event_type, 'rror') OR contains(event_type, 'chase')
    """,
    survey="C7 F1 (NULL-safe substring predicate filter)",
)
def c07_substring_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    pred = F.coalesce(
        F.col("event_type").contains("rror") | F.col("event_type").contains("chase"),
        F.lit(False),
    )
    return ev.filter(pred).select("event_id", "user_id", "event_type")


@_register(
    "c04_c08_casts",
    """
    SELECT event_id,
           value / 1000.0     AS value_kilo,
           epoch_us(ts)       AS ts_us,
           CAST(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS BIGINT)
             AS props_k
    FROM events
    """,
    survey="C3 C4 C8 (unit rescale, epoch cast, lenient numeric cast)",
)
def c04_c08_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("value") / 1000.0).alias("value_kilo"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.get_json_object("props", "$.k")
        .try_cast("double")
        .try_cast("long")
        .alias("props_k"),
    )


@_register(
    "qc01_aggregate_checks",
    """
    SELECT count(*)                                   AS n_rows,
           count(DISTINCT l_orderkey)                 AS n_orders,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS null_qty,
           min(l_discount)                            AS disc_min,
           max(l_discount)                            AS disc_max,
           median(l_extendedprice)                    AS price_median,
           (SELECT l_extendedprice FROM lineitem
            ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 1) AS first_price,
           (SELECT l_extendedprice FROM lineitem
            ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC LIMIT 1)
             AS last_price,
           CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                                    AS n_nonpos
    FROM lineitem
    """,
    survey="Q1-Q7 (single one-row QC aggregate: null counts, range, exact median, ordered first/last)",
)
def qc01_aggregate_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _ctx(spark, sf_dir, "lineitem")
    order_key = F.array(
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).cast("double"),
        F.col("l_orderkey").cast("double"),
        F.col("l_linenumber").cast("double"),
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("null_qty"),
        F.min("l_discount").alias("disc_min"),
        F.max("l_discount").alias("disc_max"),
        F.median("l_extendedprice").alias("price_median"),
        F.min_by("l_extendedprice", order_key).alias("first_price"),
        F.max_by("l_extendedprice", order_key).alias("last_price"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias("n_nonpos"),
    )


# =====================================================================
# North-star training-data pipeline operators (BASELINE.json):
# dedup / similarity search / text analysis / multimodal plumbing
# =====================================================================

from ..functions.dedup import (  # noqa: E402
    DEFAULT_BAND_SIZE,
    DEFAULT_NUM_HASHES,
    SIMHASH_BITS,
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..functions.multimodal import binary_payload_meta, with_fake_payload  # noqa: E402
from ..functions.similarity import (  # noqa: E402
    cosine_topk,
    embedding_near_dup_pairs_blas,
    ivf_topk,
)
from ..functions.text import (  # noqa: E402
    LANG_MARKERS,
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)

# shared SQL fragments, generated from the SAME constants as the Spark
# implementations so the two sides cannot drift
_SH_CTE = """
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
       FROM toks, range(1, 4096) t(i) WHERE i + 2 <= len(w))
"""

_MH_COLS = ",\n           ".join(
    f"min(md5('{i}|' || shingle)) AS mh{i}" for i in range(DEFAULT_NUM_HASHES)
)
_BAND_SELECTS = "\n      UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({expr}) AS bucket FROM sig".format(
        b=b,
        expr=" || '|' || ".join(
            f"mh{b * DEFAULT_BAND_SIZE + r}" for r in range(DEFAULT_BAND_SIZE)
        ),
    )
    for b in range(DEFAULT_NUM_HASHES // DEFAULT_BAND_SIZE)
)

_JACCARD_TAIL = """
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_inter
          FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle
                                AND sa.doc_id < sb.doc_id
          GROUP BY 1, 2)
"""


@_register(
    "d01_exact_dedup",
    """
    SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
    survey="north-star dedup: exact hash-groupBy",
)
def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return exact_dedup(docs)


@_register(
    "d02_minhash_lsh",
    f"""
    WITH {_SH_CTE},
    sig AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band = b.band
                                       AND a.bucket = b.bucket
                                       AND a.doc_id < b.doc_id),
    {_JACCARD_TAIL.lstrip()}
    SELECT c.doc_a, c.doc_b,
           i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) AS jaccard
    FROM cand c JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
    JOIN sizes na ON na.doc_id = c.doc_a
    JOIN sizes nb ON nb.doc_id = c.doc_b
    WHERE i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) >= 0.8
    """,
    survey="north-star dedup: MinHash+LSH (shingle→minhash→band→bucket-join→exact refine)",
)
def d02_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(docs, threshold=0.8)


@_register(
    "d03_simhash",
    None,  # filled in below programmatically
    survey="north-star dedup: SimHash bit-majority fingerprint",
)
def d03_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return simhash(docs)


# bit j of the fingerprint = bit (3 - j%4) of md5 hex char j//4 — the
# same nibble-consuming scheme as functions.dedup.simhash, generated
# for the full SIMHASH_BITS width
_SIM_SUMS = ",\n           ".join(
    f"sum(CASE WHEN ((strpos('0123456789abcdef', "
    f"substr(md5(tok), {j // 4 + 1}, 1)) - 1) >> {3 - j % 4}) & 1 = 1 "
    f"THEN 1 ELSE -1 END) AS s{j}"
    for j in range(SIMHASH_BITS)
)
_SIM_BITS = " || ".join(
    f"CASE WHEN s{j} > 0 THEN '1' ELSE '0' END" for j in range(SIMHASH_BITS)
)
QUERIES["d03_simhash"].oracle = f"""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                  FROM documents),
    agg AS (SELECT doc_id, {_SIM_SUMS} FROM toks GROUP BY doc_id)
    SELECT doc_id, {_SIM_BITS} AS simhash_bits FROM agg
    """


@_register(
    "d05_ngram_jaccard",
    f"""
    WITH {_SH_CTE},
    {_JACCARD_TAIL.lstrip()}
    SELECT i.doc_a, i.doc_b,
           i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) >= 0.8
    """,
    survey="north-star dedup: exact n-gram jaccard via inverted-index join",
)
def d05_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8)


_COS = (
    "list_dot_product(embedding::DOUBLE[], qv)"
    " / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(qv, qv)))"
)


@_register(
    "s01_cosine_topk",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, {_COS} AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    survey="north-star similarity: brute-force cosine top-k baseline",
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return cosine_topk(emb, query_vec_id=0, k=10)


@_register(
    "s02_ivf_topk",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    dims AS (SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
             FROM embeddings, range(1, 65) t(i) GROUP BY label, i),
    cent AS (SELECT label, list(m ORDER BY dim) AS centroid FROM dims GROUP BY label),
    probe AS (SELECT label FROM (
        SELECT c.label,
               list_dot_product(c.centroid, q.qv)
                 / (sqrt(list_dot_product(c.centroid, c.centroid))
                    * sqrt(list_dot_product(q.qv, q.qv))) AS c_cos
        FROM cent c, q ORDER BY c_cos DESC, label LIMIT 2))
    SELECT vec_id, {_COS} AS cosine
    FROM embeddings JOIN probe USING (label), q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    survey="north-star similarity: IVF-bucketed ANN (probe nearest centroids, pruned scan)",
)
def s02_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return ivf_topk(emb, query_vec_id=0, k=10, nprobe=2)


@_register(
    "d04_embedding_neardup",
    f"""
    WITH scored AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
               / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
               AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, round(cosine, 9) AS cosine
    FROM scored WHERE round(cosine, 9) >= 0.2
    """,
    survey="north-star dedup: embedding-cosine near-dup (label-blocked pairwise, "
    "per-block BLAS gemm kernel)",
    note="threshold 0.2 so the oracle checks ~10k real pairs (0.95 matches "
    "nothing in the synthetic embeddings — a vacuous pass); the Spark side is "
    "the applyInPandas matrix-multiply kernel, ulp-equal to the SQL fold.",
)
def d04_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs_blas(emb, threshold=0.2)


@_register(
    "t01_token_stats",
    r"""
    WITH toks AS (SELECT doc_id, length(text) AS n_chars_actual,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
                         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
                  FROM documents)
    SELECT doc_id, n_chars_actual, len(w) AS n_tokens,
           CASE WHEN len(w) > 0
                THEN list_sum(list_transform(w, t -> length(t))) * 1.0 / len(w)
           END AS avg_token_len,
           n_punct
    FROM toks
    """,
    survey="north-star text: token counting + stats",
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return token_stats(docs)


@_register(
    "t02_quality_score",
    None,  # filled below from LANG_MARKERS
    survey="north-star text: quality scoring (length/punct/stopword ratios)",
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return quality_score(docs)


_EN_RE = r"\b(" + "|".join(LANG_MARKERS["en"]) + r")\b"
QUERIES["t02_quality_score"].oracle = f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(lower(text), '{_EN_RE}')) AS DOUBLE) AS n_stop,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
             CAST(length(text) AS DOUBLE) AS n_chars
      FROM documents),
    r AS (SELECT doc_id,
                 CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END AS stop_ratio,
                 CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
                 least(n_chars / 500.0, 1.0) AS len_score
          FROM base)
    SELECT doc_id, stop_ratio, punct_ratio, len_score,
           0.5 * len_score + 0.3 * (1.0 - punct_ratio) + 0.2 * stop_ratio AS quality
    FROM r
    """


@_register(
    "t03_language_id",
    None,  # filled below from LANG_MARKERS
    survey="north-star text: n-gram/stopword language-ID heuristic",
)
def t03_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return language_id(docs)


_HIT_COLS = ",\n           ".join(
    "len(regexp_extract_all(lower(text), '\\b({alts})\\b')) AS hits_{lang}".format(
        alts="|".join(words), lang=lang
    )
    for lang, words in LANG_MARKERS.items()
)
_BEST = "greatest(" + ", ".join(f"hits_{lang}" for lang in LANG_MARKERS) + ")"
_GUESS = (
    "CASE WHEN " + _BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN hits_{lang} = {_BEST} THEN '{lang}'" for lang in LANG_MARKERS
    )
    + " END"
)
QUERIES["t03_language_id"].oracle = f"""
    WITH h AS (SELECT doc_id,
           {_HIT_COLS}
      FROM documents)
    SELECT doc_id, {', '.join('hits_' + g for g in LANG_MARKERS)},
           {_GUESS} AS lang_guess
    FROM h
    """


@_register(
    "t04_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' '))
             AS fp,
           length(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' '))
             AS norm_len
    FROM documents
    """,
    survey="north-star text: normalized md5 document fingerprint",
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return fingerprint(docs)


@_register(
    "m01_binary_meta",
    """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS payload_md5
    FROM documents
    """,
    survey="north-star multimodal: opaque binary payload + typed metadata (JVM-side)",
)
def m01_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    return binary_payload_meta(with_fake_payload(docs))


@_register(
    "m02_decode_stub",
    """
    WITH d AS (
      SELECT doc_id, encode(text) AS p FROM documents),
    h AS (
      SELECT doc_id, octet_length(p) AS n,
             substr(lower(hex(p)), 1, 512) AS hx
      FROM d),
    luma AS (
      SELECT doc_id, n,
             sum((strpos('0123456789abcdef', substr(hx, 2*u.i-1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(hx, 2*u.i,   1)) - 1))
               AS byte_sum
      FROM h, LATERAL (SELECT unnest(generate_series(1, least(n, 256)))
                       AS i) u
      GROUP BY doc_id, n)
    SELECT h.doc_id, CAST(h.n AS INT) AS n_bytes,
           CAST(greatest(1, h.n % 64) AS INT) AS width,
           CAST(greatest(1, (h.n // 64) % 64) AS INT) AS height,
           (CAST(coalesce(l.byte_sum, 0) AS DOUBLE)
             / greatest(1, least(h.n, 256))) / 255.0 AS mean_luma
    FROM h LEFT JOIN luma l USING (doc_id)
    """,
    survey="north-star multimodal: mapInPandas decode plumbing on "
    "arbitrary (non-image) bytes — the byte-heuristic codec "
    "(dimensions from byte length, luminance from the first-256-byte "
    "mean) is reproduced relationally from hex nibbles, so the "
    "distributed harness (Arrow batching, NULL-payload handling, "
    "schema contract) is oracle-checked independent of any container; "
    "the REAL in-repo codec over a real container is m05_ppm_decode",
)
def m02_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_images

    (docs,) = _ctx(spark, sf_dir, "documents")
    return decode_images(with_fake_payload(docs))


@_register(
    "m05_ppm_decode",
    """
    WITH d AS (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 4 AS h
               FROM documents),
    s AS (SELECT d.doc_id, d.w, d.h, u.k,
                 (strpos('0123456789abcdef',
                         substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                    || CAST(u.k AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                         substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                    || CAST(u.k AS VARCHAR)), 2, 1)) - 1) AS v
          FROM d, LATERAL (SELECT unnest(generate_series(0, 3*d.w*d.h - 1))
                           AS k) u),
    agg AS (SELECT doc_id, w, h,
                   sum(CASE WHEN k % 3 = 0 THEN 299 * v
                            WHEN k % 3 = 1 THEN 587 * v
                            ELSE 114 * v END) AS lsum,
                   sum(CASE WHEN v < 10 THEN 1
                            WHEN v < 100 THEN 2
                            ELSE 3 END) AS digits,
                   count(*) AS n3
            FROM s GROUP BY doc_id, w, h)
    SELECT doc_id,
           CAST(3 + 6 + length(CAST(doc_id AS VARCHAR))
                + length(CAST(w AS VARCHAR)) + 1
                + length(CAST(h AS VARCHAR)) + 1
                + 4 + digits + n3 AS INT) AS n_bytes,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(lsum AS DOUBLE) / (255000.0 * w * h) AS mean_luma
    FROM agg
    """,
    survey="north-star multimodal: REAL pure-Python codec for a real "
    "container — deterministic plain-PPM (P3) payloads (magic, comment "
    "line, dimensions, maxval, ASCII samples) are generated per doc and "
    "genuinely parsed back by decode_ppm under Arrow-batched mapInPandas; "
    "the oracle re-derives byte length, header dimensions, and the "
    "integer Rec.601 luma sum from the same md5 sample stream, so a "
    "header-parse or tokenizer bug flips the hash",
    note="n_bytes counts every container byte (magic+newline 3, comment "
    "'# id {id}\\n', dims line, '255\\n', ASCII samples + separators + "
    "trailing newline) — the decoder and generator must agree on the "
    "exact serialization for this to match.",
)
def m05_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate real P3 images deterministically per doc_id, decode
    them with the real PPM codec, emit (n_bytes, width, height,
    mean_luma) — the full multimodal decode path with zero stubs."""
    from ..functions.multimodal import decode_images, decode_ppm, with_ppm_payload

    (docs,) = _ctx(spark, sf_dir, "documents")
    return decode_images(with_ppm_payload(docs.select("doc_id")), decoder=decode_ppm)


# =====================================================================
# Flagship: the cycler feature pipeline over events-mapped timeseries
# =====================================================================

from .flagship import events_as_timeseries, flagship_features  # noqa: E402


@_register(
    "p01_cycler_pipeline",
    """
    WITH ts AS (
      SELECT CAST(user_id AS VARCHAR) AS cell_id,
             ts AS t, event_id,
             (epoch_us(ts) // 86400000000) // 7 AS cycle_index,
             CASE WHEN event_type IN ('purchase','view') THEN 'CC_DIS'
                  WHEN event_type IN ('click','signup') THEN 'CC_CHG'
                  ELSE 'REST' END AS step_type,
             value AS v
      FROM events),
    w AS (
      SELECT *,
             sum(CASE WHEN step_type = 'CC_CHG'
                      THEN CAST(round(v * 100) AS BIGINT) ELSE 0 END)
               OVER win / 100000.0 AS charge_ah,
             sum(CASE WHEN step_type = 'CC_DIS'
                      THEN CAST(round(v * 100) AS BIGINT) ELSE 0 END)
               OVER win / 100000.0 AS discharge_ah
      FROM ts
      WINDOW win AS (PARTITION BY cell_id, cycle_index ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    cap AS (
      SELECT cell_id, cycle_index,
             max(discharge_ah) AS Q_dis_Ah,
             max(charge_ah)    AS Q_chg_Ah
      FROM w GROUP BY cell_id, cycle_index),
    cap2 AS (
      SELECT cell_id, cycle_index, Q_dis_Ah, Q_chg_Ah,
             CASE WHEN Q_chg_Ah IS NULL OR Q_chg_Ah = 0 THEN NULL
                  ELSE Q_dis_Ah / Q_chg_Ah END AS CE,
             Q_dis_Ah / first_value(Q_dis_Ah) OVER
               (PARTITION BY cell_id ORDER BY cycle_index
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_norm
      FROM cap),
    dis AS (
      SELECT cell_id, cycle_index, t,
             (3.0 + v % 1.5) * (- v / 100.0) AS p,
             epoch_us(t) / 1000000.0 AS tsec
      FROM ts WHERE contains(step_type, 'DIS')),
    seg AS (
      SELECT cell_id, cycle_index,
             0.5 * (p + lag(p) OVER win) * (tsec - lag(tsec) OVER win) AS s
      FROM dis
      WINDOW win AS (PARTITION BY cell_id, cycle_index ORDER BY t)),
    en AS (
      SELECT cell_id, cycle_index,
             CASE WHEN count(*) >= 2
                  THEN abs(CAST(sum(CAST(floor(s * 1000000000.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1000000000.0) / 3600.0
             END AS E_dis_Wh
      FROM seg GROUP BY cell_id, cycle_index),
    m AS (
      SELECT cell_id, cycle_index, t, step_type,
             (3.0 + v % 1.5) AS voltage_v,
             CASE WHEN step_type = 'CC_DIS' THEN - v / 100.0
                  WHEN step_type = 'CC_CHG' THEN v / 100.0
                  ELSE 0.0 END AS current_a
      FROM ts),
    pos AS (
      SELECT *, row_number() OVER (PARTITION BY cell_id ORDER BY t) AS p
      FROM m),
    dis_ir AS (
      SELECT cell_id, cycle_index, p, voltage_v, current_a,
             abs(abs(current_a) - 1.0) AS absdiff
      FROM pos
      WHERE contains(step_type, 'DIS') AND cycle_index IS NOT NULL),
    sel_ir AS (
      SELECT cell_id, cycle_index, p AS idx FROM (
        SELECT cell_id, cycle_index, p,
               row_number() OVER (PARTITION BY cell_id, cycle_index
                                  ORDER BY absdiff, p) AS rn
        FROM dis_ir WHERE absdiff IS NOT NULL)
      WHERE rn = 1),
    band AS (
      SELECT d.cell_id, d.cycle_index, d.p, d.voltage_v, d.current_a, s.idx
      FROM dis_ir d JOIN sel_ir s USING (cell_id, cycle_index)
      WHERE d.p BETWEEN s.idx - 1 AND s.idx + 1),
    ir_agg AS (
      SELECT cell_id, cycle_index,
             median(voltage_v) FILTER (WHERE p <  idx) AS pre_v,
             median(voltage_v) FILTER (WHERE p >= idx) AS post_v,
             median(current_a) FILTER (WHERE p <  idx) AS pre_i,
             median(current_a) FILTER (WHERE p >= idx) AS post_i,
             count(*)          FILTER (WHERE p <  idx) AS n_pre,
             count(*)          FILTER (WHERE p >= idx) AS n_post
      FROM band GROUP BY cell_id, cycle_index),
    ir AS (
      SELECT cell_id, cycle_index,
             CASE WHEN n_pre = 0 OR n_post = 0
                       OR (post_i - pre_i) IS NULL
                       OR (post_i - pre_i) = 0 THEN NULL
                  ELSE abs((post_v - pre_v) / (post_i - pre_i)) + 0.0
             END AS IR_C2_ohm
      FROM ir_agg),
    qsrc AS (  -- dQ/dV input: the CUMULATIVE integer-accumulated
               -- discharge_ah (exact decimals — the cumsum is
               -- association-independent, so argmax ties are safe)
      SELECT cell_id, cycle_index, (3.0 + v % 1.5) AS vv,
             row_number() OVER (PARTITION BY cell_id, cycle_index
                                ORDER BY t, event_id) AS ord,
             discharge_ah - min(discharge_ah)
               OVER (PARTITION BY cell_id, cycle_index) AS qq
      FROM w WHERE contains(step_type, 'DIS')),
    qd AS (
      SELECT cell_id, cycle_index, vv,
             arg_max(qq, ord) AS q_last, arg_min(qq, ord) AS q_first
      FROM qsrc GROUP BY cell_id, cycle_index, vv),
    st AS (
      SELECT cell_id, cycle_index, min(vv) AS v0, max(vv) AS v1, count(*) AS n
      FROM qsrc GROUP BY cell_id, cycle_index),
    valid AS (
      SELECT cell_id, cycle_index, v0,
             CAST(ceil((v1 - v0) / 0.05) AS BIGINT) AS ng
      FROM st
      WHERE n >= 3 AND (v1 - v0) >= 0.05
            AND CAST(ceil((v1 - v0) / 0.05) AS BIGINT) >= 2),
    grid AS (
      SELECT v.cell_id, v.cycle_index, v.ng, gs.k AS k,
             CASE WHEN gs.k = 0 THEN v.v0
                  WHEN gs.k = 1 THEN v.v0 + 0.05
                  ELSE v.v0 + gs.k * ((v.v0 + 0.05) - v.v0) END AS gv
      FROM valid v,
           LATERAL (SELECT unnest(generate_series(0, v.ng - 1)) AS k) gs),
    br AS (
      SELECT g.cell_id, g.cycle_index, g.ng, g.k, g.gv,
             max(s.vv)               FILTER (WHERE s.vv <= g.gv) AS v_lo,
             arg_max(s.q_last, s.vv) FILTER (WHERE s.vv <= g.gv) AS q_lo,
             min(s.vv)               FILTER (WHERE s.vv >  g.gv) AS v_hi,
             arg_min(s.q_first, s.vv) FILTER (WHERE s.vv > g.gv) AS q_hi
      FROM grid g JOIN qd s USING (cell_id, cycle_index)
      GROUP BY ALL),
    qg AS (
      SELECT cell_id, cycle_index, ng, k, gv,
             CASE WHEN v_hi IS NULL THEN q_lo
                  ELSE q_lo + ((q_hi - q_lo) / (v_hi - v_lo)) * (gv - v_lo)
             END AS qgv
      FROM br),
    gr AS (
      SELECT cell_id, cycle_index, k, gv,
             CASE WHEN k = 0      THEN (lead(qgv) OVER wg - qgv) / 0.05
                  WHEN k = ng - 1 THEN (qgv - lag(qgv) OVER wg) / 0.05
                  ELSE (lead(qgv) OVER wg - lag(qgv) OVER wg) / (2 * 0.05)
             END AS grad
      FROM qg
      WINDOW wg AS (PARTITION BY cell_id, cycle_index ORDER BY k)),
    pk AS (
      SELECT cell_id, cycle_index, arg_min(gv, k) AS gv
      FROM gr g
      WHERE grad = (SELECT max(grad) FROM gr m2
                    WHERE m2.cell_id = g.cell_id
                      AND m2.cycle_index = g.cycle_index)
      GROUP BY cell_id, cycle_index),
    shifts AS (
      SELECT c.cell_id, c.cycle_index, p.gv AS dQdV_peak_V,
             CASE WHEN p.gv IS NOT NULL THEN
               (p.gv - first_value(p.gv IGNORE NULLS)
                  OVER (PARTITION BY c.cell_id ORDER BY c.cycle_index
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               * 1000.0
             END AS dQdV_shift_mV
      FROM cap2 c LEFT JOIN pk p
        ON c.cell_id = p.cell_id AND c.cycle_index = p.cycle_index)
    SELECT c.cell_id, c.cycle_index, c.Q_dis_Ah, c.Q_chg_Ah, c.CE, c.q_norm,
           e.E_dis_Wh, i.IR_C2_ohm, s.dQdV_peak_V, s.dQdV_shift_mV
    FROM cap2 c
    LEFT JOIN en e ON c.cell_id = e.cell_id AND c.cycle_index = e.cycle_index
    LEFT JOIN ir i ON c.cell_id = i.cell_id AND c.cycle_index = i.cycle_index
    LEFT JOIN shifts s
      ON c.cell_id = s.cell_id AND c.cycle_index = s.cycle_index
    """,
    survey="full domain pipeline: A1-A12 over events-mapped timeseries, "
    "oracle-checked END TO END — the composition of the p02 (capacity/"
    "CE/q_norm/energy), p04 (IR argmin + neighbor medians), and p03 "
    "(dQ/dV arange/interp/gradient/argmax re-derivation) oracles on the "
    "flagship's integer-accumulated cumulative capacities; the numpy "
    "kernel's input here is exact decimals, so the SQL re-derivation is "
    "bit-stable including argmax tie resolution",
)
def p01_cycler_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship_features(spark, sf_dir)


@_register(
    "p02_cycler_features_sql",
    """
    WITH ts AS (
      SELECT CAST(user_id AS VARCHAR) AS cell_id,
             ts AS t, event_id,
             (epoch_us(ts) // 86400000000) // 7 AS cycle_index,
             CASE WHEN event_type IN ('purchase','view') THEN 'CC_DIS'
                  WHEN event_type IN ('click','signup') THEN 'CC_CHG'
                  ELSE 'REST' END AS step_type,
             value AS v
      FROM events),
    w AS (
      -- integer centi-unit accumulation (exact under any association),
      -- one float division at the end — matches the Spark side and is
      -- immune to DuckDB's segment-tree window summation order
      SELECT *,
             sum(CASE WHEN step_type = 'CC_CHG'
                      THEN CAST(round(v * 100) AS BIGINT) ELSE 0 END)
               OVER win / 100000.0 AS charge_ah,
             sum(CASE WHEN step_type = 'CC_DIS'
                      THEN CAST(round(v * 100) AS BIGINT) ELSE 0 END)
               OVER win / 100000.0 AS discharge_ah
      FROM ts
      WINDOW win AS (PARTITION BY cell_id, cycle_index ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    cap AS (
      SELECT cell_id, cycle_index,
             max(discharge_ah) AS Q_dis_Ah,
             max(charge_ah)    AS Q_chg_Ah
      FROM w GROUP BY cell_id, cycle_index),
    cap2 AS (
      SELECT cell_id, cycle_index, Q_dis_Ah, Q_chg_Ah,
             CASE WHEN Q_chg_Ah IS NULL OR Q_chg_Ah = 0 THEN NULL
                  ELSE Q_dis_Ah / Q_chg_Ah END AS CE,
             Q_dis_Ah / first_value(Q_dis_Ah) OVER
               (PARTITION BY cell_id ORDER BY cycle_index
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_norm
      FROM cap),
    dis AS (
      SELECT cell_id, cycle_index, t,
             (3.0 + v % 1.5) * (- v / 100.0) AS p,
             epoch_us(t) / 1000000.0 AS tsec
      FROM ts WHERE contains(step_type, 'DIS')),
    seg AS (
      SELECT cell_id, cycle_index,
             0.5 * (p + lag(p) OVER win) * (tsec - lag(tsec) OVER win) AS s
      FROM dis
      WINDOW win AS (PARTITION BY cell_id, cycle_index ORDER BY t)),
    en AS (
      SELECT cell_id, cycle_index,
             CASE WHEN count(*) >= 2
                  THEN abs(CAST(sum(CAST(floor(s * 1000000000.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1000000000.0) / 3600.0
             END AS E_dis_Wh
      FROM seg GROUP BY cell_id, cycle_index)
    SELECT c.cell_id, c.cycle_index, c.Q_dis_Ah, c.Q_chg_Ah, c.CE, c.q_norm,
           e.E_dis_Wh
    FROM cap2 c LEFT JOIN en e
      ON c.cell_id = e.cell_id AND c.cycle_index = e.cycle_index
    """,
    survey="A1-A5 oracle-checked end-to-end: normalize-map + capacity/CE/q_norm "
    "+ trapezoid energy on events-mapped timeseries",
)
def p02_cycler_features_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.capacity import capacity_ce_per_cycle
    from ..operators.energy import energy_wh_per_cycle
    from ..operators.features import combine_features

    ts = events_as_timeseries(spark, sf_dir)
    cap = capacity_ce_per_cycle(ts)
    ener = energy_wh_per_cycle(ts)
    return combine_features(cap, ener)


# =====================================================================
# Structured Streaming (engine extension; SURVEY.md §2.12)
# =====================================================================


@_register(
    "st01_stream_window_rollup",
    """
    SELECT (epoch_us(ts) // 604800000000) * 604800000000 AS window_start_us,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    survey="streaming: watermark + tumbling event-time window aggregation "
    "(readStream parquet → window(ts) groupBy → availableNow memory sink), "
    "oracle-checked against the equivalent batch bucketing",
)
def st01_stream_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Structured Streaming execution: the events table replayed
    through the file-stream source, aggregated over 7-day tumbling
    event-time windows, run to completion with an availableNow trigger
    into a memory sink. Complete output mode → the sink holds the exact
    final aggregate, so the result is deterministic and oracle-equal to
    batch bucketing (epoch-aligned windows, UTC session)."""
    from ..streaming import read_events_stream, run_stream_to_memory, windowed_event_rollup

    rolled = windowed_event_rollup(read_events_stream(spark, sf_dir))
    out = run_stream_to_memory(rolled, output_mode="complete")
    return out.select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )


@_register(
    "st02_stream_static_join",
    """
    SELECT c.c_mktsegment, count(*) AS n_events,
           CAST(sum(CAST(round(e.value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    survey="streaming: stream-static dimension-enrich join (stateless per "
    "micro-batch, broadcast dim, no watermark) + running segment rollup, "
    "run to completion via availableNow → memory sink, oracle-checked "
    "against the equivalent batch join",
)
def st02_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real streaming execution of the dimension-enrich shape: the
    events replayed through the file-stream source, hash-joined per
    micro-batch against the static customer table, aggregated per
    market segment in complete mode — the final sink state equals the
    batch join bit-for-bit."""
    from ..streaming import read_events_stream, run_stream_to_memory
    from ..streaming.features import stream_segment_rollup

    cust = load_table(spark, sf_dir, "customer")
    rolled = stream_segment_rollup(read_events_stream(spark, sf_dir), cust)
    out = run_stream_to_memory(rolled, output_mode="complete")
    return out


@_register(
    "m03_frame_sample",
    """
    WITH d AS (
      SELECT doc_id, text, length(text) // 4 AS flen
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, CAST(u.k AS INT) AS frame_idx,
           u.k * flen AS off,
           md5(substr(text, u.k * flen + 1, flen)) AS frame_md5
    FROM d, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) u
    WHERE flen > 0
    """,
    survey="north-star multimodal: uniform frame sampling (one row per "
    "frame) via one-to-many mapInPandas — deterministic slicing decode, so "
    "the full Arrow-batched path is oracle-checked (vs LATERAL unnest + "
    "substr), unlike m02's rows-only stub",
)
def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import sample_frames

    (docs,) = _ctx(spark, sf_dir, "documents")
    return sample_frames(docs, n_frames=4)


@_register(
    "p03_dqdv_sql",
    """
    WITH ts AS (
      SELECT CAST(user_id AS VARCHAR) AS cell_id,
             ts AS t, event_id,
             (epoch_us(ts) // 86400000000) // 7 AS cycle_index,
             CASE WHEN event_type IN ('purchase','view') THEN 'CC_DIS'
                  WHEN event_type IN ('click','signup') THEN 'CC_CHG'
                  ELSE 'REST' END AS step_type,
             value AS v
      FROM events),
    q AS (
      SELECT cell_id, cycle_index, (3.0 + v % 1.5) AS vv,
             row_number() OVER (PARTITION BY cell_id, cycle_index
                                ORDER BY t, event_id) AS ord,
             v / 1000.0 - min(v / 1000.0)
               OVER (PARTITION BY cell_id, cycle_index) AS qq
      FROM ts WHERE contains(step_type, 'DIS')),
    qd AS (  -- collapse duplicate voltages: np.interp uses the LAST dup
             -- entering a segment and the FIRST dup leaving it
      SELECT cell_id, cycle_index, vv,
             arg_max(qq, ord) AS q_last, arg_min(qq, ord) AS q_first
      FROM q GROUP BY cell_id, cycle_index, vv),
    st AS (
      SELECT cell_id, cycle_index, min(vv) AS v0, max(vv) AS v1, count(*) AS n
      FROM q GROUP BY cell_id, cycle_index),
    valid AS (
      SELECT cell_id, cycle_index, v0,
             CAST(ceil((v1 - v0) / 0.05) AS BIGINT) AS ng
      FROM st
      WHERE n >= 3 AND (v1 - v0) >= 0.05
            AND CAST(ceil((v1 - v0) / 0.05) AS BIGINT) >= 2),
    grid AS (  -- np.arange fill rule, mirrored bit-for-bit:
               -- v[0]=v0, v[1]=v0+step, v[k]=v0+k*((v0+step)-v0)
      SELECT v.cell_id, v.cycle_index, v.ng, gs.k AS k,
             CASE WHEN gs.k = 0 THEN v.v0
                  WHEN gs.k = 1 THEN v.v0 + 0.05
                  ELSE v.v0 + gs.k * ((v.v0 + 0.05) - v.v0) END AS gv
      FROM valid v,
           LATERAL (SELECT unnest(generate_series(0, v.ng - 1)) AS k) gs),
    br AS (  -- np.interp bracket per grid point
      SELECT g.cell_id, g.cycle_index, g.ng, g.k, g.gv,
             max(s.vv)               FILTER (WHERE s.vv <= g.gv) AS v_lo,
             arg_max(s.q_last, s.vv) FILTER (WHERE s.vv <= g.gv) AS q_lo,
             min(s.vv)               FILTER (WHERE s.vv >  g.gv) AS v_hi,
             arg_min(s.q_first, s.vv) FILTER (WHERE s.vv > g.gv) AS q_hi
      FROM grid g JOIN qd s USING (cell_id, cycle_index)
      GROUP BY ALL),
    qg AS (  -- slope-first form mirrors np.interp rounding exactly
      SELECT cell_id, cycle_index, ng, k, gv,
             CASE WHEN v_hi IS NULL THEN q_lo
                  ELSE q_lo + ((q_hi - q_lo) / (v_hi - v_lo)) * (gv - v_lo)
             END AS qgv
      FROM br),
    gr AS (  -- np.gradient: central interior, one-sided edges
      SELECT cell_id, cycle_index, k, gv,
             CASE WHEN k = 0      THEN (lead(qgv) OVER wg - qgv) / 0.05
                  WHEN k = ng - 1 THEN (qgv - lag(qgv) OVER wg) / 0.05
                  ELSE (lead(qgv) OVER wg - lag(qgv) OVER wg) / (2 * 0.05)
             END AS grad
      FROM qg
      WINDOW wg AS (PARTITION BY cell_id, cycle_index ORDER BY k)),
    pk AS (  -- np.argmax: FIRST maximal grid point
      SELECT cell_id, cycle_index, arg_min(gv, k) AS gv
      FROM gr g
      WHERE grad = (SELECT max(grad) FROM gr m
                    WHERE m.cell_id = g.cell_id
                      AND m.cycle_index = g.cycle_index)
      GROUP BY cell_id, cycle_index),
    cycles AS (
      SELECT DISTINCT cell_id, cycle_index FROM ts
      WHERE cycle_index IS NOT NULL),
    peaks AS (
      SELECT c.cell_id, c.cycle_index, p.gv AS dQdV_peak_V
      FROM cycles c LEFT JOIN pk p
        ON c.cell_id = p.cell_id AND c.cycle_index = p.cycle_index)
    SELECT cell_id, cycle_index, dQdV_peak_V,
           CASE WHEN dQdV_peak_V IS NOT NULL THEN
             (dQdV_peak_V - first_value(dQdV_peak_V IGNORE NULLS)
                OVER (PARTITION BY cell_id ORDER BY cycle_index
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1000.0
           END AS dQdV_shift_mV
    FROM peaks
    """,
    survey="A8-A10 oracle-checked: dQ/dV grid-interp/gradient/argmax kernel vs a "
    "full SQL reformulation (recursive-CTE arange, np.interp bracket algebra, "
    "np.gradient stencils, first-max argmax) + shift window",
    note="The only non-SQL-native operator, differentially verified bit-for-bit. "
    "The mapped input avoids a windowed cumsum (engines associate long window "
    "sums differently at ulp scale, and argmax over gradients with exact ties "
    "cannot tolerate ulp noise); every remaining float op is order-identical "
    "in both engines, so raw np.argmax tie-resolution matches exactly.",
)
def p03_dqdv_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dQ/dV peak + shift over an events-mapped timeseries — the
    mapInPandas numpy kernel (operators/dqdv.py), oracle-checked
    against an exact SQL re-derivation of np.interp + np.gradient +
    first-max argmax (see the registered SQL)."""
    from ..operators.dqdv import dqdv_peak_per_cycle

    ev = load_table(spark, sf_dir, "events")
    step_type = (
        F.when(F.col("event_type").isin("purchase", "view"), "CC_DIS")
        .when(F.col("event_type").isin("click", "signup"), "CC_CHG")
        .otherwise("REST")
    )
    ts = ev.select(
        F.col("user_id").cast("string").alias("cell_id"),
        F.col("ts").alias("timestamp"),
        F.expr("(unix_micros(ts) div 86400000000) div 7").alias("cycle_index"),
        step_type.alias("step_type"),
        (3.0 + F.col("value") % 1.5).alias("voltage_v"),
        (F.col("value") / 1000.0).alias("discharge_ah"),
    )
    return dqdv_peak_per_cycle(ts).select(
        "cell_id", "cycle_index", "dQdV_peak_V", "dQdV_shift_mV"
    )


@_register(
    "p04_ir_sql",
    """
    WITH ts AS (
      SELECT CAST(user_id AS VARCHAR) AS cell_id,
             ts AS t, event_id,
             (epoch_us(ts) // 86400000000) // 7 AS cycle_index,
             CASE WHEN event_type IN ('purchase','view') THEN 'CC_DIS'
                  WHEN event_type IN ('click','signup') THEN 'CC_CHG'
                  ELSE 'REST' END AS step_type,
             value AS v
      FROM events),
    m AS (
      SELECT cell_id, cycle_index, t, step_type,
             (3.0 + v % 1.5) AS voltage_v,
             CASE WHEN step_type = 'CC_DIS' THEN - v / 100.0
                  WHEN step_type = 'CC_CHG' THEN v / 100.0
                  ELSE 0.0 END AS current_a
      FROM ts),
    pos AS (  -- row label in the globally time-sorted frame, per cell
      SELECT *, row_number() OVER (PARTITION BY cell_id ORDER BY t) AS p
      FROM m),
    dis AS (
      SELECT cell_id, cycle_index, p, voltage_v, current_a,
             abs(abs(current_a) - 1.0) AS absdiff
      FROM pos
      WHERE contains(step_type, 'DIS') AND cycle_index IS NOT NULL),
    sel AS (  -- first-occurrence argmin (pandas idxmin)
      SELECT cell_id, cycle_index, p AS idx FROM (
        SELECT cell_id, cycle_index, p,
               row_number() OVER (PARTITION BY cell_id, cycle_index
                                  ORDER BY absdiff, p) AS rn
        FROM dis WHERE absdiff IS NOT NULL)
      WHERE rn = 1),
    band AS (
      SELECT d.cell_id, d.cycle_index, d.p, d.voltage_v, d.current_a, s.idx
      FROM dis d JOIN sel s USING (cell_id, cycle_index)
      WHERE d.p BETWEEN s.idx - 1 AND s.idx + 1),
    agg AS (
      SELECT cell_id, cycle_index,
             median(voltage_v) FILTER (WHERE p <  idx) AS pre_v,
             median(voltage_v) FILTER (WHERE p >= idx) AS post_v,
             median(current_a) FILTER (WHERE p <  idx) AS pre_i,
             median(current_a) FILTER (WHERE p >= idx) AS post_i,
             count(*)          FILTER (WHERE p <  idx) AS n_pre,
             count(*)          FILTER (WHERE p >= idx) AS n_post
      FROM band GROUP BY cell_id, cycle_index),
    cycles AS (
      SELECT DISTINCT cell_id, cycle_index FROM ts
      WHERE cycle_index IS NOT NULL)
    SELECT c.cell_id, c.cycle_index,
           CASE WHEN a.n_pre = 0 OR a.n_post = 0
                     OR (a.post_i - a.pre_i) IS NULL
                     OR (a.post_i - a.pre_i) = 0 THEN NULL
                -- +0.0 canonicalizes -0.0: DuckDB's abs() preserves the
                -- sign bit of -0.0 while Spark's clears it
                ELSE abs((a.post_v - a.pre_v) / (a.post_i - a.pre_i)) + 0.0
           END AS IR_C2_ohm
    FROM cycles c LEFT JOIN agg a
      ON c.cell_id = a.cell_id AND c.cycle_index = a.cycle_index
    """,
    survey="A6-A7 oracle-checked on the real operator: ir_c2_per_cycle "
    "(first-occurrence argmin, positional neighbor-band exact medians, "
    "guarded |dV/dI|) over an events-mapped timeseries",
)
def p04_ir_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR@C/2 — the production operator (operators/ir.py) on a mapped
    timeseries, hash-checked against a DuckDB re-derivation of the
    argmin + neighbor-median-band + guarded-ratio pipeline."""
    from ..operators.ir import ir_c2_per_cycle

    ev = load_table(spark, sf_dir, "events")
    step_type = (
        F.when(F.col("event_type").isin("purchase", "view"), "CC_DIS")
        .when(F.col("event_type").isin("click", "signup"), "CC_CHG")
        .otherwise("REST")
    )
    cur = (
        F.when(F.col("event_type").isin("purchase", "view"), -F.col("value") / 100.0)
        .when(F.col("event_type").isin("click", "signup"), F.col("value") / 100.0)
        .otherwise(F.lit(0.0))
    )
    ts = ev.select(
        F.col("user_id").cast("string").alias("cell_id"),
        F.col("ts").alias("timestamp"),
        F.expr("(unix_micros(ts) div 86400000000) div 7").alias("cycle_index"),
        step_type.alias("step_type"),
        (3.0 + F.col("value") % 1.5).alias("voltage_v"),
        cur.alias("current_a"),
    )
    return ir_c2_per_cycle(ts, rated_ah=2.0).select(
        "cell_id", "cycle_index", "IR_C2_ohm"
    )


_D02_PAIRS_SQL = QUERIES["d02_minhash_lsh"].oracle

QUERIES_D06_ORACLE = f"""
    WITH RECURSIVE pairs AS (
      {_D02_PAIRS_SQL}
    ),
    sym AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.src, e.dst FROM reach r JOIN sym e ON r.dst = e.src)
    SELECT src AS doc_id, least(src, min(dst)) AS group_id
    FROM reach GROUP BY src
    """


@_register(
    "d06_near_dup_groups",
    QUERIES_D06_ORACLE,
    survey="north-star dedup: transitive closure of near-dup pairs into keeper "
    "groups (distributed hash-min label propagation vs recursive-CTE closure)",
    note="Iterative DataFrame algorithm (join+min per round, localCheckpoint "
    "lineage truncation) oracle-checked against DuckDB's recursive CTE over "
    "the identical LSH pair set.",
)
def d06_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the MinHash near-dup graph: every doc
    that has a duplicate gets its component's min doc_id as group_id
    (the canonical keep-first keeper)."""
    from ..functions.dedup import minhash_near_dup_pairs, near_dup_groups

    (docs,) = _ctx(spark, sf_dir, "documents")
    return near_dup_groups(minhash_near_dup_pairs(docs, threshold=0.8))


_D03_SIMHASH_SQL_REF = "d03_simhash"  # oracle reused as the d09 CTE


@_register(
    "d09_simhash_hamming",
    None,  # filled below from d03's fingerprint SQL
    survey="north-star dedup: SimHash hamming-distance pairs via the "
    "pigeonhole band join (≤ n_bands−1 differing bits must share an exact "
    "band) + bit_count(xor) refine — the fingerprint-side companion to "
    "d02's MinHash set-similarity path",
)
def d09_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs within hamming distance 3 of each other's SimHash."""
    from ..functions.dedup import simhash_hamming_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    return simhash_hamming_pairs(docs, max_hamming=3, n_bands=4)


def _d09_oracle(bits: int = SIMHASH_BITS, n_bands: int = 4) -> str:
    """Pigeonhole band join over the ``bits``-wide fingerprint, hamming
    refined via 32-bit fingerprint words (matches the Spark plan — no
    signed-int64 overflow at any width)."""
    sh_sql = QUERIES[_D03_SIMHASH_SQL_REF].oracle
    band_w = bits // n_bands
    n_words = (bits + 31) // 32
    word_exprs = []
    for i in range(n_words):
        w = min(32, bits - i * 32)
        val = " + ".join(
            f"(CASE WHEN substr(simhash_bits, {i * 32 + j + 1}, 1) = '1' "
            f"THEN {1 << (w - 1 - j)} ELSE 0 END)"
            for j in range(w)
        )
        word_exprs.append(f"({val}) AS w{i}")
    words_sel = ", ".join(word_exprs)
    wcols = ", ".join(f"w{i}" for i in range(n_words))
    wcols_ab = ", ".join(
        f"a.w{i} AS w{i}a, b2.w{i} AS w{i}b" for i in range(n_words)
    )
    ham = " + ".join(f"bit_count(xor(w{i}a, w{i}b))" for i in range(n_words))
    return f"""
    WITH sh AS ({sh_sql}),
    v AS (SELECT doc_id, simhash_bits, {words_sel} FROM sh),
    b AS (SELECT doc_id, {wcols}, u.j,
                 substr(simhash_bits, u.j * {band_w} + 1, {band_w}) AS band
          FROM v, LATERAL (SELECT unnest(generate_series(0, {n_bands - 1}))
                           AS j) u),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b, {wcols_ab}
      FROM b a JOIN b b2 ON a.j = b2.j AND a.band = b2.band
                        AND a.doc_id < b2.doc_id)
    SELECT doc_a, doc_b, {ham} AS hamming
    FROM cand WHERE {ham} <= 3
    """


QUERIES["d09_simhash_hamming"].oracle = _d09_oracle()


_D12_CAP = 2  # exercises the star path on sf0.01's m=3 buckets


@_register(
    "d12_lsh_star_cap",
    f"""
    WITH {_SH_CTE},
    sig AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    ann AS (SELECT doc_id, band, bucket,
                   count(*) OVER (PARTITION BY band, bucket) AS m,
                   min(doc_id) OVER (PARTITION BY band, bucket) AS mn
            FROM bands),
    cand AS (SELECT DISTINCT doc_a, doc_b FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ann a JOIN ann b ON a.band = b.band AND a.bucket = b.bucket
                            AND a.doc_id < b.doc_id
      WHERE a.m <= {_D12_CAP}
      UNION ALL
      SELECT mn AS doc_a, doc_id AS doc_b FROM ann
      WHERE m > {_D12_CAP} AND doc_id <> mn)),
    {_JACCARD_TAIL.lstrip()}
    SELECT c.doc_a, c.doc_b,
           i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) AS jaccard
    FROM cand c JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
    JOIN sizes na ON na.doc_id = c.doc_a
    JOIN sizes nb ON nb.doc_id = c.doc_b
    WHERE i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) >= 0.8
    """,
    survey="north-star dedup, the 100 TB emission shape: MinHash+LSH with "
    "a per-bucket pair-emission cap — buckets over the cap emit m−1 STAR "
    "edges to their min doc_id (the d10 first-occurrence pattern) instead "
    "of m(m−1)/2 pairs, so one viral boilerplate cluster can never emit "
    "corpus-quadratic candidates; small buckets keep exact all-pairs",
    note="The candidate graph stays bucket-connected under the cap, so "
    "hash-min closure (d06) builds identical keeper groups; refined "
    "similarity on star edges scores (min, x) pairs only — the documented "
    "recall trade for giant buckets.",
)
def d12_lsh_star_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup pairs with the production bucket cap."""
    from ..functions.dedup import minhash_near_dup_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(docs, threshold=0.8, bucket_cap=_D12_CAP)


def _d13_oracle(bits: int = SIMHASH_BITS, n_bands: int = 4, cap: int = 2) -> str:
    """d09's pigeonhole band join with the per-bucket star cap."""
    sh_sql = QUERIES[_D03_SIMHASH_SQL_REF].oracle
    band_w = bits // n_bands
    n_words = (bits + 31) // 32
    word_exprs = []
    for i in range(n_words):
        w = min(32, bits - i * 32)
        val = " + ".join(
            f"(CASE WHEN substr(simhash_bits, {i * 32 + j + 1}, 1) = '1' "
            f"THEN {1 << (w - 1 - j)} ELSE 0 END)"
            for j in range(w)
        )
        word_exprs.append(f"({val}) AS w{i}")
    words_sel = ", ".join(word_exprs)
    wcols = ", ".join(f"w{i}" for i in range(n_words))
    wcols_a = ", ".join(f"va.w{i} AS w{i}a" for i in range(n_words))
    wcols_b = ", ".join(f"vb.w{i} AS w{i}b" for i in range(n_words))
    ham = " + ".join(f"bit_count(xor(w{i}a, w{i}b))" for i in range(n_words))
    return f"""
    WITH sh AS ({sh_sql}),
    v AS (SELECT doc_id, simhash_bits, {words_sel} FROM sh),
    b AS (SELECT doc_id, u.j,
                 substr(simhash_bits, u.j * {band_w} + 1, {band_w}) AS band
          FROM v, LATERAL (SELECT unnest(generate_series(0, {n_bands - 1}))
                           AS j) u),
    ann AS (SELECT doc_id, j, band,
                   count(*) OVER (PARTITION BY j, band) AS m,
                   min(doc_id) OVER (PARTITION BY j, band) AS mn
            FROM b),
    pairs AS (SELECT DISTINCT doc_a, doc_b FROM (
      SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM ann a JOIN ann b2 ON a.j = b2.j AND a.band = b2.band
                             AND a.doc_id < b2.doc_id
      WHERE a.m <= {cap}
      UNION ALL
      SELECT mn AS doc_a, doc_id AS doc_b FROM ann
      WHERE m > {cap} AND doc_id <> mn)),
    cand AS (SELECT p.doc_a, p.doc_b, {wcols_a}, {wcols_b}
             FROM pairs p JOIN v va ON va.doc_id = p.doc_a
                          JOIN v vb ON vb.doc_id = p.doc_b)
    SELECT doc_a, doc_b, {ham} AS hamming
    FROM cand WHERE {ham} <= 3
    """


@_register(
    "d13_simhash_star_cap",
    None,  # assigned below (needs d03's generated fingerprint SQL)
    survey="north-star dedup, the 100 TB emission shape: SimHash pigeonhole "
    "band join with the per-bucket star cap — identical fingerprints land "
    "in the same bucket of EVERY band, so a cluster of m exact dups costs "
    "4·m²/2 pairs uncapped; capped it is m−1 star edges, hamming-refined "
    "like any candidate",
)
def d13_simhash_star_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-≤3 SimHash pairs with the production bucket cap."""
    from ..functions.dedup import simhash_hamming_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    return simhash_hamming_pairs(docs, max_hamming=3, n_bands=4, bucket_cap=2)


QUERIES["d13_simhash_star_cap"].oracle = _d13_oracle(cap=2)


QUERIES_D08_ORACLE = f"""
    WITH pairs AS (
      {_D02_PAIRS_SQL}
    )
    SELECT p.doc_a, p.doc_b,
           levenshtein(a.text, b.text) AS lev,
           CASE WHEN greatest(length(a.text), length(b.text)) = 0 THEN 1.0
                ELSE 1.0 - levenshtein(a.text, b.text) * 1.0 /
                     greatest(length(a.text), length(b.text))
           END AS edit_sim
    FROM pairs p
    JOIN documents a ON p.doc_a = a.doc_id
    JOIN documents b ON p.doc_b = b.doc_id
    """


@_register(
    "d08_edit_distance_refine",
    QUERIES_D08_ORACLE,
    survey="north-star dedup: levenshtein refine of MinHash candidate pairs "
    "(third tier: LSH bands → jaccard → character edit distance, each "
    "touching only survivors of the previous; edit distance is O(len²) per "
    "pair and must never run all-pairs)",
)
def d08_edit_distance_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level similarity for every MinHash near-dup pair —
    catches in-place small edits that shift every overlapping shingle."""
    from ..functions.dedup import edit_distance_refine, minhash_near_dup_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    return edit_distance_refine(docs, minhash_near_dup_pairs(docs, threshold=0.8))


@_register(
    "w07_unpivot",
    """
    WITH a AS (
      SELECT l_returnflag,
             sum(l_quantity) AS sum_qty,
             sum(l_extendedprice) AS sum_price,
             avg(l_discount) AS avg_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM a
    UNION ALL
    SELECT l_returnflag, 'avg_disc', avg_disc FROM a
    """,
    survey="P-family extension: UNPIVOT wide→long (df.unpivot — one Expand "
    "pass over the input, the inverse of w02's pivot) over a grouped "
    "aggregate",
)
def w07_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag metrics unpivoted to (key, metric, value) long format —
    the feature-store/metrics-table interchange shape. Spark plans one
    Expand (each input row emitted once per metric), not N self-unions:
    the input aggregate is computed once however many metrics unpivot."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_price"),
        F.avg("l_discount").alias("avg_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "avg_disc"],
        "metric",
        "value",
    )


# =====================================================================
# Timeseries alignment operators (engine extensions beyond SURVEY §2.5)
# =====================================================================


@_register(
    "e01_asof_join",
    """
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS ts_us,
           p.value,
           c.click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value AS click_value
                    FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    survey="extension: backward as-of join (union + last_value ignorenulls, one "
    "shuffle — Spark has no native ASOF JOIN) vs DuckDB's native ASOF JOIN",
)
def e01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase aligned with the user's latest prior-or-equal
    click value."""
    from ..functions.events import asof_join_backward

    (ev,) = _ctx(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join_backward(
        purchases, clicks, on="ts", by=["user_id"], value_cols=["click_value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
        "click_value",
    )


@_register(
    "e02_sessionize",
    """
    WITH s AS (
      SELECT user_id, ts, event_id,
             -- BIGINT cast: DuckDB window sums of integers return
             -- HUGEINT which pandas widens to float64 ("1.0" vs "1")
             CAST(sum(CASE WHEN prev_us IS NULL
                       OR epoch_us(ts) - prev_us > 1800 * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM (SELECT user_id, ts, event_id,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_us
            FROM events))
    SELECT user_id, session_id,
           count(*) AS n_events,
           max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
    FROM s GROUP BY user_id, session_id
    """,
    survey="extension: gap-based sessionization (lag boundary + running-sum "
    "numbering over one shuffle) + per-session rollup",
)
def e02_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user with count/duration rollup —
    integer microsecond arithmetic end to end, bit-exact across
    engines."""
    from ..functions.events import session_stats, sessionize

    (ev,) = _ctx(spark, sf_dir, "events")
    return session_stats(sessionize(ev, gap_seconds=1800))


@_register(
    "e04_resample_ffill",
    """
    WITH bounds AS (
      SELECT user_id, date_trunc('day', min(ts)) AS d0,
             date_trunc('day', max(ts)) AS d1
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS step
      FROM bounds),
    daily AS (
      SELECT user_id, step, day_value FROM (
        SELECT user_id, date_trunc('day', ts) AS step, value AS day_value,
               row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1)
    SELECT g.user_id, epoch_us(g.step) AS step_us,
           last_value(d.day_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.step
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS value_ffill
    FROM grid g LEFT JOIN daily d
      ON g.user_id = d.user_id AND g.step = d.step
    """,
    survey="extension: regular-grid resampling + forward fill (sequence() "
    "grid explode per key, max_by last-observation per step, last "
    "ignorenulls gap fill) — the downsample/align primitive; grid rows "
    "generated per key, never a global-calendar cross join",
)
def e04_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user resample of the last observed event value,
    forward-filled across days with no events."""
    from ..functions.events import resample_ffill

    (ev,) = _ctx(spark, sf_dir, "events")
    out = resample_ffill(ev, every="1 day")
    return out.select(
        "user_id",
        F.unix_micros(F.col("step_start")).alias("step_us"),
        "value_ffill",
    )


@_register(
    "t05_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             tf.tf * ln((1 + n.n_docs) / CAST(1 + dfreq.df AS DOUBLE)) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored)
    SELECT doc_id, term, tf, df, round(tfidf, 9) AS tfidf, rank
    FROM ranked WHERE rank <= 3
    """,
    survey="north-star text: TF-IDF top-k terms per doc (explode + two keyed "
    "aggs + broadcast scalar N + window top-k, codegen end to end)",
)
def t05_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tfidf_top_terms

    (docs,) = _ctx(spark, sf_dir, "documents")
    # score ∈ O(1): round(,9) absorbs libm/association ulp noise while
    # the ranking runs on the raw score (term gaps dwarf the noise)
    return tfidf_top_terms(docs, k=3).withColumn("tfidf", F.round("tfidf", 9))


@_register(
    "w02_pivot_step_counts",
    """
    WITH ts AS (
      SELECT (epoch_us(ts) // 86400000000) // 7 AS cycle_index,
             CASE WHEN event_type IN ('purchase','view') THEN 'CC_DIS'
                  WHEN event_type IN ('click','signup') THEN 'CC_CHG'
                  ELSE 'REST' END AS step_type
      FROM events)
    SELECT cycle_index,
           CAST(sum(CASE WHEN step_type = 'CC_CHG' THEN 1 ELSE 0 END) AS BIGINT)
             AS CC_CHG,
           CAST(sum(CASE WHEN step_type = 'CC_DIS' THEN 1 ELSE 0 END) AS BIGINT)
             AS CC_DIS,
           CAST(sum(CASE WHEN step_type = 'REST'   THEN 1 ELSE 0 END) AS BIGINT)
             AS REST
    FROM ts GROUP BY cycle_index
    """,
    survey="pivot: step_type distribution per cycle (groupBy().pivot() with "
    "explicit value list → no extra pass to discover categories)",
)
def w02_pivot_step_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    step_type = (
        F.when(F.col("event_type").isin("purchase", "view"), "CC_DIS")
        .when(F.col("event_type").isin("click", "signup"), "CC_CHG")
        .otherwise("REST")
    )
    return (
        ev.select(
            F.expr("(unix_micros(ts) div 86400000000) div 7").alias("cycle_index"),
            step_type.alias("step_type"),
        )
        .groupBy("cycle_index")
        .pivot("step_type", ["CC_CHG", "CC_DIS", "REST"])
        .count()
        .na.fill(0, ["CC_CHG", "CC_DIS", "REST"])
    )


@_register(
    "w03_rolling_capacity",
    """
    WITH weekly AS (
      SELECT user_id,
             (epoch_us(ts) // 86400000000) // 7 AS week,
             sum(value) AS wsum
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, week)
    SELECT user_id, week, wsum,
           avg(wsum) OVER (PARTITION BY user_id ORDER BY week
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             AS wsum_ma4
    FROM weekly
    """,
    survey="A4-family rolling frame: 4-week moving average per key "
    "(rowsBetween(-3, 0) window over a keyed aggregate)",
)
def w03_rolling_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    weekly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.expr("(unix_micros(ts) div 86400000000) div 7").alias("week"),
        )
        .agg(F.sum("value").alias("wsum"))
    )
    w = Window.partitionBy("user_id").orderBy("week").rowsBetween(-3, 0)
    return weekly.select(
        "user_id", "week", "wsum", F.avg("wsum").over(w).alias("wsum_ma4")
    )


_SIGNLSH_W = (
    "(('0x' || substr(md5('{j}|' || CAST(dim AS VARCHAR)), 1, 8))::BIGINT"
    " / 2147483648.0 - 1.0)"
)


def _signlsh_oracle(n_planes: int = 8) -> str:
    dots = ",\n             ".join(
        f"sum(x * {_SIGNLSH_W.format(j=j)}) AS d{j}" for j in range(n_planes)
    )
    bits = " || ".join(
        f"CASE WHEN d{j} >= 0 THEN '1' ELSE '0' END" for j in range(n_planes)
    )
    return f"""
    WITH dims AS (
      SELECT vec_id, u.x, u.dim - 1 AS dim
      FROM embeddings,
           LATERAL (SELECT unnest(embedding::DOUBLE[]) AS x,
                           generate_subscripts(embedding, 1) AS dim) u),
    dots AS (
      SELECT vec_id,
             {dots}
      FROM dims GROUP BY vec_id),
    buckets AS (SELECT vec_id, {bits} AS bucket FROM dots)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    """


@_register(
    "s03_signlsh_pairs",
    _signlsh_oracle(),
    survey="north-star similarity: sign-random-projection LSH (hyperplane "
    "SimHash buckets from md5-derived deterministic weights) candidate pairs — "
    "the bucket-join ANN scale path complementing IVF (s02)",
)
def s03_signlsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import signlsh_candidate_pairs

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return signlsh_candidate_pairs(emb)


# =====================================================================
# Relational completeness: semi/anti/outer joins, grouped HAVING,
# decorrelated min-per-group, set ops, rollup, ranking windows,
# distinct aggregates, JSON extraction, range join
# =====================================================================


@_register(
    "j01_semi_join",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    survey="J-family extension: EXISTS decorrelated to a left-semi hash join "
    "(TPC-H Q4 shape; mixed equi + band condition, no row duplication)",
)
def j01_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders from 1996 with at least one line shipped >60 days after
    the order date, counted by priority. EXISTS compiles to a
    left-semi join — probe side never duplicates, so the post-join
    aggregate sees each order once regardless of match multiplicity."""
    orders, li = _ctx(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "j02_anti_join",
    """
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CAST(round(c_acctbal, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    survey="J-family extension: NOT EXISTS decorrelated to a left-anti hash "
    "join (TPC-H Q22 shape; the filter pushes into the build side)",
)
def j02_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who never placed an URGENT order, rolled up by market
    segment. The priority filter is applied to the build side BEFORE
    the anti join — at scale that shrinks the hash table 5×, and the
    anti join itself streams the probe side."""
    cust, orders = _ctx(spark, sf_dir, "customer", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        cust.join(urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # 2dp addends → exact decimal accumulation (see _dsum6)
            _dsum6(F.col("c_acctbal")).alias("sum_acctbal"),
        )
    )


@_register(
    "j03_min_per_group",
    """
    WITH first_date AS (
      SELECT o_custkey, min(o_orderdate) AS fd FROM orders GROUP BY o_custkey)
    SELECT o.o_custkey,
           epoch_us(o.o_orderdate) AS first_orderdate_us,
           min(o.o_orderkey) AS first_orderkey,
           min(o.o_totalprice) AS first_totalprice
    FROM orders o JOIN first_date f
      ON o.o_custkey = f.o_custkey AND o.o_orderdate = f.fd
    GROUP BY o.o_custkey, o.o_orderdate
    """,
    survey="J-family extension: correlated scalar-subquery shape (earliest "
    "row per key) decorrelated to agg + self-equi-join on the aggregate "
    "value (TPC-H Q2 shape), deterministic tie-break",
    note="first_totalprice = min over the tied earliest orders (orderkey "
    "min independently) — both engines aggregate the tie set identically, "
    "so the result is total-order deterministic.",
)
def j03_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's earliest order (Q2's 'supplier with min cost'
    shape): groupBy-min then join back on (key, min-value). The
    re-aggregation collapses date ties deterministically. The join-back
    is shuffle-on-custkey both sides — co-partitioned, no broadcast
    needed even when the key count is huge."""
    (orders,) = _ctx(spark, sf_dir, "orders")
    first = orders.groupBy(F.col("o_custkey").alias("_fk")).agg(
        F.min("o_orderdate").alias("fd")
    )
    return (
        orders.join(
            first,
            (F.col("o_custkey") == F.col("_fk"))
            & (F.col("o_orderdate") == F.col("fd")),
        )
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.min("o_orderkey").alias("first_orderkey"),
            F.min("o_totalprice").alias("first_totalprice"),
        )
        .select(
            "o_custkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "first_orderdate_us"
            ),
            "first_orderkey",
            "first_totalprice",
        )
    )


@_register(
    "j04_outer_custdist",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
    """,
    survey="J-family extension: left outer join with a non-key residual "
    "predicate + null-skipping count + re-aggregation (TPC-H Q13 shape)",
)
def j04_outer_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of non-urgent order counts per customer. The
    priority predicate is part of the JOIN (not a WHERE — that would
    turn the outer join inner); count(col) skips the NULLs produced
    for orderless customers, putting them in the c_count=0 bin."""
    cust, orders = _ctx(spark, sf_dir, "customer", "orders")
    cond = (cust["c_custkey"] == orders["o_custkey"]) & (
        orders["o_orderpriority"] != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_register(
    "q18_having",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, t.sum_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 200) t
      ON o.o_orderkey = t.l_orderkey
    """,
    survey="A-family extension: HAVING (post-aggregation filter) + join back "
    "to the fact's parent (TPC-H Q18 shape)",
)
def q18_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: aggregate lineitem per order, filter ON THE
    AGGREGATE (having), then hash-join the survivors back to orders.
    The having filter runs before the join, so the join build side is
    only the qualifying keys — the selective side drives the plan."""
    orders, li = _ctx(spark, sf_dir, "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return orders.join(
        big, orders["o_orderkey"] == big["l_orderkey"]
    ).select("o_orderkey", "o_custkey", "o_totalprice", "sum_qty")


@_register(
    "u02_intersect_except",
    """
    SELECT c_custkey FROM (
      (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    survey="U-family extension: INTERSECT + EXCEPT set semantics "
    "(hash-aggregate distinct + null-safe left-semi/anti under the hood)",
)
def u02_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with both a finished and an open order but no urgent
    one: INTERSECT then EXCEPT, each a distinct-then-filter — Spark
    plans them as aggregate + semi/anti joins; set (not bag) semantics
    match ANSI INTERSECT/EXCEPT."""
    (orders,) = _ctx(spark, sf_dir, "orders")
    fin = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    opn = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    urg = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return fin.intersect(opn).exceptAll(urg.distinct())


@_register(
    "w04_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_rf,
           grouping(l_linestatus) AS g_ls,
           sum(l_quantity) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey="A-family extension: ROLLUP hierarchical grouping sets with "
    "grouping() indicators (one Expand + one aggregate, not N passes)",
)
def w04_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity totals at (flag, status), per-flag subtotal, and grand
    total in ONE pass: rollup plans a single Expand node feeding one
    hash aggregate — the data is read once however many grouping
    levels are requested. grouping() disambiguates real NULL keys
    from subtotal rows."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "w05_ntile_cume",
    """
    SELECT o_orderkey, o_custkey,
           ntile(4)       OVER w AS quartile,
           cume_dist()    OVER w AS cd,
           percent_rank() OVER w AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    survey="O-family extension: distribution window functions (ntile / "
    "cume_dist / percent_rank) over one shared partitioning",
    note="Total order (price, orderkey) makes all three deterministic; "
    "cd/pr are exact small-integer ratios — bit-identical across engines.",
)
def w05_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend quartiles + distribution stats. All three
    functions share ONE window spec, so Spark sorts each partition
    once and evaluates them in a single Window node — adding functions
    to the same spec is free; a second spec would be a second sort."""
    (orders,) = _ctx(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


@_register(
    "a14_distinct_agg",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    survey="A-family extension: mixed distinct + plain aggregates in one "
    "groupBy (two-phase partial-distinct expansion, not a second scan)",
    note="Exact distinct is the oracle-checkable form; approx_count_distinct "
    "(HLL++, one pass, mergeable sketch) is the documented 100 TB trade "
    "when ±2% is acceptable.",
)
def a14_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users + plain rollups per event type in one aggregate.
    Spark expands the distinct into a two-level aggregation (partial
    per (type, user), then final) — one scan, map-side combine on
    both levels, no driver-side distinct."""
    (ev,) = _ctx(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        # 2dp addends → exact decimal accumulation (see _dsum6)
        _dsum6(F.col("value")).alias("sum_value"),
    )


@_register(
    "c12_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(props->>'k' AS BIGINT)) AS max_k
    FROM events
    WHERE CAST(props->>'k' AS BIGINT) IS NOT NULL
    GROUP BY event_type
    """,
    survey="C-family extension: semi-structured JSON path extraction + cast "
    "+ aggregate (get_json_object on a string column, JVM-side)",
)
def c12_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a JSON property of the events payload column.
    get_json_object evaluates in the JVM inside codegen — no Python,
    no schema inference pass; for hot paths with a fixed shape,
    from_json with an explicit schema is the columnar upgrade."""
    (ev,) = _ctx(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("_k"))
        .filter(F.col("_k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_k").alias("sum_k"),
            F.max("_k").alias("max_k"),
        )
    )


@_register(
    "e03_range_join",
    """
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           count(c.utc) AS n_in_range
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, ts AS utc FROM events
               WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.utc >= p.ts - INTERVAL 1 HOUR
     AND c.utc <  p.ts
    GROUP BY 1, 2, 3
    """,
    survey="extension: band (range) join via bucketed equi-join — each event "
    "quantized to one window-width bucket, probes exploded to their 2 "
    "candidate buckets, exact band predicate post-join (vs DuckDB's native "
    "inequality join). The theta-join would plan as BroadcastNestedLoop.",
)
def e03_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks in the hour before each purchase, per user — the banded
    self-join every attribution/feature pipeline needs, in its
    shuffle-bounded formulation (see functions.events.range_join_count)."""
    from ..functions.events import range_join_count

    (ev,) = _ctx(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = range_join_count(
        purchases, clicks, window_seconds=3600, by=["user_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "n_in_range",
    )


@_register(
    "t06_top_bigrams",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents),
    grams AS (
      SELECT w[u.i] || ' ' || w[u.i + 1] AS bigram
      FROM toks t,
           LATERAL (SELECT unnest(generate_series(1, len(t.w) - 1)) AS i) u)
    SELECT bigram, count(*) AS n
    FROM grams GROUP BY bigram
    ORDER BY n DESC, bigram ASC LIMIT 50
    """,
    survey="north-star text: corpus top-k bigrams via array higher-order "
    "functions (zip_with + slice, zero Python) + TakeOrdered top-k",
)
def t06_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import top_bigrams

    (docs,) = _ctx(spark, sf_dir, "documents")
    return top_bigrams(docs, k=50)


@_register(
    "s04_knn_join",
    """
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE label = 0),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE label <> 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) *
                sqrt(list_dot_product(c.v, c.v))) AS cosine
      FROM q CROSS JOIN c),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC)
                  AS rank
      FROM scored)
    SELECT query_id, neighbor_id, round(cosine, 9) AS cosine, rank
    FROM ranked WHERE rank <= 3
    """,
    survey="north-star similarity: exact k-NN JOIN (batch of queries × "
    "corpus, broadcast probe side, per-query window top-k) — the "
    "multi-query companion to s01's single-probe top-k",
    note="ranking runs on the raw cosine (gaps between distinct vectors "
    "dwarf gemm-vs-fold ulp noise); the emitted score is round(,9) on "
    "both sides so the hash is partition-layout independent.",
)
def s04_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 nearest label≠0 neighbors for every label-0 vector — the gemm
    kernel with per-batch partial top-k (knn_join is the all-built-ins
    fold variant; same results, ~15× slower at sf0.1 because
    higher-order-function lambdas don't codegen)."""
    from ..functions.similarity import knn_join_blas

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    out = knn_join_blas(
        emb.filter(F.col("label") == 0),
        emb.filter(F.col("label") != 0),
        k=3,
    )
    return out.withColumn("cosine", F.round("cosine", 9))


@_register(
    "o05_hash_split",
    """
    WITH h AS (
      SELECT o_orderkey, o_totalprice,
             (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT)
               % 100 AS hb
      FROM orders)
    SELECT CASE WHEN hb < 80 THEN 'train'
                WHEN hb < 90 THEN 'valid'
                ELSE 'test' END AS split,
           count(*) AS n,
           sum(o_totalprice) AS sum_price
    FROM h GROUP BY 1
    """,
    survey="extension: deterministic hash-based train/valid/test split "
    "(md5 bucket per key — reproducible across runs/engines/partitionings, "
    "per-key stable under corpus growth; rand()/TABLESAMPLE give none of "
    "these) + per-split rollup",
)
def o05_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split of orders by hashed orderkey, verified by
    per-split counts and sums — bit-identical in any engine with md5."""
    from ..functions.sampling import hash_split

    (orders,) = _ctx(spark, sf_dir, "orders")
    return (
        hash_split(orders, key="o_orderkey")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("sum_price"),
        )
    )


@_register(
    "w06_range_frame",
    """
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(*)   OVER w AS n_1h,
           sum(value) OVER w AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    survey="O-family extension: RANGE window frame over event-time "
    "microseconds (value-based frame bounds, peers included) — the window "
    "formulation of e03's band join: one sort per key partition, no join, "
    "when every row needs its trailing-window aggregate",
)
def w06_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1h event count/sum per user at every event — RANGE
    frame on the microsecond axis. Use this shape when all rows need
    the rolling value; use e03's bucketed band join when only sparse
    probes do (no per-key sort of the full stream)."""
    (ev,) = _ctx(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum("value").over(w).alias("sum_1h"),
    )


@_register(
    "d07_signlsh_neardup",
    None,  # filled below: s03's candidate SQL + exact cosine refine
    survey="north-star dedup: embedding near-dup at corpus scale — sign-LSH "
    "bucket-join candidates (s03) refined by exact cosine ≥ threshold; the "
    "unblocked companion to d04 (candidate volume tracks bucket occupancy, "
    "not corpus²)",
)
def d07_signlsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import signlsh_near_dup_pairs

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return signlsh_near_dup_pairs(emb, threshold=0.3).select(
        "vec_a", "vec_b", "cosine"
    )


QUERIES["d07_signlsh_neardup"].oracle = f"""
    WITH cand AS ({_signlsh_oracle()}),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_a, vec_b, cosine FROM (
      SELECT cand.vec_a, cand.vec_b,
             list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b.v, b.v))) AS cosine
      FROM cand JOIN e a ON cand.vec_a = a.vec_id
                JOIN e b ON cand.vec_b = b.vec_id)
    WHERE cosine >= 0.3
    """


@_register(
    "a15_listagg",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    survey="A-family extension: ordered string aggregation (sorted distinct "
    "collect_list → array_join; explicit ORDER BY makes the concatenation "
    "deterministic — unordered listagg is a cross-engine trap)",
)
def a15_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted distinct status list per priority as a CSV string. The
    sort is explicit (array_sort before join) — aggregation order is
    never guaranteed in a distributed groupBy, so any listagg without
    an ORDER BY is nondeterministic by construction."""
    (orders,) = _ctx(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "a16_stats_agg",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(38,4)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(38,4)))
                  AS DOUBLE) AS sy,
             CAST(sum(CAST(round(l_quantity * l_extendedprice, 4)
                  AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(round(l_quantity * l_quantity, 4)
                  AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(round(l_extendedprice * l_extendedprice, 4)
                  AS DECIMAL(38,4))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           round((sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 12)
             AS corr_qty_price,
           round((sxy - sx * sy / n) / (n - 1), 2) AS covar_qty_price,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS sd_qty,
           round((syy - sy * sy / n) / (n - 1), 2) AS var_price
    FROM m
    """,
    survey="A-family extension: statistical aggregates (corr / covar_samp / "
    "stddev_samp / var_samp) from mergeable moments — the moments are "
    "summed in DECIMAL(38,6) (exact, associative, so partition-layout and "
    "engine independent: the per-row doubles are IEEE-identical on both "
    "engines, the decimal sum has no order sensitivity), then combined "
    "with one shared closed form; map-side partials throughout",
)
def a16_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr/covar/stddev/var per return flag via exact decimal moments.

    The built-in single-pass moment sketches (F.corr &c) accumulate in
    doubles, so their last ulp depends on partition layout — fine for
    analytics, fatal for a tolerance-free cross-engine hash. Decimal
    moments cost one extra expression per column and are bit-stable."""
    (li,) = _ctx(spark, sf_dir, "lineitem")

    # round at the data's INTRINSIC decimal count (quantity integer,
    # price 2dp → every product ≤ 4dp) before the decimal cast: the
    # per-row doubles sit within ~ulp of the 1e-4 grid and never near a
    # rounding boundary, so both engines quantize to the same exact
    # decimal; the decimal sum is then exact and associative
    def mom(c):
        return F.sum(F.round(c, 4).cast("decimal(38,4)")).cast("double")

    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        mom(F.col("l_quantity")).alias("sx"),
        mom(F.col("l_extendedprice")).alias("sy"),
        mom(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        mom(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        mom(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "l_returnflag",
        # |corr| ≤ 1: round(,12) absorbs the ≤ few-ulp disagreement the
        # two engines' decimal→double conversion chains leave behind
        F.round(
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            12,
        ).alias("corr_qty_price"),
        # output grids sit far above the ~1-ulp slack the two engines'
        # decimal→double conversions leave on 1e13-scale moments
        # (DuckDB double-rounds via int128→double→/10^scale)
        F.round((sxy - sx * sy / n) / (n - 1), 2).alias("covar_qty_price"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("sd_qty"),
        F.round((syy - sy * sy / n) / (n - 1), 2).alias("var_price"),
    )


@_register(
    "w08_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_rf,
           grouping(l_linestatus) AS g_ls,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus))
    """,
    survey="A-family extension: arbitrary (non-hierarchical) GROUPING SETS "
    "via the engine's SQL surface — one Expand + one aggregate for any set "
    "combination, complementing w04's ROLLUP",
)
def w08_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag, per-status, and per-(flag,status) totals in one pass —
    grouping-set combinations ROLLUP can't express (it only nests).
    Runs through spark.sql: the engine exposes the full SQL surface
    over the same tables the DataFrame API uses."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_w08_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_rf,
               grouping(l_linestatus) AS g_ls,
               sum(l_quantity) AS sum_qty
        FROM _w08_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.col("g_rf").cast("long").alias("g_rf"),
        F.col("g_ls").cast("long").alias("g_ls"),
        "sum_qty",
    )


@_register(
    "st03_stream_dedup",
    """
    SELECT DISTINCT md5(text) AS fp FROM documents WHERE text IS NOT NULL
    """,
    survey="streaming: stateful exact dedup (streaming dropDuplicates on a "
    "content fingerprint — the novel-documents-only ingest pattern) replayed "
    "to completion; surviving fingerprint set oracle-checked against batch "
    "DISTINCT (which doc survives per fingerprint is replay-order-dependent, "
    "the fingerprint set is not)",
)
def st03_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the documents table through the file-stream source with
    streaming dropDuplicates state, then project the surviving
    fingerprint set (deterministic; survivor choice per fingerprint is
    not, and is excluded from the contract)."""
    from ..streaming import read_table_stream, run_stream_to_memory
    from ..streaming.features import stream_exact_dedup

    docs = read_table_stream(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    out = run_stream_to_memory(stream_exact_dedup(docs), output_mode="append")
    return out.select(F.md5(F.col("text")).alias("fp")).distinct()


@_register(
    "a13_percentiles",
    """
    SELECT user_id,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.9)  AS p90,
           quantile_cont(value, 0.99) AS p99,
           count(*) AS n
    FROM events
    GROUP BY user_id
    """,
    survey="A-family exact percentiles: interpolated p50/p90/p99 per key "
    "(F.percentile — exact, matches quantile_cont; percentile_approx is the "
    "documented 100TB trade when exactness is negotiable)",
)
def a13_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "t07_winnow_fingerprint",
    """
    WITH base AS (
      SELECT doc_id,
             array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ') AS t
      FROM documents),
    b AS (SELECT doc_id, t, length(t) - 7 AS nkg FROM base WHERE length(t) >= 8),
    kg AS (
      SELECT doc_id, nkg, u.pos,
             ('0x' || substr(md5(substr(t, u.pos, 8)), 1, 8))::BIGINT AS h
      FROM b, LATERAL (SELECT unnest(generate_series(1, nkg)) AS pos) u),
    win AS (
      SELECT doc_id, nkg, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
      FROM kg),
    fp AS (
      SELECT DISTINCT doc_id, mh FROM win
      WHERE pos <= greatest(nkg - 3, 1))
    SELECT doc_id, count(*) AS n_fp,
           md5(string_agg(mh::VARCHAR, ',' ORDER BY mh)) AS fp_digest
    FROM fp GROUP BY doc_id
    """,
    survey="north-star text: winnowing rolling-hash fingerprints (MOSS "
    "k-gram/window local fingerprinting — hash every k-gram in codegen, "
    "bounded-frame window min per w-window, dedupe to the fingerprint set; "
    "linear in corpus chars, one doc_id shuffle)",
)
def t07_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint set per document (k=8 chars, w=4 windows),
    summarized as count + order-canonical digest."""
    from ..functions.text import winnow_fingerprints

    (docs,) = _ctx(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=8, w=4, hash_fn="md5")


@_register(
    "o06_stratified_sample",
    """
    WITH r AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rank
      FROM customer)
    SELECT c_custkey, c_mktsegment, c_acctbal, rank
    FROM r WHERE rank <= 50
    """,
    survey="extension: exact-n-per-stratum deterministic sample (md5-ordered "
    "row_number per stratum — engine/run/partitioning-reproducible where "
    "sampleBy is fraction-approximate and seed-bound; rank retained so "
    "nested sub-samples need no resampling)",
)
def o06_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 50 customers per market segment, chosen by deterministic
    hash order — the balanced-eval-set construction."""
    from ..functions.sampling import stratified_sample

    (cust,) = _ctx(spark, sf_dir, "customer")
    return stratified_sample(cust, stratum="c_mktsegment", key="c_custkey", n_per_stratum=50).select(
        "c_custkey", "c_mktsegment", "c_acctbal", "rank"
    )


@_register(
    "j05_correlated_avg",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice, 6) AS DECIMAL(38,6)))
                AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size < 15
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    survey="J-family extension: correlated scalar AVG subquery (TPC-H Q17 "
    "shape) decorrelated to a partition window over the joined fact — one "
    "shuffle, no self-join re-scan of lineitem",
)
def j05_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue below a per-part average threshold. The
    correlated `avg per p_partkey` never re-scans lineitem: after the
    selective part join (broadcast — 25-brand dim filter), EVERY
    lineitem of a qualifying part is present, so a window AVG over
    l_partkey computes the exact correlated threshold in the same
    shuffle that the decorrelated join would need, minus the join.
    l_quantity is integer-valued so the 0.2*avg threshold is exact in
    both engines (no boundary-flip risk on the comparison)."""
    li, part = _ctx(spark, sf_dir, "lineitem", "part")
    pf = part.filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15))
    joined = li.join(F.broadcast(pf), li["l_partkey"] == pf["p_partkey"])
    w = Window.partitionBy("l_partkey")
    thr = (F.lit(0.2) * F.avg("l_quantity").over(w)).alias("_thr")
    return (
        joined.select("l_extendedprice", "l_quantity", thr)
        .filter(F.col("l_quantity") < F.col("_thr"))
        .agg(
            # exact decimal sum (see _dsum6): the cast-to-double sums
            # are bit-identical across engines, and IEEE division of
            # identical doubles is deterministic
            (_dsum6(F.col("l_extendedprice")) / 7.0).alias("avg_yearly")
        )
    )


@_register(
    "j06_disjunctive_join",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 6)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    survey="J-family extension: disjunctive OR-of-ANDs join predicate "
    "(TPC-H Q19 shape) — equi-key extracted so the OR residual rides a "
    "broadcast hash join; the part-side disjunction union is pushed to the "
    "build side scan",
)
def j06_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs revenue. The common p_partkey = l_partkey conjunct is
    the join key; the per-branch part filter (union of the three
    part-side conditions) prunes the broadcast build side BEFORE the
    join, and the mixed part×lineitem residual evaluates post-probe —
    Catalyst does exactly this given the single declarative OR, no
    manual union-of-three-joins needed."""
    li, part = _ctx(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        _dsum6(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "j07_waiting_supplier",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    """,
    survey="J-family extension: correlated EXISTS + NOT-EXISTS self-joins "
    "(TPC-H Q21 shape, lateness = shipped >90 days after order) decorrelated "
    "to per-order distinct-supplier window sets — one orderkey shuffle "
    "replaces two lineitem self-join re-scans",
)
def j07_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late shipper on multi-supplier
    orders. Both correlated subqueries (another supplier exists /
    no OTHER supplier was late) collapse into two distinct-count
    windows over the same l_orderkey partition: n_supp > 1 replaces
    EXISTS, n_late_supp == 1 replaces NOT EXISTS (the current row is
    itself late, so the single late supplier is necessarily it). The
    lineitem is scanned once; the two self-joins of the literal SQL
    never materialize."""
    sup, li, orders = _ctx(spark, sf_dir, "supplier", "lineitem", "orders")
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).withColumn(
        "_late", F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    )
    w = Window.partitionBy("l_orderkey")
    lo = lo.select(
        "l_orderkey",
        "l_suppkey",
        "_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("_n_supp"),
        F.size(
            F.collect_set(F.when(F.col("_late"), F.col("l_suppkey"))).over(w)
        ).alias("_n_late"),
    )
    hits = lo.filter(
        F.col("_late") & (F.col("_n_supp") > 1) & (F.col("_n_late") == 1)
    )
    return (
        hits.join(F.broadcast(sup), hits["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_register(
    "st04_stream_sessionize",
    """
    WITH s AS (
      SELECT user_id, ts, value,
             sum(CASE WHEN prev_us IS NULL
                       OR epoch_us(ts) - prev_us >= 1800 * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM (SELECT user_id, ts, event_id, value,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_us
            FROM events))
    SELECT user_id,
           min(epoch_us(ts)) AS session_start_us,
           max(epoch_us(ts)) + 1800 * 1000000 AS session_end_us,
           count(*) AS n_events,
           sum(value) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
    survey="streaming: native session-window sessionization (stateful "
    "gap-merged windows per user, sessions MERGE across micro-batches on "
    "out-of-order bridging events — the incremental form of e02's batch "
    "lag/cumsum) replayed to completion, oracle-checked against batch "
    "gap sessionization (boundary at gap >= 30min, end-exclusive)",
)
def st04_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real streaming execution of session_window: events replayed
    through the file-stream source into stateful session aggregation,
    complete mode → the final sink state is the exact session set.
    Session end is last-event + gap (Spark's end-exclusive contract),
    so the oracle's boundary is `diff >= gap`, unlike e02's `>`."""
    from ..streaming import read_events_stream, run_stream_to_memory
    from ..streaming.features import stream_sessionize

    sess = stream_sessionize(read_events_stream(spark, sf_dir))
    out = run_stream_to_memory(sess, output_mode="complete")
    return out.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
        "n_events",
        "sum_value",
    )


@_register(
    "m04_byte_features",
    """
    WITH d AS (SELECT doc_id, encode(text) AS p FROM documents),
    h AS (
      SELECT doc_id, lower(hex(p)) AS hx, octet_length(p) AS n
      FROM d WHERE p IS NOT NULL AND octet_length(p) > 0),
    b AS (
      SELECT doc_id, n, hx,
             (strpos('0123456789abcdef', substr(hx, 2*u.i-1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2*u.i,   1)) - 1) AS byte
      FROM h, LATERAL (SELECT unnest(generate_series(1, n)) AS i) u),
    hist AS (
      SELECT doc_id, n, hx, byte, count(*) AS c
      FROM b GROUP BY doc_id, n, hx, byte),
    ent AS (
      SELECT doc_id, n, hx,
             sum(byte * c)::DOUBLE / n AS mean_byte,
             round(-sum((c::DOUBLE / n) * log2(c::DOUBLE / n)), 8) AS entropy
      FROM hist GROUP BY doc_id, n, hx)
    SELECT d.doc_id, coalesce(e.n, 0) AS n_bytes, e.mean_byte, e.entropy,
           substr(e.hx, 1, 8) AS magic_hex
    FROM d LEFT JOIN ent e USING (doc_id)
    """,
    survey="north-star multimodal: byte-level payload features (size, mean "
    "byte, Shannon entropy, magic bytes — the content-sniff/corruption "
    "screen before decode) via numpy-vectorized mapInPandas, no shuffle; "
    "oracle rebuilds the byte histogram from hex nibbles in SQL",
)
def m04_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte histogram features of the (synthetic UTF-8) payloads —
    Arrow-batched numpy per payload; linear in total bytes."""
    from ..functions.multimodal import byte_features, with_fake_payload

    (docs,) = _ctx(spark, sf_dir, "documents")
    # entropy ≤ 8 bits: round(,8) absorbs histogram summation-order ulp
    # noise (mean_byte is an integer sum / n — already deterministic)
    return byte_features(with_fake_payload(docs)).withColumn(
        "entropy", F.round("entropy", 8)
    )


@_register(
    "a17_quantile_2pass",
    """
    SELECT quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5)  AS p50,
           quantile_cont(l_extendedprice, 0.9)  AS p90,
           count(l_extendedprice) AS n
    FROM lineitem
    """,
    survey="A-family scale path: EXACT global quantiles via two-pass "
    "bucketed selection (histogram scan locates the rank's bucket, a "
    "bucket-pruned scan yields ~n/4096 candidates, percentile_cont "
    "interpolation driver-side) — no single-node value buffer, unlike "
    "F.median/F.percentile whose TypedImperativeAggregate collects the "
    "whole column into one final merge; the only exact-quantile plan "
    "shape that survives 100 TB",
)
def a17_quantile_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p90 of lineitem prices by distributed bucketed
    selection (three parallel scans, kilobytes on the driver)."""
    from ..functions.stats import exact_quantiles_2pass

    (li,) = _ctx(spark, sf_dir, "lineitem")
    qs = exact_quantiles_2pass(li, "l_extendedprice", [0.25, 0.5, 0.9])
    n = li.filter(F.col("l_extendedprice").isNotNull()).count()
    return spark.range(1).select(
        F.lit(qs[0.25]).alias("p25"),
        F.lit(qs[0.5]).alias("p50"),
        F.lit(qs[0.9]).alias("p90"),
        F.lit(n).alias("n"),
    )


@_register(
    "w09_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_prio,
           count(*) AS n, sum(o_totalprice) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey="A-family extension: CUBE grouping sets (all 2^k dimension "
    "subsets in one Expand + one aggregate pass — completes the "
    "ROLLUP (w04) / GROUPING SETS (w08) family) with grouping() "
    "indicators disambiguating NULL-as-total from NULL data",
)
def w09_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four aggregation granularities of status × priority in one
    pass: Expand replicates each row once per grouping set BEFORE the
    exchange, so partial aggregation still combines map-side — one
    shuffle regardless of how many sets the cube implies."""
    (orders,) = _ctx(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("sum_price"),
        )
    )


@_register(
    "o07_latest_by_key",
    """
    SELECT user_id, event_type, value AS last_value, epoch_us(ts) AS ts_us
    FROM (SELECT user_id, event_type, value, ts,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    survey="extension: latest-version-wins compaction (CDC/upsert "
    "materialization — one row_number window per key, newest record "
    "survives; the changelog→snapshot primitive every lakehouse table "
    "maintenance loop runs) with a total tie-break",
)
def o07_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot of the newest event per (user, event_type): one
    key-partitioned window, newest-first rank 1. At scale this is the
    MERGE/compaction inner loop — the window shuffle partitions by the
    upsert key, so output partitioning matches the table's bucketing
    and the write needs no extra exchange."""
    (ev,) = _ctx(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("last_value"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
    )


@_register(
    "j08_salted_skew_agg",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY event_type
    """,
    survey="physical-layout extension: salted two-phase aggregation over a "
    "pathologically skewed key (a handful of event_type values = a handful "
    "of reducers in the naive plan; the salt spreads each hot key over 16 "
    "partial reducers, the second phase combines 16 partials per key) — "
    "result provably identical to the direct GROUP BY",
)
def j08_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe rollup by event_type (~5 distinct values over the whole
    fact — the worst-case hot-key layout). count is combined as sum of
    partial counts; min/max/sum combine as themselves. At local scale
    the salt costs one extra (tiny) shuffle; at 1000 executors it is
    the difference between 5 busy reducers and 80."""
    from ..sources.layout import salted_two_phase

    (ev,) = _ctx(spark, sf_dir, "events")
    return salted_two_phase(
        ev,
        ["event_type"],
        {
            "n": F.count(F.lit(1)),
            # decimal partials: the salt-phase partial sums AND the
            # combine-phase re-sum are both exact and associative, so
            # the salted plan is bit-identical to the direct GROUP BY
            # at any n (see _dsum6)
            "sum_value": F.sum(
                F.round(F.col("value"), 6).cast("decimal(38,6)")
            ),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
    ).select(
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    )


@_register(
    "s05_kmeans_iteration",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS cluster, e AS c FROM e WHERE vec_id < 8),
    d AS (
      SELECT e.vec_id, cent.cluster,
             list_dot_product(e.e, e.e)
               - 2 * list_dot_product(e.e, cent.c)
               + list_dot_product(cent.c, cent.c) AS dist
      FROM e, cent),
    asg AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn
        FROM d) WHERE rn = 1)
    SELECT a.cluster, u.dim, avg(e.e[u.dim]) AS c_val, count(*) AS n
    FROM asg a JOIN e USING (vec_id),
         LATERAL (SELECT unnest(generate_series(1, 64)) AS dim) u
    GROUP BY a.cluster, u.dim
    """,
    survey="north-star similarity: exact Lloyd/k-means iteration "
    "(deterministic seeds, E-step as a join-free scan against broadcast "
    "literal centroids, M-step as one skinny (cluster,dim) mean shuffle) — "
    "the iterative-ML / IVF-training primitive; the driver loop re-collects "
    "only k·dim numbers per round",
)
def s05_kmeans_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration over the embeddings table, k=8."""
    from ..functions.similarity import kmeans_lloyd_iteration

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return kmeans_lloyd_iteration(emb, k=8)


@_register(
    "st05_stream_stream_join",
    """
    SELECT c.user_id, c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us,
           p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_ts_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
    survey="streaming: stream-stream band self-join (click→purchase "
    "attribution — both sides of one unbounded feed buffered in join "
    "state, matches emitted as either side arrives; watermark bounds "
    "eviction in production) replayed to completion, oracle-checked "
    "against the batch band self-join",
)
def st05_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to same-user clicks of the preceding hour,
    executed as a genuine stream-stream join (append mode)."""
    from ..streaming import read_events_stream, run_stream_to_memory
    from ..streaming.features import stream_click_attribution

    joined = stream_click_attribution(read_events_stream(spark, sf_dir))
    out = run_stream_to_memory(joined, output_mode="append")
    return out.select(
        "user_id",
        "click_id",
        F.unix_micros(F.col("click_ts").cast("timestamp")).alias("click_ts_us"),
        "purchase_id",
        F.unix_micros(F.col("purchase_ts").cast("timestamp")).alias("purchase_ts_us"),
    )


@_register(
    "c13_variant_shred",
    """
    SELECT user_id, avg(CAST(props->>'k' AS BIGINT)) AS avg_k,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
    survey="C-family extension: VARIANT semi-structured shredding "
    "(parse_json once into Spark 4's binary VARIANT encoding, "
    "variant_get typed path access — vs c12's get_json_object which "
    "re-parses the JSON text per expression; with multiple extractions "
    "per row the parse happens once, and Parquet variant shredding "
    "pushes typed subcolumns to the scan at rest)",
)
def c13_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user aggregate over a VARIANT-parsed property. parse_json →
    variant_get::long extracts through the binary encoding, not the
    text — the Spark-4-native semi-structured path."""
    (ev,) = _ctx(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        ev.select("user_id", k.alias("_k"))
        .groupBy("user_id")
        .agg(F.avg("_k").alias("avg_k"), F.count(F.lit(1)).alias("n"))
    )


@_register(
    "u03_udtf_sentences",
    """
    WITH seg AS (
      SELECT doc_id, i, trim(parts[i]) AS s
      FROM (SELECT doc_id,
                   regexp_split_to_array(text, '[.!?]+') AS parts
            FROM documents) t,
           LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) u
      WHERE trim(parts[i]) <> ''),
    numbered AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS sent_idx,
             s
      FROM seg)
    SELECT doc_id, sent_idx,
           length(array_to_string(
             regexp_extract_all(lower(s), '[a-z0-9]+'), ' ')) AS norm_len,
           len(regexp_extract_all(lower(s), '[a-z0-9]+')) AS n_words
    FROM numbered
    """,
    survey="U-family extension: Python UDTF (one row in → many typed rows "
    "out through a LATERAL table function — Spark 4's user-defined table "
    "function surface; the per-row generator form complements m03's "
    "Arrow-batched mapInPandas one-to-many) splitting documents into "
    "numbered sentences with token stats",
)
def u03_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation via a registered UDTF applied LATERAL per
    document row. UDTFs run row-at-a-time Python — correct for
    low-fanout structural expansion like this; for byte-heavy decode
    fanout the Arrow-batched mapInPandas (m03) is the fast shape."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, norm_len int, n_words int")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for seg in re.split(r"[.!?]+", text):
                s = seg.strip()
                if not s:
                    continue
                idx += 1
                toks = re.findall(r"[a-z0-9]+", s.lower())
                yield idx, len(" ".join(toks)), len(toks)

    (docs,) = _ctx(spark, sf_dir, "documents")
    spark.udtf.register("split_sentences", SplitSentences)
    docs.createOrReplaceTempView("_u03_docs")
    return spark.sql(
        "SELECT doc_id, s.sent_idx, s.norm_len, s.n_words "
        "FROM _u03_docs, LATERAL split_sentences(text) s"
    )


# =====================================================================
# TPC-H completion shapes: group-vs-global, max-over-agg, nested semi,
# conditional-ratio aggregates, returned-item top-k
# =====================================================================


@_register(
    "j09_group_vs_global",
    """
    SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS part_rev
    FROM lineitem
    GROUP BY l_partkey
    HAVING sum(l_extendedprice * (1 - l_discount)) >
           (SELECT sum(l_extendedprice * (1 - l_discount)) * 0.0005
            FROM lineitem)
    """,
    survey="J-family extension: HAVING against an uncorrelated scalar "
    "subquery (TPC-H Q11 shape) — the global total is a one-row aggregate "
    "cross-joined (broadcast) onto the per-key aggregate, so the fact is "
    "scanned twice but shuffled once per aggregate; the threshold is a "
    "FRACTION of the total, scale-invariant at any SF",
)
def j09_group_vs_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds 0.05% of global revenue. The scalar
    side is a 1-row DataFrame cross-joined with a broadcast hint —
    Catalyst plans BroadcastNestedLoopJoin over one row (free), never a
    shuffle; the alternative window-over-no-partition would funnel the
    whole per-part aggregate through a single task."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = li.groupBy("l_partkey").agg(rev.alias("part_rev"))
    total = li.agg((rev * F.lit(0.0005)).alias("_thresh"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_rev") > F.col("_thresh"))
        .select("l_partkey", "part_rev")
    )


@_register(
    "j10_max_over_agg",
    """
    WITH srev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN srev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM srev)
    """,
    survey="J-family extension: select the group(s) attaining the maximum "
    "of an aggregate (TPC-H Q15 shape) — the per-supplier aggregate is "
    "computed once and reused for both the scalar max and the probe "
    "(self-referencing view decorrelated to one agg + broadcast scalar)",
)
def j10_max_over_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue supplier(s) for 1996Q1. srev is computed once; the
    scalar max is a 1-row broadcast cross join back onto it (NOT a
    global Window.orderBy, which would single-task the sort; NOT a
    second scan of lineitem, which would double the fact I/O)."""
    li, sup = _ctx(spark, sf_dir, "lineitem", "supplier")
    srev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_rev"
            )
        )
    )
    mx = srev.agg(F.max("total_rev").alias("_mx"))
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@_register(
    "j11_nested_semi",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#11'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 50)
    """,
    survey="J-family extension: nested IN over a grouped-HAVING subquery "
    "(TPC-H Q20 shape) — part filter broadcast into lineitem, aggregate "
    "per (supplier, part), HAVING, then left-semi into supplier; the semi "
    "join deduplicates suppliers without a DISTINCT pass",
)
def j11_nested_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who moved >50 units of some Brand#11 part since 1997.
    The IN-subquery chain stays a chain of hash joins: broadcast the
    filtered part dim, one shuffle on (l_suppkey, l_partkey) for the
    HAVING aggregate, then a left-semi join (no row duplication, no
    distinct) against the supplier dim."""
    li, part, sup = _ctx(spark, sf_dir, "lineitem", "part", "supplier")
    qualifying = (
        li.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#11")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 50)
        .select("l_suppkey")
    )
    return sup.join(
        qualifying, sup["s_suppkey"] == qualifying["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


@_register(
    "a18_promo_ratio",
    """
    SELECT 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0.0 END)
                / sum(l.l_extendedprice * (1 - l.l_discount)) AS promo_pct,
           count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-06-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
    survey="A-family extension: conditional-ratio aggregate (TPC-H Q14 "
    "shape) — two sums over one scan with a CASE routing rows, divided in "
    "the same agg; no second pass, no join back",
)
def a18_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of June-1996 revenue from PROMO parts. One broadcast join,
    one scan, both sums map-side-combined in a single aggregate — the
    canonical conditional-aggregation shape (never two filtered scans
    joined back together)."""
    li, part = _ctx(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_register(
    "a19_priority_counts",
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
    survey="A-family extension: CASE-routed dual counters per group "
    "(TPC-H Q12 shape) — fact×fact equi-join on the order key with the "
    "date filter pushed below the join, priorities split by CASE inside "
    "one aggregate",
)
def a19_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High/low-priority line counts per return flag for 1997. The
    ship-date predicate prunes lineitem BEFORE the join (visible as
    PushedFilters on the scan); orders joins on its key — at 100 TB both
    sides shuffle on o_orderkey unless pre-bucketed, so this query is
    the bucketing-layout candidate (sources/layout.py)."""
    li, orders = _ctx(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_register(
    "q10_returned_revenue",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    survey="J1-shape S4 A1 O3 extension: returned-item revenue top-k "
    "(TPC-H Q10 shape) — fact×fact join + two broadcast dims + "
    "TakeOrderedAndProject(20), never a global sort",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned revenue, 1996H1. The returnflag
    and orderdate filters push to the scans; customer and nation
    broadcast; the single big shuffle is lineitem⋈orders on the order
    key; LIMIT after orderBy plans as TakeOrderedAndProject (top-k
    heap per partition + driver merge of 20-row heads, not a sort)."""
    cust, orders, li, nat = _ctx(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    j = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# =====================================================================
# Training-data text screens: repetition metrics, PII redaction
# =====================================================================


@_register(
    "t08_repetition_metrics",
    """
    WITH arr AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents),
    grams AS (
      SELECT doc_id, len(w) AS n_words,
             length(array_to_string(w, ' ')) AS n_chars,
             list_transform(range(1, len(w)),
                            i -> w[i] || ' ' || w[i+1]) AS bg,
             list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tg
      FROM arr),
    rowstats AS (
      SELECT doc_id, n_words, n_chars,
             CASE WHEN len(bg) > 0 THEN
               1.0 - len(list_distinct(bg))::DOUBLE / len(bg)::DOUBLE
             END AS dup_2gram_frac,
             CASE WHEN len(tg) > 0 THEN
               1.0 - len(list_distinct(tg))::DOUBLE / len(tg)::DOUBLE
             END AS dup_3gram_frac,
             bg
      FROM grams),
    counts AS (
      SELECT doc_id, b AS top_bigram, count(*) AS top_bigram_n
      FROM (SELECT doc_id, unnest(bg) AS b FROM grams)
      GROUP BY doc_id, b),
    top AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY top_bigram_n DESC, top_bigram ASC) AS rn
        FROM counts) WHERE rn = 1)
    SELECT r.doc_id, r.n_words, r.dup_2gram_frac, r.dup_3gram_frac,
           t.top_bigram, t.top_bigram_n,
           CASE WHEN r.n_chars > 0 THEN
             t.top_bigram_n * length(t.top_bigram) / r.n_chars::DOUBLE
           END AS top_bigram_char_frac
    FROM rowstats r LEFT JOIN top t USING (doc_id)
    """,
    survey="north-star text: Gopher-style repetition screens "
    "(duplicate-2/3-gram fractions + top-bigram char fraction — the "
    "boilerplate/spam filters of LM corpus curation); the n-gram duplicate "
    "fractions are row-local array HOFs in codegen (zero shuffle), only the "
    "per-doc mode (top bigram) pays an explode + doc_id groupBy + window",
)
def t08_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See functions.text.repetition_metrics. The repetition family is
    the standard Gopher/C4 quality gate; at 100 TB the row-local part
    scales embarrassingly and the mode's shuffle is keyed by doc_id
    (uniform — no skew; hot docs don't exist by construction)."""
    from ..functions.text import repetition_metrics

    (docs,) = _ctx(spark, sf_dir, "documents")
    return repetition_metrics(docs)


@_register(
    "t09_pii_redact",
    """
    WITH pii AS (
      SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR || '@example.com'
                  || ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' backup bob@mail.co' ELSE '' END AS text
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_email,
           len(regexp_extract_all(text, '\\b555-[0-9]{4}\\b')) AS n_phone,
           length(regexp_replace(regexp_replace(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
               '\\b555-[0-9]{4}\\b', '<PHONE>', 'g')) AS redacted_len,
           md5(regexp_replace(regexp_replace(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
               '\\b555-[0-9]{4}\\b', '<PHONE>', 'g')) AS redacted_fp
    FROM pii
    """,
    survey="north-star text: PII scrub + audit (count matches on the "
    "original, regexp_replace every occurrence, emit only length + md5 of "
    "the scrubbed text) — RE2-compatible patterns so any engine can audit "
    "the same scrub; pure codegen, no shuffle. The fixture instruments the "
    "corpus with deterministic synthetic emails/phones (corpus text itself "
    "is letters-only), so counts are non-vacuous and vary by doc",
)
def t09_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic-PII instrumentation + the real scrubber. The md5 of the
    redacted text proves the scrub byte-identically across engines
    without either engine emitting raw PII into the comparison."""
    from ..functions.text import redact_pii

    (docs,) = _ctx(spark, sf_dir, "documents")
    pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" backup bob@mail.co")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return redact_pii(pii)


# =====================================================================
# Time-series extensions: EWMA, interval-overlap sweep line
# =====================================================================


@_register(
    "e05_ewma",
    """
    WITH ord AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) - 1 AS i,
             count(*) OVER (PARTITION BY user_id) AS n_key,
             max(abs(value)) OVER (PARTITION BY user_id) AS vmax
      FROM events),
    acc AS (
      SELECT user_id, event_id, ts_us, value, i, n_key, vmax,
             CAST(sum(CAST(value * pow(0.8, -i) AS DECIMAL(38,12)))
               OVER (PARTITION BY user_id ORDER BY i
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS s,
             first_value(value) OVER (PARTITION BY user_id ORDER BY i
               ROWS UNBOUNDED PRECEDING) AS x0
      FROM ord)
    SELECT user_id, event_id, ts_us, value,
           CASE WHEN pow(1.25, CAST(n_key - 1 AS DOUBLE))
                     >= 1e26 / greatest(vmax, 1e-300) THEN NULL
                ELSE round(pow(0.8, i) * (0.2 * s + 0.8 * x0), 6)
           END AS ewma
    FROM acc
    """,
    survey="extension: per-key EWMA in event-time order (pandas "
    "ewm(adjust=False) recurrence unrolled to a closed-form prefix-sum "
    "window — one cumulative window per key, no Python, no iteration; "
    "the documented trade is the DECIMAL(38,12) addend range, with a "
    "whole-key NULL guard past n ≈ 246 at a=0.2 → the applyInPandas "
    "recurrence is the unbounded-history fallback)",
)
def e05_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha=0.2) of event values per user. Both engines compute
    the identical closed form with the identical accumulation order, so
    floats agree to ~1e-15 relative."""
    from ..functions.events import ewma

    (events,) = _ctx(spark, sf_dir, "events")
    return ewma(events, alpha=0.2)


@_register(
    "e06_interval_coverage",
    """
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS t0,
             epoch_us(ts) + (60 + event_id % 240) * 1000000 AS t1
      FROM events),
    pts AS (
      SELECT event_type, t0 AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, t1 AS t, -1 AS delta FROM iv),
    sw AS (
      SELECT event_type, t, delta,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS conc,
             lead(t) OVER (PARTITION BY event_type
                           ORDER BY t, delta) AS nxt
      FROM pts)
    SELECT event_type,
           CAST(max(conc) AS BIGINT) AS max_concurrency,
           CAST(sum(CASE WHEN conc > 0 THEN nxt - t ELSE 0 END) AS BIGINT)
             AS covered_us,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_intervals
    FROM sw GROUP BY event_type
    """,
    survey="extension: sweep-line interval overlap (max concurrency + "
    "covered union time per key over [ts, ts+dur) intervals) — boundary "
    "explode + one keyed window; the running sum IS the concurrency; "
    "never the quadratic interval×interval self-join",
)
def e06_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency/occupancy per event_type via the sweep line. Ends
    sort before starts at the same instant (half-open intervals); tie
    groups contribute zero-width segments so the result is
    deterministic under any within-tie order."""
    from ..functions.events import interval_coverage

    (events,) = _ctx(spark, sf_dir, "events")
    return interval_coverage(events)


# =====================================================================
# Deterministic weighted sampling, Z-order clustering layout
# =====================================================================


@_register(
    "o08_weighted_sample",
    """
    WITH h AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
              + 1.0) / 4294967296.0 AS u
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
    s AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             -ln(u) / o_totalprice AS skey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY -ln(u) / o_totalprice ASC,
                                         o_orderkey ASC) AS rank
      FROM h)
    SELECT o_orderpriority, rank, o_orderkey, o_totalprice, skey
    FROM s WHERE rank <= 10
    """,
    survey="extension: deterministic weighted sampling without replacement "
    "(Efraimidis–Spirakis exponential keys, u drawn from md5 of the row "
    "key instead of rand()) — inclusion probability tracks the weight, yet "
    "the sample reproduces across runs/engines/partitionings; one window "
    "per stratum, no collect",
)
def o08_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 weighted sample per order priority, weight=o_totalprice.
    See functions.sampling.weighted_sample_per_group."""
    from ..functions.sampling import weighted_sample_per_group

    (orders,) = _ctx(spark, sf_dir, "orders")
    return weighted_sample_per_group(
        orders, key="o_orderkey", weight="o_totalprice", group="o_orderpriority", n=10
    ).select("o_orderpriority", "rank", "o_orderkey", "o_totalprice", "skey")


_ZO_TMIN = 1704067200000000  # epoch_us('2024-01-01')
_ZO_TSPAN = 2678400000000  # 31 days in microseconds
_ZO_QX = (
    "greatest(least(CAST(floor(value / 500.0 * 65536.0) AS BIGINT), 65535), 0)"
)
_ZO_QY = (
    "greatest(least(CAST(floor((epoch_us(ts) - {t0}) / {span}.0 * 65536.0)"
    " AS BIGINT), 65535), 0)".format(t0=_ZO_TMIN, span=_ZO_TSPAN)
)
_ZO_Z = " + ".join(
    "(((qx >> {b}) & 1) << {ox}) + (((qy >> {b}) & 1) << {oy})".format(
        b=b, ox=2 * b + 1, oy=2 * b
    )
    for b in range(16)
)


@_register(
    "o09_zorder_layout",
    """
    WITH q AS (
      SELECT event_id, value, epoch_us(ts) AS ts_us,
             {qx} AS qx, {qy} AS qy
      FROM events),
    z AS (
      SELECT event_id, value, ts_us, ({z}) AS zkey FROM q)
    SELECT zkey >> 22 AS bucket, count(*) AS n,
           min(value) AS min_v, max(value) AS max_v,
           min(ts_us) AS min_t, max(ts_us) AS max_t
    FROM z GROUP BY 1
    """.format(qx=_ZO_QX, qy=_ZO_QY, z=_ZO_Z),
    survey="physical-layout extension: Z-order (Morton) clustering key — "
    "bit-interleave of two quantized dimensions (value × event time) so "
    "range-partitioning by ONE key clusters BOTH columns; the per-bucket "
    "min/max output is exactly the file-statistics footprint a scan would "
    "prune against (the multi-dimensional data-skipping layout of "
    "lakehouse OPTIMIZE ZORDER); pure integer bit arithmetic in codegen",
)
def o09_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1024 Z-buckets (top 10 bits of the 32-bit Morton key) with the
    min/max envelope of each dimension per bucket — small envelopes in
    both dims at once are the whole point vs a single-column sort."""
    from ..sources.layout import zorder_key_2d

    (events,) = _ctx(spark, sf_dir, "events")
    z = zorder_key_2d(
        F.col("value"),
        F.unix_micros(F.col("ts")).cast("double"),
        0.0,
        500.0,
        float(_ZO_TMIN),
        float(_ZO_TMIN + _ZO_TSPAN),
        bits=16,
    )
    return (
        events.select(
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "value",
            z.alias("zkey"),
        )
        .groupBy(F.shiftright("zkey", 22).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.min("ts_us").alias("min_t"),
            F.max("ts_us").alias("max_t"),
        )
    )


@_register(
    "d10_chunk_dedup",
    """
    WITH arr AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents),
    ch AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(w[(i*3+1):(i*3+3)], ' ') AS chunk
      FROM arr,
           LATERAL (SELECT unnest(range(0,
                      CAST(ceil(len(w) / 3.0) AS BIGINT))) AS i) u
      WHERE len(w) > 0),
    k AS (
      SELECT doc_id, chunk_idx, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM ch)
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CASE WHEN sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) > 0 THEN
             length(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                               ORDER BY chunk_idx))
           END AS dedup_len,
           CASE WHEN sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) > 0 THEN
             md5(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                            ORDER BY chunk_idx))
           END AS dedup_fp
    FROM k GROUP BY doc_id
    """,
    survey="north-star dedup: sub-document exact dedup with reassembly "
    "(C4/CCNet paragraph-dedup pattern — chunk, keep the globally first "
    "occurrence of each distinct chunk, rebuild docs from survivors in "
    "order); two uniform shuffles (chunk-hash ranking, doc_id reassembly), "
    "audit output is length+md5 so full text never crosses the compare",
)
def d10_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See functions.dedup.chunk_dedup (3-word chunks over the
    synthetic corpus so cross-doc duplicates actually occur; production
    chunks on paragraph boundaries with the same plan shape)."""
    from ..functions.dedup import chunk_dedup

    (docs,) = _ctx(spark, sf_dir, "documents")
    return chunk_dedup(docs, chunk_words=3)


@_register(
    "st06_stream_upsert_snapshot",
    """
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    survey="streaming: incremental latest-per-key snapshot maintenance "
    "(foreachBatch upsert — each micro-batch MERGEs into a persisted "
    "parquet snapshot via window-dedup + atomic dir swap; the streaming "
    "form of o07's CDC compaction, and the foreachBatch surface itself: "
    "batch joins against storage state, no streaming state store). The "
    "feed is split into 4 time-ranged files replayed one per micro-batch, "
    "so the merge loop really runs 4 times; the total version order makes "
    "the final snapshot independent of batching — oracle-checked against "
    "the batch latest-by-key over the whole feed",
)
def st06_stream_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events as 4 micro-batches through the foreachBatch
    upsert, then read back the final snapshot."""
    import os
    import tempfile

    from ..streaming.snapshot import run_stream_latest_snapshot

    (events,) = _ctx(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="st06_")
    src = os.path.join(tmp, "feed")
    snap = os.path.join(tmp, "snapshot")
    events.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_latest_snapshot(
        stream, snap, key="user_id", order_cols=["ts", "event_id"]
    )
    return spark.read.parquet(snap).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )


# =====================================================================
# Nation-pair volume (Q7), PageRank iterations, sketch bound check,
# one-pass table profile
# =====================================================================


@_register(
    "q07_nation_pair_volume",
    """
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           year(l.l_shipdate) AS ship_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                         AS DECIMAL(38,6))) AS DOUBLE) AS volume,
           count(*) AS n
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE n1.n_name < n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    survey="J-family extension: bidirectional nation-pair trade volume "
    "(TPC-H Q7 shape) — the SAME dimension broadcast twice under two "
    "aliases (customer-side and supplier-side nation), an asymmetric "
    "pair filter, and a year rollup; one fact shuffle, four broadcasts",
)
def q07_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between nation pairs by ship year. nation enters
    the plan twice (aliased) — both copies broadcast; customer and
    supplier broadcast too, so the only shuffle is lineitem⋈orders and
    the final pair-year aggregate."""
    li, orders, cust, sup, nat = _ctx(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
    )
    return j.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(
        _dsum6(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("volume"),
        F.count(F.lit(1)).alias("n"),
    )


_G01_ITER = 3
_G01_D = 0.85
_G01_BASE = 0.15  # teleport mass; keep as a literal (see agg comment)


def _g01_edges_sql() -> str:
    return """
    edges AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    back AS (SELECT dst AS src, src AS dst FROM edges),
    g AS (SELECT src, dst FROM edges UNION SELECT src, dst FROM back),
    deg AS (SELECT src, count(*) AS outdeg FROM g GROUP BY src),
    verts AS (SELECT DISTINCT src AS v FROM g)
    """


@_register(
    "g01_pagerank",
    """
    WITH {edges},
    r0 AS (SELECT v, 1.0 AS pr FROM verts),
    r1 AS (
      SELECT g.dst AS v,
             0.15 + 0.85 * (CAST(sum(CAST(floor(r0.pr / deg.outdeg
               * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000000000.0) AS pr
      FROM g JOIN r0 ON r0.v = g.src JOIN deg ON deg.src = g.src
      GROUP BY g.dst),
    r2 AS (
      SELECT g.dst AS v,
             0.15 + 0.85 * (CAST(sum(CAST(floor(r1.pr / deg.outdeg
               * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000000000.0) AS pr
      FROM g JOIN r1 ON r1.v = g.src JOIN deg ON deg.src = g.src
      GROUP BY g.dst),
    r3 AS (
      SELECT g.dst AS v,
             0.15 + 0.85 * (CAST(sum(CAST(floor(r2.pr / deg.outdeg
               * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000000000.0) AS pr
      FROM g JOIN r2 ON r2.v = g.src JOIN deg ON deg.src = g.src
      GROUP BY g.dst)
    SELECT v AS node, pr FROM r3
    """.format(edges=_g01_edges_sql()),
    survey="extension: iterative graph algorithm (3 unrolled PageRank "
    "rounds over the customer–supplier trade graph) — each round is one "
    "edges⋈ranks shuffle + a dst aggregate; degree table computed once and "
    "re-joined (broadcast when vertices are small); the undirected graph "
    "is symmetrized via union, distinct-deduped. The driver loop "
    "materializes nothing — the whole 3-round DAG is one lazy plan "
    "(checkpoint/persist every k rounds is the long-chain production knob, "
    "same as s05's k-means loop)",
)
def g01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 3 synchronous rounds, init pr=1) on the
    symmetrized customer→supplier graph derived from lineitem⋈orders.
    Every vertex has outdeg ≥ 1 by construction (edges define the
    vertex set), so no dangling-mass term is needed and float op order
    matches the SQL exactly: sum over incoming (pr/outdeg)."""
    li, orders = _ctx(spark, sf_dir, "lineitem", "orders")
    fwd = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    g = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    deg = g.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # The edge+degree table feeds every iteration: without persist the
    # lazy DAG re-derives lineitem⋈orders + distinct once PER ROUND
    # (measured 2× total time at sf0.1). Persisting the reused iteration
    # input is the standard iterative-algorithm materialization point —
    # same knob as checkpointing every k rounds on long chains.
    ge = g.join(deg, "src").persist()
    ranks = g.select(F.col("src").alias("v")).distinct().withColumn("pr", F.lit(1.0))
    for _ in range(_G01_ITER):
        ranks = (
            ge.join(ranks, ge["src"] == ranks["v"])
            .groupBy(F.col("dst").alias("_v"))
            .agg(
                (
                    # literal 0.15, NOT python `1 - 0.85` (which is
                    # 0.15000000000000002 — one ulp off the SQL literal)
                    F.lit(_G01_BASE)
                    + F.lit(_G01_D)
                    # pure-double fixed-point: quantize each pr/outdeg
                    # contribution to integer pico-units with
                    # floor(x*1e12 + 0.5) — multiply, add, floor are all
                    # IEEE-deterministic, so both engines derive the
                    # SAME int64 (unlike round()/decimal casts, whose
                    # tie-breaking differs across engines) — then the
                    # integer sum is exact and associative: bit-stable
                    # under any partition layout, any engine
                    * (
                        F.sum(
                            F.floor(
                                F.col("pr") / F.col("outdeg") * 1e12 + 0.5
                            ).cast("long")
                        ).cast("double")
                        / 1e12
                    )
                ).alias("pr")
            )
            .withColumnRenamed("_v", "v")
        )
    out = ranks.select(F.col("v").alias("node"), "pr")
    # materialize the final ranks, then release the iteration input —
    # otherwise the persist pins executor storage for the rest of the
    # session (it taxed every later query in the r02 bench)
    out = out.localCheckpoint(eager=True)
    ge.unpersist()
    return out


@_register(
    "a20_approx_distinct_bound",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
    survey="A-family extension: sketch-based approximate distinct "
    "(HyperLogLog++ approx_count_distinct) validated against the exact "
    "count in the same aggregate — the query RETURNS the exact count plus "
    "a bound check (relative error < 3·rsd), so the oracle stays "
    "hash-comparable while the sketch path is genuinely executed; at "
    "100 TB the sketch is the only mergeable constant-memory distinct",
)
def a20_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct vs exact distinct per event_type. approx is
    deterministic (hash-based, no RNG); the emitted boolean asserts
    |approx − exact| < 3·rsd·exact with rsd=0.05."""
    (ev,) = _ctx(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.05).cast("double")
                - F.count_distinct(F.col("user_id")).cast("double")
            )
            < F.lit(0.15) * F.count_distinct(F.col("user_id")).cast("double")
        ).alias("approx_ok"),
    )


@_register(
    "o10_table_profile",
    """
    WITH s AS (SELECT * FROM orders)
    SELECT 'o_orderkey' AS col, count(*) AS n,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           min(o_orderkey)::DOUBLE AS min_v, max(o_orderkey)::DOUBLE AS max_v
    FROM s
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           min(o_custkey)::DOUBLE, max(o_custkey)::DOUBLE FROM s
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           min(o_totalprice), max(o_totalprice) FROM s
    """,
    survey="extension: one-pass table profiling (per-column null count, "
    "distinct count, min/max envelope — the stats layer every lakehouse "
    "maintenance/data-quality loop runs) — all columns profiled in a "
    "SINGLE aggregate over one scan, then unpivoted to the long "
    "(column, stats) shape; never one scan per column",
)
def o10_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile three orders columns in one scan: the wide single-row
    aggregate computes every per-column stat at once (mergeable,
    map-side partial), and the long output shape comes from stacking
    the struct per column — the inverse-of-pivot trick (w07) applied
    to profiling."""
    (orders,) = _ctx(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}__n").alias("n"),
                        F.col(f"{c}__n_null").alias("n_null"),
                        F.col(f"{c}__n_distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_v"),
                        F.col(f"{c}__max").alias("max_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


@_register(
    "e07_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
    SELECT v.user_id,
           epoch_us(v.t_view) AS view_us,
           epoch_us(c.t_click) AS click_us,
           epoch_us(p.t_purchase) AS purchase_us,
           epoch_us(p.t_purchase) - epoch_us(v.t_view) AS view_to_purchase_us
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
    survey="extension: ordered funnel analysis (first view → first click "
    "after it → first purchase after that, per user) — the SQL literal is "
    "three grouped self-joins; the Spark plan is three chained conditional "
    "window minima over ONE user_id partitioning (the exchange is planned "
    "once and reused — zero extra shuffles, no self-join rescans)",
)
def e07_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage timestamps + end-to-end latency per funnel user. Each
    stage's 'earliest event after the previous stage' is a conditional
    min window over the same user partition; rows collapse to one per
    user at the end. Users who never viewed are out (inner semantics on
    the first stage); later stages are NULL when unreached."""
    (ev,) = _ctx(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    us = F.unix_micros(F.col("ts"))
    s1 = ev.select(
        "user_id",
        "event_type",
        us.alias("ts_us"),
        F.min(F.when(F.col("event_type") == "view", us)).over(w).alias("view_us"),
    )
    s2 = s1.withColumn(
        "click_us",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts_us") > F.col("view_us")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "purchase_us",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts_us") > F.col("click_us")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    return (
        s3.filter(F.col("view_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.first("view_us").alias("view_us"),
            F.first("click_us").alias("click_us"),
            F.first("purchase_us").alias("purchase_us"),
            (F.first("purchase_us") - F.first("view_us")).alias(
                "view_to_purchase_us"
            ),
        )
    )


@_register(
    "o11_compaction_bins",
    """
    WITH f AS (
      SELECT source, doc_id, n_chars,
             coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM documents),
    b AS (
      SELECT source, doc_id, n_chars,
             CAST(floor(prior / 4000.0) AS BIGINT) AS bin_id
      FROM f)
    SELECT source, bin_id, count(*) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS bytes,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM b GROUP BY source, bin_id
    """,
    survey="extension: small-file compaction planning (the OPTIMIZE/"
    "bin-packing pass of lakehouse table maintenance) — files assigned to "
    "~target-size compaction groups by exclusive running size within each "
    "partition (floor(cumsum/target): deterministic, one window, no "
    "driver-side loop; true first-fit is sequential and gains little), "
    "emitting per-bin manifests a rewrite job would execute",
)
def o11_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan ~4000-char compaction bins per source over the documents
    'file listing'. One shuffle on source; the manifest (first/last
    doc, file count, total bytes) is exactly what the rewrite tasks
    consume."""
    (docs,) = _ctx(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.floor(prior / F.lit(4000.0)).alias("bin_id"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").alias("bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@_register(
    "d11_url_dedup",
    """
    WITH u AS (
      SELECT doc_id,
             doc_id // 4 AS base, doc_id % 4 AS v,
             'www.src' || (doc_id // 4 % 20)::VARCHAR || '.example.com' AS host
      FROM documents),
    raw AS (
      SELECT doc_id,
             CASE v
               WHEN 0 THEN 'https://' || host || '/doc/' || base::VARCHAR
               WHEN 1 THEN 'HTTPS://' || upper(host) || '/doc/' || base::VARCHAR
                           || '#sec2'
               WHEN 2 THEN 'https://' || host || ':443/doc/' || base::VARCHAR
                           || '?utm_source=feed'
               ELSE 'https://' || host || '/doc/' || base::VARCHAR || '/'
             END AS url
      FROM u),
    stripped AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(url, '#.*$', '', 'g'),
                            '\\?utm_[a-z_]+=[^&#]*$', '', 'g') AS s
      FROM raw),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(
               lower(regexp_extract(s, '^([A-Za-z]+://[^/]+)', 1)),
               ':443$', '')
             || substr(s, length(regexp_extract(s, '^([A-Za-z]+://[^/]+)', 1))
                          + 1) AS c3
      FROM stripped),
    fin AS (SELECT doc_id, url, regexp_replace(c3, '/$', '') AS canonical
            FROM canon)
    SELECT canonical, count(*) AS n_variants,
           count(DISTINCT url) AS n_raw_forms,
           min(doc_id) AS keeper
    FROM fin GROUP BY canonical
    """,
    survey="north-star dedup: URL canonicalization dedup (the crawl-"
    "pipeline pre-pass: strip fragment + utm tracking params, lowercase "
    "scheme/host, drop default port and trailing slash, then group by the "
    "canonical form) — RE2-compatible regexp chain (no lookahead), all "
    "codegen, one groupBy shuffle; the fixture derives four messy variants "
    "per logical URL so the collapse is non-vacuous",
)
def d11_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic messy URLs (case/port/fragment/tracking/slash variants)
    collapsed by functions.dedup.canonicalize_url."""
    from ..functions.dedup import canonicalize_url

    (docs,) = _ctx(spark, sf_dir, "documents")
    base = F.floor(F.col("doc_id") / 4).cast("long")
    v = F.col("doc_id") % 4
    host = F.concat(
        F.lit("www.src"), (base % 20).cast("string"), F.lit(".example.com")
    )
    b = base.cast("string")
    url = (
        F.when(v == 0, F.concat(F.lit("https://"), host, F.lit("/doc/"), b))
        .when(
            v == 1,
            F.concat(F.lit("HTTPS://"), F.upper(host), F.lit("/doc/"), b, F.lit("#sec2")),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://"), host, F.lit(":443/doc/"), b, F.lit("?utm_source=feed")
            ),
        )
        .otherwise(F.concat(F.lit("https://"), host, F.lit("/doc/"), b, F.lit("/")))
    )
    raw = docs.select("doc_id", url.alias("url"))
    return (
        raw.withColumn("canonical", canonicalize_url(F.col("url")))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.count_distinct(F.col("url")).alias("n_raw_forms"),
            F.min("doc_id").alias("keeper"),
        )
    )


# =====================================================================
# TPC-H shape completion: Q6, Q8, Q9, Q16 analogues — with these, every
# TPC-H query (1-22) has a registered plan-shape analogue (see COVERAGE)
# =====================================================================


@_register(
    "q06_forecast_revenue",
    """
    SELECT sum(l_extendedprice * l_discount) AS revenue, count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey="TPC-H Q6 shape: pure scan-filter-aggregate — every predicate "
    "pushes to the parquet scan (PushedFilters on shipdate/discount/"
    "quantity), zero joins, one partial+final agg; the I/O-bound floor of "
    "the benchmark suite",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change: the canonical pushdown showcase."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_register(
    "q08_market_share",
    """
    WITH vol AS (
      SELECT year(o.o_orderdate) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01')
    SELECT yr,
           sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END)
             / sum(volume) AS mkt_share,
           count(*) AS n
    FROM vol GROUP BY yr
    """,
    survey="TPC-H Q8 shape: market-share ratio — snowflake join (two "
    "nation aliases + region filter on the customer side), then a "
    "CASE-routed share-of-total per year in ONE aggregate; the region "
    "filter prunes the broadcast dim chain before it touches the fact",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of ASIA-customer trade volume per order year."""
    li, orders, cust, sup, nat, reg = _ctx(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("n1_region"),
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy(F.year("o_orderdate").alias("yr")).agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
            / F.sum(vol)
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "q09_product_profit",
    """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
               - 0.01 * p.p_retailprice * l.l_quantity, 6)
               AS DECIMAL(38,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE contains(lower(p.p_name), 'a')
    GROUP BY 1, 2
    """,
    survey="TPC-H Q9 shape: product-type profit — substring filter on the "
    "part dim pushed into the broadcast build side, fact joined to three "
    "dims + orders, profit expression mixing columns of two tables inside "
    "the aggregate, nation×year rollup (the reference has no partsupp "
    "table; supplycost is modeled as a retail-price fraction)",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation × order year over name-matched parts."""
    li, orders, part, sup, nat = _ctx(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )
    j = (
        li.join(
            F.broadcast(part.filter(F.lower(F.col("p_name")).contains("a"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.01
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return j.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr")
    ).agg(_dsum6(profit).alias("profit"))


@_register(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
    survey="TPC-H Q16 shape: NOT IN exclusion subquery (planned as a "
    "null-aware anti join against the blacklist) + count(DISTINCT) per "
    "group over the surviving join — the distinct expands map-side under "
    "partial aggregation, never a second scan",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size) excluding negative-balance
    suppliers. The NOT IN blacklist (no NULL keys by construction)
    becomes a broadcast left-anti join; count_distinct rides the same
    (brand, size) shuffle."""
    li, part, sup = _ctx(spark, sf_dir, "lineitem", "part", "supplier")
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti"
        )
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#11")
                    & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@_register(
    "t10_unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    n AS (SELECT count(*)::DOUBLE AS total FROM toks)
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(-ln(v.cnt / n.total)), 9) AS score_neglogp
    FROM toks t JOIN vocab v ON v.tok = t.tok CROSS JOIN n
    GROUP BY t.doc_id
    """,
    survey="north-star text: unigram-LM document scoring (average token "
    "negative log-probability under the corpus's own unigram model — the "
    "cheap stand-in for CCNet's LM-perplexity quality gate; low score = "
    "boilerplate, high = rare-token noise) — one vocab aggregate broadcast "
    "back onto the token stream + one doc aggregate; the vocab is "
    "Zipf-bounded so the broadcast holds at corpus scale",
)
def t10_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg(-ln p(token)) per document. Three shuffles total (vocab agg,
    doc agg, and the token join rides the broadcast) — the token stream
    is never materialized twice thanks to the explode-barrier trick
    shared with the shingle path."""
    (docs,) = _ctx(spark, sf_dir, "documents")
    from ..functions.text import tokenize

    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    n = toks.agg(F.count(F.lit(1)).cast("double").alias("total"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # score ∈ O(1-10): round(,9) absorbs summation-order noise
            F.round(
                F.avg(-F.log(F.col("cnt") / F.col("total"))), 9
            ).alias("score_neglogp"),
        )
    )


@_register(
    "c14_calendar_rollup",
    """
    SELECT date_part('week', ts) AS iso_week,
           date_part('dow', ts) + 1 AS dow,
           count(*) AS n,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    survey="C-family extension: calendar-hierarchy rollup (ISO week × "
    "day-of-week) — engine date-part semantics reconciled across engines "
    "(Spark dayofweek is 1=Sunday, DuckDB dow is 0=Sunday; ISO week "
    "agrees), the off-by-one traps of every cross-engine date pipeline",
)
def c14_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events by ISO week and day-of-week with value totals."""
    (ev,) = _ctx(spark, sf_dir, "events")
    return ev.groupBy(
        F.weekofyear("ts").cast("bigint").alias("iso_week"),
        F.dayofweek("ts").cast("bigint").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum6(F.col("value")).alias("sum_value"),
    )


@_register(
    "st07_stream_stateful_energy",
    """
    WITH ts AS (
      SELECT CAST(user_id AS VARCHAR) AS cell_id,
             ts AS t, event_id,
             (epoch_us(ts) // 86400000000) // 7 AS cycle_index,
             CASE WHEN event_type IN ('purchase','view') THEN 'CC_DIS'
                  WHEN event_type IN ('click','signup') THEN 'CC_CHG'
                  ELSE 'REST' END AS step_type,
             value AS v
      FROM events),
    dis AS (
      SELECT cell_id, cycle_index, t,
             (3.0 + v % 1.5) * (- v / 100.0) AS p,
             epoch_us(t) / 1000000.0 AS tsec
      FROM ts WHERE step_type = 'CC_DIS'),
    seg AS (
      SELECT cell_id, cycle_index,
             0.5 * (p + lag(p) OVER win) * (tsec - lag(tsec) OVER win) AS s
      FROM dis
      WINDOW win AS (PARTITION BY cell_id, cycle_index ORDER BY t))
    SELECT cell_id, cycle_index,
           CASE WHEN count(*) >= 2
                THEN round(abs(sum(s)) / 3600.0, 6) END AS E_dis_Wh,
           count(*) AS n_points
    FROM seg GROUP BY cell_id, cycle_index
    """,
    survey="streaming: custom stateful operator surface "
    "(applyInPandasWithState — per-(cell,cycle) trapezoid integral "
    "advanced incrementally across micro-batches, state = 4 scalars per "
    "open cycle) replayed over 4 chronological micro-batches and "
    "oracle-checked against the batch lag-window trapezoid (A5): the "
    "stateful stream's final value per key IS the batch integral",
)
def st07_stream_stateful_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed the events-mapped timeseries through the stateful energy
    operator as a 4-batch chronological replay. The feed files are
    written sequentially (distinct mtimes — the file-stream source
    admits files in modification order) with boundaries MID-cycle, so
    most (cell, cycle) groups genuinely accumulate state across
    micro-batches; final state per key = the emission with the highest
    n_points (monotone per key)."""
    import tempfile
    import time as _time

    from ..streaming import run_stream_to_memory
    from ..streaming.features import stream_energy_trapezoid

    ts = events_as_timeseries(spark, sf_dir).select(
        "cell_id", "timestamp", "cycle_index", "step_type", "voltage_v", "current_a"
    )
    src = tempfile.mkdtemp(prefix="st07_") + "/feed"
    day = F.expr("unix_micros(timestamp) div 86400000000")
    d0 = 19723  # 2024-01-01; splits at days +4/+11/+18 cut cycles mid-week
    bounds = [d0 + 4, d0 + 11, d0 + 18]
    lo = None
    for i, hi in enumerate(bounds + [None]):
        part = ts
        if lo is not None:
            part = part.filter(day >= lo)
        if hi is not None:
            part = part.filter(day < hi)
        part.coalesce(1).write.mode("append").parquet(src)
        lo = hi
        if i < 3:
            _time.sleep(1.05)  # distinct mtimes → deterministic file order
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_stream_to_memory(
        stream_energy_trapezoid(stream), output_mode="update"
    )
    return out.groupBy("cell_id", "cycle_index").agg(
        F.max_by("E_dis_Wh", "n_points").alias("E_dis_Wh"),
        F.max("n_points").alias("n_points"),
    )


@_register(
    "w10_navigation_functions",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           lead(value, 1, -1.0) OVER w AS next_value,
           lag(value, 2, 0.0) OVER w AS prev2_value,
           nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_value,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey="O-family completion: navigation window functions — lead/lag "
    "with explicit defaults, nth_value over a running frame, and "
    "last_value IGNORE NULLS as a conditional carry-forward (the "
    "last-observation pattern under one shared partition sort)",
)
def w10_navigation_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four navigation functions over ONE (user, time) sort — the
    planner runs a single window exchange+sort for the lot."""
    (ev,) = _ctx(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.lead("value", 1, -1.0).over(w).alias("next_value"),
        F.lag("value", 2, 0.0).over(w).alias("prev2_value"),
        F.nth_value("value", 3).over(run).alias("third_value"),
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")),
            ignorenulls=True,
        ).over(run).alias("last_purchase_value"),
    )


@_register(
    "a21_sliding_median",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           quantile_cont(value, 0.5) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_win
    FROM events
    """,
    survey="A-family completion: EXACT sliding median (7-row trailing "
    "frame per key) — the robust-smoothing companion to e05's EWMA; frame "
    "size bounds the per-row work so the window is O(n·w log w) per key, "
    "no global buffer (contrast a17's two-pass global quantiles)",
)
def a21_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-sample exact median of event values per user
    (interpolating median — matches quantile_cont)."""
    (ev,) = _ctx(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.percentile("value", 0.5).over(w).alias("med7"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )


# =====================================================================
# Source-format roundtrips: JSONL scan, semicolon-CSV delimiter fallback
# =====================================================================


@_register(
    "src01_jsonl_roundtrip",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value,
           min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
    FROM events GROUP BY event_type
    """,
    survey="S-family extension: JSON-lines source — events written to "
    "JSONL (ISO-8601 timestamps) and re-read with an EXPLICIT schema "
    "(never schema inference: one sampling pass saved, and types are a "
    "declared contract, not a guess), aggregated identically to the "
    "parquet path; timestamps survive the text roundtrip to the "
    "microsecond",
)
def src01_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events to JSONL, read back with explicit schema, rollup.
    The oracle reads the original parquet — equality proves the text
    roundtrip is lossless."""
    import tempfile

    (ev,) = _ctx(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="src01_") + "/events_jsonl"
    # default JSON timestampFormat truncates to milliseconds — declare
    # microsecond precision explicitly on BOTH sides of the roundtrip
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", fmt).json(path)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    back = spark.read.schema(schema).option("timestampFormat", fmt).json(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum6(F.col("value")).alias("sum_value"),
        F.min(F.unix_micros(F.col("ts"))).alias("min_ts_us"),
        F.max(F.unix_micros(F.col("ts"))).alias("max_ts_us"),
    )


@_register(
    "src02_csv_fallback",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    survey="S1 registered in the driver set: semicolon-delimited CSV "
    "(EU-export convention) read through the delimiter-fallback sniffer "
    "(header-line sniff driver-side, ONE distributed scan with the right "
    "sep — never a failed full parse + retry) with all-string schema + "
    "explicit casts; equality against the parquet oracle proves the "
    "fallback path end to end",
)
def src02_csv_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events as ';'-separated CSV, re-read via read_cycler_csv's
    sniffer (which must choose ';'), cast, rollup."""
    import tempfile

    from ..sources.cycler_csv import read_cycler_csv

    (ev,) = _ctx(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="src02_") + "/events_semi.csv"
    ev.select("event_id", "event_type", "value").coalesce(1).write.mode(
        "overwrite"
    ).option("header", True).option("sep", ";").csv(path)
    back = read_cycler_csv(spark, path)  # sniffer must pick ';'
    assert len(back.columns) == 3, "delimiter sniff failed"
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum6(F.col("value").cast("double")).alias("sum_value"),
    )


# =====================================================================
# API-surface completion: MapType, null-safe equality join, bag set ops
# =====================================================================


@_register(
    "c15_map_column_ops",
    """
    WITH pairs AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type)
    SELECT user_id, event_type, n,
           CAST(sum(n) OVER (PARTITION BY user_id) AS BIGINT) AS user_total
    FROM pairs
    """,
    survey="C-family extension: MapType column surface — per-user counts "
    "collected into a map<string,bigint> (map_from_entries over "
    "collect_list of structs), totals computed ON the map with array "
    "HOFs (aggregate over map_values), then exploded back to rows; the "
    "map is the wire format for per-entity feature bundles, the oracle "
    "checks the relational image of the same content",
)
def c15_map_column_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build map columns, compute on them, explode them back — the
    row-wise map surface end to end. At scale the map bundle rides ONE
    user_id shuffle; the window in the oracle is the relational
    equivalent."""
    (ev,) = _ctx(spark, sf_dir, "events")
    bundled = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            ).alias("counts")
        )
        .withColumn(
            "user_total",
            F.aggregate(
                F.map_values("counts"), F.lit(0).cast("bigint"), lambda a, x: a + x
            ),
        )
    )
    return bundled.select(
        "user_id", F.explode("counts").alias("event_type", "n"), "user_total"
    )


@_register(
    "j12_nullsafe_join",
    """
    WITH k AS (
      SELECT event_id, user_id,
             CASE WHEN value < 50 THEN NULL
                  ELSE CAST(floor(value / 50) AS BIGINT) END AS band
      FROM events),
    agg AS (SELECT band, count(*) AS band_n FROM k GROUP BY band)
    SELECT k.band, agg.band_n, count(*) AS n_rows,
           count(DISTINCT k.user_id) AS n_users
    FROM k JOIN agg ON k.band IS NOT DISTINCT FROM agg.band
    GROUP BY k.band, agg.band_n
    """,
    survey="J-family extension: null-safe equality join (<=> / IS NOT "
    "DISTINCT FROM) — NULL keys match each other in the hash join instead "
    "of silently dropping (the classic inner-join data-loss trap when the "
    "key is derived and partially NULL); same hash-join plan, NULL hashes "
    "to a regular bucket",
)
def j12_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join rows back to their band rollup where band is NULL for low
    values — the NULL band keeps its rows under <=> (an equi-join would
    lose them)."""
    (ev,) = _ctx(spark, sf_dir, "events")
    k = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("value") < 50, F.lit(None).cast("bigint"))
        .otherwise(F.floor(F.col("value") / 50).cast("bigint"))
        .alias("band"),
    )
    agg = (
        k.groupBy("band")
        .agg(F.count(F.lit(1)).alias("band_n"))
        .withColumnRenamed("band", "band_r")
    )
    return (
        k.join(F.broadcast(agg), F.col("band").eqNullSafe(F.col("band_r")))
        .select("band", "band_n", "user_id")
        .groupBy("band", "band_n")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


@_register(
    "u04_bag_set_ops",
    """
    WITH a AS (SELECT l_orderkey, l_partkey FROM lineitem
               WHERE l_quantity >= 10),
    b AS (SELECT l_orderkey, l_partkey FROM lineitem
          WHERE l_returnflag = 'R')
    SELECT 'except_all' AS op, count(*) AS n FROM
      (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'intersect_all', count(*) FROM
      (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    """,
    survey="U-family completion: EXCEPT ALL / INTERSECT ALL bag "
    "semantics (multiplicity-preserving difference/intersection via "
    "count-matching hash aggregate — duplicates survive per the SQL "
    "standard, unlike u02's set forms which collapse them); the "
    "reconciliation primitive for row-level table diffs",
)
def u04_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference and intersection between two overlapping lineitem
    projections (duplicates on (orderkey, partkey) preserved)."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 10).select("l_orderkey", "l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_partkey")
    return (
        a.exceptAll(b)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "n")
        .unionByName(
            a.intersectAll(b)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("intersect_all").alias("op"), "n")
        )
    )


@_register(
    "st08_stream_incremental_agg",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    survey="streaming: incremental aggregate maintenance (foreachBatch "
    "merges each micro-batch's PARTIAL count/sum into stored per-key "
    "totals by addition — the mergeable-partial pattern behind every "
    "incremental rollup; state is O(keys), independent of history, and "
    "additive merge makes the final totals batching-invariant) replayed "
    "over 4 micro-batches, oracle-checked against the batch GROUP BY",
)
def st08_stream_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-batch replay through the partial-merge rollup; read back the
    final totals."""
    import os
    import tempfile

    from ..streaming.snapshot import run_stream_agg_snapshot

    (ev,) = _ctx(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="st08_")
    src = os.path.join(tmp, "feed")
    snap = os.path.join(tmp, "snapshot")
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_agg_snapshot(stream, snap, key="event_type", agg_cols={"value": "sum"})
    return spark.read.parquet(snap).select(
        "event_type",
        "n",
        # the snapshot stores exact DECIMAL(38,6) partial-merge totals
        # (batching-invariant); surface as double for the oracle schema
        F.col("sum_value").cast("double").alias("sum_value"),
    )


# =====================================================================
# Spatial bucketed proximity join, running distinct, cohort retention
# =====================================================================


@_register(
    "e08_spatial_join",
    """
    WITH pts AS (
      SELECT event_id,
             value % 10 AS lat,
             (event_id % 1000) / 100.0 AS lon
      FROM events),
    cells AS (
      SELECT event_id, lat, lon,
             CAST(floor(lon / 0.1) AS BIGINT) AS cx,
             CAST(floor(lat / 0.1) AS BIGINT) AS cy
      FROM pts),
    probes AS (
      SELECT c.event_id, c.lat, c.lon, c.cx + dx.i AS px, c.cy + dy.i AS py
      FROM cells c,
           (SELECT unnest(range(-1, 2)) AS i) dx,
           (SELECT unnest(range(-1, 2)) AS i) dy),
    pairs AS (
      SELECT p.event_id AS a, b.event_id AS b
      FROM probes p JOIN cells b ON b.cx = p.px AND b.cy = p.py
      WHERE p.event_id < b.event_id
        AND (p.lon - b.lon) * (p.lon - b.lon)
            + (p.lat - b.lat) * (p.lat - b.lat) < 0.01)
    SELECT a % 16 AS bucket, count(*) AS n_pairs
    FROM pairs GROUP BY 1
    """,
    survey="extension: spatial proximity join via grid bucketing — points "
    "hashed to 0.1° cells, each probe exploded to its 3×3 neighborhood, "
    "equi-join on cell, exact squared-distance residual post-join (the "
    "2-D generalization of e03's band join; candidate volume tracks local "
    "point density × 9, never corpus² — the PostGIS/Sedona "
    "grid-partitioned join shape in pure DataFrame ops). Distance kept in "
    "squared-euclidean form: +,*,sqrt are IEEE-exact across engines, "
    "sin/cos (haversine) are not — a boundary-membership trap for any "
    "cross-engine spatial comparison",
)
def e08_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within 0.1° (synthetic lat/lon derived from the
    events table), bucketed pair counts as the stable output."""
    (ev,) = _ctx(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        (F.col("value") % 10).alias("lat"),
        ((F.col("event_id") % 1000) / 100.0).alias("lon"),
    )
    cells = pts.select(
        "event_id",
        "lat",
        "lon",
        F.floor(F.col("lon") / 0.1).alias("cx"),
        F.floor(F.col("lat") / 0.1).alias("cy"),
    )
    off = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    probes = (
        cells.select("event_id", "lat", "lon", "cx", "cy", off.alias("dx"))
        .select("event_id", "lat", "lon", "cx", "cy", "dx", off.alias("dy"))
        .select(
            F.col("event_id").alias("a_id"),
            F.col("lat").alias("a_lat"),
            F.col("lon").alias("a_lon"),
            (F.col("cx") + F.col("dx")).alias("px"),
            (F.col("cy") + F.col("dy")).alias("py"),
        )
    )
    j = probes.join(
        cells, (F.col("px") == F.col("cx")) & (F.col("py") == F.col("cy"))
    ).filter(
        (F.col("a_id") < F.col("event_id"))
        & (
            (F.col("a_lon") - F.col("lon")) * (F.col("a_lon") - F.col("lon"))
            + (F.col("a_lat") - F.col("lat")) * (F.col("a_lat") - F.col("lat"))
            < 0.01
        )
    )
    return j.groupBy((F.col("a_id") % 16).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@_register(
    "e09_running_distinct",
    """
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
    days AS (
      SELECT epoch_us(date_trunc('day', first_ts)) AS day_us,
             count(*) AS n_new
      FROM firsts GROUP BY 1)
    SELECT day_us, n_new,
           CAST(sum(n_new) OVER (ORDER BY day_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_cum
    FROM days
    """,
    survey="extension: running distinct count (cumulative unique users "
    "by day) — the naive per-day COUNT(DISTINCT) over a growing window "
    "rescans history quadratically; the first-occurrence decomposition "
    "(min ts per user → new-users per day → cumsum) is one user shuffle "
    "+ one tiny day window, linear at any scale",
)
def e09_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user and cumulative-user counts via first-occurrence
    decomposition (the day-level window runs over ~30 rows — the
    single-partition window is on the AGGREGATE, never the fact)."""
    (ev,) = _ctx(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    days = firsts.groupBy(
        F.unix_micros(F.date_trunc("day", F.col("first_ts"))).alias("day_us")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("day_us").rowsBetween(Window.unboundedPreceding, 0)
    return days.select("day_us", "n_new", F.sum("n_new").over(w).alias("n_cum"))


@_register(
    "o12_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, date_trunc('day', e.ts) AS activity_day
      FROM events e)
    SELECT epoch_us(f.cohort_day) AS cohort_us,
           date_diff('day', f.cohort_day, a.activity_day) AS day_offset,
           count(*) AS n_active
    FROM activity a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    survey="extension: cohort retention matrix (users bucketed by first-"
    "seen day × activity-day offset — the standard product-analytics "
    "retention triangle) — one distinct per (user, day), cohort label "
    "broadcast back onto activity, one (cohort, offset) aggregate",
)
def o12_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: active-user counts per cohort × day offset."""
    (ev,) = _ctx(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("activity_day")
    ).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            F.unix_micros(F.col("cohort_day")).alias("cohort_us"),
            F.datediff(F.col("activity_day"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@_register(
    "s06_label_centroids",
    """
    WITH dims AS (
      SELECT e.label, i.i AS dim, e.embedding[i.i]::DOUBLE AS v
      FROM embeddings e,
           LATERAL (SELECT unnest(generate_series(1, 64)) AS i) i),
    cent AS (
      SELECT label, array_agg(c ORDER BY dim) AS centroid
      FROM (SELECT label, dim, avg(v) AS c FROM dims GROUP BY label, dim)
      GROUP BY label),
    scored AS (
      SELECT e.label,
             list_dot_product(e.embedding::DOUBLE[], c.centroid)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.centroid, c.centroid))) AS cos
      FROM embeddings e JOIN cent c ON c.label = e.label)
    SELECT label, count(*) AS n_vecs, avg(cos) AS mean_cos, min(cos) AS min_cos
    FROM scored GROUP BY label
    """,
    survey="north-star similarity: per-label embedding mean-pooling "
    "(centroid via posexplode → (label, dim) aggregate — the per-dimension "
    "shuffle is (labels × dims) rows, never vectors × dims concentrated on "
    "one reducer) + per-vector cosine-to-own-centroid residuals (zip_with "
    "fold, same sequential order as the SQL dot product) — the class-"
    "compactness / outlier-screen primitive of embedding-corpus curation",
)
def s06_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + cohesion stats (mean/min cosine of members
    to their centroid)."""
    (emb,) = _ctx(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).toDF("label", "dim", "v")
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    v = F.col("embedding").cast("array<double>")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label",
        (
            dot(v, F.col("centroid"))
            / (F.sqrt(dot(v, v)) * F.sqrt(dot(F.col("centroid"), F.col("centroid"))))
        ).alias("cos"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.avg("cos").alias("mean_cos"),
        F.min("cos").alias("min_cos"),
    )


@_register(
    "o13_winsorize",
    """
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN e.value < q.p05 OR e.value > q.p95
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           avg(CASE WHEN e.value < q.p05 THEN q.p05
                    WHEN e.value > q.p95 THEN q.p95
                    ELSE e.value END) AS mean_winsorized,
           avg(e.value) AS mean_raw
    FROM events e JOIN q ON q.event_type = e.event_type
    GROUP BY e.event_type
    """,
    survey="extension: winsorization (clip at per-key exact p05/p95 and "
    "compare trimmed vs raw means — the outlier-robust normalization pass "
    "of feature pipelines) — quantiles computed once per key, broadcast "
    "back onto the fact, clip + re-aggregate in one pass",
)
def o13_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorized means with clip counts."""
    (ev,) = _ctx(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    clipped = (
        F.when(F.col("value") < F.col("p05"), F.col("p05"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95")), 1
            ).otherwise(0)
        ).alias("n_clipped"),
        F.avg(clipped).alias("mean_winsorized"),
        F.avg("value").alias("mean_raw"),
    )


@_register(
    "e10_twap",
    """
    WITH s AS (
      SELECT user_id, value,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
      FROM events)
    SELECT user_id,
           (CAST(sum(CAST(floor(value * (nxt - t) * 100.0 + 0.5) AS BIGINT))
                 AS DOUBLE) / 100.0)
             / CAST(sum(nxt - t) AS DOUBLE) AS twap,
           CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                AS DOUBLE) / count(*) AS mean_unweighted,
           count(*) AS n_intervals
    FROM s WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
    survey="extension: time-weighted average over irregular samples "
    "(each sample weighted by its holding interval to the next — the "
    "TWAP/step-function integral; the unweighted mean is biased wherever "
    "sampling density correlates with level) — one lead window + one "
    "keyed aggregate",
)
def e10_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TWAP vs naive mean (last open-ended sample excluded)."""
    (ev,) = _ctx(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    s = ev.select(
        "user_id", "value", t.alias("t"), F.lead(t).over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    dt = F.col("nxt") - F.col("t")
    # value·dt quantized to integer centi-units with floor(x*100+0.5):
    # the per-row double is IEEE-identical on both engines and the
    # int64 sum is exact and associative (value·µs reaches ~1e13 where
    # plain double sums differ by >1e-3 across partition layouts);
    # the interval sum is already an exact integer sum.
    # Magnitude bound (same discipline as operators/energy.py): the
    # int64 sum wraps silently in non-ANSI mode past ~9.2e18 centi-units,
    # i.e. Σ|value|·dt_µs < 9.2e16 per key — at |value| ≤ 1e3 that is
    # ~2.9 key-years of continuously-held µs intervals; a corpus past it
    # should move this sum to DECIMAL(38,0) (exact, unbounded for any
    # realistic horizon) at ~2× aggregate cost.
    vdt_c = F.floor(F.col("value") * dt * 100.0 + 0.5).cast("long")
    return s.groupBy("user_id").agg(
        (
            (F.sum(vdt_c).cast("double") / 100.0)
            / F.sum(dt).cast("double")
        ).alias("twap"),
        (_dsum6(F.col("value")) / F.count(F.lit(1))).alias(
            "mean_unweighted"
        ),
        F.count(F.lit(1)).alias("n_intervals"),
    )


@_register(
    "e11_ohlc_bars",
    """
    SELECT user_id,
           epoch_us(date_trunc('day', ts)) AS bar_us,
           min_by(value, printf('%020d-%012d', epoch_us(ts), event_id)) AS open,
           max(value) AS high,
           min(value) AS low,
           max_by(value, printf('%020d-%012d', epoch_us(ts), event_id)) AS close,
           count(*) AS n_ticks
    FROM events
    GROUP BY 1, 2
    """,
    survey="extension: OHLC bar aggregation (open/high/low/close per "
    "key × day) — open/close are ordered firsts/lasts expressed as "
    "min_by/max_by on a composite (time, id) key, so the whole bar is ONE "
    "hash aggregate with map-side partials; never a sort or window over "
    "the tick stream",
)
def e11_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per user from the event tick stream."""
    (ev,) = _ctx(spark, sf_dir, "events")
    # composite order key as a zero-padded string: lexicographic ==
    # (time, id) numeric order, and portable to engines whose
    # min_by/max_by lack array/struct keys
    okey = F.format_string(
        "%020d-%012d", F.unix_micros(F.col("ts")), F.col("event_id")
    )
    return ev.groupBy(
        "user_id",
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("bar_us"),
    ).agg(
        F.min_by("value", okey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", okey).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


# =====================================================================
# Gaps-and-islands, forward as-of, z-score, inter-arrival histogram
# =====================================================================


@_register(
    "o14_gaps_islands",
    """
    WITH ids AS (
      SELECT event_id,
             event_id - row_number() OVER (ORDER BY event_id) AS grp
      FROM events WHERE event_id % 97 <> 0),
    islands AS (
      SELECT min(event_id) AS island_start, max(event_id) AS island_end,
             count(*) AS island_len
      FROM ids GROUP BY grp)
    SELECT island_start, island_end, island_len FROM islands
    """,
    survey="extension: gaps-and-islands (maximal consecutive-id runs via "
    "the id − row_number() constant-per-run trick — one sort, one "
    "aggregate; the completeness/missing-range audit for sequenced "
    "ingest). The global row_number is the documented single-sort cost; "
    "at 100 TB the id space is range-bucketed first and the trick runs "
    "per bucket with boundary stitching",
)
def o14_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Islands of consecutive event_ids after deleting every 97th —
    finds the deletions as island boundaries."""
    (ev,) = _ctx(spark, sf_dir, "events")
    ids = ev.filter(F.col("event_id") % 97 != 0).select("event_id")
    w = Window.orderBy("event_id")
    grp = (F.col("event_id") - F.row_number().over(w)).alias("grp")
    return (
        ids.select("event_id", grp)
        .groupBy("grp")
        .agg(
            F.min("event_id").alias("island_start"),
            F.max("event_id").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .drop("grp")
    )


@_register(
    "e12_asof_forward",
    """
    WITH probes AS (
      SELECT user_id, epoch_us(ts) AS probe_us, event_id AS probe_id
      FROM events WHERE event_type = 'view'),
    readings AS (
      SELECT user_id, epoch_us(ts) AS r_us, value AS next_value
      FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.probe_id, p.probe_us,
           (SELECT min(r.r_us) FROM readings r
            WHERE r.user_id = p.user_id AND r.r_us >= p.probe_us) AS next_us,
           (SELECT min(r.next_value) FROM readings r
            WHERE r.user_id = p.user_id
              AND r.r_us = (SELECT min(r2.r_us) FROM readings r2
                            WHERE r2.user_id = p.user_id
                              AND r2.r_us >= p.probe_us)) AS next_value
    FROM probes p
    """,
    survey="extension: FORWARD as-of join (earliest right row at-or-after "
    "each probe — the mirror of e01's backward form; next-reading / "
    "time-to-next-event alignment) — same union trick, descending sort, "
    "one shuffle; the correlated-subquery SQL literal would rescan "
    "readings per probe",
)
def e12_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next purchase value at-or-after each view, per user."""
    from ..functions.events import asof_join_forward

    (ev,) = _ctx(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("probe_us"),
        F.col("event_id").alias("probe_id"),
    )
    readings = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("probe_us"),
        F.unix_micros(F.col("ts")).alias("next_us"),
        F.col("value").alias("next_value"),
    )
    out = asof_join_forward(
        probes,
        readings.select("user_id", "probe_us", "next_us", "next_value"),
        on="probe_us",
        by=["user_id"],
        value_cols=["next_us", "next_value"],
    )
    return out.select("user_id", "probe_id", "probe_us", "next_us", "next_value")


@_register(
    "a22_zscore",
    """
    WITH stats AS (
      SELECT event_type,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) / count(*) AS mu,
             sqrt((CAST(sum(CAST(round(value * value, 6) AS DECIMAL(38,6)))
                        AS DOUBLE)
                   - CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                          AS DOUBLE)
                     * CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                            AS DOUBLE) / count(*))
                  / (count(*) - 1)) AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 9) AS z
    FROM events e JOIN stats s ON s.event_type = e.event_type
    """,
    survey="A-family extension: per-key z-score normalization (the "
    "standard feature-scaling pass) — group moments computed once, "
    "broadcast back onto the fact, one scan each way; the window "
    "formulation (avg/stddev OVER key) is equivalent but re-sorts the "
    "fact — the join-back is the scale shape",
)
def a22_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized event values per event_type. Moments come from
    grid-rounded sums (2dp data) combined with the same closed form as
    the oracle — deterministic across engines and partition layouts;
    the emitted z rounds at 9dp (O(1) magnitude)."""
    (ev,) = _ctx(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    s1 = _dsum6(F.col("value"))
    s2 = _dsum6(F.col("value") * F.col("value"))
    stats = ev.groupBy("event_type").agg(
        (s1 / n).alias("mu"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("sigma"),
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 9).alias("z"),
    )


@_register(
    "e13_interarrival_histogram",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT event_type,
           CAST(floor(gap_us / 60000000.0) AS BIGINT) AS gap_minutes,
           count(*) AS n
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY 1, 2
    """,
    survey="extension: inter-arrival-time histogram (lag gap per key → "
    "fixed-width minute buckets → counts; the burstiness/heartbeat "
    "diagnostic for event feeds) — one keyed window + one aggregate, "
    "bucket id by integer floor so the histogram is engine-exact",
)
def e13_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of gaps between consecutive same-type events."""
    (ev,) = _ctx(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "event_type", (t - F.lag(t).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy(
        "event_type",
        F.floor(F.col("gap_us") / 60000000.0).alias("gap_minutes"),
    ).agg(F.count(F.lit(1)).alias("n"))


@_register(
    "t11_feature_hashing",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    hashed AS (
      SELECT doc_id,
             (('0x' || substr(md5(tok), 1, 8))::BIGINT) % 256 AS feat_idx,
             CASE WHEN (('0x' || substr(md5('s|' || tok), 1, 8))::BIGINT) % 2
                  = 0 THEN 1 ELSE -1 END AS sign
      FROM toks)
    SELECT doc_id, feat_idx, CAST(sum(sign) AS BIGINT) AS weight,
           count(*) AS n_tokens
    FROM hashed GROUP BY doc_id, feat_idx
    HAVING sum(sign) <> 0
    """,
    survey="north-star text: feature hashing (the hashing-trick "
    "vectorizer — tokens hashed to a fixed 256-dim index space with a "
    "second salted hash as the collision-debiasing sign, per-doc sparse "
    "weights) — fixed dimensionality with NO vocabulary table to build, "
    "broadcast, or keep consistent across corpus versions; one (doc, "
    "index) aggregate, md5-derived so any engine reproduces the exact "
    "same feature space",
)
def t11_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashed bag-of-words (256 dims) per document; zero-sum
    collision cells dropped as in the standard formulation."""
    from ..functions.sampling import hash_bucket

    (docs,) = _ctx(spark, sf_dir, "documents")
    from ..functions.text import tokenize

    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    sign = F.when(
        hash_bucket(F.col("tok"), n_buckets=2, salt="s|") == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    hashed = toks.select(
        "doc_id",
        hash_bucket(F.col("tok"), n_buckets=256).alias("feat_idx"),
        sign.alias("sign"),
    )
    return (
        hashed.groupBy("doc_id", "feat_idx")
        .agg(F.sum("sign").alias("weight"), F.count(F.lit(1)).alias("n_tokens"))
        .filter(F.col("weight") != 0)
    )


@_register(
    "u05_bag_counts_derived",
    """
    WITH a AS (SELECT l_orderkey, l_partkey FROM lineitem
               WHERE l_quantity >= 10),
    b AS (SELECT l_orderkey, l_partkey FROM lineitem
          WHERE l_returnflag = 'R')
    SELECT 'except_all' AS op, count(*) AS n FROM
      (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'intersect_all', count(*) FROM
      (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    """,
    survey="U-family scale path: bag-op multiplicities WITHOUT row "
    "replication — per-key counts on each side, one full-outer join, "
    "Σ greatest(cnt_a−cnt_b, 0) / Σ least(cnt_a, cnt_b); verified "
    "against the SAME EXCEPT ALL / INTERSECT ALL oracle as u04, proving "
    "the derivation exact while replacing u04's 4 wide shuffles + "
    "count-replication Generate (12× superlinear at 10×, see SCALING) "
    "with one narrow count shuffle per side",
)
def u05_bag_counts_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production formulation of u04's result: multiplicity algebra
    on grouped counts instead of materializing replicated rows."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_partkey"]
    ca = (
        li.filter(F.col("l_quantity") >= 10)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    cb = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    j = ca.join(cb, keys, "full_outer").select(
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    return (
        j.agg(F.sum(F.greatest(F.col("ca") - F.col("cb"), F.lit(0))).alias("n"))
        .select(F.lit("except_all").alias("op"), "n")
        .unionByName(
            j.agg(F.sum(F.least(F.col("ca"), F.col("cb"))).alias("n")).select(
                F.lit("intersect_all").alias("op"), "n"
            )
        )
    )


# =====================================================================
# Python-integration surface completion: scalar + grouped-agg pandas
# UDFs, Spark 4 pure-Python DataSource
# =====================================================================


@_register(
    "a23_scalar_pandas_udf",
    """
    WITH stats AS (
      SELECT event_type,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) / count(*) AS mu,
             sqrt((CAST(sum(CAST(round(value * value, 6) AS DECIMAL(38,6)))
                        AS DOUBLE)
                   - CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                          AS DOUBLE)
                     * CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6)))
                            AS DOUBLE) / count(*))
                  / (count(*) - 1)) AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_id,
           round(1.0 / (1.0 + exp(-((e.value - s.mu) / s.sigma))), 9)
             AS sigmoid_z
    FROM events e JOIN stats s ON s.event_type = e.event_type
    """,
    survey="UDF-surface completion: SCALAR Arrow-vectorized pandas_udf "
    "(sigmoid scoring over z-scores — numpy on Arrow batches, ~10-100× "
    "a row-at-a-time Python UDF; the JVM expression would be faster "
    "still, used here to verify the vectorized scalar path end to end "
    "against the SQL formula)",
)
def a23_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF over the broadcast-normalized value."""
    from ..functions.pyudf import sigmoid

    (ev,) = _ctx(spark, sf_dir, "events")
    # mu/sigma from grid-rounded sums (2dp data) with the same closed
    # form as the oracle — deterministic inputs to the UDF; the output
    # rounds at 9dp to absorb numpy-vs-libm exp() ulp differences
    n = F.count(F.lit(1))
    s1 = _dsum6(F.col("value"))
    s2 = _dsum6(F.col("value") * F.col("value"))
    stats = ev.groupBy("event_type").agg(
        (s1 / n).alias("mu"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("sigma"),
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        F.round(
            sigmoid((F.col("value") - F.col("mu")) / F.col("sigma")), 9
        ).alias("sigmoid_z"),
    )


@_register(
    "a24_grouped_agg_pandas_udf",
    """
    SELECT event_type, round(exp(avg(ln(value))), 9) AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
    survey="UDF-surface completion: GROUPED_AGG pandas_udf (per-key "
    "geometric mean — a whole group's values arrive as one pandas "
    "Series, reduced in numpy; the custom-aggregate escape hatch when "
    "no built-in composition exists). CAVEAT encoded in the docstring: "
    "grouped-agg UDFs have no partial aggregation — every raw value "
    "shuffles to its reducer, unlike built-in aggs; prefer "
    "exp(avg(ln)) composition where it exists",
)
def a24_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean per event_type via a grouped-agg pandas UDF,
    verified against the exp(avg(ln)) SQL identity (same float op
    order inside numpy: mean of logs, then exp)."""
    from ..functions.pyudf import geo_mean

    (ev,) = _ctx(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") > 0)
        .groupBy("event_type")
        # grouped-agg pandas UDFs cannot mix with built-in aggregates in
        # one agg (INVALID_PANDAS_UDF_PLACEMENT) — single-UDF aggregate
        .agg(F.round(geo_mean(F.col("value")), 9).alias("geo_mean"))
    )


@_register(
    "src03_python_datasource",
    """
    WITH g AS (
      SELECT p.p AS part, i.i AS i
      FROM (SELECT unnest(range(0, 4)) AS p) p,
           (SELECT unnest(range(0, 2500)) AS i) i)
    SELECT part, count(*) AS n, sum(reading) AS sum_reading,
           min(tick) AS min_tick, max(tick) AS max_tick
    FROM (SELECT part, part * 2500 + i AS tick,
                 sin(part * 2500 + i) * 100 AS reading
          FROM g)
    GROUP BY part
    """,
    survey="S-family extension: Spark 4 pure-Python DataSource API — a "
    "custom batch connector (DataSource/DataSourceReader with 4 "
    "partition splits, deterministic rows as a pure function of "
    "(partition, index)) registered and consumed via "
    "spark.read.format(); the surface any bespoke lab-equipment or "
    "vendor-API connector plugs into, each partition read "
    "independently by its executor",
)
def src03_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register a synthetic telemetry DataSource and aggregate it; the
    oracle regenerates the same deterministic stream relationally."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _SimReader(DataSourceReader):
        def __init__(self, n_parts: int = 4, rows_per_part: int = 2500):
            self.n_parts = n_parts
            self.rows = rows_per_part

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            import math

            p = partition.value
            for i in range(self.rows):
                tick = p * self.rows + i
                yield (p, tick, math.sin(tick) * 100.0)

    class CyclerSimSource(DataSource):
        @classmethod
        def name(cls):
            return "cycler_sim"

        def schema(self):
            return "part int, tick long, reading double"

        def reader(self, schema):
            return _SimReader()

    spark.dataSource.register(CyclerSimSource)
    df = spark.read.format("cycler_sim").load()
    return df.groupBy("part").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("reading").alias("sum_reading"),
        F.min("tick").alias("min_tick"),
        F.max("tick").alias("max_tick"),
    )


@_register(
    "a25_approx_percentile_bound",
    """
    WITH ranked AS (
      SELECT event_type, value,
             percent_rank() OVER (PARTITION BY event_type ORDER BY value)
               AS pr
      FROM events)
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50_exact,
           TRUE AS approx_in_bounds
    FROM events GROUP BY event_type
    """,
    survey="A-family completion: mergeable approximate percentile "
    "(percentile_approx / GK sketch) validated in-query — the sketch's "
    "p50 must land within the value range whose exact percent_rank is "
    "0.5 ± accuracy; the emitted boolean keeps the oracle hash-"
    "comparable while the sketch path genuinely executes. The sketch is "
    "the 100 TB shape: bounded memory, mergeable partials (contrast "
    "a17's exact two-pass)",
)
def a25_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx(0.5, accuracy=1000) vs exact median: assert
    the approx value's true rank is within 0.5 ± 1/1000 (the GK
    guarantee), emit exact p50 + the bound check."""
    (ev,) = _ctx(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000).alias("p50_approx")
    )
    j = ev.join(F.broadcast(approx), "event_type")
    # true rank of the approx value = fraction of values strictly below
    rank_of_approx = F.sum(
        F.when(F.col("value") < F.col("p50_approx"), 1).otherwise(0)
    ) / F.count(F.lit(1))
    return j.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50_exact"),
        (F.abs(rank_of_approx - 0.5) < 0.01).alias("approx_in_bounds"),
    )


@_register(
    "j13_param_grid",
    """
    SELECT r.r_name, p.g_priority AS o_orderpriority, count(x.o_orderkey) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderpriority AS g_priority FROM orders) p
    LEFT JOIN (
      SELECT o.o_orderkey, o.o_orderpriority, n.n_regionkey
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey) x
      ON x.o_orderpriority = p.g_priority AND x.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, p.g_priority
    """,
    survey="J-family completion: explicit CROSS JOIN (small dim × small "
    "dim parameter grid, every combination present even at zero count — "
    "the dense-report/experiment-grid shape an inner join silently "
    "drops) followed by left joins back onto the fact; the cartesian is "
    "|regions|×|priorities| rows, never fact-sized",
)
def j13_param_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense region × priority grid with order counts (zero-count
    cells retained)."""
    orders, cust, nat, reg = _ctx(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    prios = (
        orders.select(F.col("o_orderpriority").alias("g_priority")).distinct()
    )
    grid = reg.crossJoin(prios)
    enriched = (
        orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("o_orderkey").alias("e_orderkey"),
            F.col("o_orderpriority").alias("e_priority"),
            F.col("n_regionkey").alias("e_regionkey"),
        )
    )
    j = grid.join(
        enriched,
        (F.col("g_priority") == F.col("e_priority"))
        & (F.col("r_regionkey") == F.col("e_regionkey")),
        "left",
    )
    return j.groupBy(
        "r_name", F.col("g_priority").alias("o_orderpriority")
    ).agg(F.count("e_orderkey").alias("n"))


@_register(
    "t12_explode_outer",
    """
    WITH toks AS (
      SELECT d.doc_id, t.tok
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[ab][a-z0-9]*') AS ws
            FROM documents) d
      LEFT JOIN LATERAL (SELECT unnest(d.ws) AS tok) t ON TRUE)
    SELECT doc_id, count(tok) AS n_ab_tokens,
           count(*) AS n_rows
    FROM toks GROUP BY doc_id
    """,
    survey="generate-surface completion: explode_outer (LATERAL VIEW "
    "OUTER) — docs whose token filter matches nothing keep ONE row with "
    "a NULL token instead of vanishing (the silent-row-loss trap of "
    "plain explode when downstream re-aggregates per doc); count(col) "
    "vs count(*) distinguishes empties",
)
def t12_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens starting with a/b per doc via explode_outer — zero-match
    docs survive with n_ab_tokens=0, n_rows=1."""
    (docs,) = _ctx(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[ab][a-z0-9]*"), 0)
    return (
        docs.select("doc_id", F.explode_outer(ws).alias("tok"))
        .groupBy("doc_id")
        .agg(F.count("tok").alias("n_ab_tokens"), F.count(F.lit(1)).alias("n_rows"))
    )


@_register(
    "t13_curation_funnel",
    None,  # filled below from LANG_MARKERS
    survey="north-star capstone: C4/CCNet-style curation funnel — "
    "langID -> quality -> length -> exact dedup composed in ONE scan "
    "plus one survivor-only fingerprint shuffle, emitting every doc "
    "with the first stage that dropped it (and its keeper when the "
    "stage is 'duplicate') — the per-doc audit trail that lets filter "
    "thresholds be tuned without re-running upstream stages; cheap "
    "row-local screens run before the global dedup exchange, so the "
    "shuffle shrinks with filter selectivity (the production stage "
    "ordering at corpus scale)",
)
def t13_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation verdicts over the documents corpus."""
    from ..functions.text import curation_funnel

    (docs,) = _ctx(spark, sf_dir, "documents")
    return curation_funnel(docs)


def _t13_oracle() -> str:
    from ..functions.text import LANG_MARKERS

    hit_cols = ",\n             ".join(
        "len(regexp_extract_all(lower(text), '\\b("
        + "|".join(words)
        + ")\\b')) AS hits_" + lang
        for lang, words in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    guess = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lg in langs:  # insertion order = tie priority, matches Spark
        guess += f"WHEN hits_{lg} = {best} THEN '{lg}' "
    guess += "END"
    en_re = "\\b(" + "|".join(LANG_MARKERS["en"]) + ")\\b"
    return f"""
    WITH src AS (
      SELECT doc_id, coalesce(text, '') AS text FROM documents),
    base AS (
      SELECT doc_id,
             {hit_cols},
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
             CAST(len(regexp_extract_all(lower(text), '{en_re}')) AS DOUBLE)
               AS n_stop,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
               AS n_punct,
             CAST(length(text) AS DOUBLE) AS n_chars,
             md5(array_to_string(
               regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
      FROM src),
    scored AS (
      SELECT doc_id, n_tokens, fp, {guess} AS lang_guess,
             0.5 * least(n_chars / 500.0, 1.0)
             + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars
                                 ELSE 0.0 END)
             + 0.2 * (CASE WHEN n_tokens > 0
                           THEN n_stop / CAST(n_tokens AS DOUBLE)
                           ELSE 0.0 END) AS q
      FROM base),
    ranked AS (
      SELECT *,
             CASE WHEN surv THEN CAST(sum(CASE WHEN surv THEN 1 ELSE 0 END)
               OVER (PARTITION BY fp ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) END AS rn,
             min(CASE WHEN surv THEN doc_id END)
               OVER (PARTITION BY fp) AS keeper
      FROM (SELECT *, lang_guess = 'en' AND q >= 0.5 AND n_tokens >= 5
                      AS surv
            FROM scored))
    SELECT doc_id, lang_guess, n_tokens, round(q, 9) AS quality,
           CASE WHEN lang_guess <> 'en' THEN 'lang'
                WHEN q < 0.5 THEN 'quality'
                WHEN n_tokens < 5 THEN 'length'
                WHEN rn > 1 THEN 'duplicate'
                ELSE 'kept' END AS stage,
           CASE WHEN rn > 1 THEN keeper END AS kept_as
    FROM ranked
    """


QUERIES["t13_curation_funnel"].oracle = _t13_oracle()
