"""Cycler events queries (split from the former monolithic plans/queries.py).

Importing this module REGISTERS its queries (oracle SQL inline) into
the shared registry — plans/queries.py imports every family module in
the original definition order, so driver-facing ordering is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from ._registry import QUERIES, _ctx, _dsum6, _fsum6_micro, _register

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
    WITH s AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) END) AS n_micro,
             sum(CASE WHEN event_type = 'view'
                      THEN CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) END) AS d_micro
      FROM events GROUP BY user_id)
    SELECT user_id,
           CASE WHEN coalesce(d_micro, 0) = 0 THEN NULL
                ELSE CAST(n_micro AS DOUBLE) / CAST(d_micro AS DOUBLE)
           END AS purchase_view_ratio
    FROM s
    """,
    survey="A3 C9 (guarded ratio; NULL on zero/absent denominator)",
    note="micro-unit integer sums (see _fsum6_micro): the r05 100x sweep "
    "caught the raw double-sum form hash-diverging once per-user event "
    "counts grew 100x — the ratio of two EXACT int64 sums (cast to "
    "double, one division) is bit-identical on both engines at any "
    "group size, and the scale factor 1e6 cancels in the ratio.",
)
def a03_guarded_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _ctx(spark, sf_dir, "events")
    num = _fsum6_micro(F.when(F.col("event_type") == "purchase", F.col("value")))
    den = _fsum6_micro(F.when(F.col("event_type") == "view", F.col("value")))
    agg = ev.groupBy("user_id").agg(num.alias("_n"), den.alias("_d"))
    return agg.select(
        "user_id",
        F.when(
            F.coalesce(F.col("_d"), F.lit(0)) == 0, F.lit(None).cast("double")
        )
        .otherwise(F.col("_n").cast("double") / F.col("_d").cast("double"))
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
    # Two plan-shape fixes over the naive single agg (measured 3.0s →
    # 1.4s bench-style at sf0.1, and the only shapes that survive
    # 100 TB):
    # - count(distinct) split into its own aggregate: fused, it forces
    #   Catalyst to key EVERY function — including the median buffer
    #   and the min_by/max_by state — by l_orderkey first (one
    #   percentile buffer per order, double exchange). Decomposed, the
    #   distinct count is a codegen'd two-stage hash agg and the 1-row
    #   crossJoin is free.
    # - exact median via the a17 bucketed-selection helper (1.9s of
    #   the original time was F.median's TypedImperativeAggregate
    #   collecting the whole column into one final merge; the 2-pass
    #   selection is three codegen'd scans with O(buckets) driver
    #   state, bit-compatible with quantile_cont — pinned by a17).
    from ..functions.stats import exact_quantiles_2pass

    median = exact_quantiles_2pass(li, "l_extendedprice", [0.5])[0.5]
    stats = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("null_qty"),
        F.min("l_discount").alias("disc_min"),
        F.max("l_discount").alias("disc_max"),
        F.min_by("l_extendedprice", order_key).alias("first_price"),
        F.max_by("l_extendedprice", order_key).alias("last_price"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias("n_nonpos"),
    ).withColumn("price_median", F.lit(median))
    n_orders = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    return stats.crossJoin(n_orders).select(
        "n_rows",
        "n_orders",
        "null_qty",
        "disc_min",
        "disc_max",
        "price_median",
        "first_price",
        "last_price",
        "n_nonpos",
    )


