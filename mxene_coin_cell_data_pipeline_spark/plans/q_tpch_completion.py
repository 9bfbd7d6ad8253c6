"""Tpch completion queries (split from the former monolithic plans/queries.py).

Importing this module REGISTERS its queries (oracle SQL inline) into
the shared registry — plans/queries.py imports every family module in
the original definition order, so driver-facing ordering is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from ._registry import QUERIES, _ctx, _dsum6, _fsum6, _register
from .flagship import events_as_timeseries

# =====================================================================
# TPC-H shape completion: Q6, Q8, Q9, Q16 analogues — with these, every
# TPC-H query (1-22) has a registered plan-shape analogue (see COVERAGE)
# =====================================================================


@_register(
    "q06_forecast_revenue",
    """
    SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 1000000.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
           count(*) AS n
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
            # _fsum6: raw double sum drifted on the last digit at 100x
            # (60M-row partial-agg tree vs DuckDB's order — measured
            # 3855839400.2000766 vs ...076); micro-unit int64 is exact
            # and engine-identical at any layout. Total ~3.9e15 micro
            # at 100x — 2400x int64 headroom.
            _fsum6(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
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
           sum(CASE WHEN supp_nation = 'NATION_3'
                    THEN CAST(floor(volume * 1000000.0 + 0.5) AS BIGINT)
                    ELSE 0 END)
             / sum(CAST(floor(volume * 1000000.0 + 0.5) AS BIGINT))
             AS mkt_share,
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
    # ratio of exact int64 micro-unit sums (_fsum6_micro): the share is
    # ONE long/long division on identical operands in both engines —
    # a ratio of order-dependent double sums flipped at 100x
    vol_micro = F.floor(vol * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return j.groupBy(F.year("o_orderdate").alias("yr")).agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol_micro).otherwise(F.lit(0)))
            / F.sum(vol_micro)
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


