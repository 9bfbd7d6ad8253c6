"""Relational1 queries (split from the former monolithic plans/queries.py).

Importing this module REGISTERS its queries (oracle SQL inline) into
the shared registry — plans/queries.py imports every family module in
the original definition order, so driver-facing ordering is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from ._registry import QUERIES, _ctx, _dsum6, _register
from .q_align import _signlsh_multiprobe_candidates_sql

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
               WHERE label = 0
               ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 512),
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
    "multi-query companion to s01's single-probe top-k. PROBE BOUND: "
    "brute-force probes × corpus work is quadratic when the probe set "
    "grows with the corpus, so the probe batch is capped to a "
    "deterministic md5 top-512 (not binding at sf<=0.1); an unbounded "
    "probe stream is what the IVF path (s02) exists for",
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
    # probe bound: deterministic md5 top-512 (vec_id is unique at every
    # scale factor) — see the survey note; TakeOrdered, no full shuffle
    probes = (
        emb.filter(F.col("label") == 0)
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(512)
    )
    out = knn_join_blas(probes, emb.filter(F.col("label") != 0), k=3)
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
    None,  # filled below: band-OR candidate SQL + exact cosine refine
    survey="north-star dedup: embedding near-dup at corpus scale — sign-LSH "
    "bucket-join candidates (count-adaptive plane ladder so candidate volume "
    "stays O(n) at any corpus size) OR'd over a recall-compensating number "
    "of independent plane tables (band-OR construction: the adaptive width "
    "alone multiplies recall by ~0.86 per extra plane, so a single table "
    "finds a vanishing fraction of true near-dups as the corpus grows; "
    "signlsh_adaptive_tables sizes t so OR-recall at cos≥0.9 never drops "
    "below the 8-plane base rung), refined by exact cosine ≥ threshold; the "
    "unblocked companion to d04 (candidate volume tracks bucket occupancy "
    "× t, not corpus²)",
    note="At the base rung (≤4096 vectors: 8 planes → 1 table) the band-OR "
    "form reduces to the classic single-table candidates, so sf≤0.1 results "
    "are unchanged; past it, both engines derive the identical (planes, "
    "tables) pair from the same count(*) integer ladders.",
)
def d07_signlsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import signlsh_near_dup_pairs

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return signlsh_near_dup_pairs(emb, threshold=0.3).select(
        "vec_a", "vec_b", "cosine"
    )


QUERIES["d07_signlsh_neardup"].oracle = f"""
    WITH cand AS ({_signlsh_multiprobe_candidates_sql()}),
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


