"""Python integration queries (split from the former monolithic plans/queries.py).

Importing this module REGISTERS its queries (oracle SQL inline) into
the shared registry — plans/queries.py imports every family module in
the original definition order, so driver-facing ordering is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from ._registry import QUERIES, _ctx, _dsum6, _register

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
    collision cells dropped as in the standard formulation.
    hash_fn="md5" is the oracle knob — the library default is the
    xxhash64 production path (functions/text.py hashed_features)."""
    from ..functions.text import hashed_features

    (docs,) = _ctx(spark, sf_dir, "documents")
    return hashed_features(docs, n_dims=256, hash_fn="md5")


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
    SELECT event_type,
           round(exp(CAST(sum(CAST(floor(ln(value) * 1000000.0 + 0.5)
                                   AS BIGINT)) AS DOUBLE)
                     / 1000000.0 / count(*)), 9) AS geo_mean
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
    verified against the exp(avg(ln)) SQL identity with both engines
    summing the SAME int64 micro-unit log addends (order-free; see
    functions/pyudf.py geo_mean — the raw float mean drifted on the
    9th decimal at 100x group sizes)."""
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

