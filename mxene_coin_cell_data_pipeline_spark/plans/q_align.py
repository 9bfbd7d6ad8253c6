"""Align queries (split from the former monolithic plans/queries.py).

Importing this module REGISTERS its queries (oracle SQL inline) into
the shared registry — plans/queries.py imports every family module in
the original definition order, so driver-facing ordering is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.similarity import (
    SIGNLSH_BASE_N,
    SIGNLSH_BASE_PLANES,
    SIGNLSH_MAX_EXTRA,
    signlsh_adaptive_tables,
)
from ..sources.tables import load_table
from ._registry import QUERIES, _ctx, _dsum6, _fsum6, _register

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
             CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1000000.0 AS wsum
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
        # _fsum6: a raw double sum drifted in the last place at 100x —
        # Spark's partial-agg split of a group's addends vs DuckDB's
        # sequential order. Exact micro-units also make the downstream
        # window avg bit-stable: 4 exact 1e-6-grid doubles sum exactly.
        .agg(_fsum6(F.col("value")).alias("wsum"))
    )
    w = Window.partitionBy("user_id").orderBy("week").rowsBetween(-3, 0)
    return weekly.select(
        "user_id", "week", "wsum", F.avg("wsum").over(w).alias("wsum_ma4")
    )


_SIGNLSH_W = (
    "(('0x' || substr(md5('{j}|' || CAST(dim AS VARCHAR)), 1, 8))::BIGINT"
    " / 2147483648.0 - 1.0)"
)


def _signlsh_planes_sql() -> str:
    """SQL twin of ``signlsh_adaptive_planes``: integer-threshold CASE
    ladder picking the plane count from count(*) — both engines derive
    the identical parameter from the same count (e08's contract)."""
    rungs = " ".join(
        f"WHEN n <= {SIGNLSH_BASE_N * 2**k} THEN {SIGNLSH_BASE_PLANES + k}"
        for k in range(SIGNLSH_MAX_EXTRA)
    )
    return f"CASE {rungs} ELSE {SIGNLSH_BASE_PLANES + SIGNLSH_MAX_EXTRA} END"


def _signlsh_oracle() -> str:
    # Compute the MAX-width bit string unconditionally, then take the
    # count-laddered PREFIX: plane j's bit is independent of the total
    # plane count, so substr() reproduces the adaptive bucket exactly.
    max_planes = SIGNLSH_BASE_PLANES + SIGNLSH_MAX_EXTRA
    dots = ",\n             ".join(
        f"sum(x * {_SIGNLSH_W.format(j=j)}) AS d{j}" for j in range(max_planes)
    )
    bits = " || ".join(
        f"CASE WHEN d{j} >= 0 THEN '1' ELSE '0' END" for j in range(max_planes)
    )
    return f"""
    WITH params AS (
      SELECT {_signlsh_planes_sql()} AS planes
      FROM (SELECT count(*) AS n FROM embeddings)),
    dims AS (
      SELECT vec_id, u.x, u.dim - 1 AS dim
      FROM embeddings,
           LATERAL (SELECT unnest(embedding::DOUBLE[]) AS x,
                           generate_subscripts(embedding, 1) AS dim) u),
    dots AS (
      SELECT vec_id,
             {dots}
      FROM dims GROUP BY vec_id),
    buckets AS (
      SELECT vec_id, substr({bits}, 1, planes) AS bucket
      FROM dots, params)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    """


def _signlsh_tables_sql() -> str:
    """SQL twin of ``signlsh_adaptive_tables``: the band-OR table count
    as an integer CASE over the plane count, generated FROM the Python
    function so the two ladders cannot drift."""
    rungs = " ".join(
        f"WHEN {p} THEN {signlsh_adaptive_tables(p)}"
        for p in range(
            SIGNLSH_BASE_PLANES, SIGNLSH_BASE_PLANES + SIGNLSH_MAX_EXTRA + 1
        )
    )
    return f"CASE planes {rungs} END"


#: weight of plane {j} in OR-table ``tbl`` — table 0 uses the historic
#: bare-integer seed (bit-compatible with ``_SIGNLSH_W``), table i>0
#: the disjoint 't{{i}}p{{j}}' namespace (``similarity._plane_seed``).
_SIGNLSH_WT = (
    "(('0x' || substr(md5((CASE WHEN tbl = 0 THEN '{j}' "
    "ELSE 't' || tbl || 'p{j}' END) || '|' || CAST(dim AS VARCHAR)), 1, 8))"
    "::BIGINT / 2147483648.0 - 1.0)"
)


def _signlsh_multiprobe_candidates_sql() -> str:
    """Band-OR multiprobe candidate pairs: per OR-table bucket self-
    join, unioned by colliding in ANY table, distinct pairs. The table
    count and the count-laddered plane PREFIX both derive from the
    same count(*) CASE ladders as the Spark side, and table 0's bit
    string is byte-identical to the single-table oracle's."""
    max_planes = SIGNLSH_BASE_PLANES + SIGNLSH_MAX_EXTRA
    dots = ",\n             ".join(
        f"sum(x * {_SIGNLSH_WT.format(j=j)}) AS d{j}" for j in range(max_planes)
    )
    bits = " || ".join(
        f"CASE WHEN d{j} >= 0 THEN '1' ELSE '0' END" for j in range(max_planes)
    )
    return f"""
    WITH params AS (
      SELECT planes, {_signlsh_tables_sql()} AS tables
      FROM (SELECT {_signlsh_planes_sql()} AS planes
            FROM (SELECT count(*) AS n FROM embeddings))),
    tbls AS (
      SELECT unnest(generate_series(0, tables - 1)) AS tbl FROM params),
    dims AS (
      SELECT vec_id, u.x, u.dim - 1 AS dim
      FROM embeddings,
           LATERAL (SELECT unnest(embedding::DOUBLE[]) AS x,
                           generate_subscripts(embedding, 1) AS dim) u),
    dots AS (
      SELECT vec_id, tbl,
             {dots}
      FROM dims CROSS JOIN tbls GROUP BY vec_id, tbl),
    buckets AS (
      SELECT vec_id, tbl, substr({bits}, 1, planes) AS bucket
      FROM dots, params)
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM buckets a JOIN buckets b
      ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    """


@_register(
    "s03_signlsh_pairs",
    _signlsh_oracle(),
    survey="north-star similarity: sign-random-projection LSH (hyperplane "
    "SimHash buckets from md5-derived deterministic weights) candidate pairs — "
    "the bucket-join ANN scale path complementing IVF (s02). ADAPTIVE PLANE "
    "COUNT (e08's density-grid discipline applied to LSH): a fixed plane "
    "count puts n vectors in a fixed 2^p buckets, so occupancy grows with n "
    "and pairs grow as n²/2^p — at 100× the 8-plane table emitted ~78M pairs "
    "and OOM'd the compare. One extra plane per 2× corpus growth past the "
    "4096-vector base rung keeps occupancy and output degree constant; bit j "
    "is independent of total width, so the oracle reproduces the adaptive "
    "bucket as a substr() prefix of the max-width bit string, and both "
    "engines pick the identical integer plane count from the same count(*) — "
    "the compare stays tolerance-free",
    note="At sf<=0.1 (2k vectors) the count sits in the base rung, so "
    "results are identical to the classic fixed-8-plane form; the ladder "
    "only bites past 4096 vectors, where fixed-width LSH is the thing that "
    "does not survive scale.",
)
def s03_signlsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import signlsh_candidate_pairs

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return signlsh_candidate_pairs(emb)


