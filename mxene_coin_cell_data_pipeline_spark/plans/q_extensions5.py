"""Extension family, wave 4 part B (split from q_extensions4 in round
5 along family lines — zero behavior change; plans/queries.py imports
this module immediately after q_extensions4, so registration order is
preserved): the count-min frequency sketch (a28), the
hive-partitioned sink/source roundtrip with pruned reads (src05), the
export-pipeline capstone composing screen -> span-clean -> dedup ->
pack (p05), integer-exact PCA power iteration (s10), seasonal-naive
forecast backtesting (e16), and join-size estimation via the
count-min inner product (a29). See q_extensions4's module docstring
for the wave-4 north-star rationale shared by both halves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ._registry import _ctx, _register  # noqa: F401

# ---------------------------------------------------------------------------
# a28: count-min-sketch frequency estimation (mergeable heavy-hitters)
# ---------------------------------------------------------------------------

_CMS_D = 3   # hash rows
_CMS_W = 32  # buckets per row


@_register(
    "a28_countmin_freq",
    f"""
    WITH vocab AS (
      SELECT u.tok AS token, count(*) AS n
      FROM documents,
           LATERAL (SELECT unnest(regexp_extract_all(lower(text),
                    '[a-z0-9]+')) AS tok) u
      GROUP BY u.tok),
    tb AS (
      SELECT v.token, v.n, j.j,
             (('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || v.token),
                1, 8))::BIGINT) % {_CMS_W} AS bucket
      FROM vocab v, LATERAL (SELECT unnest(generate_series(0, {_CMS_D - 1}))
                             AS j) j),
    cells AS (
      SELECT j, bucket, sum(n) AS cell_n
      FROM tb GROUP BY j, bucket)
    SELECT t.token,
           CAST(max(t.n) AS BIGINT) AS exact_n,
           CAST(min(c.cell_n) AS BIGINT) AS est_n,
           CAST(min(c.cell_n) - max(t.n) AS BIGINT) AS over_by,
           CASE WHEN min(c.cell_n) >= max(t.n) THEN 1 ELSE 0 END AS ge_ok
    FROM tb t JOIN cells c USING (j, bucket)
    GROUP BY t.token
    """,
    survey="A-family completion: count-min-sketch frequency estimation "
    "— the mergeable HEAVY-HITTERS sketch closing the sketch lineup "
    "(a20/a26 distinct counts, a25 GK percentile, a27 histogram "
    "quantiles, a28 frequencies). d=3 md5-derived hash rows × w=32 "
    "buckets; every token's estimate is the min over its d cells, the "
    "one-sided CMS guarantee (est ≥ exact, overshoot bounded by "
    "colliding mass) is verified in-query per token (ge_ok), and the "
    "overshoot is emitted so the compare pins the exact collision "
    "pattern. Cells merge BY ADDITION across partitions, days, or "
    "streaming batches — answer any key's frequency from O(d·w) ints "
    "without rescanning the corpus. md5 buckets are the cross-engine "
    "oracle configuration; xxhash64 is the faster production knob "
    "(t07's discipline). Plan: one token aggregate (the only corpus "
    "shuffle), then vocab-sized joins; at 100 TB the sketch build "
    "folds into the scan as a map-side d·w-cell partial.",
    note="The sketch here is derived from the per-token counts (the "
    "demo also outputs exact_n); the production build skips the exact "
    "aggregate and adds each occurrence straight into its d cells — "
    "identical cell contents, pure map-side.",
)
def a28_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS estimates vs exact counts for every corpus token, with the
    one-sided error guarantee checked per row."""
    (docs,) = _ctx(spark, sf_dir, "documents")
    # NOT scale_out-rebalanced: the explode+count stage is too cheap at
    # this corpus for the extra exchange to pay (A/B: 0.48s -> 1.49s)
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+"), 0)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    from ..functions.stats import cms_bucket

    js = spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    # hash_fn="md5" is the oracle knob; the library default is the
    # xxhash64 production path (functions/stats.py cms_bucket).
    tb = vocab.crossJoin(F.broadcast(js)).withColumn(
        "bucket",
        cms_bucket(F.col("token"), F.col("j"), _CMS_W, hash_fn="md5"),
    )
    cells = tb.groupBy("j", "bucket").agg(F.sum("n").alias("cell_n"))
    return (
        tb.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("token")
        .agg(
            F.max("n").cast("long").alias("exact_n"),
            F.min("cell_n").cast("long").alias("est_n"),
            (F.min("cell_n") - F.max("n")).cast("long").alias("over_by"),
            F.when(F.min("cell_n") >= F.max("n"), 1).otherwise(0).alias("ge_ok"),
        )
    )


# ---------------------------------------------------------------------------
# src05: hive-partitioned sink/source roundtrip with partition pruning
# ---------------------------------------------------------------------------


@_register(
    "src05_hive_partitioned_roundtrip",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_value_micro,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE event_type IN ('click', 'error')
    GROUP BY event_type
    """,
    survey="S-family completion: hive-partitioned parquet sink + "
    "pruned source — events are written partitionBy(event_type) into "
    "key=value directories and read back through a partition filter, "
    "so only the matching directories are LISTED, let alone scanned "
    "(the physical plan carries the predicate as PartitionFilters, "
    "asserted by test; contrast PushedFilters, which still reads the "
    "file and skips row groups). This is THE dominant access pattern "
    "at 100 TB — date/tenant-partitioned facts where queries touch a "
    "sliver — and the missing sibling of src01 JSONL / src02 CSV / "
    "src03 python-datasource / src04 ORC. Aggregate equality against "
    "the unpartitioned oracle proves the roundtrip preserves rows, "
    "values (micro-unit exact), and the partition column itself "
    "(partition values round-trip through directory names as "
    "strings).",
)
def src05_hive_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events hive-partitioned by event_type, read back pruned
    to two partitions, aggregate — equality vs the direct table."""
    import os
    import tempfile

    (events,) = _ctx(spark, sf_dir, "events")
    tmp = os.path.join(tempfile.mkdtemp(prefix="src05_"), "events_part")
    events.write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    back = spark.read.parquet(tmp).filter(
        F.col("event_type").isin("click", "error")
    )
    return back.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_value_micro"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# p05: training-data export composite (screen → clean → dedup → pack)
# ---------------------------------------------------------------------------


@_register(
    "p05_export_pipeline",
    """
    WITH t AS (
      SELECT doc_id, source, lang,
             regexp_extract_all(text, '[^ ]+') AS toks
      FROM documents),
    base AS (
      SELECT doc_id, source, lang, len(toks) AS n_tok, toks FROM t),
    scr AS (
      SELECT * FROM base
      WHERE lang = 'en' AND n_tok BETWEEN 20 AND 200),
    c AS (
      SELECT scr.doc_id, u.i AS cidx,
             array_to_string(toks[3 * u.i + 1 : 3 * u.i + 3], ' ') AS chunk
      FROM scr, LATERAL (SELECT unnest(generate_series(0,
               (len(toks) + 2) // 3 - 1)) AS i) u),
    f AS (SELECT doc_id, chunk, min(cidx) AS first_idx
          FROM c GROUP BY doc_id, chunk),
    k AS (SELECT doc_id, count(*) AS n_uniq,
                 md5(string_agg(chunk, ' ' ORDER BY first_idx)) AS kept_md5
          FROM f GROUP BY doc_id),
    cl AS (
      SELECT scr.doc_id, scr.source,
             scr.n_tok - 3 * ((scr.n_tok + 2) // 3 - k.n_uniq) AS n_clean,
             k.kept_md5
      FROM scr JOIN k USING (doc_id)),
    dd AS (
      SELECT *, row_number() OVER (PARTITION BY kept_md5
                                   ORDER BY doc_id) AS rn
      FROM cl),
    sv AS (SELECT doc_id, source, n_clean FROM dd WHERE rn = 1),
    pk AS (
      SELECT source, doc_id, n_clean,
             sum(n_clean) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM sv),
    agg AS (
      SELECT source,
             count(*) AS n_kept,
             sum(n_clean) AS tok_total,
             sum(CASE WHEN (cum - 1) // 512 > (cum - n_clean) // 512
                      THEN 1 ELSE 0 END) AS n_crossers
      FROM pk GROUP BY source),
    cnt AS (
      SELECT b.source, count(*) AS n_in,
             sum(CASE WHEN b.lang = 'en' AND b.n_tok BETWEEN 20 AND 200
                      THEN 1 ELSE 0 END) AS n_screened
      FROM base b GROUP BY b.source)
    SELECT cnt.source,
           CAST(cnt.n_in AS BIGINT) AS n_in,
           CAST(cnt.n_screened AS BIGINT) AS n_screened,
           CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(agg.tok_total, 0) AS BIGINT) AS tok_total,
           CAST((coalesce(agg.tok_total, 0) + 511) // 512 AS BIGINT)
             AS n_packs,
           CAST(coalesce(agg.n_crossers, 0) AS BIGINT) AS n_crossers
    FROM cnt LEFT JOIN agg USING (source)
    """,
    survey="north-star capstone #2: the pretraining EXPORT pipeline "
    "composed end to end — language + length screens (t13's cheap "
    "row-local stage), C4-style intra-doc span self-dedup (t17, with "
    "the cleaned token count derived EXACTLY: every dropped span is a "
    "full 3-token span, so n_clean = n_tok − 3·dropped), cross-doc "
    "exact dedup on the CLEANED fingerprint (d01's first-wins rule — "
    "dedup after cleaning catches docs that differ only in their "
    "internal repetition), then o15's per-source sequence packing of "
    "the survivors into 512-token windows, audited per source shard "
    "(docs in/screened/kept, clean tokens, pack count, boundary "
    "crossers). Stage ORDER is the production one: row-local screens "
    "and self-cleaning shrink the corpus before the only global "
    "exchange (fingerprint dedup), and packing stays per-shard "
    "parallel. At 100 TB this single lazy plan is one scan + one "
    "survivor-only shuffle + per-shard windows — no stage "
    "materializes the corpus.",
    note="Spans are joined on single spaces, so the cleaned token "
    "count identity holds for any tokenization; the partial last span "
    "(1-2 tokens) can never equal a full 3-token span, so dropped "
    "spans are always full — pinned by the t17 tests.",
)
def p05_export_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Screen → span-clean → fingerprint-dedup → pack, with a
    per-source audit row (the export-side sibling of p01/t13)."""
    from ..sources.tables import scale_out

    (docs,) = _ctx(spark, sf_dir, "documents")
    docs = scale_out(docs)  # screens + span HOFs are narrow and heavy
    toks = F.regexp_extract_all("text", F.lit(r"[^ ]+"), 0)
    base = docs.select(
        "doc_id", "source", "lang", toks.alias("toks")
    ).withColumn("n_tok", F.size("toks"))
    screened = F.col("lang").eqNullSafe("en") & F.col("n_tok").between(20, 200)
    scr = base.filter(screened)
    spans = F.expr(
        "transform(sequence(0, (size(toks) + 2) div 3 - 1),"
        " i -> array_join(slice(toks, i * 3 + 1, 3), ' '))"
    )
    kept = F.array_distinct(spans)
    cl = scr.select(
        "doc_id",
        "source",
        (
            F.col("n_tok")
            - F.lit(3) * (F.expr("(n_tok + 2) div 3") - F.size(kept))
        ).alias("n_clean"),
        F.md5(F.encode(F.array_join(kept, " "), "UTF-8")).alias("kept_md5"),
    )
    w_dd = Window.partitionBy("kept_md5").orderBy("doc_id")
    sv = (
        cl.withColumn("rn", F.row_number().over(w_dd))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_clean")
    )
    w_pk = Window.partitionBy("source").orderBy("doc_id")
    pk = sv.withColumn("cum", F.sum("n_clean").over(w_pk))
    agg = pk.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_clean").alias("tok_total"),
        F.sum(
            F.when(
                F.expr("(cum - 1) div 512") > F.expr("(cum - n_clean) div 512"),
                1,
            ).otherwise(0)
        ).alias("n_crossers"),
    )
    cnt = base.groupBy("source").agg(
        F.count("*").alias("n_in"),
        F.sum(F.when(screened, 1).otherwise(0)).alias("n_screened"),
    )
    return cnt.join(agg, "source", "left").select(
        "source",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_screened").cast("long").alias("n_screened"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("tok_total", F.lit(0)).cast("long").alias("tok_total"),
        # integer ceil-div (div, not float /): keeps the all-integer
        # discipline — float division happens to be exact here only
        # because 512 is a power of two and tok_total < 2^53
        F.expr("(coalesce(tok_total, 0) + 511) div 512")
        .cast("long")
        .alias("n_packs"),
        F.coalesce("n_crossers", F.lit(0)).cast("long").alias("n_crossers"),
    )


# ---------------------------------------------------------------------------
# s10: PCA top component via integer power iteration
# ---------------------------------------------------------------------------


@_register(
    "s10_pca_power",
    """
    WITH q AS (
      SELECT vec_id, u.i AS dim,
             CAST(floor(embedding[u.i]::DOUBLE * 1000.0 + 0.5) AS BIGINT)
               AS qv
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, 16)) AS i) u),
    cov AS (
      SELECT a.dim AS i, b.dim AS j, sum(a.qv * b.qv) AS c
      FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
    v1 AS (SELECT i, sum(c) AS v1v FROM cov GROUP BY i),
    m1 AS (SELECT greatest(max(abs(v1v)), 1) AS mx FROM v1),
    w AS (SELECT i, CASE WHEN v1v < 0 THEN -((abs(v1v) * 100) // mx)
                         ELSE (abs(v1v) * 100) // mx END AS wv
          FROM v1, m1),
    v2 AS (SELECT cov.i, sum(cov.c * w.wv) AS v2v
           FROM cov JOIN w ON w.i = cov.j GROUP BY cov.i),
    m2 AS (SELECT greatest(max(abs(v2v)), 1) AS mx FROM v2)
    SELECT v1.i AS dim,
           CAST(v1.v1v AS BIGINT) AS v1,
           CAST(w.wv AS BIGINT) AS w,
           CAST(v2.v2v AS BIGINT) AS v2,
           CAST(CASE WHEN v2.v2v < 0 THEN -((abs(v2.v2v) * 10000) // m2.mx)
                     ELSE (abs(v2.v2v) * 10000) // m2.mx END AS BIGINT)
             AS dir_scaled
    FROM v1 JOIN w USING (i) JOIN v2 USING (i), m2
    """,
    survey="north-star similarity: PCA top-component TRAINING by two "
    "integer power-iteration rounds over the (uncentered) Gram matrix "
    "of the first 16 embedding dims — the dimensionality-reduction "
    "trainer whose output feeds the matryoshka/truncation inference "
    "path (s09): inputs quantize to milli-units, so the 16×16 Gram "
    "matrix is an EXACT integer aggregate (one (i,j)-keyed shuffle of "
    "per-vector products, map-side combined), and both iteration "
    "rounds stay in bounded int64 via magnitude rescaling between "
    "rounds (|w| ≤ 100). Explicit corpus bound for that claim: with "
    "|qv| ≤ 2000 milli-units, |cov| ≤ 4e6·n_vectors, so the deepest "
    "intermediate abs(v2)·10000 ≤ 16·100·10000·4e6·n ≈ 6.4e13·n and "
    "int64 holds for n_vectors up to ~1.4e5 (sf1-scale embeddings); "
    "past that, Spark wraps silently (non-ANSI) while DuckDB promotes "
    "to HUGEINT — divide cov by a corpus-size factor (both engines, "
    "same factor — the direction is scale-invariant) before the "
    "second multiply to recover headroom at larger corpora. No float "
    "op exists anywhere in the chain, so "
    "the eigenvector direction is bit-deterministic on any engine or "
    "partition layout. Negative-value floor division is sign-split "
    "(magnitude // positive) because Spark's div truncates toward "
    "zero while DuckDB's // floors — the one integer-op semantic the "
    "engines disagree on. At 100 TB: the Gram aggregate is one "
    "scan + a (dims²)-row shuffle; iterations touch only the 16×16 "
    "matrix — the classic distributed-covariance + driver-side-"
    "eigensolve split, here kept fully relational.",
    note="Uncentered second-moment PCA (Gram direction); mean-center "
    "first for classical PCA — same plan with one extra broadcast of "
    "per-dim means. Each round contracts the off-axis tangent by "
    "lambda2/lambda1 (strict per-round improvement pinned by test); "
    "the synthetic corpus is near-isotropic so production corpora "
    "with a real dominant direction converge far faster. More rounds "
    "unroll identically.",
)
def s10_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two integer power-iteration rounds on the 16-dim Gram matrix;
    emits v1, the rescaled iterate w, v2, and the scaled direction."""
    (emb,) = _ctx(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 16)).alias("pos", "x")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("qv"),
    )
    a = q.alias("a")
    b = q.select(
        F.col("vec_id").alias("vid2"),
        F.col("dim").alias("j"),
        F.col("qv").alias("qv2"),
    ).alias("b")
    cov = (
        a.join(b, F.col("a.vec_id") == F.col("b.vid2"))
        .groupBy(F.col("a.dim").alias("i"), F.col("b.j").alias("j"))
        .agg(F.sum(F.col("a.qv") * F.col("b.qv2")).alias("c"))
    )
    v1 = cov.groupBy("i").agg(F.sum("c").alias("v1v"))
    m1 = v1.agg(F.greatest(F.max(F.abs("v1v")), F.lit(1)).alias("mx"))
    w = v1.crossJoin(F.broadcast(m1)).select(
        "i",
        F.when(
            F.col("v1v") < 0, -F.expr("(abs(v1v) * 100) div mx")
        )
        .otherwise(F.expr("(abs(v1v) * 100) div mx"))
        .alias("wv"),
    )
    v2 = (
        cov.join(F.broadcast(w.select(F.col("i").alias("j"), "wv")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("wv")).alias("v2v"))
    )
    m2 = v2.agg(F.greatest(F.max(F.abs("v2v")), F.lit(1)).alias("mx"))
    return (
        v1.join(w, "i")
        .join(v2, "i")
        .crossJoin(F.broadcast(m2))
        .select(
            F.col("i").alias("dim"),
            F.col("v1v").cast("long").alias("v1"),
            F.col("wv").cast("long").alias("w"),
            F.col("v2v").cast("long").alias("v2"),
            F.when(
                F.col("v2v") < 0, -F.expr("(abs(v2v) * 10000) div mx")
            )
            .otherwise(F.expr("(abs(v2v) * 10000) div mx"))
            .cast("long")
            .alias("dir_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# e16: seasonal-naive forecast backtest (lag-24h, integer MAE)
# ---------------------------------------------------------------------------


@_register(
    "e16_seasonal_backtest",
    """
    WITH h AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS hr,
             sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2),
    f AS (
      SELECT event_type, hr, v,
             lag(v, 24) OVER (PARTITION BY event_type ORDER BY hr) AS fc
      FROM h)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(count(fc) AS BIGINT) AS n_scored,
           CAST(sum(abs(v - fc)) AS BIGINT) AS abs_err_micro_sum,
           CAST(sum(abs(v - fc)) // greatest(count(fc), 1) AS BIGINT)
             AS mae_micro
    FROM f GROUP BY event_type
    """,
    survey="extension events: seasonal-naive forecast BACKTEST — "
    "hourly value totals per event type, forecast each hour with the "
    "value 24 hours earlier (the canonical seasonal-naive baseline "
    "every production forecast must beat), score by mean absolute "
    "error. The whole chain is integer micro-units (per-row "
    "fixed-point totals, integer |v - fc| sums, floor-divided MAE) — "
    "bit-deterministic on any engine/partition layout. Plan: one "
    "map-side-combined (type, hour) aggregate, then ONE window lag "
    "and the scoring aggregate on the same type-keyed exchange; at "
    "100 TB the raw stream reduces to O(types × hours) rows before "
    "any window state exists. Completes the time-series family "
    "(e05 EWMA smoothing, e14 interpolation, e11 OHLC, a27 "
    "histogram) with the evaluation primitive.",
    note="Hours with no 24h-earlier bucket score NULL and are "
    "excluded by count(fc) — the warm-up day. lag(v, 24) indexes "
    "OBSERVED hours (rows), which coincides with wall-clock 24h only "
    "where the hourly grid is dense (sf0.01+ here; sf0.001 is "
    "sparse, making this the observed-row seasonal baseline there) — "
    "production feeds densify first via e04/e14's grid explode, "
    "after which row-lag and time-lag agree by construction.",
)
def e16_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly seasonal-naive (t-24h) backtest per event type with
    integer micro-unit MAE."""
    (events,) = _ctx(spark, sf_dir, "events")
    h = (
        events.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hr"),
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("vm"),
        )
        .groupBy("event_type", "hr")
        .agg(F.sum("vm").alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    f = h.withColumn("fc", F.lag("v", 24).over(w))
    return f.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.count("fc").cast("long").alias("n_scored"),
        F.sum(F.abs(F.col("v") - F.col("fc"))).cast("long").alias(
            "abs_err_micro_sum"
        ),
        F.expr(
            "CAST(sum(abs(v - fc)) div greatest(count(fc), 1) AS BIGINT)"
        ).alias("mae_micro"),
    )


# ---------------------------------------------------------------------------
# a29: join-cardinality estimation via count-min inner product
# ---------------------------------------------------------------------------


@_register(
    "a29_join_size_sketch",
    """
    WITH n AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
    truth AS (SELECT sum(c * c) AS true_size FROM n),
    cells AS (
      SELECT j.j,
             (('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':'
                || CAST(n.user_id AS VARCHAR)), 1, 8))::BIGINT) % 64
               AS bucket,
             sum(n.c) AS cm
      FROM n, LATERAL (SELECT unnest(generate_series(0, 2)) AS j) j
      GROUP BY 1, 2),
    est AS (
      SELECT min(s) AS est_size
      FROM (SELECT j, sum(cm * cm) AS s FROM cells GROUP BY j))
    SELECT CAST(truth.true_size AS BIGINT) AS true_size,
           CAST(est.est_size AS BIGINT) AS est_size,
           CAST(est.est_size - truth.true_size AS BIGINT) AS over_by,
           CASE WHEN est.est_size >= truth.true_size THEN 1 ELSE 0 END
             AS ge_ok,
           CAST(est.est_size * 1000000 // truth.true_size AS BIGINT)
             AS ratio_micro
    FROM truth, est
    """,
    survey="A-family completion: JOIN-SIZE estimation by the count-min "
    "inner product — the shuffle-planning primitive behind cost-based "
    "join reordering and skew detection: the self-join cardinality on "
    "a key (sum of per-key count²) is estimated as min over d hash "
    "rows of sum(cm²), which upper-bounds the truth (colliding keys "
    "only ADD cross terms) without ever materializing the join. Both "
    "sides all-integer; the guarantee (est ≥ true) and the exact "
    "overshoot ratio are emitted in-query. At 100 TB: each side's "
    "sketch is one map-side-combined scan into d·w cells, sketches "
    "of DIFFERENT tables combine by the same inner product (cmA·cmB), "
    "and partial sketches merge by addition (a26/a27/a28's "
    "mergeability) — estimate any join's output volume from kilobytes "
    "of state before committing to a shuffle strategy.",
    note="Demonstrated on the self-join (events × events on user_id) "
    "so truth is cheaply exact for the oracle; two-table estimation "
    "is the identical expression over two cell sets.",
)
def a29_join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CM-inner-product estimate of the user_id self-join size vs the
    exact value, with the one-sided bound checked in-query."""
    (events,) = _ctx(spark, sf_dir, "events")
    n = events.groupBy("user_id").agg(F.count("*").alias("c"))
    truth = n.agg(F.sum(F.col("c") * F.col("c")).alias("true_size"))
    from ..functions.stats import cms_bucket

    js = spark.range(3).select(F.col("id").cast("int").alias("j"))
    # hash_fn="md5" is the oracle knob, same discipline as a28
    cells = (
        n.crossJoin(F.broadcast(js))
        .withColumn(
            "bucket",
            cms_bucket(
                F.col("user_id").cast("string"), F.col("j"), 64, hash_fn="md5"
            ),
        )
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("cm"))
    )
    est = (
        cells.groupBy("j")
        .agg(F.sum(F.col("cm") * F.col("cm")).alias("s"))
        .agg(F.min("s").alias("est_size"))
    )
    return (
        truth.crossJoin(est)
        .select(
            F.col("true_size").cast("long").alias("true_size"),
            F.col("est_size").cast("long").alias("est_size"),
            (F.col("est_size") - F.col("true_size")).cast("long").alias("over_by"),
            F.when(F.col("est_size") >= F.col("true_size"), 1)
            .otherwise(0)
            .alias("ge_ok"),
            F.expr("CAST(est_size * 1000000 div true_size AS BIGINT)").alias(
                "ratio_micro"
            ),
        )
    )
