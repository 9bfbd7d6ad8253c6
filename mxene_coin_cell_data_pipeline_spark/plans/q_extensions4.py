"""Extension family, wave 4 part A (round 4; round 5 split the
module's second half into q_extensions5 along family lines and added
m08): real WAV audio codec (m07), real AVI video container codec
(m08), C4-style intra-document span dedup (t17), BM25 retrieval
scoring (t18), a mergeable fixed-bin histogram quantile sketch (a27)
plus its live-on-stream form (st10), matryoshka embedding truncation
with measured recall (s09), triangle counting with clustering
coefficient (g03), and SCD Type-2 interval builds from a change
stream (e15). Part B (q_extensions5): a28, src05, p05, s10, e16,
a29.

North-star additions (no reference counterpart): the remaining
first-class stages of a multimodal / retrieval-aware training-data
pipeline — audio joins image as a REAL byte-format parse (RIFF chunk
walk, PCM16 samples), span-level self-dedup removes boilerplate the
doc-level dedups can't see, BM25 is the lexical-retrieval scorer that
pairs with the embedding ANN family, the histogram/CMS sketches are
the mergeable (map-side-combinable) shapes that replace exact
median/frequency counting at fact scale, matryoshka truncation is the
dimension-reduction knob every 100 TB ANN deployment turns first,
g03 completes the graph family (centrality/components/local
structure), e15 is the CDC-to-warehouse history build, and src05 is
the partition-pruned access pattern that dominates 100 TB reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ._registry import _ctx, _register  # noqa: F401

# ---------------------------------------------------------------------------
# m07: REAL audio codec — WAV/RIFF PCM16 decode
# ---------------------------------------------------------------------------

_WAV_NIB = (
    "(strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || ':' "
    "|| CAST(u.k AS VARCHAR)), {i}, 1)) - 1)"
)
_WAV_V = (
    f"{_WAV_NIB.format(i=1)} * 4096 + {_WAV_NIB.format(i=2)} * 256 + "
    f"{_WAV_NIB.format(i=3)} * 16 + {_WAV_NIB.format(i=4)} - 32768"
)


@_register(
    "m07_wav_decode",
    f"""
    WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS n,
                      8000 + (doc_id % 4) * 1000 AS rate
               FROM documents),
    s AS (SELECT d.doc_id, {_WAV_V} AS v
          FROM d, LATERAL (SELECT unnest(generate_series(0, d.n - 1))
                           AS k) u),
    agg AS (SELECT doc_id, count(*) AS ns, max(abs(v)) AS peak,
                   sum(v * v) AS sq
            FROM s GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(44 + 2 * d.n AS INT) AS n_bytes,
           CAST(d.rate AS INT) AS sample_rate,
           CAST(d.n AS INT) AS n_samples,
           CAST(a.peak AS INT) AS peak_abs,
           CAST(a.sq AS DOUBLE) / d.n AS mean_square
    FROM d JOIN agg a USING (doc_id)
    """,
    survey="north-star multimodal: REAL audio codec #2 — deterministic "
    "PCM16 WAV containers (44-byte canonical RIFF header + little-endian "
    "int16 samples from an md5 stream) generated per doc and genuinely "
    "parsed back by parse_wav's chunk walk (magic sniff, fmt codec "
    "check, odd-size pad handling) under Arrow-batched mapInPandas; "
    "peak and energy accumulate in pure integers so the oracle "
    "re-derives byte length, rate, sample count, peak_abs and the "
    "square sum from the same md5 stream — a header-walk or "
    "endianness bug flips the hash. Completes the image/audio/video "
    "brief with zero stubs on the audio leg.",
    note="mean_square = int64 square sum / n — sumsq < 2^53 for any "
    "bounded clip, so the single division is the only float op and is "
    "IEEE-identical on both engines.",
)
def m07_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate real PCM16 WAV files deterministically per doc_id,
    decode them with the real RIFF codec, emit (n_bytes, sample_rate,
    n_samples, peak_abs, mean_square) — the audio decode path with
    zero stubs (audio sibling of m05's image path)."""
    from ..functions.multimodal import decode_audio, with_wav_payload

    (docs,) = _ctx(spark, sf_dir, "documents")
    # NOT scale_out-rebalanced: a same-session A/B at sf0.1 measured the
    # added exchange + per-worker batch overhead costing MORE than the
    # single-task Python gen saves (0.89s -> 1.52s); on splittable
    # production layouts the scan parallelizes by itself
    return decode_audio(with_wav_payload(docs.select("doc_id")))


# ---------------------------------------------------------------------------
# m08: REAL video container codec — RIFF/AVI chunk walk + frame extraction
# ---------------------------------------------------------------------------


@_register(
    "m08_avi_frames",
    """
    WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS nf FROM documents),
    fr AS (SELECT d.doc_id, d.nf, u.k,
                  4 + (d.doc_id + u.k) % 5 AS m
           FROM d, LATERAL (SELECT unnest(generate_series(0, d.nf - 1))
                            AS k) u),
    o AS (SELECT doc_id, nf, k, m,
                 224 + 8 + coalesce(sum(8 + m + (m % 2)) OVER (
                     PARTITION BY doc_id ORDER BY k
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS off
          FROM fr),
    b AS (SELECT o.doc_id, o.k,
                 sum(('0x' || substr(md5(CAST(o.doc_id AS VARCHAR) || ':'
                      || CAST(o.k AS VARCHAR) || ':'
                      || CAST(j.j AS VARCHAR)), 1, 2))::BIGINT) AS bsum
          FROM o, LATERAL (SELECT unnest(generate_series(0, o.m - 1))
                           AS j) j
          GROUP BY o.doc_id, o.k)
    SELECT o.doc_id,
           CAST(o.nf AS INT) AS n_frames,
           CAST(o.k AS INT) AS frame_idx,
           CAST(o.off AS BIGINT) AS off,
           CAST(o.m AS INT) AS frame_bytes,
           CAST(b.bsum AS BIGINT) AS byte_sum
    FROM o JOIN b ON b.doc_id = o.doc_id AND b.k = o.k
    """,
    survey="north-star multimodal: REAL video container codec #3 — "
    "deterministic RIFF/AVI files (LIST hdrl with avih/strh/strf, "
    "LIST movi with 00db frame chunks, odd-size padding, frame bytes "
    "from an md5 stream) generated per doc by make_avi and genuinely "
    "parsed back by parse_avi's chunk walk (magic sniff, hdrl walk "
    "for dwMicroSecPerFrame/dwTotalFrames, movi walk for ##db/##dc "
    "frames, declared-vs-actual frame-count cross-check) under "
    "Arrow-batched one-to-many mapInPandas. The emitted rows carry "
    "each frame's ABSOLUTE byte offset, size, and integer byte sum, "
    "and the oracle re-derives all three from the md5 stream and the "
    "documented fixed header layout (AVI_MOVI_BASE + cumulative "
    "chunk sizes) — a chunk-walk, padding, or offset bug flips the "
    "hash. Completes the image/audio/VIDEO quartet with zero stubs: "
    "m03's frame-sampling contract now runs from genuinely parsed "
    "frame offsets (sample_avi_frames supersedes deterministic "
    "slicing).",
    note="ffmpeg/PyAV drop into the same mapInPandas slot for real "
    "codecs inside the frames; the container walk, offsets, batching "
    "and error contract are exactly what they would ride on.",
)
def m08_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate real AVI containers deterministically per doc_id,
    parse them with the real RIFF/AVI chunk walk, emit one row per
    extracted frame (offset, size, byte sum) — the video leg of the
    multimodal quartet with zero stubs."""
    from ..functions.multimodal import sample_avi_frames, with_avi_payload

    (docs,) = _ctx(spark, sf_dir, "documents")
    # NOT scale_out-rebalanced: same A/B rationale as m07 above
    return sample_avi_frames(with_avi_payload(docs.select("doc_id")))


# ---------------------------------------------------------------------------
# t17: intra-document repeated-span removal (C4-style)
# ---------------------------------------------------------------------------


@_register(
    "t17_span_self_dedup",
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(text, '[^ ]+') AS toks
      FROM documents),
    c AS (
      SELECT t.doc_id, u.i AS cidx,
             array_to_string(toks[3 * u.i + 1 : 3 * u.i + 3], ' ') AS chunk
      FROM t, LATERAL (SELECT unnest(generate_series(0,
               (len(toks) + 2) // 3 - 1)) AS i) u),
    f AS (SELECT doc_id, chunk, min(cidx) AS first_idx
          FROM c GROUP BY doc_id, chunk),
    r AS (SELECT doc_id, chunk,
                 CAST(row_number() OVER (PARTITION BY doc_id
                                         ORDER BY first_idx) AS BIGINT) AS rk
          FROM f),
    k AS (SELECT doc_id, count(*) AS n_uniq_spans,
                 sum(rk * (('0x' || substr(md5(chunk), 1, 8))::BIGINT))
                   AS kept_sig,
                 sum(len(chunk)) + count(*) - 1 AS kept_len
          FROM r GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST((len(toks) + 2) // 3 AS BIGINT) AS n_spans,
           CAST(coalesce(k.n_uniq_spans, 0) AS BIGINT) AS n_uniq_spans,
           CAST(coalesce(k.kept_len, 0) AS BIGINT) AS kept_len,
           CAST(coalesce(k.kept_sig, 0) AS BIGINT) AS kept_sig
    FROM t LEFT JOIN k USING (doc_id)
    """,
    survey="north-star text: C4-style intra-document repeated-span "
    "removal — partition each doc into consecutive 3-token spans, keep "
    "the FIRST occurrence of each distinct span, reassemble (C4 does "
    "this with three-sentence spans; doc-level dedup like d01/d02 "
    "cannot see boilerplate repeated INSIDE one document). Entirely "
    "row-local array HOFs — split, slice, array_distinct (first-"
    "occurrence order) — one scan, zero shuffles, codegen end to end: "
    "at 100 TB this is the cheapest possible self-clean pass, "
    "embarrassingly parallel with no exchange at all.",
    note="The oracle re-derives first-occurrence order via "
    "min(position) + rank; Spark's array_distinct preserves "
    "first-occurrence order by construction. The order check is the "
    "POSITION-WEIGHTED integer signature sum(rank · hash32(span)) — "
    "a pure aggregate on both engines, so oracle memory is bounded "
    "per DOC (never per corpus; the round-4 string_agg reassembly "
    "OOM'd DuckDB at 100× because its intermediates grew with the "
    "corpus). Any span substitution or reorder shifts the weighted "
    "sum w.h.p. int64 bound is per-doc and corpus-size-independent: "
    "sum ≤ (n_uniq²/2)·2³² — safe through ~8k distinct spans/doc "
    "(~24k tokens), 40× the corpus's largest doc at ANY scale "
    "factor.",
)
def t17_span_self_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop repeated 3-token spans within each document, keeping first
    occurrences; emit span counts + the md5 of the cleaned text."""
    from ..sources.tables import scale_out

    (docs,) = _ctx(spark, sf_dir, "documents")
    docs = scale_out(docs)  # row-local HOFs inherit scan parallelism
    toks = F.regexp_extract_all("text", F.lit(r"[^ ]+"), 0)
    # sequence(0, -1) would generate a DESCENDING sequence in Spark, so
    # the zero-token case is guarded to an explicitly empty span list.
    spans = F.when(F.size("toks") == 0, F.array().cast("array<string>")).otherwise(
        F.expr(
            "transform(sequence(0, (size(toks) + 2) div 3 - 1),"
            " i -> array_join(slice(toks, i * 3 + 1, 3), ' '))"
        )
    )
    d = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        spans.alias("spans"),
    )
    # rank·hash32 weighted signature: order-sensitive, pure row-local
    # arithmetic — no text reassembly on either engine (see note)
    sig = F.expr(
        "aggregate(transform(kept, (s, i) ->"
        " (CAST(i AS BIGINT) + 1L)"
        " * CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)),"
        " 0L, (acc, x) -> acc + x)"
    )
    kept_len = (
        F.expr("aggregate(kept, 0L, (acc, s) -> acc + length(s))")
        + F.greatest(F.size("kept") - 1, F.lit(0)).cast("long")
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.size("spans").cast("long").alias("n_spans"),
        F.array_distinct("spans").alias("kept"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.size("kept").cast("long").alias("n_uniq_spans"),
        kept_len.cast("long").alias("kept_len"),
        sig.cast("long").alias("kept_sig"),
    )


# ---------------------------------------------------------------------------
# t18: BM25 lexical retrieval scoring
# ---------------------------------------------------------------------------

#: fixed query terms (present across the synthetic corpus with spread
#: document frequencies — 'scan' rarer than 'value')
_BM25_TERMS = ("scan", "join", "window")
_BM25_K1 = "1.2"
_BM25_B = "0.75"


def _bm25_term_sql(term: str) -> str:
    """Per-term score: rational idf × saturated tf. Only IEEE
    +,-,*,/ (each correctly rounded, bit-identical across engines) —
    no log, so no libm divergence."""
    return (
        f"(CAST(st.n_docs - st.df_{term} AS DOUBLE) + 0.5)"
        f" / (CAST(st.df_{term} AS DOUBLE) + 0.5)"
        f" * (CAST(tf_{term} AS DOUBLE) * ({_BM25_K1} + 1.0))"
        f" / (CAST(tf_{term} AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B}"
        f" + {_BM25_B} * (CAST(dl AS DOUBLE) / st.avgdl)))"
    )


@_register(
    "t18_bm25_topk",
    f"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[^ ]+') AS toks
      FROM documents),
    pd AS (
      SELECT doc_id, len(toks) AS dl,
             {", ".join(f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}"
                        for t in _BM25_TERMS)}
      FROM tok),
    st AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
                        for t in _BM25_TERMS)}
      FROM pd)
    SELECT pd.doc_id,
           {" + ".join(f"(CASE WHEN tf_{t} > 0 THEN {_bm25_term_sql(t)}"
                       f" ELSE 0.0 END)" for t in _BM25_TERMS)} AS bm25
    FROM pd, st
    ORDER BY bm25 DESC, pd.doc_id
    LIMIT 10
    """,
    survey="north-star text: BM25 lexical retrieval top-k — the "
    "classic sparse scorer that pairs with the embedding ANN family "
    "(s01/s02) for hybrid retrieval. Corpus statistics (N, df per "
    "term, avgdl) come from ONE aggregate pass reduced to a single "
    "broadcast row; the score itself is row-local. Uses the rational "
    "idf (N-df+0.5)/(df+0.5) — the argument of the classical log — so "
    "the whole score is IEEE +,-,*,/ only: correctly-rounded ops are "
    "bit-identical across engines where libm log is not. Plan: one "
    "scan for stats + one scan for scoring + TakeOrdered; at 100 TB "
    "the stats row broadcasts and scoring stays embarrassingly "
    "parallel — no shuffle keyed by term ever materializes.",
    note="Ranking by rational idf is order-equivalent per term to "
    "log-idf (log is monotone); the summed score differs from classic "
    "BM25 numerically but is deterministic, which is what the "
    "tolerance-free hash gate needs.",
)
def t18_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 over the documents table for a fixed 3-term query,
    rational-idf variant (see oracle note)."""
    from ..sources.tables import scale_out

    (docs,) = _ctx(spark, sf_dir, "documents")
    docs = scale_out(docs)  # per-doc tf filters are narrow and heavy
    toks = F.regexp_extract_all(F.lower("text"), F.lit(r"[^ ]+"), 0)

    def _tf(term: str) -> F.Column:
        # NB: a two-arg lambda would make F.filter pass (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per_doc = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    k1, b = 1.2, 0.75
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for t in _BM25_TERMS:
        tf = F.col(f"tf_{t}").cast("double")
        idf = (F.col("n_docs").cast("double") - F.col(f"df_{t}").cast("double") + F.lit(0.5)) / (
            F.col(f"df_{t}").cast("double") + F.lit(0.5)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
        )
        # associativity mirrors the oracle exactly: (idf * num) / denom
        term = F.when(
            F.col(f"tf_{t}") > 0, idf * (tf * F.lit(k1 + 1.0)) / denom
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    return (
        scored.select("doc_id", score.alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# a27: mergeable fixed-bin histogram quantile sketch
# ---------------------------------------------------------------------------


@_register(
    "a27_histogram_quantile",
    """
    WITH b AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS bin,
             count(*) AS c
      FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT flag, sum(c) AS n FROM b GROUP BY flag),
    cum AS (
      SELECT b.flag, b.bin, t.n,
             sum(b.c) OVER (PARTITION BY b.flag ORDER BY b.bin) AS cum
      FROM b JOIN tot t USING (flag))
    SELECT flag,
           CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) * 100
                AS BIGINT) AS p50_bin_lo,
           CAST(min(CASE WHEN cum >= (95 * n + 99) // 100 THEN bin END) * 100
                AS BIGINT) AS p95_bin_lo
    FROM cum GROUP BY flag
    """,
    survey="extension agg: mergeable fixed-bin histogram quantile "
    "sketch — the production quantile shape at fact scale: per-bin "
    "counts combine map-side and MERGE BY ADDITION across partitions, "
    "days, or streaming batches (the property exact median lacks — "
    "compare a17's two-pass exact and a25's percentile_approx bound; "
    "a26 is the same mergeability story for distinct counts). "
    "Thresholds are all-integer (ceil via (q·n + d-1) // d) and the "
    "estimate is the bin lower edge — no float anywhere, "
    "bit-deterministic on any engine or partition layout. Plan: one "
    "map-side-combined groupBy to ~price_range/100 bins per flag, a "
    "window over the tiny binned relation; at 100 TB the heavy "
    "exchange carries only (flag, bin, count) partials.",
)
def a27_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95 estimates per returnflag from a width-100 histogram of
    l_extendedprice; estimates are exact bin lower edges."""
    (li,) = _ctx(spark, sf_dir, "lineitem")
    binned = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") / F.lit(100.0))
            .cast("long")
            .alias("bin"),
        )
        .groupBy("flag", "bin")
        .agg(F.count("*").alias("c"))
    )
    tot = binned.groupBy("flag").agg(F.sum("c").alias("n"))
    cum = binned.join(tot, "flag").withColumn(
        "cum",
        F.sum("c").over(Window.partitionBy("flag").orderBy("bin")),
    )
    thr50 = F.expr("(n + 1) div 2")
    thr95 = F.expr("(95 * n + 99) div 100")
    return cum.groupBy("flag").agg(
        F.max("n").cast("long").alias("n"),
        (F.min(F.when(F.col("cum") >= thr50, F.col("bin"))) * 100)
        .cast("long")
        .alias("p50_bin_lo"),
        (F.min(F.when(F.col("cum") >= thr95, F.col("bin"))) * 100)
        .cast("long")
        .alias("p95_bin_lo"),
    )


# ---------------------------------------------------------------------------
# s09: matryoshka truncation + recall vs full-dimension ranking
# ---------------------------------------------------------------------------

_COS16 = (
    "list_dot_product(e.embedding[1:16]::DOUBLE[], q.qv16)"
    " / (sqrt(list_dot_product(e.embedding[1:16]::DOUBLE[],"
    " e.embedding[1:16]::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv16, q.qv16)))"
)
_COSF = (
    "list_dot_product(e.embedding::DOUBLE[], q.qv)"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv)))"
)


@_register(
    "s09_matryoshka_topk",
    f"""
    WITH q AS (SELECT embedding[1:16]::DOUBLE[] AS qv16,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id = 0),
    full_top AS (
      SELECT e.vec_id FROM embeddings e, q
      WHERE e.vec_id <> 0
      ORDER BY {_COSF} DESC, e.vec_id LIMIT 10)
    SELECT e.vec_id, {_COS16} AS cosine16,
           CASE WHEN e.vec_id IN (SELECT vec_id FROM full_top)
                THEN 1 ELSE 0 END AS in_full_topk
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cosine16 DESC, e.vec_id
    LIMIT 10
    """,
    survey="north-star similarity: matryoshka-truncation ANN — score "
    "on the FIRST 16 of 64 dimensions (the matryoshka-representation "
    "trick: prefix dims carry most signal, so truncation is the "
    "first cost knob every large ANN deployment turns: 4× less "
    "memory bandwidth and gemm work), and report per-hit whether the "
    "truncated ranking kept the full-dimension top-k member "
    "(in_full_topk — summing the column IS recall@10·k). Plan: both "
    "rankings are brute-force scans with a broadcast 1-row query "
    "vector and TakeOrdered — no shuffle keyed by vector; the "
    "truncated scan reads 4× fewer vector bytes, which is the point. "
    "Production path: rerank the truncated top-C candidates with "
    "full vectors (C ≫ k), same two building blocks.",
    note="Spark's slice() and DuckDB's [1:16] agree on 1-based "
    "inclusive semantics; the dot-product fold is sequential in both "
    "engines so the doubles are bit-identical (same property s01 "
    "already relies on at 64 dims).",
)
def s09_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by 16-dim truncated cosine, flagged with membership in
    the full-64-dim top-10 (recall@10 = sum(in_full_topk)/10)."""
    from ..functions.similarity import cosine

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.slice("embedding", 1, 16).alias("_qv16"),
        F.col("embedding").alias("_qv"),
    )
    base = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    full_top = (
        base.select(
            "vec_id", cosine(F.col("embedding"), F.col("_qv")).alias("cf")
        )
        .orderBy(F.desc("cf"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id")
    )
    trunc = base.select(
        "vec_id",
        cosine(F.slice("embedding", 1, 16), F.col("_qv16")).alias("cosine16"),
    )
    return (
        trunc.join(
            F.broadcast(full_top.withColumn("_hit", F.lit(1))), "vec_id", "left"
        )
        .select(
            "vec_id",
            "cosine16",
            F.coalesce(F.col("_hit"), F.lit(0)).cast("int").alias("in_full_topk"),
        )
        .orderBy(F.desc("cosine16"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# g03: triangle counting + global clustering coefficient
# ---------------------------------------------------------------------------


@_register(
    "g03_triangle_count",
    """
    WITH e AS (
      SELECT DISTINCT least(o.o_custkey, l.l_suppkey) AS a,
             greatest(o.o_custkey, l.l_suppkey) AS b
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_quantity >= 48 AND o.o_custkey <> l.l_suppkey),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM e e1 JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
      GROUP BY v),
    w AS (SELECT sum(d * (d - 1) // 2) AS n_wedges FROM deg),
    m AS (SELECT count(*) AS n_edges FROM e)
    SELECT CAST(m.n_edges AS BIGINT) AS n_edges,
           CAST(w.n_wedges AS BIGINT) AS n_wedges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           CAST(CASE WHEN w.n_wedges > 0
                     THEN 3 * tri.n_triangles * 1000000 // w.n_wedges
                END AS BIGINT) AS clustering_micro
    FROM m, w, tri
    """,
    survey="extension graph: triangle counting + global clustering "
    "coefficient over the high-quantity trade graph (edges thinned to "
    "l_quantity >= 48 co-purchases — completes the graph family: g01 "
    "centrality, g02 components, g03 local structure). The ordered "
    "orientation a < b < c makes each triangle count exactly once and "
    "bounds the wedge join's fan-out by the FORWARD degree — the "
    "standard trick that keeps triangle enumeration near-linear on "
    "power-law graphs (orient low-degree -> high-degree in production; "
    "here id order stands in, same join shape). Clustering coefficient "
    "3T/W is emitted as an exact integer micro-ratio — no float "
    "anywhere. Plan: one distinct-edge shuffle, one wedge join keyed "
    "on the pivot vertex, one edge-probe join (AQE handles residual "
    "skew); at 100 TB the thinning predicate is the density knob and "
    "the wedge join is the cost center, tracked by sum(fwd_deg^2).",
)
def g03_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count, wedge count, and global clustering
    coefficient (micro-units) on the thinned trade graph."""
    li, orders = _ctx(spark, sf_dir, "lineitem", "orders")
    e = (
        li.filter(F.col("l_quantity") >= 48)
        .join(orders, orders["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("o_custkey") != F.col("l_suppkey"))
        .select(
            F.least("o_custkey", "l_suppkey").alias("a"),
            F.greatest("o_custkey", "l_suppkey").alias("b"),
        )
        .distinct()
        .persist()
    )
    # The edge list feeds FIVE subplans (wedge join twice, probe join,
    # degree union both sides, edge count); without persist each one
    # rescans lineitem⋈orders and repeats the distinct exchange (plan
    # audit: three hashpartitioning(a,b) exchanges). Persisting makes
    # them all read the deduped partitions. Materialize eagerly so the
    # storage can be released as soon as the one-row result exists,
    # g01's leak-free idiom.
    e.count()
    e1 = e.alias("e1")
    e2 = e.select(F.col("a").alias("b2a"), F.col("b").alias("c")).alias("e2")
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3")).alias("e3")
    tri = (
        e1.join(e2, F.col("e2.b2a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a3") == F.col("e1.a")) & (F.col("e3.c3") == F.col("e2.c")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges")
    )
    m = e.agg(F.count("*").alias("n_edges"))
    out = (
        m.crossJoin(wedges)
        .crossJoin(tri)
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            # guard: an empty/wedge-free graph would make the integer
            # division throw under ANSI instead of yielding NULL
            F.expr(
                "CASE WHEN n_wedges > 0"
                " THEN 3 * n_triangles * 1000000 div n_wedges END"
            )
            .cast("long")
            .alias("clustering_micro"),
        )
    )
    # one-row result: checkpoint it eagerly, then release the edge cache
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


# ---------------------------------------------------------------------------
# e15: SCD Type-2 validity intervals from an event stream (CDC shape)
# ---------------------------------------------------------------------------


@_register(
    "e15_scd2_intervals",
    """
    WITH s AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    chg AS (
      SELECT user_id, event_type, us, event_id FROM s
      WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type,
           us AS valid_from_us,
           lead(us) OVER w AS valid_to_us,
           CAST(row_number() OVER w AS BIGINT) AS version,
           CASE WHEN lead(us) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    """,
    survey="extension events: SCD Type-2 dimension build from a change "
    "stream — collapse consecutive identical states per key (lag "
    "compare), then emit one validity interval per state run "
    "(valid_from/valid_to as half-open epoch-micros, version number, "
    "is_current flag on the open row). This is the CDC-to-warehouse "
    "materialization every lakehouse runs: o07's latest-by-key keeps "
    "only the current row, SCD2 keeps the full history queryable by "
    "as-of joins (e01/e12 consume exactly this shape). Plan: ONE "
    "shuffle keyed by user_id feeds both windows — lag and "
    "lead/row_number share the partitioning AND the textually "
    "identical (us, event_id) sort key, so the physical plan is one "
    "Exchange + ONE Sort (audited) — so history "
    "rebuild is a single exchange of the change stream; at 100 TB run "
    "it incrementally per partition-day with o07's upsert as the "
    "current-row fast path. Tie-break (ts, event_id) makes the run "
    "collapse and interval edges bit-deterministic.",
)
def e15_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals per user: one row per state run with
    half-open [valid_from, valid_to) epoch-micros and version."""
    (events,) = _ctx(spark, sf_dir, "events")
    # both windows order by (us, event_id): us is a monotone bijection
    # of ts, and the TEXTUALLY identical sort key lets Catalyst reuse
    # one sort for both window operators (ordering carries through the
    # filter) — sorting the lag window by ts instead leaves a second
    # SortExec in the plan (audited)
    pre = events.select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    w_lag = Window.partitionBy("user_id").orderBy("us", "event_id")
    s = pre.select(
        "user_id",
        "event_type",
        "us",
        "event_id",
        F.lag("event_type").over(w_lag).alias("prev"),
    )
    chg = s.filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return chg.select(
        "user_id",
        "event_type",
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w).alias("valid_to_us"),
        F.row_number().over(w).cast("long").alias("version"),
        F.when(F.lead("us").over(w).isNull(), 1).otherwise(0).alias("is_current"),
    )


# ---------------------------------------------------------------------------
# st10: streaming histogram-sketch maintenance (a27 run live on a stream)
# ---------------------------------------------------------------------------


@_register(
    "st10_stream_histogram",
    """
    WITH b AS (
      SELECT event_type,
             CAST(floor(value / 10.0) AS BIGINT) AS bin,
             count(*) AS c
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, sum(c) AS n FROM b GROUP BY event_type),
    cum AS (
      SELECT b.event_type, b.bin, t.n,
             sum(b.c) OVER (PARTITION BY b.event_type ORDER BY b.bin) AS cum
      FROM b JOIN tot t USING (event_type))
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) * 10
                AS BIGINT) AS p50_bin_lo,
           CAST(min(CASE WHEN cum >= (95 * n + 99) // 100 THEN bin END) * 10
                AS BIGINT) AS p95_bin_lo
    FROM cum GROUP BY event_type
    """,
    survey="streaming: incremental quantile-sketch maintenance — the "
    "a27 mergeable fixed-bin histogram run LIVE on a stream: the event "
    "feed is replayed as 4 micro-batches through a foreachBatch loop "
    "that merges per-(type, bin) counts into a persisted histogram "
    "snapshot BY ADDITION, then p50/p95 are answered from the stored "
    "counts alone. All-integer state makes the merged histogram "
    "bit-identical to the one-pass batch histogram for ANY micro-batch "
    "split — which is exactly what the batch-SQL oracle checks. At "
    "100 TB this is how percentile dashboards stay current: O(keys × "
    "bins) state, no feed rescans, any quantile on demand (contrast "
    "st04's per-session state and a17's exact two-pass).",
)
def st10_stream_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events as 4 micro-batches maintaining a per-type
    histogram snapshot; derive p50/p95 from the final stored counts."""
    import os
    import tempfile

    from ..streaming.snapshot import run_stream_histogram_snapshot

    (events,) = _ctx(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="st10_")
    src = os.path.join(tmp, "feed")
    snap = os.path.join(tmp, "hist")
    events.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_histogram_snapshot(
        stream, snap, key="event_type", value_col="value", bin_width=10.0
    )
    hist = spark.read.parquet(snap)
    tot = hist.groupBy("event_type").agg(F.sum("c").alias("n"))
    cum = hist.join(tot, "event_type").withColumn(
        "cum",
        F.sum("c").over(Window.partitionBy("event_type").orderBy("bin")),
    )
    thr50 = F.expr("(n + 1) div 2")
    thr95 = F.expr("(95 * n + 99) div 100")
    return cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        (F.min(F.when(F.col("cum") >= thr50, F.col("bin"))) * 10)
        .cast("long")
        .alias("p50_bin_lo"),
        (F.min(F.when(F.col("cum") >= thr95, F.col("bin"))) * 10)
        .cast("long")
        .alias("p95_bin_lo"),
    )


