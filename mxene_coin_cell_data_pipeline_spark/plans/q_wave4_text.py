"""Wave-4 text family (split from q_extensions4): C4-style
intra-document span dedup (t17) and BM25 retrieval scoring (t18).
Registration order is preserved by the import sequence in
plans/queries.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ._registry import _ctx, _register  # noqa: F401

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
