"""Extension wave 6 — training-data pipeline completion round 8b:

- d17: cross-document duplicated-window rate (the Lee et al. exact
  substring-dedup signal over k-token windows)
- d18: incremental batch-vs-corpus MinHash dedup (the production
  ingestion shape: probe a new batch against the standing corpus)
- t19: BPE merge-pair counts (one tokenizer-training iteration at
  corpus scale)
- t20: capped inverted-index build (exact df/cf header + top-tf
  postings — the search-index write shape)
- s11: product-quantization code assignment (the compressed-ANN-index
  map stage)

Importing this module REGISTERS its queries (oracle SQL inline) into
the shared registry; plans/queries.py imports it after q_extensions5.
Oracle fragments for d18 are the SAME _SH_CTE/_MH_COLS/_BAND_SELECTS
constants d02 pins, imported from q_northstar so the two sides cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._registry import _ctx, _register
from .q_northstar import _BAND_SELECTS, _MH_COLS, _SH_CTE

# ---------------------------------------------------------------------------
# d17: cross-document duplicated-window rate (exact substring dedup signal)
# ---------------------------------------------------------------------------

_D17_K = 8


@_register(
    "d17_window_duprate",
    f"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                  FROM documents),
    g AS (SELECT doc_id, array_to_string(w[i : i + {_D17_K - 1}], ' ') AS gram,
                 count(*) AS n_pos
          FROM toks, range(1, 4096) t(i)
          WHERE i + {_D17_K - 1} <= len(w)
          GROUP BY doc_id, gram),
    df AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(sum(g.n_pos) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN df.n_docs >= 2 THEN g.n_pos ELSE 0 END)
                AS BIGINT) AS n_dup_windows,
           CAST(sum(CASE WHEN df.n_docs >= 2 THEN g.n_pos ELSE 0 END)
                AS DOUBLE) / sum(g.n_pos) AS dup_frac
    FROM g JOIN df USING (gram)
    GROUP BY g.doc_id
    """,
    survey="north-star dedup completion: cross-document duplicated-"
    "window rate — the exact-substring dedup signal of Lee et al. "
    "(arXiv:2107.06499) over 8-token windows. Every window position is "
    "counted; a position is duplicated iff its gram occurs in ≥1 OTHER "
    "document (within-doc repetition stays t08/t17's business), and the "
    "per-doc fraction is the threshold curation pipelines drop on. "
    "Plan: row-local gram assembly (the shingles Generate-node trick), "
    "(doc,gram) map-side-combining aggregate collapsing within-doc "
    "repeats BEFORE the wire, one count-over-gram window (no gram "
    "self-join — a gram shared by m docs costs m rows, never m²), "
    "per-doc rollup. The raw-gram shuffle key is the oracle "
    "configuration; gram_key='xxhash64' is the production knob that "
    "shuffles 8 bytes per window instead of the string.",
)
def d17_window_duprate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of 8-token windows that also occur in another
    document."""
    from ..functions.dedup import window_dup_rate

    (docs,) = _ctx(spark, sf_dir, "documents")
    return window_dup_rate(docs, k=_D17_K, gram_key="raw")


# ---------------------------------------------------------------------------
# d18: incremental batch-vs-corpus MinHash dedup (production ingestion)
# ---------------------------------------------------------------------------


@_register(
    "d18_incremental_dedup",
    f"""
    WITH {_SH_CTE},
    sig AS MATERIALIZED (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band = b.band
                                       AND a.bucket = b.bucket
             WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b
                         AND sb.shingle = sa.shingle
              GROUP BY 1, 2),
    scored AS (SELECT i.doc_a, i.doc_b,
                      i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) AS j
               FROM inter i
               JOIN sizes na ON na.doc_id = i.doc_a
               JOIN sizes nb ON nb.doc_id = i.doc_b
               WHERE i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) >= 0.8)
    SELECT doc_b AS batch_doc,
           CAST(count(*) AS BIGINT) AS n_matches,
           min(doc_a) AS first_match,
           max(CAST(round(j * 1e9) AS BIGINT)) AS max_jaccard_nanos
    FROM scored GROUP BY doc_b
    """,
    survey="north-star dedup completion: INCREMENTAL batch-vs-corpus "
    "MinHash dedup — the production ingestion shape (new batch = "
    "doc_id%5==0, standing corpus = the rest; in production the corpus "
    "side is persisted signature/bucket state written once per admitted "
    "doc, so a batch costs O(batch), not O(corpus)). Candidates are "
    "corpus-bands ⋈ batch-bands on (band,bucket) — build-small/"
    "probe-large, never a corpus self-join — verified by the "
    "candidate-bounded array-intersect jaccard; per matched batch doc "
    "the match count, smallest matching corpus doc and exact max-"
    "jaccard nanos are emitted (novel survivors = the batch anti-join). "
    "bucket_cap thins viral corpus buckets to their cap smallest "
    "members per probe (the star-cap recall argument); the registered "
    "form opts out (bucket_cap=None, hash_fn=md5) because this oracle "
    "defines the exact all-members probe.",
)
def d18_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup matches of the doc_id%5==0 batch against the rest of
    the corpus (jaccard ≥ 0.8)."""
    from ..functions.dedup import incremental_minhash_dedup

    (docs,) = _ctx(spark, sf_dir, "documents")
    return incremental_minhash_dedup(
        docs, batch_mod=5, threshold=0.8, bucket_cap=None, hash_fn="md5"
    )


# ---------------------------------------------------------------------------
# t19: BPE merge-pair counts (tokenizer-training iteration)
# ---------------------------------------------------------------------------


@_register(
    "t19_bpe_top_merges",
    """
    WITH vocab AS (
      SELECT u.tok AS w, count(*) AS n_w
      FROM documents,
           LATERAL (SELECT unnest(regexp_extract_all(lower(text),
                    '[a-z0-9]+')) AS tok) u
      GROUP BY u.tok),
    p AS (SELECT CASE WHEN i < len(w) THEN substr(w, i, 2)
                      ELSE substr(w, i, 1) || '</w>' END AS pair, n_w
          FROM vocab,
               LATERAL (SELECT unnest(generate_series(1, len(w)::BIGINT))
                        AS i) t),
    agg AS (SELECT pair, CAST(sum(n_w) AS BIGINT) AS n_total
            FROM p GROUP BY pair)
    SELECT CAST(row_number() OVER (ORDER BY n_total DESC, pair) AS BIGINT)
             AS rank,
           pair, n_total
    FROM agg ORDER BY n_total DESC, pair LIMIT 20
    """,
    survey="north-star text completion: BPE merge-pair counts — one "
    "byte-pair-encoding trainer iteration (Sennrich et al., "
    "arXiv:1508.07909): words as char sequences closed by '</w>', "
    "adjacent-pair counts weighted by word frequency, top-20 merges "
    "(desc count, pair asc — a deterministic set under ties). The only "
    "corpus-sized pass is the word-frequency aggregate; pair extraction "
    "and ranking run over the DISTINCT vocabulary (Heaps-law sublinear) "
    "with a TakeOrderedAndProject top-k — the reason tokenizer training "
    "on 100 TB is feasible: after one scan, every further merge round "
    "is vocab-sized.",
)
def t19_bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 frequency-weighted adjacent symbol pairs over the word
    vocabulary (the first BPE merge candidates)."""
    from ..functions.text import bpe_top_merges

    (docs,) = _ctx(spark, sf_dir, "documents")
    return bpe_top_merges(docs, k=20)


# ---------------------------------------------------------------------------
# t20: capped inverted-index build (search-index write shape)
# ---------------------------------------------------------------------------


@_register(
    "t20_inverted_index",
    """
    WITH tf AS (
      SELECT u.tok AS token, doc_id, count(*) AS tf
      FROM documents,
           LATERAL (SELECT unnest(regexp_extract_all(lower(text),
                    '[a-z0-9]+')) AS tok) u
      GROUP BY u.tok, doc_id),
    w AS (SELECT token, doc_id, tf,
                 count(*) OVER (PARTITION BY token) AS df,
                 sum(tf) OVER (PARTITION BY token) AS cf,
                 row_number() OVER (PARTITION BY token
                                    ORDER BY tf DESC, doc_id) AS rn
          FROM tf)
    SELECT token,
           CAST(max(df) AS BIGINT) AS df,
           CAST(max(cf) AS BIGINT) AS cf,
           string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                      ',' ORDER BY rn) AS postings
    FROM w WHERE rn <= 3 GROUP BY token
    """,
    survey="north-star text completion: capped inverted-index build — "
    "one row per term with EXACT df/cf (computed over the full posting "
    "list) and the top-3 postings by tf (ties → smaller doc_id) "
    "serialized doc:tf,… — the impact-ordered/static-pruned index "
    "layout search engines ship. Plan: one map-side-combining "
    "(token,doc) tf aggregate (the corpus shuffle), ONE window over the "
    "token partitioning for df/cf/rank, and a per-token rollup reusing "
    "that partitioning. A stopword in every doc costs m rows in one "
    "sort partition — linear — and its stored list is still ≤3.",
)
def t20_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-header, top-3-capped posting lists per token."""
    from ..functions.text import inverted_index

    (docs,) = _ctx(spark, sf_dir, "documents")
    return inverted_index(docs, top_postings=3)


# ---------------------------------------------------------------------------
# s11: product-quantization code assignment (compressed ANN index)
# ---------------------------------------------------------------------------


@_register(
    "s11_pq_assign",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS code, e AS c FROM e WHERE vec_id < 4),
    d AS (
      SELECT e.vec_id, s.s, cent.code,
             list_dot_product(e.e[s.s*16+1 : s.s*16+16],
                              e.e[s.s*16+1 : s.s*16+16])
             - 2 * list_dot_product(e.e[s.s*16+1 : s.s*16+16],
                                    cent.c[s.s*16+1 : s.s*16+16])
             + list_dot_product(cent.c[s.s*16+1 : s.s*16+16],
                                cent.c[s.s*16+1 : s.s*16+16]) AS dist
      FROM e, (SELECT unnest(generate_series(0, 3)) AS s) s, cent),
    a AS (SELECT vec_id, s, code, dist,
                 row_number() OVER (PARTITION BY vec_id, s
                                    ORDER BY dist, code) AS rn
          FROM d)
    SELECT vec_id,
           CAST(max(CASE WHEN s = 0 THEN code END) AS INTEGER) AS code_0,
           CAST(max(CASE WHEN s = 1 THEN code END) AS INTEGER) AS code_1,
           CAST(max(CASE WHEN s = 2 THEN code END) AS INTEGER) AS code_2,
           CAST(max(CASE WHEN s = 3 THEN code END) AS INTEGER) AS code_3,
           CAST(sum(CAST(round(dist * 1e9) AS BIGINT)) AS BIGINT) AS err_nanos
    FROM a WHERE rn = 1 GROUP BY vec_id
    """,
    survey="north-star similarity completion: product-quantization code "
    "assignment (Jégou et al., TPAMI 2011) — 4 subspaces × 16 dims, "
    "4-entry codebooks seeded from vec_id 0..3 (the s05 deterministic-"
    "seed discipline); every vector encodes as its per-subspace "
    "nearest-centroid tuple plus the exact int64 quantization-error "
    "audit (round(residual·1e9) summed). The compressed-ANN-index map "
    "stage: codebooks inline as broadcast literals, so assignment is a "
    "pure scan — no join, no shuffle, array HOFs in whole-stage "
    "codegen; distances expand dot(x,x)−2·dot(x,c)+dot(c,c) with "
    "sequential folds (the s05/d04 bit-reproducibility discipline), "
    "ties to the smaller code.",
)
def s11_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codes (m=4, k=4) + exact quantization-error audit per vector."""
    from ..functions.similarity import pq_assign

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return pq_assign(emb, m=4, k=4)


# ---------------------------------------------------------------------------
# st11: streaming incremental dedup (d18's production twin on a stream)
# ---------------------------------------------------------------------------

from ._registry import QUERIES  # noqa: E402


@_register(
    "st11_stream_incremental_dedup",
    None,  # = d18's oracle verbatim, assigned below after registration
    survey="streaming completion: INCREMENTAL dedup as a genuine "
    "structured-streaming execution — the new-docs side (doc_id%5==0) "
    "replayed through the file-stream source, every micro-batch probed "
    "via foreachBatch against PERSISTED corpus dedup state "
    "(dedup_corpus_state's buckets+sets, built once before the stream "
    "starts). Because the corpus side is static and each doc's verdict "
    "depends only on itself, per-micro-batch evaluation is EXACT with "
    "zero cross-batch streaming state — the steady-state production "
    "ingest where a day's crawl costs O(batch) against an append-only "
    "state store. Oracle: IDENTICAL to d18's (same output relation) — "
    "the stream and batch forms must agree row-for-row.",
    note="foreachBatch rather than a chained streaming plan: the probe "
    "needs candidate DISTINCT + a per-doc aggregate, two stateful ops "
    "Spark won't stack without watermarks; the static-corpus argument "
    "makes per-batch evaluation exact instead.",
)
def st11_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d18 executed as a stream: batch docs arrive on a file stream and
    probe persisted corpus LSH state micro-batch by micro-batch."""
    from pyspark.sql import functions as F

    from ..streaming import read_table_stream
    from ..streaming.features import stream_incremental_dedup

    (docs,) = _ctx(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    stream = read_table_stream(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    return stream_incremental_dedup(
        stream, corpus, threshold=0.8, bucket_cap=None, hash_fn="md5"
    )


QUERIES["st11_stream_incremental_dedup"].oracle = QUERIES[
    "d18_incremental_dedup"
].oracle


# ---------------------------------------------------------------------------
# s12: Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------------

_S12_OUT_DIM = 16
_S12_PIVOT = ",\n           ".join(
    f"max(CASE WHEN j = {j} THEN yn END) AS y{j}_nanos"
    for j in range(_S12_OUT_DIM)
)


@_register(
    "s12_random_projection",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sgn AS (SELECT j, list(CASE WHEN ((strpos('0123456789abcdef',
                 substr(md5(CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)),
                        1, 1)) - 1) & 1) = 1
                 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
                 ORDER BY i) AS s
            FROM range(0, {_S12_OUT_DIM}) tj(j), range(1, 65) ti(i)
            GROUP BY j),
    y AS (SELECT e.vec_id, sgn.j,
                 CAST(round(list_dot_product(e.e, sgn.s) * 0.25 * 1e9)
                      AS BIGINT) AS yn
          FROM e, sgn)
    SELECT vec_id,
           {_S12_PIVOT}
    FROM y GROUP BY vec_id
    """,
    survey="north-star similarity completion: Johnson-Lindenstrauss "
    "±1 random projection (Achlioptas 2003) 64→16 dims — the sign "
    "matrix derives deterministically from md5 (low bit of the first "
    "hex char of md5('j|i'), the simhash nibble discipline) so the "
    "projection is engine-reproducible with NO stored model; the "
    "1/√16 scale is exact (power of four). A pure scan: dim·out_dim "
    "literal signs inline into the plan, no join, no shuffle, "
    "sequential folds (s05/d04 discipline), exact int64 nanos audit "
    "per output dim — the dimensionality-reduction front end ahead of "
    "clustering/ANN, fused into the embedding scan at 100 TB.",
)
def s12_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64→16-dim JL sign projection with exact nanos audit columns."""
    from ..functions.similarity import random_projection

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return random_projection(emb, out_dim=_S12_OUT_DIM)
