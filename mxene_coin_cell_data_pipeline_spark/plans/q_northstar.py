"""Northstar queries (split from the former monolithic plans/queries.py).

Importing this module REGISTERS its queries (oracle SQL inline) into
the shared registry — plans/queries.py imports every family module in
the original definition order, so driver-facing ordering is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from ._registry import QUERIES, _ctx, _dsum6, _register

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
#: ``sh`` is MATERIALIZED: the queries below reference it many times
#: (bands inline sig 4x, pair sides double everything), and DuckDB's
#: default CTE inlining re-evaluates the 4096-wide LATERAL unnest +
#: 100M-row DISTINCT per reference — ~10 concurrent distinct hash
#: tables was the 100x disk-spill, not the query semantics.
_SH_CTE = """
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents),
sh AS MATERIALIZED (
       SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
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

#: candidate-constrained refine tail for the LSH queries (d02/d12 and
#: their d08/d14 embeddings): value-identical to an unconstrained
#: co-shingle ``inter`` inner-joined to ``cand`` (rows outside cand
#: are discarded downstream anyway, and a cand pair with zero shared
#: shingles produces no group either way), but the aggregate's group
#: cardinality is bounded by |cand| instead of by every co-shingle
#: document pair — the unconstrained form's hash table is quadratic in
#: per-shingle document frequency and exceeded DuckDB's 48GB+disk at
#: 100x on the templated corpus. d05 (exact all-pairs jaccard, no LSH
#: candidate set) bounds its verify the same way via the AllPairs
#: prefix-filter candidates — see its registration below.
_JACCARD_TAIL_CAND = """
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b
                     AND sb.shingle = sa.shingle
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
    sig AS MATERIALIZED (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band = b.band
                                       AND a.bucket = b.bucket
                                       AND a.doc_id < b.doc_id),
    {_JACCARD_TAIL_CAND.lstrip()}
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
    # bucket_cap=None: the oracle above defines ALL-PAIRS semantics;
    # the library default is star-capped (see functions/dedup.py).
    return minhash_near_dup_pairs(
        docs, threshold=0.8, bucket_cap=None, hash_fn="md5"
    )


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
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    ord AS (SELECT s.doc_id, s.shingle, z.n,
                   row_number() OVER (PARTITION BY s.doc_id
                                      ORDER BY d.df, s.shingle) AS rn
            FROM sh s JOIN dfreq d USING (shingle)
                      JOIN sizes z USING (doc_id)),
    pref AS (SELECT doc_id, n, rn, shingle FROM ord
             WHERE rn <= n - ceil(0.8 * n) + 1),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.n AS n_a,
                             b.doc_id AS doc_b, b.n AS n_b
             FROM pref a JOIN pref b ON a.shingle = b.shingle
                                     AND a.doc_id < b.doc_id
             WHERE b.n >= ceil(0.8 * a.n)
               AND a.n >= ceil(0.8 * b.n)
               AND least(a.n - a.rn, b.n - b.rn) + 1
                   >= ceil((0.8 / 1.8) * (a.n + b.n))),
    inter AS (SELECT c.doc_a, c.doc_b, c.n_a, c.n_b, count(*) AS n_inter
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b
                         AND sb.shingle = sa.shingle
              GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b,
           n_inter * 1.0 / (n_a + n_b - n_inter) AS jaccard
    FROM inter
    WHERE n_inter * 1.0 / (n_a + n_b - n_inter) >= 0.8
    """,
    survey="north-star dedup: exact n-gram jaccard via prefix-filtered "
    "inverted-index join (AllPairs/PPJoin prune: jaccard ≥ t pairs must "
    "collide within each set's rarest-first n−ceil(t·n)+1 prefix, plus the "
    "exact length and positional filters — output identical to the "
    "all-shingle join, which is quadratic in per-shingle document "
    "frequency and OOMs at 100×; the filters cut 100× candidates 1.21e9 → "
    "1.29e8, so the candidate-bounded verify aggregate's state is ~129M "
    "groups — in-memory on both engines, where a per-candidate "
    "list-intersection join was measured to materialize list columns past "
    "host RAM in the oracle)",
)
def d05_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _ctx(spark, sf_dir, "documents")
    # max_df=None: the oracle scores the full shingle universe; the
    # library default caps posting lists (see functions/dedup.py).
    return ngram_jaccard_pairs(docs, threshold=0.8, max_df=None)


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
    -- MATERIALIZED pre-cast + per-row norm: the inlined form re-casts
    -- embedding::DOUBLE[] and folds THREE dot products per pair (2e9
    -- pairs at 100x); sqrt(list_dot_product(v,v)) per ROW is the same
    -- double (identical op order), so cosine is bit-identical
    WITH e AS MATERIALIZED (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings),
    scored AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      FROM e a JOIN e b
        ON a.label = b.label AND a.vec_id < b.vec_id),
    pairs AS (
      SELECT vec_a, vec_b, round(cosine, 9) AS cosine
      FROM scored WHERE round(cosine, 9) >= 0.2)
    SELECT vec_a,
           count(*) AS n_pairs,
           CAST(sum(CAST(round(cosine * 1e9) AS BIGINT)) AS BIGINT)
             AS sum_cos_nanos,
           max(CAST(round(cosine * 1e9) AS BIGINT)) AS max_cos_nanos,
           CAST(sum((vec_b * 2654435761) % 2147483647) AS BIGINT)
             AS partner_sig
    FROM pairs GROUP BY vec_a
    """,
    survey="north-star dedup: embedding-cosine near-dup (label-blocked pairwise, "
    "per-block BLAS gemm kernel; bounded per-vector audit output)",
    note="threshold 0.2 so the oracle checks ~10k real pairs at sf0.1 "
    "(0.95 matches nothing in the synthetic embeddings — a vacuous pass); "
    "the Spark side is the applyInPandas matrix-multiply kernel, ulp-equal "
    "to the SQL fold. Audit output is one row per vec_a — pair count, an "
    "exact int64 checksum of each partner's round(cosine,9) in nanos "
    "(integer sum, order-independent), the max, and a Knuth-hash partner-id "
    "signature — so a wrong, missing, or extra pair anywhere flips a row "
    "while output stays O(n) at any scale (the d10/t17 bounded-oracle "
    "discipline: the raw pair relation is ~120M rows at 100×, quadratic "
    "in block size, and collecting it is a harness cost, not a query cost).",
)
def d04_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = _ctx(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs_blas(emb, threshold=0.2)
    # cosine is already round(,9) — ×1e9 is within 1e-7 of an integer,
    # so round→long is exact and the sums are order-independent int64.
    #
    # partner_sig overflow bound (round-7 ADVICE): vec_b * 2654435761
    # is evaluated in int64, so it overflows once vec_b exceeds
    # ~3.46e9 (2^63 / 2654435761) — ANSI sessions would throw there,
    # non-ANSI ones silently wrap. Max vec_id is ~1e9 even at 100x
    # (stride 1e7 x sf 100), a 3.4x margin; additive checksums can in
    # principle cancel compensating errors, which n_pairs /
    # sum_cos_nanos / max_cos_nanos jointly mitigate. If scale factors
    # ever grow past ~346x, switch to XOR-folding xxhash64((vec_b,
    # cos_nanos)) on BOTH sides instead of raising the multiplier.
    cos_nanos = F.round(F.col("cosine") * 1e9, 0).cast("long")
    return pairs.groupBy("vec_a").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(cos_nanos).alias("sum_cos_nanos"),
        F.max(cos_nanos).alias("max_cos_nanos"),
        F.sum(
            (F.col("vec_b") * F.lit(2654435761)) % F.lit(2147483647)
        ).alias("partner_sig"),
    )


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


