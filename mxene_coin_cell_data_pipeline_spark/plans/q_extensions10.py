"""Extension wave 12 — round 11:

- s14: IVF-PQ residual search (IVFADC) — s02's coarse routing composed
  with s13's asymmetric-distance scoring: vectors route to coarse
  Voronoi lists, RESIDUALS are PQ-encoded, the query probes nprobe
  lists and scores their codes with per-list LUTs (Jégou et al.,
  TPAMI 2011 §IV.B — the FAISS IVFADC shape that makes compressed ANN
  sub-scan instead of full-scan)
- m13: audio fingerprint near-dup — integer sub-band energy signatures
  per PCM window (Haitsma/Kalker-style robust hash, aHash-comparison
  form so it is amplitude-invariant) through the shared star-capped
  hamming band machinery, completing the modality matrix (text d*,
  image m10/m11, video m12, audio m13)
- s15: hybrid retrieval fusion — reciprocal-rank fusion of t18's BM25
  ranking and s01's cosine ranking as exact integer arithmetic
  (Cormack et al., SIGIR 2009)
- p07: the p06 capstone re-run under a t24-TRAINED merge table (train
  on the surviving corpus, encode the selected corpus with it) — the
  true train→curate→encode lifecycle

Importing this module REGISTERS its queries (oracle SQL inline);
plans/queries.py imports it after q_extensions9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._registry import QUERIES, _ctx, _register

# ---------------------------------------------------------------------------
# s14: IVFADC — inverted-file search over PQ residual codes
# ---------------------------------------------------------------------------

_S14_KC, _S14_M, _S14_K, _S14_NPROBE, _S14_TOPK = 4, 4, 4, 2, 10
_S14_DIM = 64  # TESTDATA.md: embeddings.embedding is a 64-float array


def ivfadc_oracle_sql(
    kc: int = _S14_KC,
    m: int = _S14_M,
    k: int = _S14_K,
    nprobe: int = _S14_NPROBE,
    topk: int = _S14_TOPK,
    qid: int = 0,
    dim: int = _S14_DIM,
) -> str:
    """Generate the IVFADC oracle SQL for a parameter set — the s14
    registration uses the defaults; src07 (the materialized-index
    layout variant) re-derives the SAME relational semantics under its
    own constants, because the physical layout is invisible to the
    oracle. Kept as a builder so a constant change is a one-argument
    edit (the r10-ADVICE lesson on derived oracle constants)."""
    sub = dim // m

    def _slice(expr: str, s: str = "s.s") -> str:
        return f"{expr}[{s}*{sub}+1 : {s}*{sub}+{sub}]"

    def _sqdist(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {a})"
            f" - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b})"
        )

    def _sqdist_sub(a: str, b: str, s: str = "s.s") -> str:
        asl, bsl = _slice(a, s), _slice(b, s)
        return (
            f"list_dot_product({asl}, {asl})"
            f" - 2 * list_dot_product({asl}, {bsl})"
            f" + list_dot_product({bsl}, {bsl})"
        )

    codes_pivot = ",\n                   ".join(
        f"max(CASE WHEN s = {s} THEN code END) AS c{s}" for s in range(m)
    )
    lutp = ",\n                  ".join(
        f"max(CASE WHEN s = {s} AND code = {c} THEN ld END) AS l{s}_{c}"
        for s in range(m)
        for c in range(k)
    )
    adc = " + ".join(
        "(CASE v.c%d %s ELSE l.l%d_%d END)"
        % (
            s,
            " ".join(f"WHEN {c} THEN l.l{s}_{c}" for c in range(k - 1)),
            s,
            k - 1,
        )
        for s in range(m)
    )
    series = f"(SELECT unnest(generate_series(0, {m - 1})) AS s) s"
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cc AS (SELECT vec_id AS list_id, e AS c FROM e WHERE vec_id < {kc}),
    q AS (SELECT e AS qv FROM e WHERE vec_id = {qid}),
    cd AS (SELECT e.vec_id, cc.list_id,
                  {_sqdist("e.e", "cc.c")} AS dist
           FROM e, cc),
    asg AS (SELECT vec_id, list_id FROM (
              SELECT vec_id, list_id,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist, list_id) AS rn
              FROM cd) WHERE rn = 1),
    resid AS (SELECT e.vec_id, a.list_id,
                     list_transform(range(1, {dim + 1}),
                                    i -> e.e[i] - cc.c[i]) AS r
              FROM e JOIN asg a USING (vec_id)
                     JOIN cc ON cc.list_id = a.list_id),
    pqc AS (SELECT vec_id - {kc} AS code, r AS p FROM resid
            WHERE vec_id >= {kc} AND vec_id < {kc + k}),
    probe AS (SELECT list_id, c FROM (
                SELECT cc.list_id, cc.c,
                       row_number() OVER (ORDER BY
                         {_sqdist("q.qv", "cc.c")}, cc.list_id) AS rn
                FROM cc, q) WHERE rn <= {nprobe}),
    corp AS (SELECT r.vec_id, r.list_id, r.r
             FROM resid r JOIN probe USING (list_id)
             WHERE r.vec_id <> {qid}),
    scd AS (SELECT corp.vec_id, corp.list_id, s.s, pqc.code,
                   {_sqdist_sub("corp.r", "pqc.p")} AS dist
            FROM corp, {series}, pqc),
    codes AS (SELECT vec_id, list_id,
                   {codes_pivot}
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                                 ORDER BY dist, code) AS rn
                    FROM scd) WHERE rn = 1
              GROUP BY vec_id, list_id),
    rq AS (SELECT probe.list_id,
                  list_transform(range(1, {dim + 1}),
                                 i -> q.qv[i] - probe.c[i]) AS rq
           FROM probe, q),
    lut AS (SELECT rq.list_id, s.s, pqc.code,
                   {_sqdist_sub("rq.rq", "pqc.p")} AS ld
            FROM rq, {series}, pqc),
    lutp AS (SELECT list_id,
                  {lutp}
             FROM lut GROUP BY list_id),
    adc AS (SELECT v.vec_id, v.list_id,
                   CAST(round(({adc}) * 1e9) AS BIGINT) AS adc_nanos
            FROM codes v JOIN lutp l ON l.list_id = v.list_id),
    exact AS (SELECT e.vec_id,
                     CAST(round((list_dot_product(e.e, e.e)
                          - 2 * list_dot_product(e.e, q.qv)
                          + list_dot_product(q.qv, q.qv)) * 1e9) AS BIGINT)
                       AS l2_nanos,
                     CAST(round((list_dot_product(e.e, q.qv)
                       / (sqrt(list_dot_product(e.e, e.e))
                          * sqrt(list_dot_product(q.qv, q.qv)))) * 1e9)
                       AS BIGINT) AS cos_nanos
              FROM e, q WHERE e.vec_id <> {qid}),
    l2top AS (SELECT vec_id FROM exact ORDER BY l2_nanos, vec_id LIMIT {topk}),
    costop AS (SELECT vec_id FROM exact
               ORDER BY cos_nanos DESC, vec_id LIMIT {topk})
    SELECT t.vec_id, t.list_id, t.adc_nanos,
           CASE WHEN t.vec_id IN (SELECT vec_id FROM l2top)
                THEN 1 ELSE 0 END AS in_exact_l2_topk,
           CASE WHEN t.vec_id IN (SELECT vec_id FROM costop)
                THEN 1 ELSE 0 END AS in_exact_cos_topk
    FROM (SELECT vec_id, list_id, adc_nanos FROM adc
          ORDER BY adc_nanos, vec_id LIMIT {topk}) t
    """


@_register(
    "s14_ivfpq_residual_topk",
    ivfadc_oracle_sql(),
    survey="north-star similarity completion: IVF-PQ residual search "
    "(IVFADC, Jégou et al. TPAMI 2011 §IV.B — VERDICT r10 task 1): "
    "vectors route to their nearest of kc coarse centroids (inverted "
    "lists), RESIDUALS vector − centroid are PQ-encoded against a "
    "shared product codebook (seeded from the residuals of the k "
    "vectors past the coarse seeds — whose own residuals are "
    "identically zero), and the query probes only the nprobe nearest "
    "lists, scoring each list's codes with a per-list LUT built from "
    "the query's residual against that list's centroid. This is the "
    "structure that bounds compressed search at 100 TB: flat ADC "
    "(s13) reads every code; here the probed-list filter prunes the "
    "scan to nprobe/kc of the data (a written index would partition "
    "by list_id and the filter becomes partition pruning). Dual "
    "recall audit vs exact-L2 AND exact-cosine (both on the "
    "round(·1e9) int64 grid, the s13-as-amended discipline); "
    "assignment ties to the smaller id; all folds sequential "
    "left-to-right on both engines; residual subtraction a single "
    "IEEE op per lane.",
    note="Plan pin (tests/test_plan_shapes.py): pure scan — coarse "
    "assignment, probed-list filter, residual PQ encode, per-list LUT "
    "ADC all in one codegen pipeline over literals; TakeOrdered "
    "pushdown; no join wider than the two 10-row recall broadcasts; "
    "zero shuffle exchanges.",
)
def s14_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC top-10 over probed residual-code lists with exact-L2 /
    exact-cosine recall flags (see functions.similarity
    .ivfpq_residual_topk)."""
    from ..functions.similarity import ivfpq_residual_topk

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return ivfpq_residual_topk(
        emb,
        query_vec_id=0,
        kc=_S14_KC,
        m=_S14_M,
        k=_S14_K,
        nprobe=_S14_NPROBE,
        topk=_S14_TOPK,
    )


# ---------------------------------------------------------------------------
# m13: audio fingerprint near-dup (integer sub-band energy signatures)
# ---------------------------------------------------------------------------

# the shared flat band/refine machinery (bits=64, n_bands=4, cap=64,
# hamming<=3) — the same generated CTE block m12 uses; it consumes a
# MATERIALIZED sh(doc_id, simhash_bits) and yields fpairs(doc_a, doc_b)
from .q_extensions9 import _M12_BAND_CTES  # noqa: E402

_HEX = "strpos('0123456789abcdef', substr({md5}, {pos}, 1)) - 1"


def _m13_base(key_sql: str) -> str:
    """Closed-form base sample: (int16-of-first-4-md5-hex-chars %
    32768) − 16384 — the exact integer the generator packs."""
    md5 = f"md5({key_sql})"
    v16 = " + ".join(
        f"({_HEX.format(md5=md5, pos=p + 1)}) * {16 ** (3 - p)}"
        if p < 3
        else f"({_HEX.format(md5=md5, pos=p + 1)})"
        for p in range(4)
    )
    return f"((({v16}) % 32768) - 16384)"


def _m13_val(i_expr: str) -> str:
    """Closed-form SQL for ONE decoded PCM sample of
    with_wav_pair_payload — base content keyed by (g, w, i), the odd
    sibling amplitude-doubled with window g%nw spliced — parameterized
    over the sample-index expression so the chunk-energy form can
    derive BOTH samples of a chunk per row (no 128-sample relation,
    no sample self-anything — the m12 closed-form lesson)."""
    key = (
        "CAST(wi.g AS VARCHAR) || ':' || CAST(wi.w AS VARCHAR)"
        f" || ':' || CAST({i_expr} AS VARCHAR)"
    )
    skey = (
        "CAST(wi.g AS VARCHAR) || ':spliced:'"
        f" || CAST({i_expr} AS VARCHAR)"
    )
    return f"""CASE
            WHEN wi.doc_id % 2 = 0 THEN {_m13_base(key)}
            WHEN wi.w = wi.g % wi.nw THEN 2 * {_m13_base(skey)}
            ELSE 2 * {_m13_base(key)} END"""


#: chunk energy = v0² + v1² — both samples closed-form per
#: (window, chunk) row (projected to v0/v1 aliases first so each md5
#: stream is written once), exact integers end to end

#: the m12 aggregate-form pivot: 64 SUM(CASE) aggregates per window —
#: one streaming hash aggregate, NO window function and NO ordered
#: aggregate. WHY: the first registered form (sample relation →
#: GROUP BY chunk → sum() OVER (PARTITION BY window) → string_agg
#: ORDER BY) ballooned DuckDB's allocator at 100× exactly like m12's
#: list-pivot DCT (bad allocation at 725s with the engine side
#: already green at 250,000 rows — crash kept in
#: /tmp/sweep100x_r11.jsonl); this form runs the identical integer
#: math through the dct-style wide aggregate that measured 48s/4.6GB
#: for m12.
_M13_E_AGGS = ",\n               ".join(
    f"SUM(CASE WHEN j = {j} THEN e END) AS e{j}" for j in range(64)
)
_M13_TOT = " + ".join(f"e{j}" for j in range(64))
_M13_BITS = " || ".join(
    f"(CASE WHEN 64 * e{j} > s THEN '1' ELSE '0' END)" for j in range(64)
)


@_register(
    "m13_audio_fingerprint_neardup",
    f"""
    WITH d AS (SELECT doc_id, doc_id // 2 AS g,
                      2 + (doc_id // 2) % 3 AS nw
               FROM documents),
    wi AS (SELECT d.doc_id, d.g, d.nw, u.w
           FROM d, (SELECT unnest(generate_series(0, 3)) AS w) u
           WHERE u.w < d.nw),
    cj AS (SELECT doc_id, nw, w, j, v0 * v0 + v1 * v1 AS e FROM (
           SELECT wi.doc_id, wi.nw, wi.w, u.j,
                  {_m13_val("(2 * u.j)")} AS v0,
                  {_m13_val("(2 * u.j + 1)")} AS v1
           FROM wi, (SELECT unnest(generate_series(0, 63)) AS j) u)),
    ew AS (SELECT doc_id, nw, w,
               {_M13_E_AGGS}
           FROM cj GROUP BY doc_id, nw, w),
    es AS (SELECT *, ({_M13_TOT}) AS s FROM ew),
    sh AS MATERIALIZED (
      SELECT (doc_id * 8 + w) * 8 + nw AS doc_id,
             ({_M13_BITS}) AS simhash_bits
      FROM es),
    {_M12_BAND_CTES.strip()},
    ag AS (SELECT doc_a // 64 AS clip_a, doc_b // 64 AS clip_b,
                  count(DISTINCT doc_a // 8) AS na,
                  count(DISTINCT doc_b // 8) AS nb,
                  max(doc_a % 8) AS n_win_a, max(doc_b % 8) AS n_win_b
           FROM fpairs WHERE doc_a // 64 < doc_b // 64
           GROUP BY doc_a // 64, doc_b // 64)
    SELECT clip_a, clip_b,
           CAST(n_win_a AS BIGINT) AS n_win_a,
           CAST(n_win_b AS BIGINT) AS n_win_b,
           CAST(na AS BIGINT) AS n_matched_a,
           CAST(nb AS BIGINT) AS n_matched_b
    FROM ag WHERE 2 * na >= n_win_a AND 2 * nb >= n_win_b
    """,
    survey="north-star multimodal completion: AUDIO fingerprint "
    "near-dup (VERDICT r10 task 2) — the modality matrix's last cell "
    "(text d02/d03, image m10/m11, video m12, now audio): REAL "
    "RIFF/WAVE PCM16 parses (parse_wav — the m07 codec) cut into "
    "128-sample windows, each fingerprinted by the integer sub-band "
    "energy comparison chunks·E_j > ΣE (64 exact int square-sums per "
    "window — the Haitsma/Kalker energy-signature lineage in m10's "
    "aHash comparison form, fixed-point like COS14, no libm), then "
    "the SHARED star-capped hamming band machinery over composite "
    "window ids ((doc_id·8 + win_idx)·8 + n_win — clip = fid DIV 64, "
    "window = fid DIV 8, n_win = fid % 8 ≤ 4 by the generator's "
    "closed form), aggregated to the m12 half-rule: a clip pair is a "
    "near-dup when ≥ half of EACH clip's windows have a hamming-≤3 "
    "partner in the other. The sibling fixture plants the two "
    "robustness contracts: the odd sibling is amplitude-DOUBLED "
    "(energies scale ×4 uniformly — every bit provably unchanged, "
    "the pair must stay connected) with ONE spliced window (different "
    "content — exactly its windows drop out of the match set).",
    note="REGISTERED CAPPED from birth (bucket_cap=64, the m10/m11/"
    "m12 lesson). ONE kernel pass — n_win rides the composite id "
    "like m12's n_kf (no second kernel TYPE), and the shared band "
    "machinery persists the compact fingerprint table (optimization "
    "r11: one kernel execution instead of five subtree replays). "
    "Oracle is pure integer arithmetic end to end (closed-form md5 "
    "samples, exact int energies, integer comparisons) — "
    "tolerance-free by construction, no float discipline needed.",
)
def m13_audio_fingerprint_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Clip pairs whose window fingerprint sets mutually match on
    ≥ half their windows (see functions.multimodal
    .wav_window_fingerprints + functions.dedup
    .hamming_pairs_from_bits)."""
    from ..functions.dedup import hamming_pairs_from_bits
    from ..functions.multimodal import (
        wav_window_fingerprints,
        with_wav_pair_payload,
    )
    from ..sources.tables import scale_out

    (docs,) = _ctx(spark, sf_dir, "documents")
    # scale_out: the codec kernel parses the whole clip per row —
    # single-row-group layouts would run it as ONE task (m10's lesson)
    fps = wav_window_fingerprints(
        with_wav_pair_payload(scale_out(docs.select("doc_id"), "doc_id"))
    )
    fp = fps.select(
        (
            (F.col("doc_id") * 8 + F.col("win_idx")) * 8 + F.col("n_win")
        ).alias("doc_id"),
        "fp_bits",
    )
    pairs = hamming_pairs_from_bits(
        fp, bits_col="fp_bits", bits=64, max_hamming=3, n_bands=4,
        bucket_cap=64,
    )
    ag = (
        pairs.select(
            F.expr("doc_a DIV 64").alias("clip_a"),
            F.expr("doc_b DIV 64").alias("clip_b"),
            F.expr("doc_a DIV 8").alias("wid_a"),
            F.expr("doc_b DIV 8").alias("wid_b"),
            F.expr("doc_a % 8").alias("nw_a"),
            F.expr("doc_b % 8").alias("nw_b"),
        )
        .filter(F.col("clip_a") < F.col("clip_b"))
        .groupBy("clip_a", "clip_b")
        .agg(
            F.countDistinct("wid_a").cast("long").alias("n_matched_a"),
            F.countDistinct("wid_b").cast("long").alias("n_matched_b"),
            F.max("nw_a").cast("long").alias("n_win_a"),
            F.max("nw_b").cast("long").alias("n_win_b"),
        )
    )
    return ag.filter(
        (2 * F.col("n_matched_a") >= F.col("n_win_a"))
        & (2 * F.col("n_matched_b") >= F.col("n_win_b"))
    ).select(
        "clip_a", "clip_b", "n_win_a", "n_win_b",
        "n_matched_a", "n_matched_b",
    )


# ---------------------------------------------------------------------------
# s15: hybrid retrieval fusion — reciprocal-rank fusion of BM25 + ANN
# ---------------------------------------------------------------------------

import math  # noqa: E402

#: RRF constant (Cormack/Clarke/Buettcher, SIGIR 2009 use k=60) and the
#: exact common denominator: lcm(61..70) — every contribution
#: D // (60 + rank) is an EXACT integer for rank 1..10, so fused scores
#: and their ordering are integer arithmetic end to end.
_S15_K = 60
_S15_TOPK = 10
_S15_D = math.lcm(*range(_S15_K + 1, _S15_K + _S15_TOPK + 1))


@_register(
    "s15_rrf_hybrid_fusion",
    f"""
    WITH lex0 AS (SELECT * FROM ({{t18}}) t),
    vec0 AS (SELECT * FROM ({{s01}}) t),
    lex AS (SELECT doc_id,
                   row_number() OVER (
                     ORDER BY CAST(round(bm25 * 1e9) AS BIGINT) DESC,
                              doc_id) AS lex_rank
            FROM lex0),
    vec AS (SELECT vec_id AS doc_id,
                   row_number() OVER (
                     ORDER BY CAST(round(cosine * 1e9) AS BIGINT) DESC,
                              vec_id) AS vec_rank
            FROM vec0),
    f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                 l.lex_rank, v.vec_rank
          FROM lex l FULL OUTER JOIN vec v ON v.doc_id = l.doc_id)
    SELECT doc_id,
           CAST(coalesce(lex_rank, 0) AS BIGINT) AS lex_rank,
           CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank,
           CAST(coalesce({_S15_D} // (60 + lex_rank), 0)
                + coalesce({_S15_D} // (60 + vec_rank), 0) AS BIGINT)
             AS rrf_num
    FROM f
    """,
    survey="north-star retrieval completion: HYBRID fusion (VERDICT "
    "r10 task 3) — reciprocal-rank fusion of t18's BM25 lexical "
    "top-10 and s01's cosine vector top-10 over the aligned "
    "doc_id/vec_id space, score = Σ 1/(60+rank) (Cormack et al., "
    "SIGIR 2009: RRF outperforms Condorcet and individual-rank "
    "learning methods) — the ranking real RAG-curation pipelines "
    "compute from exactly these two retrievers. Both input rankings "
    "are RE-DERIVED IN-QUERY from their registered definitions "
    "(verbatim SQL composition on the oracle side; the registered "
    "query callables on the Spark side), ranks assigned on the "
    "round(·1e9) int64 grid with id tie-breaks, and the fused score "
    "is EXACT integer arithmetic: contributions are D // (60+rank) "
    f"with D = lcm(61..70) = {_S15_D} — divisible for every rank, so "
    "the fusion introduces zero float ops (rrf_num / D recovers the "
    "textbook score). Absent-from-a-list is rank 0 (contributes "
    "nothing), so the output is the UNION of both top-10 sets with "
    "full provenance (lex_rank, vec_rank, rrf_num).",
    note="Scale: both inputs are top-k relations (≤10 rows each) — "
    "the fusion is a broadcast-sized full outer join + row-local "
    "integer arithmetic; the corpus-sized work is entirely inside "
    "the two audited retrievers it composes. The 10-row rank windows "
    "are the quota-seed class of legitimately tiny single-partition "
    "sorts.",
)
def s15_rrf_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of the BM25 and cosine top-10s with int-grid ranks and
    the exact-integer RRF fused score."""
    from pyspark.sql import Window

    lex0 = QUERIES["t18_bm25_topk"].spark(spark, sf_dir)
    vec0 = QUERIES["s01_cosine_topk"].spark(spark, sf_dir)
    wl = Window.orderBy(
        F.desc(F.round(F.col("bm25") * 1e9).cast("long")), F.asc("doc_id")
    )
    wv = Window.orderBy(
        F.desc(F.round(F.col("cosine") * 1e9).cast("long")), F.asc("vec_id")
    )
    lex = lex0.select(
        "doc_id", F.row_number().over(wl).alias("lex_rank")
    )
    vec = vec0.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wv).alias("vec_rank"),
    )
    f = lex.join(vec, "doc_id", "full_outer")
    z = F.lit(0).cast("long")
    return f.select(
        "doc_id",
        F.coalesce(F.col("lex_rank").cast("long"), z).alias("lex_rank"),
        F.coalesce(F.col("vec_rank").cast("long"), z).alias("vec_rank"),
        (
            F.coalesce(
                F.expr(f"{_S15_D} div (60 + lex_rank)").cast("long"), z
            )
            + F.coalesce(
                F.expr(f"{_S15_D} div (60 + vec_rank)").cast("long"), z
            )
        ).alias("rrf_num"),
    )


# splice the two verified retriever oracles in VERBATIM (one source of
# truth — a t18/s01 oracle change propagates here automatically)
QUERIES["s15_rrf_hybrid_fusion"].oracle = QUERIES[
    "s15_rrf_hybrid_fusion"
].oracle.format(
    t18=QUERIES["t18_bm25_topk"].oracle,
    s01=QUERIES["s01_cosine_topk"].oracle,
)


# ---------------------------------------------------------------------------
# p07: the trained-tokenizer capstone — train on survivors, encode with it
# ---------------------------------------------------------------------------

from .q_extensions9 import (  # noqa: E402
    _T24_ROUNDS,
    _T24_V0_CTE,
    _t24_round_ctes,
)

#: p06's verified oracle, spliced VERBATIM through its packing audit
#: (everything up to the vocc/encode tail) — the s15 one-source-of-
#: truth discipline: a p06 curation-stage change propagates here or
#: fails this index() loudly at import.
_P06_ORACLE = QUERIES["p06_tokenizer_corpus_pipeline"].oracle
_P07_PREFIX = _P06_ORACLE[: _P06_ORACLE.index(",\n    vocc AS")]

_P07_TRAIN_CTES = ",\n    ".join(
    [
        # training corpus: ALL survivors' kept tokens (not just the
        # selected ones — you train the tokenizer on everything that
        # survived cleaning, then spend the sampling budget on what
        # you encode)
        "toksw AS MATERIALIZED (SELECT c.tok AS w, count(*) AS cnt\n"
        "      FROM cov2 c JOIN kept k ON k.doc_id = c.doc_id\n"
        "      WHERE c.covered = 0 GROUP BY c.tok)",
        _T24_V0_CTE,
    ]
    + _t24_round_ctes(_T24_ROUNDS)
)

_P07_MRG_UNION = "\n      UNION ALL ".join(
    f"SELECT rank, sym_a, sym_b FROM a{r}"
    for r in range(1, _T24_ROUNDS + 1)
)


@_register(
    "p07_trained_tokenizer_pipeline",
    f"""{_P07_PREFIX},
    {_P07_TRAIN_CTES},
    fstate AS (SELECT w, CAST(count(*) AS BIGINT) AS n_syms
               FROM v{_T24_ROUNDS} GROUP BY w),
    mrg AS ({_P07_MRG_UNION}),
    msig AS (SELECT CAST(coalesce(sum(rank * ('0x' || substr(
                   md5(sym_a || '>' || sym_b), 1, 8))::BIGINT), 0)
                   AS BIGINT) AS merge_sig,
                 CAST(count(*) AS BIGINT) AS n_merges
             FROM mrg),
    vocc AS (SELECT sel.source, c.tok
             FROM cov2 c JOIN sel ON sel.doc_id = c.doc_id
             WHERE c.covered = 0),
    bagg AS (SELECT v.source, CAST(sum(f.n_syms) AS BIGINT)
                      AS bpe_tok_total
             FROM vocc v JOIN fstate f ON f.w = v.tok GROUP BY v.source),
    nin AS (SELECT source, CAST(count(*) AS BIGINT) AS n_in
            FROM documents GROUP BY source)
    SELECT nin.source, nin.n_in,
           CAST(coalesce(q.n_source, 0) AS BIGINT) AS n_surv,
           CAST(coalesce(q.quota, 0) AS BIGINT) AS quota,
           CAST(coalesce(pagg.n_selected, 0) AS BIGINT) AS n_selected,
           CAST(coalesce(pagg.sel_sig, 0) AS BIGINT) AS sel_sig,
           CAST(coalesce(pagg.kept_tok_total, 0) AS BIGINT)
             AS kept_tok_total,
           CAST((coalesce(pagg.kept_tok_total, 0) + 511) // 512 AS BIGINT)
             AS n_packs,
           CAST(coalesce(pagg.n_crossers, 0) AS BIGINT) AS n_crossers,
           CAST(coalesce(bagg.bpe_tok_total, 0) AS BIGINT)
             AS bpe_tok_total,
           msig.merge_sig, msig.n_merges
    FROM nin LEFT JOIN q ON q.source = nin.source
             LEFT JOIN pagg ON pagg.source = nin.source
             LEFT JOIN bagg ON bagg.source = nin.source
             CROSS JOIN msig
    """,
    survey="north-star capstone #4 (VERDICT r10 task 4): the TRUE "
    "train→curate→encode tokenizer lifecycle — p06 encoded under the "
    "LITERAL 12-merge table; here the d20 survivors' kept tokens ARE "
    "the training corpus: t24's iterative trainer (8 rounds, "
    "bpe_train_rows) learns the merge table from the cleaned corpus, "
    "and t23's word-cache encoder encodes the quota-selected docs "
    "under THAT trained table. Adds the trained-table audit columns: "
    "merge_sig (Σ rank · md5-hash32 of 'sym_a>sym_b' — order- and "
    "content-sensitive) and n_merges. ENCODE/TRAIN CONSISTENCY IS THE "
    "ORACLE GATE: the Spark side genuinely ENCODES (Arrow kernel "
    "applying the trained merges per distinct token) while the DuckDB "
    "side derives token counts from the TRAINER's final state v8 — "
    "the two agree iff applying the trained table reproduces the "
    "trainer's final tokenization (the t24 consistency theorem), so "
    "every driver run re-proves the theorem cross-engine over the "
    "real corpus. Oracle composition: p06's verified curation chain "
    "spliced verbatim + t24's verified relational trainer CTEs over "
    "the survivor corpus.",
    note="Scale: identical exchange structure to p06 plus the trainer "
    "rounds, which run on the PERSISTED survivor vocabulary "
    "(Heaps-law small; at most two states cached, r10 ADVICE "
    "discipline) — the corpus is scanned once for word frequencies "
    "and once for the curation chain; the per-round max-pair collect "
    "is the quota-seed class. Training happens at plan-CONSTRUCTION "
    "time (the seed-collect idiom at trainer scale): fn(spark, "
    "sf_dir) runs the trainer eagerly, then returns the lazy "
    "curate+encode plan parameterized by the trained literals.",
)
def p07_trained_tokenizer_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Span-removal -> TRAIN BPE on survivors -> quota mixing ->
    packing -> encode under the trained table, audited per source
    shard + trained-table signature columns."""
    import hashlib

    from ..functions.text import bpe_encode_vocab, bpe_train_rows
    from .q_extensions9 import _p06_curation_stages

    (docs,) = _ctx(spark, sf_dir, "documents")
    # materialize the survivors once (optimization r11): the trainer
    # phase and the final curate+encode plan both consume the d20
    # chain — see _p06_curation_stages
    surv, q, sel, pagg, nin = _p06_curation_stages(
        docs, materialize_surv=True
    )
    words = (
        surv.select(F.explode("kept_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rows = bpe_train_rows(words, rounds=_T24_ROUNDS)
    merges = [(a, b) for (_r, a, b, _pc, _nm, _nt) in rows]
    merge_sig = sum(
        r * int(hashlib.md5(f"{a}>{b}".encode()).hexdigest()[:8], 16)
        for (r, a, b, _pc, _nm, _nt) in rows
    )
    occ = sel.select("source", F.explode("kept_toks").alias("tok"))
    enc = bpe_encode_vocab(occ.select("tok").distinct(), merges)
    bagg = occ.join(enc, "tok").groupBy("source").agg(
        F.sum("n_syms").cast("long").alias("bpe_tok_total")
    )
    z = F.lit(0).cast("long")
    return (
        nin.join(
            q.select(
                "source",
                F.col("n_source").cast("long").alias("n_surv"),
                F.col("quota").cast("long").alias("quota"),
            ),
            "source",
            "left",
        )
        .join(pagg, "source", "left")
        .join(bagg, "source", "left")
        .select(
            "source",
            "n_in",
            F.coalesce("n_surv", z).alias("n_surv"),
            F.coalesce("quota", z).alias("quota"),
            F.coalesce("n_selected", z).alias("n_selected"),
            F.coalesce("sel_sig", z).alias("sel_sig"),
            F.coalesce("kept_tok_total", z).alias("kept_tok_total"),
            F.expr("(coalesce(kept_tok_total, 0) + 511) div 512")
            .cast("long")
            .alias("n_packs"),
            F.coalesce("n_crossers", z).alias("n_crossers"),
            F.coalesce("bpe_tok_total", z).alias("bpe_tok_total"),
            F.lit(int(merge_sig)).cast("long").alias("merge_sig"),
            F.lit(len(rows)).cast("long").alias("n_merges"),
        )
    )
