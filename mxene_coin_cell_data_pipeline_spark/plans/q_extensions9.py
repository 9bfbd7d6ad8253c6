"""Extension wave 11 — round 10:

- s13: PQ asymmetric-distance (ADC) top-k retrieval — the SEARCH stage
  completing s11's code-assignment map stage (compressed ANN end to
  end), with dual recall audits vs the exact-L2 and exact-cosine
  rankings
- m12: video-level near-dup via keyframe pHash composition (m09's
  scene-cut keyframing over real AVI containers of real PPM frames +
  m11's fixed-point DCT pHash + the shared star-capped hamming band
  machinery, aggregated to a bounded per-video-pair audit)
- t24: iterative BPE merge TRAINING (t19 unrolled — select the max
  adjacent-pair merge, apply it to the vocabulary, recount; emits the
  rank-ordered merge table t23-style encoding consumes)
- p06: the wave-10 capstone chain (d20 span removal → o18 quota
  mixing → o15 packing-style accounting → t23 encoding) as ONE lazy
  audited plan

Importing this module REGISTERS its queries (oracle SQL inline);
plans/queries.py imports it after q_extensions8.
"""

from __future__ import annotations

from ..checkpoint import durable_checkpoint
from pyspark.sql import DataFrame, SparkSession, functions as F

from ._registry import QUERIES, _ctx, _register

# ---------------------------------------------------------------------------
# s13: PQ ADC top-k retrieval (the compressed-ANN search stage)
# ---------------------------------------------------------------------------

_S13_M, _S13_K, _S13_TOPK = 4, 4, 10
#: fixture embedding dimensionality (TESTDATA.md: embeddings.embedding
#: is a 64-float array at every SF) — the oracle derives every
#: subspace constant from THIS + _S13_M/_S13_K (r10 ADVICE: the
#: constants were previously hardcoded in two places), exactly as the
#: engine derives sub = dim // m at runtime.
_S13_DIM = 64
_S13_SUB = _S13_DIM // _S13_M


def _s13_slice(expr: str, s: str = "s.s") -> str:
    """DuckDB 1-based inclusive slice of subspace ``s`` (width
    _S13_SUB) of a list expression."""
    return f"{expr}[{s}*{_S13_SUB}+1 : {s}*{_S13_SUB}+{_S13_SUB}]"


def _s13_sqdist(a: str, b: str, s: str = "s.s") -> str:
    """Expanded ||a_s − b_s||² over subspace ``s`` — dot(a,a) −
    2·dot(a,b) + dot(b,b), every term a sequential fold."""
    asl, bsl = _s13_slice(a, s), _s13_slice(b, s)
    return (
        f"list_dot_product({asl}, {asl})"
        f" - 2 * list_dot_product({asl}, {bsl})"
        f" + list_dot_product({bsl}, {bsl})"
    )


#: s11's code-assignment CTE fragment (verbatim semantics: per-subspace
#: expanded squared distance, ties to the smaller code), pivoted to one
#: row per vector — the query vector itself (vec_id 0) excluded from
#: the searched corpus.
_S13_CODES_PIVOT = ",\n                     ".join(
    f"max(CASE WHEN s = {s} THEN code END) AS c{s}" for s in range(_S13_M)
)
_S13_CODES_CTES = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS code, e AS c FROM e WHERE vec_id < {_S13_K}),
    q AS (SELECT e AS qv FROM e WHERE vec_id = 0),
    d AS (
      SELECT e.vec_id, s.s, cent.code,
             {_s13_sqdist("e.e", "cent.c")} AS dist
      FROM e, (SELECT unnest(generate_series(0, {_S13_M - 1})) AS s) s, cent
      WHERE e.vec_id <> 0),
    a AS (SELECT vec_id, s, code,
                 row_number() OVER (PARTITION BY vec_id, s
                                    ORDER BY dist, code) AS rn
          FROM d),
    codes AS (SELECT vec_id,
                     {_S13_CODES_PIVOT}
              FROM a WHERE rn = 1 GROUP BY vec_id),
    lut AS (SELECT s.s, cent.code,
                   {_s13_sqdist("q.qv", "cent.c")} AS ld
            FROM q, (SELECT unnest(generate_series(0, {_S13_M - 1})) AS s) s,
                 cent)
"""

_S13_LUTP = ",\n                 ".join(
    f"max(CASE WHEN s = {s} AND code = {c} THEN ld END) AS l{s}_{c}"
    for s in range(_S13_M)
    for c in range(_S13_K)
)
# the 4-term ADC sum, parenthesized terms added left to right —
# mirrors the Spark t0+t1+t2+t3 fold exactly
_S13_ADC = " + ".join(
    "(CASE v.c%d %s ELSE l.l%d_%d END)"
    % (
        s,
        " ".join(f"WHEN {c} THEN l.l{s}_{c}" for c in range(_S13_K - 1)),
        s,
        _S13_K - 1,
    )
    for s in range(_S13_M)
)


@_register(
    "s13_pq_adc_topk",
    f"""
    WITH {_S13_CODES_CTES.strip()},
    lutp AS (SELECT {_S13_LUTP}
             FROM lut),
    adc AS (SELECT v.vec_id,
                   CAST(round(({_S13_ADC}) * 1e9) AS BIGINT) AS adc_nanos
            FROM codes v, lutp l),
    exact AS (SELECT e.vec_id,
                     CAST(round((list_dot_product(e.e, e.e)
                          - 2 * list_dot_product(e.e, q.qv)
                          + list_dot_product(q.qv, q.qv)) * 1e9) AS BIGINT)
                       AS l2_nanos,
                     CAST(round((list_dot_product(e.e, q.qv)
                       / (sqrt(list_dot_product(e.e, e.e))
                          * sqrt(list_dot_product(q.qv, q.qv)))) * 1e9)
                       AS BIGINT) AS cos_nanos
              FROM e, q WHERE e.vec_id <> 0),
    l2top AS (SELECT vec_id FROM exact ORDER BY l2_nanos, vec_id LIMIT 10),
    costop AS (SELECT vec_id FROM exact
               ORDER BY cos_nanos DESC, vec_id LIMIT 10)
    SELECT t.vec_id, t.adc_nanos,
           CASE WHEN t.vec_id IN (SELECT vec_id FROM l2top)
                THEN 1 ELSE 0 END AS in_exact_l2_topk,
           CASE WHEN t.vec_id IN (SELECT vec_id FROM costop)
                THEN 1 ELSE 0 END AS in_exact_cos_topk
    FROM (SELECT vec_id, adc_nanos FROM adc
          ORDER BY adc_nanos, vec_id LIMIT {_S13_TOPK}) t
    """,
    survey="north-star similarity completion: PQ asymmetric-distance "
    "(ADC) top-k retrieval — the SEARCH stage s11's code assignment "
    "was half of (Jégou et al., TPAMI 2011 §IV.A). A per-query lookup "
    "table lut[s][c] = ||q_s − centroid_{{s,c}}||² (m·k doubles, "
    "computed driver-side from the collected seeds + query and inlined "
    "as literals) turns every database vector's approximate distance "
    "into m element_at lookups over its code bytes plus 3 adds — a "
    "pure scan over the compressed codes, no vector arithmetic per "
    "row, then TakeOrdered top-k pushdown. Dual recall audit in-query "
    "(the s09 discipline): membership flags vs the exact squared-L2 "
    "top-k (the metric ADC approximates — isolates quantization loss; "
    "sum = recall@k·k) AND vs the exact cosine top-k (brackets metric "
    "mismatch). Exact rankings order on the round(·1e9) int64 grid "
    "with vec_id tie-breaks; every float fold is sequential "
    "left-to-right on both engines.",
    note="Plan pin (tests/test_plan_shapes.py): no join wider than the "
    "10-row membership broadcasts, TakeOrderedAndProject present, "
    "codes derived by the s11 pure-scan assignment.",
)
def s13_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 through the PQ codes with exact-L2 / exact-cosine
    recall flags (see functions.similarity.pq_adc_topk)."""
    from ..functions.similarity import pq_adc_topk

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb, query_vec_id=0, m=_S13_M, k=_S13_K, topk=_S13_TOPK
    )


# ---------------------------------------------------------------------------
# t24: iterative BPE merge TRAINING (t19 unrolled over evolving symbols)
# ---------------------------------------------------------------------------

_T24_ROUNDS = 8


def _t24_oracle(rounds: int = _T24_ROUNDS) -> str:
    """Per-round CTE chain (the _closure_audit_oracle generation
    pattern): round r counts adjacent-symbol pairs over v{r-1} (one
    row per (word, pos, sym) — the evolving vocabulary state), picks
    the max via ORDER BY n DESC, sa, sb LIMIT 1, marks leftmost
    non-overlapping application sites with the gaps-and-islands parity
    rule (a matching position starts a merge iff its offset inside its
    island of CONSECUTIVE matching positions is even — islands larger
    than one element exist only for sa == sb runs; for sa != sb every
    match is a singleton island, parity 0, so the rule is universal),
    and rebuilds v{r} by dropping the swallowed successor positions.
    Every v{r}/s{r}/b{r} is MATERIALIZED — each is referenced several
    times downstream and DuckDB would otherwise inline the chain
    exponentially (the d06 lesson). An empty b{r} (no pairs left)
    yields an empty audit row and an unchanged v{r} via the LEFT JOIN
    ON TRUE, mirroring the engine's loop break."""
    ctes = [
        "toksw AS MATERIALIZED (SELECT u.tok AS w, count(*) AS cnt "
        "FROM documents, LATERAL (SELECT unnest(regexp_extract_all("
        "lower(text), '[a-z0-9]+')) AS tok) u WHERE u.tok <> '' "
        "GROUP BY u.tok)",
        _T24_V0_CTE,
    ] + _t24_round_ctes(rounds)
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM a{r}" for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n    {union}"


#: v0 from any toksw(w, cnt) CTE — the character-split starting state
_T24_V0_CTE = (
    "v0 AS MATERIALIZED (SELECT w, cnt, u.pos, u.sym FROM toksw, "
    "LATERAL (SELECT unnest(string_split(w, '')) AS sym, "
    "generate_subscripts(string_split(w, ''), 1) AS pos) u)"
)


def _t24_round_ctes(rounds: int) -> list[str]:
    """The per-round trainer CTEs (p{r}/b{r}/m{r}/s{r}/v{r}/a{r}),
    referencing v0 — extracted so p07 can run the SAME relational
    trainer over a different training corpus (the d20 survivors)."""
    ctes: list[str] = []
    for r in range(1, rounds + 1):
        p = f"v{r - 1}"
        ctes.append(
            f"p{r} AS (SELECT x.sym AS sa, y.sym AS sb, sum(x.cnt) AS n\n"
            f"  FROM {p} x JOIN {p} y ON y.w = x.w AND y.pos = x.pos + 1\n"
            f"  GROUP BY x.sym, y.sym)"
        )
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT sa, sb, n FROM p{r}\n"
            f"  ORDER BY n DESC, sa, sb LIMIT 1)"
        )
        ctes.append(
            f"m{r} AS (SELECT v.w, v.cnt, v.pos, v.sym, b.sa AS msa,\n"
            f"    b.sb AS msb,\n"
            f"    CASE WHEN v.sym = b.sa AND lead(v.sym) OVER\n"
            f"      (PARTITION BY v.w ORDER BY v.pos) = b.sb\n"
            f"    THEN 1 ELSE 0 END AS ism\n"
            f"  FROM {p} v LEFT JOIN b{r} b ON TRUE)"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT *,\n"
            f"    CASE WHEN ism = 1 AND (pos - min(pos) OVER\n"
            f"      (PARTITION BY w, grp)) % 2 = 0 THEN 1 ELSE 0 END AS strt\n"
            f"  FROM (SELECT *, CASE WHEN ism = 1 THEN pos - row_number()\n"
            f"      OVER (PARTITION BY w, ism ORDER BY pos) END AS grp\n"
            f"    FROM m{r}))"
        )
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT w, cnt,\n"
            f"    row_number() OVER (PARTITION BY w ORDER BY pos) AS pos,\n"
            f"    CASE WHEN strt = 1 THEN msa || msb ELSE sym END AS sym\n"
            f"  FROM (SELECT *, coalesce(lag(strt) OVER\n"
            f"      (PARTITION BY w ORDER BY pos), 0) AS pstrt FROM s{r})\n"
            f"  WHERE pstrt = 0)"
        )
        ctes.append(
            f"a{r} AS (SELECT CAST({r} AS BIGINT) AS rank, b.sa AS sym_a,\n"
            f"    b.sb AS sym_b, CAST(b.n AS BIGINT) AS pair_count,\n"
            f"    (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT)\n"
            f"     FROM s{r} WHERE strt = 1) AS n_merged,\n"
            f"    (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT)\n"
            f"     FROM v{r}) AS n_tokens_after\n"
            f"  FROM b{r} b)"
        )
    return ctes


@_register(
    "t24_bpe_train_merges",
    _t24_oracle(),
    survey="north-star text completion: iterative BPE merge TRAINING — "
    "t19 computed ONE round's pair statistic; this unrolls the full "
    "trainer loop (Sennrich et al., arXiv:1508.07909) over the EVOLVING "
    "symbol sequences: count frequency-weighted adjacent pairs "
    "(overlapping — the zip(word, word[1:]) statistic), select max "
    "(ties -> lexicographically smaller pair), apply at leftmost "
    "non-overlapping sites, recount. Emits the rank-ordered merge "
    "table t23's encoder consumes, closing the tokenizer lifecycle "
    "t15 (pre-tokenize) -> t24 (train) -> t23 (encode), plus a "
    "per-round audit: pair_count, n_merged (applied occurrences x "
    "frequency — differs from pair_count exactly on a==b overlap "
    "runs), n_tokens_after (the compression trajectory). Oracle: "
    "per-round CTE chain with relational leftmost-non-overlap apply "
    "(gaps-and-islands parity rule). Scale: ONE corpus pass (the "
    "word-frequency aggregate); every round is vocab-sized (Heaps' "
    "law) with persisted state — the g01/g02 unrolled-iteration "
    "pattern; the max-pair collect per round is the quota-seed class "
    "of tiny driver collects.",
    note="Encode/train consistency (bpe_apply_merges under the trained "
    "table reproduces the trainer's final tokenization) is pinned by "
    "tests/test_wave11.py; the pure-Python trainer differential "
    "(bpe_train_merges_py) runs in the same test module.",
)
def t24_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-ordered trained merge table + per-round audit (see
    functions.text.bpe_train_merges)."""
    from ..functions.text import bpe_train_merges

    (docs,) = _ctx(spark, sf_dir, "documents")
    return bpe_train_merges(docs, rounds=_T24_ROUNDS)


# ---------------------------------------------------------------------------
# m12: video-level near-dup via keyframe pHash composition
# ---------------------------------------------------------------------------

from ..functions.multimodal import COS14  # noqa: E402


def _m12_sample_sql(alias: str, s: str, rep: str, j: str) -> str:
    """Closed-form SQL for ONE sample value of with_avi_ppm_pair_payload
    — first md5 byte of "{g}:{s}:{j}" (the m10 strpos-over-hex form)
    plus the rep-frame (+1 at j=0) and odd-sibling (+1 at j=1 in scene
    0) perturbations, mod 256. Parameterized over the row alias and the
    scene/rep/sample-index expressions so the SAME generator emits the
    current frame, the PREVIOUS frame (s=(k-1)//2, rep=(k-1)%2 of the
    same row — no self-join), and the three channel samples of a grid
    cell. This join-free restatement replaced a 300M-row sample
    self-join + list pivot measured into DuckDB DISK EXHAUSTION at
    100x (966s, crash kept in /tmp/sweep100x_r10.jsonl — the m11
    cos-table lesson at video scale)."""
    md5 = (
        f"md5(CAST({alias}.g AS VARCHAR) || ':' || CAST({s} AS VARCHAR)"
        f" || ':' || CAST({j} AS VARCHAR))"
    )
    return (
        f"((((strpos('0123456789abcdef', substr({md5}, 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr({md5}, 2, 1)) - 1))"
        f" + CASE WHEN {rep} = 1 AND {j} = 0 THEN 1 ELSE 0 END"
        f" + CASE WHEN {alias}.doc_id % 2 = 1 AND {s} = 0 AND {j} = 1"
        f" THEN 1 ELSE 0 END) % 256)"
    )


_M12_CUR = _m12_sample_sql("fr", "fr.s", "fr.rep", "u.j")
_M12_PRV = _m12_sample_sql("fr", "((fr.k - 1) // 2)", "((fr.k - 1) % 2)", "u.j")
_M12_PIX = "(3 * ((rr.r * fr.h // 8) * fr.w + (cc.c * fr.w // 8)))"
_M12_CELL = " + ".join(
    f"{coef} * {_m12_sample_sql('fr', 'fr.s', 'fr.rep', f'({_M12_PIX} + {ch})')}"
    for ch, coef in enumerate((299, 587, 114))
)

#: Shared CTE prefix re-deriving with_avi_ppm_pair_payload's sample
#: streams down to the per-video keyframe index — (doc_id, k) frames,
#: consecutive-frame sample diffs (BOTH frames' values derived
#: closed-form per row, so there is no sample self-join and no
#: materialized sample relation — streaming expressions + one
#: group-by), the integer scene-cut predicate, and kf_idx/n_kf. The
#: only structural bound is the generator's own 3wh ≤ 360 (w ≤ 8,
#: h ≤ 5 closed-form), expressed as a LATERAL generate_series over the
#: per-row 3wh — no corpus cap.
_M12_KF_CTES = f"""
      WITH d AS (SELECT doc_id, doc_id // 2 AS g,
                        3 + (doc_id // 2) % 6 AS w,
                        2 + (doc_id // 2) % 4 AS h,
                        2 + (doc_id // 2) % 2 AS ns
                 FROM documents),
      fr AS (SELECT d.doc_id, d.g, d.w, d.h, sc2.s, rp.rep,
                    sc2.s * 2 + rp.rep AS k
             FROM d,
                  (SELECT unnest(generate_series(0, 2)) AS s) sc2,
                  (SELECT unnest(generate_series(0, 1)) AS rep) rp
             WHERE sc2.s < d.ns),
      dfr AS (SELECT fr.doc_id, fr.k,
                     sum(abs({_M12_CUR} - {_M12_PRV})) AS diff,
                     count(*) AS m
              FROM fr, LATERAL (SELECT unnest(generate_series(
                                0, 3 * fr.w * fr.h - 1)) AS j) u
              WHERE fr.k >= 1
              GROUP BY fr.doc_id, fr.k),
      kfl AS (SELECT f.doc_id, f.k,
                     CASE WHEN f.k = 0 OR 4 * d2.diff >= 255 * d2.m
                          THEN 1 ELSE 0 END AS is_key
              FROM (SELECT doc_id, k FROM fr) f
              LEFT JOIN dfr d2 ON d2.doc_id = f.doc_id AND d2.k = f.k),
      kfi AS (SELECT doc_id, k,
                     row_number() OVER (PARTITION BY doc_id ORDER BY k)
                       - 1 AS kf_idx,
                     count(*) OVER (PARTITION BY doc_id) AS n_kf
              FROM kfl WHERE is_key = 1)
"""

#: AGGREGATE-form DCT: d[u][v] = Σ_{{r,c}} luma(r,c)·COS14[u][r]·COS14[v][c]
#: as 64 SUM aggregates over the cell rows — the same int64s as the
#: kernel's separable two-pass form (the double sum is its expansion;
#: every partial is |·| ≤ 2^53, far under int64). WHY not the m11
#: unrolled list form: under DuckDB 1.0's CTE materializer the
#: list-pivot + 64-wide projection chain balloons virtual address
#: space ~1.5GB/s until HOST malloc fails (measured at 100×: crash at
#: ~100s with only ~22GB RSS and 122GB free, whatever the
#: memory_limit); the aggregate form runs the identical math through
#: one streaming hash aggregate — 48s / 4.6GB at 100×, fingerprints
#: verified identical (577,982 distinct on both forms).
_M12_CASE_R = [
    "CASE r " + " ".join(f"WHEN {r} THEN {COS14[u][r]}" for r in range(8))
    + " END"
    for u in range(8)
]
_M12_CASE_C = [
    "CASE c " + " ".join(f"WHEN {c} THEN {COS14[v][c]}" for c in range(8))
    + " END"
    for v in range(8)
]
_M12_DCT_AGGS = ",\n               ".join(
    f"SUM(luma * ({_M12_CASE_R[u]}) * ({_M12_CASE_C[v]})) AS d{u}_{v}"
    for u in range(8)
    for v in range(8)
)
_M12_SAC = " + ".join(
    f"d{u}_{v}" for u in range(8) for v in range(8) if (u, v) != (0, 0)
)
_M12_BITS = " || ".join(
    "'0'"
    if (u, v) == (0, 0)
    else f"(CASE WHEN 63 * d{u}_{v} > s THEN '1' ELSE '0' END)"
    for u in range(8)
    for v in range(8)
)

# the d13 band/refine machinery generated FLAT for bits=64, n_bands=4,
# cap=64, hamming<=3 (the same loops as q_dedup_pairs._d13_oracle —
# m12 cannot nest its fingerprint derivation inside that template's
# sh CTE, see the note there). sh/ann are MATERIALIZED: each is
# referenced more than once downstream.
_M12_WORDS = []
for _i in range(2):
    _val = " + ".join(
        f"(CASE WHEN substr(simhash_bits, {_i * 32 + _j + 1}, 1) = '1' "
        f"THEN {1 << (31 - _j)} ELSE 0 END)"
        for _j in range(32)
    )
    _M12_WORDS.append(f"({_val}) AS w{_i}")
_M12_WORDS_SEL = ", ".join(_M12_WORDS)
_M12_HAM = "bit_count(xor(w0a, w0b)) + bit_count(xor(w1a, w1b))"

_M12_BAND_CTES = f"""
      v AS (SELECT doc_id, simhash_bits, {_M12_WORDS_SEL} FROM sh),
      bnd AS (SELECT doc_id, u.j,
                     substr(simhash_bits, u.j * 16 + 1, 16) AS band
              FROM v, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) u),
      ann AS MATERIALIZED (
        SELECT doc_id, j, band,
               count(*) OVER (PARTITION BY j, band) AS m,
               min(doc_id) OVER (PARTITION BY j, band) AS mn
        FROM bnd),
      prs AS (SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
        FROM ann a JOIN ann b2 ON a.j = b2.j AND a.band = b2.band
                               AND a.doc_id < b2.doc_id
        WHERE a.m <= 64
        UNION ALL
        SELECT mn AS doc_a, doc_id AS doc_b FROM ann
        WHERE m > 64 AND doc_id <> mn)),
      cnd AS (SELECT p.doc_a, p.doc_b, va.w0 AS w0a, va.w1 AS w1a,
                     vb.w0 AS w0b, vb.w1 AS w1b
              FROM prs p JOIN v va ON va.doc_id = p.doc_a
                         JOIN v vb ON vb.doc_id = p.doc_b),
      fpairs AS (SELECT doc_a, doc_b FROM cnd WHERE {_M12_HAM} <= 3)
"""


@_register(
    "m12_video_phash_neardup",
    f"""
    {_M12_KF_CTES.strip()},
      kfr AS (SELECT fr.doc_id, fr.g, fr.w, fr.h, fr.s, fr.rep, fr.k,
                     i.kf_idx, i.n_kf
              FROM fr JOIN kfi i ON i.doc_id = fr.doc_id AND i.k = fr.k),
      cl AS (SELECT fr.doc_id, fr.k, fr.kf_idx, fr.n_kf, rr.r, cc.c,
                    {_M12_CELL} AS luma
             FROM kfr fr,
                  (SELECT unnest(generate_series(0, 7)) AS r) rr,
                  (SELECT unnest(generate_series(0, 7)) AS c) cc),
      dct AS (SELECT doc_id, k, kf_idx, n_kf,
               {_M12_DCT_AGGS}
              FROM cl GROUP BY doc_id, k, kf_idx, n_kf),
      scc AS (SELECT *, ({_M12_SAC}) AS s FROM dct),
      sh AS MATERIALIZED (
        SELECT (doc_id * 8 + kf_idx) * 8 + n_kf AS doc_id,
               ({_M12_BITS}) AS simhash_bits
        FROM scc),
      {_M12_BAND_CTES.strip()},
    ag AS (SELECT doc_a // 64 AS video_a, doc_b // 64 AS video_b,
                  count(DISTINCT doc_a // 8) AS na,
                  count(DISTINCT doc_b // 8) AS nb,
                  max(doc_a % 8) AS n_kf_a, max(doc_b % 8) AS n_kf_b
           FROM fpairs WHERE doc_a // 64 < doc_b // 64
           GROUP BY doc_a // 64, doc_b // 64)
    SELECT video_a, video_b,
           CAST(n_kf_a AS BIGINT) AS n_kf_a,
           CAST(n_kf_b AS BIGINT) AS n_kf_b,
           CAST(na AS BIGINT) AS n_matched_a,
           CAST(nb AS BIGINT) AS n_matched_b
    FROM ag WHERE 2 * na >= n_kf_a AND 2 * nb >= n_kf_b
    """,
    survey="north-star multimodal capstone: VIDEO-level near-dup — the "
    "m09 × m11 composition the pieces existed for: genuinely parsed "
    "AVI containers of genuinely parsed PPM frames, scene-cut "
    "keyframing on the DECODED sample streams (integer predicate "
    "4·diff ≥ 255·m — m09's container-byte diff moved to pixels, "
    "where real scene-cut detectors operate; frame 0 always a scene "
    "start), m11's fixed-point COS14 DCT pHash per keyframe, then the "
    "SHARED star-capped hamming band machinery over composite frame "
    "ids ((doc_id·8 + kf_idx)·8 + n_kf — collision-free and "
    "self-describing: video = fid DIV 64, keyframe = fid DIV 8, "
    "n_kf = fid % 8; n_frames ≤ 6 is the generator's closed form, not "
    "a corpus cap — so the per-video keyframe COUNT rides the pair "
    "stream and the kernel output needs neither a persist nor a "
    "second pass), aggregated to a bounded per-video-pair audit: a "
    "pair is a "
    "near-dup when ≥ HALF of EACH video's keyframes have a hamming-≤3 "
    "partner in the other (n_kf_a/b, n_matched_a/b reported — the "
    "match-fraction evidence). Sibling payloads (content keyed by "
    "doc_id//2; the odd sibling perturbs one sample of scene 0 in "
    "every frame) plant genuine video near-dups the single-sample "
    "pHash robustness must keep connected.",
    note="REGISTERED CAPPED from birth (bucket_cap=64, the m10/m11 "
    "lesson — perceptual bands on small frames are low-entropy). The "
    "codec kernel runs ONCE: n_kf is encoded in the low 3 bits of the "
    "composite frame id so the audit adds no second kernel TYPE, and "
    "the shared band machinery persists the compact fingerprint table "
    "(optimization r11 — the fully-lazy form re-executed the kernel "
    "under five plan subtrees; plan-pinned: kernel count matches m11, "
    "single cached fingerprint relation).",
)
def m12_video_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video pairs whose keyframe fingerprint sets mutually match on
    ≥ half their keyframes (see functions.multimodal.avi_keyframe_phash
    + functions.dedup.hamming_pairs_from_bits)."""
    from ..functions.dedup import hamming_pairs_from_bits
    from ..functions.multimodal import (
        avi_keyframe_phash,
        with_avi_ppm_pair_payload,
    )
    from ..sources.tables import scale_out

    (docs,) = _ctx(spark, sf_dir, "documents")
    # scale_out: the codec kernel parses the whole container per row —
    # single-row-group layouts would run it as ONE task (m10's lesson)
    kf = avi_keyframe_phash(
        with_avi_ppm_pair_payload(scale_out(docs.select("doc_id"), "doc_id"))
    )
    # composite frame id: video DIV 64, keyframe DIV 8, n_kf in the low
    # 3 bits (n_frames <= 6 by the generator's closed form) — the
    # per-video count rides the pair stream, so ONE lazy kernel pass
    fp = kf.select(
        (
            (F.col("doc_id") * 8 + F.col("kf_idx")) * 8 + F.col("n_kf")
        ).alias("doc_id"),
        "phash_bits",
    )
    pairs = hamming_pairs_from_bits(
        fp, bits_col="phash_bits", bits=64, max_hamming=3, n_bands=4,
        bucket_cap=64,
    )
    ag = (
        pairs.select(
            F.expr("doc_a DIV 64").alias("video_a"),
            F.expr("doc_b DIV 64").alias("video_b"),
            F.expr("doc_a DIV 8").alias("kfid_a"),
            F.expr("doc_b DIV 8").alias("kfid_b"),
            F.expr("doc_a % 8").alias("nk_a"),
            F.expr("doc_b % 8").alias("nk_b"),
        )
        .filter(F.col("video_a") < F.col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(
            F.countDistinct("kfid_a").cast("long").alias("n_matched_a"),
            F.countDistinct("kfid_b").cast("long").alias("n_matched_b"),
            F.max("nk_a").cast("long").alias("n_kf_a"),
            F.max("nk_b").cast("long").alias("n_kf_b"),
        )
    )
    return ag.filter(
        (2 * F.col("n_matched_a") >= F.col("n_kf_a"))
        & (2 * F.col("n_matched_b") >= F.col("n_kf_b"))
    ).select(
        "video_a", "video_b", "n_kf_a", "n_kf_b",
        "n_matched_a", "n_matched_b",
    )


# ---------------------------------------------------------------------------
# p06: the wave-10 capstone — span removal -> quota mix -> pack -> encode
# ---------------------------------------------------------------------------

from .q_extensions8 import (  # noqa: E402
    _D20_CTES,
    _T23_ANY,
    _T23_APPLY,
    _T23_NONE,
    _T23_POS,
)


@_register(
    "p06_tokenizer_corpus_pipeline",
    f"""
    WITH RECURSIVE {_D20_CTES},
    kept AS (SELECT doc_id, CAST(sum(1 - covered) AS BIGINT) AS n_kept
             FROM cov2 GROUP BY doc_id HAVING sum(1 - covered) > 0),
    surv AS (SELECT k.doc_id, d2.source, k.n_kept
             FROM kept k JOIN documents d2 USING (doc_id)),
    cnts AS (SELECT source, count(*) AS n_source FROM surv GROUP BY source),
    wq AS (SELECT source, CAST(n_source AS BIGINT) AS n_source,
                  CAST(floor(sqrt(CAST(n_source AS DOUBLE))) AS BIGINT) AS w
           FROM cnts),
    tq AS (SELECT CAST(sum(n_source) AS BIGINT) AS N,
                  CAST(sum(w) AS BIGINT) AS S FROM wq),
    q0 AS (SELECT wq.source, wq.n_source, wq.w, (t.N // 5) AS B,
                  ((t.N // 5) * wq.w) // t.S AS base,
                  ((t.N // 5) * wq.w) % t.S AS rem
           FROM wq CROSS JOIN tq t),
    q AS (SELECT source, n_source, w,
                 base + CASE WHEN row_number()
                                  OVER (ORDER BY rem DESC, source)
                             <= B - CAST(sum(base) OVER () AS BIGINT)
                        THEN 1 ELSE 0 END AS quota
          FROM q0),
    rk AS (SELECT s.source, s.doc_id, s.n_kept,
                  row_number() OVER (PARTITION BY s.source
                    ORDER BY md5(CAST(s.doc_id AS VARCHAR)), s.doc_id)
                    AS rank
           FROM surv s),
    sel AS (SELECT rk.source, rk.doc_id, rk.n_kept, rk.rank
            FROM rk JOIN q USING (source) WHERE rk.rank <= q.quota),
    pk AS (SELECT source, doc_id, n_kept, rank,
                  sum(n_kept) OVER (PARTITION BY source ORDER BY doc_id)
                    AS cum
           FROM sel),
    pagg AS (SELECT source,
                    CAST(count(*) AS BIGINT) AS n_selected,
                    CAST(sum(n_kept) AS BIGINT) AS kept_tok_total,
                    CAST(sum(CASE WHEN (cum - 1) // 512
                                       > (cum - n_kept) // 512
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_crossers,
                    CAST(sum(rank * ('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
                        AS BIGINT) AS sel_sig
             FROM pk GROUP BY source),
    vocc AS (SELECT sel.source, c.tok
             FROM cov2 c JOIN sel ON sel.doc_id = c.doc_id
             WHERE c.covered = 0),
    vocab AS (SELECT DISTINCT tok FROM vocc),
    enc AS (
      SELECT tok, list_transform(range(1, len(tok) + 1), i -> tok[i])
               AS syms
      FROM vocab
      UNION ALL
      SELECT tok, CASE
          {_T23_APPLY}
        END AS syms
      FROM (SELECT tok, syms,
             {_T23_POS}
            FROM enc) WHERE {_T23_ANY}
    ),
    fenc AS (
      SELECT tok, len(syms) AS n_syms
      FROM (SELECT tok, syms,
             {_T23_POS}
            FROM enc)
      WHERE {_T23_NONE}),
    bagg AS (SELECT v.source, CAST(sum(f.n_syms) AS BIGINT)
                      AS bpe_tok_total
             FROM vocc v JOIN fenc f USING (tok) GROUP BY v.source),
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
             AS bpe_tok_total
    FROM nin LEFT JOIN q ON q.source = nin.source
             LEFT JOIN pagg ON pagg.source = nin.source
             LEFT JOIN bagg ON bagg.source = nin.source
    """,
    survey="north-star capstone #3 (the wave-10 chain, VERDICT r09 "
    "task 7): the tokenizer-ready-corpus pipeline — the d20 survivor "
    "relation materializes once (optimization r11: the fully-lazy "
    "form's plan replicated the three-shuffle d20 chain under every "
    "consumer, 44 documents-scans in the physical plan) and the "
    "curation/encode stages compose lazily on it — d20 cross-document "
    "exact-substring REMOVAL (surviving "
    "tokens kept in order), o18's integer largest-remainder "
    "quota-exact temperature mixing over the SURVIVORS (per real "
    "source shard, sqrt weighting, Σ quota == survivors DIV 5 an "
    "identity), o15's per-source 512-token sequence packing of the "
    "selected docs' CLEANED token counts, and t23's BPE encode of the "
    "selected corpus (vocab-cached kernel; RECURSIVE-CTE oracle). "
    "Bounded per-source audit: docs in/survivors/quota/selected + "
    "md5-rank selection signature, kept-token total, pack count, "
    "boundary crossers, BPE token total. Stage order is the "
    "production one: the only corpus-wide exchanges are d20's three "
    "linear shuffles and the survivor-only selection/pack windows; "
    "packing stays per-shard parallel; the BPE kernel sees only the "
    "selected corpus's DISTINCT vocabulary.",
    note="Long-doc invariant: the oracle inherits d20's constant-range "
    "unnest, and the corpus guard lives in d20's own poison sentinel "
    "(registered and driver-checked every window) — a >4095-token doc "
    "fails d20 loudly before this capstone could silently diverge.",
)
def p06_tokenizer_corpus_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Span-removal -> quota mixing -> packing -> BPE encode, audited
    per source shard (the wave-10 capstone chain)."""
    from ..functions.text import bpe_encode_vocab

    (docs,) = _ctx(spark, sf_dir, "documents")
    # optimization r11: the survivor relation materializes ONCE —
    # the lazy form's plan replicated the d20 chain under every
    # consumer (44 documents-scans in the physical plan, only
    # partially deduped by AQE stage reuse); the curation/encode
    # stages still compose lazily on the materialized survivors
    surv, q, sel, pagg, nin = _p06_curation_stages(
        docs, materialize_surv=True
    )
    occ = sel.select("source", F.explode("kept_toks").alias("tok"))
    enc = bpe_encode_vocab(occ.select("tok").distinct())
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
        )
    )


def _p06_curation_stages(docs: DataFrame, materialize_surv: bool = False):
    """The shared d20-removal → quota-mix → selection → packing stages
    of the p06/p07 capstones: returns ``(surv, q, sel, pagg, nin)``
    (survivors with kept_toks, the quota relation, the selected docs,
    the packing audit aggregate, and the per-source input counts) as
    ONE lazy DAG — p06 encodes under the literal merge table, p07
    trains on the survivors first and encodes under the trained one.

    ``materialize_surv`` (p07, optimization r11): the d20 survivor
    chain (three corpus-wide shuffles) feeds BOTH the eager trainer
    phase and the final curate+encode plan — without materialization
    the chain executes once for the trainer and again (partially
    exchange-reused) for the final plan. ``localCheckpoint`` runs it
    exactly once and every consumer reads the materialized survivors
    (guide §3.3: materialize an intermediate referenced across jobs —
    one write + k reads beats k recomputes of a 3-shuffle chain at any
    scale). p06 stays fully lazy (single-plan contract, plan-pinned).
    """
    from pyspark.sql import Window

    from ..functions.dedup import crossdoc_kept_tokens
    from ..functions.sampling import integer_quotas

    st = crossdoc_kept_tokens(docs, k=8, gram_key="raw")
    kept = (
        st.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("covered") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("covered") == 0,
                        F.struct(F.col("rn_kept"), F.col("tok")),
                    )
                )
            ).alias("_kt"),
        )
        .filter(F.col("n_kept") > 0)
        .select(
            "doc_id",
            "n_kept",
            F.expr("transform(_kt, x -> x.tok)").alias("kept_toks"),
        )
    )
    surv = kept.join(docs.select("doc_id", "source"), "doc_id")
    if materialize_surv:
        surv = durable_checkpoint(surv)
    counts = surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source")
    )
    q = integer_quotas(counts, budget_den=5, weighting="sqrt")
    order = F.md5(F.col("doc_id").cast("string"))
    sw = Window.partitionBy("source").orderBy(order, F.col("doc_id"))
    sel = (
        surv.join(F.broadcast(q.select("source", "quota")), "source")
        .withColumn("rank", F.row_number().over(sw))
        .filter(F.col("rank") <= F.col("quota"))
    )
    pw = Window.partitionBy("source").orderBy("doc_id")
    pk = sel.withColumn("cum", F.sum("n_kept").over(pw))
    hash32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    pagg = pk.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.sum("n_kept").cast("long").alias("kept_tok_total"),
        F.sum(
            F.when(
                F.expr("(cum - 1) div 512") > F.expr("(cum - n_kept) div 512"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_crossers"),
        F.sum(F.col("rank") * hash32).cast("long").alias("sel_sig"),
    )
    nin = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_in")
    )
    return surv, q, sel, pagg, nin
