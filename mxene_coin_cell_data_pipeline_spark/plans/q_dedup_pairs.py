"""Near-dup pair/closure oracle queries (d06/d08/d09/d12/d13/d14),
split from q_pipeline_streaming in round 5 along family lines — zero
QUERY-behavior change; plans/queries.py imports this module
immediately after q_pipeline_streaming. Note the six queries now
register after that module's remaining entries (w07 &c), so the
definition order of NON-window queries shifts — harmless, because
the driver's correctness window is the explicit 50-name
_DRIVER_PREFIX, which is order-pinned independently of definition
order. The
all-pairs oracle queries pin ``bucket_cap=None``/``hash_fn="md5"``
explicitly (the library defaults are star-capped xxhash64 — see
functions/dedup.py); the d12/d13/d14 star-cap family is the
scale-safe production shape those defaults encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dedup import SIMHASH_BITS
from ._registry import QUERIES, _ctx, _register
from .q_northstar import _BAND_SELECTS, _JACCARD_TAIL_CAND, _MH_COLS, _SH_CTE

_D02_PAIRS_SQL = QUERIES["d02_minhash_lsh"].oracle

#: d02's pair RELATION re-derived with a row-local list-intersection
#: verify instead of the co-shingle join + aggregate. Same toks/sh/
#: sig/bands/cand candidate generation (the fragments d12's oracle
#: composes), but the verify joins each candidate to two ordered
#: shingle LISTS and tests 5*|A∩B| >= 4*(|A|+|B|-|A∩B|) — integer
#: arithmetic exactly equivalent to jaccard >= 0.8 (both sides
#: integers; a ratio of exactly 4/5 rounds to the double 0.8 and
#: passes the float form too, and any other ratio differs from 4/5 by
#: >= 1/(5*union), far beyond double rounding). Why it exists: d02's
#: registered inter aggregate expands candidates x shingles (~5e9 rows
#: at 100x) through a grouped hash table — the r08 d06 oracle run
#: filled the host's remaining ~75GB of spill disk inside that
#: aggregate. The list form streams one row per candidate against a
#: ~0.5GB build side with NO aggregate state, so the closure oracle
#: is in-sweep capable at 100x. Relation-equality to the registered
#: d02 SQL is pinned by tests/test_audit_contract.py at the test SF
#: and was verified at sf0.01+sf0.1 when landed.
_D02_PAIRS_LIST_SQL = f"""
    WITH {_SH_CTE},
    sig AS MATERIALIZED (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band = b.band
                                       AND a.bucket = b.bucket
                                       AND a.doc_id < b.doc_id),
    sets AS MATERIALIZED (
      SELECT doc_id, list(shingle ORDER BY shingle) AS s, count(*) AS n
      FROM sh GROUP BY doc_id)
    SELECT c.doc_a, c.doc_b
    FROM cand c JOIN sets a ON a.doc_id = c.doc_a
                JOIN sets b ON b.doc_id = c.doc_b
    WHERE 5 * len(list_intersect(a.s, b.s))
          >= 4 * (a.n + b.n - len(list_intersect(a.s, b.s)))
    """


def _label_chain_ctes(pair_sql: str, rounds: int) -> tuple[list[str], str]:
    """The shared hash-min label-propagation CTE chain (pairs → sym →
    l0..l{rounds}) behind the closure oracles — extracted so d21's
    quality-keeper oracle reuses the exact certified chain d06/d14 use
    (the refactor is string-identity-verified against the pre-split
    oracles). Returns (ctes, name-of-last-label-CTE)."""
    ctes = [
        f"pairs AS MATERIALIZED ({pair_sql})",
        "sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs)",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS doc_id, src AS lbl FROM sym)",
    ]
    for k in range(1, rounds + 1):
        p = f"l{k - 1}"
        ctes.append(
            f"l{k} AS MATERIALIZED (\n"
            f"  SELECT n.doc_id, least(n.lbl, coalesce(nb.mn, n.lbl),\n"
            f"                         coalesce(pj.lbl, n.lbl)) AS lbl\n"
            f"  FROM {p} n\n"
            f"  LEFT JOIN (SELECT s.src AS doc_id, min(x.lbl) AS mn\n"
            f"             FROM sym s JOIN {p} x ON x.doc_id = s.dst\n"
            f"             GROUP BY s.src) nb ON nb.doc_id = n.doc_id\n"
            f"  LEFT JOIN {p} pj ON pj.doc_id = n.lbl)"
        )
    return ctes, f"l{rounds}"


def _closure_audit_oracle(pair_sql: str, rounds: int = 12) -> str:
    """DuckDB closure-audit oracle with LINEAR state: ``rounds``
    unrolled rounds of hash-min label propagation with pointer
    jumping over the pair relation, then bounded per-group audit
    aggregates (the registered d06/d14 output — see
    functions/dedup.py:closure_audit for the contract).

    Replaces the round-5 recursive-CTE reachability oracle, whose
    intermediate is quadratic in component size (at 100x the corpus
    collapses into ~499k-doc components → ~1e11 reach rows, beyond
    DuckDB capacity — the gap tools/verify_closure_100x.py existed to
    adjudicate; that tool is now only a cross-check). Here each round
    is one edge join + group-by min plus a label-of-label shortcut
    (pointer jump), so state stays at one row per doc and the label's
    distance-to-component-minimum roughly doubles per round: 12
    rounds cover component diameters to ~4096 docs. Every l{k} is
    MATERIALIZED — it is referenced three times by l{k+1}, and DuckDB
    would otherwise inline the chain exponentially.

    ``rounds`` was cut 24 → 12 in round 10 after the phase-split
    profile (tools/profile_d06_oracle.py) MEASURED the 24-round chain
    as the 100x memory binder: DuckDB's per-thread operator state
    scales with unrolled rounds, and 24 rounds × 32 threads exhausted
    a 48GB limit in 182s, while the same pair relation (26,914,312
    pairs) closed at rounds=12/48GB in 118s (rounds=8 also converged,
    92s; the 24-round form needs threads=8 — 372s — or 80GB). The cut
    is SAFE by construction: convergence is certified per run (poison
    sentinel below), so a future corpus with component diameter
    > ~4096 fails the driver hash loudly — raise ``rounds`` (or drop
    sweep threads) if that ever fires; it cannot pass wrongly.

    Convergence is CERTIFIED, not assumed: a label is always the id
    of a same-component member and monotonically non-increasing, so
    if no edge crosses two distinct labels the labeling is exactly
    connected-components-min (the min node m has lbl(m) <= m by
    monotonicity and lbl(m) >= m because labels are member ids). The
    final CTE counts label-crossing edges and emits a poison sentinel
    row (group_id = -1) when any remain, so an unconverged oracle
    fails the driver hash loudly instead of passing wrongly.
    """
    ctes, last = _label_chain_ctes(pair_sql, rounds)
    ctes.append(
        f"bad AS (SELECT count(*) AS n FROM sym s\n"
        f"        JOIN {last} a ON a.doc_id = s.src\n"
        f"        JOIN {last} b ON b.doc_id = s.dst\n"
        f"        WHERE a.lbl <> b.lbl)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT lbl AS group_id, count(*) AS n_docs,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
           CAST(sum(((doc_id % 2147483647) * 2654435761) % 2147483647)
                AS BIGINT) AS member_sig
    FROM {last} GROUP BY lbl
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS group_id, n AS n_docs,
           CAST(NULL AS BIGINT) AS min_doc_id,
           CAST(NULL AS BIGINT) AS max_doc_id,
           CAST(NULL AS BIGINT) AS member_sig
    FROM bad WHERE n > 0
    """
    )


@_register(
    "d06_near_dup_groups",
    _closure_audit_oracle(_D02_PAIRS_LIST_SQL),
    survey="north-star dedup: transitive closure of near-dup pairs into keeper "
    "groups (distributed hash-min label propagation vs unrolled pointer-"
    "jumping label propagation in SQL), registered as bounded per-group "
    "audit aggregates",
    note="AUDIT-OUTPUT CONTRACT: the API shape is near_dup_groups' raw "
    "(doc_id, group_id) relation; the registered output is closure_audit's "
    "one-row-per-group aggregate (size, id range, exact int64 membership "
    "checksum) so the verified relation stays O(#groups) at any scale. The "
    "oracle's label propagation carries linear state per round (the round-5 "
    "recursive reachability CTE was quadratic in component size and "
    "exceeded DuckDB capacity at 100x) and certifies its own convergence "
    "with a poison sentinel row. tests/test_audit_contract.py reconciles "
    "the raw relation against the registered aggregate.",
)
def d06_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the MinHash near-dup graph, audited:
    every doc that has a duplicate gets its component's min doc_id as
    group_id (the canonical keep-first keeper); the registered output
    is one bounded audit row per group."""
    from ..functions.dedup import (
        closure_audit,
        minhash_near_dup_pairs,
        near_dup_groups,
    )

    (docs,) = _ctx(spark, sf_dir, "documents")
    # bucket_cap=None: the oracle propagates over the exact all-pairs
    # LSH pair set (library default is star-capped).
    return closure_audit(
        near_dup_groups(
            minhash_near_dup_pairs(
                docs, threshold=0.8, bucket_cap=None, hash_fn="md5"
            )
        )
    )


_D03_SIMHASH_SQL_REF = "d03_simhash"  # oracle reused as the d09 CTE


@_register(
    "d09_simhash_hamming",
    None,  # filled below from d03's fingerprint SQL
    survey="north-star dedup: SimHash hamming-distance pairs via the "
    "pigeonhole band join (≤ n_bands−1 differing bits must share an exact "
    "band) + bit_count(xor) refine — the fingerprint-side companion to "
    "d02's MinHash set-similarity path",
)
def d09_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs within hamming distance 3 of each other's SimHash."""
    from ..functions.dedup import simhash_hamming_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    # bucket_cap=None: oracle defines all-pairs band-join semantics.
    return simhash_hamming_pairs(
        docs, max_hamming=3, n_bands=4, bucket_cap=None
    )


def _d09_oracle(
    bits: int = SIMHASH_BITS, n_bands: int = 4, sh_sql: str | None = None
) -> str:
    """Pigeonhole band join over the ``bits``-wide fingerprint, hamming
    refined via 32-bit fingerprint words (matches the Spark plan — no
    signed-int64 overflow at any width).

    ``sh_sql``: SQL producing (doc_id, simhash_bits) — defaults to
    d03's SimHash; m10 passes its image-aHash derivation instead (the
    template mirrors ``dedup.hamming_pairs_from_bits``, which both
    engines' queries share)."""
    if sh_sql is None:
        sh_sql = QUERIES[_D03_SIMHASH_SQL_REF].oracle
    band_w = bits // n_bands
    n_words = (bits + 31) // 32
    word_exprs = []
    for i in range(n_words):
        w = min(32, bits - i * 32)
        val = " + ".join(
            f"(CASE WHEN substr(simhash_bits, {i * 32 + j + 1}, 1) = '1' "
            f"THEN {1 << (w - 1 - j)} ELSE 0 END)"
            for j in range(w)
        )
        word_exprs.append(f"({val}) AS w{i}")
    words_sel = ", ".join(word_exprs)
    wcols = ", ".join(f"w{i}" for i in range(n_words))
    wcols_ab = ", ".join(
        f"a.w{i} AS w{i}a, b2.w{i} AS w{i}b" for i in range(n_words)
    )
    ham = " + ".join(f"bit_count(xor(w{i}a, w{i}b))" for i in range(n_words))
    return f"""
    WITH sh AS ({sh_sql}),
    v AS (SELECT doc_id, simhash_bits, {words_sel} FROM sh),
    b AS (SELECT doc_id, {wcols}, u.j,
                 substr(simhash_bits, u.j * {band_w} + 1, {band_w}) AS band
          FROM v, LATERAL (SELECT unnest(generate_series(0, {n_bands - 1}))
                           AS j) u),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b, {wcols_ab}
      FROM b a JOIN b b2 ON a.j = b2.j AND a.band = b2.band
                        AND a.doc_id < b2.doc_id)
    SELECT doc_a, doc_b, {ham} AS hamming
    FROM cand WHERE {ham} <= 3
    """


QUERIES["d09_simhash_hamming"].oracle = _d09_oracle()


_D12_CAP = 2  # exercises the star path on sf0.01's m=3 buckets


@_register(
    "d12_lsh_star_cap",
    f"""
    WITH {_SH_CTE},
    sig AS MATERIALIZED (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    ann AS (SELECT doc_id, band, bucket,
                   count(*) OVER (PARTITION BY band, bucket) AS m,
                   min(doc_id) OVER (PARTITION BY band, bucket) AS mn
            FROM bands),
    cand AS (SELECT DISTINCT doc_a, doc_b FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ann a JOIN ann b ON a.band = b.band AND a.bucket = b.bucket
                            AND a.doc_id < b.doc_id
      WHERE a.m <= {_D12_CAP}
      UNION ALL
      SELECT mn AS doc_a, doc_id AS doc_b FROM ann
      WHERE m > {_D12_CAP} AND doc_id <> mn)),
    {_JACCARD_TAIL_CAND.lstrip()}
    SELECT c.doc_a, c.doc_b,
           i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) AS jaccard
    FROM cand c JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
    JOIN sizes na ON na.doc_id = c.doc_a
    JOIN sizes nb ON nb.doc_id = c.doc_b
    WHERE i.n_inter * 1.0 / (na.n + nb.n - i.n_inter) >= 0.8
    """,
    survey="north-star dedup, the 100 TB emission shape: MinHash+LSH with "
    "a per-bucket pair-emission cap — buckets over the cap emit m−1 STAR "
    "edges to their min doc_id (the d10 first-occurrence pattern) instead "
    "of m(m−1)/2 pairs, so one viral boilerplate cluster can never emit "
    "corpus-quadratic candidates; small buckets keep exact all-pairs",
    note="The candidate graph stays bucket-connected under the cap, so "
    "hash-min closure (d06) builds identical keeper groups; refined "
    "similarity on star edges scores (min, x) pairs only — the documented "
    "recall trade for giant buckets.",
)
def d12_lsh_star_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup pairs with the production bucket cap."""
    from ..functions.dedup import minhash_near_dup_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(
        docs, threshold=0.8, bucket_cap=_D12_CAP, hash_fn="md5"
    )


# the d06 closure fed by the CAPPED pair set — the complete production
# chain (capped emission -> refine -> hash-min groups), registered as
# the same bounded audit aggregate over the identical capped pair SQL
@_register(
    "d14_star_cap_groups",
    None,  # assigned below from d12's registered oracle
    survey="north-star dedup, the full 100 TB chain: bucket-capped LSH "
    "candidate emission (star edges past the cap) -> jaccard refine -> "
    "hash-min transitive closure into keeper groups — the exact pipeline "
    "a production dedup pass runs, with every stage's pair volume bounded "
    "linearly in duplicate-cluster size; registered as bounded per-group "
    "audit aggregates",
    note="Closure over the capped pair set, audited per group (see d06's "
    "AUDIT-OUTPUT CONTRACT note); tests/test_dedup_star_cap.py "
    "additionally pins that this closure equals the uncapped one on "
    "duplicate-heavy corpora (star edges keep every bucket connected).",
)
def d14_star_cap_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper groups from the capped near-dup graph, one bounded audit
    row per group (the raw relation is the near_dup_groups API)."""
    from ..functions.dedup import (
        closure_audit,
        minhash_near_dup_pairs,
        near_dup_groups,
    )

    (docs,) = _ctx(spark, sf_dir, "documents")
    return closure_audit(
        near_dup_groups(
            minhash_near_dup_pairs(
                docs, threshold=0.8, bucket_cap=_D12_CAP, hash_fn="md5"
            )
        )
    )


QUERIES["d14_star_cap_groups"].oracle = _closure_audit_oracle(
    QUERIES["d12_lsh_star_cap"].oracle
)


def _d13_oracle(
    bits: int = SIMHASH_BITS,
    n_bands: int = 4,
    cap: int = 2,
    sh_sql: str | None = None,
    max_hamming: int = 3,
) -> str:
    """d09's pigeonhole band join with the per-bucket star cap.

    ``sh_sql``: SQL producing (doc_id, simhash_bits) — defaults to
    d03's SimHash; m10 passes its image-aHash derivation (whose
    low-entropy bands are exactly why IT must register the capped
    form: small images replicate pixels across the 8×8 grid, band
    values concentrate, and the uncapped join shuffle measured its
    way into disk exhaustion at 100×). m12 does NOT use this template:
    its keyframe-DCT fingerprint derivation cannot live inside a
    nested CTE under DuckDB 1.0's materializer (measured at 100×: the
    list-pivot + 64-wide projection chain balloons virtual address
    space ~1.5GB/s until host malloc fails, whatever the memory_limit)
    — m12 generates the same band/refine SQL FLAT in q_extensions9
    over an aggregate-form DCT."""
    if sh_sql is None:
        sh_sql = QUERIES[_D03_SIMHASH_SQL_REF].oracle
    band_w = bits // n_bands
    n_words = (bits + 31) // 32
    word_exprs = []
    for i in range(n_words):
        w = min(32, bits - i * 32)
        val = " + ".join(
            f"(CASE WHEN substr(simhash_bits, {i * 32 + j + 1}, 1) = '1' "
            f"THEN {1 << (w - 1 - j)} ELSE 0 END)"
            for j in range(w)
        )
        word_exprs.append(f"({val}) AS w{i}")
    words_sel = ", ".join(word_exprs)
    wcols = ", ".join(f"w{i}" for i in range(n_words))
    wcols_a = ", ".join(f"va.w{i} AS w{i}a" for i in range(n_words))
    wcols_b = ", ".join(f"vb.w{i} AS w{i}b" for i in range(n_words))
    ham = " + ".join(f"bit_count(xor(w{i}a, w{i}b))" for i in range(n_words))
    return f"""
    WITH sh AS ({sh_sql}),
    v AS (SELECT doc_id, simhash_bits, {words_sel} FROM sh),
    b AS (SELECT doc_id, u.j,
                 substr(simhash_bits, u.j * {band_w} + 1, {band_w}) AS band
          FROM v, LATERAL (SELECT unnest(generate_series(0, {n_bands - 1}))
                           AS j) u),
    ann AS (SELECT doc_id, j, band,
                   count(*) OVER (PARTITION BY j, band) AS m,
                   min(doc_id) OVER (PARTITION BY j, band) AS mn
            FROM b),
    pairs AS (SELECT DISTINCT doc_a, doc_b FROM (
      SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM ann a JOIN ann b2 ON a.j = b2.j AND a.band = b2.band
                             AND a.doc_id < b2.doc_id
      WHERE a.m <= {cap}
      UNION ALL
      SELECT mn AS doc_a, doc_id AS doc_b FROM ann
      WHERE m > {cap} AND doc_id <> mn)),
    cand AS (SELECT p.doc_a, p.doc_b, {wcols_a}, {wcols_b}
             FROM pairs p JOIN v va ON va.doc_id = p.doc_a
                          JOIN v vb ON vb.doc_id = p.doc_b)
    SELECT doc_a, doc_b, {ham} AS hamming
    FROM cand WHERE {ham} <= {max_hamming}
    """


@_register(
    "d13_simhash_star_cap",
    None,  # assigned below (needs d03's generated fingerprint SQL)
    survey="north-star dedup, the 100 TB emission shape: SimHash pigeonhole "
    "band join with the per-bucket star cap — identical fingerprints land "
    "in the same bucket of EVERY band, so a cluster of m exact dups costs "
    "4·m²/2 pairs uncapped; capped it is m−1 star edges, hamming-refined "
    "like any candidate",
)
def d13_simhash_star_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-≤3 SimHash pairs with the production bucket cap."""
    from ..functions.dedup import simhash_hamming_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    return simhash_hamming_pairs(docs, max_hamming=3, n_bands=4, bucket_cap=2)


QUERIES["d13_simhash_star_cap"].oracle = _d13_oracle(cap=2)


QUERIES_D08_ORACLE = f"""
    WITH pairs AS (
      {_D02_PAIRS_SQL}
    )
    SELECT p.doc_a, p.doc_b,
           levenshtein(a.text, b.text) AS lev,
           CASE WHEN greatest(length(a.text), length(b.text)) = 0 THEN 1.0
                ELSE 1.0 - levenshtein(a.text, b.text) * 1.0 /
                     greatest(length(a.text), length(b.text))
           END AS edit_sim
    FROM pairs p
    JOIN documents a ON p.doc_a = a.doc_id
    JOIN documents b ON p.doc_b = b.doc_id
    """


@_register(
    "d08_edit_distance_refine",
    QUERIES_D08_ORACLE,
    survey="north-star dedup: levenshtein refine of MinHash candidate pairs "
    "(third tier: LSH bands → jaccard → character edit distance, each "
    "touching only survivors of the previous; edit distance is O(len²) per "
    "pair and must never run all-pairs)",
)
def d08_edit_distance_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level similarity for every MinHash near-dup pair —
    catches in-place small edits that shift every overlapping shingle."""
    from ..functions.dedup import edit_distance_refine, minhash_near_dup_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    # bucket_cap=None: refine tier must see the oracle's all-pairs set.
    return edit_distance_refine(
        docs,
        minhash_near_dup_pairs(docs, threshold=0.8, bucket_cap=None, hash_fn="md5"),
    )


