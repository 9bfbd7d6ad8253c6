"""Wave-6 operator tests: d17 window-dup rate, d18 incremental dedup,
t19 BPE merges, t20 inverted index, s11 PQ assignment.

Each operator gets a hand-computable fixture check (the oracle-parity
suite covers the registered sf0.001/0.01 compare; these pin SEMANTICS
on inputs small enough to verify by eye) plus the knob contracts
(gram_key/bucket_cap determinism, seed self-assignment).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )


# ---------------------------------------------------------------------------
# d17: cross-document duplicated-window rate
# ---------------------------------------------------------------------------


def test_window_dup_rate_hand_case(spark):
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import window_dup_rate

    shared = "a b c d"  # one shared 4-token window
    docs = _docs(
        spark,
        [
            f"{shared} x1 y1",  # doc 0: 6 tokens, k=4 -> windows at pos 1..3
            f"{shared} x2 y2",  # doc 1: same boilerplate head
            "p q r s t u",  # doc 2: all windows unique
            "w x",  # doc 3: too short for any window -> no row
        ],
    )
    out = {
        r["doc_id"]: r
        for r in window_dup_rate(docs, k=4).collect()
    }
    assert set(out) == {0, 1, 2}
    # 6 tokens, k=4 -> 3 windows; only the leading "a b c d" is shared
    for d in (0, 1):
        assert out[d]["n_windows"] == 3
        assert out[d]["n_dup_windows"] == 1
        assert out[d]["dup_frac"] == pytest.approx(1 / 3)
    assert out[2]["n_windows"] == 3
    assert out[2]["n_dup_windows"] == 0
    assert out[2]["dup_frac"] == 0.0


def test_window_dup_rate_counts_within_doc_repeats_as_positions(spark):
    """Within-doc repeats of a CROSS-doc gram count per position; a gram
    repeated only within one doc is NOT cross-doc duplicated."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import window_dup_rate

    docs = _docs(
        spark,
        [
            "a b a b a b",  # windows(k=2): "a b","b a","a b","b a","a b"
            "a b zzz qqq",  # shares only "a b"
        ],
    )
    out = {r["doc_id"]: r for r in window_dup_rate(docs, k=2).collect()}
    # doc 0: 5 positions, the three "a b" positions are cross-doc dup,
    # the two "b a" positions exist only in doc 0 -> not dup
    assert out[0]["n_windows"] == 5
    assert out[0]["n_dup_windows"] == 3
    assert out[1]["n_windows"] == 3
    assert out[1]["n_dup_windows"] == 1


def test_window_dup_rate_hash_key_matches_raw(spark):
    """The production xxhash64 gram key must reproduce the raw-string
    result on collision-free data (any realistic corpus)."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import window_dup_rate
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    raw = sorted(
        window_dup_rate(docs, k=8, gram_key="raw").collect(),
        key=lambda r: r["doc_id"],
    )
    hashed = sorted(
        window_dup_rate(docs, k=8, gram_key="xxhash64").collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in raw] == [tuple(r) for r in hashed]


# ---------------------------------------------------------------------------
# d18: incremental batch-vs-corpus dedup
# ---------------------------------------------------------------------------

_BOILER = "the quick brown fox jumps over the lazy dog again and again"


def test_incremental_dedup_finds_planted_duplicate(spark):
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        incremental_minhash_dedup,
    )

    rows = [
        # doc_id 0 and 5 are batch (%5==0); 0 duplicates corpus doc 3
        (0, _BOILER),
        (3, _BOILER),
        (5, "completely different novel content with no twin here at all"),
        (1, "unrelated corpus document one about machine learning models"),
        (2, "unrelated corpus document two about distributed query engines"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["batch_doc"]: r
        for r in incremental_minhash_dedup(
            docs, batch_mod=5, threshold=0.8, bucket_cap=None, hash_fn="md5"
        ).collect()
    }
    # exact duplicate must be matched, the novel doc must NOT appear
    assert 0 in out and 5 not in out
    assert out[0]["first_match"] == 3
    assert out[0]["max_jaccard_nanos"] == 1_000_000_000  # jaccard exactly 1
    assert out[0]["n_matches"] == 1


def test_incremental_dedup_matches_are_sound(spark):
    """Every reported match must be a TRUE jaccard>=t batch-corpus pair
    (precision is exact by construction; this differentially re-scores
    each reported pair against a brute-force python jaccard)."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        incremental_minhash_dedup,
        shingles,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = incremental_minhash_dedup(
        docs, batch_mod=5, threshold=0.8, bucket_cap=None, hash_fn="md5"
    ).collect()
    assert out, "sf0.001 contains planted near-dups crossing the %5 split"
    sets: dict[int, set] = {}
    for r in shingles(docs).collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    for r in out:
        b, a = r["batch_doc"], r["first_match"]
        assert b % 5 == 0 and a % 5 != 0
        inter = len(sets[a] & sets[b])
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        assert j >= 0.8


def test_incremental_dedup_bucket_cap_is_subset(spark):
    """Capped probing may only DROP matches (recall trade), never invent
    them, and surviving rows keep identical audit values."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        incremental_minhash_dedup,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        r["batch_doc"]: tuple(r)
        for r in incremental_minhash_dedup(
            docs, bucket_cap=None, hash_fn="md5"
        ).collect()
    }
    capped = {
        r["batch_doc"]: tuple(r)
        for r in incremental_minhash_dedup(
            docs, bucket_cap=2, hash_fn="md5"
        ).collect()
    }
    assert set(capped) <= set(full)
    for b, row in capped.items():
        # n_matches/first_match/max_j may shrink under the cap, but the
        # reported first_match must be one of the full form's true
        # matches for that batch doc only when equal; minimally the
        # match count cannot exceed the uncapped count
        assert row[1] <= full[b][1]


# ---------------------------------------------------------------------------
# t19: BPE merge counts
# ---------------------------------------------------------------------------


def test_bpe_top_merges_hand_case(spark):
    from mxene_coin_cell_data_pipeline_spark.functions.text import bpe_top_merges

    # corpus: "aa aa ab" -> vocab {aa:2, ab:1}
    # aa -> pairs [aa, a</w>] each weight 2; ab -> [ab, b</w>] weight 1
    docs = _docs(spark, ["aa aa ab"])
    out = bpe_top_merges(docs, k=10).collect()
    got = {r["pair"]: r["n_total"] for r in out}
    assert got == {"aa": 2, "a</w>": 2, "ab": 1, "b</w>": 1}
    # rank: count desc then pair asc -> a</w> before aa
    ranks = {r["rank"]: r["pair"] for r in out}
    assert ranks[1] == "a</w>" and ranks[2] == "aa"


def test_bpe_single_char_words(spark):
    from mxene_coin_cell_data_pipeline_spark.functions.text import bpe_top_merges

    docs = _docs(spark, ["a a a b"])
    got = {r["pair"]: r["n_total"] for r in bpe_top_merges(docs, k=10).collect()}
    assert got == {"a</w>": 3, "b</w>": 1}


# ---------------------------------------------------------------------------
# t20: inverted index
# ---------------------------------------------------------------------------


def test_inverted_index_hand_case(spark):
    from mxene_coin_cell_data_pipeline_spark.functions.text import inverted_index

    docs = _docs(
        spark,
        [
            "x x x y",  # doc 0: x*3 y*1
            "x y y",  # doc 1: x*1 y*2
            "x",  # doc 2: x*1
            "x x",  # doc 3: x*2
        ],
    )
    out = {r["token"]: r for r in inverted_index(docs, top_postings=3).collect()}
    x = out["x"]
    # df/cf are EXACT over the full posting list (4 docs, 7 occurrences)
    assert x["df"] == 4 and x["cf"] == 7
    # stored postings capped at 3, tf desc then doc asc: 0:3, 3:2, then
    # tf=1 tie between docs 1 and 2 -> doc 1
    assert x["postings"] == "0:3,3:2,1:1"
    y = out["y"]
    assert y["df"] == 2 and y["cf"] == 3
    assert y["postings"] == "1:2,0:1"


# ---------------------------------------------------------------------------
# s11: PQ assignment
# ---------------------------------------------------------------------------


def test_pq_assign_seeds_self_code_zero_error(spark):
    """Each codebook seed vector must quantize to its own code in every
    subspace with EXACTLY zero error (dist folds to 0.0 bit-exactly:
    dxx - 2*dxx + dxx with identical sequential folds)."""
    from mxene_coin_cell_data_pipeline_spark.functions.similarity import pq_assign
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = {r["vec_id"]: r for r in pq_assign(emb, m=4, k=4).collect()}
    for s in range(4):
        for c in range(4):
            assert out[c][f"code_{s}"] == c
    for c in range(4):
        assert out[c]["err_nanos"] == 0
    # every vector got a code in range and a non-negative error
    for r in out.values():
        assert all(0 <= r[f"code_{s}"] < 4 for s in range(4))
        assert r["err_nanos"] >= 0


def test_pq_assign_rejects_bad_shapes(spark):
    from mxene_coin_cell_data_pipeline_spark.functions.similarity import pq_assign
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        pq_assign(emb, m=7, k=4)


# ---------------------------------------------------------------------------
# st11: streaming incremental dedup == batch d18
# ---------------------------------------------------------------------------


def test_stream_incremental_dedup_equals_batch(spark):
    """The streaming execution (foreachBatch probe of persisted corpus
    state) must agree row-for-row with the batch incremental dedup —
    the registered st11 oracle IS d18's, so this pins the same contract
    library-side, including under the production xxhash64 knob the
    oracle can't check."""
    from pyspark.sql import functions as F

    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        incremental_minhash_dedup,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table
    from mxene_coin_cell_data_pipeline_spark.streaming import read_table_stream
    from mxene_coin_cell_data_pipeline_spark.streaming.features import (
        stream_incremental_dedup,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    batch_out = sorted(
        tuple(r)
        for r in incremental_minhash_dedup(
            docs, batch_mod=5, bucket_cap=None, hash_fn="xxhash64"
        ).collect()
    )
    stream = read_table_stream(spark, sf, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    stream_out = sorted(
        tuple(r)
        for r in stream_incremental_dedup(
            stream,
            docs.filter(F.col("doc_id") % 5 != 0),
            bucket_cap=None,
            hash_fn="xxhash64",
        ).collect()
    )
    assert batch_out == stream_out and batch_out


# ---------------------------------------------------------------------------
# s12: JL random projection
# ---------------------------------------------------------------------------


def test_random_projection_preserves_distances_roughly(spark):
    """JL contract: pairwise squared distances in the 16-dim projection
    approximate the 64-dim originals (loose ε — the sign matrix is
    fixed, this guards against sign/scale bugs, not concentration)."""
    import math

    from mxene_coin_cell_data_pipeline_spark.functions.similarity import (
        random_projection,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    orig = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.limit(20).collect()
    }
    proj = {
        r["vec_id"]: [r[f"y{j}_nanos"] / 1e9 for j in range(16)]
        for r in random_projection(emb).collect()
    }
    ids = sorted(orig)[:10]
    ratios = []
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d_o = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
            d_p = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            if d_o > 1e-9:
                ratios.append(d_p / d_o)
    # mean ratio near 1 (unbiased estimator); individual ratios bounded
    mean = sum(ratios) / len(ratios)
    assert 0.5 < mean < 1.5
    assert all(0.05 < r < 5.0 for r in ratios)


def test_random_projection_matches_manual_md5_signs(spark):
    """One projected coordinate recomputed by hand from the md5 sign
    rule must match exactly (pins the sign convention both engines
    share)."""
    import hashlib

    from mxene_coin_cell_data_pipeline_spark.functions.similarity import (
        random_projection,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    row = emb.filter("vec_id = 7").collect()[0]
    x = [float(v) for v in row["embedding"]]
    got = random_projection(emb).filter("vec_id = 7").collect()[0]
    for j in (0, 5, 15):
        acc = 0.0
        for i, xi in enumerate(x, start=1):
            ch = hashlib.md5(f"{j}|{i}".encode()).hexdigest()[0]
            s = 1.0 if int(ch, 16) & 1 else -1.0
            acc = acc + xi * s
        expect = round(acc * 0.25 * 1e9)
        assert got[f"y{j}_nanos"] == expect
