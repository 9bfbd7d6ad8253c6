"""Round-9 wave-10 operators: d20 cross-doc span removal, m11 DCT
pHash, o18 quota-exact source mixing, t23 BPE encode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )


# ---------------------------------------------------------------------------
# d20: cross-document exact-substring removal
# ---------------------------------------------------------------------------


def _hash32(tok: str) -> int:
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


def _d20_expect(texts: list[str], k: int) -> dict[int, tuple]:
    """Pure-Python re-derivation of the d20 contract (first-occurrence-
    wins by min doc_id; a token survives iff no flagged k-window
    starting in [q-k+1, q] covers it)."""
    import re

    toks = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in enumerate(texts)}
    owner: dict[tuple, int] = {}
    for i in sorted(toks):
        w = toks[i]
        for p in range(len(w) - k + 1):
            g = tuple(w[p : p + k])
            owner.setdefault(g, i)
    out = {}
    for i, w in toks.items():
        if not w:
            continue
        covered = [False] * len(w)
        for p in range(len(w) - k + 1):
            if owner[tuple(w[p : p + k])] < i:
                for j in range(p, p + k):
                    covered[j] = True
        kept = [t for t, c in zip(w, covered) if not c]
        kept_len = sum(map(len, kept)) + len(kept) - 1 if kept else None
        sig = (
            sum((j + 1) * _hash32(t) for j, t in enumerate(kept))
            if kept
            else None
        )
        out[i] = (len(w), sum(covered), len(kept), kept_len, sig)
    return out


def test_crossdoc_span_removal_hand_case(spark):
    """Three docs, k=3: doc1 repeats doc0's opening trigram (loses the
    3 covered tokens), doc2 is untouched, doc0 (the min owner) keeps
    everything including its own internal repeat."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        crossdoc_span_removal,
    )

    texts = [
        "alpha beta gamma delta alpha beta gamma",  # owner of all its grams
        "alpha beta gamma epsilon zeta",  # first 3 tokens covered
        "eta theta iota kappa",  # no shared grams
    ]
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["n_kept"],
            r["kept_len"],
            r["kept_sig"],
        )
        for r in crossdoc_span_removal(_docs(spark, texts), k=3).collect()
    }
    assert got == _d20_expect(texts, 3)
    # spot-check the hand-visible numbers too
    assert got[0][1] == 0 and got[0][2] == 7
    assert got[1] == (5, 3, 2, len("epsilon zeta"), got[1][4])
    assert got[2][1] == 0


def test_crossdoc_span_removal_overlapping_coverage(spark):
    """Overlapping flagged windows cover the union of their spans, not
    double-count: doc1 embeds a 4-token run of doc0 -> two overlapping
    3-grams flag, exactly 4 tokens removed."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        crossdoc_span_removal,
    )

    texts = [
        "one two three four",
        "zero one two three four five",
    ]
    got = {
        r["doc_id"]: r for r in crossdoc_span_removal(
            _docs(spark, texts), k=3
        ).collect()
    }
    assert got[1]["n_removed"] == 4
    assert got[1]["n_kept"] == 2  # "zero" and "five" survive
    exp = _d20_expect(texts, 3)
    assert (got[1]["n_tokens"], got[1]["n_removed"], got[1]["n_kept"],
            got[1]["kept_len"], got[1]["kept_sig"]) == exp[1]


def test_crossdoc_span_removal_all_removed_and_short_docs(spark):
    """A doc that is entirely one duplicated window reports n_kept=0
    with NULL audit columns; docs shorter than k are returned intact."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        crossdoc_span_removal,
    )

    texts = [
        "a b c d",
        "a b c d",  # fully covered by doc0's grams (k=4, one window)
        "x y",  # shorter than k: no windows, fully kept
        "",  # zero tokens: excluded from output
    ]
    got = {
        r["doc_id"]: r
        for r in crossdoc_span_removal(_docs(spark, texts), k=4).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[1]["n_kept"] == 0
    assert got[1]["kept_len"] is None and got[1]["kept_sig"] is None
    assert got[2] ["n_removed"] == 0 and got[2]["n_kept"] == 2
    assert _d20_expect(texts, 4)[1] == (4, 4, 0, None, None)


def test_crossdoc_span_removal_xxhash64_knob_identity(spark):
    """The production gram_key='xxhash64' wire knob returns the same
    relation as the raw-gram oracle configuration on the sf0.001 corpus
    (collisions are ~n²/2⁶⁴; any would only over-remove)."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        crossdoc_span_removal,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    raw = sorted(
        tuple(r) for r in crossdoc_span_removal(docs, gram_key="raw").collect()
    )
    xx = sorted(
        tuple(r)
        for r in crossdoc_span_removal(docs, gram_key="xxhash64").collect()
    )
    assert raw == xx and raw


def test_crossdoc_span_removal_consistent_with_d17_detector(spark):
    """Detector/transform consistency on real data: every doc d17 finds
    >0 duplicated windows in either removes >0 tokens (it is a LATER
    occurrence) or is the min-doc owner of every duplicated gram it
    holds; docs with zero duplicated windows remove nothing."""
    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        crossdoc_span_removal,
        window_dup_rate,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rate = {
        r["doc_id"]: r["n_dup_windows"]
        for r in window_dup_rate(docs, k=8).collect()
    }
    rem = {
        r["doc_id"]: r["n_removed"]
        for r in crossdoc_span_removal(docs, k=8).collect()
    }
    assert any(v > 0 for v in rem.values())  # non-vacuous corpus
    for doc, n_dup in rate.items():
        if n_dup == 0:
            assert rem.get(doc, 0) == 0, doc
        if rem.get(doc, 0) > 0:
            assert n_dup > 0, doc
