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


# ---------------------------------------------------------------------------
# m11: integer-DCT pHash image near-dup
# ---------------------------------------------------------------------------


def _ppm_payload(did: int, perturb: dict[int, int] | None = None):
    """Re-derive with_ppm_pair_payload's byte stream (+ optional sample
    overrides) for kernel-level fixtures."""
    import hashlib

    g = did // 2
    w, h = 3 + g % 6, 2 + g % 4
    vals = [
        int(hashlib.md5(f"{g}:{k}".encode()).hexdigest()[:2], 16)
        for k in range(3 * w * h)
    ]
    if did % 2 == 1:
        vals[0] = (vals[0] + 1) % 256
    for k, v in (perturb or {}).items():
        vals[k] = v
    return (
        f"P3\n# id {did}\n{w} {h}\n255\n" + " ".join(map(str, vals)) + "\n"
    ).encode("ascii"), w, h


def _hamming(a: str, b: str) -> int:
    return sum(x != y for x, y in zip(a, b))


def test_phash_survives_perturbation_that_breaks_ahash():
    """THE reason pHash exists: blasting one NN-sampled pixel of doc 8
    to white flips 4 aHash bits (past the hamming<=3 near-dup gate)
    but ZERO pHash bits — cell thresholds flip one-for-one under
    localized noise, basis responses absorb it."""
    from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
        ahash_ppm,
        phash_ppm,
    )

    did = 8
    base, w, h = _ppm_payload(did)
    pix = sorted(
        {(r * h // 8) * w + (c * w // 8) for r in range(8) for c in range(8)}
    )
    pert = {3 * pix[0] + ch: 255 for ch in range(3)}
    noisy, _, _ = _ppm_payload(did, pert)
    da = _hamming(ahash_ppm(base), ahash_ppm(noisy))
    dp = _hamming(phash_ppm(base), phash_ppm(noisy))
    assert da > 3, da  # aHash mis-gates the same image
    assert dp == 0, dp  # pHash holds it


def test_phash_uniform_brightness_invariance():
    """A uniform brightness shift lands entirely in the DC coefficient
    (pinned 0), so the 63 AC bits are EXACTLY unchanged — the property
    an average-hash can only approximate, a DCT hash has by
    construction. +[shift] to every channel of every sample (choosing
    a doc whose max sample survives without clipping)."""
    from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
        parse_ppm,
        phash_ppm,
    )

    for did in range(0, 200, 2):
        base, w, h = _ppm_payload(did)
        _, _, _, vals = parse_ppm(base)
        shift = 255 - max(vals)
        if shift < 10:
            continue
        bright, _, _ = _ppm_payload(
            did, {k: v + shift for k, v in enumerate(vals)}
        )
        assert phash_ppm(base) == phash_ppm(bright), did
        return
    raise AssertionError("no headroom doc found")


def test_phash_bits_kernel_matches_pure_python(spark):
    """Arrow kernel output == direct phash_ppm over the same generated
    payload stream, and siblings hash identically (hamming 0)."""
    from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
        phash_bits,
        phash_ppm,
        with_ppm_pair_payload,
    )

    ids = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    got = {
        r["doc_id"]: r["phash_bits"]
        for r in phash_bits(with_ppm_pair_payload(ids)).collect()
    }
    assert set(got) == set(range(40))
    for did in range(40):
        assert got[did] == phash_ppm(_ppm_payload(did)[0]), did
    for g in range(20):
        assert got[2 * g] == got[2 * g + 1], g


def test_phash_neardup_query_keeps_siblings_connected(spark):
    """The registered (star-capped) m11 query keeps every hamming-0
    sibling pair CONNECTED at sf0.001 — the d13 star-cap guarantee:
    buckets over the cap emit star edges to their min doc_id instead
    of the direct pair, but identical fingerprints always share every
    bucket, so the pair stays in one component."""
    from mxene_coin_cell_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["m11_image_phash_neardup"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        parent[find(r["doc_a"])] = find(r["doc_b"])
    from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
        phash_ppm,
    )

    near, disconnected = 0, []
    for g in range(250):
        # the +1-mod-256 sibling rule has a WRAP case (sample 0 = 255
        # -> 0): a genuinely large image edit, legitimately outside
        # the hamming gate — the guarantee covers true near-dups only
        d = _hamming(
            phash_ppm(_ppm_payload(2 * g)[0]),
            phash_ppm(_ppm_payload(2 * g + 1)[0]),
        )
        if d <= 3:
            near += 1
            if find(2 * g) != find(2 * g + 1):
                disconnected.append(g)
    assert near > 200  # the corpus plants real near-dups
    assert not disconnected, disconnected[:5]


# ---------------------------------------------------------------------------
# o18: quota-exact source mixing
# ---------------------------------------------------------------------------


def test_source_mix_quota_hand_allocation(spark):
    """Largest-remainder by hand: counts (7,5,4), budget N//2=8, sqrt
    weights (2,2,2) -> base 2 each (16 DIV 6), L=2, equal remainders
    tie-break by source asc -> quotas (3,3,2)."""
    from mxene_coin_cell_data_pipeline_spark.functions.sampling import (
        source_mix_quota,
    )

    rows = [(i, 0) for i in range(7)] + [(100 + i, 1) for i in range(5)] + [
        (200 + i, 2) for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "src"])
    got = {
        r["source"]: r
        for r in source_mix_quota(
            df, "src", key="doc_id", budget_den=2, weighting="sqrt"
        ).collect()
    }
    assert {s: got[s]["quota"] for s in got} == {0: 3, 1: 3, 2: 2}
    assert all(got[s]["n_selected"] == got[s]["quota"] for s in got)


def test_source_mix_quota_exact_at_every_sf(spark):
    """THE o18 contract: sum(quota) == N DIV 5 exactly and every source
    fills its quota exactly, at each scale factor."""
    from mxene_coin_cell_data_pipeline_spark.plans import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = QUERIES["o18_source_mix_quota"].spark(spark, sf).collect()
        n = sum(r["n_source"] for r in rows)
        assert sum(r["quota"] for r in rows) == n // 5, sf
        assert all(r["n_selected"] == r["quota"] for r in rows), sf
        assert len(rows) == 5, sf


def test_source_mix_quota_temperature_rebalances(spark):
    """sqrt weighting up-weights tail sources relative to their share:
    the dominant source's quota share is strictly below its row share,
    the smallest source's strictly above (on the skewed 8/4/2/1/1
    carve); linear weighting tracks shares instead."""
    from mxene_coin_cell_data_pipeline_spark.functions.sampling import (
        source_mix_quota,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    m = F.col("doc_id") % 16
    src = (
        F.when(m < 8, 0).when(m < 12, 1).when(m < 14, 2)
        .when(m < 15, 3).otherwise(4)
    )
    sq = {
        r["source"]: r
        for r in source_mix_quota(docs, src, weighting="sqrt").collect()
    }
    n = sum(r["n_source"] for r in sq.values())
    b = sum(r["quota"] for r in sq.values())
    assert sq[0]["quota"] / b < sq[0]["n_source"] / n
    assert sq[4]["quota"] / b > sq[4]["n_source"] / n
    lin = {
        r["source"]: r
        for r in source_mix_quota(docs, src, weighting="linear").collect()
    }
    assert abs(lin[0]["quota"] / b - lin[0]["n_source"] / n) < 0.01


# ---------------------------------------------------------------------------
# t23: BPE encode under the literal merge table
# ---------------------------------------------------------------------------


def _bpe_reference(word: str, merges) -> list[str]:
    """Independent re-implementation of single-step-leftmost-minrank
    (differential partner for bpe_apply_merges — written as a rank-
    indexed scan, not a copy of the library loop)."""
    syms = list(word)
    ranks = {pair: i for i, pair in enumerate(merges)}
    while True:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            return syms
        rank, i = min(cands)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]


def test_bpe_apply_merges_hand_cases():
    """Chained merges assemble 'scan' through three ranks; rank-order
    interaction on 'order' (er fires before or can)."""
    from mxene_coin_cell_data_pipeline_spark.functions.text import (
        bpe_apply_merges,
    )

    assert bpe_apply_merges("scan") == ["scan"]
    assert bpe_apply_merges("scanner") == ["scan", "n", "er"]
    assert bpe_apply_merges("order") == ["or", "d", "er"]
    assert bpe_apply_merges("window") == ["w", "in", "d", "ow"]
    assert bpe_apply_merges("x") == ["x"]


def test_bpe_apply_merges_differential():
    """Library encoder == independent rank-indexed reference over the
    corpus vocabulary and adversarial synthetic words (repeats,
    self-adjacent merge material, every merge's left/right symbols)."""
    import itertools

    from mxene_coin_cell_data_pipeline_spark.functions.text import (
        BPE_MERGES,
        bpe_apply_merges,
    )

    words = [
        "join", "hash", "row", "batch", "scan", "column", "customer",
        "filter", "small", "slow", "merge", "order", "vector", "line",
        "table", "data", "agg", "value", "key", "stream", "window",
        "spark", "part", "group",
        "erererer", "ininin", "scascasca", "scanscan", "rowrow",
        "sterster", "aaaa", "", "z",
    ] + ["".join(p) for p in itertools.product("erinsowct", repeat=3)]
    for w in words:
        got = bpe_apply_merges(w)
        ref = _bpe_reference(w, BPE_MERGES)
        assert got == ref, (w, got, ref)
        assert "".join(got) == w  # encoding is lossless


def test_bpe_encode_corpus_audit(spark):
    """Per-doc audit invariants on real data: n_bpe_tokens strictly
    between n_words (full merging) and n_chars (no merging), and the
    per-doc counts equal a direct recount."""
    import re

    from mxene_coin_cell_data_pipeline_spark.functions.text import (
        bpe_apply_merges,
        bpe_encode_corpus,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {r["doc_id"]: r for r in bpe_encode_corpus(docs).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    checked = 0
    for did, text in raw.items():
        words = re.findall(r"[a-z0-9]+", text.lower())
        if not words:
            assert did not in got
            continue
        r = got[did]
        assert r["n_words"] == len(words)
        assert r["n_chars"] == sum(map(len, words))
        assert r["n_bpe_tokens"] == sum(
            len(bpe_apply_merges(w)) for w in words
        )
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_chars"]
        checked += 1
    assert checked > 400
    # compression is real on this corpus, not vacuous (measured 0.814
    # chars->tokens with the 12-merge literal table)
    assert sum(r["n_bpe_tokens"] for r in got.values()) < 0.85 * sum(
        r["n_chars"] for r in got.values()
    )


def test_long_doc_poison_sentinel_in_wave10_oracles():
    """ADVICE r09: the d20/t23 oracle SQL unnests token positions via a
    constant range(1, 4096) (DuckDB's range cannot take a derived
    bound), silently capping each doc at 4095 tokens while the Spark
    engine is uncapped. The oracles now emit a poison sentinel row
    (doc_id = -1, the d06 convergence-sentinel discipline) whenever the
    corpus violates the invariant, so a long-doc corpus fails the
    driver hash loudly instead of passing wrongly — and stays
    sentinel-free on a conforming corpus."""
    import duckdb

    from mxene_coin_cell_data_pipeline_spark.plans import QUERIES

    long_text = " ".join(f"w{i}" for i in range(5000))
    for q in ("d20_crossdoc_span_removal", "t23_bpe_encode"):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.execute(
            "INSERT INTO documents VALUES (1, ?), (2, 'short doc here')",
            [long_text],
        )
        rows = con.execute(QUERIES[q].oracle).fetchall()
        sentinels = [r for r in rows if r[0] == -1]
        assert len(sentinels) == 1, q
        assert sentinels[0][1] == 5000, q  # carries the offending max len
        # conforming corpus: no sentinel
        con.execute("DELETE FROM documents WHERE doc_id = 1")
        rows = con.execute(QUERIES[q].oracle).fetchall()
        assert all(r[0] != -1 for r in rows), q
        con.close()
