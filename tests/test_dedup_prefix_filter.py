"""Differential soundness pin for the d05 AllPairs/PPJoin filter set.

``ngram_jaccard_pairs`` claims output IDENTICAL to the brute-force
all-pairs jaccard at ANY threshold — the prefix, length, and positional
filters are prunes of pairs that provably cannot reach the threshold,
and the positional filter's ANY-collision-row semantics (filter
collision rows, then DISTINCT pairs) relies on a subtle argument: a
qualifying pair's FIRST prefix collision always survives the
suffix-overlap bound. This test checks the whole function against a
pure-Python brute force on seeded template-heavy corpora (the shape
that stresses the filters: shared boilerplate, mutated near-dups,
identical copies, short docs below the shingle width) across the
threshold range, including the capped-universe ``max_df`` path.
"""

import random
import re

import pytest

from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
    ngram_jaccard_pairs,
)

N = 3  # shingle width (function default)


def _shingle_sets(texts, max_df=None):
    """Brute-force mirror of shingles(): lowercase [a-z0-9]+ tokens,
    distinct word trigrams; optional document-frequency cap over the
    corpus (the capped universe drops shingles with df > max_df and
    rescores over what remains, exactly like the library path)."""
    sets = {}
    for doc_id, txt in texts:
        toks = re.findall(r"[a-z0-9]+", txt.lower())
        s = {
            " ".join(toks[j : j + N]) for j in range(len(toks) - N + 1)
        }
        if s:
            sets[doc_id] = s
    if max_df is not None:
        df = {}
        for s in sets.values():
            for sh in s:
                df[sh] = df.get(sh, 0) + 1
        sets = {
            d: {sh for sh in s if df[sh] <= max_df} for d, s in sets.items()
        }
        sets = {d: s for d, s in sets.items() if s}
    return sets


def _brute_pairs(texts, threshold, max_df=None):
    sets = _shingle_sets(texts, max_df)
    ids = sorted(sets)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= threshold:
                out[(a, b)] = j
    return out


def _template_corpus(seed, n_docs=60):
    """Template-heavy near-dup corpus: a few boilerplate templates,
    token-level mutations, exact copies, and sub-shingle-width runts."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    templates = [
        " ".join(rng.choices(vocab, k=rng.randint(8, 20))) for _ in range(5)
    ]
    texts = []
    for i in range(n_docs):
        base = rng.choice(templates).split()
        for _ in range(rng.randint(0, 3)):  # mutate 0-3 tokens
            base[rng.randrange(len(base))] = rng.choice(vocab)
        if rng.random() < 0.15:  # truncate — length-filter stress
            base = base[: rng.randint(1, len(base))]
        texts.append((i, " ".join(base)))
    texts.append((n_docs, "a b"))  # below shingle width -> empty set
    texts.append((n_docs + 1, texts[0][1]))  # exact copy
    return texts


@pytest.mark.parametrize("seed", [7, 42])
@pytest.mark.parametrize("threshold", [0.25, 0.5, 0.8, 0.95])
def test_matches_brute_force_all_thresholds(spark, seed, threshold):
    texts = _template_corpus(seed)
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, threshold=threshold, max_df=None
        ).collect()
    }
    want = _brute_pairs(texts, threshold)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_matches_brute_force_capped_universe(spark):
    texts = _template_corpus(3, n_docs=40)
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=4).collect()
    }
    want = _brute_pairs(texts, 0.5, max_df=4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
