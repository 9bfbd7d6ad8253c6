"""Wave-11 operator tests (round 10): s13 PQ ADC retrieval, m12 video
keyframe-pHash near-dup, t24 iterative BPE merge training, p06 capstone
chain. Differentials are pure-Python re-implementations, the wave-10
discipline."""

from __future__ import annotations

import hashlib
import re

import pytest


# ---------------------------------------------------------------------------
# s13: PQ ADC top-k retrieval
# ---------------------------------------------------------------------------


def _dot_seq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _py_adc_reference(vecs: dict[int, list[float]], m=4, k=4, topk=10):
    """Pure-Python ADC retrieval mirroring pq_adc_topk bit-for-bit:
    codes by expanded squared distance (ties -> smaller code), LUT from
    query vec 0, top-k on the round(1e9) integer grid."""
    dim = len(vecs[0])
    sub = dim // m
    qv = vecs[0]
    lut = []
    for s in range(m):
        qs = qv[s * sub : (s + 1) * sub]
        dqq = _dot_seq(qs, qs)
        lut.append(
            [
                dqq
                - 2 * _dot_seq(qs, vecs[c][s * sub : (s + 1) * sub])
                + _dot_seq(
                    vecs[c][s * sub : (s + 1) * sub],
                    vecs[c][s * sub : (s + 1) * sub],
                )
                for c in range(k)
            ]
        )
    scored = []
    for vid, v in vecs.items():
        if vid == 0:
            continue
        adc = 0.0
        for s in range(m):
            xs = v[s * sub : (s + 1) * sub]
            dxx = _dot_seq(xs, xs)
            best = None
            for c in range(k):
                cs = vecs[c][s * sub : (s + 1) * sub]
                dist = dxx - 2 * _dot_seq(xs, cs) + _dot_seq(cs, cs)
                if best is None or dist < best[0]:
                    best = (dist, c)
            adc = adc + lut[s][best[1]]
        scored.append((round(adc * 1e9), vid))
    scored.sort()
    return scored[:topk]


def _det_vec(i: int, dim: int = 64) -> list[float]:
    # float32-quantized like the parquet embeddings, deterministic
    import numpy as np

    out = []
    for j in range(dim):
        b = int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:8], 16)
        out.append(float(np.float32(b / 2**31 - 1.0)))
    return out


def test_s13_adc_matches_pure_python(spark):
    from pyspark.sql import types as T

    from mxene_coin_cell_data_pipeline_spark.functions.similarity import (
        pq_adc_topk,
    )

    vecs = {i: _det_vec(i) for i in range(24)}
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], schema=schema
    )
    got = {
        r["vec_id"]: r.asDict() for r in pq_adc_topk(df, topk=10).collect()
    }
    want = _py_adc_reference(vecs, topk=10)
    assert {vid for _, vid in want} == set(got)
    for nanos, vid in want:
        assert got[vid]["adc_nanos"] == nanos
    # recall flags are consistent with brute-force exact rankings
    exact_l2 = sorted(
        (
            round(
                (
                    _dot_seq(v, v)
                    - 2 * _dot_seq(v, vecs[0])
                    + _dot_seq(vecs[0], vecs[0])
                )
                * 1e9
            ),
            vid,
        )
        for vid, v in vecs.items()
        if vid != 0
    )[:10]
    l2_ids = {vid for _, vid in exact_l2}
    for vid, r in got.items():
        assert r["in_exact_l2_topk"] == (1 if vid in l2_ids else 0)


def test_s13_zero_quantization_error_for_centroid_vectors(spark):
    """A database vector that IS one of the centroids scores an ADC
    distance exactly equal to the true (lut) distance — and the query's
    own centroid tuple scores adc == 0 at every subspace."""
    from pyspark.sql import types as T

    from mxene_coin_cell_data_pipeline_spark.functions.similarity import (
        pq_adc_topk,
    )

    vecs = {i: _det_vec(i) for i in range(8)}
    # vector 7 := centroid 2 duplicated, vector 6 := the query itself
    vecs[7] = list(vecs[2])
    vecs[6] = list(vecs[0])
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], schema=schema
    )
    got = {
        r["vec_id"]: r["adc_nanos"] for r in pq_adc_topk(df, topk=7).collect()
    }
    assert got[6] == 0  # query twin: assigned code 0 per subspace, lut 0
    # centroid twin: adc == exact ||q_s - c_2||^2 summed
    qv, c2 = vecs[0], vecs[2]
    want = 0.0
    for s in range(4):
        qs, cs = qv[s * 16 : (s + 1) * 16], c2[s * 16 : (s + 1) * 16]
        want = want + (
            _dot_seq(qs, qs) - 2 * _dot_seq(qs, cs) + _dot_seq(cs, cs)
        )
    assert got[7] == round(want * 1e9)


# ---------------------------------------------------------------------------
# t24: iterative BPE merge training
# ---------------------------------------------------------------------------


def test_t24_apply_one_merge_overlap_runs():
    """Leftmost non-overlapping application on a==b runs: every other
    position merges; pair_count (overlapping statistic) intentionally
    exceeds the applied count on runs."""
    from mxene_coin_cell_data_pipeline_spark.functions.text import (
        apply_one_merge,
    )

    assert apply_one_merge(list("aaa"), "a", "a") == (["aa", "a"], 1)
    assert apply_one_merge(list("aaaa"), "a", "a") == (["aa", "aa"], 2)
    assert apply_one_merge(list("aaaaa"), "a", "a") == (["aa", "aa", "a"], 2)
    assert apply_one_merge(list("abab"), "a", "b") == (["ab", "ab"], 2)
    assert apply_one_merge(list("xay"), "a", "b") == (["x", "a", "y"], 0)


def test_t24_hand_trainer():
    """Hand-checkable corpus: 'scan scan scat' -> round 1 pair counts
    (s,c)=3, (c,a)=3, (a,n)=2, (a,t)=1 -> ties broken lexicographically:
    (c,a) beats (s,c). Verify two rounds by hand."""
    from mxene_coin_cell_data_pipeline_spark.functions.text import (
        bpe_train_merges_py,
    )

    out = bpe_train_merges_py({"scan": 2, "scat": 1}, rounds=2)
    r1 = out[0]
    assert (r1["sym_a"], r1["sym_b"]) == ("c", "a")
    assert r1["pair_count"] == 3 and r1["n_merged"] == 3
    # after r1: s|ca|n (x2), s|ca|t (x1) -> 9 tokens
    assert r1["n_tokens_after"] == 9
    r2 = out[1]
    # round 2 pairs: (s,ca)=3, (ca,n)=2, (ca,t)=1 -> max (s,ca)
    assert (r2["sym_a"], r2["sym_b"]) == ("s", "ca")
    assert r2["pair_count"] == 3 and r2["n_tokens_after"] == 6


def test_t24_spark_matches_pure_python(spark, sf_dir):
    import re as _re

    from mxene_coin_cell_data_pipeline_spark.functions.text import (
        bpe_train_merges,
        bpe_train_merges_py,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = [r.asDict() for r in bpe_train_merges(docs, rounds=8).collect()]
    got.sort(key=lambda r: r["rank"])
    words: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in _re.findall(r"[a-z0-9]+", (r["text"] or "").lower()):
            words[w] = words.get(w, 0) + 1
    want = bpe_train_merges_py(words, rounds=8)
    assert got == want
    # the trajectory is strictly decreasing while merges apply
    toks = [r["n_tokens_after"] for r in want]
    assert all(t2 < t1 for t1, t2 in zip(toks, toks[1:] or []))


def test_t24_trained_table_reproduces_encoding(spark, sf_dir):
    """The encode/train consistency claim: bpe_apply_merges (t23's
    single-step leftmost-minrank encoder) under the TRAINED merge
    table reproduces the trainer's final tokenization — corpus token
    count equals the last round's n_tokens_after."""
    import re as _re

    from mxene_coin_cell_data_pipeline_spark.functions.text import (
        bpe_apply_merges,
        bpe_train_merges_py,
    )
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    words: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in _re.findall(r"[a-z0-9]+", (r["text"] or "").lower()):
            words[w] = words.get(w, 0) + 1
    trained = bpe_train_merges_py(words, rounds=8)
    table = [(r["sym_a"], r["sym_b"]) for r in trained]
    total = sum(
        len(bpe_apply_merges(w, table)) * c for w, c in words.items()
    )
    assert total == trained[-1]["n_tokens_after"]


# ---------------------------------------------------------------------------
# m12: video-level near-dup via keyframe pHash
# ---------------------------------------------------------------------------


def _mk_video(scenes: list[list[int]], w: int, h: int, reps: int = 2) -> bytes:
    """Assemble a real AVI of real P3 PPM frames: each scene image is
    repeated ``reps`` times with sample 0 bumped +1 on the repeats
    (near-static), scene boundaries are full content changes."""
    from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
        make_avi,
    )

    frames = []
    for vals in scenes:
        for rep in range(reps):
            v = list(vals)
            if rep:
                v[0] = (v[0] + 1) % 256
            txt = (
                f"P3\n# fixture\n{w} {h}\n255\n" + " ".join(map(str, v)) + "\n"
            )
            frames.append(txt.encode("ascii"))
    return make_avi(frames)


def _scene(seed: str, n: int) -> list[int]:
    return [
        int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:2], 16)
        for j in range(n)
    ]


def test_m12_perturbed_sibling_video_fixture(spark):
    """The demanded robustness fixture at VIDEO level: a sibling video
    whose scene-0 image has ONE sample bumped keeps every keyframe
    fingerprint identical (pHash robustness, m11's property); a video
    with one whole scene REPLACED loses exactly that keyframe's match
    but still passes the >= half rule; a video with ALL scenes replaced
    matches nothing."""
    from pyspark.sql import types as T

    from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
        avi_keyframe_phash,
    )

    w, h = 6, 4
    n = 3 * w * h
    s0, s1 = _scene("a", n), _scene("b", n)
    perturbed = list(s0)
    perturbed[1] = (perturbed[1] + 1) % 256
    inv0 = [255 - x for x in s0]
    inv1 = [255 - x for x in s1]
    vids = {
        0: _mk_video([s0, s1], w, h),          # base
        1: _mk_video([perturbed, s1], w, h),   # sibling: 1-sample edit
        2: _mk_video([inv0, s1], w, h),        # one scene replaced
        3: _mk_video([inv0, inv1], w, h),      # all scenes replaced
    }
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(list(vids.items()), schema=schema)
    rows = avi_keyframe_phash(df).collect()
    fp = {(r["doc_id"], r["kf_idx"]): r["phash_bits"] for r in rows}
    n_kf = {r["doc_id"]: r["n_kf"] for r in rows}
    assert n_kf == {0: 2, 1: 2, 2: 2, 3: 2}  # both scene starts keyed

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    # sibling: every keyframe bit-identical (the m11 robustness at
    # video level)
    assert fp[(0, 0)] == fp[(1, 0)]
    assert fp[(0, 1)] == fp[(1, 1)]
    # one-scene replacement: that keyframe far outside the gate, the
    # other identical -> 1 of 2 matched, still >= half
    assert ham(fp[(0, 0)], fp[(2, 0)]) > 3
    assert fp[(0, 1)] == fp[(2, 1)]
    # full replacement: no keyframe within the gate
    assert ham(fp[(0, 0)], fp[(3, 0)]) > 3
    assert ham(fp[(0, 1)], fp[(3, 1)]) > 3


def test_m12_sibling_pairs_connected_at_sf0001(spark, sf_dir):
    """Non-vacuity + the match rule on the registered query: every
    even/odd sibling video pair present in the corpus is reported as a
    near-dup with a FULL keyframe match (the 1-sample scene-0 edit
    flips zero pHash bits), and audit columns respect their bounds."""
    from mxene_coin_cell_data_pipeline_spark.plans import QUERIES
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    rows = QUERIES["m12_video_phash_neardup"].spark(spark, sf_dir).collect()
    got = {(r["video_a"], r["video_b"]): r.asDict() for r in rows}
    ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    }
    siblings = [
        (2 * g, 2 * g + 1)
        for g in {d // 2 for d in ids}
        if 2 * g in ids and 2 * g + 1 in ids
    ]
    assert siblings, "corpus must contain sibling video pairs"
    full, partial = 0, 0
    for a, b in siblings:
        assert (a, b) in got, f"sibling pair {(a, b)} missing"
        r = got[(a, b)]
        g = a // 2
        wrap = (
            int(hashlib.md5(f"{g}:0:1".encode()).hexdigest()[:2], 16) == 255
        )
        if wrap:
            # the odd sibling's +1 WRAPPED 255 -> 0: a 255-magnitude
            # channel edit, a genuine content change — exactly the
            # scene-0 keyframe may legitimately diverge, and the pair
            # survives on the >= half rule (the partial-match path,
            # exercised by the corpus itself)
            assert r["n_matched_a"] >= r["n_kf_a"] - 1
            assert r["n_matched_b"] >= r["n_kf_b"] - 1
            partial += 1
        else:
            # a true +1 single-sample edit: pHash flips zero bits, the
            # m11 robustness property at video level — full match
            assert r["n_matched_a"] == r["n_kf_a"]
            assert r["n_matched_b"] == r["n_kf_b"]
            full += 1
    assert full > 0
    for r in got.values():
        assert 1 <= r["n_matched_a"] <= r["n_kf_a"] <= 6
        assert 1 <= r["n_matched_b"] <= r["n_kf_b"] <= 6
        assert 2 * r["n_matched_a"] >= r["n_kf_a"]
        assert 2 * r["n_matched_b"] >= r["n_kf_b"]


# ---------------------------------------------------------------------------
# p06: the wave-10 capstone chain
# ---------------------------------------------------------------------------


def _py_p06_reference(rows: list[tuple[int, str, str]]) -> dict[str, dict]:
    """Pure-Python re-implementation of the whole p06 chain:
    d20 span removal (k=8) -> sqrt-temperature integer quotas over
    survivors -> md5-rank selection -> 512-token packing -> BPE encode
    under BPE_MERGES. rows = (doc_id, source, text)."""
    from mxene_coin_cell_data_pipeline_spark.functions.text import (
        bpe_apply_merges,
    )

    K = 8
    toks = {
        d: re.findall(r"[a-z0-9]+", (t or "").lower()) for d, _s, t in rows
    }
    src = {d: s for d, s, _t in rows}
    # d20: min doc per gram, coverage by trailing-K window
    owner: dict[str, int] = {}
    for d in sorted(toks):
        w = toks[d]
        for i in range(len(w) - K + 1):
            g = " ".join(w[i : i + K])
            if g not in owner or owner[g] > d:
                owner[g] = min(owner.get(g, d), d)
    kept_toks: dict[int, list[str]] = {}
    for d, w in toks.items():
        starts = {
            i
            for i in range(len(w) - K + 1)
            if owner[" ".join(w[i : i + K])] < d
        }
        kept = [
            t
            for q, t in enumerate(w)
            if not any(s in starts for s in range(max(0, q - K + 1), q + 1))
        ]
        if kept:
            kept_toks[d] = kept
    # quotas over survivors (sqrt weighting, B = N DIV 5)
    import math as _m

    by_src: dict[str, list[int]] = {}
    for d in kept_toks:
        by_src.setdefault(src[d], []).append(d)
    n_s = {s: len(ds) for s, ds in by_src.items()}
    N = sum(n_s.values())
    w_s = {s: int(_m.isqrt(n)) for s, n in n_s.items()}
    S = sum(w_s.values())
    B = N // 5
    base = {s: (B * w_s[s]) // S for s in n_s}
    rem = {s: (B * w_s[s]) % S for s in n_s}
    L = B - sum(base.values())
    order = sorted(n_s, key=lambda s: (-rem[s], s))
    quota = {
        s: base[s] + (1 if i < L else 0) for i, s in enumerate(order)
    }
    out: dict[str, dict] = {}
    for s, ds in by_src.items():
        ranked = sorted(
            ds, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        selected = ranked[: quota[s]]
        sel_sig = sum(
            (i + 1)
            * int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
            for i, d in enumerate(ranked)
            if i < quota[s]
        )
        cum, crossers, tot = 0, 0, 0
        for d in sorted(selected):
            nk = len(kept_toks[d])
            if (cum + nk - 1) // 512 > cum // 512:
                crossers += 1
            cum += nk
            tot += nk
        bpe_total = sum(
            len(bpe_apply_merges(t))
            for d in selected
            for t in kept_toks[d]
        )
        out[s] = {
            "n_surv": n_s[s],
            "quota": quota[s],
            "n_selected": len(selected),
            "sel_sig": sel_sig,
            "kept_tok_total": tot,
            "n_packs": (tot + 511) // 512,
            "n_crossers": crossers,
            "bpe_tok_total": bpe_total,
        }
    return out


def test_p06_matches_pure_python_chain(spark, sf_dir):
    from mxene_coin_cell_data_pipeline_spark.plans import QUERIES
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    rows = [
        (r["doc_id"], r["source"], r["text"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    ]
    want = _py_p06_reference(rows)
    got = {
        r["source"]: r.asDict()
        for r in QUERIES["p06_tokenizer_corpus_pipeline"]
        .spark(spark, sf_dir)
        .collect()
    }
    n_in = {}
    for _d, s, _t in rows:
        n_in[s] = n_in.get(s, 0) + 1
    assert set(got) == set(n_in)
    for s, g in got.items():
        assert g["n_in"] == n_in[s]
        w = want.get(s)
        if w is None:
            assert g["n_surv"] == 0 and g["n_selected"] == 0
            continue
        for col, val in w.items():
            assert g[col] == val, (s, col, g[col], val)
    # the quota identity: budgets sum exactly to survivors DIV 5
    assert sum(g["quota"] for g in got.values()) == (
        sum(g["n_surv"] for g in got.values()) // 5
    )
    # feasibility on this corpus: every quota filled
    for g in got.values():
        assert g["n_selected"] == g["quota"]
