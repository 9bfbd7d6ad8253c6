"""The bench-only xxhash64 production twins (bench.py _bench_only)
are not registry entries — no oracle runs them — so pin here that
they build, execute, and return the same shape as their md5 oracle
siblings. The shared kernels' md5/xxhash64 equivalence is covered by
tests/test_hash_modes.py; this guards the bench wiring itself."""

from __future__ import annotations

import importlib.util
import pathlib
import sys


def _load_bench():
    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location("bench", root / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_bench_only_twins_run_and_match_sibling_schemas(spark, sf_dir):
    from mxene_coin_cell_data_pipeline_spark.plans import QUERIES

    bench = _load_bench()
    twins = bench._bench_only()
    assert set(twins) == {
        "d02_minhash_lsh_xxh",
        "d06_near_dup_groups_xxh",
        "a28_countmin_freq_xxh",
        "t11_feature_hashing_xxh",
        "d17_window_duprate_xxh",
        "d18_incremental_dedup_xxh",
    }
    # exact expected column sets per twin — a twin drifting to another
    # query's shape must FAIL here, so no disjunctions
    expected_cols = {
        "d02_minhash_lsh_xxh": {"doc_a", "doc_b", "jaccard"},
        "d06_near_dup_groups_xxh": set(
            QUERIES["d06_near_dup_groups"].spark(spark, sf_dir).columns
        ),
        "a28_countmin_freq_xxh": {"token", "cms_n", "exact_n"},
        "t11_feature_hashing_xxh": set(
            QUERIES["t11_feature_hashing"].spark(spark, sf_dir).columns
        ),
        "d17_window_duprate_xxh": {
            "doc_id", "n_windows", "n_dup_windows", "dup_frac"
        },
        "d18_incremental_dedup_xxh": {
            "batch_doc", "n_matches", "first_match", "max_jaccard_nanos"
        },
    }
    for name, fn in twins.items():
        df = fn(spark, sf_dir)
        # executes the plan end-to-end; sf0.001 corpora are tiny but
        # never empty for these four (d02's near-dup pairs can be, so
        # assert only that the count is a well-defined non-negative)
        assert df.limit(5).count() >= 0
        got = set(df.columns)
        want = expected_cols[name]
        assert got == want, f"{name}: {got} != {want}"
