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
    }
    # every twin must be timed by the bench loop
    sibling_cols = {
        "d06_near_dup_groups_xxh": "d06_near_dup_groups",
        "a28_countmin_freq_xxh": "a28_countmin_freq",
    }
    for name, fn in twins.items():
        df = fn(spark, sf_dir)
        rows = df.limit(5).collect()  # executes the plan end-to-end
        assert rows is not None
        sib = sibling_cols.get(name)
        if sib:
            want = set(QUERIES[sib].spark(spark, sf_dir).columns)
            # a28's md5 form also emits the guarantee-check columns;
            # the twin keeps the sketch columns proper
            assert set(df.columns) <= want or set(df.columns) >= {
                "token",
                "cms_n",
                "exact_n",
            }
