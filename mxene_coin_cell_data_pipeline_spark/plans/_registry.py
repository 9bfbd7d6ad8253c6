"""Driver-contract query registry (SURVEY.md §2 coverage).

Every entry pairs an idiomatic-Spark implementation with an equivalent
DuckDB oracle SQL over the same parquet tables; the driver hash-compares
them at sf=0.01 (BASELINE.md "t2"). Each entry is tagged with the
SURVEY.md §2 operator IDs it covers so coverage is auditable line by
line.

Conventions (the driver compare sorts columns by name and hashes values
order-insensitively):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- timestamps are output as integer epoch-microseconds (``*_us``) —
  bit-exact across engines, immune to session-timezone differences;
- nondeterministic selections (top-k, argmin/argmax) always carry a
  total tie-break;
- queries set session timezone UTC and read via sources.tables so they
  behave identically under the driver's own SparkSession.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    survey: str = ""  # SURVEY.md §2 operator IDs covered
    note: str = ""


QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, survey: str, note: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(spark=fn, oracle=oracle, survey=survey, note=note)
        return fn

    return deco


def _ctx(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load tables (nanos-compat parquet read; see sources/tables.py).

    The LOADERS are session-timezone independent at the storage layer
    (verified: tests/test_timezone_independence.py), and ``load_table``
    additionally pins ``spark.sql.session.timeZone=UTC`` so the
    calendar-function queries (year/weekofyear/date_trunc, date
    literals on LTZ columns) evaluate on the same UTC calendar as the
    DuckDB oracle's naive timestamps regardless of how the driver
    built its session. Measured boundary: none — a full driver_check
    sweep under ``--tz America/New_York`` is green (round 4; rounds
    1-3 it failed exactly the 14 calendar queries).
    """
    return [load_table(spark, sf_dir, n) for n in names]


def _dsum6(col) -> F.Column:
    """Exact sum of fixed-decimal data, scale-independent.

    ``round(sum(x), 6)`` of a double sum is only stable while the
    accumulated double error stays under the 5e-7 half-grid — that
    error grows with n·magnitude, so a form verified at sf0.1 can flip
    at larger scale factors. This form instead rounds each ADDEND to
    the 1e-6 grid (bit-identical per row on both engines — the same
    per-row round the old form applied once at the end) and accumulates
    in DECIMAL(38,6): exact, associative, partition-layout and
    scale-factor independent up to 1e32 totals. Oracle mirror:
    ``CAST(sum(CAST(round(x, 6) AS DECIMAL(38,6))) AS DOUBLE)``.

    CHOOSING _dsum6 vs _fsum6: the SUM here is exact at any scale, but
    the final decimal->double cast is only cross-engine-identical while
    the total stays under 2^53 micro-units (~9.0e9 units) — DuckDB
    double-rounds (int128 -> double -> /1e6) where Spark rounds once
    (measured at 100x: q01's 2.8e11 totals landed on adjacent doubles).
    Use _dsum6 where the per-group total is structurally bounded (q03's
    per-order revenue, streaming per-window rollups); use _fsum6 where
    totals grow with corpus size (q01/q05 whole-table or nation-level
    sums). Every registered _dsum6 site was swept green at 100x — the
    largest (q07/q09/a14 group totals ~2e9) cross the boundary only
    past ~500x sf0.1.
    """
    return F.sum(F.round(col, 6).cast("decimal(38,6)")).cast("double")


def _fsum6(col) -> F.Column:
    """Exact micro-unit sum of fixed-decimal data, safe for LARGE totals.

    _dsum6's DECIMAL(38,6) accumulation is exact, but its final
    decimal->double cast is engine-dependent once the total passes
    ~2^53 micro-units (~9e9): DuckDB converts int128 -> double -> /1e6
    (two roundings) where Spark rounds the decimal once — at 100x data
    q01's 2.8e11 sum_charge landed on ADJACENT doubles (measured; the
    per-addend decimals were multiset-identical). This form accumulates
    ``floor(x*1e6 + 0.5)`` int64 micro-units — multiply/add/floor are
    IEEE-identical per row on both engines, the integer sum is exact —
    and both engines then derive the double through the SAME two ops
    (int64->double cast, /1e6), so the result is bit-identical at any
    total. The e10/g01/energy fixed-point idiom, applied to sums.

    Bound: int64 overflows at 9.2e18 micro-units = 9.2e12 units; raise
    the guard like operators/energy.py if a use case approaches it
    (100x lineitem totals are 2.8e17 micro — 32x headroom).
    Oracle mirror: ``CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS
    BIGINT)) AS DOUBLE) / 1000000.0``.
    """
    return F.sum(
        F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    ).cast("double") / F.lit(1000000.0)


def _fsum6_micro(col) -> F.Column:
    """The raw int64 micro-unit sum behind _fsum6 — use when the total
    feeds an exact comparison (j10's max-equality) or a ratio whose
    scale cancels (q08/a18): integer equality/division on identical
    operands is deterministic where double-sum comparison is not."""
    return F.sum(F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("long"))


#: Driver-facing registration order. The correctness driver checks a
#: PREFIX window of the registry (50 queries in rounds 1-2), so the
#: highest-value coverage heads are listed first: the TPC-H plan-shape
#: family, the streaming family, and the north-star dedup/similarity/
#: text/multimodal heads — every one oracle-backed and green in the
#: full driver_check sweep. Everything not listed follows in
#: definition order, so the full registry is always exported.
#: Round-8 rotation (VERDICT r07 task 6): every query's latest driver
#: verdict is green (union of r01-r07 windows = 176/176), so this
#: window is pure staleness rotation — leads with the three queries
#: whose oracles changed this round (d05: the AllPairs length+
#: positional filter set with the candidate-bounded verify aggregate;
#: d06/d14: bounded closure-audit restatement with the linear-state
#: label-propagation oracle), then all 27 queries whose last driver
#: verdict is r04, topped up with the stalest r05-last entries to
#: fill 50. The round-8 wave-6 additions (d17/d18/t19/t20/s11) have
#: never held a driver verdict, so they take the head ahead of the
#: rotation (the tail spills past 50 and re-enters next rotation).
_DRIVER_PREFIX = [
    # — NEW this round (wave 6): never driver-verified, so they lead —
    "d17_window_duprate",
    "d18_incremental_dedup",
    "t19_bpe_top_merges",
    "t20_inverted_index",
    "s11_pq_assign",
    "st11_stream_incremental_dedup",
    "s12_random_projection",
    "m09_avi_keyframes",
    "d19_containment_pairs",
    "src06_schema_evolution",
    "t21_bigram_lm_score",
    "o17_merge_upsert",
    "j14_dynamic_partition_pruning",
    "m10_image_ahash_neardup",
    "t22_token_drift",
    # — oracles changed this round —
    "d05_ngram_jaccard",
    "d06_near_dup_groups",
    "d14_star_cap_groups",
    # — all 27 queries whose last driver verdict is r04 —
    "o10_table_profile",
    "e07_funnel",
    "o11_compaction_bins",
    "d11_url_dedup",
    "t10_unigram_logprob",
    "c14_calendar_rollup",
    "w10_navigation_functions",
    "src01_jsonl_roundtrip",
    "src02_csv_fallback",
    "c15_map_column_ops",
    "u04_bag_set_ops",
    "e09_running_distinct",
    "o12_cohort_retention",
    "s06_label_centroids",
    "e10_twap",
    "e11_ohlc_bars",
    "o14_gaps_islands",
    "e12_asof_forward",
    "e13_interarrival_histogram",
    "t11_feature_hashing",
    "u05_bag_counts_derived",
    "a23_scalar_pandas_udf",
    "src03_python_datasource",
    "a25_approx_percentile_bound",
    "j13_param_grid",
    "t12_explode_outer",
    "t13_curation_funnel",
    # — stalest r05-last fills to hold the window at 50 —
    "d02_minhash_lsh",
    "m05_ppm_decode",
    "d09_simhash_hamming",
    "d12_lsh_star_cap",
    "d13_simhash_star_cap",
    "j04_outer_custdist",
    "u02_intersect_except",
    "w05_ntile_cume",
    "c12_json_extract",
    "t06_top_bigrams",
    "o05_hash_split",
    "w06_range_frame",
    "a15_listagg",
    "a13_percentiles",
    "o07_latest_by_key",
    "a26_hll_sketch_merge",
    "o13_winsorize",
    "a22_zscore",
    "d15_decontaminate",
    "o15_sequence_pack",
]


def _driver_order() -> list[str]:
    rest = [n for n in QUERIES if n not in _DRIVER_PREFIX]
    return [n for n in _DRIVER_PREFIX if n in QUERIES] + rest


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].spark for name in _driver_order()}


def oracle_sqls() -> dict[str, str]:
    return {
        n: QUERIES[n].oracle
        for n in _driver_order()
        if QUERIES[n].oracle is not None
    }


