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
#:
#: Round-4 rotation: the driver's correctness window covers a 50-query
#: prefix, so the prefix is swapped each round until every query has an
#: EXTERNAL verdict in some CORRECTNESS_r*.json. Rounds 1-3 verdicted
#: 80 distinct queries; this prefix is 50 drawn from the 62 that had
#: never been driver-checked. ROUND-5 ROTATION TODO: swap in the
#: remaining never-verdicted set — the family siblings a13/a15/a22/
#: o05/o13/w05/w06/c12/u02/j04/t06 plus the round-4 late
#: additions d12/d13/d14/m05/a26, the round-4 curation family
#: d15/o15/o16/s07/t14/s08, the wave-3 family
#: t15/g02/e14/d16/src04/m06/st09/t16, and the wave-4 family
#: m07/t17/t18/a27/s09/g03/e15/st10/a28/src05/p05/s10/e16/a29 — 45
#: queries; the window holds 50, so one rotation covers them all and
#: the union of r01-r05 windows reaches all 175.
_DRIVER_PREFIX = [
    # events / time-series alignment family
    "e03_range_join",
    "e05_ewma",
    "e06_interval_coverage",
    "e07_funnel",
    "e08_spatial_join",
    "e09_running_distinct",
    "e10_twap",
    "e11_ohlc_bars",
    "e12_asof_forward",
    "e13_interarrival_histogram",
    # relational / aggregate surface
    "a18_promo_ratio",
    "a19_priority_counts",
    "a20_approx_distinct_bound",
    "a25_approx_percentile_bound",
    "j08_salted_skew_agg",
    "j13_param_grid",
    "w10_navigation_functions",
    "c13_variant_shred",
    "c14_calendar_rollup",
    "c15_map_column_ops",
    "u04_bag_set_ops",
    "u05_bag_counts_derived",
    # iterative / sketch / layout / ops
    "g01_pagerank",
    "o06_stratified_sample",
    "o08_weighted_sample",
    "o09_zorder_layout",
    "o10_table_profile",
    "o11_compaction_bins",
    "o12_cohort_retention",
    "o14_gaps_islands",
    # sources + Python-integration surface
    "src01_jsonl_roundtrip",
    "src02_csv_fallback",
    "src03_python_datasource",
    "a23_scalar_pandas_udf",
    "a24_grouped_agg_pandas_udf",
    "u03_udtf_sentences",
    # streaming family (never-verdicted members)
    "st03_stream_dedup",
    "st05_stream_stream_join",
    "st06_stream_upsert_snapshot",
    # north-star: dedup / similarity / text / multimodal
    "d07_signlsh_neardup",
    "d11_url_dedup",
    "s05_kmeans_iteration",
    "s06_label_centroids",
    "t07_winnow_fingerprint",
    "t09_pii_redact",
    "t10_unigram_logprob",
    "t11_feature_hashing",
    "t12_explode_outer",
    "t13_curation_funnel",
    "m04_byte_features",
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


