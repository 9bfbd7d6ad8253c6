"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``mxene_coin_cell_data_pipeline_spark``;
this module is a thin adapter. Queries are registered in
``mxene_coin_cell_data_pipeline_spark/plans/queries.py`` with their
oracle SQL side by side (one source of truth, SURVEY.md §2 tags on
each).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mxene_coin_cell_data_pipeline_spark.plans import (  # noqa: E402
    oracle_sqls,
    query_fns,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full cycler feature pipeline (normalize-mapped events →
    capacity/CE + trapezoid energy + IR@C/2 + dQ/dV peak/shift + q_norm)
    on /root/testdata/sf0.001."""
    from mxene_coin_cell_data_pipeline_spark.plans.flagship import flagship_features

    return flagship_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    north-star dedup/similarity/text/multimodal operators."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query — all entries in
    ``queries()`` are oracle-backed (including p01, the end-to-end
    pipeline composite, and the m02 decode path via a hex-nibble SQL
    re-derivation); none are rows-only."""
    return oracle_sqls()
