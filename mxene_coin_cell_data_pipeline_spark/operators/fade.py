"""Capacity-fade fit + remaining-useful-life (SURVEY.md A11-A12).

Reference semantics (/root/reference/pipeline.py:231-242,302-307):
least-squares line q_norm ~ cycle_index; ``fade_slope_pct_per_cycle`` =
100·slope; ``cycles_to_80pct`` = (0.8 − intercept)/slope (NULL when the
slope is 0); NULL results with fewer than 2 points. ``np.polyfit``
propagates NaN, so any NULL q_norm nulls the whole fit — reproduced
with an explicit null-count guard (SQL ``regr_*`` would silently skip
null pairs).

Spark-first: the fit is the built-in OLS aggregates ``regr_slope`` /
``regr_intercept`` — single hash aggregate with map-side partial
aggregation, no window, no UDF. ``Q0_Ah`` = capacity at the minimum
cycle (``min_by``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._keys import cell_keys


def fade_and_rul(features: DataFrame, eol: float = 0.80) -> DataFrame:
    """Per-cell summary: cell_id?, Q0_Ah, fade_slope_pct_per_cycle,
    cycles_to_80pct."""
    keys = cell_keys(features)
    x = F.col("cycle_index").cast("double")
    y = F.col("q_norm")
    agg = features.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(y.isNull() | x.isNull(), 1).otherwise(0)).alias("_nbad"),
        F.regr_slope(y, x).alias("_m"),
        F.regr_intercept(y, x).alias("_b"),
        F.min_by("Q_dis_Ah", "cycle_index").alias("Q0_Ah"),
    )
    ok = (F.col("_n") >= 2) & (F.col("_nbad") == 0)
    m, b = F.col("_m"), F.col("_b")
    return agg.select(
        *keys,
        F.col("Q0_Ah"),
        F.when(ok, m * 100.0).alias("fade_slope_pct_per_cycle"),
        F.when(ok & (m != 0), (F.lit(float(eol)) - b) / m).alias("cycles_to_80pct"),
    )
