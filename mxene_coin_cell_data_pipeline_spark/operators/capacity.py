"""Per-cycle capacity + coulombic efficiency (SURVEY.md §2.6 A1-A4).

Reference semantics (/root/reference/pipeline.py:157-166):
- ``Q_dis_Ah`` / ``Q_chg_Ah`` = *last non-null* cumulative capacity in
  timestamp order within the cycle. The reference free-rides on a prior
  global sort + ``iloc[-1]``; Spark groupBy is unordered, so the order
  is made explicit with ``max_by(value, ts-when-value-non-null)`` —
  the #1 correctness trap called out in SURVEY.md §4.
- ``CE`` = Q_dis/Q_chg, NULL when Q_chg is NULL or 0 (guarded division,
  lazy per-row so it is ANSI-safe).
- ``q_norm`` = Q_dis / Q_dis(first cycle), an unbounded first_value
  window per cell. ``try_divide`` so a zero first-cycle capacity yields
  NULL instead of raising under ANSI sessions (Spark 4 default) —
  matching both the reference's NaN propagation (pipeline.py:165) and
  DuckDB's NULL-on-zero-divide oracle semantics.

Plan shape: one hash aggregate (map-side partial agg) + one tiny window
over the per-cycle output (thousands of rows per cell, not samples) —
no second shuffle over raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._keys import cell_keys, cycle_keys, drop_null_cycles


def _last_non_null(value: str, order: str = "timestamp") -> F.Column:
    return F.max_by(F.col(value), F.when(F.col(value).isNotNull(), F.col(order)))


def capacity_ce_per_cycle(df: DataFrame) -> DataFrame:
    keys = cycle_keys(df)
    agg = drop_null_cycles(df).groupBy(*keys).agg(
        _last_non_null("discharge_ah").alias("Q_dis_Ah"),
        _last_non_null("charge_ah").alias("Q_chg_Ah"),
    )
    qchg = F.col("Q_chg_Ah")
    agg = agg.withColumn(
        "CE",
        F.when(qchg.isNull() | (qchg == 0), F.lit(None).cast("double")).otherwise(
            F.col("Q_dis_Ah") / qchg
        ),
    )
    w = (
        Window.partitionBy(*cell_keys(df))
        .orderBy("cycle_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    agg = agg.withColumn(
        "q_norm", F.try_divide(F.col("Q_dis_Ah"), F.first("Q_dis_Ah").over(w))
    )
    return agg
