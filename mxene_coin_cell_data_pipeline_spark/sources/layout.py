"""Physical layout utilities for the 100 TB deployment shape.

The engine's operators are all keyed by ``cell_id`` (every aggregation,
window, and join partitions on it — SURVEY.md §4), which dictates the
storage layout and the skew strategy:

- ``write_timeseries_partitioned`` / ``read_timeseries_partitioned``:
  the canonical parquet layer, hash-bucketed into ``cell_bucket=N/``
  directories. Scans for a subset of cells prune whole directories
  (PartitionFilters, verified in tests), and every per-cell operator
  runs shuffle-light because a bucket holds complete cells.
- ``salted_two_phase``: generic salt → partial → final aggregation for
  pathologically skewed keys (one cell with billions of rows). AQE's
  skew-join handling covers joins; this covers single-key aggregation
  skew, which AQE cannot split. Any algebraic aggregate (min/max/sum/
  count/max_by/min_by) composes: the same expression is applied to the
  salted partials and then to the per-key partials-of-partials.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

DEFAULT_CELL_BUCKETS = 256


def cell_bucket(n_buckets: int = DEFAULT_CELL_BUCKETS) -> Column:
    """Stable bucket id for a cell (xxhash64 — engine-stable, cheap)."""
    return F.pmod(F.xxhash64(F.col("cell_id")), F.lit(n_buckets)).alias(
        "cell_bucket"
    )


def write_timeseries_partitioned(
    df: DataFrame, path: str, n_buckets: int = DEFAULT_CELL_BUCKETS
) -> None:
    """Write the canonical timeseries parquet partitioned by cell
    bucket, rows time-sorted within each file (row-group skipping on
    timestamp ranges comes free from parquet min/max stats)."""
    (
        df.withColumn("cell_bucket", cell_bucket(n_buckets))
        .repartition("cell_bucket")
        .sortWithinPartitions("cell_id", "timestamp")
        .write.mode("overwrite")
        .partitionBy("cell_bucket")
        .parquet(path)
    )


def read_timeseries_partitioned(
    spark: SparkSession,
    path: str,
    cells: list[str] | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Read the partitioned layer; with ``cells`` given, add the
    bucket predicate so the scan prunes to the matching directories
    (partition pruning) before the exact cell filter applies."""
    df = spark.read.parquet(path)
    if cells is not None:
        if n_buckets is None:
            n_buckets = 1 + int(
                os.path.basename(
                    sorted(
                        p for p in os.listdir(path) if p.startswith("cell_bucket=")
                    )[-1]
                ).split("=")[1]
            )
        # compute bucket ids with a tiny Spark job (exact same hash)
        bdf = (
            spark.createDataFrame([(c,) for c in cells], "cell_id string")
            .select(cell_bucket(n_buckets))
            .distinct()
        )
        bucket_ids = [r["cell_bucket"] for r in bdf.collect()]
        df = df.filter(
            F.col("cell_bucket").isin(bucket_ids) & F.col("cell_id").isin(cells)
        )
    return df.drop("cell_bucket")


def salted_two_phase(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups by (keys + random salt) so a hot key's rows spread
    over ``n_salts`` reducers; phase 2 re-aggregates the partials by the
    real keys. ``aggs`` maps output column name → aggregate expression
    over the input columns; the same expression re-applied to the
    partial columns must be the combiner (true for algebraic
    aggregates: min, max, sum, count via sum, max_by/min_by with the
    ordering column carried through).

    Example::

        salted_two_phase(ts, ["cell_id", "cycle_index"],
                         {"Q_dis_Ah": F.max("discharge_ah")})
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.rand(seed=7)), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    # re-apply each aggregate over its own partial column
    final_aggs = []
    for name, expr in aggs.items():
        # rebuild the expression against the partial column by name:
        # callers pass combiner-safe aggregates, so re-application is
        # the combine step
        final_aggs.append(_reapply(expr, name))
    return partial.groupBy(*keys).agg(*final_aggs)


def _reapply(expr: Column, name: str) -> Column:
    """Re-apply an algebraic aggregate over its partial column.

    Supported combiners are derived from the expression head: min, max,
    sum, count→sum, avg is rejected (not algebraic without a count
    column — compute sum and count separately and divide).
    """
    head = expr._jc.toString().split("(")[0].lower()
    col = F.col(name)
    if head.startswith("min"):
        return F.min(col).alias(name)
    if head.startswith("max"):
        return F.max(col).alias(name)
    if head.startswith("sum"):
        return F.sum(col).alias(name)
    if head.startswith("count"):
        return F.sum(col).alias(name)
    raise ValueError(
        f"Aggregate {head!r} is not algebraic-combinable by re-application; "
        "use sum/count/min/max (avg = sum/count in two columns)."
    )


def zorder_key_2d(
    x: Column,
    y: Column,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    bits: int = 16,
) -> Column:
    """Z-order (Morton) clustering key over two dimensions: quantize
    each value to ``bits`` bits over its fixed range, then interleave
    the bits (x on odd positions, y on even). Rows sorted/range-
    partitioned by this key are clustered in BOTH dimensions at once,
    so per-file min/max statistics bound both columns and a scan with a
    predicate on either dimension prunes files — the multi-column
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER) that a single-
    column sort cannot give. Pure integer bit arithmetic in codegen;
    the ranges are fixed constants so the key is stable as data grows
    (re-clustering is a layout choice, not a correctness one).
    """
    scale = float(1 << bits)
    qx = F.least(
        F.floor((x - x_min) / (x_max - x_min) * scale), F.lit((1 << bits) - 1)
    ).cast("long")
    qx = F.greatest(qx, F.lit(0))
    qy = F.least(
        F.floor((y - y_min) / (y_max - y_min) * scale), F.lit((1 << bits) - 1)
    ).cast("long")
    qy = F.greatest(qy, F.lit(0))
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(qx, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        z = z + F.shiftleft(F.shiftright(qy, b).bitwiseAND(F.lit(1)), 2 * b)
    return z
