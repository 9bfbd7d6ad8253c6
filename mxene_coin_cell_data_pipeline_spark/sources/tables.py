"""Parquet table loaders for the driver star-schema test data.

Timestamp normalization: the engine's canonical timestamp type is
TIMESTAMP (LTZ, an instant) under a UTC session, matching DuckDB's
naive-timestamp oracle values on the stored integer microseconds.
Driver parquet has shipped two physical encodings across rounds:

- TIMESTAMP(NANOS): Spark cannot decode natively (PARQUET_TYPE_ILLEGAL);
  read with ``spark.sql.legacy.parquet.nanosAsLong=true`` and convert
  the long nanoseconds back JVM-side (``timestamp_micros(ns div 1000)``
  — pure integer math, no UDF, exactly DuckDB's nanos->micros
  truncation).
- TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 default
  (``spark.sql.parquet.inferTimestampNTZ.enabled=true``) reads these as
  TIMESTAMP_NTZ, which integer-time functions (``unix_micros``) reject.
  Normalize with ``to_utc_timestamp(col, 'UTC')`` — interprets the
  stored wall-clock micros as UTC instants, i.e. the identity on the
  underlying int64, independent of the session timezone.

Both conversions are projections fused into the scan (no shuffle);
filter pushdown / column pruning on all other columns is preserved.
At 100 TB the same loader applies unchanged.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F

#: tables available at every scale factor (TESTDATA.md)
TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nano_timestamp_columns(path: str) -> list[str]:
    """Columns whose parquet physical type is TIMESTAMP(NANOS).

    Uses a driver-side footer read (cheap: metadata only) so the loader
    works for any table without a hard-coded column list.
    """
    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table, normalizing timestamps to LTZ."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in _nano_timestamp_columns(path):
        # integer division keeps full µs precision (ns values overflow
        # double mantissa); truncation matches DuckDB TIMESTAMP_NS→µs.
        df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            # stored micros ARE the instant (identity on int64); LTZ so
            # unix_micros & friends resolve under any session
            df = df.withColumn(
                field.name, F.to_utc_timestamp(F.col(field.name), "UTC")
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() queries."""
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
