"""Parquet table loaders for the driver star-schema test data.

The driver-generated parquet (TESTDATA.md) stores some timestamp
columns as parquet TIMESTAMP(NANOS), which Spark cannot decode natively
(PARQUET_TYPE_ILLEGAL). We read with
``spark.sql.legacy.parquet.nanosAsLong=true`` and convert the resulting
long nanoseconds back to microsecond timestamps JVM-side
(``timestamp_micros(ns div 1000)`` — pure integer math, no UDF, exactly
matching DuckDB's nanos->micros truncation so oracle comparisons line
up bit-for-bit on the integer microsecond value).

At 100 TB the same loader applies unchanged: the conversion is a
projection fused into the scan (no shuffle), and filter pushdown /
column pruning on all non-converted columns is preserved.
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
    """Load one star-schema table, fixing nano-timestamp columns."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in _nano_timestamp_columns(path):
        # integer division keeps full µs precision (ns values overflow
        # double mantissa); truncation matches DuckDB TIMESTAMP_NS→µs.
        df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() queries."""
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
