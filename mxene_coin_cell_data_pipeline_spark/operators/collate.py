"""Multi-cell collation (SURVEY.md S6/U1/P6/P7).

Reference (/root/reference/step13_collate.py): glob per-cell CSVs,
derive ``cell_id`` from the filename stem, union everything with
``cell_id`` as the leading column.

Spark-first: ONE globbed distributed scan + ``input_file_name()`` +
``regexp_extract`` — not a driver loop over files. The per-file
"fill cell_id if missing/empty" rule is a coalesce over a nullif.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F


def add_cell_id(df: DataFrame, cell_id: str) -> DataFrame:
    """Add/fill ``cell_id`` and move it first (step13_collate.py:8-17).

    The reference fills only when the column is entirely null/empty
    (an all-or-nothing rule requiring a global look); per-row coalesce
    is the scale-safe equivalent and matches on every reference input
    (the column, when present, is either fully set or fully empty).
    """
    if "cell_id" not in df.columns:
        df = df.withColumn("cell_id", F.lit(cell_id))
    else:
        df = df.withColumn(
            "cell_id",
            F.coalesce(F.nullif(F.col("cell_id").cast("string"), F.lit("")), F.lit(cell_id)),
        )
    rest = [c for c in df.columns if c != "cell_id"]
    return df.select("cell_id", *rest)


def collate_feature_csvs(
    spark: SparkSession, glob_path: str, suffix: str = "_features_full"
) -> DataFrame:
    """Union all ``*{suffix}.csv`` files with filename-derived cell_id."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(glob_path)
    stem = F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv$", 1)
    cid = F.regexp_replace(stem, f"{suffix}$", "")
    if "cell_id" in df.columns:
        df = df.withColumn(
            "cell_id", F.coalesce(F.nullif(F.col("cell_id").cast("string"), F.lit("")), cid)
        )
    else:
        df = df.withColumn("cell_id", cid)
    rest = [c for c in df.columns if c != "cell_id"]
    return df.select("cell_id", *rest)


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """unionByName with missing-column tolerance (U1)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )
