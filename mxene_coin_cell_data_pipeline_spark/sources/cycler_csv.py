"""Cycler CSV source with delimiter fallback (SURVEY.md §2.1 S1/S2).

Reference behavior: ``pd.read_csv`` then retry with ``sep=";"`` on
failure (/root/reference/pipeline.py:19-23). pandas fails on a
semicolon file because the comma-sniffed parse yields ragged rows; a
Spark CSV read never "fails" that way, so the equivalent detection is:
if the header parses to a single column containing ``;``, re-read with
``sep=";"``. Detection reads only the first line driver-side — the
distributed scan happens once, with the right delimiter.

All columns are read as strings (header=True, no inferSchema): the
normalize operator owns every cast, so semantics never depend on
Spark's CSV type inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sniff_delimiter(spark: SparkSession, path: str) -> str:
    """Pick ',' vs ';' from the header line (cheap driver-side read)."""
    header = spark.read.text(path).limit(1).collect()
    if not header:
        return ","
    line = header[0][0]
    if ";" in line and "," not in line:
        return ";"
    return ","


def read_cycler_csv(spark: SparkSession, path: str, sep: str | None = None) -> DataFrame:
    """Read a vendor cycler CSV with delimiter fallback; all-string schema."""
    if sep is None:
        sep = _sniff_delimiter(spark, path)
    df = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    # trim header whitespace (pipeline.py:26)
    trimmed = [c.strip() for c in df.columns]
    if trimmed != list(df.columns):
        df = df.toDF(*trimmed)
    return df
