"""Local mirror of the driver's DuckDB oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet, compares:
row count, column names, and values (rows sorted canonically; floats
at 1e-9 relative tolerance). Also reports whether the match was
bit-exact, to estimate exposure to a tolerance-free hash.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mxene_coin_cell_data_pipeline_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False):
        key = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                key.append((0, ""))
            else:
                key.append((1, str(v)))
        rows.append((tuple(key), row))
    rows.sort(key=lambda r: r[0])
    return [r[1] for r in rows]


def _eq(a, b, rel=1e-9):
    a_null = a is None or (isinstance(a, float) and math.isnan(a))
    b_null = b is None or (isinstance(b, float) and math.isnan(b))
    if a_null or b_null:
        return a_null and b_null, a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        exact = fa == fb
        close = exact or abs(fa - fb) <= rel * max(1.0, abs(fa), abs(fb))
        return close, exact
    return a == b, a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, rel=1e-9) -> dict:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    result = {
        "rows_spark": len(sp),
        "rows_oracle": len(du),
        "cols_spark": sorted(sp.columns),
        "cols_oracle": sorted(du.columns),
        "match": False,
        "exact": False,
        "detail": "",
    }
    if sorted(sp.columns) != sorted(du.columns):
        result["detail"] = "column mismatch"
        return result
    if len(sp) != len(du):
        result["detail"] = "row count mismatch"
        return result
    a_rows, b_rows = _canon(sp), _canon(du)
    all_exact = True
    for i, (ra, rb) in enumerate(zip(a_rows, b_rows)):
        for va, vb, col in zip(ra, rb, sorted(sp.columns)):
            close, exact = _eq(va, vb, rel)
            all_exact = all_exact and exact
            if not close:
                result["detail"] = f"value mismatch row {i} col {col}: {va!r} != {vb!r}"
                return result
    result["match"] = True
    result["exact"] = all_exact
    return result
