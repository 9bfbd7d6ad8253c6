"""Normalize vendor cycler data to the canonical timeseries schema.

Spark-first re-expression of the reference normalize stage
(/root/reference/pipeline.py:16-151, step2_normalize.py): soft vendor
renames, lenient casts, step-label canonicalization, unit rescale,
discharge-negative sign convention, canonical projection.

Everything is a single declarative projection (one Catalyst plan, fully
codegen'd, no shuffle) except the sign-flip decision, which is
inherently a two-phase global aggregate (pipeline.py:131-135): one
cheap map-side-combined `avg` per cell, then a conditional negate.

Scale: with a `cell_id` column the sign decision is computed per cell
in one aggregation and applied via a broadcast join of the tiny
per-cell decision table — no collect of data rows, works at any number
of cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..schema import (
    ARBIN_MAP,
    CANONICAL_COLUMNS,
    CYCLE_CANDIDATES,
    NEWARE_MAP,
    STEP_CANDIDATES,
    STEP_TYPE_MAP,
)


def _soft_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename only source columns that exist; first writer of a target
    wins (guards against duplicate canonical columns, which pandas
    would silently create; see pipeline.py:69-75)."""
    present: dict[str, str] = {}
    existing = set(df.columns)
    for src, dst in mapping.items():
        if src in existing and dst not in existing and dst not in present.values():
            present[src] = dst
    return df.withColumnsRenamed(present) if present else df


def _lenient_double(col: Column) -> Column:
    """pandas ``to_numeric(errors="coerce")`` equivalent; ANSI-safe."""
    return col.cast("string").try_cast("double")


def _canonical_step_type(col: Column) -> Column:
    """Uppercase + exact-label replacement (pipeline.py:110-115).

    pandas ``astype(str)`` stringifies missing values to ``"nan"`` →
    upper ``"NAN"``; mirrored with the coalesce so downstream substring
    filters see the same tokens the reference sees.
    """
    upper = F.upper(F.coalesce(col.cast("string"), F.lit("nan")))
    mapping = F.create_map(
        *[F.lit(x) for kv in STEP_TYPE_MAP.items() for x in kv]
    )
    return F.coalesce(F.element_at(mapping, upper), upper)


def normalize_cycler_stateless(df: DataFrame, cell_id: str | None = None) -> DataFrame:
    """The per-row (stateless) part of normalize: renames, casts, label
    canonicalization, unit rescale, canonical projection.

    No aggregation, no sort — a single narrow projection, so it applies
    unchanged to a *streaming* DataFrame (streaming/ingest.py). The
    batch ``normalize_cycler`` adds the two stateful phases on top:
    the global sign-flip decision (C10) and the canonical ordering (O1).
    """
    df = df.toDF(*[c.strip() for c in df.columns])  # P1, pipeline.py:26
    df = _soft_rename(df, ARBIN_MAP)  # P2
    df = _soft_rename(df, NEWARE_MAP)

    # --- timestamp (C1/C2, pipeline.py:79-85)
    if "timestamp" in df.columns:
        df = df.withColumn(
            "timestamp", F.try_to_timestamp(F.col("timestamp").cast("string"))
        )
    elif "test_time_s" in df.columns:
        df = df.withColumn(
            "timestamp", F.timestamp_seconds(_lenient_double(F.col("test_time_s")))
        )
    else:
        raise ValueError(
            "No timestamp-like column found (expected Date_Time/Record Time "
            "or Test Time (s))."
        )

    # --- cycle & step indices (P3/C3, pipeline.py:88-99)
    if "cycle_index" not in df.columns:
        for cand in CYCLE_CANDIDATES:
            if cand in df.columns:
                df = df.withColumnRenamed(cand, "cycle_index")
                break
    if "step_index" not in df.columns:
        for cand in STEP_CANDIDATES:
            if cand in df.columns:
                df = df.withColumnRenamed(cand, "step_index")
                break
    for idx_col in ("cycle_index", "step_index"):
        src = (
            _lenient_double(F.col(idx_col))
            if idx_col in df.columns
            else F.lit(None).cast("double")
        )
        # to_numeric(...).astype("Int64") accepts "3.0" → 3: go through
        # double, then truncate to long.
        df = df.withColumn(idx_col, src.try_cast("long"))

    # --- step type (C5/C6, pipeline.py:102-115)
    if "step_type" not in df.columns:
        cur_col = (
            "current_a"
            if "current_a" in df.columns
            else ("current_mA" if "current_mA" in df.columns else None)
        )
        if cur_col is not None:
            cur = _lenient_double(F.col(cur_col))
            df = df.withColumn(
                "step_type",
                F.when(cur < 0, F.lit("CC_DIS"))
                .when(cur > 0, F.lit("CC_CHG"))
                .otherwise(F.lit("REST")),
            )
        else:
            df = df.withColumn("step_type", F.lit("REST"))
    df = df.withColumn("step_type", _canonical_step_type(F.col("step_type")))

    # --- units → A/V/Ah (C4, pipeline.py:118-125)
    for base, milli in [
        ("current_a", "current_mA"),
        ("voltage_v", "voltage_mV"),
        ("charge_ah", "charge_mAh"),
        ("discharge_ah", "discharge_mAh"),
    ]:
        if base not in df.columns and milli in df.columns:
            df = df.withColumn(base, _lenient_double(F.col(milli)) / F.lit(1000.0))

    # make all numeric canonical columns true doubles regardless of the
    # CSV's string types (the reference relies on pandas inference here)
    for c in ("current_a", "voltage_v", "charge_ah", "discharge_ah", "temp_c"):
        if c in df.columns:
            df = df.withColumn(c, _lenient_double(F.col(c)))

    # --- canonical projection (P4/P8, pipeline.py:138-145)
    if "temp_c" not in df.columns:
        df = df.withColumn("temp_c", F.lit(None).cast("double"))
    missing = [c for c in CANONICAL_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"Missing required column after normalization: {missing[0]}"
        )

    has_cell = "cell_id" in df.columns
    if cell_id is not None and not has_cell:
        df = df.withColumn("cell_id", F.lit(cell_id))
        has_cell = True
    out_cols = (["cell_id"] if has_cell else []) + CANONICAL_COLUMNS
    return df.select(*out_cols)


def sign_flip_decisions(df: DataFrame) -> DataFrame:
    """Per-cell sign-flip decision table ``(cell_id, _flip)`` (C10,
    pipeline.py:131-135): flip when >80% of discharge-step rows carry
    positive current. One map-side-combined avg per cell; the result is
    tiny (one row per cell) and is broadcast back onto the data.

    Streaming ingest reuses this as its batch-calibration step: compute
    the decisions once over history, feed them to
    ``streaming.normalize_cycler_stream`` as a static broadcast side.
    """
    dis = F.coalesce(F.col("step_type").contains("DIS"), F.lit(False))
    pos = F.when(F.col("current_a") > 0, 1.0).otherwise(0.0)
    return (
        df.filter(dis)
        .groupBy("cell_id")
        .agg(F.avg(pos).alias("_pos_frac"))
        .withColumn("_flip", F.col("_pos_frac") > 0.8)
        .drop("_pos_frac")
    )


def apply_sign_flip(df: DataFrame, decisions: DataFrame) -> DataFrame:
    """Negate ``current_a`` for cells marked ``_flip`` (broadcast join)."""
    return (
        df.join(F.broadcast(decisions), "cell_id", "left")
        .withColumn(
            "current_a",
            F.when(F.coalesce(F.col("_flip"), F.lit(False)), -F.col("current_a"))
            .otherwise(F.col("current_a")),
        )
        .drop("_flip")
    )


def normalize_cycler(df: DataFrame, cell_id: str | None = None) -> DataFrame:
    """Vendor CSV DataFrame (all-string ok) → canonical timeseries.

    Output schema: CANONICAL_COLUMNS (+ leading ``cell_id`` when given),
    sorted by timestamp within cell. Raises ValueError when no
    timestamp-like or required column can be derived
    (pipeline.py:85,145).
    """
    df = normalize_cycler_stateless(df, cell_id)
    has_cell = "cell_id" in df.columns

    # --- discharge-negative convention (C10, pipeline.py:131-135).
    # Reference: if >80% of DIS rows have positive current, negate the
    # whole current column. Two-phase: per-cell fraction (map-side
    # combined avg), broadcast the tiny decision table back.
    if has_cell:
        df = apply_sign_flip(df, sign_flip_decisions(df))
    else:
        dis = F.coalesce(F.col("step_type").contains("DIS"), F.lit(False))
        pos = F.when(F.col("current_a") > 0, 1.0).otherwise(0.0)
        row = df.filter(dis).agg(F.avg(pos).alias("f")).first()
        if row is not None and row["f"] is not None and row["f"] > 0.8:
            df = df.withColumn("current_a", -F.col("current_a"))

    # --- canonical ordering (O1, pipeline.py:148). At scale we sort
    # within cell partitions instead of one global range sort.
    if has_cell:
        df = df.repartition("cell_id").sortWithinPartitions("cell_id", "timestamp")
    else:
        df = df.orderBy("timestamp")
    return df
