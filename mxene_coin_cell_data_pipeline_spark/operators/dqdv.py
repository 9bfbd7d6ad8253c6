"""Per-cycle dQ/dV peak voltage + shift (SURVEY.md A8-A10).

The only reference operator that is not natively SQL-expressible
(/root/reference/pipeline.py:206-228): per cycle, interpolate Q(V) onto
a uniform voltage grid, take the finite-difference gradient, and report
the grid voltage at the gradient argmax. Implemented as the engine's
single ``applyInPandas`` kernel (grouped-map Pandas UDF, Arrow-batched:
the numpy math runs vectorized inside workers, one group per cycle).

The *shift* part (A10) is pure window algebra and stays JVM-side:
``v_ref`` = running first non-null peak in cycle order
(first_value ignorenulls over an unbounded-preceding frame);
``shift_mV = (v_pk − v_ref)·1000`` when the peak is valid.

Kernel semantics mirrored exactly:
- DIS rows only; NULL peak when fewer than 3 rows (pipeline.py:209);
- Q = discharge_ah − min(discharge_ah) within the cycle's DIS rows;
- sort by voltage; NULL when the voltage span < dV (pipeline.py:214);
- grid = arange(V_min, V_max, dV); linear interp; gradient; argmax is
  the first maximal grid point.

Scale: the shuffle is keyed by (cell, cycle) — bounded group sizes —
and the kernel ships only 3 needed columns through Arrow.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .._serde import register_self
from ._keys import cell_keys, cycle_keys, distinct_cycles, is_dis

register_self(sys.modules[__name__])

DEFAULT_DV = 0.05  # pipeline.py:206 (docs recommend 0.005 for real data)


def _peak_voltage(voltage: np.ndarray, dis_ah: np.ndarray, dv: float) -> float:
    """numpy kernel for one cycle's DIS rows; NaN when underdetermined."""
    if voltage.shape[0] < 3:
        return float("nan")
    q = dis_ah - np.nanmin(dis_ah)
    order = np.argsort(voltage, kind="stable")
    v_sorted, q_sorted = voltage[order], q[order]
    span = v_sorted[-1] - v_sorted[0]
    if not span >= dv:  # also rejects NaN spans
        return float("nan")
    vgrid = np.arange(v_sorted[0], v_sorted[-1], dv)
    if vgrid.shape[0] < 2:
        return float("nan")
    qgrid = np.interp(vgrid, v_sorted, q_sorted)
    dqdv = np.gradient(qgrid, dv)
    return float(vgrid[int(np.argmax(dqdv))])


def dqdv_peak_per_cycle(df: DataFrame, dv: float = DEFAULT_DV) -> DataFrame:
    keys = cycle_keys(df)
    has_cell = "cell_id" in df.columns

    out_fields = (
        ("cell_id string, " if has_cell else "")
        + "cycle_index long, dQdV_peak_V double"
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        head = pdf.iloc[0]
        pdf = pdf.sort_values("timestamp", kind="stable")
        peak = _peak_voltage(
            pdf["voltage_v"].to_numpy(dtype=float),
            pdf["discharge_ah"].to_numpy(dtype=float),
            dv,
        )
        row = {k: head[k] for k in keys}
        # NaN must become SQL NULL: DoubleType can hold a literal NaN,
        # which would poison the ignorenulls first_value below.
        row["dQdV_peak_V"] = peak if peak == peak else None
        return pd.DataFrame([row])

    dis = df.filter(is_dis()).select(*keys, "timestamp", "voltage_v", "discharge_ah")
    peaks = dis.groupBy(*keys).applyInPandas(compute, schema=out_fields)
    full = distinct_cycles(df).join(peaks, keys, "left")

    ref_w = (
        Window.partitionBy(*cell_keys(df))
        .orderBy("cycle_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v_ref = F.first("dQdV_peak_V", ignorenulls=True).over(ref_w)
    return full.withColumn(
        "dQdV_shift_mV",
        F.when(
            F.col("dQdV_peak_V").isNotNull(),
            (F.col("dQdV_peak_V") - v_ref) * F.lit(1000.0),
        ),
    )
