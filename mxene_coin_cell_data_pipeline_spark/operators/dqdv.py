"""Per-cycle dQ/dV peak voltage + shift (SURVEY.md A8-A10).

The only reference operator that is not natively SQL-expressible
(/root/reference/pipeline.py:206-228): per cycle, interpolate Q(V) onto
a uniform voltage grid, take the finite-difference gradient, and report
the grid voltage at the gradient argmax. The numpy math runs in Python
workers; everything else stays JVM-side.

Execution shape: ``repartition(keys)`` + ``mapInPandas`` — NOT
``applyInPandas``. applyInPandas invokes the Python UDF once per group
(~2 ms fixed overhead each); with hundreds of thousands of small
(cell, cycle) groups at scale that overhead dominates by 10×. Instead
we hash-partition by the group keys so each shuffle partition holds
complete groups, then run ONE Python call per partition that loops
pandas ``groupby`` over its groups. Partition memory is bounded by
data_size / shuffle.partitions — tune ``spark.sql.shuffle.partitions``
to the target scale as usual.

The *shift* part (A10) is pure window algebra and stays JVM-side:
``v_ref`` = running first non-null peak in cycle order
(first_value ignorenulls over an unbounded-preceding frame);
``shift_mV = (v_pk − v_ref)·1000`` when the peak is valid.

Kernel semantics mirrored exactly (golden-tested at 1e-9):
- DIS rows only; NULL peak when fewer than 3 rows (pipeline.py:209);
- Q = discharge_ah − min(discharge_ah) within the cycle's DIS rows;
- sort by voltage; NULL when the voltage span < dV (pipeline.py:214);
- grid = arange(V_min, V_max, dV); linear interp; gradient; argmax is
  the first maximal grid point.
"""

from __future__ import annotations

import sys
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .._serde import register_self
from ._keys import cell_keys, cycle_keys, distinct_cycles, drop_null_cycles, is_dis

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
    out_schema = (
        ("cell_id string, " if has_cell else "")
        + "cycle_index long, dQdV_peak_V double"
    )
    key_cols = list(keys)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a group's rows never span partitions (hash repartition below)
        # but may span Arrow batches within one — concat first
        pdfs = [b for b in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        pdf = pdf.sort_values("timestamp", kind="stable")
        out = []
        for key_vals, g in pdf.groupby(key_cols, sort=False):
            if not isinstance(key_vals, tuple):
                key_vals = (key_vals,)
            peak = _peak_voltage(
                g["voltage_v"].to_numpy(dtype=float),
                g["discharge_ah"].to_numpy(dtype=float),
                dv,
            )
            # NaN must become SQL NULL: DoubleType can hold a literal
            # NaN, which would poison the ignorenulls first_value below
            out.append((*key_vals, peak if peak == peak else None))
        yield pd.DataFrame(out, columns=key_cols + ["dQdV_peak_V"])

    dis = (
        drop_null_cycles(df)
        .filter(is_dis())
        .select(*keys, "timestamp", "voltage_v", "discharge_ah")
    )
    peaks = dis.repartition(*keys).mapInPandas(compute, schema=out_schema)
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
