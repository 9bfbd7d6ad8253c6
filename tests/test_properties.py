"""Property tests (SURVEY.md §5): invariants the reference relies on
implicitly, made explicit and fuzzed.

Pure-Python kernels get full hypothesis fuzzing (no Spark in the loop);
Spark-level invariants use seeded random frames (one job per case keeps
the suite fast)."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from fixtures import arbin_frame
from mxene_coin_cell_data_pipeline_spark.operators.dqdv import _peak_voltage
from mxene_coin_cell_data_pipeline_spark.operators.energy import energy_wh_per_cycle
from mxene_coin_cell_data_pipeline_spark.operators.normalize import normalize_cycler


# ---------------------------------------------------------------- dQ/dV kernel
finite = st.floats(min_value=1.0, max_value=5.0, allow_nan=False)


@given(
    v=st.lists(finite, min_size=0, max_size=40),
    dv=st.sampled_from([0.005, 0.05, 0.5]),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_dqdv_kernel_properties(v, dv, data):
    q = data.draw(
        st.lists(
            st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
            min_size=len(v),
            max_size=len(v),
        )
    )
    va, qa = np.array(v, dtype=float), np.array(q, dtype=float)
    peak = _peak_voltage(va, qa, dv)
    if len(v) < 3:
        # reference guard: <3 rows → no peak (pipeline.py:209)
        assert math.isnan(peak)
    elif va.max() - va.min() < dv:
        # reference guard: span below grid step (pipeline.py:214)
        assert math.isnan(peak)
    elif len(np.arange(va.min(), va.max(), dv)) < 2:
        # kernel guard: a 1-point grid (span == dv exactly) has no
        # gradient — hypothesis found this edge on its own
        assert math.isnan(peak)
    else:
        # a valid peak is a grid point inside the voltage span
        assert va.min() <= peak <= va.max()
        # grid alignment: peak = V_min + k*dv for integer k
        k = (peak - va.min()) / dv
        assert abs(k - round(k)) < 1e-6


# ------------------------------------------------------- trapezoid vs np.trapz
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_energy_matches_numpy_trapz(spark, seed):
    rng = np.random.default_rng(seed)
    n = 50
    pdf = pd.DataFrame(
        {
            "cell_id": "C",
            "cycle_index": rng.integers(1, 4, n),
            "timestamp": pd.to_datetime(
                np.sort(rng.integers(0, 10**6, n)), unit="s", utc=True
            ).tz_localize(None),
            "step_type": rng.choice(["CC_DIS", "CC_CHG", "REST"], n),
            "voltage_v": rng.uniform(3.0, 4.2, n),
            "current_a": rng.uniform(-2.0, 2.0, n),
        }
    )
    got = {
        r["cycle_index"]: r["E_dis_Wh"]
        for r in energy_wh_per_cycle(spark.createDataFrame(pdf)).collect()
    }
    for cyc, g in pdf[pdf.step_type.str.contains("DIS")].groupby("cycle_index"):
        g = g.sort_values("timestamp")
        t = g["timestamp"].astype("int64").to_numpy() / 1e9
        p = (g["voltage_v"] * g["current_a"]).to_numpy()
        want = abs(np.trapz(p, t)) / 3600.0 if len(g) >= 2 else None
        if want is None:
            assert got[cyc] is None
        else:
            assert got[cyc] == pytest.approx(want, abs=1e-12)
    # cycles with no DIS rows must still be present, as NULL
    for cyc in pdf["cycle_index"].unique():
        assert cyc in got


# ------------------------------------------------------- sign-flip idempotence
def test_normalize_is_idempotent_on_current_sign(spark):
    pdf = arbin_frame()
    # corrupt the export: discharge logged positive → first normalize flips
    pdf["Current(A)"] = pdf["Current(A)"].abs()
    once = normalize_cycler(spark.createDataFrame(pdf), cell_id="C1")
    assert once.filter(
        once.step_type.contains("DIS") & (once.current_a > 0)
    ).count() == 0
    twice = normalize_cycler(once)
    assert twice.exceptAll(once).count() == 0
    assert once.exceptAll(twice).count() == 0


# --------------------------------------------- union/filter commutation (U1)
def test_union_filter_commute(spark):
    rng = np.random.default_rng(7)
    mk = lambda: spark.createDataFrame(  # noqa: E731
        pd.DataFrame(
            {
                "cycle_index": rng.integers(1, 10, 30),
                "Q_dis_Ah": rng.uniform(0, 3, 30),
            }
        )
    )
    a, b = mk(), mk()
    pred = "Q_dis_Ah > 1.5"
    left = a.unionByName(b).filter(pred)
    right = a.filter(pred).unionByName(b.filter(pred))
    assert left.exceptAll(right).count() == 0
    assert right.exceptAll(left).count() == 0
