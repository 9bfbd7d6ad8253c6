"""Golden-output feature tests against closed-form fixture answers
(SURVEY.md §5: golden tests at 1e-9 tolerance), plus order-invariance
property tests for the ordered-aggregation rewrites (§4's #1 trap)."""

import numpy as np
import pandas as pd
import pytest

from mxene_coin_cell_data_pipeline_spark.operators import (
    capacity_ce_per_cycle,
    dqdv_peak_per_cycle,
    energy_wh_per_cycle,
    fade_and_rul,
    full_feature_pipeline,
    ir_c2_per_cycle,
    normalize_cycler,
)
from mxene_coin_cell_data_pipeline_spark.sources import read_cycler_csv

from fixtures import RATED_AH, arbin_frame, expected_features, expected_summary


@pytest.fixture(scope="module")
def ts(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("feat") / "arbin.csv"
    arbin_frame().to_csv(path, index=False)
    return normalize_cycler(read_cycler_csv(spark, str(path))).cache()


@pytest.fixture(scope="module")
def features(ts):
    return (
        full_feature_pipeline(ts, rated_ah=RATED_AH)
        .toPandas()
        .sort_values("cycle_index")
        .reset_index(drop=True)
    )


def test_feature_golden_values(features):
    exp = expected_features()
    assert list(features["cycle_index"]) == list(exp["cycle_index"])
    for col in [
        "Q_dis_Ah",
        "Q_chg_Ah",
        "CE",
        "q_norm",
        "E_dis_Wh",
        "IR_C2_ohm",
        "dQdV_peak_V",
        "dQdV_shift_mV",
    ]:
        assert features[col].to_numpy() == pytest.approx(
            exp[col].to_numpy(), abs=1e-9
        ), col


def test_summary_golden_values(ts):
    feat_df = full_feature_pipeline(ts, rated_ah=RATED_AH)
    summary = fade_and_rul(feat_df).first()
    exp = expected_summary()
    assert summary["Q0_Ah"] == pytest.approx(exp["Q0_Ah"], abs=1e-9)
    assert summary["fade_slope_pct_per_cycle"] == pytest.approx(
        exp["fade_slope_pct_per_cycle"], abs=1e-9
    )
    assert summary["cycles_to_80pct"] == pytest.approx(100.8, abs=1e-6)


def test_energy_invariant_under_row_shuffle(spark, ts):
    """The trapezoid must encode timestamp order explicitly — a shuffled
    input must give identical results (SURVEY.md §4)."""
    shuffled = ts.orderBy("voltage_v", "timestamp")
    a = (
        energy_wh_per_cycle(ts)
        .toPandas()
        .sort_values("cycle_index")["E_dis_Wh"]
        .to_numpy()
    )
    b = (
        energy_wh_per_cycle(shuffled)
        .toPandas()
        .sort_values("cycle_index")["E_dis_Wh"]
        .to_numpy()
    )
    assert a == pytest.approx(b, abs=1e-12)


def test_capacity_last_non_null(spark):
    """Empty trailing capacity cells → the last NON-NULL value wins."""
    pdf = pd.DataFrame(
        {
            "timestamp": pd.date_range("2025-01-01", periods=4, freq="60s"),
            "cycle_index": [1, 1, 1, 1],
            "step_index": [3, 3, 3, 3],
            "step_type": ["CC_DIS"] * 4,
            "current_a": [-1.0] * 4,
            "voltage_v": [4.0, 3.8, 3.6, 3.4],
            "temp_c": [25.0] * 4,
            "charge_ah": [2.0, 2.0, None, None],
            "discharge_ah": [0.0, 1.0, 1.5, None],
        }
    )
    df = spark.createDataFrame(pdf)
    row = capacity_ce_per_cycle(df).first()
    assert row["Q_dis_Ah"] == pytest.approx(1.5)
    assert row["Q_chg_Ah"] == pytest.approx(2.0)
    assert row["CE"] == pytest.approx(0.75)


def test_ce_guard_zero_and_null(spark):
    pdf = pd.DataFrame(
        {
            "timestamp": pd.date_range("2025-01-01", periods=4, freq="60s"),
            "cycle_index": [1, 1, 2, 2],
            "step_index": [3] * 4,
            "step_type": ["CC_DIS"] * 4,
            "current_a": [-1.0] * 4,
            "voltage_v": [4.0, 3.8, 4.0, 3.8],
            "temp_c": [25.0] * 4,
            "charge_ah": [0.0, 0.0, None, None],
            "discharge_ah": [1.0, 1.2, 1.0, 1.1],
        }
    )
    out = (
        capacity_ce_per_cycle(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("cycle_index")
    )
    assert out["CE"].isna().all()  # zero → NULL, all-null → NULL


def test_energy_guards(spark):
    """<2 DIS rows → NULL; cycles with no DIS rows still emit a row."""
    pdf = pd.DataFrame(
        {
            "timestamp": pd.date_range("2025-01-01", periods=3, freq="60s"),
            "cycle_index": [1, 2, 2],
            "step_index": [3, 1, 1],
            "step_type": ["CC_DIS", "CC_CHG", "CC_CHG"],
            "current_a": [-1.0, 1.0, 1.0],
            "voltage_v": [4.0, 3.8, 3.9],
            "temp_c": [25.0] * 3,
            "charge_ah": [1.0] * 3,
            "discharge_ah": [1.0] * 3,
        }
    )
    out = (
        energy_wh_per_cycle(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("cycle_index")
    )
    assert len(out) == 2
    assert out["E_dis_Wh"].isna().all()


def test_ir_no_pre_neighbor_is_null(spark):
    """If the argmin row is the first DIS row, pre-window is empty → NULL
    (pipeline.py:194)."""
    pdf = pd.DataFrame(
        {
            "timestamp": pd.date_range("2025-01-01", periods=3, freq="60s"),
            "cycle_index": [1] * 3,
            "step_index": [3] * 3,
            "step_type": ["CC_DIS"] * 3,
            "current_a": [-1.5, -0.5, -0.2],  # argmin(|abs(I)-1.5|) = row 0
            "voltage_v": [4.0, 3.8, 3.6],
            "temp_c": [25.0] * 3,
            "charge_ah": [1.0] * 3,
            "discharge_ah": [0.0, 0.5, 1.0],
        }
    )
    row = ir_c2_per_cycle(spark.createDataFrame(pdf), rated_ah=3.0).first()
    assert row["IR_C2_ohm"] is None


def test_dqdv_too_few_rows_and_shift_ref(spark):
    """<3 DIS rows → NULL peak; first valid peak becomes the shift
    reference (cycles before it have NULL shift)."""
    rows = []
    t = pd.Timestamp("2025-01-01")
    # cycle 1: only 2 DIS rows → NULL peak
    for i in range(2):
        rows.append((t, 1, "CC_DIS", -1.0, 4.0 - 0.3 * i, 0.5 * i))
        t += pd.Timedelta(seconds=60)
    # cycles 2,3: proper ramps, cycle 3 shifted +0.01 V
    for n, off in [(2, 0.0), (3, 0.01)]:
        for i in range(5):
            rows.append((t, n, "CC_DIS", -1.0, 4.2 + off - 0.25 * i, 0.3 * i))
            t += pd.Timedelta(seconds=60)
    pdf = pd.DataFrame(
        rows, columns=["timestamp", "cycle_index", "step_type", "current_a", "voltage_v", "discharge_ah"]
    )
    pdf["step_index"] = 3
    pdf["temp_c"] = 25.0
    pdf["charge_ah"] = 1.0
    out = (
        dqdv_peak_per_cycle(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("cycle_index")
        .reset_index(drop=True)
    )
    assert pd.isna(out.loc[0, "dQdV_peak_V"]) and pd.isna(out.loc[0, "dQdV_shift_mV"])
    assert out.loc[1, "dQdV_shift_mV"] == pytest.approx(0.0)
    assert out.loc[2, "dQdV_shift_mV"] == pytest.approx(10.0, abs=1e-6)


def test_multi_cell_features_match_single_cell(spark, tmp_path):
    """cell-partitioned execution of the whole pipeline == per-cell runs."""
    a = arbin_frame()
    a["cell_id"] = "c1"
    b = arbin_frame()
    b["cell_id"] = "c2"
    both = pd.concat([a, b], ignore_index=True)
    path = tmp_path / "cells.csv"
    both.to_csv(path, index=False)
    ts = normalize_cycler(read_cycler_csv(spark, str(path)))
    feat = full_feature_pipeline(ts, rated_ah=RATED_AH).toPandas()
    exp = expected_features()
    for cell in ["c1", "c2"]:
        sub = feat[feat["cell_id"] == cell].sort_values("cycle_index")
        for col in ["Q_dis_Ah", "CE", "E_dis_Wh", "IR_C2_ohm", "dQdV_peak_V"]:
            assert sub[col].to_numpy() == pytest.approx(exp[col].to_numpy(), abs=1e-9), (cell, col)


def test_energy_nan_power_nulls_cycle(spark):
    """A NaN voltage (a CSV literal 'NaN' survives lenient casts) must
    NULL the cycle's energy — never reach the fixed-point floor()::long
    (ANSI errors, non-ANSI silently contributes 0), mirroring the
    reference's NaN-propagating np.trapz under NULL normalization."""
    import pandas as pd

    from mxene_coin_cell_data_pipeline_spark.operators.energy import (
        energy_wh_per_cycle,
    )

    pdf = pd.DataFrame(
        {
            "cycle_index": [1, 1, 1, 2, 2],
            "step_type": ["CC_DIS"] * 5,
            "timestamp": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:01:00",
                    "2024-01-01 00:02:00",
                    "2024-01-01 01:00:00",
                    "2024-01-01 01:01:00",
                ]
            ),
            "voltage_v": [3.0, float("nan"), 3.2, 3.0, 3.1],
            "current_a": [-1.0] * 5,
            "charge_ah": [0.0] * 5,
            "discharge_ah": [0.0] * 5,
            "temp_c": [None] * 5,
            "step_index": [1] * 5,
        }
    )
    out = {
        r["cycle_index"]: r["E_dis_Wh"]
        for r in energy_wh_per_cycle(spark.createDataFrame(pdf)).collect()
    }
    assert out[1] is None
    assert abs(out[2] - (0.5 * (3.0 + 3.1) * 60 / 3600)) < 1e-6
