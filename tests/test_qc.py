"""QC contract tests: each of the six violation classes must flip the
exit code to 1, a clean table passes (SURVEY.md §5, FIXTURES.md §7)."""

import pandas as pd
import pytest

from mxene_coin_cell_data_pipeline_spark.operators import qc_checks
from mxene_coin_cell_data_pipeline_spark.operators.qc import qc_report


def _clean_features():
    n = range(1, 6)
    return pd.DataFrame(
        {
            "cycle_index": list(n),
            "Q_dis_Ah": [3.0 - 0.002 * i for i in n],
            "Q_chg_Ah": [3.03 - 0.002 * i for i in n],
            "CE": [0.99] * 5,
            "q_norm": [1 - 0.001 * i for i in n],
            "E_dis_Wh": [10.0] * 5,
            "IR_C2_ohm": [0.05] * 5,
            "dQdV_peak_V": [3.6] * 5,
            "dQdV_shift_mV": [0.0, 1.0, 2.0, 3.0, 4.0],
        }
    )


def test_qc_pass(spark):
    res = qc_checks(spark.createDataFrame(_clean_features()))
    assert res.passed and res.exit_code == 0
    assert "QC PASS" in qc_report(spark.createDataFrame(_clean_features()), "X")


@pytest.mark.parametrize(
    "mutate,needle",
    [
        (lambda d: d.assign(cycle_index=[1, 2, 3, 4, None]), "cycle_index has NULLs"),
        (lambda d: d.assign(Q_dis_Ah=[3.0, None, 2.99, 2.99, 2.99]), "Q_dis_Ah has NULLs"),
        (lambda d: d.assign(CE=[0.90, 0.99, 0.99, 0.99, 0.99]), "CE outside"),
        (lambda d: d.assign(CE=[1.10, 0.99, 0.99, 0.99, 0.99]), "CE outside"),
        (lambda d: d.assign(Q_dis_Ah=[3.0, 3.0, 3.0, 3.0, 3.5]), "Capacity increased"),
        (lambda d: d.assign(E_dis_Wh=[10.0, -0.1, 10.0, 10.0, 10.0]), "energies <= 0"),
        (lambda d: d.assign(IR_C2_ohm=[-0.01, 0.05, 0.05, 0.05, 0.05]), "non-positive"),
        (lambda d: d.assign(IR_C2_ohm=[0.5] * 5), "seems high"),
        (lambda d: d.assign(dQdV_shift_mV=[0.0, 1.0, 2.0, 3.0, 250.0]), "peak shift > 200"),
    ],
)
def test_qc_violations_exit_1(spark, mutate, needle):
    df = spark.createDataFrame(mutate(_clean_features()))
    res = qc_checks(df)
    assert res.exit_code == 1
    assert any(needle in m for m in res.messages), res.messages


def test_qc_missing_optional_columns(spark):
    """QC on a table without E/IR/dQdV columns only runs the base checks
    (step12_qc.py guards each with `in df.columns`)."""
    df = spark.createDataFrame(
        _clean_features()[["cycle_index", "Q_dis_Ah", "Q_chg_Ah", "CE", "q_norm"]]
    )
    assert qc_checks(df).passed


def test_qc_targets_features_layer(spark):
    """Scale-boundary contract (operators/qc.py module docstring): the
    QC aggregate consumes the per-cycle FEATURES schema — where its
    exact-median / countDistinct single-merge shape is safe — and the
    full pipeline wires it to exactly that layer. Exact quantiles over
    raw fact-scale data go through the two-pass bucketed selection
    instead (functions.stats.exact_quantiles_2pass, query a17)."""
    from mxene_coin_cell_data_pipeline_spark.operators.features import (
        full_feature_pipeline,
    )
    from mxene_coin_cell_data_pipeline_spark.operators.normalize import (
        normalize_cycler,
    )
    from tests.fixtures import arbin_frame

    ts = spark.createDataFrame(arbin_frame(n_cycles=3))
    features = full_feature_pipeline(normalize_cycler(ts), rated_ah=2.0)
    # the features layer is per-cycle — QC input cardinality is bounded
    # by cycle count, not sample count
    assert features.count() <= 3
    res = qc_checks(features)
    assert res.exit_code in (0, 1)  # runs end-to-end on this layer
    # and the boundary is documented where the medians live
    import mxene_coin_cell_data_pipeline_spark.operators.qc as qc_mod

    assert "SCALE BOUNDARY" in qc_mod.__doc__
    assert "exact_quantiles_2pass" in qc_mod.__doc__
