"""Canonical schema + vendor header maps for cycler data.

Reference semantics: /root/reference/pipeline.py:29-75 (vendor maps),
pipeline.py:110-115 (step-type label map), pipeline.py:138-139
(canonical column set). The maps below are data (column-name
dictionaries), not code — they define the ingest contract.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical timeseries schema (pipeline.py:138-139; FIXTURES.md §4).
# Grain: cell -> cycle -> step -> sample.
TIMESERIES_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("cycle_index", T.LongType(), True),
        T.StructField("step_index", T.LongType(), True),
        T.StructField("step_type", T.StringType(), True),
        T.StructField("current_a", T.DoubleType(), True),
        T.StructField("voltage_v", T.DoubleType(), True),
        T.StructField("temp_c", T.DoubleType(), True),
        T.StructField("charge_ah", T.DoubleType(), True),
        T.StructField("discharge_ah", T.DoubleType(), True),
    ]
)

CANONICAL_COLUMNS = [f.name for f in TIMESERIES_SCHEMA.fields]

# Per-cycle features table (pipeline.py:294-299; FIXTURES.md §5).
FEATURES_COLUMNS = [
    "cycle_index",
    "Q_dis_Ah",
    "Q_chg_Ah",
    "CE",
    "q_norm",
    "E_dis_Wh",
    "IR_C2_ohm",
    "dQdV_peak_V",
    "dQdV_shift_mV",
]

# Arbin-style header map (pipeline.py:29-46).
ARBIN_MAP = {
    "Date_Time": "timestamp",
    "Date Time": "timestamp",
    "Cycle_Index": "cycle_index",
    "Step_Index": "step_index",
    "Step_Name": "step_type",
    "Current(A)": "current_a",
    "Current(mA)": "current_mA",
    "Voltage(V)": "voltage_v",
    "Voltage(mV)": "voltage_mV",
    "Temperature(C)": "temp_c",
    "Charge_Capacity(Ah)": "charge_ah",
    "Charge_Capacity(mAh)": "charge_mAh",
    "Discharge_Capacity(Ah)": "discharge_ah",
    "Discharge_Capacity(mAh)": "discharge_mAh",
    "Test Time (s)": "test_time_s",
    "Test_Time(s)": "test_time_s",
}

# Neware-style header map, applied after Arbin (pipeline.py:47-67).
NEWARE_MAP = {
    "Record Time": "timestamp",
    "Cycle": "cycle_index",
    "Step": "step_index",
    "Mode": "step_type",
    "Status": "step_type",
    "Current(A)": "current_a",
    "Current(mA)": "current_mA",
    "Voltage(V)": "voltage_v",
    "Voltage(mV)": "voltage_mV",
    "NTC": "temp_c",
    "Temperature(℃)": "temp_c",
    "CapCharge(Ah)": "charge_ah",
    "CapDischarge(Ah)": "discharge_ah",
    "CHARGE_Ah": "charge_ah",
    "DISCHARGE_Ah": "discharge_ah",
    "Capacity Charge(mAh)": "charge_mAh",
    "Capacity Discharge(mAh)": "discharge_mAh",
    "Time(s)": "test_time_s",
    "Test Time(s)": "test_time_s",
}

# Fallback candidate names for indices (pipeline.py:88-97).
CYCLE_CANDIDATES = ["Cycle_Index", "Cycle", "cycle", "CycleIndex"]
STEP_CANDIDATES = ["Step_Index", "Step", "StepIndex", "Index"]

# step_type canonical label map, applied after uppercasing
# (pipeline.py:110-115). Exact-match replacement; unmapped labels pass
# through unchanged.
STEP_TYPE_MAP = {
    "CC CHARGE": "CC_CHG",
    "CCC": "CC_CHG",
    "CHG": "CC_CHG",
    "CV CHARGE": "CV",
    "CV": "CV",
    "CC DISCHARGE": "CC_DIS",
    "CCD": "CC_DIS",
    "DCHG": "CC_DIS",
    "REST": "REST",
    "PAUSE": "REST",
    "IDLE": "REST",
}
