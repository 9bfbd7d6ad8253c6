"""Deterministic synthetic cycler fixtures with closed-form answers.

Implements FIXTURES.md §1-§3. The physics is chosen so every feature
has an analytically known value (computed here independently with plain
numpy — NOT by calling the engine), giving golden-output tests real
teeth.

Per cycle n (1..N): 5 charge samples, 1 rest, 5 discharge samples,
dt=60s. Discharge voltage ramp 4.2→3.2 (+ per-cycle offset 0.001·n for
a known dQ/dV peak shift), discharge currents
[-0.5,-1.0,-1.5,-1.5,-1.5] so the C/2 (1.5 A at rated 3 Ah) argmin row
is the 3rd discharge sample with non-empty neighbor windows:
IR = |median(V[2:4]) − V[1]| / |median(I[2:4]) − I[1]| = 0.375/0.5 = 0.75.
Capacity fades linearly: Q_n = 3.0·(1 − f·n), f=0.002 →
fade_slope = −100·f/(1−f), cycles_to_80pct = 100.8 exactly.
Cumulative discharge fractions [0,.1,.3,.8,1.0] put the flattest Q(V)
segment at the top of the ramp → dQ/dV argmax at grid index 16 →
peak_n = 3.2 + 0.001·n + 0.8 V, shift_mV = (n−1) mV... (peak − peak_1)·1000.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RATED_AH = 3.0
FADE = 0.002
CE_TRUE = 0.99
N_CYCLES = 8
DIS_V = np.array([4.2, 3.95, 3.7, 3.45, 3.2])
DIS_I = np.array([-0.5, -1.0, -1.5, -1.5, -1.5])
DIS_QFRAC = np.array([0.0, 0.1, 0.3, 0.8, 1.0])
CHG_V = np.array([3.0, 3.3, 3.6, 3.9, 4.2])
DT_S = 60.0


def q_cycle(n: int) -> float:
    return RATED_AH * (1.0 - FADE * n)


def arbin_frame(n_cycles: int = N_CYCLES, with_temp: bool = True) -> pd.DataFrame:
    """Arbin-headed raw frame (FIXTURES.md §1), discharge-negative."""
    rows = []
    t = pd.Timestamp("2025-01-01 00:00:00")
    for n in range(1, n_cycles + 1):
        qn = q_cycle(n)
        qc = qn / CE_TRUE
        dv_off = 0.001 * n
        for i in range(5):  # charge
            rows.append(
                {
                    "Date_Time": t,
                    "Cycle_Index": n,
                    "Step_Index": 1,
                    "Step_Name": "CC CHARGE",
                    "Current(A)": 1.5,
                    "Voltage(V)": CHG_V[i],
                    "Temperature(C)": 25.0,
                    "Charge_Capacity(Ah)": qc * (i + 1) / 5.0,
                    "Discharge_Capacity(Ah)": 0.0,
                }
            )
            t += pd.Timedelta(seconds=DT_S)
        rows.append(
            {
                "Date_Time": t,
                "Cycle_Index": n,
                "Step_Index": 2,
                "Step_Name": "REST",
                "Current(A)": 0.0,
                "Voltage(V)": CHG_V[-1],
                "Temperature(C)": 25.0,
                "Charge_Capacity(Ah)": qc,
                "Discharge_Capacity(Ah)": 0.0,
            }
        )
        t += pd.Timedelta(seconds=DT_S)
        for i in range(5):  # discharge
            rows.append(
                {
                    "Date_Time": t,
                    "Cycle_Index": n,
                    "Step_Index": 3,
                    "Step_Name": "CC DISCHARGE",
                    "Current(A)": DIS_I[i],
                    "Voltage(V)": DIS_V[i] + dv_off,
                    "Temperature(C)": 25.0,
                    "Charge_Capacity(Ah)": qc,
                    "Discharge_Capacity(Ah)": qn * DIS_QFRAC[i],
                }
            )
            t += pd.Timedelta(seconds=DT_S)
    df = pd.DataFrame(rows)
    if not with_temp:
        df = df.drop(columns=["Temperature(C)"])
    return df


def neware_frame(n_cycles: int = N_CYCLES) -> pd.DataFrame:
    """Neware-headed milli-unit variant with positive discharge current
    (exercises unit rescale AND the sign-flip rule)."""
    a = arbin_frame(n_cycles)
    return pd.DataFrame(
        {
            "Record Time": a["Date_Time"],
            "Cycle": a["Cycle_Index"],
            "Step": a["Step_Index"],
            "Mode": a["Step_Name"].map(
                {"CC CHARGE": "CHG", "REST": "REST", "CC DISCHARGE": "DCHG"}
            ),
            "Current(mA)": -a["Current(A)"] * 1000.0,  # flipped sign convention
            "Voltage(mV)": a["Voltage(V)"] * 1000.0,
            "Temperature(℃)": a["Temperature(C)"],
            "Capacity Charge(mAh)": a["Charge_Capacity(Ah)"] * 1000.0,
            "Capacity Discharge(mAh)": a["Discharge_Capacity(Ah)"] * 1000.0,
        }
    )


def headless_frame(n_cycles: int = N_CYCLES) -> pd.DataFrame:
    """No step column, elapsed-seconds time base → step inferred from
    current sign, timestamp synthesized from Test Time (s)."""
    a = arbin_frame(n_cycles)
    t0 = a["Date_Time"].iloc[0]
    return pd.DataFrame(
        {
            "Test Time (s)": (a["Date_Time"] - t0).dt.total_seconds(),
            "Cycle_Index": a["Cycle_Index"],
            "Step_Index": a["Step_Index"],
            "Current(A)": a["Current(A)"],
            "Voltage(V)": a["Voltage(V)"],
            "Temperature(C)": a["Temperature(C)"],
            "Charge_Capacity(Ah)": a["Charge_Capacity(Ah)"],
            "Discharge_Capacity(Ah)": a["Discharge_Capacity(Ah)"],
        }
    )


# ---------- closed-form expectations (independent numpy math) ----------

def expected_features(n_cycles: int = N_CYCLES) -> pd.DataFrame:
    rows = []
    q1 = q_cycle(1)
    peak1 = None
    for n in range(1, n_cycles + 1):
        qn = q_cycle(n)
        dv_off = 0.001 * n
        v = DIS_V + dv_off
        p = v * DIS_I
        t = np.arange(5) * DT_S
        e_wh = abs(np.trapz(p, t)) / 3600.0
        # dQ/dV via the same public np.interp/np.gradient recipe
        vv = v[::-1]
        qq = (qn * DIS_QFRAC)[::-1]
        qq = qq - qq.min()
        vgrid = np.arange(vv[0], vv[-1], 0.05)
        qgrid = np.interp(vgrid, vv, qq)
        grad = np.gradient(qgrid, 0.05)
        peak = float(vgrid[int(np.argmax(grad))])
        if peak1 is None:
            peak1 = peak
        rows.append(
            {
                "cycle_index": n,
                "Q_dis_Ah": qn,
                "Q_chg_Ah": qn / CE_TRUE,
                "CE": qn / (qn / CE_TRUE),
                "q_norm": qn / q1,
                "E_dis_Wh": e_wh,
                "IR_C2_ohm": 0.75,
                "dQdV_peak_V": peak,
                "dQdV_shift_mV": (peak - peak1) * 1000.0,
            }
        )
    return pd.DataFrame(rows)


def expected_summary() -> dict:
    n = np.arange(1, N_CYCLES + 1, dtype=float)
    qn = np.array([q_cycle(int(i)) for i in n])
    y = qn / qn[0]
    m, b = np.polyfit(n, y, 1)
    return {
        "Q0_Ah": qn[0],
        "fade_slope_pct_per_cycle": m * 100.0,
        "cycles_to_80pct": (0.8 - b) / m,
    }
