"""Vendor-CSV fuzz hardening: malformed exports through the real
read_cycler_csv → normalize_cycler path.

The reference's contract (pipeline.py:85,145): RAISE on missing
required columns (timestamp-like, current, voltage); everything else —
bad numeric/timestamp cells, unknown step labels, missing optional
temp — COERCES to NULL/defaults. These tests pin which malformations
raise vs coerce, on the classes the round-3 verdict listed: duplicated
headers, mixed delimiters mid-file, non-UTF8 bytes, all-null step
columns, single-row cycles.
"""

import os

import pytest

from mxene_coin_cell_data_pipeline_spark.operators.normalize import (
    normalize_cycler,
)
from mxene_coin_cell_data_pipeline_spark.sources.cycler_csv import (
    read_cycler_csv,
)

HEADER = "Date_Time,Cycle_Index,Step_Index,Current(A),Voltage(V),Charge_Capacity(Ah),Discharge_Capacity(Ah)"


def _write(tmp_path, body: bytes, name="raw.csv") -> str:
    p = tmp_path / name
    p.write_bytes(body)
    return str(p)


def _rows(n=4, cycle=1):
    out = []
    for i in range(n):
        out.append(
            f"2024-01-01 00:0{i}:00,{cycle},{1 + i % 2},"
            f"{-0.5 if i % 2 else 0.5},3.{6 + i},0.1,0.1"
        )
    return out


def test_clean_file_normalizes(spark, tmp_path):
    path = _write(tmp_path, ("\n".join([HEADER] + _rows()) + "\n").encode())
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    assert out.count() == 4
    assert set(out.columns) >= {"timestamp", "current_a", "voltage_v"}


def test_duplicated_header_row_coerces_to_null_row(spark, tmp_path):
    """A second copy of the header mid-file (concatenated exports) must
    not crash: the header-text row's cells fail their lenient casts and
    become an all-NULL-numeric row, exactly like pandas to_numeric
    coercion on a junk row."""
    rows = _rows()
    body = "\n".join([HEADER] + rows[:2] + [HEADER] + rows[2:]) + "\n"
    path = _write(tmp_path, body.encode())
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    assert out.count() == 5  # 4 data rows + the coerced junk row
    assert out.filter("timestamp IS NULL AND current_a IS NULL").count() == 1


def test_duplicate_column_names_do_not_collide(spark, tmp_path):
    """Two columns that both map to the same canonical name: first
    writer wins, no duplicate-column crash (pipeline.py:69-75 guard)."""
    hdr = HEADER + ",Current(mA)"  # would also map to current via mA rescale
    body = "\n".join([hdr] + [r + ",500" for r in _rows()]) + "\n"
    path = _write(tmp_path, body.encode())
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    assert out.columns.count("current_a") == 1
    # base-unit Current(A) won; the mA column was ignored
    vals = {abs(r["current_a"]) for r in out.select("current_a").collect()}
    assert vals == {0.5}


def test_mixed_delimiter_rows_coerce_not_crash(spark, tmp_path):
    """Semicolon rows inside a comma file parse as one ragged cell per
    row under PERMISSIVE mode → lenient casts null them out; the good
    rows survive untouched."""
    bad = "2024-01-01 00:09:00;1;1;0.5;3.7;0.1;0.1"
    body = "\n".join([HEADER] + _rows()[:3] + [bad]) + "\n"
    path = _write(tmp_path, body.encode())
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    assert out.count() == 4
    assert out.filter("current_a IS NOT NULL").count() == 3


def test_semicolon_file_sniffed(spark, tmp_path):
    body = "\n".join(
        [HEADER.replace(",", ";")] + [r.replace(",", ";") for r in _rows()]
    ) + "\n"
    path = _write(tmp_path, body.encode())
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    assert out.count() == 4
    assert out.filter("voltage_v IS NOT NULL").count() == 4


def test_non_utf8_bytes_do_not_crash(spark, tmp_path):
    """Latin-1 bytes in a cell (vendor locale exports) must not kill
    the scan; the affected numeric cell coerces to NULL."""
    rows = _rows()
    body = ("\n".join([HEADER] + rows[:3])).encode() + b"\n2024-01-01 00:09:00,1,1,\xb5A,3.9,0.1,0.1\n"
    path = _write(tmp_path, body)
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    assert out.count() == 4
    assert out.filter("current_a IS NULL").count() == 1


def test_all_null_step_column_infers_from_current(spark, tmp_path):
    """Step column present but entirely empty: step_index stays NULL
    and step_type falls back to the current-sign inference (C6)."""
    hdr = "Date_Time,Cycle_Index,Step_Index,Current(A),Voltage(V),Charge_Capacity(Ah),Discharge_Capacity(Ah)"
    rows = [
        f"2024-01-01 00:0{i}:00,1,,{-0.5 if i % 2 else 0.5},3.7,0.1,0.1"
        for i in range(4)
    ]
    path = _write(tmp_path, ("\n".join([hdr] + rows) + "\n").encode())
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    got = {r["step_type"] for r in out.select("step_type").collect()}
    assert got == {"CC_CHG", "CC_DIS"}


def test_single_row_cycles_survive_normalize(spark, tmp_path):
    """One sample per cycle: normalize passes them through; the
    downstream group-size guards (energy <2, dQdV <3) own the NULLing,
    not the normalizer."""
    rows = [
        f"2024-01-01 00:0{i}:00,{i + 1},1,-0.5,3.7,0.0,0.0{i}" for i in range(3)
    ]
    path = _write(tmp_path, ("\n".join([HEADER] + rows) + "\n").encode())
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    assert out.count() == 3
    assert out.select("cycle_index").distinct().count() == 3


def test_missing_required_column_raises(spark, tmp_path):
    """Reference contract pipeline.py:85,145: no timestamp-like column
    and no current/voltage columns are hard failures."""
    body = "a,b\n1,2\n"
    path = _write(tmp_path, body.encode())
    with pytest.raises(ValueError, match="timestamp"):
        normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    body2 = "Date_Time,foo\n2024-01-01 00:00:00,1\n"
    path2 = _write(tmp_path, body2.encode(), name="raw2.csv")
    with pytest.raises(ValueError):
        normalize_cycler(read_cycler_csv(spark, path2), cell_id="C")


def test_empty_file_raises(spark, tmp_path):
    path = _write(tmp_path, b"")
    with pytest.raises(Exception):
        normalize_cycler(read_cycler_csv(spark, path), cell_id="C")


def test_header_only_file_yields_zero_rows(spark, tmp_path):
    path = _write(tmp_path, (HEADER + "\n").encode())
    out = normalize_cycler(read_cycler_csv(spark, path), cell_id="C")
    assert out.count() == 0
