"""Regenerate the query table in COVERAGE.md from the live registry.

Usage: python tools/gen_coverage.py   (run from the repo root)

Only the table between the header block and the "## Operator modules"
section is rewritten; the rest of the file is preserved.
"""

from __future__ import annotations

import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from mxene_coin_cell_data_pipeline_spark.plans.queries import QUERIES  # noqa: E402
COV = ROOT / "COVERAGE.md"


def main() -> None:
    # latest 100x verdict per query from the canonical committed sweep
    # record (tools/write_scaling_table.py merges the serial-sweep
    # jsonls + adjudications into SCALING_100x.json; the same data
    # backs the SCALING.md table)
    scale_path = ROOT / "SCALING_100x.json"
    scale = {}
    if scale_path.exists():
        scale = __import__("json").loads(scale_path.read_text())

    lines = [
        "| query | verification | 100× | SURVEY §2 coverage |",
        "|---|---|---|---|",
    ]
    n_oracle = 0
    n_scale_pass = 0
    for name in sorted(QUERIES):
        spec = QUERIES[name]
        mode = "oracle" if spec.oracle is not None else "rows-only"
        n_oracle += spec.oracle is not None
        s = scale.get(name, {}).get("status", "not-run")
        n_scale_pass += s == "pass"
        lines.append(f"| `{name}` | {mode} | {s} | {spec.survey} |")
    lines.append("")
    lines.append(
        f"**{len(QUERIES)} queries, {n_oracle} oracle-checked, "
        f"{n_scale_pass} pass at 100× (SCALING.md round-7 table).**"
    )
    table = "\n".join(lines)

    text = COV.read_text()
    new = re.sub(
        r"\| query \| verification \|.*?oracle-checked[^*]*\.\*\*",
        table,
        text,
        count=1,
        flags=re.S,
    )
    COV.write_text(new)
    print(
        f"COVERAGE.md: {len(QUERIES)} queries, {n_oracle} oracle-checked, "
        f"{n_scale_pass} 100x-pass"
    )


if __name__ == "__main__":
    main()
