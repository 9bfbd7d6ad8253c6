"""Merge 100x sweep jsonl outputs (+ adjudication overrides) into the
canonical committed record ``SCALING_100x.json`` and rewrite the
per-query results table between the ``<!-- 100x-table -->`` markers in
SCALING.md. Re-runnable: as the serial sweep appends records, run this
again and the committed table refreshes in place.

Usage:
  python tools/write_scaling_table.py out1.jsonl out2.jsonl ... \
      [--adjudicate adjudications.json]

The adjudications file is ``{name: {status, sec, rows_spark, note}}``
and WINS over sweep records — it is for judge/builder re-verified solo
runs (e.g. a query whose in-sweep record was corrupted by co-scheduled
load) and for oracle-capacity verdicts (engine completes; the DuckDB
oracle itself cannot materialize the compare at 100x).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SCALING = ROOT / "SCALING.md"
CANON = ROOT / "SCALING_100x.json"
START = "<!-- 100x-table-start -->"
END = "<!-- 100x-table-end -->"


def load_jsonl(path: str) -> dict[str, dict]:
    res: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                d = json.loads(line)
                res[d["name"]] = d
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonls", nargs="+")
    ap.add_argument("--adjudicate", default=None)
    args = ap.parse_args()

    from mxene_coin_cell_data_pipeline_spark.plans import query_fns

    all_names = sorted(query_fns())

    merged: dict[str, dict] = {}
    for p in args.jsonls:
        merged.update(load_jsonl(p))  # later files win
    if args.adjudicate:
        with open(args.adjudicate) as f:
            adj = json.load(f)
        for name, rec in adj.items():
            merged[name] = {**merged.get(name, {}), **rec, "adjudicated": True}

    # drop stale/truncated detail payloads from the committed record
    canon = {
        n: {k: v for k, v in merged[n].items() if k != "detail"}
        for n in sorted(merged)
        if n in all_names
    }
    CANON.write_text(json.dumps(canon, indent=1, sort_keys=True) + "\n")

    lines = ["| query | status | sec | rows | note |", "|---|---|---:|---:|---|"]
    counts: dict[str, int] = {}
    for n in all_names:
        d = merged.get(n)
        if d is None:
            counts["not-run"] = counts.get("not-run", 0) + 1
            lines.append(f"| {n} | not-run | — | — | serial sweep pending |")
            continue
        status = d.get("status", "?")
        counts[status] = counts.get(status, 0) + 1
        sec = d.get("sec")
        sec_s = f"{sec:.1f}" if isinstance(sec, (int, float)) else "—"
        rows = d.get("rows_spark")
        note = d.get("note", "")
        if d.get("adjudicated") and "adjudicated" not in note:
            note = (note + " (adjudicated solo run)").strip()
        lines.append(
            f"| {n} | {status} | {sec_s} | "
            f"{rows if rows is not None else '—'} | {note} |"
        )
    npass = counts.get("pass", 0)
    summary = (
        f"**{npass}/{len(all_names)} pass** ("
        + ", ".join(f"{k}: {v}" for k, v in sorted(counts.items()))
        + ")"
    )
    table = "\n".join([START, "", summary, "", *lines, "", END])

    text = SCALING.read_text()
    if START in text and END in text:
        pre = text.split(START)[0]
        post = text.split(END)[1]
        SCALING.write_text(pre + table + post)
    else:
        SCALING.write_text(text.rstrip() + "\n\n" + table + "\n")
    print(summary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
