"""Collapse one or more sweep_isolated jsonl outputs into a Markdown
results table (latest record per query wins), for SCALING.md.

Usage: python tools/summarize_sweep.py out1.jsonl out2.jsonl ...
"""

from __future__ import annotations

import json
import sys


def load(paths: list[str]) -> dict[str, dict]:
    res: dict[str, dict] = {}
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                res[d["name"]] = d  # later files / later lines win
    return res


def main() -> int:
    res = load(sys.argv[1:])
    npass = sum(1 for d in res.values() if d["status"] == "pass")
    print(f"{npass}/{len(res)} pass\n")
    print("| query | status | sec | rows |")
    print("|---|---|---:|---:|")
    for n in sorted(res):
        d = res[n]
        rows = d.get("rows_spark")
        sec = d.get("sec")
        sec_s = f"{sec:.1f}" if isinstance(sec, (int, float)) else "—"
        print(
            f"| {n} | {d['status']} | {sec_s} | "
            f"{rows if rows is not None else '—'} |"
        )
    bad = sorted(n for n, d in res.items() if d["status"] != "pass")
    if bad:
        print("\nnot passing:", ", ".join(bad))
    return 0


if __name__ == "__main__":
    sys.exit(main())
