"""Driver-faithful correctness check: every registered query vs its
DuckDB oracle, under a Spark session configured like the DRIVER's
(ANSI enabled — the Spark 4 default the driver runs with — not the
lenient builder session from session.py).

The compare is tolerance-free by design: columns sorted by name, rows
sorted canonically, every value stringified with its pandas dtype
intact, sha256 over the whole relation. A dtype difference (int64 "0"
vs float64 "0.0") fails the hash exactly as it does in the driver —
this is the gap that let 5 representation mismatches ship in round 1.

Usage:
    python tools/driver_check.py [--sf /root/testdata/sf0.01]
        [--only name1,name2] [--tz America/New_York] [--out report.json]

Exit code 0 iff every oracle-backed query hash-matches.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxene_coin_cell_data_pipeline_spark.sources.tables import TABLE_NAMES  # noqa: E402


def _max_result_size(driver_mem: str) -> str:
    """Collect cap derived from the heap: half the driver memory,
    floored at 1g and capped at 16g. Keeps the cap UNDER the heap so an
    oversized collect dies with the actionable maxResultSize error, not
    an opaque JVM OOM (round-7 ADVICE: the old hardcoded 16g exceeded
    the default 8g heap)."""
    m = driver_mem.strip().lower()
    try:
        if m.endswith("g"):
            mib = int(float(m[:-1]) * 1024)
        elif m.endswith("m"):
            mib = int(float(m[:-1]))
        else:
            mib = int(float(m)) // (1024 * 1024)  # raw bytes
    except ValueError:
        return "4g"
    return f"{min(mib, 16 * 1024, max(1024, mib // 2))}m"


def driver_like_session(
    cpus: int = 8, tz: str | None = None, driver_mem: str = "8g"
):
    """A session with the DRIVER's semantics: ANSI on (Spark 4 default),
    no lenient overrides. nanosAsLong is NOT pre-set here — load_table
    must set it itself, as it must under the real driver session."""
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver-check")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        # the default 1g cap kills full-result collects the host can
        # easily hold (observed: one 100× task's Arrow batch at 1042
        # MiB) — a verification harness that collects both engines'
        # full output should be bounded by driver memory, not this.
        # Derived from driver_mem (not a fixed 16g): a fixed cap above
        # driver_mem turns an 8g-heap overflow into an opaque JVM OOM
        # instead of the clean maxResultSize error the cap exists for.
        .config("spark.driver.maxResultSize", _max_result_size(driver_mem))
        .config("spark.ui.enabled", "false")
    )
    if tz:
        b = b.config("spark.sql.session.timeZone", tz)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def canon_cell(v) -> str:
    """Stringify one value, dtype-faithful (int 0 != float 0.0)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        if pd.isna(v):
            return "\x00NULL"
        return str(v)
    try:
        if pd.isna(v):
            return "\x00NULL"
    except (TypeError, ValueError):
        pass
    return f"{type(v).__name__}:{v}"


def canon_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False):
        rows.append("\x01".join(canon_cell(v) for v in row))
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return h.hexdigest()


def first_diff(sp: pd.DataFrame, du: pd.DataFrame) -> str:
    cols = sorted(sp.columns)
    a = sorted("\x01".join(canon_cell(v) for v in r) for r in sp[cols].itertuples(index=False))
    b = sorted("\x01".join(canon_cell(v) for v in r) for r in du[cols].itertuples(index=False))
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            pa, pb = ra.split("\x01"), rb.split("\x01")
            for c, va, vb in zip(cols, pa, pb):
                if va != vb:
                    return f"row {i} col {c}: spark={va!r} oracle={vb!r}"
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    return "identical?"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default="")
    ap.add_argument("--tz", default=None, help="session timezone override (stress TZ purity)")
    ap.add_argument("--out", default="")
    ap.add_argument("--cpus", default=8, type=int)
    ap.add_argument(
        "--duckdb-mem",
        default="",
        help="DuckDB memory_limit (e.g. 48GB) + disk-spill temp dir — "
        "REQUIRED for large scale factors: at 100x the shingle-explosion "
        "oracles (d12's LSH chain) exceed host RAM and the kernel "
        "OOM-kills the whole sweep without it (observed: 119 GB RSS)",
    )
    ap.add_argument(
        "--driver-mem",
        default="8g",
        help="Spark driver JVM heap — the default mirrors the driver's "
        "session; raise for solo large-scale sweeps (100x d06's closure "
        "aggregate needs headroom a contended 8g heap doesn't have)",
    )
    ap.add_argument(
        "--stop-spark-before-oracle",
        action="store_true",
        help="single-query runs only: stop the Spark session (freeing "
        "the full JVM RSS) after the engine result is collected, before "
        "DuckDB evaluates the oracle. The r08 d05 100x attempt was "
        "kernel-OOM-killed in exactly this window: an 80GB DuckDB "
        "aggregate alongside a ~53GB idle-but-resident JVM exceeds the "
        "host; heavy solo sweeps should never pay for both at once",
    )
    ap.add_argument(
        "--save-engine",
        default="",
        metavar="DIR",
        help="two-phase mode, phase 1: write each engine result to "
        "DIR/<name>.parquet and SKIP the oracle (status engine_saved). "
        "For queries whose engine+oracle runtimes cannot share one "
        "window (d05 at 100x: engine alone is ~3.3h on 32 cores), run "
        "phase 1, then phase 2 with --engine-from on an idle host",
    )
    ap.add_argument(
        "--engine-from",
        default="",
        metavar="DIR",
        help="two-phase mode, phase 2: load engine results from "
        "DIR/<name>.parquet instead of running Spark (no JVM is started "
        "at all — DuckDB gets the whole host), evaluate the oracle and "
        "compare as usual. Parquet roundtrips pandas dtypes, so "
        "canon_hash sees exactly what phase 1 collected",
    )
    ap.add_argument(
        "--duckdb-disable-optimizers",
        default="",
        metavar="LIST",
        help="comma list for DuckDB's SET disabled_optimizers — an "
        "execution-strategy knob, not a semantics change. Pass "
        "'join_order' for heavy 100x oracles: DuckDB estimates EC=0 "
        "after expression filters/DISTINCT, then builds hash joins on "
        "the multi-billion-row intermediate instead of the small "
        "dimension side (measured on d05: 280GB projected build -> "
        "55GB+ spill -> disk exhaustion; with syntactic join order the "
        "same oracle finishes in 174s with <15GB state)",
    )
    args = ap.parse_args()

    spark = None
    if not args.engine_from:
        spark = driver_like_session(
            cpus=args.cpus, tz=args.tz, driver_mem=args.driver_mem
        )
    from mxene_coin_cell_data_pipeline_spark.plans import oracle_sqls, query_fns

    fns, sqls = query_fns(), oracle_sqls()
    names = [n.strip() for n in args.only.split(",") if n.strip()] or list(fns)

    con = duckdb.connect()
    if args.duckdb_mem:
        con.execute(f"SET memory_limit='{args.duckdb_mem}'")
        # per-process spill dir: concurrent driver_check instances
        # sharing one temp_directory collide on DuckDB's numbered
        # duckdb_temp_storage-*.tmp files (observed: one process
        # removes another's segment -> IOException escapes as
        # terminate() and kills the whole check)
        spill = f"/tmp/duckdb_spill_{os.getpid()}"
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET temp_directory='{spill}'")
        import atexit
        import shutil

        atexit.register(shutil.rmtree, spill, ignore_errors=True)
    if args.duckdb_disable_optimizers:
        con.execute(
            f"SET disabled_optimizers='{args.duckdb_disable_optimizers}'"
        )
    for t in TABLE_NAMES:
        # driver data is a single file <t>.parquet; Spark-written tables
        # (tools/gen_10x.py, sources/layout.py) are DIRECTORIES of
        # part files — glob those for DuckDB
        path = f"{args.sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    report: dict[str, dict] = {}
    n_pass = n_fail = n_crash = n_noorc = 0
    for name in names:
        t0 = time.time()
        row: dict = {"sec": None}
        try:
            if args.engine_from:
                sp = pd.read_parquet(
                    os.path.join(args.engine_from, f"{name}.parquet")
                )
            else:
                sp = fns[name](spark, args.sf).toPandas()
            row["rows_spark"] = len(sp)
            if args.save_engine:
                os.makedirs(args.save_engine, exist_ok=True)
                sp.to_parquet(
                    os.path.join(args.save_engine, f"{name}.parquet"),
                    index=False,
                )
                row["status"] = "engine_saved"
                n_noorc += 1
            elif name not in sqls:
                row["status"] = "no_oracle"
                n_noorc += 1
            else:
                if args.stop_spark_before_oracle and len(names) == 1 and spark:
                    spark.stop()
                du = con.execute(sqls[name]).fetchdf()
                row["rows_oracle"] = len(du)
                row["schema_match"] = sorted(sp.columns) == sorted(du.columns)
                if not row["schema_match"]:
                    row["status"] = "schema_fail"
                    row["detail"] = f"spark={sorted(sp.columns)} oracle={sorted(du.columns)}"
                    n_fail += 1
                elif canon_hash(sp) == canon_hash(du):
                    row["status"] = "pass"
                    n_pass += 1
                else:
                    row["status"] = "hash_fail"
                    row["detail"] = first_diff(sp, du)
                    row["dtypes_spark"] = {c: str(t) for c, t in sp.dtypes.items()}
                    row["dtypes_oracle"] = {c: str(t) for c, t in du.dtypes.items()}
                    n_fail += 1
        except Exception:
            row["status"] = "crash"
            row["detail"] = traceback.format_exc(limit=20)[-2000:]
            n_crash += 1
        row["sec"] = round(time.time() - t0, 2)
        report[name] = row
        flag = {
            "pass": ".",
            "no_oracle": "o",
            "engine_saved": "e",
            "hash_fail": "F",
            "schema_fail": "S",
            "crash": "X",
        }[row["status"]]
        print(f"{flag} {name:34s} {row['sec']:6.2f}s {row.get('detail','')[:140]}", flush=True)
        if args.out:
            # write INCREMENTALLY: a timeout/OOM-kill mid-run must not
            # lose the queries that already completed (the 100x sweep
            # wrapper reads whatever landed before the kill)
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1, default=str)

    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_crash} crash, {n_noorc} no-oracle "
        f"of {len(names)} ({args.sf})"
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, default=str)
    return 0 if (n_fail == 0 and n_crash == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
