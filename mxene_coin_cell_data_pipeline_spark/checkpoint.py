"""Lineage truncation for the iterative families: local by default,
RELIABLE when configured (optimization r12, VERDICT r11 item 7).

The iterative operators (near-dup closure rounds, g01-g04 graph
rounds, the p06/p07 survivor materialization) truncate their growing
lineage with ``localCheckpoint`` — the right local default: it bounds
the per-round Catalyst/codegen blowup (measured 35s of recompiles on
the lazy form) at the cost of storing the truncated RDD on executor
LOCAL storage only. At 100 TB that trade flips: executor-local blocks
are non-reliable, so ONE lost executor makes the truncated lineage
unrecoverable and the whole job must restart — production runs on a
real cluster should truncate through a reliable (HDFS / object-store)
checkpoint directory instead.

``durable_checkpoint`` is the single switch: with
``$SPARK_GRAFT_CHECKPOINT_DIR`` (or the ``spark.graft.checkpointDir``
session conf) set to a reliable path, every call becomes a reliable
``DataFrame.checkpoint`` into that directory; unset, it is exactly the
``localCheckpoint`` the local bench measures. Semantics are identical
either way — both materialize the same rows and truncate the same
lineage; only the storage's failure domain changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def checkpoint_dir(df: DataFrame) -> str | None:
    """The configured reliable checkpoint directory, if any.

    The session conf ``spark.graft.checkpointDir`` wins over the
    ``SPARK_GRAFT_CHECKPOINT_DIR`` environment variable; empty strings
    mean unset.
    """
    env = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None
    try:
        return df.sparkSession.conf.get("spark.graft.checkpointDir", env) or None
    except Exception:
        return env


def durable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint`` when a
    checkpoint dir is configured (see module docstring), else
    ``localCheckpoint``. Both forms honor ``eager``."""
    ckdir = checkpoint_dir(df)
    if ckdir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
