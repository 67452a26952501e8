"""Multi-consumer materialization with a durability choice.

Several composed programs materialize an intermediate relation exactly
once because multiple downstream consumers would otherwise re-execute the
whole upstream plan per action (DBSCAN's edge list feeds core counts, CC
and border assignment; the analytics pipeline's embedded-tile relation
feeds the PCA fit and the binned stats). The default mechanism is
``localCheckpoint`` — executor-local block storage, no dfs write, ideal
on local[x] — but those blocks are NOT fault-tolerant: on a real cluster
an executor loss mid-query invalidates them and kills the job (the
blocks have no lineage to recompute from once truncated).

``materialize_for_reuse`` keeps that default and adds an opt-in durable
path: a RELIABLE checkpoint into the session's configured checkpoint
directory (``spark.sparkContext.setCheckpointDir`` — HDFS/object store
on a cluster), which survives executor loss at the cost of one write.
The flag can also be forced fleet-wide with
``SPARK_GRAFT_DURABLE_CHECKPOINT=1`` so long-running production jobs opt
in without code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

ENV_FLAG = "SPARK_GRAFT_DURABLE_CHECKPOINT"


def materialize_for_reuse(
    df: DataFrame, durable: bool | None = None, eager: bool = False
) -> DataFrame:
    """Truncate lineage for a relation consumed by several actions.

    ``durable=None`` (default) reads the ``SPARK_GRAFT_DURABLE_CHECKPOINT``
    env flag; ``False`` → ``localCheckpoint`` (fast, executor-local, not
    fault-tolerant); ``True`` → reliable ``checkpoint`` (requires a
    checkpoint dir — raises with instructions if none is set, rather than
    letting Spark fail deep inside the job).

    ``eager=False`` everywhere by default: an eager checkpoint executes
    the upstream plan at DataFrame-CONSTRUCTION time, so building a query
    for ``explain()`` would run the job (see the verify notes).
    """
    if durable is None:
        durable = os.environ.get(ENV_FLAG, "") == "1"
    if not durable:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        raise ValueError(
            "durable materialization needs a reliable checkpoint dir: call "
            "spark.sparkContext.setCheckpointDir('<dfs path>') first (or "
            f"unset {ENV_FLAG} to use executor-local checkpoints)"
        )
    return df.checkpoint(eager=eager)
