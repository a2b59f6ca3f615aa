"""Shared materialization point for reused mid-plan relations.

Every operator that re-reads an expensive intermediate (hashed shingles,
minhash signatures, connected-components frontiers, iforest sample pools)
funnels through :func:`snapshot` instead of calling ``localCheckpoint``
directly, so ONE session conf swaps the whole repo between:

* ``localCheckpoint`` (default) — executor-local blocks, lineage
  truncation, no distributed-FS round-trip. NOT fault-tolerant: losing an
  executor mid-job fails the job instead of recomputing (each caller's
  docstring carries the site-specific tradeoff).
* reliable ``checkpoint`` — blocks written to the
  ``sparkContext.setCheckpointDir`` directory (HDFS/S3 on a cluster);
  executor loss recovers from the checkpoint files. The opt-in for
  clusters where executor loss is routine (spot/preemptible fleets).

Enable with::

    spark.sparkContext.setCheckpointDir("hdfs://...")   # or local dir
    spark.conf.set("spark.spark_iforest.reliableCheckpoint", "true")

The emitted relations are identical under either mode (equality-tested in
tests/test_dedup.py and tests/test_fit_transform.py) — only the storage
and recovery story changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.spark_iforest.reliableCheckpoint"

# Strong references to every snapshot produced since the last release_
# snapshots() call. Without these, CPython refcounting drops the
# intermediate DataFrames the moment an operator returns, the JVM weak
# refs clear on the next GC, and the ContextCleaner races straggler
# task-end events into the (benign but noisy) "attempted to access
# non-existent accumulator" storm. A driver program that cares (bench.py,
# long-running services) calls release_snapshots() at its own quiesce
# points — after the consuming action returns — so reclamation happens in
# the idle gap between queries instead of under the next one.
_LIVE: list[DataFrame] = []


def snapshot(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.localCheckpoint(eager)`` or reliable ``df.checkpoint(eager)``
    per the session conf (module docstring). ``checkpoint`` raises Spark's
    own error if no checkpoint dir is set — surfacing the misconfiguration
    beats silently degrading to a non-fault-tolerant mode."""
    reliable = str(
        df.sparkSession.conf.get(RELIABLE_CONF, "false")
    ).lower() == "true"
    out = df.checkpoint(eager=eager) if reliable else df.localCheckpoint(eager=eager)
    _LIVE.append(out)
    # bounded: the race window is only previous-query-vs-next-query, so
    # holding the most recent snapshots suffices; FIFO release keeps a
    # caller that never calls release_snapshots() (pytest) from pinning
    # every checkpoint block of a long session
    if len(_LIVE) > 64:
        del _LIVE[: len(_LIVE) - 64]
    return out


def release_snapshots() -> int:
    """Drop the strong references held by :func:`snapshot`, letting the
    ContextCleaner reclaim their blocks. Returns how many were released.
    Call between queries, after actions complete — never mid-plan."""
    n = len(_LIVE)
    _LIVE.clear()
    return n
