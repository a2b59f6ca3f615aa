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


def snapshot(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.localCheckpoint(eager)`` or reliable ``df.checkpoint(eager)``
    per the session conf (module docstring). ``checkpoint`` raises Spark's
    own error if no checkpoint dir is set — surfacing the misconfiguration
    beats silently degrading to a non-fault-tolerant mode."""
    reliable = str(
        df.sparkSession.conf.get(RELIABLE_CONF, "false")
    ).lower() == "true"
    if reliable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
