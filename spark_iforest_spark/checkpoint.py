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

import threading

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.spark_iforest.reliableCheckpoint"
# how many recent snapshot pairs to pin with strong refs (round-7 advice
# fix: previously an unconditional 64 — a library user that never calls
# release_snapshots() pinned up to 64 checkpointed block sets in executor
# MEMORY_AND_DISK). The race window is the just-materialized snapshots of
# the CURRENT query; 8 covers the repo's deepest within-query snapshot
# fan (connected components holds edges + two label generations live,
# minhash stacks on top when it feeds dup_clusters) with margin, while
# staying far from the old 64-pair leak. Drivers that quiesce explicitly
# (bench.py) raise it for fully-deferred reclamation.
PIN_CONF = "spark.spark_iforest.pinSnapshots"
_DEFAULT_PIN = 8

# Strong references to the most recent (input_df, checkpointed_df) PAIRS,
# keyed by the owning application id (the input's executed plan owns the
# accumulators a lazy localCheckpoint orphans — see snapshot()). Without
# these, CPython refcounting drops the
# intermediate DataFrames the moment an operator returns, the JVM weak
# refs clear on the next GC, and the ContextCleaner races straggler
# task-end events into the (benign but noisy) "attempted to access
# non-existent accumulator" storm. A driver program that cares (bench.py,
# long-running services) calls release_snapshots() at its own quiesce
# points — after the consuming action returns — so reclamation happens in
# the idle gap between queries instead of under the next one.
_LIVE: dict[str, list[tuple[DataFrame, DataFrame]]] = {}
# snapshot() is called concurrently since the LM-fit overlap thread
# (corpus._pretrain_stage_list) — guard the pin list's append/trim so an
# interleaving cannot evict a just-materialized pair early and re-expose
# the round-7 accumulator-GC storm the pin suppresses (round-14 advice fix)
_LIVE_LOCK = threading.Lock()


def snapshot(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.localCheckpoint(eager)`` or reliable ``df.checkpoint(eager)``
    per the session conf (module docstring). ``checkpoint`` raises Spark's
    own error if no checkpoint dir is set — surfacing the misconfiguration
    beats silently degrading to a non-fault-tolerant mode."""
    spark = df.sparkSession
    reliable = str(spark.conf.get(RELIABLE_CONF, "false")).lower() == "true"
    out = df.checkpoint(eager=eager) if reliable else df.localCheckpoint(eager=eager)
    try:
        pin = int(spark.conf.get(PIN_CONF, str(_DEFAULT_PIN)))
    except ValueError:
        pin = _DEFAULT_PIN
    app_id = spark.sparkContext.applicationId
    # refs must not outlive their SparkSession: a new session's first
    # snapshot drops every other app's list (one live local session is the
    # operating mode; a stopped session's DataFrames are unreclaimable
    # garbage otherwise — round-7 advice fix)
    with _LIVE_LOCK:
        for stale in [k for k in _LIVE if k != app_id]:
            del _LIVE[stale]
    if pin > 0:
        # pin the INPUT df alongside the checkpointed output (round 7):
        # a LAZY localCheckpoint truncates lineage when the consuming job
        # materializes it MID-QUERY, orphaning the pre-checkpoint plan's
        # accumulators — the next GC reclaims them while the same job's
        # task-end/heartbeat traffic still references them (measured: the
        # entire 4k-line accumulator storm came from this one site;
        # pinning the input records 0 lines at unchanged cost, where
        # eager=True also records 0 but is ~20% slower by losing
        # single-job pipelining).
        with _LIVE_LOCK:
            live = _LIVE.setdefault(app_id, [])
            live.append((df, out))
            if len(live) > pin:
                del live[: len(live) - pin]
    return out


def release_snapshots() -> int:
    """Drop the strong references held by :func:`snapshot`, letting the
    ContextCleaner reclaim their blocks. Returns how many snapshot PAIRS
    (input + checkpoint) were released. Call between queries, after
    actions complete — never mid-plan."""
    with _LIVE_LOCK:
        n = sum(len(v) for v in _LIVE.values())
        _LIVE.clear()
    return n
