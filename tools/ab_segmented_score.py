"""One-off A/B: SegmentedIForestModel.transform (cogroup) vs
transform_broadcast (driver-pack + zero-shuffle map) on HELD-OUT rows,
across model sizes, to locate the crossover SCALE.md documents.

Setup mirrors bench.py's segmented queries: sf0.1 lineitem features,
seg = l_orderkey % K.  Fit on even l_orderkey (untimed — the persisted-
model steady state), score the odd half via both paths, min-of-2 with
interleaved A/B/B/A order to cancel warmup bias.  Model node rows grow
linearly in K, so K sweeps the broadcast path's driver-collect cost
while the cogroup path's shuffle volume stays ~constant (same row
count, more-but-smaller groups).

Run: python tools/ab_segmented_score.py            (prints a JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from spark_iforest_spark import segmented
from spark_iforest_spark.sources import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

FEATURE_COLS = [
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_linenumber", "l_partkey", "l_suppkey",
]


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-segmented-score")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = read_table(spark, SF_DIR, "lineitem")
    rows = []
    for k in (8, 64, 256, 512):
        src = li.select(
            F.col("l_orderkey"),
            F.pmod(F.col("l_orderkey"), F.lit(k)).alias("seg"),
            F.array(*[F.col(c).cast("double") for c in FEATURE_COLS]).alias(
                "features"
            ),
        )
        train = (
            src.where(F.pmod(F.col("l_orderkey"), 2) == 0)
            .drop("l_orderkey")
            .repartition(int(CPUS))
            .cache()
        )
        held = (
            src.where(F.pmod(F.col("l_orderkey"), 2) == 1)
            .drop("l_orderkey")
            .repartition(int(CPUS))
            .cache()
        )
        n_train, n_held = train.count(), held.count()
        model = segmented.fit_groups(
            train, "seg", num_trees=50, max_samples=64, max_depth=10,
            contamination=0.01, seed=7,
        )
        model.nodes.cache()
        n_nodes = model.nodes.count()

        def cogroup():
            model.transform(held).agg(F.sum("prediction")).collect()

        def broadcast():
            model.transform_broadcast(held).agg(F.sum("prediction")).collect()

        # interleaved A/B/B/A, min-of-2 per path
        times = {"cogroup": [], "broadcast": []}
        for fn, name in ((cogroup, "cogroup"), (broadcast, "broadcast"),
                         (broadcast, "broadcast"), (cogroup, "cogroup")):
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 3))
        rows.append(
            {
                "segments": k,
                "model_node_rows": n_nodes,
                "train_rows": n_train,
                "held_rows": n_held,
                "cogroup_sec": min(times["cogroup"]),
                "broadcast_sec": min(times["broadcast"]),
                "runs": times,
            }
        )
        print("AB_ROW: " + json.dumps(rows[-1]), flush=True)
        model.nodes.unpersist()
        train.unpersist()
        held.unpersist()

    print("AB_RESULT: " + json.dumps(rows), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
