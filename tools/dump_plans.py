"""Dump every gate's ``explain("formatted")`` plan to ``plans/<tag>/``
as ``<query>_<suffix>.txt`` — the before/after evidence files the
optimization rounds commit (plan claims are checked against these).

Usage: python tools/dump_plans.py <tag>/<suffix> [sf_dir] [query ...]
e.g.:  python tools/dump_plans.py r14/before /root/testdata/sf0.001
Session shape matches tools/plan_audit.py (same sf, same confs) so the
dumps are comparable across rounds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2 or "/" not in sys.argv[1]:
        print(__doc__)
        return 1
    tag, suffix = sys.argv[1].split("/", 1)
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    only = set(sys.argv[3:]) or None
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump_plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_iforest_spark.plans import formatted_plan

    n = 0
    try:
        for name, fn in entry.queries().items():
            if only and name not in only:
                continue
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            try:
                plan = formatted_plan(fn(spark, sf_dir))
            except Exception as e:  # a gate that cannot build is a finding
                plan = f"ERROR {type(e).__name__}: {e}\n"
            with open(path, "w") as f:
                f.write(plan)
            n += 1
            print(f"wrote {path}")
    finally:
        spark.stop()
    print(f"{n} plans -> {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
