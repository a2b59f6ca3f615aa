"""Per-STAGE timeline probe (round 14) — job-level rollups double-count
AQE stage reuse, so this drills to stages: one row per executed stage with
submit offset, duration, task count, input/shuffle bytes and the first
line of its name, for one timed run of a chosen query. Usage mirrors
tools/job_timeline.py."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    # reuse job_timeline's session + workload builders
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import job_timeline as jt

    which = sys.argv[1] if len(sys.argv) > 1 else "pretrain_curate"
    spark, fns, _quiesce = jt.build(which)
    fn = fns[which]

    fn()
    _quiesce(spark)
    fn()
    _quiesce(spark)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    before = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    watermark = max((s["stageId"] for s in before), default=-1)

    t0 = time.time()
    fn()
    wall = time.time() - t0

    stages = json.load(
        urllib.request.urlopen(f"{base}/stages?status=complete&details=false")
    )
    mine = sorted(
        (s for s in stages if s["stageId"] > watermark),
        key=lambda s: s["stageId"],
    )
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    tb = min(datetime.strptime(s["firstTaskLaunchedTime"], fmt) for s in mine)
    rows = []
    for s in mine:
        st = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
        en = datetime.strptime(s["completionTime"], fmt)
        rows.append({
            "stage": s["stageId"],
            "at": round((st - tb).total_seconds(), 3),
            "sec": round((en - st).total_seconds(), 3),
            "tasks": s["numCompleteTasks"],
            "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
            "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
            "desc": (s.get("description") or s["name"])[:95],
        })
    print(json.dumps({"query": which, "wall_sec": round(wall, 3),
                      "n_stages": len(rows), "stages": rows}, indent=1))


if __name__ == "__main__":
    main()
