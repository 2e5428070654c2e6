"""Per-job wall-clock decomposition of one registered query.

Optimization work needs to know WHERE a query's seconds go before
touching it (guide §1): this runs one query noop-sinked in a fresh
session with the UI status API on, then prints every Spark job the
query ran — duration, stage count, task count, shuffle read/write
bytes, and the job group/description — plus the total python-side
wall. Iterative/streaming queries show their per-round/per-batch job
structure directly.

Run:  python tools/profile_query.py <query> [sf_dir] [--repeat N]

The query runs once cold (JVM/codegen warmup charged to run 1) and
``--repeat`` more times warm; jobs listed are the LAST run's only,
so the decomposition reflects steady-state cost, not first-run
compilation.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_extensions_spark.queries import registry  # noqa: E402
from spark_extensions_spark.session import get_spark  # noqa: E402

_PORT = "4099"


def _rest(path: str):
    base = f"http://127.0.0.1:{_PORT}/api/v1"
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    repeat = 1
    for a in sys.argv[1:]:
        if a.startswith("--repeat"):
            repeat = int(a.split("=")[1]) if "=" in a else 2

    by_name = {q.name: q for q in registry()}
    q = by_name[name]
    spark = get_spark(
        f"profile-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": _PORT},
    )
    # warm the table caches / codegen identically to bench.py
    from spark_extensions_spark.session import ALL_TABLES, load_tables

    spark.range(1000).selectExpr("sum(id)").collect()
    for t in load_tables(spark, sf_dir, *ALL_TABLES).values():
        t.write.format("noop").mode("overwrite").save()

    walls = []
    first_job = 0
    for i in range(1 + repeat):
        jobs_before = _rest("/applications")[0]["id"]  # ensure app up
        before_ids = {j["jobId"] for j in _rest(f"/applications/{jobs_before}/jobs")}
        t0 = time.time()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
        app_id = _rest("/applications")[0]["id"]
        all_jobs = _rest(f"/applications/{app_id}/jobs")
        run_jobs = sorted(
            (j for j in all_jobs if j["jobId"] not in before_ids),
            key=lambda j: j["jobId"],
        )
    print(f"walls: {walls}  (run1 = cold)")
    total = 0.0
    from datetime import datetime

    def _ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    rows = []
    for j in run_jobs:
        dur = _ts(j["completionTime"]) - _ts(j["submissionTime"])
        total += dur
        rows.append((dur, j))
    for dur, j in rows:
        desc = (j.get("description") or j["name"])[:110]
        print(
            f"  {dur:7.3f}s  tasks={j['numCompletedTasks']:4d} "
            f"stages={len(j['stageIds']):2d}  {desc}"
        )
    print(f"job-time sum: {total:.3f}s over {len(run_jobs)} jobs "
          f"(gaps = driver/python time: {walls[-1] - total:.3f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
