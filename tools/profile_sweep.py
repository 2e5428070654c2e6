"""Sweep many queries in ONE session and flag heavy low-parallelism jobs.

For each named query (or the worst N from BENCH_DETAIL.json), runs it
noop-sinked once and lists every Spark job that took >= ``--min`` seconds
together with its task count. A job whose duration is large while its
task count is far below the core count is leaving cores idle — either a
single-row-group scan doing heavy row-local work on one task
(ensure_parallelism territory) or an AQE bytes-coalesced exchange feeding
a compute-heavy stage (guide §2: AQE sizes partitions by bytes and cannot
see downstream row expansion).

Run:  python tools/profile_sweep.py [--top=N | name ...] [--min=0.5]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_extensions_spark.queries import registry  # noqa: E402
from spark_extensions_spark.session import get_spark  # noqa: E402

_PORT = "4098"


def _rest(path: str):
    base = f"http://127.0.0.1:{_PORT}/api/v1"
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def _ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> int:
    min_dur = 0.5
    top = 0
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--min"):
            min_dur = float(a.split("=")[1])
        elif a.startswith("--top"):
            top = int(a.split("=")[1])
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    by_name = {q.name: q for q in registry()}
    if top:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        detail = json.load(open(os.path.join(here, "BENCH_DETAIL.json")))
        names += [
            k
            for k, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:top]
        ]

    spark = get_spark(
        "profile-sweep",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": _PORT},
    )
    from spark_extensions_spark.session import ALL_TABLES, load_tables

    spark.range(1000).selectExpr("sum(id)").collect()
    for t in load_tables(spark, sf_dir, *ALL_TABLES).values():
        t.write.format("noop").mode("overwrite").save()

    app_id = _rest("/applications")[0]["id"]
    for name in names:
        before = {j["jobId"] for j in _rest(f"/applications/{app_id}/jobs")}
        t0 = time.time()
        try:
            by_name[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # keep sweeping
            print(f"{name}: ERROR {exc}")
            continue
        wall = time.time() - t0
        jobs = [
            j
            for j in _rest(f"/applications/{app_id}/jobs")
            if j["jobId"] not in before and "completionTime" in j
        ]
        flagged = []
        jsum = 0.0
        for j in jobs:
            dur = _ts(j["completionTime"]) - _ts(j["submissionTime"])
            jsum += dur
            if dur >= min_dur:
                flagged.append((dur, j["numCompletedTasks"]))
        flagged.sort(reverse=True)
        fl = " ".join(f"{d:.2f}s/{t}t" for d, t in flagged[:6])
        print(
            f"{name}: wall={wall:.2f} jobs={len(jobs)} jobsum={jsum:.2f} "
            f"gap={wall - jsum:.2f} | {fl}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
