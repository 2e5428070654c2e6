"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {<worst 10 only>}, "sf": ...} — the full per-query timing map
goes to BENCH_DETAIL.json next to this file (the driver's stdout capture
truncates long lines, which nulled round 1's parsed bench).

Materialization uses the noop sink (full pipeline execution, no driver
collect overhead). Session build time is excluded; one warmup query runs
first so JVM/codegen startup doesn't pollute query timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_extensions_spark.queries import registry  # noqa: E402
from spark_extensions_spark.session import get_spark  # noqa: E402

# Nothing skipped: every registered query (incl. the deterministic
# sign-plane ann_lsh) runs in the headline wall-clock.
SKIP: set[str] = set()

# Re-measure thresholds shared with tools/bench_diff.py's gate so the
# rows the differ would flag are exactly the rows that get a second,
# back-to-back measurement (single source of truth — round-9 review).
from tools.bench_diff import DEFAULT_RATIO as REMEASURE_RATIO  # noqa: E402
from tools.bench_diff import MIN_SECONDS as REMEASURE_MIN_SECONDS  # noqa: E402


def remeasure_contended(
    run_one,
    timings: dict[str, float],
    baseline: dict[str, float],
    ratio: float = REMEASURE_RATIO,
    min_seconds: float = REMEASURE_MIN_SECONDS,
) -> dict[str, dict[str, float]]:
    """Re-run every query whose first timing tripped the regression
    gate vs ``baseline`` and return {name: {first, remeasured}}.

    The second measurement runs back-to-back in the same session after
    the whole suite, so transient machine contention during the first
    pass (the round-8 driver-run artifact: untouched sub-second queries
    recorded 5-11x) is absorbed while a real code regression reproduces.
    bench_diff gates on the re-measured value when present.
    """
    out: dict[str, dict[str, float]] = {}
    for name, t in sorted(timings.items()):
        b = baseline.get(name)
        if b is None or b <= 0:
            continue
        if t > min_seconds and t / b > ratio:
            out[name] = {"first": t, "remeasured": run_one(name)}
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # Size shuffle width to the bench machine: the suite's per-query cost
    # at bench SF is dominated by task scheduling, and AQE re-derives
    # parallelism from data size on a real cluster anyway.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench", extra_conf={"spark.sql.shuffle.partitions": cpus}
    )

    # warmup: absorb JVM/codegen startup, executor package shipping
    # (addPyFile zip), parquet footer reads AND the data pages
    # themselves before timing queries — count() alone is satisfied
    # from footer statistics, so without a full materialization the
    # first queries to touch each table pay cold page-cache disk reads
    # whenever the OS evicted the fixtures (observed as a spurious
    # 2-3x on the first-in-order queries after an unrelated heavy job)
    from spark_extensions_spark.session import ALL_TABLES, load_tables

    spark.range(1000).selectExpr("sum(id)").collect()
    tables = load_tables(spark, sf_dir, *ALL_TABLES)
    for t in tables.values():
        # noop write reads every data page once; also initializes the
        # noop commit machinery before the first timed query
        t.write.format("noop").mode("overwrite").save()
    # spin up the Python/Arrow UDF worker pool once: the first
    # pandas-UDF query otherwise pays worker-fork + Arrow codec init
    # for all 32 cores (observed as a spurious 2-3x on whichever
    # pandas query runs first in registry order)
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # and the streaming machinery (checkpoint manager, state store
    # provider classes) — first streaming query pays it otherwise
    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
    )
    import tempfile

    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    spark.range(64).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").parquet(warm_dir)
    run_available_now(
        read_stream_parquet(spark, warm_dir)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n")),
        output_mode="complete",
        state_partitions=4,
    )

    # De-positioned timing order (VERDICT r7 #4): time the suite in a
    # FIXED md5(name) order decoupled from registry order. Rotation
    # reorders the registry head every round; when it moved queries
    # into positions 1-2 their timings absorbed first-in-session
    # per-shape codegen cost (measured 3-4x vs isolated-warm) and the
    # advanced rolling baseline baked those positional costs in,
    # desensitizing the 2x gate. Hash order is stable across rounds,
    # so the queries paying the residual front-of-suite cost are the
    # SAME queries every round and baselines stay comparable.
    import hashlib

    def _bench_order(name: str) -> str:
        return hashlib.md5(name.encode()).hexdigest()

    by_name = {q.name: q for q in registry()}

    def run_one(name: str) -> float:
        t0 = time.time()
        by_name[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    timings: dict[str, float] = {}
    for q in sorted(registry(), key=lambda q: _bench_order(q.name)):
        if q.name in SKIP:
            continue
        timings[q.name] = run_one(q.name)

    # Self-defending re-measure pass (VERDICT r8 #3): a contended bench
    # machine inflates untouched sub-second queries 5-11x and nothing
    # distinguishes that from a real regression. Re-measure (same
    # session, right after the suite) every query whose first timing
    # exceeded the gate ratio vs the rolling baseline; BENCH_DETAIL
    # records {"first", "remeasured"} per such row and bench_diff gates
    # on the re-measured value. A real regression re-measures slow; a
    # contention artifact re-measures at baseline.
    # trigger baseline = per-query MIN over BOTH gates (rolling AND the
    # frozen epoch): bench_diff gates against both, so a row only the
    # epoch would flag must also get its back-to-back re-measurement
    here = os.path.dirname(os.path.abspath(__file__))
    base_q: dict[str, float] = {}
    for fname in ("BENCH_BASELINE.json", "BENCH_EPOCH.json"):
        try:
            with open(os.path.join(here, fname)) as fh:
                for k, v in json.load(fh)["queries"].items():
                    if k not in base_q or v < base_q[k]:
                        base_q[k] = v
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            pass
    remeasured = remeasure_contended(run_one, timings, base_q)
    # fold the re-measurement into the canonical per-query map: the
    # documented baseline advance is `cp BENCH_DETAIL.json
    # BENCH_BASELINE.json`, and recording the contended FIRST timing
    # there would loosen every future gate by the contention factor
    # (round-9 review: text_readability would have advanced at 1.87s
    # against a true 0.34s). {first, remeasured} keeps provenance.
    for name, rm in remeasured.items():
        timings[name] = min(timings[name], rm["remeasured"])

    total = round(sum(timings.values()), 3)
    ordered = sorted(timings.values())
    median = round(ordered[len(ordered) // 2], 3) if ordered else 0.0
    worst10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "sf": sf,
                "n_queries": len(timings),
                "queries": timings,
                # gate on these where present (see remeasure_contended)
                "remeasured": remeasured,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": "t2_query_suite_wall",
                "value": total,
                "unit": "sec",
                # compact: worst-10 only; full map in BENCH_DETAIL.json
                "queries": worst10,
                # normalization aids: the suite GROWS between rounds, so
                # total wall is not comparable round-over-round — per-query
                # median and count are.
                "n_queries": len(timings),
                "median_query_sec": median,
                "n_remeasured": len(remeasured),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
