"""SparkSession factory with scale-minded defaults.

The reference library configures nothing session-level (it is a passive
Catalyst extension, ``/root/reference/README.md:1-2``); our engine owns the
session and pins the settings that matter for a 1000-executor / 100 TB
deployment while staying correct on ``local[N]`` test runs:

- AQE on (runtime join-strategy re-pick, partition coalescing, skew-join
  splitting) — the single biggest lever at scale.
- ``spark.sql.session.timeZone=UTC`` — deterministic timestamp semantics
  (matches the DuckDB oracle's naive timestamps).
- Arrow on for any pandas-UDF path.
- Shuffle partitions sized to the local core count for tests; a real
  cluster deployment overrides via ``extra_conf`` (AQE coalescing makes
  over-provisioning cheap).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for local[N] testing; every one of these is safe (or
# strictly better) on a large cluster, where AQE re-derives parallelism.
_DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # The fixture events.parquet stores ts as TIMESTAMP(NANOS), which the
    # Spark parquet reader rejects by default; read as long and convert
    # (load_tables) — matches DuckDB's microsecond-truncated values.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "spark_extensions_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is supplied — mirrors the driver harness.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    # local[N] runs driver + all executor threads in ONE JVM whose
    # default heap is 1g — far too small for N-way parallel shuffles /
    # broadcasts (observed OOM at ~50k-doc similarity joins). Only
    # effective at JVM launch: the first get_spark in the process wins;
    # sessions we didn't build (driver harness) keep their own setting.
    if master.startswith("local"):
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def recommended_conf(
    input_bytes: int,
    executor_cores: int = 4,
    num_executors: int | None = None,
    executor_mem_bytes: int = 16 * 1024**3,
) -> dict[str, str]:
    """Scale-out configuration for a given input size — the 100 TB
    sizing rules of thumb, encoded.

    - ``shuffle.partitions``: target ~192 MiB of shuffled data per
      partition (fits a task comfortably in a few GiB of heap with
      2-3x expansion), rounded up to a multiple of the total core
      count so no wave runs ragged; floor of 2x cores.
    - ``files.maxPartitionBytes``: 256 MiB — big enough that a 100 TB
      scan is ~400k tasks (scheduler-fine), small enough to rebalance
      skewed file layouts.
    - ``autoBroadcastJoinThreshold``: min(10% of executor memory,
      256 MiB) — broadcast as much as safely fits; AQE upgrades at
      runtime anyway.
    - AQE on with skew-join handling (non-negotiable at scale).

    Pass the result to ``get_spark(extra_conf=...)`` or a cluster
    submit; values are strings, ready for ``--conf``.
    """
    target_part = 192 * 1024**2
    parts = max(1, (input_bytes + target_part - 1) // target_part)
    total_cores = executor_cores * (num_executors or 1)
    if num_executors is not None:
        parts = max(parts, 2 * total_cores)
        parts = ((parts + total_cores - 1) // total_cores) * total_cores
    bcast = min(executor_mem_bytes // 10, 256 * 1024**2)
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024**2),
        "spark.sql.autoBroadcastJoinThreshold": str(bcast),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    }


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    pandas-UDF closures reference module-level functions, which pickle by
    reference — workers must import ``spark_extensions_spark`` even when
    the driver process launched from a foreign cwd with no PYTHONPATH.
    Idempotent per session; the zip is tiny (pure Python).
    """
    if getattr(spark, "_sx_pyfiles_added", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"spark_extensions_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    spark._sx_pyfiles_added = True


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read the driver's parquet fixtures and register temp views.

    Returns a dict name -> DataFrame. Scans stay lazy; Catalyst prunes
    columns/filters down to the parquet reader.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    # Callers may hand us a session we didn't build (the driver harness
    # does); pin the runtime confs correctness depends on, and make the
    # package importable on executor workers (pandas-UDF paths).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ensure_workers_can_import(spark)

    out = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        # TIMESTAMP(NANOS) columns arrive as long (nanosAsLong); restore
        # them to timestamps at microsecond precision (exact division —
        # the fixtures carry at most µs resolution).
        if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(cast(ts div 1000 as long))")
            )
        # Fixtures that store ts as TIMESTAMP(MICROS, isAdjustedToUTC=false)
        # read as TIMESTAMP_NTZ in Spark 4; watermarks (streaming paths)
        # require TIMESTAMP. Session tz is pinned UTC, so the cast is
        # value-preserving and matches DuckDB's naive timestamps.
        if name == "events" and isinstance(
            df.schema["ts"].dataType, TimestampNTZType
        ):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def ensure_parallelism(df, min_parts: int | None = None):
    """Restore scan parallelism on unsplittable small inputs.

    A parquet file with a single row group is one scan task no matter
    how large ``maxPartitionBytes`` splits it — so a CPU-heavy
    row-local stage (shingling, per-doc sorts, entropy folds) runs on
    ONE core over a one-file fixture. When the planned scan has fewer
    partitions than the session's parallelism, repartition round-robin
    so the heavy projection lands AFTER the exchange (verified: the
    optimizer does not push the projection back through it).

    At 100 TB inputs arrive as thousands of splits and this is a no-op
    — the check costs one driver-side planning call, no job. Shuffle
    cost when it does fire is one pass over the (small, by
    construction) input bytes, repaid many times over by the restored
    cores (measured 5x on the dup-ngram pass at sf0.1).
    """
    spark = df.sparkSession
    want = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)


def expansion_width(spark) -> int:
    """Partition count for a KEYED exchange that feeds a row-expanding
    or compute-heavy stage and therefore must not be AQE-bytes-coalesced
    (AQE sizes post-shuffle partitions by the exchange's bytes and is
    blind to downstream O(w²) expansion — measured 2-task 0.8 s stages
    on a 32-core session at sf0.1). Returns the LARGER of the session's
    shuffle width and core count, so pinning never lowers real-scale
    parallelism; an explicit ``repartition(expansion_width(s), key)``
    replaces the exchange the following groupBy would have inserted
    anyway (same key ⇒ the aggregation reuses the partitioning)."""
    sc_width = spark.sparkContext.defaultParallelism
    try:
        conf_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        conf_width = 0
    return max(sc_width, conf_width)


ALL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
