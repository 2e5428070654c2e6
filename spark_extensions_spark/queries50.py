"""t2 query registry, batch 50: the STREAMING composed flagship.

Registered into the shared registry (imported from queries49 at module
end). Same determinism rules as the queries.py docstring.

- ``pipeline_streaming_curation``: the streaming twin of the batch
  ``pipeline_release_v2`` flagship (VERDICT r7 #9) — filekafka ingest
  -> per-batch quality gate + monitor -> Bloom-incremental exact
  dedup against a persistent seen-key state -> incremental per-user
  aggregate fold (read-modify-write upserts through the bucketed
  copy-on-write CDC state) -> CDC-to-SCD2 historization across two
  log generations, all through checkpointed availableNow runs. The
  oracle recomputes the final history FROM SCRATCH in one SQL
  statement, so the incremental streaming machinery is verified
  against the batch contract itself (the streaming_match_pattern
  equivalence pattern).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t

# ------------------------------------------------------------------
# pipeline_streaming_curation
# ------------------------------------------------------------------

# Generation boundary and replay slice (same constants in the oracle):
# generation 1 = event_id < 600; generation 2 = the rest PLUS a replay
# of event_id < 60 — duplicate MESSAGES for events the pipeline
# already ingested, the exactly-once violation the dedup stage exists
# to absorb. Sized so both generations are non-empty at every fixture
# scale (events are 1000 rows at sf0.001).
_SC_GEN_BOUND = 600
_SC_REPLAY_BOUND = 60
_SC_BLOOM_D = 3
_SC_BLOOM_M = 8192


def _sc_oracle() -> str:
    snap = (
        "SELECT CAST(user_id AS BIGINT) AS user_id,\n"
        "       MAX(CASE WHEN event_type <> 'error' THEN event_id END)"
        " AS last_event,\n"
        "       CAST(COUNT(CASE WHEN event_type <> 'error' THEN 1 END)"
        " AS BIGINT) AS n_events,\n"
        "       CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)"
        " AS BIGINT) AS n_err\n"
        "  FROM events {where} GROUP BY 1"
    )
    s1 = snap.format(where=f"WHERE event_id < {_SC_GEN_BOUND}")
    s2 = snap.format(where="")
    return f"""
    WITH sc_s1 AS ({s1}),
    sc_s2 AS ({s2}),
    sc_diff AS (
      SELECT s2.user_id,
             s1.user_id IS NULL AS is_new,
             (s1.last_event IS DISTINCT FROM s2.last_event
              OR s1.n_events IS DISTINCT FROM s2.n_events
              OR s1.n_err IS DISTINCT FROM s2.n_err) AS changed
      FROM sc_s2 s2 LEFT JOIN sc_s1 s1 USING (user_id)
    )
    SELECT s1.user_id, s1.last_event, s1.n_events, s1.n_err,
           CAST(1 AS BIGINT) AS valid_from,
           CASE WHEN d.changed THEN CAST(2 AS BIGINT) END AS valid_to,
           NOT d.changed AS is_current
    FROM sc_s1 s1 JOIN sc_diff d USING (user_id)
    UNION ALL
    SELECT s2.user_id, s2.last_event, s2.n_events, s2.n_err,
           CAST(2 AS BIGINT) AS valid_from,
           CAST(NULL AS BIGINT) AS valid_to,
           TRUE AS is_current
    FROM sc_s2 s2 JOIN sc_diff d USING (user_id)
    WHERE d.is_new OR d.changed
    """


@_register(
    "pipeline_streaming_curation",
    _sc_oracle(),
    doc="STREAMING composed flagship — the always-on twin of the batch "
    "release pipeline, over the Kafka-semantics log: events arrive on "
    "a filekafka topic in TWO generations (generation 2 REPLAYS a "
    "slice of generation 1 — duplicate messages, the exactly-once "
    "violation real ingest must absorb); two checkpointed availableNow "
    "runs fold ONLY new offsets, and each micro-batch runs (1) a "
    "quality gate + monitor — 'error' events are excluded from the "
    "served aggregate but TRACKED per user (n_err), the historized "
    "quality statistic; (2) Bloom-prefiltered exact dedup against a "
    "persistent seen-key state (operators/sketches.py:"
    "bloom_prefilter_dedup — per-batch cost independent of corpus "
    "size outside the FPR-bounded probe set), which also makes a "
    "replayed/crash-recovered batch fold to a NO-OP (self-healing "
    "idempotence); (3) an incremental per-user aggregate fold as "
    "read-modify-write upserts through the bucketed copy-on-write CDC "
    "state (operators/incremental.py:apply_cdc_batch — only touched "
    "buckets rewrite). After each generation the state snapshot "
    "historizes via scd2_init/scd2_apply_changes. The oracle "
    "recomputes the 2-version SCD2 history from scratch in one "
    "statement — incremental == recomputed, the strongest equivalence "
    "the harness can express.",
)
def q_pipeline_streaming_curation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_extensions_spark.operators.incremental import (
        apply_cdc_batch,
        read_cdc_state,
        scd2_apply_changes,
        scd2_init,
    )
    from spark_extensions_spark.operators.sketches import (
        bloom_prefilter_dedup,
    )
    from spark_extensions_spark.sources.filekafka import (
        produce,
        register_filekafka,
    )

    register_filekafka(spark)
    ev = _t(spark, sf_dir, "events")["events"]
    root = tempfile.mkdtemp(prefix="filekafka_cur_")
    state_dir = tempfile.mkdtemp(prefix="cur_state_")
    seen_dir = tempfile.mkdtemp(prefix="cur_seen_") + "/keys"
    ckpt = tempfile.mkdtemp(prefix="cur_ckpt_")

    def messages(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("user_id").cast("string").cast("binary").alias("key"),
            F.to_json(F.struct("event_id", "event_type"))
            .cast("binary")
            .alias("value"),
        )

    def read_seen(s) -> DataFrame:
        import os

        if os.path.exists(seen_dir):
            return s.read.parquet(seen_dir)
        return s.createDataFrame([], "k string")

    def fold_batch(batch_df: DataFrame, _batch_id: int) -> None:
        s = batch_df.sparkSession
        parsed = (
            batch_df.select(
                F.col("key").cast("string").cast("bigint").alias("user_id"),
                F.from_json(
                    F.col("value").cast("string"),
                    "event_id bigint, event_type string",
                ).alias("c"),
            )
            .select("user_id", "c.event_id", "c.event_type")
            # within-batch message dedup (payloads for the same event
            # id are identical, so any survivor is THE row)
            .dropDuplicates(["event_id"])
        )
        keyed = parsed.withColumn("k", F.col("event_id").cast("string"))
        flags = bloom_prefilter_dedup(
            keyed,
            read_seen(s),
            "event_id",
            "k",
            d=_SC_BLOOM_D,
            m=_SC_BLOOM_M,
        )
        fresh = keyed.join(
            flags.where(~F.col("confirmed_dup")).select(
                F.col("id").alias("event_id")
            ),
            "event_id",
        )
        # seen-state append BEFORE the fold publish: a batch replayed
        # after a crash between the two writes re-runs as a no-op
        # (every key confirms dup), i.e. the dedup state converts the
        # at-least-once replay into at-most-once folding; losing the
        # fold of a half-committed batch is the documented trade — the
        # filekafka 2-phase sink shows the full exactly-once recipe.
        fresh.select("k").write.mode("append").parquet(seen_dir)
        # quality gate + monitor: errors are excluded from the served
        # aggregate but tracked per user — the historized quality stat
        adm = F.col("event_type") != "error"
        partials = fresh.groupBy("user_id").agg(
            F.max(F.when(adm, F.col("event_id"))).alias("d_last"),
            F.count(F.when(adm, 1)).cast("bigint").alias("d_nev"),
            F.count(F.when(~adm, 1)).cast("bigint").alias("d_nerr"),
        )
        if partials.isEmpty():
            return
        cur = read_cdc_state(s, state_dir)
        if cur is None:
            cur = s.createDataFrame(
                [],
                "user_id bigint, last_event bigint, "
                "n_events bigint, n_err bigint",
            )
        # read-modify-write merge-fold: absolute new rows for TOUCHED
        # keys only, then LWW-upsert through the bucketed CoW state
        merged = partials.join(cur, "user_id", "left").select(
            "user_id",
            F.greatest("d_last", "last_event").alias("last_event"),
            (F.coalesce("n_events", F.lit(0)) + F.col("d_nev"))
            .cast("bigint")
            .alias("n_events"),
            (F.coalesce("n_err", F.lit(0)) + F.col("d_nerr"))
            .cast("bigint")
            .alias("n_err"),
            F.lit("U").alias("op"),
        )
        apply_cdc_batch(
            merged,
            state_dir,
            keys=["user_id"],
            order_col="n_events",
            n_buckets=8,
        )

    def run_ingest() -> None:
        s = (
            spark.readStream.format("filekafka")
            .option("path", root)
            .option("topic", "curation")
            .load()
        )
        q = (
            s.writeStream.foreachBatch(fold_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def snapshot() -> DataFrame:
        state = read_cdc_state(spark, state_dir)
        return state.select(
            "user_id", "last_event", "n_events", "n_err"
        ).localCheckpoint()

    def changes(old: DataFrame, new: DataFrame) -> DataFrame:
        attrs = ["last_event", "n_events", "n_err"]
        o = old.select(
            "user_id", *[F.col(c).alias(f"o_{c}") for c in attrs]
        ).withColumn("__has_o", F.lit(True))
        n = new.select("user_id", *attrs).withColumn(
            "__has_n", F.lit(True)
        )
        j = o.join(n, "user_id", "full_outer")
        same = F.struct(
            *[F.col(f"o_{c}") for c in attrs]
        ).eqNullSafe(F.struct(*[F.col(c) for c in attrs]))
        return (
            j.where(F.col("__has_o").isNull() | ~same)
            .select(
                "user_id",
                *attrs,
                F.when(F.col("__has_o").isNull(), "I")
                .when(F.col("__has_n").isNull(), "D")
                .otherwise("U")
                .alias("op"),
            )
        )

    produce(
        messages(ev.filter(F.col("event_id") < _SC_GEN_BOUND)),
        root,
        "curation",
        num_partitions=8,
    )
    run_ingest()
    snap1 = snapshot()
    produce(
        messages(
            ev.filter(F.col("event_id") >= _SC_GEN_BOUND).unionByName(
                ev.filter(F.col("event_id") < _SC_REPLAY_BOUND)
            )
        ),
        root,
        "curation",
        num_partitions=8,
    )
    run_ingest()
    snap2 = snapshot()

    hist = scd2_init(
        snap1,
        ["user_id"],
        ["last_event", "n_events", "n_err"],
        load_version=1,
    )
    return scd2_apply_changes(
        hist,
        changes(snap1, snap2),
        ["user_id"],
        ["last_event", "n_events", "n_err"],
        load_version=2,
    )
