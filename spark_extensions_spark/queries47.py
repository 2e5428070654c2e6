"""t2 query registry, batch 47: round-7 wave 3 — streaming drift
monitor and exact embedding label-coherence audit.

Registered into the shared registry (imported from queries46 at module
end). Same determinism rules as the queries.py docstring.

- ``streaming_quality_monitor``: per-day event-mix PSI against a fixed
  reference distribution, computed over a Structured Streaming
  tumbling-window aggregate — the always-on data-quality alarm of an
  ingest pipeline, sharing the stat_psi fixed-point recipe.
- ``embedding_label_coherence``: per-label mean intra- vs cross-label
  dot product via the Gram identity Σ_{i,j∈L} q_i·q_j = |Σq|² —
  the embedding-space audit of labeled training data computed WITHOUT
  materializing any pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t

# ------------------------------------------------------------------
# streaming_quality_monitor
# ------------------------------------------------------------------

_QM_TYPES = ["click", "error", "purchase", "signup", "view"]
_QM_REF = 1.0 / len(_QM_TYPES)  # uniform reference mix


def _qm_term_sql(c: str, n: str) -> str:
    """One PSI term vs the uniform reference, e12-quantized BEFORE the
    cross-bucket sum (the stat_psi recipe): p = (c+1)/(n+k),
    term = (p − r)·ln(p/r) ≥ 0."""
    k = len(_QM_TYPES)
    p = f"(({c} + 1) / (CAST({n} AS DOUBLE) + {k}))"
    return (
        f"CAST(FLOOR(({p} - {_QM_REF!r}) * ln({p} / {_QM_REF!r})"
        f" * 1e12 + 0.5) AS BIGINT)"
    )


def _qm_oracle() -> str:
    vals = ", ".join(f"('{t}')" for t in _QM_TYPES)
    return f"""
    WITH qm_counts AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS win_start,
             event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    qm_wins AS (
      SELECT win_start, SUM(c) AS n FROM qm_counts GROUP BY 1
    ),
    qm_grid AS (
      SELECT w.win_start, w.n, t.event_type, COALESCE(c.c, 0) AS c
      FROM qm_wins w
      CROSS JOIN (SELECT * FROM (VALUES {vals}) v(event_type)) t
      LEFT JOIN qm_counts c
        ON c.win_start = w.win_start AND c.event_type = t.event_type
    )
    SELECT win_start,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(SUM({_qm_term_sql('c', 'n')}) AS BIGINT) AS psi_e12
    FROM qm_grid GROUP BY win_start
    """


@_register(
    "streaming_quality_monitor",
    _qm_oracle(),
    doc="The always-on ingest-quality alarm: a Structured Streaming "
    "tumbling-window (1 day) aggregate of the event-type mix, then "
    "per-window PSI against a fixed reference distribution (uniform "
    "here; production pins last-release's mix). The streaming side is "
    "the same availableNow replay as streaming_window_agg; PSI "
    "post-processing runs on the DOMAIN-sized window×type grid "
    "(windows × 5 types, built by a cross join against the fixed type "
    "list so empty cells get the epsilon pseudo-count) using the "
    "stat_psi fixed-point recipe — each term e12-quantized before the "
    "exact cross-bucket sum, so ln() never touches an "
    "order-dependent aggregation.",
)
def q_streaming_quality_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_extensions_spark.queries2 import _events_stream_path
    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
        windowed_aggregate,
    )

    stream = read_stream_parquet(spark, _events_stream_path(spark, sf_dir))
    counts = run_available_now(
        windowed_aggregate(
            stream,
            "ts",
            "1 day",
            aggs=[F.count("*").alias("c")],
            keys=["event_type"],
            watermark_delay="1 day",
        ),
        output_mode="update",
        state_partitions=8,
    )
    # The update-mode memory sink APPENDS each micro-batch's updated
    # rows: if availableNow splits the replay into >1 micro-batch a
    # (win_start, event_type) key appears once per batch with its
    # then-current partial count.  Counts are monotonically
    # non-decreasing across batches, so MAX per key recovers the
    # final value regardless of how the trigger split the input.
    counts = counts.groupBy("win_start", "event_type").agg(
        F.max("c").alias("c")
    )
    wins = counts.groupBy("win_start").agg(F.sum("c").alias("n"))
    types = spark.createDataFrame(
        [(t,) for t in _QM_TYPES], "event_type string"
    )
    # rename one side of the shared-lineage self-join to keep the
    # grid join unambiguous
    cells = counts.select(
        F.col("win_start").alias("cw"),
        F.col("event_type").alias("ct"),
        F.col("c").alias("cc"),
    )
    grid = (
        wins.crossJoin(F.broadcast(types))
        .join(
            cells,
            (F.col("win_start") == F.col("cw"))
            & (F.col("event_type") == F.col("ct")),
            "left",
        )
        .select(
            "win_start",
            "n",
            F.coalesce(F.col("cc"), F.lit(0)).alias("c"),
        )
    )
    return grid.groupBy("win_start").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.sum(F.expr(_qm_term_sql("c", "n")))
        .cast("bigint")
        .alias("psi_e12"),
    )


# ------------------------------------------------------------------
# embedding_label_coherence
# ------------------------------------------------------------------

_LC_QUANT = 1000  # e3 element quantization keeps |Σq|² inside int64
_LC_DIM = 64


def _lc_oracle() -> str:
    q = (
        f"list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
        f" * {_LC_QUANT} + 0.5) AS BIGINT))"
    )
    return f"""
    WITH lc_q AS (SELECT label, {q} AS qq FROM embeddings),
    lc_dims AS (
      SELECT label, d, SUM(qq[d]) AS s
      FROM lc_q CROSS JOIN generate_series(1, {_LC_DIM}) g(d)
      GROUP BY 1, 2
    ),
    lc_lab AS (
      SELECT q.label,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(list_sum(list_transform(qq, x -> x * x)))
                  AS BIGINT) AS qsum
      FROM lc_q q GROUP BY 1
    ),
    lc_s2 AS (
      SELECT label, CAST(SUM(s * s) AS BIGINT) AS s2
      FROM lc_dims GROUP BY 1
    ),
    lc_all AS (
      SELECT d, SUM(s) AS s_all FROM lc_dims GROUP BY d
    ),
    lc_cross AS (
      SELECT ld.label,
             CAST(SUM(ld.s * (a.s_all - ld.s)) AS BIGINT) AS cross_num
      FROM lc_dims ld JOIN lc_all a USING (d) GROUP BY 1
    ),
    lc_tot AS (SELECT SUM(n) AS n_all FROM lc_lab)
    SELECT l.label,
           l.n,
           CAST(s.s2 - l.qsum AS BIGINT) AS intra_num,
           CAST(l.n * (l.n - 1) AS BIGINT) AS intra_den,
           c.cross_num,
           CAST(l.n * (t.n_all - l.n) AS BIGINT) AS cross_den
    FROM lc_lab l
    JOIN lc_s2 s USING (label)
    JOIN lc_cross c USING (label)
    CROSS JOIN lc_tot t
    """


@_register(
    "embedding_label_coherence",
    _lc_oracle(),
    doc="Embedding-space audit of labeled training data: per label, "
    "the SUM of all intra-label pairwise dot products and of all "
    "cross-label dot products — computed WITHOUT materializing a "
    "single pair via the Gram identity Σ_{{i,j∈L}} q_i·q_j = |Σ_{{i∈L}} "
    "q_i|² (so intra_num = |S_L|² − Σ|q_i|², cross_num = "
    "S_L·(S_all − S_L)). One row-local e3 quantization (keeps every "
    "product in int64 — e6 overflows at corpus scale), one posexplode "
    "+ hash agg to the (label, dim) table (domain-sized: "
    "|labels|·dim), and pure integer algebra after — the all-pairs "
    "O(n²·dim) computation collapses to O(n·dim). Numerators and "
    "denominators are emitted exactly; consumers divide (mean intra "
    "dot = intra_num/intra_den) — emitting the division would hit "
    "the trunc-vs-floor engine seam on negative dots.",
)
def q_embedding_label_coherence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.select(
        "label",
        F.expr(
            f"transform(embedding, v -> cast(floor(cast(v as double)"
            f" * {_LC_QUANT} + 0.5d) as bigint))"
        ).alias("qq"),
    )
    lab = q.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.expr("aggregate(transform(qq, x -> x * x), 0L, (a, b) -> a + b)")
        )
        .cast("bigint")
        .alias("qsum"),
    )
    dims = (
        q.select("label", F.posexplode("qq").alias("d", "v"))
        .groupBy("label", "d")
        .agg(F.sum("v").alias("s"))
    )
    s2 = dims.groupBy("label").agg(
        F.sum(F.expr("s * s")).cast("bigint").alias("s2")
    )
    alls = dims.groupBy("d").agg(F.sum("s").alias("s_all"))
    cross = (
        dims.join(F.broadcast(alls), "d")
        .groupBy("label")
        .agg(
            F.sum(F.expr("s * (s_all - s)")).cast("bigint").alias("cross_num")
        )
    )
    tot = lab.agg(F.sum("n").alias("n_all"))
    return (
        lab.join(s2, "label")
        .join(cross, "label")
        .crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n",
            (F.col("s2") - F.col("qsum")).cast("bigint").alias("intra_num"),
            (F.col("n") * (F.col("n") - 1))
            .cast("bigint")
            .alias("intra_den"),
            "cross_num",
            (F.col("n") * (F.col("n_all") - F.col("n")))
            .cast("bigint")
            .alias("cross_den"),
        )
    )


# ------------------------------------------------------------------
# deterministic HLL (hash-checkable register table + estimate)
# ------------------------------------------------------------------

from spark_extensions_spark.operators.sketches import (  # noqa: E402
    hll_estimate,
    hll_estimate_oracle_sql,
    hll_register_oracle_sql,
    hll_register_table,
)


@_register(
    "agg_hll_table",
    hll_register_oracle_sql("SELECT o_custkey FROM orders", "o_custkey"),
    doc="Deterministic HyperLogLog REGISTER table over order customers "
    "(operators/sketches.py:hll_register_table; Flajolet et al. 2007) "
    "— md5-derived buckets and integer bit-length ranks make every "
    "one of the 256 registers an exact integer, so the WHOLE sketch "
    "hash-checks against the oracle (the JVM hll_sketch_agg twin "
    "stays rows-only because its register layout is engine-internal). "
    "Row-local hashing + ONE map-side-combinable max aggregate: "
    "shuffle volume ≤ 256·partitions at any corpus size; shard merge "
    "= elementwise register max (property-tested).",
)
def q_agg_hll_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return hll_register_table(o.select("o_custkey"), "o_custkey")


@_register(
    "agg_hll_estimate",
    hll_estimate_oracle_sql("SELECT o_custkey FROM orders", "o_custkey"),
    doc="The full deterministic-HLL cardinality estimate, hash-checked "
    "END TO END including the estimate itself "
    "(operators/sketches.py:hll_estimate): the register sum rides as "
    "the exact integer Σ2^(53−reg) (< 2^61, no double-rounding seam), "
    "the α·m²·2^53 numerator is one shared literal, and the "
    "small-range linear-counting branch is the same fixed IEEE ops in "
    "both engines. exact_distinct and err_e6 ride along, so the "
    "accuracy claim is part of the verified surface — no other "
    "engine's HLL can hash-check its estimate.",
)
def q_agg_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return hll_estimate(o.select("o_custkey"), "o_custkey")


# batch 48 registers at import time, same chain as queries46 -> 47
from spark_extensions_spark import queries48  # noqa: E402,F401  (registration side effect)
