"""t2 query registry, batch 42: rank statistics, decomposition,
generation/retrieval evals, frontier analytics.

Registered into the shared registry (imported from queries41 at module
end). Same determinism rules as the queries.py docstring.

- ``stat_kendall_tau``: exact tie-corrected Kendall tau-b by grid
  prefix sums (operators/stats.py:kendall_tau) — the O(n²) pair
  counts computed from the bucketized joint domain in two partitioned
  window passes.
- ``ts_decompose``: classical additive seasonal decomposition of the
  daily order-count series (operators/timeseries.py:
  decompose_additive) — trend·P, per-position seasonal ratio and the
  residual numerator, all exact BIGINTs (no signed intdiv anywhere).
- ``eval_bleu``: corpus-BLEU components with clipped n-gram counts
  (operators/evals.py:bleu_counts) — the generation-quality twin of
  eval_rouge2, exact integers through the e6 precisions.
- ``eval_mrr``: reciprocal rank of the true nearest non-self neighbor
  in the deterministic IVF ranking — the retrieval MRR gate.
- ``analytic_skyline``: 2-D Pareto frontier (earliest date, highest
  price) via the two-phase windowed skyline
  (operators/skyline.py:skyline_2d); oracle is the literal NOT EXISTS
  dominance definition — an INDEPENDENT formulation, not shared SQL.
- ``window_running_distinct``: running COUNT(DISTINCT) over an ordered
  per-key window — an aggregate Spark's window exec does not support
  (SPARK-30396); re-expressed exactly as a first-occurrence-flag
  running sum. The DuckDB oracle uses the NATIVE distinct window
  aggregate, so the two engines compute it by different algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_extensions_spark.operators.evals import bleu_oracle_sql
from spark_extensions_spark.operators.skyline import (
    skyline_2d,
    skyline_oracle_sql,
)
from spark_extensions_spark.operators.stats import kendall_tau_oracle_sql
from spark_extensions_spark.operators.timeseries import decompose_oracle_sql
from spark_extensions_spark.queries import _register, _t


# =====================================================================
# Exact Kendall tau-b: does order price trend with time?
# =====================================================================

# integer signals with bounded domains (the kendall_tau contract):
# month index since epoch of the order date, and the price in whole
# thousands — floor of a shared correctly-rounded double, identical
# in both engines
_KT_X_SPARK = "year(o_orderdate) * 12 + month(o_orderdate)"
_KT_X_DUCK = (
    "EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate)"
)
_KT_Y = "CAST(floor(o_totalprice / 1000) AS BIGINT)"


@_register(
    "stat_kendall_tau",
    kendall_tau_oracle_sql(
        f"SELECT {_KT_X_DUCK} AS mx, {_KT_Y} AS pk FROM orders",
        "mx",
        "pk",
    ),
    doc="Exact tie-corrected Kendall tau-b (operators/stats.py:"
    "kendall_tau) between order month and price-in-thousands: the "
    "O(n²) concordant/discordant pair counts computed EXACTLY from "
    "the joint domain — one hash aggregate to (x, y, cnt) cells, "
    "densify to the dx·dy grid, two PARTITIONED cumulative window "
    "passes give strict 2-D dominance counts. All pair counts are "
    "BIGINT; tau is one division by a correctly-rounded sqrt "
    "(cohen_kappa's fp contract). The rank-correlation drift test "
    "for monotone-association checks between corpus features.",
)
def q_stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.stats import kendall_tau

    orders = _t(spark, sf_dir, "orders")["orders"]
    src = orders.select(
        F.expr(_KT_X_SPARK).cast("bigint").alias("mx"),
        F.expr(_KT_Y).alias("pk"),
    )
    return kendall_tau(src, "mx", "pk")


# =====================================================================
# Additive seasonal decomposition of the daily order-count series
# =====================================================================


@_register(
    "ts_decompose",
    decompose_oracle_sql(
        "SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS v"
        " FROM orders GROUP BY 1",
        "d",
        "v",
        period=7,
    ),
    doc="Classical additive seasonal decomposition "
    "(operators/timeseries.py:decompose_additive) of the daily "
    "order-count series, period 7: centered trend·7 (exact window "
    "SUM), season position by pure integer date arithmetic (portable "
    "— engine dayofweek origins differ), per-position seasonal index "
    "carried as an exact num/den ratio, residual as an exact scaled "
    "numerator. NO division anywhere, so the signed-intdiv semantics "
    "seam (Spark div truncates, DuckDB // floors) never opens. The "
    "ordered window runs over the per-date aggregate — domain-sized "
    "bounded input, the ks_statistic contract.",
)
def q_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.timeseries import (
        decompose_additive,
    )

    orders = _t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).alias("v"))
    return decompose_additive(daily, "d", "v", period=7)


# =====================================================================
# Corpus-BLEU components over adjacent-document pairs
# =====================================================================

_BLEU_PAIRS_DUCK = """
    SELECT r.doc_id AS doc_id, r.text AS ref_text, h.text AS hyp_text
    FROM documents r JOIN documents h ON h.doc_id = r.doc_id + 1
"""


@_register(
    "eval_bleu",
    bleu_oracle_sql(
        _BLEU_PAIRS_DUCK, "doc_id", "ref_text", "hyp_text", max_n=2
    ),
    doc="Corpus-BLEU components (operators/evals.py:bleu_counts; "
    "Papineni et al. 2002) over the same adjacent-document pairing "
    "as eval_rouge2: clipped 1/2-gram matches, totals, token lengths "
    "and e6 fixed-point modified precisions — all exact BIGINTs, the "
    "full per-pair table hash-verified. The brevity penalty / "
    "geometric mean (non-portable exp/log) fold over the SUMS of "
    "these columns driver-side. Per n: row-local gram expansion, one "
    "(pair, gram) hash agg per side, equi-join on the same key — no "
    "broadcast of anything corpus-sized.",
)
def q_eval_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.evals import bleu_counts
    from spark_extensions_spark.session import ensure_parallelism

    # same single-partition gram-explosion stage as eval_rouge2
    # (measured: six ~1 s single-task jobs at sf0.1) — widen the scan
    docs = ensure_parallelism(_t(spark, sf_dir, "documents")["documents"])
    pairs = (
        docs.alias("r")
        .join(
            docs.alias("h"),
            F.col("h.doc_id") == F.col("r.doc_id") + 1,
        )
        .select(
            F.col("r.doc_id").alias("doc_id"),
            F.col("r.text").alias("ref_text"),
            F.col("h.text").alias("hyp_text"),
        )
    )
    return bleu_counts(pairs, "doc_id", "ref_text", "hyp_text", max_n=2)


# =====================================================================
# MRR of the true nearest non-self neighbor under the IVF ranking
# =====================================================================

_MRR_K = 10
_MRR_LISTS, _MRR_PROBE = 16, 4


def _mrr_oracle() -> str:
    from spark_extensions_spark.queries2 import _ann_ivf_oracle
    from spark_extensions_spark.queries38 import exact_topk_oracle

    return f"""
    WITH truth AS (
      SELECT query_id, neighbor_id AS truth_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rank)
                 AS nsr
        FROM ({exact_topk_oracle(2)}) e
        WHERE neighbor_id <> query_id
      ) WHERE nsr = 1
    ),
    approx AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rank)
               AS arank
      FROM ({_ann_ivf_oracle(_MRR_LISTS, _MRR_PROBE, _MRR_K)}) a
      WHERE neighbor_id <> query_id
    )
    SELECT t.query_id, t.truth_id,
           CAST(COALESCE(a.arank, 0) AS BIGINT) AS found_rank,
           CAST(CASE WHEN a.arank IS NULL THEN 0
                ELSE 1000000 // a.arank END AS BIGINT) AS rr_e6
    FROM truth t
    LEFT JOIN approx a
      ON a.query_id = t.query_id AND a.neighbor_id = t.truth_id
    """


@_register(
    "eval_mrr",
    _mrr_oracle(),
    doc="Retrieval MRR gate: per query, the reciprocal rank (e6 "
    "fixed-point — positive intdiv, portable) of the TRUE nearest "
    "non-self neighbor (exact brute-force rank 2 under the "
    "deterministic tiebreak) within the deterministic IVF top-10 "
    "with self filtered and ranks re-densified. 0 when the index "
    "misses it entirely. Mean of rr_e6 is corpus MRR downstream. "
    "Same scale shape as eval_ann_recall: broadcast-small query "
    "side, corpus never reshuffled, the comparison an id-keyed "
    "left join.",
)
def q_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.similarity import (
        ann_ivf_topk_det,
    )
    from spark_extensions_spark.queries import EMB_DIM
    from spark_extensions_spark.queries38 import exact_topk_spark

    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    w = Window.partitionBy("query_id").orderBy("rank")
    truth = (
        exact_topk_spark(spark, sf_dir, 2)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("nsr", F.row_number().over(w))
        .where(F.col("nsr") == 1)
        .select("query_id", F.col("neighbor_id").alias("truth_id"))
    )
    approx = (
        ann_ivf_topk_det(
            emb, queries, "vec_id", "embedding", "vec_id", "embedding",
            k=_MRR_K, dim=EMB_DIM, n_lists=_MRR_LISTS, n_probe=_MRR_PROBE,
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("arank", F.row_number().over(w))
        .select("query_id", "neighbor_id", "arank")
    )
    j = truth.join(
        approx,
        (approx["query_id"] == truth["query_id"])
        & (approx["neighbor_id"] == truth["truth_id"]),
        "left",
    )
    return j.select(
        truth["query_id"],
        "truth_id",
        F.coalesce("arank", F.lit(0)).cast("bigint").alias("found_rank"),
        F.when(F.col("arank").isNull(), F.lit(0))
        .otherwise(F.expr("1000000 div arank"))
        .cast("bigint")
        .alias("rr_e6"),
    )


# =====================================================================
# 2-D skyline: record-setting orders of 1995
# =====================================================================

_SKY_SRC_DUCK = """
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '1992-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1995
"""


@_register(
    "analytic_skyline",
    skyline_oracle_sql(_SKY_SRC_DUCK, "day_no", "price_e2"),
    doc="2-D Pareto frontier (operators/skyline.py:skyline_2d; "
    "Borzsony/Kossmann/Stocker ICDE'01) of 1995's orders under "
    "(earliest day, highest price): the record-setting orders no "
    "earlier-or-same-day order matched. Two-phase windowed prune — "
    "hash-bucketed PARTITIONED dominance windows drop everything "
    "locally dominated, then the same two windows over the bucket "
    "skylines (bounded survivor set). The oracle is the literal "
    "quadratic NOT EXISTS dominance definition — an independent "
    "formulation, not shared SQL. Prices as floor-e2 fixed point of "
    "the same double in both engines.",
)
def q_analytic_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    src = orders.where(F.expr("year(o_orderdate) = 1995")).select(
        "o_orderkey",
        F.expr("datediff(o_orderdate, date'1992-01-01')")
        .cast("bigint")
        .alias("day_no"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias(
            "price_e2"
        ),
    )
    return skyline_2d(src, "day_no", "price_e2")


# =====================================================================
# Running COUNT(DISTINCT) over an ordered window
# =====================================================================


@_register(
    "window_running_distinct",
    """
    SELECT user_id, event_id,
           CAST(COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS run_types
    FROM events
    """,
    doc="Running COUNT(DISTINCT event_type) per user in event order — "
    "a window aggregate Spark's WindowExec does NOT support "
    "(DISTINCT in windows, SPARK-30396), re-expressed exactly: a "
    "first-occurrence flag (row_number = 1 per (user, type)) summed "
    "over the ordered frame. Two partitioned windows, one shuffle on "
    "user_id. The DuckDB oracle uses its NATIVE distinct window "
    "aggregate — the engines compute the same answer by genuinely "
    "different algorithms.",
)
def q_window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn(
            "__first",
            # NULL types are excluded (SQL COUNT(DISTINCT) semantics;
            # the oracle's native distinct window skips NULLs too)
            F.when(
                F.col("event_type").isNotNull()
                & (F.row_number().over(w_first) == 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("__first").over(w_run).cast("bigint").alias("run_types"),
        )
    )


# =====================================================================
# Exact Spearman rho over the same joint signal as Kendall
# =====================================================================

from spark_extensions_spark.operators.stats import spearman_oracle_sql  # noqa: E402


@_register(
    "stat_spearman",
    spearman_oracle_sql(
        f"SELECT {_KT_X_DUCK} AS mx, {_KT_Y} AS pk FROM orders",
        "mx",
        "pk",
    ),
    doc="Exact tie-corrected Spearman rho (operators/stats.py:"
    "spearman_rho) over the same (order month, price-in-thousands) "
    "signal as stat_kendall_tau: Pearson on doubled CENTERED average "
    "ranks computed from the value DOMAIN — no global row sort, the "
    "doubled mean rank is exactly n+1 so centered ranks sum to zero "
    "and the correlation is three DECIMAL(38,0)-summed products plus "
    "one division by a correctly-rounded sqrt. Decimal intermediates "
    "never surface (output is bigint n + double rho). With Kendall, "
    "the pair of rank-correlation gates drift monitoring wants.",
)
def q_stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.stats import spearman_rho

    orders = _t(spark, sf_dir, "orders")["orders"]
    src = orders.select(
        F.expr(_KT_X_SPARK).cast("bigint").alias("mx"),
        F.expr(_KT_Y).alias("pk"),
    )
    return spearman_rho(src, "mx", "pk")


# =====================================================================
# CUSUM change-point + Benford audit
# =====================================================================

from spark_extensions_spark.operators.timeseries import cusum_oracle_sql  # noqa: E402
from spark_extensions_spark.operators.quality import benford_oracle_sql  # noqa: E402

_DAILY_DUCK = (
    "SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS v"
    " FROM orders GROUP BY 1"
)


@_register(
    "ts_changepoint",
    cusum_oracle_sql(_DAILY_DUCK, "d", "v"),
    doc="Single change-point detection on the daily order-count "
    "series (operators/timeseries.py:cusum_changepoint; Page 1954): "
    "the scaled CUSUM C_k = n·P_k − k·S is an exact BIGINT (no "
    "division, no floats), the change-point the deterministic "
    "argmax |C_k| with earliest-date ties. One domain-sized ordered "
    "prefix window over the per-date aggregate + a bounded "
    "ORDER BY/LIMIT 1 — the drift-localization twin of the "
    "distribution-level stat_psi/stat_ks gates.",
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.timeseries import (
        cusum_changepoint,
    )

    orders = _t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).alias("v"))
    return cusum_changepoint(daily, "d", "v")


@_register(
    "quality_benford",
    benford_oracle_sql("SELECT o_totalprice FROM orders", "o_totalprice"),
    doc="Benford first-significant-digit audit of order totals "
    "(operators/quality.py:benford_audit): observed e6 digit shares "
    "vs the PUBLISHED log10(1+1/d) constants (literals — log10 is "
    "libm and not hash-portable), first digit via integer/string "
    "ops on the floored amount so both engines agree bit-for-bit. "
    "The fabricated-data / unit-mix-up gate for financial-ish "
    "measures; one row-local projection + a 9-group hash aggregate "
    "joined onto a 9-row literal spine.",
)
def q_quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.quality import benford_audit

    orders = _t(spark, sf_dir, "orders")["orders"]
    return benford_audit(orders, "o_totalprice")


# =====================================================================
# t-closeness + Gini concentration
# =====================================================================

from spark_extensions_spark.operators.privacy import (  # noqa: E402
    t_closeness_classes,
    t_closeness_oracle_sql,
)
from spark_extensions_spark.operators.stats import gini_oracle_sql  # noqa: E402

_TC_QUASI = ["c_nationkey", "c_mktsegment"]
_TC_SQL = """(
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
    FROM customer
)"""


@_register(
    "privacy_t_closeness",
    t_closeness_oracle_sql(_TC_SQL, _TC_QUASI, "bal_band", t_e6=200_000),
    doc="Per-equivalence-class t-closeness audit (operators/privacy.py:"
    "t_closeness_classes; Li/Li/Venkatasubramanian ICDE'07), the "
    "distribution-level tightening of k-anonymity/l-diversity over "
    "the same (nation, segment) -> balance-band release: the "
    "class-vs-table total-variation distance with cleared "
    "denominators — tvd_num/tvd_den exact BIGINTs, absent sensitive "
    "values folded in closed form so the domain is never densified "
    "per class, the t <= 0.2 gate cross-multiplied. One joint hash "
    "aggregate + broadcast marginals; no window.",
)
def q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")["customer"]
    src = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    return t_closeness_classes(src, _TC_QUASI, "bal_band", t_e6=200_000)


@_register(
    "stat_gini",
    gini_oracle_sql("SELECT n_chars FROM documents", "n_chars"),
    doc="Exact Gini coefficient of document lengths (operators/"
    "stats.py:gini_exact) — the corpus-concentration audit (is the "
    "token mass dominated by a few giant documents?). The sorted-rank "
    "formula collapsed onto the value DOMAIN: tie blocks contribute "
    "x·cnt·(2·below + cnt − n) in closed form, so there is no "
    "row-level sort — one hash aggregate + one domain-sized "
    "cumulative window, numerator summed in DECIMAL(38,0)/HUGEINT "
    "(O(n²·x), past int64 at corpus scale), decimals never surface.",
)
def q_stat_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.stats import gini_exact

    docs = _t(spark, sf_dir, "documents")["documents"]
    return gini_exact(docs, "n_chars")


# =====================================================================
# Sliding COUNT(DISTINCT) window via interval-stab algebra
# =====================================================================

_SLD_K = 10


@_register(
    "window_sliding_distinct",
    f"""
    SELECT user_id, event_id,
           CAST(COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {_SLD_K - 1} PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS win_distinct
    FROM events
    """,
    doc="SLIDING COUNT(DISTINCT event_type) over the last 10 events "
    "per user (operators/windows.py:sliding_count_distinct) — unlike "
    "the running form, no first-occurrence flag works for a moving "
    "frame, so it is computed by interval-stab algebra: each "
    "occurrence covers positions [i, min(next_pos, i+k)-1], a "
    "difference array (+1/-1) plus one prefix sum counts the stabs. "
    "Three per-key windows + one (key,pos) join, O(1) work per row, "
    "no frame buffering (the collect_set emulation is O(n*k)). "
    "The DuckDB oracle runs its NATIVE sliding distinct window — "
    "different algorithm entirely, same hash.",
)
def q_window_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.windows import (
        sliding_count_distinct,
    )

    ev = _t(spark, sf_dir, "events")["events"]
    return sliding_count_distinct(
        ev, ["user_id"], ["ts", "event_id"], "event_type", k=_SLD_K
    ).select("user_id", "event_id", "win_distinct")


# batch 43 registers at import time, same chain as queries41 -> 42
from spark_extensions_spark import queries43  # noqa: E402,F401  (registration side effect)
