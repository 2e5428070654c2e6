"""t2 query registry, batch 20: TPC-H analytic completion + retrieval.

Registered into the shared registry (imported from queries16 at module
end). Same determinism rules as the queries.py docstring.

Two families:

1. The remaining classic TPC-H query *shapes* expressible on the
   driver's schema (no partsupp / commitdate / shipmode columns, so
   Q2/Q11/Q12/Q16/Q20 are out of reach; predicates on the missing
   columns are swapped for equivalent-shape predicates on existing
   ones). Together with the earlier analogues (Q1 agg_pricing_summary,
   Q5 analytic_revenue_by_nation, Q8 analytic_market_share,
   Q10 analytic_returned_customers) this covers the canonical
   scan→join→agg→topk plan space graders compare engines on:
   Q3 shipping priority, Q6 forecast revenue, Q7 nation traffic,
   Q13 order-count distribution, Q14 promo share, Q17 small-quantity
   revenue, Q18 big orders, Q19 bracket revenue, Q21 last-shipper
   blame, Q22 idle customers.

2. Distributed lexical retrieval (operators/retrieval.py): BM25
   top-k search and per-doc TF-IDF characteristic terms over the
   documents corpus — the keyword-audit surface of a training-data
   pipeline, built on inverted-index aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_extensions_spark.queries import (
    _register,
    _t,
    dsum,
    dsum_duck,
    davg,
    davg_duck,
)
from spark_extensions_spark.operators import retrieval


# =====================================================================
# TPC-H Q3 — shipping priority (top-10 unshipped revenue)
# =====================================================================

@_register(
    "analytic_shipping_priority",
    f"""
    SELECT l.l_orderkey, {dsum_duck("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: segment filter pushed to the customer scan, two "
    "equi-joins (customer side broadcastable), hash agg, global top-10 "
    "with unique tiebreak. o_shippriority column absent from schema.",
)
def q_analytic_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-07-01").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# =====================================================================
# TPC-H Q6 — forecast revenue change (single-row scan-agg)
# =====================================================================

@_register(
    "analytic_forecast_revenue",
    f"""
    SELECT {dsum_duck("l_extendedprice * l_discount", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan + filter + single-row aggregate; every "
    "predicate pushes to parquet, zero shuffle beyond the final "
    "1-row combine.",
)
def q_analytic_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum("l_extendedprice * l_discount").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# =====================================================================
# TPC-H Q7 — volume between two nations by year
# =====================================================================

@_register(
    "analytic_nation_traffic",
    f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           {dsum_duck("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ns.n_name, nc.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    """,
    doc="TPC-H Q7: six-table join with a symmetric nation-pair "
    "disjunction; nation dims broadcast, fact joins shuffle on "
    "orderkey/suppkey/custkey.",
)
def q_analytic_nation_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    ns = t["nation"].select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = t["nation"].select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum("l_extendedprice * (1 - l_discount)").alias("revenue"))
    )


# =====================================================================
# TPC-H Q13 — customer order-count distribution
# =====================================================================

@_register(
    "analytic_order_count_dist",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13: left outer join with an ON-clause filter (kept on "
    "the join, NOT a where — null-extended rows must survive), then a "
    "double aggregation. o_comment predicate swapped for "
    "o_orderpriority (column absent).",
)
def q_analytic_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# =====================================================================
# TPC-H Q14 — promotion revenue share
# =====================================================================

@_register(
    "analytic_promo_share",
    """
    SELECT CAST(ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE)
           , 6) AS DOUBLE) AS promo_share,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14: conditional aggregation ratio over a fact-dim join "
    "(part broadcastable); both sums decimal-exact before the single "
    "double division.",
)
def q_analytic_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(
                "cast(round(100.0 * cast(sum(case when p_type = 'PROMO'"
                " then cast(l_extendedprice * (1 - l_discount) as decimal(18,4))"
                " else cast(0 as decimal(18,4)) end) as double)"
                " / cast(sum(cast(l_extendedprice * (1 - l_discount)"
                " as decimal(18,4))) as double), 6) as double)"
            ).alias("promo_share"),
            F.count("*").alias("n_items"),
        )
    )


# =====================================================================
# TPC-H Q17 — small-quantity-order revenue
# =====================================================================

@_register(
    "analytic_small_qty_revenue",
    f"""
    WITH pavg AS (
      SELECT l_partkey,
             {davg_duck("l_quantity", "avg_qty")}
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                           AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pavg ON l.l_partkey = pavg.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < 0.5 * pavg.avg_qty
    """,
    doc="TPC-H Q17: correlated per-part average expressed as an "
    "aggregate-then-rejoin (the shape Catalyst rewrites the correlated "
    "subquery into); brand filter broadcast from part. p_container "
    "predicate dropped (column absent).",
)
def q_analytic_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    pavg = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pa_partkey"))
        .agg(davg("l_quantity").alias("avg_qty"))
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_brand") == "Brand#23")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(pavg, F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.expr(
                "cast(round(cast(sum(cast(l_extendedprice as decimal(18,4)))"
                " as double) / 7.0, 2) as double)"
            ).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


# =====================================================================
# TPC-H Q18 — large-volume orders
# =====================================================================

@_register(
    "analytic_big_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 180
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, {dsum_duck("l.l_quantity", "sum_qty")}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    """,
    doc="TPC-H Q18: HAVING-filtered semi-join (IN subquery → left-semi) "
    "feeding a wide group-by; the big-orders set is tiny, so AQE "
    "broadcasts the semi side at runtime.",
)
def q_analytic_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.expr("sum(cast(l_quantity as decimal(18,4)))").alias("q"))
        .filter(F.col("q") > 180)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "leftsemi")
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )


# =====================================================================
# TPC-H Q19 — bracketed discount revenue (disjunctive pushdown)
# =====================================================================

_Q19_BRACKETS_SQL = """(
      (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
    )"""


@_register(
    "analytic_bracket_revenue",
    f"""
    SELECT {dsum_duck("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {_Q19_BRACKETS_SQL}
    """,
    doc="TPC-H Q19: three disjunctive brand/size/quantity brackets over "
    "a broadcast part join; Catalyst extracts the common l_quantity "
    "bounds for scan pushdown. p_container/l_shipmode legs dropped "
    "(columns absent).",
)
def q_analytic_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")

    def bracket(brand: str, size_hi: int, qlo: int, qhi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(qlo, qhi)
        )

    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            bracket("Brand#12", 5, 1, 11)
            | bracket("Brand#23", 10, 10, 20)
            | bracket("Brand#34", 15, 20, 30)
        )
        .agg(
            dsum("l_extendedprice * (1 - l_discount)").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# =====================================================================
# TPC-H Q21 — suppliers who shipped last on multi-supplier orders
# =====================================================================

@_register(
    "analytic_last_shippers",
    """
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM l1 l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM l1 l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    doc="TPC-H Q21: correlated EXISTS (other supplier on the order) + "
    "NOT EXISTS (none shipped later) → left-semi + left-anti joins on "
    "orderkey with non-equi side conditions. commitdate/receiptdate "
    "lateness swapped for last-shipdate blame (columns absent).",
)
def q_analytic_last_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    l1 = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "leftsemi",
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    l2 = l1.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey"))
            & (F.col("l3_shipdate") > F.col("l_shipdate")),
            "leftanti",
        )
    )
    return (
        waiting.join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.col("s_name"))
        .limit(10)
    )


# =====================================================================
# TPC-H Q22 — idle customers with above-average balances
# =====================================================================

@_register(
    "analytic_idle_customers",
    f"""
    WITH thresh AS (
      SELECT {davg_duck("c_acctbal", "avg_bal")}
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {dsum_duck("c.c_acctbal", "totacctbal")}
    FROM customer c CROSS JOIN thresh
    WHERE c.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22: scalar-subquery threshold (1-row broadcast) + "
    "anti-join against recent orders, grouped by nation. c_phone "
    "country codes swapped for c_nationkey (column absent); 'no "
    "orders ever' would be empty on this dense corpus, so idleness "
    "is 'no order since 2000'.",
)
def q_analytic_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    thresh = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].filter(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "leftanti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# =====================================================================
# Lexical retrieval: BM25 search + TF-IDF characteristic terms
# =====================================================================

_BM25_QUERY = ["data", "model", "training", "quality"]


@_register(
    "text_bm25_search",
    retrieval.bm25_oracle_sql(_BM25_QUERY, k=20),
    doc="BM25 top-20 keyword search over the documents corpus via a "
    "distributed inverted index (operators/retrieval.py): two "
    "index aggregates, posting list filtered to the query terms "
    "before any join, df/stats broadcast, window top-k.",
)
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return retrieval.bm25_search(docs, _BM25_QUERY, k=20)


@_register(
    "text_tfidf_terms",
    retrieval.tfidf_oracle_sql(top_per_doc=3, min_len=3) + """
    AND doc_id < 50
    """,
    doc="Per-document top-3 characteristic terms by smoothed TF-IDF "
    "(operators/retrieval.py): inverted-index aggregates + corpus-wide "
    "df join + per-doc window; result sliced to 50 docs to keep the "
    "gate result small (the plan is corpus-wide).",
)
def q_text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return retrieval.tfidf_top_terms(docs, top_per_doc=3, min_len=3).filter(
        F.col("doc_id") < 50
    )


from spark_extensions_spark import queries18  # noqa: E402,F401  (registration side effect)
