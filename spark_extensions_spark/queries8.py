"""t2 query registry, batch 11: deep multi-join analytics + multimodal.

Registered into the shared registry (imported from queries7 at module
end). Same determinism rules as the queries.py docstring.

The two analytic queries are TPC-H-shaped 5–6 way join pipelines
(Q5/Q8 analogues over the fixture star schema) — the workload class
where join ordering, broadcast selection, and AQE matter most. Plan
expectations: every dimension (region/nation/customer/supplier) joins
as a BroadcastHashJoin; only the orders⋈lineitem edge shuffles. At
100 TB that plan shape is the difference between 2 shuffled TBs and
200: fact tables shuffle at most once, dims never.

The multimodal query registers the binary-media decode stage as a
first-class oracle-checked operator: the deterministic fake codec
derives image stats from sha256(content), which DuckDB can recompute
exactly (including the float32 mean-pixel math — verified for all 256
byte values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.functions.fixedpoint import fp_col
from spark_extensions_spark.queries import _register, _t, dsum, dsum_duck


@_register(
    "analytic_regional_supply",
    f"""
    SELECT n.n_name,
           {dsum_duck("l.l_extendedprice * (1 - l.l_discount)", 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
                 AND s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 analogue: 6-way join (lineitem-orders-customer-"
    "supplier-nation-region) with the local-supplier condition "
    "(customer and supplier share a nation), region filter, date "
    "filter. Observed plan: 5 BroadcastHashJoins + exactly one "
    "shuffle (the final groupBy) — at fixture scale AQE broadcasts "
    "even orders; at production scale that one edge becomes the "
    "single sort-merge shuffle on l_orderkey while dims stay "
    "broadcast. Region/date filters push into the scans.",
)
def q_analytic_regional_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    li, o, c, s, n, r = (
        t["lineitem"], t["orders"], t["customer"], t["supplier"], t["nation"],
        t["region"],
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(
            n,
            (c["c_nationkey"] == n["n_nationkey"])
            & (s["s_nationkey"] == n["n_nationkey"]),
        )
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .filter(
            F.col("r_name").isin("ASIA", "EUROPE")
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        )
    )
    return joined.groupBy("n_name").agg(
        dsum("l_extendedprice * (1 - l_discount)").alias("revenue"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


@_register(
    "analytic_market_share",
    f"""
    WITH sales AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
             n.n_name AS supp_nation,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type LIKE 'PROMO%'
    )
    SELECT yr, supp_nation,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS nation_rev,
           floor((CAST(SUM(rev) AS DOUBLE)
                 / CAST(SUM(SUM(rev)) OVER (PARTITION BY yr) AS DOUBLE))
                 * 1e6 + 5e-1) / 1e6
             AS mkt_share
    FROM sales GROUP BY yr, supp_nation
    """,
    doc="TPC-H Q8 analogue: market share of each supplier nation within "
    "each order year over PROMO parts — 5-way join, then a windowed "
    "share-of-total over the aggregate (SUM(SUM()) OVER). Decimal sums "
    "keep both the per-nation revenue and the denominator order-free; "
    "the share divides the two decimal totals in double, identical "
    "formula both engines.",
)
def q_analytic_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part")
    li, o, s, n, p = t["lineitem"], t["orders"], t["supplier"], t["nation"], t["part"]
    sales = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .filter(F.col("p_type").startswith("PROMO"))
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("n_name").alias("supp_nation"),
            F.expr(
                "cast(l_extendedprice * (1 - l_discount) as decimal(18,4))"
            ).alias("rev"),
        )
    )
    agg = sales.groupBy("yr", "supp_nation").agg(F.sum("rev").alias("srev"))
    total = F.sum("srev").over(Window.partitionBy("yr"))
    return agg.select(
        "yr",
        "supp_nation",
        # round on DECIMAL is exact on both engines (decimal rescale);
        # the share is a computed double -> portable fixed-point floor
        F.round(F.col("srev"), 2).cast("double").alias("nation_rev"),
        fp_col(
            F.col("srev").cast("double") / total.cast("double"), 6
        ).alias("mkt_share"),
    )


@_register(
    "multimodal_decode",
    """
    WITH m AS (SELECT doc_id, text::BLOB AS content,
                      sha256(text) AS h
               FROM documents)
    SELECT doc_id,
           CAST(octet_length(content) AS BIGINT) AS size_bytes,
           CAST(16 + CAST(('0x' || substr(h, 1, 2)) AS INT) % 64 AS INT) AS width,
           CAST(16 + CAST(('0x' || substr(h, 3, 2)) AS INT) % 64 AS INT) AS height,
           3 AS n_channels,
           array_to_string(list_transform(
             [CAST(CAST(CAST(('0x' || substr(h, 1, 2)) AS INT) AS REAL)
                   / CAST(255.0 AS REAL) AS REAL),
              CAST(CAST(CAST(('0x' || substr(h, 3, 2)) AS INT) AS REAL)
                   / CAST(255.0 AS REAL) AS REAL),
              CAST(CAST(CAST(('0x' || substr(h, 5, 2)) AS INT) AS REAL)
                   / CAST(255.0 AS REAL) AS REAL)],
             x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e9 + 0.5)
                       AS BIGINT)), ',') AS mean_pixel_e9
    FROM m
    """,
    doc="Multimodal decode stage as a first-class operator: binary "
    "content column + typed metadata struct -> Arrow-batched "
    "mapInPandas decode (multimodal/media.py, deterministic fake "
    "codec; real codec slots in behind the same signature). The fake "
    "derives stats from sha256(content), so DuckDB recomputes the "
    "exact output including the float32 mean-pixel division "
    "(f32 parity verified for all 256 byte values).",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.multimodal.media import (
        attach_media_metadata,
        decode_image,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    media = attach_media_metadata(media, "content", mime="image/fake")
    decoded = decode_image(media, "content", deterministic_fake=True)
    # The graded surface fixed-point-serializes the float32 channel
    # means (exact f32->f64 widening, pure-arithmetic *1e9 floor): the
    # driver canonicalizer cannot hash array cells, and a string of
    # exact integers sidesteps float rendering differences too.  The
    # operator API keeps the array<float> column.
    return decoded.select(
        "doc_id",
        F.col("media_meta.size_bytes").alias("size_bytes"),
        "width",
        "height",
        "n_channels",
        F.expr(
            "array_join(transform(mean_pixel, x -> cast(floor("
            "cast(x as double) * 1000000000.0d + 0.5d) as bigint)), ',')"
        ).alias("mean_pixel_e9"),
    )


@_register(
    "confluent_json_roundtrip",
    """
    SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT)
             AS k
    FROM events
    """,
    doc="Confluent JSON encode->decode roundtrip: to_confluent_json "
    "registers the subject JSON-Schema (draft-04, via the "
    "schema/json_schema.py converter) at plan time, from_confluent_json "
    "resolves it back to a StructType and decodes with the built-in "
    "from_json — the whole data path is JVM-side (SURVEY §2.A rows 3-4). "
    "Identity oracle on real data.",
)
def q_confluent_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.confluent import (
        InMemorySchemaRegistry,
        from_confluent_json,
        to_confluent_json,
    )

    ev = _t(spark, sf_dir, "events")["events"]
    client = InMemorySchemaRegistry()
    payload = ev.select(
        F.struct(
            "event_id",
            "event_type",
            F.expr("cast(get_json_object(props, '$.k') as bigint)").alias("k"),
        ).alias("rec")
    )
    framed = payload.select(
        to_confluent_json(
            payload, "rec", "events", "value", client, update_allowed=True
        ).alias("msg")
    )
    return framed.select(
        from_confluent_json("msg", "events", "value", client).alias("d")
    ).select(
        F.col("d.event_id").alias("event_id"),
        F.col("d.event_type").alias("event_type"),
        F.col("d.k").alias("k"),
    )


from spark_extensions_spark import queries9  # noqa: E402,F401  (registration side effect)


@_register(
    "dedup_ngram_prefix",
    __import__("spark_extensions_spark.queries", fromlist=["_jaccard_oracle"])._jaccard_oracle(),
    doc="Prefix-filtered exact n-gram Jaccard (AllPairs/PPJoin-style, "
    "operators/dedup.py:ngram_jaccard_pairs_prefix): each doc indexes "
    "only its globally-rarest ceil((1-t)|A|)+1 shingles, the "
    "prefix-prefix join generates candidates, full sorted sets verify "
    "exactly. Same oracle as dedup_ngram_jaccard — the two strategies "
    "are equivalence-tested; this one is the 100 TB path (candidate "
    "cost collapses from sum df^2 to the rare-shingle tail).",
)
def q_dedup_ngram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.dedup import ngram_jaccard_pairs_prefix

    docs = _t(spark, sf_dir, "documents")["documents"]
    return ngram_jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.5)
