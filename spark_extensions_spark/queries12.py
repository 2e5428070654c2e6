"""t2 query registry, batch 15: DataFrame.transpose and the
variant_explode table function (both Spark 4.0).

Registered into the shared registry (imported from queries11 at module
end). Same determinism rules as the queries.py docstring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t


@_register(
    "transpose_wide",
    """
    WITH a AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n_lines,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_qty
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'n_lines' AS key,
           max(CASE WHEN l_returnflag = 'A' THEN n_lines END) AS A,
           max(CASE WHEN l_returnflag = 'N' THEN n_lines END) AS N,
           max(CASE WHEN l_returnflag = 'R' THEN n_lines END) AS R
    FROM a
    UNION ALL
    SELECT 'sum_qty',
           max(CASE WHEN l_returnflag = 'A' THEN sum_qty END),
           max(CASE WHEN l_returnflag = 'N' THEN sum_qty END),
           max(CASE WHEN l_returnflag = 'R' THEN sum_qty END)
    FROM a
    """,
    doc="DataFrame.transpose (Spark 4.0): rows become columns keyed by "
    "the first column's values (returnflag A/N/R), metric names become "
    "the key column. Values unify to DOUBLE. Oracle: conditional-max "
    "pivot per metric.",
)
def q_transpose_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n_lines"),
        F.expr("cast(round(sum(cast(l_quantity as decimal(18,4))), 2) as double)")
        .alias("sum_qty"),
    )
    return agg.transpose()


@_register(
    "variant_explode_battery",
    """
    SELECT event_id, 0 AS pos, 'k' AS vkey,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS vval
    FROM events
    """,
    doc="variant_explode table function (Spark 4.0) over parse_json'd "
    "objects via LATERAL join: one row per variant field with "
    "(pos, key, value), the value cast back to BIGINT. Oracle: the "
    "single-field object flattens to a constant shape per event.",
)
def q_variant_explode_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("__variant_events")
    return spark.sql(
        """
        SELECT e.event_id, v.pos, v.key AS vkey,
               CAST(v.value AS BIGINT) AS vval
        FROM __variant_events e,
        LATERAL variant_explode(parse_json(e.props)) v
        """
    )


@_register(
    "join_null_safe",
    """
    WITH l AS (SELECT l_orderkey, l_linenumber,
                      CASE WHEN l_linenumber % 7 = 0 THEN NULL
                           ELSE l_suppkey % 50 END AS k
               FROM lineitem),
         r AS (SELECT DISTINCT CASE WHEN s_suppkey % 11 = 0 THEN NULL
                                    ELSE s_suppkey % 50 END AS k
               FROM supplier)
    SELECT l.l_orderkey, l.l_linenumber, l.k AS lk,
           CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY l.l_orderkey, l.l_linenumber, l.k
    """,
    doc="Null-safe equality join (<=> / eqNullSafe): NULL keys MATCH "
    "each other, unlike plain equi-join where they never do — the "
    "semantic needed when joining on nullable surrogate keys. Oracle: "
    "IS NOT DISTINCT FROM. The grouped count also pins that NULL "
    "groups aggregate as one key.",
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier")
    li, s = t["lineitem"], t["supplier"]
    l = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_linenumber") % 7 == 0, F.lit(None))
        .otherwise(F.col("l_suppkey") % 50)
        .alias("lk"),
    )
    r = s.select(
        F.when(F.col("s_suppkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("s_suppkey") % 50)
        .alias("rk")
    ).distinct()
    joined = l.join(r, l["lk"].eqNullSafe(r["rk"]))
    return joined.groupBy("l_orderkey", "l_linenumber", "lk").agg(
        F.count("*").cast("bigint").alias("n_matches")
    )


@_register(
    "python_ds_scan",
    """
    SELECT CAST(i AS BIGINT) AS doc_id,
           'doc-' || i AS title,
           md5(CAST(i AS VARCHAR)) AS body,
           CAST(i % 997 AS DOUBLE) / 997.0 AS score
    FROM range(300, 4000) t(i)
    """,
    doc="Custom Python DataSource scan (sources/python_ds.py, Spark 4 "
    "DataSource API): a partitioned deterministic synthetic-corpus "
    "connector with pushFilters — the >= / < predicates prune row "
    "GENERATION inside the source (Python analogue of row-group "
    "pruning), so the filter never materializes pruned rows. The "
    "oracle regenerates the identical content from range().",
)
def q_python_ds_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.sources.python_ds import register_python_sources

    register_python_sources(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 5000)
        .option("parts", 8)
        .load()
    )
    return df.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 4000))


@_register(
    "crypto_roundtrip",
    """
    SELECT doc_id, lang AS lang_rt, md5(text) AS text_md5
    FROM documents
    """,
    doc="aes_encrypt/aes_decrypt roundtrip (GCM with per-row random IV, "
    "so ciphertext is nondeterministic but decrypt(encrypt(x)) == x "
    "exactly) — identity oracle on the decrypted values, same pattern "
    "as the Confluent codec queries.",
)
def q_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    enc = F.aes_encrypt(F.col("lang").cast("binary"), key.cast("binary"))
    dec = F.aes_decrypt(enc, key.cast("binary")).cast("string")
    enc_t = F.aes_encrypt(F.col("text").cast("binary"), key.cast("binary"))
    dec_t = F.aes_decrypt(enc_t, key.cast("binary"))
    return docs.select(
        "doc_id",
        dec.alias("lang_rt"),
        F.md5(dec_t).alias("text_md5"),
    )


@_register(
    "agg_bitmap_rollup",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_global
    FROM lineitem
    """,
    doc="bitmap_or_agg: per-(flag, bucket) bitmaps OR-merged across "
    "flags to the global level, then popcounted — the rollup pattern "
    "for exact distinct over pre-aggregated bitmap sketches (no "
    "re-scan of the fact table to widen the grouping). Oracle: global "
    "COUNT(DISTINCT).",
)
def q_agg_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    per_flag = (
        li.groupBy(
            "l_returnflag",
            F.bitmap_bucket_number(F.col("l_partkey")).alias("__bkt"),
        )
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_partkey"))).alias(
                "__bm"
            )
        )
    )
    merged = per_flag.groupBy("__bkt").agg(
        F.expr("bitmap_or_agg(__bm)").alias("__bm")
    )
    return merged.agg(
        F.sum(F.bitmap_count(F.col("__bm"))).cast("bigint").alias("n_parts_global")
    )


@_register(
    "pandas_udaf_sum",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS ln_sum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Grouped-aggregate pandas UDF (GROUPED_AGG): an Arrow-batched "
    "Python UDAF usable in groupBy().agg — integer summation, so the "
    "numpy accumulation is exact and hash-matches the SQL oracle. "
    "Completes the pandas-UDF matrix: scalar (codec queries), grouped "
    "map (grouped_apply_summary), map iterator (multimodal), grouped "
    "agg (this).",
)
def q_pandas_udaf_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def int_sum(v: pd.Series) -> np.int64:
        return np.int64(v.astype("int64").sum())

    @pandas_udf("bigint")
    def row_count(v: pd.Series) -> np.int64:
        return np.int64(len(v))

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        int_sum(F.col("l_linenumber")).alias("ln_sum"),
        row_count(F.col("l_linenumber")).alias("n"),
    )


@_register(
    "quality_rules",
    """
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem)
    SELECT 'qty_positive' AS rule,
           CAST(count_if(NOT (l_quantity > 0)) AS BIGINT) AS n_violations,
           n.n_rows,
           CAST(count_if(NOT (l_quantity > 0)) AS DOUBLE) / n.n_rows
             AS violation_rate
    FROM lineitem, n GROUP BY n.n_rows
    UNION ALL
    SELECT 'discount_range',
           CAST(count_if(l_discount < 0 OR l_discount > 0.6) AS BIGINT),
           n.n_rows,
           CAST(count_if(l_discount < 0 OR l_discount > 0.6) AS DOUBLE) / n.n_rows
    FROM lineitem, n GROUP BY n.n_rows
    UNION ALL
    SELECT 'shipdate_not_null',
           CAST(count_if(l_shipdate IS NULL) AS BIGINT),
           n.n_rows,
           CAST(count_if(l_shipdate IS NULL) AS DOUBLE) / n.n_rows
    FROM lineitem, n GROUP BY n.n_rows
    UNION ALL
    SELECT 'referential',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           n.n_rows,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS DOUBLE)
             / n.n_rows
    FROM lineitem, n GROUP BY n.n_rows
    """,
    doc="Declarative data-quality validation (operators/quality.py): N "
    "rules + the referential-integrity check compile to ONE aggregate "
    "pass over lineitem (broadcast left join against orders keys, then "
    "conditional counts unpivoted with stack — one scan, not N). The "
    "publish-gate a production ingestion pipeline runs per partition.",
)
def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.quality import (
        check_rules,
        referential_rule,
    )

    t = _t(spark, sf_dir, "lineitem", "orders")
    li, o = t["lineitem"], t["orders"]
    joined, ref_violated = referential_rule(li, "l_orderkey", o, "o_orderkey")
    return check_rules(
        joined,
        [
            ("qty_positive", ~(F.col("l_quantity") > 0)),
            (
                "discount_range",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.6),
            ),
            ("shipdate_not_null", F.col("l_shipdate").isNull()),
            ("referential", ref_violated),
        ],
    )


@_register(
    "text_chunk_windows",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         c AS (SELECT doc_id, ws, len(ws) AS n,
                      CASE WHEN len(ws) <= 64 THEN 1
                           ELSE CAST(floor((len(ws) - 64 + 47) / 48) AS INT) + 1
                      END AS n_chunks
               FROM w)
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           array_to_string(ws[i*48 + 1 : i*48 + 64], ' ') AS chunk_text,
           CAST(least(n - i*48, 64) AS INT) AS n_tokens
    FROM c, LATERAL unnest(range(0, n_chunks)) t(i)
    """,
    doc="Context-window chunking (functions/text.py:chunk_windows): "
    "64-token windows with stride 48 (16-token overlap), the step that "
    "turns a cleaned corpus into training sequences. Row-local "
    "split+sequence+explode — zero shuffle, chunk identity is "
    "deterministic under any partitioning. Oracle recomputes windows "
    "with list slices.",
)
def q_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.text import chunk_windows

    docs = _t(spark, sf_dir, "documents")["documents"]
    return chunk_windows(docs, "doc_id", "text", window_tokens=64, stride=48)


@_register(
    "text_pack_sequences",
    """
    WITH RECURSIVE w AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ), c AS (
      SELECT doc_id, source, len(ws) AS n,
             CASE WHEN len(ws) <= 64 THEN 1
                  ELSE CAST(floor((len(ws) - 64 + 47) / 48) AS INT) + 1
             END AS n_chunks
      FROM w
    ), chunks AS (
      SELECT doc_id, source,
             CAST(i AS INT) AS chunk_id,
             CAST(least(n - i*48, 64) AS INT) AS n_tokens
      FROM c, LATERAL unnest(range(0, n_chunks)) t(i)
    ), ordered AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY doc_id, chunk_id) AS rn
      FROM chunks
    ), rec AS (
      SELECT source, rn, doc_id, chunk_id, n_tokens,
             0 AS bin_id, n_tokens AS cur
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.source, o.rn, o.doc_id, o.chunk_id, o.n_tokens,
             CASE WHEN r.cur + o.n_tokens > 512 THEN r.bin_id + 1
                  ELSE r.bin_id END,
             CASE WHEN r.cur + o.n_tokens > 512 THEN o.n_tokens
                  ELSE r.cur + o.n_tokens END
      FROM rec r JOIN ordered o ON o.source = r.source AND o.rn = r.rn + 1
    )
    SELECT source, doc_id, chunk_id, n_tokens, CAST(bin_id AS INT) AS bin_id
    FROM rec
    """,
    doc="Sequence packing (functions/text.py:pack_chunks): 64/48-token "
    "chunks greedily packed into 512-token training bins per source, "
    "in (doc_id, chunk_id) order — deterministic under any "
    "partitioning, parallel across groups, sequential only within a "
    "group (one counter of state). Oracle: DuckDB recursive CTE "
    "replays the same greedy fill.",
)
def q_text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.text import chunk_windows, pack_chunks

    docs = _t(spark, sf_dir, "documents")["documents"]
    chunks = chunk_windows(docs, "doc_id", "text", window_tokens=64, stride=48)
    chunks = chunks.join(
        F.broadcast(docs.select("doc_id", "source")), "doc_id"
    ).select("doc_id", "source", "chunk_id", "n_tokens")
    packed = pack_chunks(
        chunks, "source", ["doc_id", "chunk_id"], "n_tokens", budget=512
    )
    return packed.select("source", "doc_id", "chunk_id", "n_tokens", "bin_id")


@_register(
    "agg_approx_top_k",
    """
    WITH c AS (SELECT l_linenumber, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM lineitem GROUP BY l_linenumber
               ORDER BY cnt DESC, l_linenumber LIMIT 3)
    SELECT array_to_string(list(l_linenumber || ':' || cnt ORDER BY cnt DESC),
                           ',') AS top3
    FROM c
    """,
    doc="approx_top_k (Spark 4.1): frequent-items sketch. With "
    "maxItemsTracked (default 10000) >= distinct values it is exact, "
    "and linenumber counts are strictly decreasing so the order is "
    "deterministic — serialized item:count list hash-matches the "
    "GROUP BY top-3 oracle. Low-memory behavior is the sketch's "
    "documented approximation regime at true high cardinality.",
)
def q_agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    topk = li.agg(F.expr("approx_top_k(l_linenumber, 3)").alias("tk"))
    return topk.select(
        F.concat_ws(
            ",",
            F.transform(
                F.col("tk"),
                lambda s: F.concat(
                    s["item"].cast("string"), F.lit(":"), s["count"].cast("string")
                ),
            ),
        ).alias("top3")
    )


@_register(
    "variant_helpers",
    """
    SELECT event_id,
           false AS props_is_null,
           true AS null_is_null,
           'OBJECT<k: BIGINT>' AS props_ddl,
           '{"k":' || json_extract_string(props, '$.k') || '}' AS vo_json
    FROM events
    """,
    doc="Remaining VARIANT helpers (Spark 4.0): is_variant_null "
    "(JSON-null vs missing distinction), schema_of_variant (per-row "
    "variant schema DDL), and to_variant_object(struct) round-tripped "
    "through to_json. The props objects share one shape, so the DDL "
    "and canonical JSON are reconstructible in the oracle.",
)
def q_variant_helpers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    v = F.parse_json(F.col("props"))
    vo = F.to_variant_object(
        F.struct(F.variant_get(v, "$.k", "bigint").alias("k"))
    )
    return ev.select(
        "event_id",
        F.is_variant_null(v).alias("props_is_null"),
        F.is_variant_null(F.parse_json(F.lit("null"))).alias("null_is_null"),
        F.schema_of_variant(v).alias("props_ddl"),
        F.to_json(vo).alias("vo_json"),
    )


from spark_extensions_spark import queries13  # noqa: E402,F401  (registration side effect)
