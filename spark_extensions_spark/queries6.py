"""t2 query registry, batch 9: modern-Spark surface + pipeline ops.

Registered into the shared registry (imported from queries5 at module
end). Same determinism rules as the queries.py docstring.

Covers Spark 3.5/4.x surface the earlier batches left out — bitmap
exact-distinct aggregation, listagg, the regexp_* battery, VARIANT
(parse_json/variant_get), Python UDTFs (lateral table function),
parse_url — plus three more LLM-pipeline operators: within-document
repetition scoring, keep-best-per-duplicate-group resolution, and
deterministic per-source corpus re-weighting.

Scale notes are per-query in the docstrings; the common thread is that
every aggregation is two-phase (partial map-side state), every join
against a per-group summary broadcasts, and every sampling decision is
a row-local hash — nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.functions.fixedpoint import fp_col
from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.operators.sampling import hash_bucket, hash_bucket_duck


@_register(
    "agg_bitmap_distinct",
    """
    SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact distinct-count via bitmap aggregation "
    "(bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg "
    "/ bitmap_count, Spark 3.5+): phase 1 ORs fixed-size 4KB bitmaps "
    "per (group, bucket), phase 2 sums popcounts. At 100 TB this is "
    "the scalable exact alternative to count(distinct) over "
    "high-cardinality keys: state per group is bounded by "
    "n_buckets x 4KB instead of one hash set entry per distinct value, "
    "and both phases are ordinary partial-final hash aggregates. "
    "Oracle: plain COUNT(DISTINCT).",
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy(
            "l_returnflag",
            F.bitmap_bucket_number(F.col("l_partkey")).alias("__bkt"),
        )
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_partkey"))).alias(
                "__bm"
            )
        )
        .groupBy("l_returnflag")
        .agg(F.sum(F.bitmap_count(F.col("__bm"))).cast("bigint").alias("n_parts"))
    )


@_register(
    "agg_listagg",
    """
    SELECT o_custkey,
           string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS keys_csv,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS prios
    FROM orders GROUP BY o_custkey
    """,
    doc="listagg (Spark 4.0) WITHIN GROUP (ORDER BY ...) — ordered "
    "string aggregation, incl. DISTINCT form. Oracle: DuckDB "
    "string_agg with ORDER BY.",
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.expr(
                "listagg(cast(o_orderkey as string), ',') "
                "within group (order by o_orderkey)"
            ).alias("keys_csv"),
            F.expr(
                "listagg(distinct o_orderpriority, '|') "
                "within group (order by o_orderpriority)"
            ).alias("prios"),
        )
    )


@_register(
    "string_regexp_battery",
    """
    SELECT p_partkey,
           CAST(len(regexp_extract_all(p_name, 'o[a-z]')) AS INT) AS n_ox,
           CAST(CASE WHEN regexp_extract(p_name, 'o[a-z]') = '' THEN 0
                     ELSE strpos(p_name, regexp_extract(p_name, 'o[a-z]'))
                END AS INT) AS first_ox_pos,
           nullif(regexp_extract(p_name, 'o[a-z]+'), '') AS first_ox_run,
           regexp_matches(p_name, '[aeiou]{2}') AS has_vv,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    """,
    doc="Regexp battery: regexp_count, regexp_instr, regexp_substr, "
    "rlike, global regexp_replace. The regexp_instr oracle exploits "
    "that the leftmost regex match's text first occurs at the match "
    "position (no anchors/context in the pattern). Spark regexp_substr "
    "returns NULL on no-match where DuckDB regexp_extract returns '' — "
    "oracle wraps in nullif.",
)
def q_string_regexp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.regexp_count(F.col("p_name"), F.lit("o[a-z]")).cast("int").alias("n_ox"),
        F.regexp_instr(F.col("p_name"), F.lit("o[a-z]")).cast("int").alias(
            "first_ox_pos"
        ),
        F.regexp_substr(F.col("p_name"), F.lit("o[a-z]+")).alias("first_ox_run"),
        F.col("p_name").rlike("[aeiou]{2}").alias("has_vv"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
    )


@_register(
    "json_variant",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
           CAST(NULL AS BIGINT) AS missing,
           replace(props, '": ', '":') AS canon_json
    FROM events
    """,
    doc="VARIANT path (Spark 4.0): parse_json -> variant_get typed "
    "extraction, try_variant_get on a missing path -> NULL, and "
    "to_json(parse_json(x)) canonicalization. Oracle: DuckDB JSON "
    "extraction; the canonical form differs only in ': ' spacing, "
    "normalized by replace() on the oracle side.",
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_long"),
        F.try_variant_get(v, "$.nope", "bigint").alias("missing"),
        F.to_json(v).alias("canon_json"),
    )


@_register(
    "udtf_word_pos",
    """
    SELECT doc_id, CAST(u.p AS INT) AS pos, u.w AS word
    FROM (SELECT doc_id,
                 unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
                                       i -> {'p': i, 'w': string_split(text, ' ')[i]}))
                   AS u
          FROM documents WHERE doc_id % 7 = 0)
    """,
    doc="Python UDTF (Spark 3.5+/4.x) as a LATERAL table function: one "
    "(pos, word) row per token. The UDTF is the genuine UDTF surface "
    "(class with eval-yield, registered via spark.udtf.register) — the "
    "Python path is acceptable here because tokenize-explode is "
    "inherently a per-row generator; the oracle is a DuckDB "
    "unnest-of-structs.",
)
def q_udtf_word_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" "), start=1):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    docs = _t(spark, sf_dir, "documents")["documents"]
    docs.filter(F.col("doc_id") % 7 == 0).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.word "
        "FROM __udtf_docs d, LATERAL split_words(d.text) s"
    )


@_register(
    "text_url_domains",
    """
    WITH u AS (SELECT doc_id, source,
                      'https://' || source || '.org/doc/' || doc_id AS url
               FROM documents)
    SELECT source || '.org' AS host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           min('/doc/' || doc_id) AS first_path
    FROM u GROUP BY source
    """,
    doc="parse_url HOST/PATH extraction -> per-domain doc counts — the "
    "URL-analysis step of a crawl-cleaning pipeline (constructed URLs: "
    "the fixture corpus has no native ones). Oracle rebuilds "
    "host/path from the same components.",
)
def q_text_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    u = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".org/doc/"), F.col("doc_id")
        ).alias("url")
    )
    parsed = u.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
    )
    return parsed.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("path").alias("first_path"),
    )


@_register(
    "text_repetition",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id,
           CAST(len(ws) AS INT) AS n_words,
           CAST(len(list_distinct(ws)) AS INT) AS n_distinct,
           floor((CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws))
                 * 1e6 + 5e-1) / 1e6 AS dup_ratio,
           CAST(len(list_filter(range(1, len(ws)), i -> ws[i] = ws[i+1])) > 0
                AS BOOLEAN) AS has_adjacent_dup
    FROM w
    """,
    doc="Within-document repetition scoring — the boilerplate/spam "
    "signal of a corpus-quality pipeline: duplicate-word ratio and "
    "adjacent-duplicate detection, all row-local higher-order "
    "functions (zero shuffle, whole-stage codegen).",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.session import ensure_parallelism

    # the whole battery is row-local compute fused into the scan stage,
    # and the fixture is one row group = one task (measured 2.6 s on one
    # core at sf0.1); restore width first — no-op on real multi-split
    # inputs
    docs = ensure_parallelism(_t(spark, sf_dir, "documents")["documents"])
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    pairs_dup = F.filter(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.element_at(ws, i) == F.element_at(ws, i + 1),
    )
    return docs.select(
        "doc_id",
        n.cast("int").alias("n_words"),
        nd.cast("int").alias("n_distinct"),
        fp_col((n - nd).cast("double") / n, 6).alias("dup_ratio"),
        (F.size(pairs_dup) > 0).alias("has_adjacent_dup"),
    )


@_register(
    "dedup_keep_best",
    """
    SELECT md5(text) AS content_key,
           CAST(arg_max(doc_id, n_chars * 100000000 - doc_id) AS BIGINT)
             AS survivor_id,
           CAST(MAX(n_chars) AS BIGINT) AS best_chars,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM documents GROUP BY md5(text)
    """,
    doc="Keep-best duplicate resolution: exact-dup groups (md5 content "
    "key) keep the longest doc, ties broken toward the smallest id — "
    "max_by on the scalar key n_chars*1e8 - doc_id (valid while "
    "doc_id < 1e8; one ordering key, identical on both engines). One "
    "shuffle on the content hash; survivors anti-join the corpus "
    "downstream.",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    order_key = F.col("n_chars") * F.lit(100000000) - F.col("doc_id")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("content_key"),
                    "doc_id", "n_chars")
        .groupBy("content_key")
        .agg(
            F.max_by(F.col("doc_id"), order_key).cast("bigint").alias("survivor_id"),
            F.max("n_chars").cast("bigint").alias("best_chars"),
            F.count("*").cast("bigint").alias("group_size"),
        )
    )


_MIX_TARGETS = {"src0": 0.20, "src1": 0.15, "src2": 0.10}
_MIX_DEFAULT = 0.02


def _mix_target_case() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in _MIX_TARGETS.items()
    )
    # CAST: both engines parse bare decimal literals as DECIMAL — the
    # keep-fraction math must be double on both sides.
    return f"CAST(CASE source {whens} ELSE {_MIX_DEFAULT} END AS DOUBLE)"


@_register(
    "sample_weighted_mix",
    f"""
    WITH stats AS (
      SELECT source, COUNT(*) AS c,
             (SELECT COUNT(*) FROM documents) AS total
      FROM documents GROUP BY source
    ), frac AS (
      SELECT source,
             least(CAST(1.0 AS DOUBLE), ({_mix_target_case()}) * total / c)
               AS keep_frac
      FROM stats
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN frac f ON d.source = f.source
    WHERE {hash_bucket_duck('d.doc_id', 'mix')} < CAST(floor(f.keep_frac * 10000) AS BIGINT)
    """,
    doc="Deterministic per-source corpus re-weighting — the "
    "domain-mixing step of a training-data pipeline: each source s is "
    "thinned to target_share(s) of the corpus (capped at its own "
    "size) by a row-local md5-hash threshold. The per-source keep "
    "fraction comes from a broadcast aggregate (20 rows), the filter "
    "itself is hash arithmetic — reproducible under any partitioning, "
    "no sampling state. Oracle recomputes the identical hash/threshold "
    "math row by row.",
)
def q_sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    total = docs.count()
    stats = docs.groupBy("source").agg(F.count("*").alias("c"))
    target = F.expr(_mix_target_case())
    frac = stats.select(
        "source",
        F.least(F.lit(1.0), target * F.lit(total) / F.col("c")).alias("keep_frac"),
    )
    joined = docs.join(F.broadcast(frac), "source")
    return joined.filter(
        hash_bucket("doc_id", "mix")
        < F.floor(F.col("keep_frac") * 10000).cast("bigint")
    ).select("doc_id", "source")


from spark_extensions_spark import queries7  # noqa: E402,F401  (registration side effect)
