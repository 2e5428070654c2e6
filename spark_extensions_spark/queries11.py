"""t2 query registry, batch 14: timezone/date-sequence battery,
comparator array sort, and the end-to-end corpus-curation pipeline.

Registered into the shared registry (imported from queries10 at module
end). Same determinism rules as the queries.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.operators.sampling import hash_bucket, hash_bucket_duck


@_register(
    "date_battery5",
    """
    SELECT o_orderkey,
           array_to_string(list_transform(
             range(0, 4),
             k -> strftime(o_orderdate + to_months(CAST(k AS INT)), '%Y-%m-%d')),
             ',') AS month_seq,
           (o_orderdate AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York')
             AS ts_ny,
           (o_orderdate AT TIME ZONE 'Asia/Tokyo' AT TIME ZONE 'UTC') AS ts_utc,
           (o_orderdate AT TIME ZONE 'UTC' AT TIME ZONE 'Europe/Berlin')
             AS ts_berlin
    FROM orders
    """,
    doc="Date battery 5: sequence() over timestamps with month interval "
    "step (serialized to date strings), from_utc_timestamp / "
    "to_utc_timestamp / convert_timezone against IANA zones incl. DST "
    "transitions — mirrored via DuckDB's AT TIME ZONE chain. Month-step "
    "gotcha: Spark anchors each element at start + k*INTERVAL while "
    "DuckDB's generate_series adds iteratively (Jan 31 -> Feb 28 -> "
    "Mar 28 vs Spark's Mar 31), so the oracle multiplies offsets.",
)
def q_date_battery5(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    seq = F.sequence(
        F.col("o_orderdate"),
        F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH"),
        F.expr("INTERVAL 1 MONTH"),
    )
    return o.select(
        "o_orderkey",
        F.concat_ws(
            ",", F.transform(seq, lambda t: F.date_format(t, "yyyy-MM-dd"))
        ).alias("month_seq"),
        F.from_utc_timestamp(F.col("o_orderdate"), "America/New_York").alias(
            "ts_ny"
        ),
        F.to_utc_timestamp(F.col("o_orderdate"), "Asia/Tokyo").alias("ts_utc"),
        F.convert_timezone(
            F.lit("UTC"), F.lit("Europe/Berlin"), F.col("o_orderdate")
        ).alias("ts_berlin"),
    )


@_register(
    "array_sort_comparator",
    """
    WITH t AS (SELECT p_partkey, string_split(p_type, ' ') AS toks FROM part)
    SELECT p_partkey,
           array_to_string(list_transform(
             list_sort(list_transform(toks, t -> printf('%03d', length(t)) || t)),
             s -> s[4:]), ',') AS by_len_then_alpha,
           array_to_string(list_reverse_sort(toks), ',') AS desc_alpha
    FROM t
    """,
    doc="array_sort with a CUSTOM comparator lambda (length asc, then "
    "alphabetical) plus descending sort via comparator. DuckDB has no "
    "comparator sorts, so the oracle encodes the key (zero-padded "
    "length prefix), sorts, and strips — same total order.",
)
def q_array_sort_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    toks = F.split(F.col("p_type"), " ")
    cmp_len = (
        "(l, r) -> CASE WHEN length(l) < length(r) THEN -1 "
        "WHEN length(l) > length(r) THEN 1 "
        "WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END"
    )
    cmp_desc = "(l, r) -> CASE WHEN l > r THEN -1 WHEN l < r THEN 1 ELSE 0 END"
    return p.select(
        "p_partkey",
        F.concat_ws(
            ",", F.expr(f"array_sort(split(p_type, ' '), {cmp_len})")
        ).alias("by_len_then_alpha"),
        F.concat_ws(
            ",", F.expr(f"array_sort(split(p_type, ' '), {cmp_desc})")
        ).alias("desc_alpha"),
    )


_CURATION_MIX = {"src0": 0.30, "src1": 0.25}
_CURATION_DEFAULT = 0.05


def _curation_case() -> str:
    whens = " ".join(f"WHEN '{s}' THEN {w}" for s, w in _CURATION_MIX.items())
    return f"CAST(CASE source {whens} ELSE {_CURATION_DEFAULT} END AS DOUBLE)"


@_register(
    "pipeline_full_curation",
    f"""
    WITH wordy AS (
      SELECT *, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       / CAST(length(text) AS DOUBLE) END AS alpha_ratio
      FROM documents
    ), quality AS (
      SELECT * FROM wordy WHERE n_words >= 20 AND alpha_ratio > 0.5
    ), dedup AS (
      SELECT md5(text) AS ck,
             arg_max(doc_id, n_chars * 100000000 - doc_id) AS doc_id
      FROM quality GROUP BY md5(text)
    ), survivors AS (
      SELECT q.doc_id, q.source FROM quality q JOIN dedup d ON q.doc_id = d.doc_id
    ), stats AS (
      SELECT source, COUNT(*) AS c,
             (SELECT COUNT(*) FROM survivors) AS total
      FROM survivors GROUP BY source
    ), frac AS (
      SELECT source,
             least(CAST(1.0 AS DOUBLE), ({_curation_case()}) * total / c)
               AS keep_frac
      FROM stats
    )
    SELECT s.doc_id, s.source,
           CASE WHEN {hash_bucket_duck('s.doc_id', 'split')} < 8000 THEN 'train'
                WHEN {hash_bucket_duck('s.doc_id', 'split')} < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM survivors s JOIN frac f ON s.source = f.source
    WHERE {hash_bucket_duck('s.doc_id', 'mix')}
          < CAST(floor(f.keep_frac * 10000) AS BIGINT)
    """,
    doc="The full training-corpus curation pipeline as ONE dataflow: "
    "quality gate (word count + alpha ratio) -> exact dedup keeping the "
    "best doc per content hash -> per-source re-weighting to target mix "
    "-> deterministic train/val/test split. Every stage is the "
    "oracle-checked operator from earlier batches composed end-to-end; "
    "shuffle budget: one hash agg (dedup) + one broadcast join (frac) + "
    "row-local hash filters. Everything else is row-local, so the "
    "pipeline scales as a single pass over the corpus.",
)
def q_pipeline_full_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    words = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    alpha_ratio = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
        / F.length("text").cast("double")
    )
    quality = docs.withColumn("n_words", F.size(words)).withColumn(
        "alpha_ratio", alpha_ratio
    ).filter((F.col("n_words") >= 20) & (F.col("alpha_ratio") > 0.5))

    order_key = F.col("n_chars") * F.lit(100000000) - F.col("doc_id")
    dedup = (
        quality.select(F.md5(F.col("text").cast("binary")).alias("ck"),
                       "doc_id", "n_chars")
        .groupBy("ck")
        .agg(F.max_by("doc_id", order_key).alias("doc_id"))
    )
    # plain id join: the dedup-survivor set is O(distinct documents) —
    # near corpus-sized at scale, so forcing a broadcast would OOM; AQE
    # still broadcasts when it actually fits
    survivors = quality.join(
        dedup.select("doc_id"), "doc_id"
    ).select("doc_id", "source")

    total = survivors.count()
    stats = survivors.groupBy("source").agg(F.count("*").alias("c"))
    frac = stats.select(
        "source",
        F.least(
            F.lit(1.0), F.expr(_curation_case()) * F.lit(total) / F.col("c")
        ).alias("keep_frac"),
    )
    mixed = survivors.join(F.broadcast(frac), "source").filter(
        hash_bucket("doc_id", "mix")
        < F.floor(F.col("keep_frac") * 10000).cast("bigint")
    )
    bucket = hash_bucket("doc_id", "split")
    return mixed.select(
        "doc_id",
        "source",
        F.when(bucket < 8000, "train")
        .when(bucket < 9000, "val")
        .otherwise("test")
        .alias("split"),
    )


from spark_extensions_spark import queries12  # noqa: E402,F401  (registration side effect)
