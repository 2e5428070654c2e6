"""t2 query registry, batch 16: semantic-dedup pipeline compositions.

Registered into the shared registry (imported from queries12 at module
end). Same determinism rules as the queries.py docstring.

These close the loop on the embedding layer: exact blocked all-pairs
scoring -> connected-component closure -> survivor selection, all
hash-checked end-to-end against a recursive-CTE DuckDB oracle; plus
the approximate IVF-blocked variant (rows-only, recall-tested in
pytest) that stands in when exact all-pairs is too expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import EMB_DIM, _cosine_duck, _register, _t


def _emb_pairs_oracle(threshold: float = 0.30) -> str:
    return f"""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {_cosine_duck('a.embedding', 'b.embedding', EMB_DIM)} >= {threshold}
    """


@_register(
    "pipeline_semantic_dedup",
    f"""
    WITH RECURSIVE pairs AS ({_emb_pairs_oracle()}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS vec_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    labeled AS (
      SELECT e.vec_id, e.label,
             COALESCE(c.cluster_id, e.vec_id) AS cluster_id
      FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.vec_id
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           arg_min(label, vec_id) AS survivor_label
    FROM labeled GROUP BY cluster_id
    """,
    doc="End-to-end semantic dedup, fully hash-checked: exact blocked "
    "all-pairs cosine (operators/dedup.py:embedding_neardup_pairs, "
    "distributed block-matrix join) -> large-star/small-star closure "
    "(operators/graph.py) -> one survivor row per cluster "
    "(min-id keep-first, min_by label). Every stage is the 100 TB "
    "shape: no driver state, diameter-independent convergence, one "
    "final groupBy. Oracle: recursive-CTE transitive closure over the "
    "same exact pair set.",
)
def q_pipeline_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.dedup import embedding_neardup_pairs
    from spark_extensions_spark.operators.graph import (
        connected_components_star,
    )

    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    pairs = embedding_neardup_pairs(
        emb, "vec_id", "embedding", dim=EMB_DIM, threshold=0.30
    )
    comp = connected_components_star(pairs, "id_a", "id_b").select(
        F.col("node").alias("vec_id"), F.col("component").alias("cluster_id")
    )
    labeled = emb.select("vec_id", "label").join(comp, "vec_id", "left").select(
        "vec_id",
        "label",
        F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
    )
    return labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min_by("label", "vec_id").alias("survivor_label"),
    )


def _dedup_embedding_ivf_oracle(n_lists: int = 8, threshold: float = 0.30) -> str:
    from spark_extensions_spark.operators.similarity import lsh_quantize_duck

    dist = (
        "CAST(list_sum(list_transform(list_zip(e.qq, c.cq), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
    )
    return f"""
    WITH eq AS (
      SELECT vec_id, embedding,
             {lsh_quantize_duck('embedding')} AS qq
      FROM embeddings
    ), cent AS (
      SELECT list_id, cq FROM (
        SELECT ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS list_id,
               qq AS cq
        FROM eq
      ) WHERE list_id < {n_lists}
    ), assigned AS (
      SELECT vec_id, embedding, list_id FROM (
        SELECT e.vec_id, e.embedding, c.list_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.list_id) AS rn
        FROM eq e CROSS JOIN cent c
      ) WHERE rn = 1
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_cosine_duck('a.embedding', 'b.embedding', EMB_DIM)} AS cosine
      FROM assigned a JOIN assigned b USING (list_id)
      WHERE a.vec_id < b.vec_id
    ) WHERE cosine >= {threshold}
    """


@_register(
    "dedup_embedding_ivf",
    _dedup_embedding_ivf_oracle(),
    doc="Approximate embedding near-dup at the scale where even the "
    "blocked exact all-pairs is too expensive: DETERMINISTIC IVF "
    "coarse quantization (operators/dedup.py:"
    "embedding_neardup_pairs_ivf_det — exact int64 squared-L2 against "
    "an md5-picked fixed-point codebook) buckets vectors into lists; "
    "pairs are scored only within a list (~n²/n_lists work, one list "
    "shuffle). List membership is bit-reproducible on any engine, so "
    "the approximate pair set is fully hash-checked against the SQL "
    "oracle (was rows-only with float argmax assignment). Recall vs "
    "the exact pair set stays bounded in pytest.",
)
def q_dedup_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.dedup import (
        embedding_neardup_pairs_ivf_det,
    )

    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    return embedding_neardup_pairs_ivf_det(
        emb, "vec_id", "embedding", dim=EMB_DIM, threshold=0.30, n_lists=8
    )


@_register(
    "multimodal_framesample",
    """
    WITH m AS (SELECT doc_id, octet_length(text::BLOB) AS len,
                      1000 + CAST(('0x' || substr(sha256(text), 1, 4)) AS INT)
                             % 9000 AS dur
               FROM documents),
    n AS (SELECT doc_id, len, GREATEST(1, dur // 500) AS n_frames FROM m)
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           CAST(i * 500 AS BIGINT) AS frame_ts_ms,
           CAST(LEAST(len, 64) + 4 AS INT) AS frame_len
    FROM n, LATERAL unnest(generate_series(0, CAST(n_frames - 1 AS INT))) t(i)
    """,
    doc="Video frame-sampling stage (multimodal/media.py:frame_sample): "
    "binary content -> one row per sampled frame, the row explosion "
    "happening INSIDE mapInPandas (no driver involvement, Arrow "
    "batches in and out) — the shape a 100 TB video pipeline needs. "
    "Deterministic fake codec (duration from sha256) exactly mirrored "
    "by the DuckDB oracle via generate_series, so frame counts, "
    "timestamps and frame sizes are all hash-checked; a real ffmpeg "
    "decoder slots in behind the same signature.",
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.multimodal.media import frame_sample

    docs = _t(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    frames = frame_sample(
        media,
        every_n_ms=500,
        content_col="content",
        id_cols=["doc_id"],
        deterministic_fake=True,
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        "frame_ts_ms",
        F.octet_length("frame").cast("int").alias("frame_len"),
    )


@_register(
    "dedup_fuzzy_name",
    """
    WITH p AS (SELECT p_partkey,
                      lower(p_brand || ' ' || p_name || ' ' || p_type) AS nm
               FROM part),
    b AS (SELECT p_partkey, nm,
                 array_to_string(string_split(nm, ' ')[1:3], ' ') AS blk
          FROM p)
    SELECT a.p_partkey AS id_a, c.p_partkey AS id_b,
           CAST(levenshtein(a.nm, c.nm) AS INT) AS dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.p_partkey < c.p_partkey
    WHERE abs(length(a.nm) - length(c.nm)) <= 3
      AND levenshtein(a.nm, c.nm) <= 3
    """,
    doc="Entity-resolution fuzzy matching "
    "(operators/dedup.py:fuzzy_blocked_pairs) over a composed entity "
    "name (brand + name + type): first-3-words blocking -> length-band "
    "prune -> exact Levenshtein verify, all built-in JVM-side "
    "expressions (one shuffle on the block key). Word-level blocking "
    "keeps blocks small when names draw from a small vocabulary — the "
    "4-char prefix variant piled hundreds of rows per block and the "
    "|block|^2 verify cost 46s at sf0.1; this shape runs in ~2s. "
    "Oracle mirrors the identical blocking + distance semantics.",
)
def q_dedup_fuzzy_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.dedup import fuzzy_blocked_pairs
    from spark_extensions_spark.session import ensure_parallelism

    # the block self-join broadcasts one side, so the |block|²
    # Levenshtein verify runs in the probe scan's stage — one task on
    # the one-row-group fixture (measured 1.4 s single-task at sf0.1)
    part = ensure_parallelism(_t(spark, sf_dir, "part")["part"])
    named = part.withColumn(
        "__entity_nm",
        F.concat_ws(" ", F.col("p_brand"), F.col("p_name"), F.col("p_type")),
    )
    return fuzzy_blocked_pairs(
        named, "p_partkey", "__entity_nm", max_dist=3, block_words=3
    )


@_register(
    "text_line_dedup",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    c AS (SELECT doc_id, ws, CAST(ceil(len(ws) / 8.0) AS INT) AS k FROM w),
    l AS (SELECT doc_id, i AS pos,
                 array_to_string(ws[i*8+1 : i*8+8], ' ') AS line
          FROM c, LATERAL unnest(generate_series(0, k - 1)) t(i)),
    r AS (SELECT doc_id, pos, line,
                 row_number() OVER (PARTITION BY line
                                    ORDER BY doc_id, pos) AS rn
          FROM l)
    SELECT doc_id, CAST(pos AS INT) AS pos, line FROM r WHERE rn = 1
    """,
    doc="Corpus-level line deduplication "
    "(functions/text.py:corpus_line_dedup), the C4 boilerplate pass: "
    "documents split into 8-word lines (synthesized expression-side, "
    "identically in both engines), then only the globally-first "
    "occurrence of each distinct line survives — posexplode + one "
    "line-keyed window shuffle, no driver state.",
)
def q_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.text import corpus_line_dedup

    docs = _t(spark, sf_dir, "documents")["documents"]
    ws = F.split(F.col("text"), " ")
    k = F.ceil(F.size(ws) / F.lit(8.0)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.array_join(F.slice(ws, i * 8 + 1, 8), " "),
    )
    with_nl = docs.select(
        "doc_id", F.array_join(lines_arr, "\n").alias("text_nl")
    )
    return corpus_line_dedup(with_nl, "doc_id", "text_nl")


@_register(
    "text_pii_redact",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com or 555-123-4567 ssn 123-45-6789 card' ||
             ' 1234-5678-9012-3456' AS t
      FROM documents
    ),
    red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t,
                     '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}', '<CC>', 'g'),
                   '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
               AS redacted
      FROM aug
    )
    SELECT doc_id, md5(redacted) AS redacted_md5,
           CAST(len(regexp_extract_all(redacted, '<(EMAIL|PHONE|SSN|CC)>'))
                AS INT) AS n_redactions
    FROM red
    """,
    doc="PII redaction (functions/text.py:pii_redact): typed-placeholder "
    "replacement with the overlap-safe order CC -> SSN -> PHONE -> "
    "EMAIL, pure codegen'd regexp_replace chain. The query injects "
    "synthetic PII expression-side (identically in both engines) so "
    "the replacement path is actually exercised; output hash-checks "
    "the full redacted text via md5.",
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.text import pii_redact

    docs = _t(spark, sf_dir, "documents")["documents"]
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-4567 ssn 123-45-6789 card"),
        F.lit(" 1234-5678-9012-3456"),
    )
    red = pii_redact(aug)
    return docs.select(
        "doc_id",
        F.md5(red).alias("redacted_md5"),
        F.size(
            F.expr(
                "regexp_extract_all("
                "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
                "concat(text, ' contact user', cast(doc_id as string), "
                "'@example.com or 555-123-4567 ssn 123-45-6789 card', "
                "' 1234-5678-9012-3456'), "
                r"'[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}', '<CC>'), "
                r"'[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>'), "
                r"'[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>'), "
                r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'), "
                "'<(EMAIL|PHONE|SSN|CC)>', 0)"
            )
        ).cast("int").alias("n_redactions"),
    )


def _zorder_oracle() -> str:
    from spark_extensions_spark.operators.layout import zorder_sql

    z = zorder_sql(["s1", "s2"], bits=8)
    return f"""
    WITH s AS (SELECT min(l_partkey) AS mn1, max(l_partkey) AS mx1,
                      min(l_suppkey) AS mn2, max(l_suppkey) AS mx2
               FROM lineitem),
    sc AS (SELECT l_orderkey, l_linenumber,
                  CAST(floor((l_partkey - mn1) * 255.0
                             / greatest(mx1 - mn1, 1)) AS BIGINT) AS s1,
                  CAST(floor((l_suppkey - mn2) * 255.0
                             / greatest(mx2 - mn2, 1)) AS BIGINT) AS s2
           FROM lineitem, s)
    SELECT l_orderkey, l_linenumber, CAST({z} AS BIGINT) AS zval FROM sc
    """


@_register(
    "layout_zorder",
    _zorder_oracle(),
    doc="Z-order (Morton) clustering key (operators/layout.py): "
    "min/max stats pass broadcast back into the plan, linear scaling "
    "to 8-bit ranks, codegen'd bit interleave — the layout that makes "
    "parquet row-group min/max pruning effective on MULTIPLE filter "
    "columns at once (what Delta/Iceberg OPTIMIZE ZORDER does). "
    "write_zordered() adds repartitionByRange + sortWithinPartitions "
    "so files cover disjoint curve segments; the file-skipping win is "
    "asserted in pytest via real parquet row-group statistics.",
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.layout import with_zorder

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return with_zorder(li, ["l_partkey", "l_suppkey"], bits=8).select(
        "l_orderkey", "l_linenumber", "zval"
    )


from spark_extensions_spark import queries14  # noqa: E402,F401  (registration side effect)
