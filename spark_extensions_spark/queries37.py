"""t2 query registry, batch 37: rejection sampling and the
tokenize-and-pack training-batch flagship.

Registered into the shared registry (imported from queries36 at module
end). Same determinism rules as the queries.py docstring.

Two additions closing the alignment/training-batch loop (VERDICT r4
next-round #7), each fully hash-checked against a DuckDB oracle:

- ``rlhf_best_of_n``: rejection sampling / best-of-n selection — per
  prompt, THE best candidate by a deterministic integer reward with a
  rejection threshold (operators/alignment.py:best_of_n): one
  map-side-combinable struct-extremum aggregate, no window.
- ``pipeline_tokenize_pack``: raw documents → fixed-window token
  chunking (functions/text.py:chunk_windows) → greedy sequential
  packing into fixed-token-budget bins (functions/text.py:pack_chunks)
  → per-bin occupancy audit. The end of the pipeline: what ships to
  the trainer. The oracle simulates the greedy packer exactly with a
  recursive CTE, so bin boundaries are hash-checked, not just counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.functions.text import chunk_windows, pack_chunks
from spark_extensions_spark.operators.alignment import (
    best_of_n,
    best_of_n_oracle_sql,
)


# =====================================================================
# Rejection sampling / best-of-n selection
# =====================================================================

# Same synthetic prompt grouping + deterministic integer reward as
# rlhf_preference_pairs (queries36): distinct-token count dominates,
# total chars breaks ties. The rejection threshold (>= 25 distinct
# tokens; docs span ~6-31 distinct) discards low-signal completions —
# roughly the bottom half of candidates; prompts whose every
# candidate is rejected emit nothing — exactly the rejection-sampling
# contract.
_BON_GROUPS = 64
_BON_MIN_REWARD = 25 * 100000
_BON_SCORE_SPARK = (
    "cast(size(array_distinct(split(text, ' '))) as bigint) * 100000"
    " + n_chars"
)
_BON_SCORE_DUCK = (
    "len(list_distinct(string_split(text, ' '))) * 100000 + n_chars"
)


@_register(
    "rlhf_best_of_n",
    best_of_n_oracle_sql(
        f"""SELECT doc_id % {_BON_GROUPS} AS prompt_id, doc_id,
                   CAST({_BON_SCORE_DUCK} AS BIGINT) AS reward
            FROM documents""",
        "prompt_id",
        "doc_id",
        "reward",
        min_reward=_BON_MIN_REWARD,
    ),
    doc="Rejection sampling / best-of-n (operators/alignment.py:"
    "best_of_n): per prompt group, THE highest-reward candidate that "
    "clears the rejection threshold, with accepted/total counts. ONE "
    "map-side-combinable hash aggregate on the prompt key (the "
    "struct-extremum shape shared with preference_pairs) — no window "
    "sort, no join-back, partial state is one struct + two counts per "
    "prompt, so candidate-count skew never concentrates in a task. "
    "Integer rewards make selection bit-exact; ties break on lowest "
    "id. keep>1 composes from the skew-safe grouped_topk.",
)
def q_rlhf_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    scored = docs.select(
        (F.col("doc_id") % _BON_GROUPS).alias("prompt_id"),
        "doc_id",
        F.expr(_BON_SCORE_SPARK).cast("bigint").alias("reward"),
    )
    return best_of_n(
        scored, "prompt_id", "doc_id", "reward",
        min_reward=_BON_MIN_REWARD,
    )


# =====================================================================
# Tokenize -> chunk -> pack: the training-batch assembly flagship
# =====================================================================

_TP_WINDOW = 64   # tokens per training sequence window
_TP_STRIDE = 48   # overlap stride (< window)
_TP_BUDGET = 256  # tokens per packed bin
_TP_SHARDS = 16   # pack shards per language (bounds oracle recursion)


def _tokenize_pack_oracle() -> str:
    """Recursive-CTE twin of chunk_windows + pack_chunks.

    Chunk enumeration mirrors functions/text.py:chunk_windows exactly
    (whitespace split; n_chunks = 1 if n <= W else
    floor((n-W+S-1)/S)+1; chunk i holds least(n - i*S, W) tokens).
    The greedy packer is simulated with a recursive CTE that walks each
    pack shard in (doc_id, chunk_id) order carrying (bin, fill) state —
    the exact per-row recurrence functions/text.py:pack_chunks
    applies — so BIN BOUNDARIES are verified, not just totals.
    Recursion depth = chunks in the largest shard; sharding by
    doc_id % {shards} bounds it by construction (the same key the
    Spark side packs by, so this is parity, not approximation).
    """
    w, s, b = _TP_WINDOW, _TP_STRIDE, _TP_BUDGET
    return f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang, LEN(string_split(text, ' ')) AS n
      FROM documents
    ),
    base AS (
      SELECT doc_id,
             lang || '|' || CAST(doc_id % {_TP_SHARDS} AS VARCHAR)
               AS pack_key,
             n,
             CASE WHEN n <= {w} THEN 1
                  ELSE CAST(FLOOR((n - {w} + {s} - 1) / {s}) AS INT) + 1
             END AS n_chunks
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, pack_key,
             UNNEST(generate_series(0, n_chunks - 1)) AS chunk_id, n
      FROM base
    ),
    sized AS (
      SELECT pack_key, doc_id, chunk_id,
             LEAST(n - chunk_id * {s}, {w}) AS n_tokens
      FROM chunks
    ),
    ordered AS (
      SELECT pack_key, doc_id, chunk_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY pack_key
                                ORDER BY doc_id, chunk_id) AS rn
      FROM sized
    ),
    walk AS (
      SELECT pack_key, rn, n_tokens, 0 AS bin_id, n_tokens AS fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.pack_key, o.rn, o.n_tokens,
             CASE WHEN wk.fill + o.n_tokens > {b}
                  THEN wk.bin_id + 1 ELSE wk.bin_id END,
             CASE WHEN wk.fill + o.n_tokens > {b}
                  THEN o.n_tokens ELSE wk.fill + o.n_tokens END
      FROM walk wk
      JOIN ordered o
        ON o.pack_key = wk.pack_key AND o.rn = wk.rn + 1
    )
    SELECT pack_key, CAST(bin_id AS INT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM walk GROUP BY pack_key, bin_id
    """


@_register(
    "pipeline_tokenize_pack",
    _tokenize_pack_oracle(),
    doc="Training-batch assembly as ONE dataflow: tokenize (whitespace; "
    "BPE slots behind the same chunk_windows signature, rows-only "
    "tested in pytest) -> fixed-window chunking with overlap "
    "(functions/text.py:chunk_windows — row-local sequence/transform/"
    "explode, zero shuffle) -> greedy sequential packing into "
    "256-token bins per (lang, doc-shard) pack key (functions/text.py:"
    "pack_chunks — ONE applyInPandas whose per-group state is a "
    "counter, not the data) -> per-bin occupancy audit. One shuffle "
    "total (the pack key), deterministic bin boundaries under any "
    "partitioning because the fill order is a total order. The oracle "
    "walks the same greedy recurrence with a recursive CTE, so bin "
    "assignment is hash-verified row-for-row.",
)
def q_pipeline_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    chunks = chunk_windows(
        docs, "doc_id", "text", window_tokens=_TP_WINDOW, stride=_TP_STRIDE
    )
    keyed = chunks.join(
        docs.select(
            "doc_id",
            F.concat_ws(
                "|", F.col("lang"), (F.col("doc_id") % _TP_SHARDS).cast("string")
            ).alias("pack_key"),
        ),
        "doc_id",
    )
    packed = pack_chunks(
        keyed.select("pack_key", "doc_id", "chunk_id", "n_tokens"),
        "pack_key",
        ["doc_id", "chunk_id"],
        "n_tokens",
        budget=_TP_BUDGET,
    )
    return packed.groupBy("pack_key", "bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
    )


from spark_extensions_spark import queries38  # noqa: E402,F401  (registration side effect)
