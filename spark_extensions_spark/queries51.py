"""t2 query registry, batch 51 (round 9): the BPE merge table,
hash-checked through N greedy rounds.

Registered into the shared registry (imported from queries50 at module
end). Same determinism rules as the queries.py docstring.

- ``tokenizer_bpe_merges``: converts the BPE merge LOOP itself from
  rows-only to oracle-backed (VERDICT r8 #9). The Spark side runs the
  real trainer (functions/tokenizer.py:bpe_train_stats) for three
  merges over the bounded corpus word-frequency table; the DuckDB
  oracle unrolls the identical greedy recursion in SQL — the same
  unrolled-CTE pattern pagerank uses — recomputing pair counts, the
  (cnt DESC, left, right) argmax, and the merge APPLICATION per round.
  The merge application exploits an exact semantic match: textbook BPE
  applies a merge greedily left-to-right non-overlapping
  (tokenizer.py:_bpe_train_full), which is precisely SQL
  ``replace()`` on a symbol-wrapped string ``(h)(e)(l)(l)(o)(</w>)``
  — the wrappers make matches symbol-exact (no prefix/suffix
  aliasing), and replace() is left-to-right non-overlapping by
  definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t

_BPM_ROUNDS = 3
_BPM_MIN_COUNT = 2
_BPM_MAX_VOCAB = 1_000_000


def _bpm_oracle(rounds: int) -> str:
    """Unrolled DuckDB twin of ``rounds`` greedy BPE merges.

    Per round r: pair counts from the current symbol representation
    (one-arg lambda over a generate_series of adjacent positions, the
    proven-portable construct from the graded tokenizer_bpe_pair_stats
    oracle), argmax with the trainer's exact (cnt DESC, left, right)
    tuple tie-break and the >= 2 occurrence floor, then the merge
    applied by replace() on the wrapped representation.
    """
    parts = [
        f"""bpm_words AS (
      SELECT word, freq FROM (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
          SELECT unnest(string_split_regex(lower(text),
                   '[^a-z0-9'']+')) AS word
          FROM documents
        ) WHERE word <> '' GROUP BY word
      ) WHERE freq >= {_BPM_MIN_COUNT}
      ORDER BY freq DESC, word LIMIT {_BPM_MAX_VOCAB}
    )""",
        r"""w0 AS (
      SELECT regexp_replace(word, '(.)', '(\1)', 'g') || '(</w>)'
               AS repr,
             freq
      FROM bpm_words
    )""",
    ]
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""p{r} AS (
      SELECT split_part(pr, ' ', 1) AS l,
             split_part(pr, ' ', 2) AS r,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(list_transform(
                 generate_series(1, len(syms) - 1),
                 i -> syms[i] || ' ' || syms[i + 1])) AS pr,
               freq
        FROM (SELECT string_split(trim(repr, '()'), ')(') AS syms,
                     freq
              FROM {prev})
      ) GROUP BY 1, 2
    )"""
        )
        parts.append(
            f"""m{r} AS (
      SELECT l, r, cnt FROM p{r}
      WHERE cnt >= 2 ORDER BY cnt DESC, l, r LIMIT 1
    )"""
        )
        if r < rounds:
            parts.append(
                f"""w{r} AS (
      SELECT replace(repr,
                     '(' || l || ')(' || r || ')',
                     '(' || l || r || ')') AS repr,
             freq
      FROM {prev} CROSS JOIN m{r}
    )"""
            )
    union = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_rank, l AS left_sym, r AS right_sym, cnt "
        f"FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + union


@_register(
    "tokenizer_bpe_merges",
    _bpm_oracle(_BPM_ROUNDS),
    doc="The BPE merge table through three greedy rounds, hash-checked "
    "(functions/tokenizer.py:bpe_train_stats; Sennrich et al. 2016): "
    "ONE distributed scan + hash aggregate builds the bounded "
    "word-frequency table (freq >= 2, top 1M by (freq DESC, word) — "
    "a TakeOrderedAndProject), then the driver-side trainer learns "
    "merges over it. The oracle unrolls the identical recursion in "
    "SQL (pagerank's unrolled-CTE pattern): per-round pair counts, "
    "the exact (cnt DESC, left, right) argmax with the >=2 floor, "
    "and greedy left-to-right merge application via symbol-wrapped "
    "replace(). Converts the previously rows-only merge loop to "
    "oracle-backed; tokenizer_bpe_pair_stats remains the round-1 "
    "statistics twin.",
)
def q_tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.tokenizer import (
        bpe_train_stats,
        word_frequencies,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    wf = word_frequencies(docs, "text").filter(
        F.col("freq") >= _BPM_MIN_COUNT
    )
    # vocabulary-sized bounded collect (the documented BPE trainer
    # split, see bpe_train_on_corpus): freq >= 2 + top-1M cutoff
    rows = (
        wf.orderBy(F.desc("freq"), F.asc("word"))
        .limit(_BPM_MAX_VOCAB)
        .collect()
    )
    stats = bpe_train_stats(
        [(r["word"], r["freq"]) for r in rows], _BPM_ROUNDS
    )
    return spark.createDataFrame(
        [(i + 1, le, ri, c) for i, (le, ri, c) in enumerate(stats)],
        "merge_rank int, left_sym string, right_sym string, cnt bigint",
    )
