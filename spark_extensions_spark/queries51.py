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


# ---------------------------------------------------------------------
# eval_bradley_terry — pairwise-preference strength ranking (MM loop)
# ---------------------------------------------------------------------

_BT_ITERS = 3
# fixed-point scales live with the operator:
# operators/evals.py BT_P0 / BT_TERM_SCALE (imported for the oracle)
from spark_extensions_spark.operators.evals import (  # noqa: E402
    BT_P0 as _BT_P0,
    BT_TERM_SCALE as _BT_TERM_SCALE,
)


def _bt_matches_sql() -> str:
    """Deterministic pairwise matches from the events table: event 2k
    vs event 2k+1, winner by value (ties to the lexicographically
    smaller model); self-matches dropped."""
    return """
    SELECT CASE WHEN a.value > b.value THEN a.event_type
                WHEN b.value > a.value THEN b.event_type
                ELSE least(a.event_type, b.event_type) END AS winner,
           a.event_type AS m_a, b.event_type AS m_b
    FROM events a JOIN events b ON b.event_id = a.event_id + 1
    WHERE a.event_id % 2 = 0 AND a.event_type <> b.event_type
      AND a.value IS NOT NULL AND b.value IS NOT NULL
    """


def _bt_oracle(iters: int) -> str:
    parts = [
        f"bt_m AS ({_bt_matches_sql()})",
        """bt_pairs AS (
      SELECT m_i, m_j, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT m_a AS m_i, m_b AS m_j FROM bt_m
        UNION ALL
        SELECT m_b AS m_i, m_a AS m_j FROM bt_m
      ) GROUP BY 1, 2
    )""",
        """bt_models AS (SELECT DISTINCT m_i AS m FROM bt_pairs)""",
        """bt_wins AS (
      SELECT m, CAST(COUNT(w.winner) AS BIGINT) AS w
      FROM bt_models LEFT JOIN bt_m w ON w.winner = bt_models.m
      GROUP BY 1
    )""",
        f"""bt_p0 AS (
      SELECT m, CAST({_BT_P0} // (SELECT COUNT(*) FROM bt_models)
                  AS BIGINT) AS p
      FROM bt_models
    )""",
    ]
    prev = "bt_p0"
    for it in range(1, iters + 1):
        parts.append(
            f"""bt_p{it} AS (
      SELECT w.m,
             CASE WHEN COALESCE(d.denom, 0) > 0
                  THEN CAST((w.w * {_BT_TERM_SCALE}) // d.denom AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS p
      FROM bt_wins w LEFT JOIN (
        SELECT pr.m_i AS m,
               SUM(CASE WHEN pi.p + pj.p > 0
                        THEN (pr.n * {_BT_TERM_SCALE}) // (pi.p + pj.p)
                        ELSE 0 END) AS denom
        FROM bt_pairs pr
        JOIN {prev} pi ON pi.m = pr.m_i
        JOIN {prev} pj ON pj.m = pr.m_j
        GROUP BY 1
      ) d ON d.m = w.m
    )"""
        )
        prev = f"bt_p{it}"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT p.m AS model, p.p AS strength_e9, w.w AS wins,
           CAST(COALESCE(nm.n_matches, 0) AS BIGINT) AS n_matches
    FROM {prev} p
    JOIN bt_wins w ON w.m = p.m
    LEFT JOIN (SELECT m_i AS m, SUM(n) AS n_matches FROM bt_pairs
               GROUP BY 1) nm ON nm.m = p.m
    """
    )


@_register(
    "eval_bradley_terry",
    _bt_oracle(_BT_ITERS),
    doc="Bradley-Terry pairwise-preference strength ranking (the "
    "Elo/leaderboard aggregate of RLHF and arena-style evals; Bradley "
    "& Terry 1952, MM iteration per Hunter 2004): deterministic "
    "matches from consecutive event pairs, then three "
    "minorization-maximization rounds p_i' = W_i / sum_j n_ij / "
    "(p_i + p_j) in exact e9 fixed-point — every per-pair term "
    "integer-floor-divided BEFORE the exact BIGINT sum (the pagerank "
    "recipe), so both engines run bit-identical arithmetic; "
    "zero-denominator and zero-win models take CASE-guarded 0. Scale "
    "shape: ONE corpus scan builds the match table, everything after "
    "runs on the model-pair DOMAIN (|models|^2 rows); the oracle "
    "unrolls the identical recursion in CTEs.",
)
def q_eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.evals import (
        bradley_terry_strengths,
    )

    ev = _t(spark, sf_dir, "events")["events"]
    a = ev.select(
        F.col("event_id").alias("eid"),
        F.col("event_type").alias("m_a"),
        F.col("value").alias("va"),
    ).where(F.col("eid") % 2 == 0)
    b = ev.select(
        (F.col("event_id") - 1).alias("eid"),
        F.col("event_type").alias("m_b"),
        F.col("value").alias("vb"),
    )
    matches = (
        a.join(b, "eid")
        .where(
            (F.col("m_a") != F.col("m_b"))
            & F.col("va").isNotNull()
            & F.col("vb").isNotNull()
        )
        .select(
            F.when(F.col("va") > F.col("vb"), F.col("m_a"))
            .when(F.col("vb") > F.col("va"), F.col("m_b"))
            .otherwise(F.least("m_a", "m_b"))
            .alias("winner"),
            "m_a",
            "m_b",
        )
    )
    return bradley_terry_strengths(matches, iters=_BT_ITERS)


from spark_extensions_spark import queries52  # noqa: E402,F401  (registration side effect)
