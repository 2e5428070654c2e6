"""Training-pair construction for alignment data (DPO/RLHF, contrastive).

Two operators a post-training data pipeline needs on top of the
curation layer:

- :func:`preference_pairs` — per-prompt (chosen, rejected) response
  pairs by score, the DPO/RLHF-preference input format.
- :func:`hard_negatives` — for each anchor embedding, the most-similar
  wrong-label vectors: the hard negatives contrastive training mines.

Both are pure DataFrame compositions (no Python on the hot path), with
shuffle shapes that survive scale:

- preference_pairs is ONE map-side-combinable hash aggregate on the
  prompt key (tiebreaks encoded as struct extrema) — one scan, no
  window sort, no join-back; group size never matters because the
  partial aggregate keeps two structs and a count per prompt.
- hard_negatives broadcasts the (small) anchor set, scores row-locally
  against each corpus partition, and takes per-anchor top-k in two
  stages (per (anchor, hash-bucket) then per anchor) so a single
  anchor's candidate list is never sorted in one task — the
  stratified_cap / domain_cap shape from operators/sampling.py.  For
  corpus-scale anchor sets use the ANN index path
  (operators/similarity.py: ivf_*) to pre-prune candidates instead of
  scoring every (anchor, vector) pair.

Reference scope note: the reference engine (smart-data-lake/
spark-extensions) stops at the relational layer; these extend the
same DataFrame-first style to the LLM-pipeline surface per SURVEY §2's
extension families.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_extensions_spark.operators.sampling import grouped_topk
from spark_extensions_spark.operators.similarity import cosine_similarity_col


def preference_pairs(
    df: DataFrame,
    prompt_col: str,
    id_col: str,
    score_col: str,
    min_margin: int = 1,
) -> DataFrame:
    """Build per-prompt (chosen, rejected) preference pairs by score.

    For every prompt group: ``chosen`` is the highest-scored candidate
    (ties broken by lowest ``id_col``), ``rejected`` the lowest-scored
    (same tiebreak); groups whose score spread is below ``min_margin``
    produce no pair (a pair needs a real preference signal — DPO on
    near-ties trains on noise).  Scores should be integers if
    bit-reproducible margins matter.

    Output: ``(prompt_col, chosen_id, rejected_id, chosen_score,
    rejected_score, margin, n_candidates)``, one row per surviving
    prompt.

    Plan: ONE hash aggregate on the prompt key — map-side combinable,
    one scan, no window sort and no join-back.  The tiebreaks ride the
    aggregate as lexicographic struct extrema: ``min(struct(-score,
    id))`` is the highest score with the LOWEST id on ties, and
    ``min(struct(score, id))`` the lowest score with the lowest id —
    deterministic on any cluster layout.  (The oracle keeps the
    equivalent two-rank-window form; results are identical.)  Scores
    must be NUMERIC (the chosen-side extremum negates them; ids may be
    any orderable type).

    NULL-scored candidates are excluded up front (engines order NULLs
    differently, and a null score is "no preference signal", not a
    minimum); a group left with no scored candidate emits nothing.
    """
    df = df.filter(F.col(score_col).isNotNull())
    best = F.min(
        F.struct(
            (-F.col(score_col)).alias("ns"), F.col(id_col).alias("i")
        )
    )
    worst = F.min(
        F.struct(F.col(score_col).alias("s"), F.col(id_col).alias("i"))
    )
    agg = df.groupBy(prompt_col).agg(
        best.alias("__best"),
        worst.alias("__worst"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return (
        agg.select(
            prompt_col,
            F.col("__best.i").alias("chosen_id"),
            F.col("__worst.i").alias("rejected_id"),
            (-F.col("__best.ns")).alias("chosen_score"),
            F.col("__worst.s").alias("rejected_score"),
            (-F.col("__best.ns") - F.col("__worst.s")).alias("margin"),
            "n_candidates",
        )
        .filter(F.col("margin") >= min_margin)
    )


def preference_pairs_oracle_sql(
    scored_sql: str,
    prompt_col: str,
    id_col: str,
    score_col: str,
    min_margin: int = 1,
) -> str:
    """DuckDB twin of :func:`preference_pairs` over ``scored_sql``
    (a query producing at least prompt/id/score columns; NULL scores
    are excluded to mirror the operator contract)."""
    return f"""
    WITH scored AS (SELECT * FROM ({scored_sql})
                    WHERE {score_col} IS NOT NULL),
    ranked AS (
      SELECT {prompt_col}, {id_col}, {score_col},
             ROW_NUMBER() OVER (PARTITION BY {prompt_col}
                                ORDER BY {score_col} DESC, {id_col}) AS rb,
             ROW_NUMBER() OVER (PARTITION BY {prompt_col}
                                ORDER BY {score_col} ASC, {id_col}) AS rw,
             COUNT(*) OVER (PARTITION BY {prompt_col}) AS n
      FROM scored
    ),
    chosen AS (
      SELECT {prompt_col}, {id_col} AS chosen_id,
             {score_col} AS chosen_score, n AS n_candidates
      FROM ranked WHERE rb = 1
    ),
    rejected AS (
      SELECT {prompt_col}, {id_col} AS rejected_id,
             {score_col} AS rejected_score
      FROM ranked WHERE rw = 1
    )
    SELECT c.{prompt_col}, chosen_id, rejected_id,
           chosen_score, rejected_score,
           chosen_score - rejected_score AS margin, n_candidates
    FROM chosen c JOIN rejected r USING ({prompt_col})
    WHERE chosen_score - rejected_score >= {min_margin}
    """


def best_of_n(
    df: DataFrame,
    prompt_col: str,
    id_col: str,
    reward_col: str,
    min_reward=None,
    keep: int = 1,
    pre_buckets: int = 16,
) -> DataFrame:
    """Rejection sampling / best-of-n selection: per prompt, the
    top-``keep`` candidates by reward, after rejecting candidates below
    ``min_reward`` — the RLHF-era recipe that turns n sampled
    completions per prompt into SFT-quality training rows.

    ``keep=1`` (the common best-of-n case) runs as ONE map-side-
    combinable hash aggregate on the prompt key — the same
    struct-extremum shape as :func:`preference_pairs`: no window sort,
    no join-back, partial state is one struct + two counts per prompt,
    so a mega-prompt with millions of candidates costs the same as a
    small one.  Output: ``(prompt_col, best_id, best_reward,
    n_candidates, n_accepted)``; prompts with no accepted candidate
    emit nothing.  Ties break on the LOWEST id — deterministic on any
    cluster layout.

    ``keep>1`` composes from :func:`~spark_extensions_spark.operators.
    sampling.grouped_topk` (skew-safe two-stage top-k; bit-identical to
    the one-window oracle form).  Output: ``(prompt_col, id_col,
    reward_col, rank)`` with rank 1..keep by (reward DESC, id).

    NULL rewards are excluded up front (no reward signal ≠ minimum
    reward; engines order NULLs differently), and so are NaN rewards on
    float columns: under ``min(struct(-reward, id))`` a NaN never wins
    (NaN negates to NaN, which sorts greatest under min) while the
    keep>1 rank path and the SQL oracle (ORDER BY reward DESC) rank NaN
    FIRST — the three forms only agree if NaN is out of the pool.
    ±Infinity is consistent across all three and stays eligible.
    """
    df = df.filter(F.col(reward_col).isNotNull())
    if isinstance(df.schema[reward_col].dataType, (T.FloatType, T.DoubleType)):
        df = df.filter(~F.isnan(F.col(reward_col)))
    accepted = (
        F.col(reward_col) >= min_reward
        if min_reward is not None
        else F.lit(True)
    )
    if keep == 1:
        qual = F.when(
            accepted,
            F.struct(
                (-F.col(reward_col)).alias("nr"), F.col(id_col).alias("i")
            ),
        )
        agg = df.groupBy(prompt_col).agg(
            F.min(qual).alias("__best"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.count(qual).alias("n_accepted"),
        )
        return agg.filter(F.col("__best").isNotNull()).select(
            prompt_col,
            F.col("__best.i").alias("best_id"),
            (-F.col("__best.nr")).alias("best_reward"),
            "n_candidates",
            "n_accepted",
        )
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(pre_buckets))
    return grouped_topk(
        df.filter(accepted),
        [prompt_col],
        [F.desc(reward_col), F.col(id_col)],
        keep,
        bucket,
        rank_col="rank",
    ).select(prompt_col, id_col, reward_col, "rank")


def best_of_n_oracle_sql(
    scored_sql: str,
    prompt_col: str,
    id_col: str,
    reward_col: str,
    min_reward=None,
    keep: int = 1,
) -> str:
    """DuckDB twin of :func:`best_of_n` (one-rank-window form) over
    ``scored_sql`` (a query producing prompt/id/reward columns)."""
    acc = (
        f"{reward_col} >= {min_reward}" if min_reward is not None else "TRUE"
    )
    if keep == 1:
        return f"""
        WITH scored AS (SELECT * FROM ({scored_sql})
                        WHERE {reward_col} IS NOT NULL
                          AND NOT isnan(CAST({reward_col} AS DOUBLE))),
        counts AS (
          SELECT {prompt_col},
                 CAST(COUNT(*) AS BIGINT) AS n_candidates,
                 CAST(COUNT(*) FILTER ({acc}) AS BIGINT) AS n_accepted
          FROM scored GROUP BY {prompt_col}
        ),
        best AS (
          SELECT {prompt_col}, {id_col} AS best_id,
                 {reward_col} AS best_reward
          FROM (
            SELECT {prompt_col}, {id_col}, {reward_col},
                   ROW_NUMBER() OVER (PARTITION BY {prompt_col}
                                      ORDER BY {reward_col} DESC, {id_col})
                     AS rn
            FROM scored WHERE {acc}
          ) WHERE rn = 1
        )
        SELECT c.{prompt_col}, best_id, best_reward,
               n_candidates, n_accepted
        FROM counts c JOIN best b USING ({prompt_col})
        """
    return f"""
    SELECT {prompt_col}, {id_col}, {reward_col}, rank FROM (
      SELECT {prompt_col}, {id_col}, {reward_col},
             ROW_NUMBER() OVER (PARTITION BY {prompt_col}
                                ORDER BY {reward_col} DESC, {id_col}) AS rank
      FROM ({scored_sql})
      WHERE {reward_col} IS NOT NULL
        AND NOT isnan(CAST({reward_col} AS DOUBLE)) AND {acc}
    ) WHERE rank <= {keep}
    """


def hard_negatives(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    anchor_ids: Sequence[int],
    k: int,
    dim: int,
    pre_buckets: int = 16,
) -> DataFrame:
    """Mine hard negatives: per anchor, the ``k`` most-similar vectors
    with a DIFFERENT label.

    Contrastive/embedding training wants negatives the current space
    already confuses with the anchor — the top of the wrong-label
    similarity ranking — not random negatives.  Output: ``(anchor_id,
    neg_id, rank, cosine)``, ``rank`` 1..k by descending cosine (ties
    by ``neg_id``).

    Plan: the anchor set is broadcast (it is small by contract — raise
    otherwise), scoring is a row-local codegen projection over each
    corpus partition (sequential-fold dot product, bit-deterministic),
    and the per-anchor top-k runs in two stages — per (anchor,
    hash-bucket(neg_id)) then per anchor over ≤ k·pre_buckets
    survivors — so no task ever sorts a whole anchor's corpus-sized
    candidate list (operators/sampling.py:grouped_topk, the shared
    primitive; bit-identical to the one-window form = the oracle).  For
    anchor sets beyond broadcast size, pre-prune candidates with the
    IVF index (operators/similarity.py) instead of exact all-pairs.
    """
    if not anchor_ids:
        raise ValueError("hard_negatives: anchor_ids is empty")
    if len(anchor_ids) > 10_000:
        raise ValueError(
            "hard_negatives broadcasts the anchor set; "
            f"{len(anchor_ids)} anchors is beyond the exact path — "
            "pre-prune with the IVF index (operators/similarity.py)"
        )
    anchors = emb.filter(F.col(id_col).isin(list(anchor_ids))).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("__avec"),
        F.col(label_col).alias("__albl"),
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(
            (F.col(label_col) != F.col("__albl"))
            & (F.col(id_col) != F.col("anchor_id"))
        )
        .select(
            "anchor_id",
            F.col(id_col).alias("neg_id"),
            cosine_similarity_col(vec_col, "__avec", dim).alias("cosine"),
        )
    )
    bucket = F.pmod(F.xxhash64(F.col("neg_id")), F.lit(pre_buckets))
    return grouped_topk(
        scored,
        ["anchor_id"],
        [F.desc("cosine"), F.col("neg_id")],
        k,
        bucket,
        rank_col="rank",
    ).select("anchor_id", "neg_id", "rank", "cosine")


def hard_negatives_oracle_sql(
    cosine_fragment: str,
    anchor_ids: Sequence[int],
    k: int,
    id_col: str = "vec_id",
    label_col: str = "label",
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`hard_negatives` (single-window form).

    ``cosine_fragment`` is the engine-portable sequential-fold cosine
    over aliases ``e`` (corpus) and ``a`` (anchor), e.g. from
    queries.py:_cosine_duck('e.embedding', 'a.embedding', dim).
    """
    if not anchor_ids:
        raise ValueError("hard_negatives_oracle_sql: anchor_ids is empty")
    ids = ", ".join(str(i) for i in anchor_ids)
    return f"""
    SELECT anchor_id, neg_id, rank, cosine FROM (
      SELECT a.{id_col} AS anchor_id, e.{id_col} AS neg_id,
             {cosine_fragment} AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY a.{id_col}
               ORDER BY {cosine_fragment} DESC, e.{id_col}) AS rank
      FROM {table} e
      CROSS JOIN (SELECT * FROM {table}
                  WHERE {id_col} IN ({ids})) a
      WHERE e.{label_col} <> a.{label_col}
        AND e.{id_col} <> a.{id_col}
    ) WHERE rank <= {k}
    """


def hard_negatives_ivf(
    emb: DataFrame,
    anchors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    dim: int,
    n_lists: int = 16,
    n_probe: int = 4,
    pre_buckets: int = 16,
) -> DataFrame:
    """Corpus-scale hard-negative mining via deterministic IVF pruning.

    The beyond-broadcast regime of :func:`hard_negatives`: ``anchors``
    is a DataFrame (it is never collected or broadcast-forced), each
    anchor probes its ``n_probe`` nearest IVF cells, and candidates
    come from a plain equi-join on the cell id — the corpus is hashed
    once on ``cell``, anchors ×n_probe on the other side, and AQE
    broadcasts the smaller side when it fits.  Scoring and the final
    per-anchor top-k match :func:`hard_negatives` (exact fold cosine,
    skew-safe :func:`~spark_extensions_spark.operators.sampling.grouped_topk`).

    Approximate BY DESIGN (recall depends on ``n_probe``/``n_lists``),
    but bit-DETERMINISTIC: the md5-picked fixed-point codebook and
    exact int64 assignment (operators/similarity.py:ivf_centroids_det /
    ivf_assign_expr) make cell membership — and therefore the whole
    result — reproducible on any engine, so it remains fully
    hash-checkable.  With ``n_probe == n_lists`` the candidate set is
    the entire wrong-label corpus and the result equals the exact
    miner (pinned by test).
    """
    from spark_extensions_spark.operators.similarity import (
        ivf_assign_expr,
        ivf_centroids_det,
        ivf_probe_expr,
        quantize_vec_expr,
    )

    cents = ivf_centroids_det(emb, id_col, vec_col, n_lists)
    corpus = (
        emb.select(
            F.col(id_col).alias("neg_id"),
            F.col(vec_col).alias("__cvec"),
            F.col(label_col).alias("__clbl"),
        )
        .withColumn("__qq", F.expr(quantize_vec_expr("__cvec")))
        .withColumn("cell", F.expr(ivf_assign_expr("__qq", cents)))
        .drop("__qq")
    )
    probes = (
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("__avec"),
            F.col(label_col).alias("__albl"),
        )
        .withColumn("__qq", F.expr(quantize_vec_expr("__avec")))
        .withColumn(
            "cell",
            F.explode(F.expr(ivf_probe_expr("__qq", cents, n_probe))),
        )
        .drop("__qq")
    )
    scored = (
        probes.join(corpus, "cell")
        .filter(
            (F.col("__clbl") != F.col("__albl"))
            & (F.col("neg_id") != F.col("anchor_id"))
        )
        .select(
            "anchor_id",
            "neg_id",
            cosine_similarity_col("__cvec", "__avec", dim).alias("cosine"),
        )
    )
    bucket = F.pmod(F.xxhash64(F.col("neg_id")), F.lit(pre_buckets))
    return grouped_topk(
        scored,
        ["anchor_id"],
        [F.desc("cosine"), F.col("neg_id")],
        k,
        bucket,
        rank_col="rank",
    ).select("anchor_id", "neg_id", "rank", "cosine")
