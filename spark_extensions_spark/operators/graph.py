"""Connected components over an edge DataFrame — the cluster-resolution
step a large-scale dedup pipeline runs after candidate-pair generation.

MinHash-LSH / n-gram-Jaccard emit *pairs*; picking one canonical
document per duplicate *group* requires the transitive closure of those
pairs. :func:`connected_components` computes it as iterative hash-min
label propagation, entirely with DataFrame joins/aggregations:

    label(n)  ←  min(label(n), min over neighbors m of label(m))

which converges to ``component id = min node id in the component``
within ``diameter`` rounds. Near-dup graphs are overwhelmingly tiny
dense cliques (diameter 1–2), so 3–5 rounds is typical; each round is
one join + one groupBy shuffle, both keyed by node id.

Scale notes (100 TB corpus → billions of nodes, shallow components):

- per-round ``localCheckpoint`` truncates the lineage, without which
  iteration k replans k² joins (the classic iterative-Catalyst trap);
- convergence is detected distributedly (count of labels that changed
  this round) — nothing but the scalar count reaches the driver;
- for adversarially deep graphs (long chains), swap the per-round rule
  for the large-star/small-star pair of Kiveris et al. ("Connected
  Components in MapReduce and Beyond", SoCC'14) — same join/groupBy
  primitives, O(log²) rounds; the default here favors the dedup-clique
  workload where plain hash-min wins by constant factors.

Reference scope note: the reference library has no graph surface; this
belongs to the LLM-data-pipeline extension layer (SURVEY.md §7 M5).
The DuckDB oracle is a recursive-CTE transitive closure — exact, so the
operator is fully hash-checked (see queries4.dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected edge list with its component.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id reachable from ``node`` (self included); one row per
    distinct endpoint of ``edges``. Raises if ``max_iter`` rounds don't
    reach a fixpoint (guards against silent wrong answers on graphs
    deeper than expected — raise the cap or switch algorithms then).

    One Spark action per round: the checkpoint is LAZY and the
    changed-label aggregate is the action that materializes it — the
    convergence probe rides the same job instead of re-scanning (an
    eager checkpoint + separate count would be two actions, and
    deferring the probe to every N rounds would trade a cheap scalar
    count for a full redundant propagation round).
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
    )
    # Materialize the edge list once: upstream lineage (e.g. an LSH
    # candidate-pair join) must not be re-executed every round.
    sym = sym.localCheckpoint(eager=True)
    # Round 0 folds the first propagation into initialization.
    labels = sym.groupBy("node").agg(
        F.least(F.min("nbr"), F.first("node")).alias("component")
    )
    labels = labels.localCheckpoint(eager=True)

    for it in range(max_iter):
        # neighbor minimum of current labels
        nbr_labels = labels.withColumnRenamed("node", "nbr").withColumnRenamed(
            "component", "nbr_comp"
        )
        nbr_min = (
            sym.join(nbr_labels, "nbr", "inner")
            .groupBy("node")
            .agg(F.min("nbr_comp").alias("nbr_comp"))
            .withColumnRenamed("node", "n")
        )
        updated = (
            labels.join(nbr_min, labels["node"] == nbr_min["n"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_comp") < F.col("component")).alias("__changed"),
            )
        )
        # lazy checkpoint: the full-scan aggregate below is the action
        # that materializes it (and truncates lineage for next round)
        updated = updated.localCheckpoint(eager=False)
        changed = updated.agg(
            F.count_if(F.col("__changed")).alias("c")
        ).head()["c"]
        labels = updated.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph deeper than expected — raise max_iter or use "
        "large-star/small-star"
    )


def neardup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Resolve near-duplicate candidate pairs into duplicate groups.

    ``(doc_id, cluster_id)`` for every document that appears in a pair;
    ``cluster_id`` is the minimum doc id of the group — the canonical
    survivor under keep-first policy. Downstream: anti-join the corpus
    against ``doc_id != cluster_id`` rows to drop the losers.
    """
    return connected_components(pairs, id_a, id_b).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
