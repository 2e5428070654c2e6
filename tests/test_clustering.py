"""k-means / diverse-sampling tests: numpy twin, invariance, inertia."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_extensions_spark.operators.clustering import (
    assign_clusters,
    kmeans_assignments,
    kmeans_fit,
    sample_diverse,
)
from spark_extensions_spark.operators.sampling import hash_bucket


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _numpy_twin(ids, vecs, order, k, iters):
    """Same algorithm in numpy: hash-min init, argmin assign (first-min
    tie-break), mean update, empty clusters keep their centroid."""
    centroids = vecs[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                centroids[c] = vecs[mask].mean(axis=0)
    d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)  # re-assign with the FINAL centroids
    return assign, centroids, d.min(axis=1).sum()


def test_kmeans_matches_numpy_twin(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    rows = (
        emb.select(
            "vec_id",
            "embedding",
            hash_bucket("vec_id", "kmeans", 1 << 60).alias("h"),
        )
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array(
        [[float(x) for x in r["embedding"]] for r in rows],
        dtype=np.float64,
    )
    order = np.lexsort((ids, np.array([r["h"] for r in rows])))
    k, iters = 4, 3
    np_assign, np_centroids, _ = _numpy_twin(ids, vecs, order, k, iters)

    centroids = kmeans_fit(emb, "vec_id", "embedding", k=k, iters=iters)
    got = {
        r["vec_id"]: r["cluster"]
        for r in emb.select(
            "vec_id", assign_clusters("embedding", centroids).alias("cluster")
        ).collect()
    }
    want = dict(zip(ids.tolist(), np_assign.tolist()))
    mismatches = sum(1 for i in want if got[i] != want[i])
    # FP rounding (decimal(28,12) update sums vs numpy doubles) may flip
    # points sitting exactly between centroids — allow a sliver
    assert mismatches <= len(want) * 0.01, mismatches
    for c_spark, c_np in zip(centroids, np_centroids):
        assert np.allclose(np.array(c_spark), c_np, atol=1e-6)


def test_kmeans_partitioning_invariant(spark, sf_dir):
    emb = _emb(spark, sf_dir).limit(300)
    a = kmeans_fit(emb.repartition(13), "vec_id", "embedding", k=3, iters=2)
    b = kmeans_fit(emb.coalesce(1), "vec_id", "embedding", k=3, iters=2)
    assert a == b  # decimal-exact update sums => bit-identical centroids


def test_kmeans_inertia_decreases(spark, sf_dir):
    emb = _emb(spark, sf_dir)

    def inertia(iters):
        cents = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=iters)
        dists = ", ".join(
            "aggregate(zip_with(embedding, array(%s), (a, b) -> "
            "(cast(a as double) - b) * (cast(a as double) - b)), 0d, "
            "(acc, x) -> acc + x)" % ", ".join(f"{x!r}d" for x in c)
            for c in cents
        )
        return emb.select(
            F.expr(f"array_min(array({dists}))").alias("d")
        ).agg(F.sum("d")).head()[0]

    assert inertia(3) <= inertia(0) * (1 + 1e-9)


def test_sample_diverse_caps_every_cluster(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = sample_diverse(
        emb, "vec_id", "embedding", k=4, cap=25, iters=2
    )
    sizes = {
        r["cluster"]: r["n"]
        for r in out.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(n <= 25 for n in sizes.values())
    assert len(sizes) >= 2  # the corpus genuinely spans clusters


def test_kmeans_det_matches_python_twin(spark):
    """Deterministic integer k-means: full-fit centroids and final
    assignments match an independent pure-Python recompute (same init,
    same exact-integer rules)."""
    import hashlib
    import math

    from spark_extensions_spark.operators.clustering import (
        kmeans_assignments_det,
        kmeans_fit_det,
    )
    from spark_extensions_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.01", "embeddings")[
        "embeddings"
    ]
    k, iters = 4, 2
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {
        r["vec_id"]: [math.floor(float(v) * 1e6 + 0.5) for v in r["embedding"]]
        for r in rows
    }
    order = sorted(
        vecs,
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    cents = [list(vecs[i]) for i in order[:k]]

    def assign_all(cs):
        out = {}
        for vid, q in vecs.items():
            dists = [
                sum((v - c) * (v - c) for v, c in zip(q, cq)) for cq in cs
            ]
            out[vid] = dists.index(min(dists))
        return out

    for _ in range(iters):
        a = assign_all(cents)
        nxt = [list(c) for c in cents]
        for ci in range(k):
            members = [vecs[vid] for vid, c in a.items() if c == ci]
            if members:
                nxt[ci] = [
                    math.floor(float(sum(col)) / len(members))
                    for col in zip(*members)
                ]
        cents = nxt

    got_cents = kmeans_fit_det(emb, "vec_id", "embedding", k=k, iters=iters)
    assert got_cents == cents

    expected = assign_all(cents)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assignments_det(
            emb, "vec_id", "embedding", k=k, iters=iters
        ).collect()
    }
    assert got == expected
