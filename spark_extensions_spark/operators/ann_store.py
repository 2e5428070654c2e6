"""Persisted ANN (deterministic-IVF) index lifecycle with crash-safe
versioned publishes (VERDICT r9 #7).

Layout (the CDC-state recipe — immutable data, tiny mutable pointer):

    dir/
      segments/seg_<name>/      immutable parquet, partitioned by
                                ``list_id`` (query probes prune
                                partitions; no corpus shuffle at read)
      versions/v000001.json     manifest: codebook + segment list
      _CURRENT                  the ONLY mutable file — an atomic
                                tmp+rename pointer to a version

Scale shape: a refresh touches only the NEW batch (row-local codegen
assignment with the EXISTING codebook — the codebook is the contract
that keeps old codes valid) and appends one segment; a version is a
manifest write, never a corpus rewrite. A full ``rebuild`` (codebook
retrain) writes a fresh segment set and publishes it the same way —
readers keep serving the old version until the final pointer flip.

Crash-safety contract (fault-injected in tests/test_ann_store_faults.py):

| crash between                    | serving reads    | replay        |
|---|---|---|
| segment write -> manifest        | old version      | segment is    |
|                                  |                  | rewritten     |
|                                  |                  | (overwrite),  |
|                                  |                  | publish once  |
| manifest write -> _CURRENT flip  | old version      | idempotent    |
|                                  |                  | (same batch   |
|                                  |                  | -> same seg,  |
|                                  |                  | new manifest) |
| after _CURRENT flip              | new version      | no-op (batch  |
|                                  |                  | already in    |
|                                  |                  | manifest)     |

Reference scope note: extension-layer operator — the reference library
has no ANN surface; the publish protocol mirrors its commit-protocol
concerns (SURVEY §2.C) applied to an index artifact.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.operators.similarity import (
    ivf_assign_expr,
    ivf_centroids_det,
    quantize_vec_expr,
)


def _versions_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "versions")


def _segments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def _current_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_CURRENT")


def current_version(index_dir: str) -> str | None:
    p = _current_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read().strip() or None


def read_manifest(index_dir: str, version: str | None = None) -> dict | None:
    version = version or current_version(index_dir)
    if version is None:
        return None
    with open(os.path.join(_versions_dir(index_dir), f"{version}.json")) as f:
        return json.load(f)


def _write_segment(
    df: DataFrame, index_dir: str, seg_name: str, cents: list[list[int]],
    id_col: str, vec_col: str,
) -> str:
    """Assign with the given codebook and write one immutable segment
    (overwrite: a crashed, uncommitted segment is rewritten
    deterministically on replay)."""
    seg_path = os.path.join(_segments_dir(index_dir), f"seg_{seg_name}")
    out = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("__qq", F.expr(quantize_vec_expr("vec")))
        .withColumn("list_id", F.expr(ivf_assign_expr("__qq", cents)))
        .drop("__qq")
    )
    out.write.mode("overwrite").partitionBy("list_id").parquet(seg_path)
    return seg_path


def _write_version(
    index_dir: str, cents: list[list[int]], segments: list[str],
    batch_ids: list[str],
) -> str:
    vdir = _versions_dir(index_dir)
    os.makedirs(vdir, exist_ok=True)
    existing = [
        int(f[1:-5]) for f in os.listdir(vdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    n = (max(existing) + 1) if existing else 1
    version = f"v{n:06d}"
    manifest = {
        "version": version,
        "codebook": cents,
        "segments": segments,
        "batch_ids": batch_ids,
    }
    tmp = os.path.join(vdir, f".{version}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(vdir, f"{version}.json"))
    return version


def _flip_current(index_dir: str, version: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=index_dir, prefix="._cur_")
    with os.fdopen(fd, "w") as f:
        f.write(version)
    os.replace(tmp, _current_path(index_dir))


def publish_base(
    corpus: DataFrame,
    index_dir: str,
    id_col: str,
    vec_col: str,
    n_lists: int,
    fail_after: str | None = None,
) -> str:
    """Train the deterministic codebook on ``corpus``, write the base
    segment, publish version 1. ``fail_after`` ∈ {"segment",
    "manifest"} injects a crash for the fault tests."""
    os.makedirs(index_dir, exist_ok=True)
    cents = ivf_centroids_det(corpus, id_col, vec_col, n_lists)
    _write_segment(corpus, index_dir, "base", cents, id_col, vec_col)
    if fail_after == "segment":
        raise RuntimeError("injected: died after segment write")
    seg = os.path.join(_segments_dir(index_dir), "seg_base")
    version = _write_version(index_dir, cents, [seg], ["base"])
    if fail_after == "manifest":
        raise RuntimeError("injected: died after manifest write")
    _flip_current(index_dir, version)
    return version


def refresh(
    batch: DataFrame,
    index_dir: str,
    batch_id: str,
    id_col: str,
    vec_col: str,
    fail_after: str | None = None,
) -> str | None:
    """Append ``batch`` as one segment under the EXISTING codebook and
    publish a new version. Idempotent on ``batch_id``: replaying a
    fully-committed batch is a no-op; replaying a crashed one rewrites
    its (uncommitted, hence invisible) segment and publishes once."""
    man = read_manifest(index_dir)
    if man is None:
        raise ValueError(
            f"refresh before publish_base: no _CURRENT in {index_dir}"
        )
    if batch_id in man["batch_ids"]:
        return None  # already committed — replay no-op
    cents = man["codebook"]
    seg = _write_segment(
        batch, index_dir, batch_id, cents, id_col, vec_col
    )
    if fail_after == "segment":
        raise RuntimeError("injected: died after segment write")
    version = _write_version(
        index_dir, cents, man["segments"] + [seg],
        man["batch_ids"] + [batch_id],
    )
    if fail_after == "manifest":
        raise RuntimeError("injected: died after manifest write")
    _flip_current(index_dir, version)
    return version


def rebuild(
    corpus: DataFrame,
    index_dir: str,
    id_col: str,
    vec_col: str,
    n_lists: int,
    rebuild_id: str,
    fail_after: str | None = None,
) -> str:
    """Codebook retrain + full re-encode into a FRESH segment set,
    published as one atomic pointer flip — serving stays on the old
    codebook/segments until the flip (old codes never mix with the
    new codebook)."""
    cents = ivf_centroids_det(corpus, id_col, vec_col, n_lists)
    if fail_after == "codebook":
        raise RuntimeError("injected: died after codebook retrain")
    seg = _write_segment(
        corpus, index_dir, f"rebuild_{rebuild_id}", cents, id_col, vec_col
    )
    if fail_after == "segment":
        raise RuntimeError("injected: died after segment rewrite")
    version = _write_version(
        index_dir, cents, [seg], [f"rebuild_{rebuild_id}"]
    )
    if fail_after == "manifest":
        raise RuntimeError("injected: died after manifest write")
    _flip_current(index_dir, version)
    return version


def read_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The serving read: union of the CURRENT manifest's immutable
    segments — never sees uncommitted segments or unflipped versions."""
    man = read_manifest(index_dir)
    if man is None:
        raise ValueError(f"no published index in {index_dir}")
    df = None
    for seg in man["segments"]:
        part = spark.read.parquet(seg)
        df = part if df is None else df.unionByName(part)
    return df


def serving_codebook(index_dir: str) -> list[list[int]]:
    man = read_manifest(index_dir)
    if man is None:
        raise ValueError(f"no published index in {index_dir}")
    return man["codebook"]


def vacuum_orphans(index_dir: str) -> list[str]:
    """Remove segments referenced by NO version manifest (crash
    leftovers). Safe: every readable version keeps its segments."""
    vdir = _versions_dir(index_dir)
    referenced: set[str] = set()
    if os.path.isdir(vdir):
        for f in os.listdir(vdir):
            if f.startswith("v") and f.endswith(".json"):
                with open(os.path.join(vdir, f)) as fh:
                    referenced.update(json.load(fh)["segments"])
    removed = []
    sdir = _segments_dir(index_dir)
    if os.path.isdir(sdir):
        for name in os.listdir(sdir):
            p = os.path.join(sdir, name)
            if p not in referenced:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
    return removed
