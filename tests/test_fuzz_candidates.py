"""Candidate-generator differential fuzzing gate (VERDICT r8 #7).

``tools/fuzz_candidates.py`` fuzzes the recall-critical candidate
generation of the dedup/similarity family — MinHash-LSH banding,
winnowing window selection, containment max_df posting lists, IVF
probe lists — on random corpora × random parameters against
independent pure-Python brute-force twins, asserting exact-set
equivalence AND the documented guarantees (LSH band math / Jaccard-1
pairs always candidates; the winnowing shared-run theorem; the
containment max_df visibility bound applied identically in the twin;
full-probe IVF == exact brute-force top-k).

530 pinned cases (wave 1: minhash 60, winnow 60, containment 50,
ivf 40; wave 2: incremental-LSH 40, simhash 40, jaccard 40,
sorted-neighborhood 40; wave 3 — the join-shape rewrites the round-9
skew fixes ride on: keyed/keyless binned interval join 50, band join
40, asof join 40; wave 4: bradley_terry 30, fixed-point MM vs the
python twin incl. dominant/zero-win/tiny profiles — each vs an exact
brute-force twin).
Reproduce one standalone:
``python tools/fuzz_candidates.py --family <name> --case <i>``
"""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
    ),
)

from fuzz_candidates import (  # noqa: E402
    families,
    gen_corpus,
    run_fuzz,
    twin_winnow_fps,
)


def test_corpus_generation_is_seed_pinned():
    for fam in families():
        for i in (0, 5):
            a = gen_corpus(random.Random(f"s:{fam}:{i}"), run_len=6)
            b = gen_corpus(random.Random(f"s:{fam}:{i}"), run_len=6)
            assert a == b


def test_winnow_twin_hand_case():
    # words w0 w1 w0 w1 w0, k=2 -> grams [w0 w1, w1 w0, w0 w1, w1 w0];
    # w=2 windows -> mins over consecutive gram-hash pairs
    fps = twin_winnow_fps("w0 w1 w0 w1 w0", k=2, w=2)
    import hashlib

    h = {
        g: int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
        for g in ("w0 w1", "w1 w0")
    }
    assert fps == {min(h["w0 w1"], h["w1 w0"])}


@pytest.mark.slow
def test_candidate_fuzz_530_cases_no_divergence(spark):
    n_pass, failures = run_fuzz(spark, seed="candfuzz-r9")
    msg = "\n".join(f"{f}#{i}: {p}" for f, i, p in failures[:8])
    assert not failures, f"{len(failures)} divergences:\n{msg}"
    assert n_pass == 530


def test_candidate_fuzz_smoke(spark):
    """Fast default-profile twin of the 530-case gate: the first two
    seed-pinned cases of EVERY family vs the same brute-force twins;
    the full sweep runs under ``-m slow``."""
    n_pass, failures = run_fuzz(spark, seed="candfuzz-r9", n_override=2)
    msg = "\n".join(f"{f}#{i}: {p}" for f, i, p in failures[:8])
    assert not failures, f"{len(failures)} divergences:\n{msg}"
    assert n_pass == 2 * len(families())
