"""Pytest gate for the streaming micro-batch boundary fuzzer
(VERDICT r9 #6): 127 pinned cases across seven stateful operator
classes (running agg / exact-integer EWMA / CEP pattern / running
distinct / dedup / tumbling window agg / CDC fold), each under
seeded random micro-batch boundaries with rotating single /
late-file-restart / crash-replay modes. Stream result must equal the
batch twin exactly; a non-idempotent replay surfaces as a value
divergence (see tools/fuzz_streaming.py module doc)."""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_streaming_fuzzer_pinned_cases(spark):
    from tools.fuzz_streaming import run_all

    total, failures = run_all(spark)
    assert total == 127
    assert not failures, (
        f"{len(failures)} divergences: "
        + "; ".join(f"{c} seed={s} mode={m}" for c, s, m, _, _ in failures[:5])
    )


def test_streaming_fuzzer_smoke(spark):
    """Fast default-profile twin of the 127-case gate: seeds 0-2 of
    every operator class, which covers all three micro-batch modes
    (single / late-file-restart / crash-replay rotate by seed % 3);
    the full sweep runs under ``-m slow``."""
    from tools.fuzz_streaming import CASES, run_all

    total, failures = run_all(spark, n_per_class={c: 3 for c in CASES})
    assert total == 3 * len(CASES)
    assert not failures, (
        f"{len(failures)} divergences: "
        + "; ".join(f"{c} seed={s} mode={m}" for c, s, m, _, _ in failures[:5])
    )
