"""Shared correctness-comparison helpers (used by tests and tools).

Canonicalizes Spark/DuckDB result sets to order-insensitive string
tables and hashes them — exact value equality is the bar (floats via
shortest roundtrip repr, so any driver-side canonicalization agrees).
"""

from __future__ import annotations

import hashlib
import math


def canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
        )
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def compare_result_sets(
    scols: list[str], srows: list[tuple], dcols: list[str], drows: list[tuple]
) -> list[str]:
    """Return a list of problems (empty = match)."""
    problems: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(dcols)}")
    if not problems and table_hash(scols, srows) != table_hash(dcols, drows):
        sset = {tuple(canon_value(v) for v in r) for r in srows}
        dset = {tuple(canon_value(v) for v in r) for r in drows}
        problems.append(
            f"value-hash mismatch; spark-only sample: {list(sset - dset)[:3]}; "
            f"oracle-only sample: {list(dset - sset)[:3]}"
        )
    return problems
