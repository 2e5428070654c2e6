"""Perf-regression differ: compare the current BENCH_DETAIL.json against
a baseline snapshot and flag per-query slowdowns.

Usage: python tools/bench_diff.py [baseline.json] [current.json] [ratio]
Defaults: BENCH_BASELINE.json vs BENCH_DETAIL.json at 2.0x. Exit 1 when
any query regressed past the ratio (new queries are listed, not failed).
To (re)record the baseline: cp BENCH_DETAIL.json BENCH_BASELINE.json.
"""

from __future__ import annotations

import json
import sys

MIN_SECONDS = 1.0  # ignore noise-floor queries


def main() -> int:
    base_p = sys.argv[1] if len(sys.argv) > 1 else "BENCH_BASELINE.json"
    cur_p = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    try:
        base = json.load(open(base_p))["queries"]
    except FileNotFoundError:
        print(f"no baseline at {base_p}; record one with: cp {cur_p} {base_p}")
        return 0
    cur = json.load(open(cur_p))["queries"]
    regressed = []
    for name, t in sorted(cur.items()):
        b = base.get(name)
        if b is None:
            print(f"NEW      {name:32s} {t:7.2f}s")
        elif t > MIN_SECONDS and b > 0 and t / b > ratio:
            regressed.append((name, b, t))
    for name, b, t in sorted(regressed, key=lambda x: -x[2] / x[1]):
        print(f"REGRESS  {name:32s} {b:7.2f}s -> {t:7.2f}s  ({t/b:.1f}x)")
    gone = sorted(set(base) - set(cur))
    for name in gone:
        print(f"REMOVED  {name}")
    print(
        f"{len(cur)} queries, {len(regressed)} regressed past {ratio}x, "
        f"{len(set(cur) - set(base))} new, {len(gone)} removed"
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
