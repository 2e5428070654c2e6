"""Perf-regression differ: compare the current BENCH_DETAIL.json against
BOTH the rolling baseline (advanced each round) and a FROZEN epoch
baseline (BENCH_EPOCH.json — pinned to the round-5 wrap detail, commit
dbd5325, and never advanced) so slow cross-round drift cannot hide
behind baseline advancement (VERDICT r6 "What's wrong" #1).

Usage: python tools/bench_diff.py [baseline.json] [current.json] [ratio]
       python tools/bench_diff.py --append-epoch [current.json]
Defaults: BENCH_BASELINE.json vs BENCH_DETAIL.json at 2.0x; the epoch
check always runs additionally against BENCH_EPOCH.json when the file
exists and the default baseline is in use. Exit 1 when any query
regressed past the ratio on EITHER baseline (new queries are listed,
not failed). To (re)record the rolling baseline:
cp BENCH_DETAIL.json BENCH_BASELINE.json. Never overwrite the epoch.
"""

from __future__ import annotations

import json
import sys

MIN_SECONDS = 1.0  # ignore noise-floor queries
DEFAULT_RATIO = 2.0  # shared with bench.py's re-measure trigger
EPOCH_PATH = "BENCH_EPOCH.json"


def diff(
    base_p: str,
    cur: dict,
    ratio: float,
    tag: str,
    remeasured: dict | None = None,
) -> int:
    try:
        base = json.load(open(base_p))["queries"]
    except FileNotFoundError:
        print(f"no baseline at {base_p}; record one with: cp BENCH_DETAIL.json {base_p}")
        return 0
    remeasured = remeasured or {}
    regressed = []
    for name, t in sorted(cur.items()):
        b = base.get(name)
        # Gate on the same-session re-measurement when bench.py took one
        # (VERDICT r8 #3): the first timing of a contended run inflates
        # untouched queries; a real regression reproduces back-to-back.
        rm = remeasured.get(name)
        if rm is not None:
            t = min(t, rm["remeasured"])
        if b is None:
            if tag == "rolling":
                print(f"NEW      {name:32s} {t:7.2f}s")
        elif t > MIN_SECONDS and b > 0 and t / b > ratio:
            regressed.append((name, b, t))
    for name, b, t in sorted(regressed, key=lambda x: -x[2] / x[1]):
        print(f"REGRESS[{tag}]  {name:32s} {b:7.2f}s -> {t:7.2f}s  ({t/b:.1f}x)")
    gone = sorted(set(base) - set(cur))
    if tag == "rolling":
        for name in gone:
            print(f"REMOVED  {name}")
    print(
        f"[{tag} vs {base_p}] {len(cur)} queries, {len(regressed)} regressed "
        f"past {ratio}x, {len(set(cur) - set(base))} new, {len(gone)} removed"
    )
    return len(regressed)


def append_epoch(cur_p: str) -> int:
    """Append-only epoch extension (VERDICT r7 #5): queries added after
    the r5 epoch pin have no frozen anchor and diff only against the
    in-round-advanced rolling baseline. On wrap, append any query
    ABSENT from the epoch file with its current (idle-machine)
    measurement; NEVER overwrite an existing epoch row."""
    detail = json.load(open(cur_p))
    cur = dict(detail["queries"])
    for name, rm in (detail.get("remeasured") or {}).items():
        cur[name] = min(cur[name], rm["remeasured"])
    try:
        epoch = json.load(open(EPOCH_PATH))
    except FileNotFoundError:
        print(f"no epoch at {EPOCH_PATH}; record one first with: "
              f"cp {cur_p} {EPOCH_PATH}")
        return 0
    added = 0
    for name, t in sorted(cur.items()):
        if name not in epoch["queries"]:
            epoch["queries"][name] = t
            print(f"EPOCH+   {name:32s} {t:7.2f}s")
            added += 1
    if added:
        epoch["n_queries"] = len(epoch["queries"])
        with open(EPOCH_PATH, "w") as fh:
            json.dump(epoch, fh, indent=1, sort_keys=True)
    print(f"[epoch-append] {added} new rows, epoch now {len(epoch['queries'])} queries")
    return 0


def reanchor_epoch(cur_p: str, frozen_p: str) -> int:
    """One-time tightening re-anchor (VERDICT r8 #6): the 66 post-r5
    epoch rows were seeded from the SAME close run the rolling baseline
    advanced to, making both gates momentarily identical for them.
    Given a later INDEPENDENT idle measurement, set each non-frozen row
    to the EARLIER (smaller) of (seed, re-measure) so the gate can only
    tighten; rows present in the frozen r5 pin (``frozen_p``, e.g.
    ``git show dbd5325:BENCH_EPOCH.json`` written to a temp file) are
    never touched."""
    detail = json.load(open(cur_p))
    cur = dict(detail["queries"])
    for name, rm in (detail.get("remeasured") or {}).items():
        cur[name] = min(cur[name], rm["remeasured"])
    frozen = set(json.load(open(frozen_p))["queries"])
    epoch = json.load(open(EPOCH_PATH))
    tightened = 0
    for name, t in sorted(cur.items()):
        old = epoch["queries"].get(name)
        if name in frozen or old is None:
            continue
        if t < old:
            epoch["queries"][name] = t
            print(f"EPOCH~   {name:32s} {old:7.2f}s -> {t:7.2f}s")
            tightened += 1
    epoch["provenance"] = (
        "r5 rows frozen at commit dbd5325; post-r5 rows appended at "
        "first idle measurement, then one-time tightened (min of seed "
        "and an independent later idle run) at the round-9 wrap per "
        "VERDICT r8 #6. Never loosened."
    )
    with open(EPOCH_PATH, "w") as fh:
        json.dump(epoch, fh, indent=1, sort_keys=True)
    print(f"[epoch-reanchor] {tightened} rows tightened, "
          f"{len(frozen)} frozen rows untouched")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--append-epoch":
        return append_epoch(
            sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--reanchor-epoch":
        return reanchor_epoch(
            sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json",
            sys.argv[3] if len(sys.argv) > 3 else "/tmp/epoch_r5_pin.json",
        )
    base_p = sys.argv[1] if len(sys.argv) > 1 else "BENCH_BASELINE.json"
    cur_p = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else DEFAULT_RATIO
    detail = json.load(open(cur_p))
    cur = detail["queries"]
    remeasured = detail.get("remeasured") or {}
    if remeasured:
        for name, rm in sorted(remeasured.items()):
            print(
                f"REMEASURED {name:32s} first {rm['first']:7.2f}s -> "
                f"{rm['remeasured']:7.2f}s"
            )
    n_bad = diff(base_p, cur, ratio, "rolling", remeasured)
    if base_p == "BENCH_BASELINE.json":
        import os

        if os.path.exists(EPOCH_PATH):
            n_bad += diff(EPOCH_PATH, cur, ratio, "epoch", remeasured)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
