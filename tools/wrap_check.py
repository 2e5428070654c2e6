"""Standing wrap gate (VERDICT r9 #1): one entry point that runs every
scale-correctness and plan gate before a round closes.

Sequence (fail-fast, nonzero exit on any failure):

1. `verify_local` at sf0.01  — the driver's gate scale (expected
   414/0/3 as of round 10);
2. `verify_local` at sf0.1   — 10× the compare scale (overflow /
   fixed-point / sketch-drift classes);
3. `verify_local` on a Zipf-skewed sf0.1 fixture — tie/collision/
   skew classes (generated via make_sf1 --zipf into --skew-dir when
   absent; generation is deterministic, so a cached fixture is
   identical);
4. `plan_audit --gate`       — full-registry single-partition-window
   bound;
5. `bench.py` + `bench_diff` — rolling AND frozen-epoch perf gates
   (skipped with --no-bench when a separate idle bench run is
   recorded, e.g. by the driver).

Run:  python tools/wrap_check.py [--skew-dir /tmp/sf0.1_zipf]
          [--no-bench] [--no-skew]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(desc: str, cmd: list[str], cwd: str = REPO) -> bool:
    print(f"== {desc}: {' '.join(cmd)}", flush=True)
    p = subprocess.run(cmd, cwd=cwd)
    ok = p.returncode == 0
    print(f"== {desc}: {'OK' if ok else f'FAIL (exit {p.returncode})'}", flush=True)
    return ok


def _verify(sf_dir: str) -> bool:
    # belt and braces: gate on BOTH the exit code and the summary line
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_local.py"), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tail = [
        ln for ln in p.stdout.replace("\r", "\n").splitlines() if " pass, " in ln
    ]
    summary = tail[-1] if tail else "(no summary)"
    ok = p.returncode == 0 and ", 0 fail," in summary
    print(f"== verify {sf_dir}: {summary} -> {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        for ln in p.stdout.replace("\r", "\n").splitlines():
            if ln.startswith("FAIL"):
                print(f"   {ln[:200]}")
    return ok


def main() -> int:
    args = sys.argv[1:]
    skew_dir = "/tmp/sf0.1_zipf"
    if "--skew-dir" in args:
        skew_dir = args[args.index("--skew-dir") + 1]
    ok = True

    ok &= _verify("/root/testdata/sf0.01")
    ok &= _verify("/root/testdata/sf0.1")

    if "--no-skew" not in args:
        if not os.path.exists(os.path.join(skew_dir, "lineitem.parquet")):
            ok &= _run(
                "generate skew fixture",
                [
                    sys.executable,
                    os.path.join(REPO, "tools", "make_sf1.py"),
                    skew_dir,
                    "10",
                    "/root/testdata/sf0.01",
                    "--zipf",
                ],
            )
        ok &= _verify(skew_dir)

    ok &= _run(
        "plan gate",
        [
            sys.executable,
            os.path.join(REPO, "tools", "plan_audit.py"),
            "/root/testdata/sf0.01",
            "--gate",
        ],
    )

    if "--no-bench" not in args:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
        print("== bench (idle, foreign cwd)", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")], cwd="/tmp", env=env
        )
        ok &= p.returncode == 0
        ok &= _run(
            "bench_diff",
            [sys.executable, os.path.join(REPO, "tools", "bench_diff.py")],
        )

    print(f"WRAP {'PASS' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
