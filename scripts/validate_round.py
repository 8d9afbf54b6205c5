"""End-of-round validation: the driver's two artifacts, run locally, timed,
failing LOUD — so a round can never again ship a red MULTICHIP artifact the
way round 4 did (VERDICT r4 weak 1: the 8-device dryrun was correct but blew
the driver's wall budget, and nobody re-ran it after the graph changed).

Run BEFORE every round ends (and after any change to the training graph,
serving graph, or global perf defaults):

    python scripts/validate_round.py            # dryrun + bench
    python scripts/validate_round.py --no-bench # dryrun only (no TPU handle)

Checks:
  1. ``__graft_entry__.dryrun_multichip(8)`` in a FRESH subprocess (matching
     how the driver invokes it), wall-clock timed against ``--budget``
     seconds (default 540 — under the driver's observed ~600 s kill window,
     with headroom for a slower driver box).
  2. ``bench.py`` on the real chip: one JSON line, ``vs_baseline >= 1.0``,
     plus the int8 quality gates bench.py itself enforces.

Exit code 0 = both green. Anything else: fix before the round ends.
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_dryrun(n_devices: int, budget_s: float) -> bool:
    code = (
        "import __graft_entry__ as g; "
        f"g.dryrun_multichip({n_devices})"
    )
    print(f"[validate] dryrun_multichip({n_devices}) (budget {budget_s:.0f}s)...",
          flush=True)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        timeout=budget_s * 2,  # hard stop well past budget so we still report
        capture_output=True,
        text=True,
    )
    wall = time.monotonic() - t0
    tail = (proc.stdout + proc.stderr)[-2000:]
    ok = proc.returncode == 0 and wall <= budget_s
    print(f"[validate] dryrun: rc={proc.returncode} wall={wall:.1f}s "
          f"{'OK' if ok else 'FAIL'}")
    if proc.returncode != 0 or not ok:
        print(tail)
    if proc.returncode == 0 and wall > budget_s:
        print(f"[validate] dryrun PASSED but took {wall:.1f}s > {budget_s:.0f}s "
              "budget — the driver WILL kill it. Shrink the compiled graph.")
    return ok


def run_bench(min_vs_baseline: float) -> bool:
    print("[validate] bench.py on the real chip...", flush=True)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, capture_output=True, text=True,
        timeout=3600,
    )
    wall = time.monotonic() - t0
    if proc.returncode != 0:
        print(f"[validate] bench: rc={proc.returncode} FAIL\n{proc.stderr[-2000:]}")
        return False
    line = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    if not line:
        print(f"[validate] bench printed no JSON line FAIL\n{proc.stdout[-2000:]}")
        return False
    rec = json.loads(line[-1])
    ok = rec.get("vs_baseline", 0.0) >= min_vs_baseline
    print(f"[validate] bench: {rec.get('value')} {rec.get('unit')} "
          f"(vs_baseline {rec.get('vs_baseline')}) wall={wall:.0f}s "
          f"{'OK' if ok else 'FAIL'}")
    print(line[-1])
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=540.0,
                    help="dryrun wall-clock budget in seconds")
    ap.add_argument("--n-devices", type=int, default=8)
    ap.add_argument("--no-bench", action="store_true",
                    help="skip the TPU bench (e.g. while another process "
                    "holds the single tunneled chip)")
    ap.add_argument("--min-vs-baseline", type=float, default=1.0)
    args = ap.parse_args()

    ok = run_dryrun(args.n_devices, args.budget)
    if not args.no_bench:
        ok = run_bench(args.min_vs_baseline) and ok
    print(f"[validate] {'ALL GREEN' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
