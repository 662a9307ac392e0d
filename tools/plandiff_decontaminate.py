"""Plan-diff for the `decontaminate_corpus` bimodality (VERDICT r13
"What's wrong" #1): the r4-r13 record oscillates 1.3 <-> 2.4 s on
byte-unchanged code, and isolated adjudication reproduces the SLOW
mode (~2.1-2.3 s) while some full-bench sessions record the FAST mode
(~1.3 s).  Hypothesis to test: an AQE join decision flips on the
candidate/verify frames between sessions.  Method: capture the
POST-EXECUTION AQE final plan (isFinalPlan=true) in

  * ``cold``  — fresh session + bench-identical warm-up, nothing else
    run (the adjudicate.py context that reads ~2.1-2.3 s), and
  * ``warm``  — same, but first run the bench's preceding LSH
    siblings (``dedup_corpus`` exactly as bench.py orders them), the
    context in which fast records were taken,

then normalize expression/plan ids + runtime statistics out of both
trees and diff what remains.  Identical normalized trees = host/JIT
variance, not a plan flip.  (Settled r14: plans identical across six
cold/warm sessions — SCALE.md's decontaminate_corpus adjudication.)

This is the pinned decontaminate-specific entry point; the capture /
normalize / diff machinery lives in (and is imported from) the
generic ``plandiff.py``, so the two tools cannot drift.

    python tools/plandiff_decontaminate.py [--sf-dir /root/testdata/sf0.1]
                                           [--runs 3] [--out-dir /tmp]
"""

from __future__ import annotations

import argparse
import difflib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plandiff import normalize, session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out-dir", default="/tmp")
    args = ap.parse_args()

    try:
        print(f"load1 at start: {os.getloadavg()[0]:.2f}")
    except OSError:
        pass

    results = {}
    for mode, warm_with in (("cold", None), ("warm", "dedup_corpus")):
        times, plans = session(
            "decontaminate_corpus", warm_with, args.sf_dir, args.runs
        )
        results[mode] = plans
        print(f"{mode}: times {[f'{t:.3f}' for t in times]}, min {min(times):.3f}s")
        path = os.path.join(args.out_dir, f"decontaminate_plan_{mode}.txt")
        # the LAST run's plan — the one the cold-vs-warm diff below
        # describes (writing plans[0] here while diffing plans[-1]
        # left a misleading artifact when a plan flipped in-session)
        with open(path, "w") as fh:
            fh.write(plans[-1])
        print(f"  plan -> {path}")

    # intra-session stability first (a flip WITHIN a session would be
    # the strongest signal), then cold-vs-warm
    for mode, plans in results.items():
        norm = [normalize(p) for p in plans]
        if len(set(norm)) > 1:
            print(f"!! {mode}: plan CHANGED between runs within one session")
            d = list(difflib.unified_diff(
                norm[0].splitlines(keepends=True),
                norm[-1].splitlines(keepends=True),
                f"{mode} run1", f"{mode} run{len(norm)}", n=1))
            sys.stdout.writelines(d[:60])
        else:
            print(f"{mode}: plan stable across {len(plans)} runs")

    a = normalize(results["cold"][-1]).splitlines(keepends=True)
    b = normalize(results["warm"][-1]).splitlines(keepends=True)
    diff = list(difflib.unified_diff(a, b, "cold", "warm", n=2))
    if not diff:
        print("NORMALIZED PLANS IDENTICAL (cold vs warm) — no AQE flip; "
              "the 1.3<->2.4 s oscillation is host/JIT variance")
    else:
        print(f"PLANS DIFFER (cold vs warm), {len(diff)} diff lines:")
        sys.stdout.writelines(diff[:120])


if __name__ == "__main__":
    main()
