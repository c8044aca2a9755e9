#!/usr/bin/env python
"""Sanity-check a bench artifact before trusting/committing it.

Mechanizes the round-9 rule (BASELINE.md): never commit a sweep in which
an UNTOUCHED query jumped >1.5x vs the prior artifact — that signature is
transient box load (e.g. a pytest sweep draining when the bench started),
not a plan change, and it poisons round-over-round comparisons. Round 9's
example: lsh_candidate_recall read a phantom 5.34 s (2.33x anchor) in a
sweep started under residual load; isolated min-of-3 read 2.12 s and a
clean re-run 2.01 s.

Usage:
    python tools/bench_sanity.py [NEW.json] [PRIOR.json]

Defaults: NEW = the newest bench_local_r*.json, PRIOR = the one before it.
Checks, in order:
  1. failed list is empty and min_runs == repeats (no degraded budget run)
  2. every query vs its BASELINE.md anchor — flag ratios > 1.5x, fail > 2x
  3. every query vs the PRIOR artifact — flag jumps > 1.5x
Exit 0 = clean; exit 1 = at least one failure-level finding (the flags
print either way; a flagged-but-passing run deserves an isolated
re-measurement before the artifact is committed).
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAG_RATIO = 1.5  # vs anchor or prior: suspicious, re-measure isolated
FAIL_RATIO = 2.0  # vs anchor: the judge's hard bar


def _load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    return d


def _anchors() -> dict[str, float]:
    out: dict[str, float] = {}
    with open(os.path.join(HERE, "BASELINE.md")) as fh:
        for line in fh:
            for m in re.finditer(r"`([a-z0-9_]+)`\s*\|\s*([0-9.]+)", line):
                out[m.group(1)] = float(m.group(2))
    return out


def main() -> int:
    locals_ = sorted(
        f
        for f in os.listdir(HERE)
        if re.fullmatch(r"bench_local_r\d+\.json", f)
    )
    new_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, locals_[-1]
    )
    prior_path = sys.argv[2] if len(sys.argv) > 2 else (
        os.path.join(HERE, locals_[-2]) if len(locals_) > 1 else None
    )

    new = _load(new_path)
    q = new["queries"]
    bad = 0

    print(f"artifact: {os.path.basename(new_path)} ({len(q)} queries, "
          f"sum {sum(q.values()):.1f}s)")
    if new.get("failed"):
        print(f"FAIL: failed queries: {new['failed']}")
        bad += 1
    if new.get("min_runs") != new.get("repeats"):
        print(f"FLAG: degraded run — min_runs {new.get('min_runs')} < "
              f"repeats {new.get('repeats')} (budget valve tripped)")

    anchors = _anchors()
    # Calibration brackets (VERDICT r14 #6): bench.py records a
    # pricing_summary min-of-3 before and after the sweep; either side
    # far above the anchor marks the whole sweep machine-detectably
    # degraded — flag it as a single artifact-level finding.
    cal_anchor = anchors.get("pricing_summary")
    for side in ("calibration_pre", "calibration_post"):
        cal = new.get(side)
        if cal is not None and cal_anchor and cal / cal_anchor > FLAG_RATIO:
            print(f"FLAG: {side} {cal:.2f}s = {cal / cal_anchor:.2f}x the "
                  f"pricing_summary anchor {cal_anchor:.2f}s — the box was "
                  "degraded during this sweep; treat every flag below as "
                  "environmental until re-measured on a clean box")
    missing = sorted(set(q) - set(anchors))
    if missing:
        print(f"FLAG: {len(missing)} queries lack a BASELINE.md anchor: "
              f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
    worst: list[tuple[float, str]] = []
    for name in sorted(q):
        if name not in anchors or anchors[name] <= 0:
            continue
        r = q[name] / anchors[name]
        worst.append((r, name))
        if r > FAIL_RATIO:
            print(f"FAIL: {name} {q[name]:.2f}s = {r:.2f}x anchor "
                  f"{anchors[name]:.2f}s (judge bar is {FAIL_RATIO}x)")
            bad += 1
        elif r > FLAG_RATIO:
            print(f"FLAG: {name} {q[name]:.2f}s = {r:.2f}x anchor "
                  f"{anchors[name]:.2f}s — isolated re-measure before "
                  "committing")
    worst.sort(reverse=True)
    top = ", ".join(f"{n} {r:.2f}x" for r, n in worst[:3])
    med = sorted(r for r, _ in worst)[len(worst) // 2] if worst else 0.0
    print(f"vs anchors: median {med:.2f}x, worst {top}")

    if prior_path and os.path.exists(prior_path):
        prior_q = _load(prior_path)["queries"]
        jumps = [
            (q[n] / prior_q[n], n)
            for n in q
            if n in prior_q and prior_q[n] > 0 and q[n] / prior_q[n] > FLAG_RATIO
        ]
        for r, n in sorted(jumps, reverse=True):
            print(f"FLAG: {n} jumped {r:.2f}x vs "
                  f"{os.path.basename(prior_path)} ({prior_q[n]:.2f}s -> "
                  f"{q[n]:.2f}s) — if the query's code is untouched this "
                  "round, suspect box load; isolated re-measure")
        if not jumps:
            print(f"vs {os.path.basename(prior_path)}: no >"
                  f"{FLAG_RATIO}x jumps")

    print("RESULT:", "FAIL" if bad else "OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
