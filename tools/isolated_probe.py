#!/usr/bin/env python
"""Isolated fresh-JVM re-measure of named queries at sf0.1.

The adjudication tool behind BASELINE.md's degraded-box brackets: each
named query runs in THIS process's single fresh JVM, min-of-N (default
5), bracketed by a `pricing_summary` calibration probe before and after
so a degraded window is visible in the output itself instead of being
reconstructed post-hoc (VERDICT r14 #6).

Usage:
    python tools/isolated_probe.py q1 [q2 ...] [--repeats N]

Prints one JSON line:
    {"calibration_pre": s, "calibration_post": s,
     "queries": {name: {"min": s, "runs": [..]}}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_development_spark.cache import release_tracked  # noqa: E402
from data_engineer_development_spark.queries import all_queries  # noqa: E402
from data_engineer_development_spark.session import get_spark  # noqa: E402


def main() -> None:
    repeats = 5
    args: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--repeats":
            repeats = int(next(it))
        else:
            args.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="isolated_probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # staged (not-yet-registered) candidates resolve by their builder
    # name q_<name> in any query module, so anchors can be recorded
    # before registration (the r16 staging workflow)
    from data_engineer_development_spark import queries as _qpkg

    for name in args:
        if name not in queries:
            for m in _qpkg._MODULES:
                fn = getattr(m, f"q_{name}", None)
                if fn is not None:
                    queries[name] = fn
                    break
            else:
                raise SystemExit(f"isolated_probe: unknown query {name!r}")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        release_tracked()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        return dt

    # warm-up absorbs JVM/codegen startup (same policy as bench.py)
    run_once("pricing_summary")
    cal_pre = min(run_once("pricing_summary") for _ in range(3))

    out = {}
    for name in args:
        runs = [round(run_once(name), 4) for _ in range(repeats)]
        out[name] = {"min": min(runs), "runs": runs}

    cal_post = min(run_once("pricing_summary") for _ in range(3))
    print(json.dumps({
        "calibration_pre": round(cal_pre, 4),
        "calibration_post": round(cal_post, 4),
        "queries": out,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
