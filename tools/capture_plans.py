#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r<N>/<name>_<tag>.txt.

Optimization-round evidence (guide §1/§7.2): the judge cannot run Spark, so
plan claims ("2 Exchange → 1", "SortMergeJoin → BroadcastHashJoin") are
checked against these committed files.

Usage:
    python tools/capture_plans.py --round 17 --tag before q1 [q2 ...]

Plan-only for MOST entries: builds each DataFrame and formats its physical
plan without executing the final query. Caveat (ADVICE r17): some builders
run REAL Spark jobs at DataFrame-build time — eager localCheckpoints
(triangle_count's edge list), driver-side seed/Lloyd collects (the
semdedup family), streaming runs (stream_neardup_gate), and the snapshot
entries' full commit sequences — so "build" can execute substantial work
and leave tracked checkpoint blocks alive until
cache.release_tracked() runs. This tool is for plan evidence, not timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_development_spark.queries import all_queries  # noqa: E402
from data_engineer_development_spark.session import get_spark  # noqa: E402


def main() -> None:
    rnd, tag = "17", "before"
    names: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--round":
            rnd = next(it)
        elif a == "--tag":
            tag = next(it)
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture_plans", cpus="4")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


if __name__ == "__main__":
    main()
