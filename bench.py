#!/usr/bin/env python
"""Benchmark harness (driver contract, TESTDATA.md / BASELINE.md).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is timed end-to-end (logical plan build → full execution into a
noop sink — no driver-side collect, so the number reflects cluster-side work
only, the quantity that matters at 100 TB). One warm-up run of the flagship
query absorbs JVM/codegen startup so the per-query numbers are comparable
across rounds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_development_spark.cache import release_tracked  # noqa: E402
from data_engineer_development_spark.queries import all_queries  # noqa: E402
from data_engineer_development_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm-up: JVM, codegen, parquet footer caches.
    queries["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Calibration probe (VERDICT r14 #6): a pricing_summary min-of-3
    # BEFORE and AFTER the sweep, recorded into the artifact, so a
    # degraded box window is machine-detectable from the artifact alone
    # (r14's host-level degradation was adjudicated post-hoc by hand).
    # pricing_summary's idle anchor is stable across every round on
    # record; a calibration reading far above it marks the sweep
    # untrustworthy regardless of which queries it inflated.
    cal_pre = min(run_once("pricing_summary") for _ in range(3))

    # Calibration GATE (VERDICT r16 #3): a sweep on a degraded host
    # produces an artifact that needs manual adjudication row by row —
    # refuse to start instead. pricing_summary's idle-box anchor is
    # 1.31 s (BASELINE.md, stable across every round on record); a
    # pre-calibration beyond SPARK_GRAFT_CAL_LIMIT× that (default 1.5)
    # marks the host degraded. Retry a few times (host-load windows on
    # this box last minutes), then emit a machine-readable deferral as
    # the FINAL output line so the driver records the condition, not a
    # 200-row artifact that can't be graded. SPARK_GRAFT_BENCH_FORCE=1
    # overrides (the r16-style bracket-adjudicated sweep remains
    # possible, just never the silent default).
    cal_anchor = 1.31
    cal_limit = float(os.environ.get("SPARK_GRAFT_CAL_LIMIT", "1.5"))
    if (
        cal_pre > cal_limit * cal_anchor
        and os.environ.get("SPARK_GRAFT_BENCH_FORCE") != "1"
    ):
        for _ in range(3):
            time.sleep(30)
            cal_pre = min(run_once("pricing_summary") for _ in range(3))
            if cal_pre <= cal_limit * cal_anchor:
                break
        else:
            print(
                json.dumps(
                    {
                        "metric": "total_query_wall_sec",
                        "value": -1.0,
                        "unit": "sec",
                        "deferred": "degraded host",
                        "calibration_pre": round(cal_pre, 4),
                        "calibration_anchor": cal_anchor,
                        "calibration_limit": cal_limit,
                        "sf": sf,
                    }
                )
            )
            return

    # FIXED min-of-N policy (default 3): every query gets the same repeat
    # count so per-query numbers are comparable round-over-round — a
    # budget-scaled policy gave early-alphabet queries more repeats (lower
    # mins) and made r4→r5 deltas unreadable. The budget is only a safety
    # valve: repeats stop early if the whole bench nears it, and the emitted
    # JSON records the per-query run count so a degraded run is visible.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # 900 s sufficed through the 173-entry registry; at 193 entries a
    # min-of-3 sweep runs ~750 s of query wall plus per-query GC/cache
    # hygiene, so 900 s degraded the tail to min_runs=1 (r14 — degraded
    # runs are not comparable round-over-round). 2400 s keeps the valve
    # a true safety net, not the common case.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "2400"))
    start = time.perf_counter()
    timings: dict[str, float] = {}
    runs_done: dict[str, int] = {}
    failed: list[str] = []
    for name in sorted(queries):
        try:
            # the box is shared: any single run can absorb an unrelated CPU
            # burst (observed 0.5 s queries reading 60 s); the min of the
            # fixed repeat count is the reproducible number
            t = run_once(name)
            n = 1
            while n < repeats and (time.perf_counter() - start) < 0.9 * budget:
                t = min(t, run_once(name))
                n += 1
            timings[name] = round(t, 4)
            runs_done[name] = n
        except Exception as exc:  # noqa: BLE001 — one bad query ≠ no bench
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            failed.append(name)
        # Queries that cache small intermediates must not leak into the next
        # measurement — and neither must JVM garbage debt from a heavy
        # predecessor (the e2e/dedup entries leave old-gen + broadcast litter
        # that otherwise taxes every later query's timed run). Both run
        # OUTSIDE the timed section. release_tracked() frees exactly what
        # operators registered; clearCache remains as backstop for cached
        # pipeline tables.
        release_tracked()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # total = sum of SUCCESSFUL runs only; failures are listed, never summed
    # (a -1 sentinel would *reduce* the headline metric).
    cal_post = min(run_once("pricing_summary") for _ in range(3))
    payload = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "failed": failed,
        "repeats": repeats,
        "min_runs": min(runs_done.values(), default=0),
        "calibration_pre": round(cal_pre, 4),
        "calibration_post": round(cal_post, 4),
        "sf": sf,
    }
    print(json.dumps(payload))

    # The driver's BENCH_r{N}.json keeps only the LAST 2000 chars of
    # combined output, so at 200+ entries the full line above always
    # truncates mid-map and `parsed` reads null (VERDICT r15 #5; the
    # r11–r15 artifacts all end with the stderr overwrite note). The
    # COMPACT headline below is therefore printed as the FINAL line of
    # output — small enough to survive the tail whole, so the driver
    # always parses value/failed/calibration even when the per-query
    # map doesn't fit.
    headline = {
        k: payload[k]
        for k in (
            "metric", "value", "unit", "failed", "repeats", "min_runs",
            "calibration_pre", "calibration_post", "sf",
        )
    }
    headline["n_queries"] = len(timings)

    def finish(rot_round: int) -> None:
        # Rotating per-query visibility (VERDICT r16 #6): the driver
        # keeps only the LAST 2000 chars of output, so the un-rotated
        # map always exposed the same s–z span. Print the map rotated
        # to a round-dependent alphabetical offset (stride 7 walks the
        # alphabet across rounds: r17→p, r18→w, r19→d, r20→k) just
        # before the headline — the surviving tail then shows a
        # DIFFERENT span each round, headline still last and whole.
        import string

        letter = string.ascii_lowercase[(rot_round * 7) % 26]
        names = sorted(timings)
        k0 = next(
            (i for i, n in enumerate(names) if n[0] >= letter), 0
        )
        rot = names[k0:] + names[:k0]
        print(
            json.dumps(
                {
                    "rot_start": letter,
                    "queries": {n: timings[n] for n in rot},
                }
            )
        )
        print(json.dumps(headline))
        if failed:
            sys.exit(1)

    # The full per-query map also persists into the repo where it's
    # diffable round-over-round (round 7 lost 88 of 154 timings to the
    # tail truncation). Round number: $SPARK_GRAFT_ROUND if set, else
    # one past the newest driver artifact.
    here = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    inferred = rnd is None
    if inferred:
        prior = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
        ]
        rnd = str(max(prior, default=0) + 1)
    local = os.path.join(here, f"bench_local_r{int(rnd):02d}.json")
    # An INFERRED round number must never clobber a prior round's full map
    # (the driver's BENCH_r{N}.json may land before or after this run, so
    # max+1 can collide — ADVICE r8). Explicit SPARK_GRAFT_ROUND, or
    # SPARK_GRAFT_BENCH_OVERWRITE=1, is the opt-in to overwrite.
    if (
        inferred
        and os.path.exists(local)
        and os.environ.get("SPARK_GRAFT_BENCH_OVERWRITE") != "1"
    ):
        print(
            f"bench: {local} exists and round was inferred; set "
            "SPARK_GRAFT_ROUND or SPARK_GRAFT_BENCH_OVERWRITE=1 to replace",
            file=sys.stderr,
        )
        finish(int(rnd))
        return
    with open(local, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"bench: full per-query artifact -> {local}", file=sys.stderr)
    finish(int(rnd))


if __name__ == "__main__":
    main()
