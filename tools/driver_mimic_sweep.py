"""Driver-mimic verification sweep (the /verify recipe, scriptable).

Runs entry(spark) as a smoke check, then compares every oracle-paired
registry entry against its DuckDB oracle under the DRIVER'S session shape
(default Spark 4 builder: ANSI on, no UTC pin, no legacy confs) — not
session.get_spark. Usage:

    python tools/driver_mimic_sweep.py [--sf 0.01] [--names a,b,c] [--all-sf]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--names", default="")
    ap.add_argument("--all-sf", action="store_true")
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    import __spark_entry__ as e
    from tests.oracle_harness import compare

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry smoke"
    print(f"entry smoke OK: {len(rows)} rows", flush=True)

    qs, os_ = e.queries(), e.oracle_sql()
    names = [n for n in args.names.split(",") if n] or sorted(os_)
    sfs = ["0.001", "0.01", "0.1"] if args.all_sf else [args.sf]
    bad = []
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in names:
            t0 = time.time()
            if name in os_:
                ok, msg = compare(spark, sf_dir, name, qs[name], os_[name])
                tag = "ok" if ok else "FAIL"
            else:  # rows-only entry: the driver's weaker ≥0-rows check
                n = qs[name](spark, sf_dir).count()
                ok, msg = n >= 0, f"{name}: rows-only, {n} rows"
                tag = f"ok (rows-only, {n} rows)" if ok else "FAIL"
            print(f"[sf{sf}] {tag} {name} ({time.time() - t0:.1f}s)", flush=True)
            if not ok:
                bad.append(msg)
    print(f"TOTAL mismatches: {len(bad)} of {len(names) * len(sfs)}")
    for m in bad:
        print("FAIL", m)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
