"""Gate TTL semantics audit (VERDICT r10 #7): quantify the recall impact
of PROCESSING-TIME idle-bucket eviction on the streaming near-dup gate
under an out-of-order replay.

Pure-python/numpy mirror of the gate's arrival-order greedy, using the
engine's exact quantizer + md5 hyperplane family (same construction as
tests/test_streaming._banded_gate_mirror), extended with:
  * an ARRIVAL ORDER (id order = in-order ingest; md5-shuffled order =
    a replay/backfill whose processing order is decoupled from event
    time), and
  * the gate's TTL model: per-(table, bucket) state is cleared when the
    gap between consecutive arrivals into that bucket exceeds ttl
    (idle-bucket eviction re-armed on every arrival — exactly
    state.setTimeoutDuration's semantics, with processing time measured
    in arrival ticks: one vector per tick, i.e. uniform ingest rate).

Metric: fraction of the exact quantized truth-set pairs (cosine >= tau)
DETECTED — the earlier-arriving side still in a shared bucket's state
when the later side arrives. ttl=None reproduces the no-TTL gate, whose
detection set is exactly "shares a bucket in >= 1 table" (arrival order
does not matter without eviction — pinned by the audit itself).

Usage: python tools/gate_ttl_audit.py [--sf 0.01] [--planes 2] [--tables 1,2]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_development_spark.functions.portable_hash import (  # noqa: E402
    hyperplane,
)


def load_rows(sf: str):
    import duckdb

    return duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"'/root/testdata/sf{sf}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()


def quantize(rows, dims):
    qvs = {}
    for vid, v in rows:
        if len(v) != dims:
            continue
        mx = max(abs(float(x)) for x in v)
        qv = (
            [0] * dims
            if mx == 0.0
            else [math.floor(float(x) * 127.0 / mx + 0.5) for x in v]
        )
        if sum(q * q for q in qv) > 0:
            qvs[vid] = np.array(qv, dtype=np.int64)
    return qvs


def truth_pairs(qvs, tau):
    ids = sorted(qvs)
    M = np.vstack([qvs[i] for i in ids])
    qn = (M * M).sum(axis=1)
    cos = (M @ M.T).astype(np.float64) / np.sqrt(
        np.outer(qn, qn).astype(np.float64)
    )
    return {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if cos[i, j] >= tau
    }


def buckets_for(raw_by_id, vid, planes, tables, dims):
    out = []
    for t in range(tables):
        b = 0
        for p in range(planes):
            w = hyperplane(t * planes + p, dims)
            acc = 0.0
            for x, wi in zip(raw_by_id[vid], w):
                acc += float(x) * wi  # left fold, engine order
            if acc >= 0:
                b |= 1 << p
        out.append(b)
    return out


def detected_pairs(order, bk, qvs, tau, ttl, tables):
    """Arrival-order replay with idle-bucket TTL eviction (in ticks)."""
    state: dict = {}  # (t, bucket) -> (last_tick, [vids])
    det = set()
    for tick, vid in enumerate(order):
        for t in range(tables):
            key = (t, bk[vid][t])
            last, members = state.get(key, (None, []))
            if ttl is not None and last is not None and tick - last > ttl:
                members = []  # idle eviction clears the bucket's seen-set
            for m in members:
                a, b = qvs[m], qvs[vid]
                cos = float(a @ b) / math.sqrt(
                    float((a @ a)) * float(b @ b)
                )
                if cos >= tau:
                    det.add((min(m, vid), max(m, vid)))
            members = members + [vid]
            state[key] = (tick, members)
    return det


def detected_pairs_event_ttl(order, bk, qvs, tau, ttl, tables, delay):
    """Event-time TTL mirror (BASELINE.md round-11 event-TTL table):
    event time = vec_id; the watermark is max event time SEEN so far −
    delay (Spark's global watermark, advancing after each arrival); a
    bucket is evicted at data arrival when the watermark has passed its
    max seen event time + ttl — exactly the kernel's self-expiry rule
    (streaming/stateful.make_neardup_gate_update(event_ttl_ms=...)).
    With delay ≥ the stream's event-time disorder this is DETERMINISTIC:
    identical detection sets for any processing order."""
    import math

    state: dict = {}
    det = set()
    wm = -(10**9)
    for vid in order:
        for t in range(tables):
            key = (t, bk[vid][t])
            max_ets, members = state.get(key, (None, []))
            if max_ets is not None and wm > max_ets + ttl:
                members, max_ets = [], None
            for m in members:
                a, b = qvs[m], qvs[vid]
                cos = float(a @ b) / math.sqrt(float(a @ a) * float(b @ b))
                if cos >= tau:
                    det.add((min(m, vid), max(m, vid)))
            members = members + [vid]
            max_ets = vid if max_ets is None else max(max_ets, vid)
            state[key] = (max_ets, members)
        wm = max(wm, vid - delay)
    return det


def window_shuffle(ids, w):
    """Deterministic replay with event-time disorder bounded by ``w``:
    md5-shuffle within consecutive windows of w ids."""
    import hashlib

    out = []
    for lo in range(0, len(ids), w):
        blk = sorted(
            ids[lo : lo + w],
            key=lambda v: hashlib.md5(str(v).encode()).hexdigest(),
        )
        out.extend(blk)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--planes", type=int, default=2)
    ap.add_argument("--tables", default="1,2")
    ap.add_argument("--tau", type=float, default=0.4)
    ap.add_argument("--dims", type=int, default=64)
    ap.add_argument("--event", action="store_true",
                    help="also print the event-TTL table (disorder-bounded "
                         "window shuffle, delay = disorder bound W)")
    ap.add_argument("--disorder", type=int, default=50)
    args = ap.parse_args()

    rows = load_rows(args.sf)
    qvs = quantize(rows, args.dims)
    raw_by_id = {vid: v for vid, v in rows if vid in qvs}
    truth = truth_pairs(qvs, args.tau)
    n = len(qvs)
    print(f"sf{args.sf}: {n} usable vectors, {len(truth)} truth pairs")

    in_order = sorted(qvs)
    replay = sorted(  # deterministic md5 shuffle = out-of-order replay
        qvs, key=lambda v: hashlib.md5(str(v).encode()).hexdigest()
    )
    ttls = [None, n, n // 2, n // 4, n // 8, n // 16, n // 32]
    for tables in [int(x) for x in args.tables.split(",")]:
        bk = {
            vid: buckets_for(raw_by_id, vid, args.planes, tables, args.dims)
            for vid in qvs
        }
        n_buckets = tables * (1 << args.planes)
        print(f"\nplanes={args.planes} tables={tables} "
              f"(~{n / (1 << args.planes):.0f} arrivals/bucket-gap unit)")
        print("ttl_ticks | recall in-order | recall replay")
        for ttl in ttls:
            r_in = len(detected_pairs(in_order, bk, qvs, args.tau, ttl, tables))
            r_rp = len(detected_pairs(replay, bk, qvs, args.tau, ttl, tables))
            label = "none" if ttl is None else str(ttl)
            print(f"{label:>9} | {r_in / len(truth):.4f} | "
                  f"{r_rp / len(truth):.4f}")
        _ = n_buckets
        if args.event:
            W = args.disorder
            rp_w = window_shuffle(in_order, W)
            print(f"event-TTL (disorder<=W={W}, delay=W):")
            print("ttl_ticks | recall in-order | recall replay")
            for ttl in [t for t in ttls if t is not None]:
                e_in = len(detected_pairs_event_ttl(
                    in_order, bk, qvs, args.tau, ttl, tables, W))
                e_rp = len(detected_pairs_event_ttl(
                    rp_w, bk, qvs, args.tau, ttl, tables, W))
                print(f"{ttl:>9} | {e_in / len(truth):.4f} | "
                      f"{e_rp / len(truth):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
