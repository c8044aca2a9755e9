"""Property-based tests (hypothesis) for the deterministic kernels.

These pin the invariants the oracle-parity machinery RELIES on but can
only spot-check: the portable 60-bit md5 hash must agree between Python,
DuckDB SQL, and Spark SQL for arbitrary inputs (every sketch/salt/sample
operator builds on it), and the pure-numpy media codecs must roundtrip
arbitrary pixel/sample payloads bit-exactly (the multimodal entries hash
their decoded output).
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineer_development_spark.functions.portable_hash import (
    duck_md5_int,
    spark_md5_int,
)
from data_engineer_development_spark.operators.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def _py_md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# printable ASCII without quotes/backslash (they'd need SQL escaping the
# production call sites never face: inputs there are hex digests and keys)
_SAFE_TEXT = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, blacklist_characters="'\\\""
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(_SAFE_TEXT)
def test_portable_hash_python_equals_duckdb(s):
    con = duckdb.connect()
    got = con.execute(f"SELECT {duck_md5_int(f_sql(s))}").fetchone()[0]
    con.close()
    assert got == _py_md5_int(s)


def f_sql(s: str) -> str:
    return "'" + s + "'"


@settings(max_examples=10, deadline=None)
@given(st.lists(_SAFE_TEXT, min_size=1, max_size=20, unique=True))
def test_portable_hash_spark_equals_python(spark, ss):
    df = spark.createDataFrame([(x,) for x in ss], "s string")
    rows = df.selectExpr("s", f"{spark_md5_int('s')} AS h").collect()
    for r in rows:
        assert r["h"] == _py_md5_int(r["s"]), r["s"]


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_ppm_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=500),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_wav_roundtrip(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=n, dtype=np.int16)
    decoded, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert decoded.shape == (n, 1)  # decode contract: (frames, channels)
    assert np.array_equal(decoded[:, 0], samples)


def _ref_ahash_words(px: np.ndarray, grid: int = 8) -> tuple[int, int]:
    """Independent aHash reference (same math, different code path)."""
    p = px.astype(np.int64)
    luma = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    h, w = luma.shape
    bh, bw = h // grid, w // grid
    blocks = luma.reshape(grid, bh, grid, bw).sum(axis=(1, 3)) // (bh * bw)
    mean = int(blocks.sum()) // (grid * grid)
    bits = (blocks > mean).ravel()
    lo = sum(1 << k for k in range(32) if bits[k])
    hi = sum(1 << k for k in range(32) if bits[32 + k])
    return hi, lo


@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([8, 16, 24]),
)
@settings(max_examples=25, deadline=None)
def test_ahash_properties(seed, side):
    """aHash invariants on random images: (a) encode→decode→hash equals
    the independent pixel-space reference; (b) never all 64 bits set (the
    minimum block can't strictly exceed the mean — floor-division bias CAN
    push more than half the blocks above it, so half is NOT a bound);
    (c) hash is invariant to a constant brightness shift that doesn't clip
    (mean shifts with the pixels)."""
    from data_engineer_development_spark.operators.codecs import (
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    # headroom 64 so the +32 brightness shift below cannot clip
    px = rng.integers(0, 192, size=(side, side, 3), dtype=np.uint8)
    hi, lo = _ref_ahash_words(decode_ppm(encode_ppm(px)))
    assert (hi, lo) == _ref_ahash_words(px)
    n_bits = bin(hi).count("1") + bin(lo).count("1")
    assert n_bits <= 63  # the min block is never strictly above the mean
    shifted = (px.astype(np.int64) + 32).astype(np.uint8)
    assert _ref_ahash_words(shifted) == (hi, lo)


# ---------------------------------------------------------------------------
# Inference kernel: int8 max-abs quantization + BIGINT dot product
# (operators/inference.py / the _SCORED_CTE in queries/corpus_ops.py).
# The oracle-parity sweep proves Spark == DuckDB on the fixture embeddings;
# this pins the DuckDB expression == pure-Python semantics for ARBITRARY
# float32 vectors and integer weights, so the shared CTE can't drift from
# the documented math (floor(x*127/maxabs + 0.5), exact integer dot).
# ---------------------------------------------------------------------------
_F32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=32,
)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(2, 12).flatmap(
        lambda n: st.tuples(
            st.lists(_F32, min_size=n, max_size=n),
            st.lists(st.integers(-10, 10), min_size=n, max_size=n),
        )
    )
)
def test_quantized_dot_duckdb_equals_python(vec_w):
    vec, w = vec_w
    vec32 = [float(np.float32(x)) for x in vec]
    mx = max(abs(x) for x in vec32)
    q = [
        0 if mx == 0.0 else int(np.floor(x * 127.0 / mx + 0.5))
        for x in vec32
    ]
    expect = sum(qj * wj for qj, wj in zip(q, w))

    vec_sql = "[" + ", ".join(repr(x) for x in vec32) + "]"
    w_sql = "[" + ", ".join(str(x) for x in w) + "]"
    con = duckdb.connect()
    got = con.execute(f"""
        WITH m AS (SELECT CAST({vec_sql} AS FLOAT[]) AS embedding,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(CAST({vec_sql} AS FLOAT[]),
                                      x -> abs(CAST(x AS DOUBLE)))),
                       (a, v) -> greatest(a, v)) AS mx),
        q AS (SELECT generate_subscripts(embedding, 1) AS dim,
                     unnest(list_transform(embedding, x -> CAST(
                         CASE WHEN mx = 0.0 THEN 0.0
                              ELSE floor(CAST(x AS DOUBLE) * 127.0 / mx + 0.5)
                         END AS BIGINT))) AS qv
              FROM m),
        w AS (SELECT CAST({w_sql} AS BIGINT[]) AS wv)
        SELECT CAST(SUM(qv * wv[dim]) AS BIGINT) FROM q, w
    """).fetchone()[0]
    con.close()
    assert got == expect, (vec32, w, got, expect)


# ---------------------------------------------------------------------------
# SemDeDup pair math: the numpy cell kernel (operators/similarity.semdedup)
# and the DuckDB oracle (_semdedup_sql) must compute the IDENTICAL quantized
# cosine for arbitrary float32 vectors — int64 dot is exact in both, the
# cast to double is exact (|dot| ≤ dims·127² < 2⁵³), and sqrt/divide are
# correctly-rounded IEEE ops on identical inputs. This pins the claim for
# vectors far outside the fixture distribution.
# ---------------------------------------------------------------------------
@settings(max_examples=60, deadline=None)
@given(
    st.integers(2, 12).flatmap(
        lambda n: st.tuples(
            st.lists(_F32, min_size=n, max_size=n),
            st.lists(_F32, min_size=n, max_size=n),
        )
    )
)
def test_semdedup_quantized_cosine_duckdb_equals_numpy(pair):
    from hypothesis import assume

    def quant(vec):
        vec32 = [float(np.float32(x)) for x in vec]
        mx = max(abs(x) for x in vec32)
        return np.array(
            [0 if mx == 0.0 else int(np.floor(x * 127.0 / mx + 0.5))
             for x in vec32],
            dtype=np.int64,
        )

    qa, qb = quant(pair[0]), quant(pair[1])
    na, nb = int(qa @ qa), int(qb @ qb)
    assume(na > 0 and nb > 0)  # zero-norm vectors are filtered upstream
    # the kernel's exact expression shape: int64 dot → float64 → sqrt ratio
    got_np = float(
        np.float64(int(qa @ qb)) / np.sqrt(np.float64(na) * np.float64(nb))
    )

    dims = len(qa)
    a_sql = "[" + ", ".join(repr(float(np.float32(x))) for x in pair[0]) + "]"
    b_sql = "[" + ", ".join(repr(float(np.float32(x))) for x in pair[1]) + "]"
    qz = (
        "list_transform(CAST({v} AS FLOAT[]), x -> CAST("
        " CASE WHEN mx{t} = 0.0 THEN 0.0"
        "      ELSE floor(CAST(x AS DOUBLE) * 127.0 / mx{t} + 0.5) END"
        " AS BIGINT))"
    )
    mx = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(CAST({v} AS FLOAT[]), x -> abs(CAST(x AS DOUBLE)))),"
        " (a, v) -> greatest(a, v))"
    )
    con = duckdb.connect()
    got_duck = con.execute(f"""
        WITH m AS (SELECT {mx.format(v=a_sql)} AS mxa,
                          {mx.format(v=b_sql)} AS mxb),
        q AS (SELECT {qz.format(v=a_sql, t='a')} AS qa,
                     {qz.format(v=b_sql, t='b')} AS qb
              FROM (SELECT mxa AS mxa, mxb AS mxb FROM m)),
        n AS (SELECT qa, qb,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(qa, x -> x * x)), (a, x) -> a + x) AS na,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(qb, x -> x * x)), (a, x) -> a + x) AS nb
              FROM q)
        SELECT CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, {dims}),
                                  i -> qa[i] * qb[i])),
                   (a, x) -> a + x) AS DOUBLE)
               / sqrt(CAST(na * nb AS DOUBLE))
        FROM n
    """).fetchone()[0]
    con.close()
    # bit-identical, not approximately equal
    assert got_duck == got_np, (pair, got_duck, got_np)


# ---------------------------------------------------------------------------
# asof_join vs DuckDB's native ASOF LEFT JOIN: arbitrary keys/times and
# NULLABLE multi-column payloads (the struct-fill regression surface — a
# per-column fill tears rows / leaks older values through NULLs).
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 40)),
        min_size=1, max_size=12,
    ),
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 40),
            st.one_of(st.none(), st.integers(-5, 5)),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=0, max_size=12,
        unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_join_equals_duckdb_asof(spark, lrows, rrows):
    from data_engineer_development_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
        "k string, t int, lid int",
    )
    right = spark.createDataFrame(
        rrows, "k string, rt int, p int, q int"
    ) if rrows else spark.createDataFrame([], "k string, rt int, p int, q int")
    got = sorted(
        (r["lid"], r["p"], r["q"])
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_payload=["p", "q"],
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k VARCHAR, t INT, lid INT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)",
                    [(k, t, i) for i, (k, t) in enumerate(lrows)])
    con.execute("CREATE TABLE r (k VARCHAR, rt INT, p INT, q INT)")
    if rrows:
        con.executemany("INSERT INTO r VALUES (?, ?, ?, ?)", rrows)
    want = sorted(tuple(row) for row in con.execute(
        "SELECT l.lid, r.p, r.q FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.t >= r.rt"
    ).fetchall())
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# connected_components vs a reference union-find: arbitrary small graphs
# (self-loops, duplicate/reversed edges, singletons, edges to a shared hub).
# The operator's min-label propagation + pointer jumping + singleton union
# must agree with the textbook algorithm on every graph shape.
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None)
@given(
    st.integers(1, 14),
    st.lists(
        st.tuples(st.integers(0, 13), st.integers(0, 13)),
        min_size=0, max_size=20,
    ),
)
def test_connected_components_equals_union_find(spark, n_nodes, raw_edges):
    from data_engineer_development_spark.operators.graph import (
        connected_components,
    )

    # keep only edges between existing nodes (ids 0..n_nodes-1)
    edges = [(a, b) for a, b in raw_edges if a < n_nodes and b < n_nodes]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component — the operator's cluster_id contract
    want = {}
    roots = {}
    for v in range(n_nodes):
        r = find(v)
        roots.setdefault(r, []).append(v)
    for members in roots.values():
        m = min(members)
        for v in members:
            want[v] = m

    nodes_df = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    edges_df = (
        spark.createDataFrame(edges, "id1 long, id2 long")
        if edges
        else spark.createDataFrame([], "id1 long, id2 long")
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# scd2_apply vs a reference implementation: arbitrary active/update
# snapshots with NULL attrs (the eqNullSafe surface), overlapping and
# disjoint key sets. Invariants: history untouched, exactly one open row
# per surviving key, changed keys close at eff and reopen with new attrs.
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.one_of(st.none(), st.integers(0, 3))),
        min_size=0, max_size=8, unique_by=lambda r: r[0],
    ),
    st.lists(
        st.tuples(st.integers(0, 8), st.one_of(st.none(), st.integers(0, 3))),
        min_size=0, max_size=8, unique_by=lambda r: r[0],
    ),
)
def test_scd2_apply_equals_reference(spark, actives, updates):
    import datetime

    from data_engineer_development_spark.operators.scd import scd2_apply

    eff = datetime.date(2024, 6, 1)
    vf = datetime.date(2024, 1, 1)
    hist = [(99, 7, datetime.date(2023, 1, 1), datetime.date(2023, 6, 1))]
    cur = spark.createDataFrame(
        hist + [(k, a, vf, None) for k, a in actives],
        "k int, attr int, valid_from date, valid_to date",
    )
    upd = (
        spark.createDataFrame(updates, "k int, attr int")
        if updates
        else spark.createDataFrame([], "k int, attr int")
    )
    def keyfn(r):  # None-safe total order per position
        return tuple((x is None, 0 if x is None else x) for x in r)

    got = sorted(
        (
            (r["k"], r["attr"], r["valid_from"], r["valid_to"])
            for r in scd2_apply(
                cur, upd, key="k", attrs=["attr"],
                effective_date="2024-06-01",
            ).collect()
        ),
        key=keyfn,
    )

    umap = dict(updates)
    want = list(hist)
    for k, a in actives:
        if k in umap and umap[k] != a:  # None == None matches eqNullSafe
            want.append((k, a, vf, eff))
            want.append((k, umap[k], eff, None))
        else:
            want.append((k, a, vf, None))
    akeys = {k for k, _ in actives}
    for k, u in updates:
        if k not in akeys:
            want.append((k, u, eff, None))
    assert got == sorted(want, key=keyfn)


# ---------------------------------------------------------------------------
# range_join vs reference half-open BETWEEN semantics: integer points and
# intervals — negatives (long-cast truncates toward zero, NOT floor, so
# bins differ from floor-division bins there; correctness must hold anyway
# because truncation is monotonic), boundary equality (p == s included,
# p == e excluded), empty/reversed intervals, spans across many bins, and
# varying bin widths.
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(-200, 200), min_size=0, max_size=15),
    st.lists(
        st.tuples(st.integers(-200, 200), st.integers(-200, 200)),
        min_size=0,
        max_size=8,
    ),
    st.sampled_from([1, 7, 32, 100]),
)
def test_range_join_equals_reference_between(spark, points, raw_ivals, bin_w):
    from data_engineer_development_spark.operators.joins import range_join

    ivals = [(i, s, e) for i, (s, e) in enumerate(raw_ivals)]
    left = (
        spark.createDataFrame(
            [(i, p) for i, p in enumerate(points)], "pid long, p long"
        )
        if points
        else spark.createDataFrame([], "pid long, p long")
    )
    intervals = (
        spark.createDataFrame(ivals, "iid long, s long, e long")
        if ivals
        else spark.createDataFrame([], "iid long, s long, e long")
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            left, "p", intervals, "s", "e", bin_width=bin_w
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, p in enumerate(points)
        for iid, s, e in ivals
        if s <= p < e
    )
    assert got == want


# ---------------------------------------------------------------------------
# salted_join ≡ plain inner join on every input: hot keys, keys missing on
# either side, NULL join keys (dropped by both), and NULL row_salt values
# (a hash of a NULL column — must NOT silently drop a matching fact row;
# pinned to bucket 0 by the coalesce guard).
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.one_of(st.none(), st.integers(-100, 100)),
        ),
        min_size=0,
        max_size=15,
    ),
    st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.integers(0, 9)),
        min_size=0,
        max_size=8,
        unique_by=lambda r: r[0],
    ),
)
def test_salted_join_equals_plain_inner(spark, frows, drows):
    from pyspark.sql import functions as F

    from data_engineer_development_spark.operators.joins import salted_join

    fact = (
        spark.createDataFrame(
            [(i, k, s) for i, (k, s) in enumerate(frows)],
            "fid int, fk int, seed int",
        )
        if frows
        else spark.createDataFrame([], "fid int, fk int, seed int")
    )
    dim = (
        spark.createDataFrame(drows, "dk int, dval int")
        if drows
        else spark.createDataFrame([], "dk int, dval int")
    )
    got = sorted(
        (r["fid"], r["dval"])
        for r in salted_join(
            fact, dim, "fk", "dk", row_salt=F.xxhash64("seed"), salt_buckets=4
        ).collect()
    )
    dmap = {k: v for k, v in drows if k is not None}
    want = sorted(
        (i, dmap[k])
        for i, (k, _) in enumerate(frows)
        if k is not None and k in dmap
    )
    assert got == want


# ---------------------------------------------------------------------------
# Banded near-dup gate oracle vs the pure-numpy mirror of the banded batch
# greedy, on ADVERSARIAL corpora (scaled/perturbed copies force cosines
# near and above tau; zero vectors and wrong widths must be excluded
# identically). Spark-e2e == oracle is pinned on the fixture
# (tests/test_streaming.py); this closes the triangle oracle == mirror on
# arbitrary inputs, so all three implementations share one semantics.
# ---------------------------------------------------------------------------
_F32_SMALL = st.floats(
    min_value=-8.0, max_value=8.0, allow_nan=False, allow_infinity=False,
    width=32,
)


@st.composite
def _gate_corpus(draw):
    dims = 64
    n_bases = draw(st.integers(1, 3))
    bases = [
        draw(st.lists(_F32_SMALL, min_size=dims, max_size=dims))
        for _ in range(n_bases)
    ]
    n_rows = draw(st.integers(0, 9))
    rows = []
    for i in range(n_rows):
        kind = draw(st.integers(0, 9))
        if kind == 0:
            rows.append((i, [0.0] * dims))          # zero → excluded
        elif kind == 1:
            rows.append((i, [1.0] * (dims - 1)))     # wrong width → excluded
        else:
            b = list(bases[draw(st.integers(0, n_bases - 1))])
            scale = draw(
                st.floats(min_value=-4.0, max_value=4.0,
                          allow_nan=False, width=32)
            )
            v = [float(np.float32(x * scale)) for x in b]
            if draw(st.booleans()):                  # perturb one coord
                j = draw(st.integers(0, dims - 1))
                v[j] = float(np.float32(v[j] + draw(_F32_SMALL)))
            rows.append((i, v))
    return rows


@settings(max_examples=15, deadline=None)
@given(_gate_corpus())
def test_banded_gate_oracle_equals_mirror(rows):
    from data_engineer_development_spark.queries.similarity import (
        _GATE_PLANES,
        _GATE_TABLES,
        _SD_TAU,
        _STREAM_NDGATE_BANDED_SQL,
    )
    from tests.test_streaming import _banded_gate_mirror

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])"
    )
    for vid, v in rows:
        con.execute(
            "INSERT INTO embeddings VALUES (?, ?)", [vid, list(v)]
        )
    got = {
        int(r[0]): (int(r[2]), None if r[1] is None else int(r[1]))
        for r in con.execute(_STREAM_NDGATE_BANDED_SQL).fetchall()
    }
    con.close()

    exp = _banded_gate_mirror(
        rows, planes=_GATE_PLANES, tables=_GATE_TABLES, tau=_SD_TAU, dims=64
    )
    assert got == {k: (a, d) for k, (a, d) in exp.items()}


# ---------------------------------------------------------------------------
# Lloyd integer mean (VERDICT r10 watchlist #1): the per-dimension rounded
# integer mean floor(s/n + 0.5) must be EXACT unconditionally — the operator
# computes it as the integer floor division (2s+n) // (2n) in Python
# (operators/similarity._lloyd_rounds) and the oracle as the same division
# with DuckDB's truncate-toward-zero // pre-shifted for negative numerators
# (queries/similarity._sd_ctes). This pins Python == DuckDB == the exact
# rational floor(s/n + 1/2) for sums FAR beyond the 2^53 float ceiling where
# the old math.floor(s/n + 0.5) silently mis-rounded.
# ---------------------------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.integers(-(2**61), 2**61),        # the >2^53 regime the fix buys
        st.integers(-(10**6), 10**6),         # the dense small regime
    ),
    st.integers(1, 10**9),
)
def test_lloyd_integer_mean_exact_across_engines(s, n):
    from fractions import Fraction

    import math

    exact = math.floor(Fraction(s, n) + Fraction(1, 2))
    py = (2 * s + n) // (2 * n)  # the operator's expression
    assert py == exact, (s, n, py, exact)

    con = duckdb.connect()
    got = con.execute(
        f"SELECT (2 * CAST({s} AS BIGINT) + {n}"
        f" - CASE WHEN 2 * CAST({s} AS BIGINT) + {n} < 0"
        f"   THEN 2 * CAST({n} AS BIGINT) - 1 ELSE 0 END)"
        f" // (2 * CAST({n} AS BIGINT))"
    ).fetchone()[0]
    con.close()
    assert int(got) == exact, (s, n, got, exact)


def test_lloyd_integer_mean_regression_beyond_2p53():
    """The concrete case the old float path got wrong: s = 2^53 + 1, n = 1.
    float(s/n) rounds to 2^53, + 0.5 is absorbed, floor gives 2^53 — one
    short of the exact mean. The integer path is exact."""
    import math

    s, n = 2**53 + 1, 1
    assert math.floor(s / n + 0.5) == 2**53          # the old bug
    assert (2 * s + n) // (2 * n) == 2**53 + 1        # the fix
