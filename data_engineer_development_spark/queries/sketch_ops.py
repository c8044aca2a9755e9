"""Sketch-backed scale patterns: Count-Min frequency and Bloom pruning.

Companions to the KMV distinct-count sketch (queries/corpus_ops.py) —
together the three classic mergeable summaries (distinct count,
frequency, membership) a 1000-executor pipeline substitutes for exact
per-key state. Kernels in ``operators/sketches.py``; every counter is
an exact BIGINT and every hash is the portable md5 idiom, so the DuckDB
oracles reproduce the grids bit for bit (one IEEE division for the
Bloom FPR, exact ints both sides).

Reference scope: extension surface (the reference's BigQuery SQL always
recomputes exact aggregates, e.g. gcp-python-libs/bigquery.py); these
are the driver-mandated large-pipeline additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineer_development_spark.functions.portable_hash import (
    duck_md5_int,
)
from data_engineer_development_spark.operators.sketches import (
    BLOOM_BITS,
    BLOOM_K,
    CMS_DEPTH,
    CMS_WIDTH,
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)
from data_engineer_development_spark.sources import load_table

_CMS_TOPN = 10  # heaviest + lightest probe keys each


def _duck_pos(j_sql: str, key_sql: str, modulus: int) -> str:
    """DuckDB position expr mirroring operators/sketches._pos_expr: the
    hash row index lands as the same 'j:key' string prefix."""
    return (
        f"{duck_md5_int(f'concat({j_sql}, {chr(39)}:{chr(39)}, {key_sql})')}"
        f" % {modulus}"
    )


# --------------------------------------------------------------------------
# Count-Min frequency estimates, graded against exact counts: build the
# depth×width grid over every lineitem part occurrence, then point-
# estimate the 10 heaviest and 10 lightest keys. cms_est ≥ exact_cnt
# ALWAYS (one-sided error, pinned in tests); overcount shows the
# collision inflation concentrating on light keys. The build's grouping
# key space is the 2048-cell grid — partial aggregation caps every map
# task's shuffle contribution at grid size, independent of corpus size.
# --------------------------------------------------------------------------
def q_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    occ = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    sketch = cms_build(occ, "l_partkey")
    exact = occ.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    heavy = exact.orderBy(F.desc("exact_cnt"), F.asc("l_partkey")).limit(
        _CMS_TOPN
    )
    light = exact.orderBy(F.asc("exact_cnt"), F.asc("l_partkey")).limit(
        _CMS_TOPN
    )
    probes = heavy.unionByName(light).distinct()
    return (
        cms_estimate(sketch, probes, "l_partkey")
        .select(
            "l_partkey",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy("l_partkey")
    )


def _cms_sql() -> str:
    js = "[" + ",".join(str(j) for j in range(CMS_DEPTH)) + "]"
    pos = _duck_pos(
        "CAST(t.j AS VARCHAR)", "CAST(l_partkey AS VARCHAR)", CMS_WIDTH
    )
    ppos = _duck_pos(
        "CAST(t.j AS VARCHAR)", "CAST(pr.l_partkey AS VARCHAR)", CMS_WIDTH
    )
    return f"""
WITH occ AS (SELECT l_partkey FROM lineitem),
sk AS (SELECT j, pos, CAST(COUNT(*) AS BIGINT) AS c FROM (
           SELECT t.j, {pos} AS pos
           FROM occ, unnest({js}) AS t(j))
       GROUP BY j, pos),
ex AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
       FROM occ GROUP BY l_partkey),
heavy AS (SELECT * FROM ex ORDER BY exact_cnt DESC, l_partkey
          LIMIT {_CMS_TOPN}),
light AS (SELECT * FROM ex ORDER BY exact_cnt ASC, l_partkey
          LIMIT {_CMS_TOPN}),
pr AS (SELECT DISTINCT * FROM
       (SELECT * FROM heavy UNION ALL SELECT * FROM light)),
pp AS (SELECT pr.l_partkey, pr.exact_cnt, t.j, {ppos} AS pos
       FROM pr, unnest({js}) AS t(j)),
est AS (SELECT pp.l_partkey, pp.exact_cnt,
               CAST(MIN(COALESCE(sk.c, 0)) AS BIGINT) AS cms_est
        FROM pp LEFT JOIN sk ON sk.j = pp.j AND sk.pos = pp.pos
        GROUP BY pp.l_partkey, pp.exact_cnt)
SELECT l_partkey, exact_cnt, cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est ORDER BY l_partkey
"""


# --------------------------------------------------------------------------
# Bloom-filter join pruning, with its error rate MEASURED: build the bit
# set over one segment's customer keys (the dim-side filter set), probe
# every distinct order customer, and grade the pass set against the
# exact semi-join. No false negatives EVER (pinned in tests — that is
# what makes Bloom sound as a pre-filter); the single output row carries
# the measured false-positive rate next to the m/k parameters' textbook
# prediction. At scale this is the runtime-filter shape: a KB-scale bit
# set broadcast to the fact scan replaces a shuffle of the fact table.
# --------------------------------------------------------------------------
_BLOOM_SEGMENT = "BUILDING"


def q_bloom_prune_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    build_keys = (
        cust.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    bits = bloom_build(build_keys, "k")
    probes = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    flagged = bloom_probe(bits, probes, "k")
    graded = flagged.join(
        F.broadcast(build_keys.withColumn("_m", F.lit(1))), "k", "left"
    ).select(
        "k",
        "bloom_pass",
        F.coalesce(F.col("_m"), F.lit(0)).alias("is_member"),
    )
    agg = graded.agg(
        F.count(F.lit(1)).alias("n_probe_keys"),
        F.sum("is_member").alias("n_true_members"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_bloom_passed"),
        F.sum(
            (F.col("bloom_pass") & (F.col("is_member") == 0)).cast("long")
        ).alias("n_false_pos"),
    )
    return agg.select(
        "n_probe_keys",
        "n_true_members",
        "n_bloom_passed",
        "n_false_pos",
        (
            F.col("n_false_pos").cast("double")
            / (F.col("n_probe_keys") - F.col("n_true_members")).cast(
                "double"
            )
        ).alias("fpr"),
    )


def _bloom_sql() -> str:
    js = "[" + ",".join(str(j) for j in range(BLOOM_K)) + "]"
    bpos = _duck_pos(
        "CAST(t.j AS VARCHAR)", "CAST(k AS VARCHAR)", BLOOM_BITS
    )
    return f"""
WITH bk AS (SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_mktsegment = '{_BLOOM_SEGMENT}'),
bits AS (SELECT DISTINCT pos FROM (
             SELECT {bpos} AS pos FROM bk, unnest({js}) AS t(j))),
pr AS (SELECT DISTINCT o_custkey AS k FROM orders),
pp AS (SELECT k, {bpos} AS pos FROM pr, unnest({js}) AS t(j)),
fl AS (SELECT pp.k,
              SUM(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END)
                = {BLOOM_K} AS bloom_pass
       FROM pp LEFT JOIN bits ON bits.pos = pp.pos GROUP BY pp.k),
gr AS (SELECT fl.k, fl.bloom_pass,
              CASE WHEN bk.k IS NOT NULL THEN 1 ELSE 0 END AS is_member
       FROM fl LEFT JOIN bk ON bk.k = fl.k)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
       CAST(SUM(is_member) AS BIGINT) AS n_true_members,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_passed,
       CAST(SUM(CASE WHEN bloom_pass AND is_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN bloom_pass AND is_member = 0 THEN 1 ELSE 0 END)
            AS DOUBLE)
         / CAST(COUNT(*) - SUM(is_member) AS DOUBLE) AS fpr
FROM gr
"""


# --------------------------------------------------------------------------
# Join-size pre-flight: estimate |σ(orders) ⋈ lineitem| from the two
# sides' Count-Min grids via the AMS/CMS inner product — min over depth
# rows of Σ_pos A[j,pos]·B[j,pos] — next to the exact join count it
# predicts. One-sided (colliding keys only ADD cross terms; pinned in
# tests); the planner question it answers at 100 TB — "how big is this
# join going to be" — costs a depth·width-row join on grids that already
# exist, not the join itself. All counters and products exact BIGINTs.
# --------------------------------------------------------------------------
_JS_STATUS = "F"


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.sketches import (
        cms_join_size,
    )

    left = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == _JS_STATUS)
        .select(F.col("o_orderkey").alias("k"))
    )
    right = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    est = cms_join_size(cms_build(left, "k"), cms_build(right, "k"))
    exact = left.join(right, "k").agg(
        F.count(F.lit(1)).alias("exact_rows")
    )
    return exact.crossJoin(est).select(
        "exact_rows",
        "est_rows",
        (F.col("est_rows") - F.col("exact_rows")).alias("overestimate"),
    )


def _join_size_sql() -> str:
    js = "[" + ",".join(str(j) for j in range(CMS_DEPTH)) + "]"
    pos = _duck_pos("CAST(t.j AS VARCHAR)", "CAST(k AS VARCHAR)", CMS_WIDTH)
    return f"""
WITH l AS (SELECT o_orderkey AS k FROM orders
           WHERE o_orderstatus = '{_JS_STATUS}'),
r AS (SELECT l_orderkey AS k FROM lineitem),
sa AS (SELECT j, pos, CAST(COUNT(*) AS BIGINT) AS c FROM (
           SELECT t.j, {pos} AS pos FROM l, unnest({js}) AS t(j))
       GROUP BY j, pos),
sb AS (SELECT j, pos, CAST(COUNT(*) AS BIGINT) AS c FROM (
           SELECT t.j, {pos} AS pos FROM r, unnest({js}) AS t(j))
       GROUP BY j, pos),
ip AS (SELECT sa.j, CAST(SUM(sa.c * sb.c) AS BIGINT) AS p
       FROM sa JOIN sb ON sa.j = sb.j AND sa.pos = sb.pos GROUP BY sa.j),
est AS (SELECT CAST(MIN(p) AS BIGINT) AS est_rows FROM ip),
ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows
       FROM l JOIN r ON l.k = r.k)
SELECT ex.exact_rows, est.est_rows,
       CAST(est.est_rows - ex.exact_rows AS BIGINT) AS overestimate
FROM ex, est
"""


# --------------------------------------------------------------------------
# Quantile sketch vs exact selection — STAGED for r15 registration
# (VERDICT r13 #8's approx-percentile/exact pair): the histogram
# quantile estimate (4096 equi-width bins — a bounded shuffle like the
# CMS grid, crossing over the BOUNDED histogram only) graded per
# percentile against the EXACT rank-selection value computed
# distributed: value-keyed counts → the with_global_cumsum prefix sum
# (range shuffle + narrow Arrow pass + P-row offsets, NO input-sized
# window or global sort) → min value covering the target rank. Both
# sides share the exact-rational rank k = ceil(p·n) and are pure
# integer arithmetic, so est ≥ exact ALWAYS (one-sided, pinned in
# tests) and the whole row set hash-matches cross-engine. Registration
# must add the entry to _CARTESIAN_OK (1-row stats / ≤4-row target
# broadcasts), _UNPARTITIONED_WINDOW_OK (≤4096-bin histogram crossing +
# the prefix sum's 32-row offsets) and _ARROW_KERNEL_OK (the prefix
# sum's narrow local pass) in tests/test_plans.py.
# --------------------------------------------------------------------------
_QSK_PROBS = [(1, 4), (1, 2), (3, 4), (19, 20)]
_QSK_BINS = 4096


def q_quantile_sketch_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.operators.sketches import (
        exact_quantiles,
        histogram_quantile_estimate,
    )

    from data_engineer_development_spark.cache import track_persist

    # ROUND(x*100) — the family's exact integer-cents idiom (identical
    # in both engines; a bare double→long cast truncates in Spark but
    # rounds in DuckDB — one-cent divergence, caught at staging)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    # ONE control scan shared by both sides (review r14): the histogram
    # needs (_lo, _hi, _n) and the exact selector needs _n — without the
    # shared persisted frame each recomputed its own full-input agg
    stats = track_persist(
        li.agg(
            F.min("cents").alias("_lo"),
            F.max("cents").alias("_hi"),
            # count(col), not count(1): the operators' rank contract is
            # NON-NULL rows (cents is non-null here, but the shared-stats
            # frame must honor the contract it hands over — ADVICE r14)
            F.count("cents").alias("_n"),
        )
    )
    est = histogram_quantile_estimate(
        li, "cents", _QSK_PROBS, _QSK_BINS, stats=stats
    )
    ex = exact_quantiles(li, "cents", _QSK_PROBS, stats=stats)
    return (
        est.join(ex, ["p_num", "p_den", "k"])
        .select(
            "p_num",
            "p_den",
            F.col("k").alias("target_rank"),
            F.col("exact").alias("exact_cents"),
            F.col("est").alias("est_cents"),
            (F.col("est") - F.col("exact")).alias("overestimate"),
        )
        .orderBy("p_num", "p_den")
    )


def _quantile_sketch_sql(
    probs: list[tuple[int, int]] = _QSK_PROBS, bins: int = _QSK_BINS
) -> str:
    vals = ", ".join(f"({n}, {d})" for n, d in probs)
    return f"""
WITH v AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
s AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n FROM v),
p(p_num, p_den) AS (VALUES {vals}),
t AS (SELECT p_num, p_den, (p_num * n + p_den - 1) // p_den AS k, lo, hi
      FROM p, s),
b AS (SELECT LEAST({bins} - 1,
                   (cents - lo) // ((hi - lo + {bins}) // {bins})) AS bin
      FROM v, s),
h AS (SELECT bin, COUNT(*) AS c FROM b GROUP BY bin),
hc AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum FROM h),
crossing AS (SELECT t.p_num, t.p_den, t.k, t.lo, t.hi,
                    MIN(hc.bin) AS bin
             FROM hc JOIN t ON hc.cum >= t.k
             GROUP BY t.p_num, t.p_den, t.k, t.lo, t.hi),
est AS (SELECT p_num, p_den, k,
               lo + bin * ((hi - lo + {bins}) // {bins})
                  + LEAST(((hi - lo + {bins}) // {bins}) - 1,
                          (hi - lo) - bin * ((hi - lo + {bins}) // {bins}))
                 AS est
        FROM crossing),
cnt AS (SELECT cents AS val, COUNT(*) AS c FROM v GROUP BY cents),
cc AS (SELECT val, c,
              COALESCE(SUM(c) OVER (ORDER BY val
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS ex
       FROM cnt),
exact AS (SELECT t.p_num, t.p_den, t.k, MIN(cc.val) AS exact
          FROM cc JOIN t ON cc.ex + cc.c >= t.k
          GROUP BY t.p_num, t.p_den, t.k)
SELECT e.p_num, e.p_den, CAST(e.k AS BIGINT) AS target_rank,
       CAST(x.exact AS BIGINT) AS exact_cents,
       CAST(e.est AS BIGINT) AS est_cents,
       CAST(e.est - x.exact AS BIGINT) AS overestimate
FROM est e JOIN exact x
  ON e.p_num = x.p_num AND e.p_den = x.p_den AND e.k = x.k
ORDER BY e.p_num, e.p_den
"""


# --------------------------------------------------------------------------
# ANALYZE-style column statistics — STAGED for r15 registration: the
# CBO statistics product (per-column row/null counts, min/max, NDV) a
# warehouse's ANALYZE TABLE emits, computed with the engine's scale
# shapes and GRADED: NDV comes from the mergeable KMV sketch (k = 256
# smallest distinct md5s — the distinct_kmv estimator generalized to a
# multi-column stats sweep) next to the exact distinct count, so the
# sketch error is measured per column, not assumed. One single-pass
# aggregation carries every column's count/null/min/max (min/max on the
# NATIVE type, cast to string only for the uniform output schema —
# casting first would compare lexicographically); per column one
# distinct-hash projection feeds both the exact count and the k-min
# state (TakeOrdered, bounded). At 100 TB the exact-NDV leg is the
# grading harness you drop, keeping the one-pass stats + k-row sketch.
# Registration must add the entry to _CARTESIAN_OK in tests/test_plans.py
# (1-row stats × 1-row NDV/k-min crosses per column branch).
# --------------------------------------------------------------------------
_STATS_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_shipdate",
]
_STATS_K = 256


def q_analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineer_development_spark.cache import track_persist
    from data_engineer_development_spark.functions.portable_hash import (
        spark_md5_int,
    )

    li = load_table(spark, sf_dir, "lineitem")
    one = track_persist(
        li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                e
                for c in _STATS_COLS
                for e in (
                    F.sum(F.col(c).isNull().cast("long")).alias(
                        f"nulls_{c}"
                    ),
                    F.min(F.col(c)).cast("string").alias(f"min_{c}"),
                    F.max(F.col(c)).cast("string").alias(f"max_{c}"),
                )
            ],
        )
    )
    branches = []
    for c in _STATS_COLS:
        dh = (
            li.filter(F.col(c).isNotNull())
            .select(
                F.expr(spark_md5_int(f"cast({c} as string)")).alias("h")
            )
            .distinct()
        )
        kmin = (
            dh.orderBy("h").limit(_STATS_K).agg(F.max("h").alias("hk"))
        )
        nd = dh.agg(F.count(F.lit(1)).alias("ndv_exact"))
        est = F.when(
            F.col("ndv_exact") >= _STATS_K,
            F.floor(
                F.lit(float(_STATS_K - 1))
                * F.lit(float(1 << 60))
                / F.col("hk").cast("double")
            ),
        ).otherwise(F.col("ndv_exact"))
        branches.append(
            one.select(
                F.lit(c).alias("col_name"),
                "n_rows",
                F.col(f"nulls_{c}").alias("n_nulls"),
                F.col(f"min_{c}").alias("min_value"),
                F.col(f"max_{c}").alias("max_value"),
            )
            .join(F.broadcast(nd))
            .join(F.broadcast(kmin))
            .select(
                "col_name",
                "n_rows",
                "n_nulls",
                est.cast("bigint").alias("ndv_est"),
                "ndv_exact",
                "min_value",
                "max_value",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("col_name")


def _analyze_stats_sql(
    cols: list[str] = _STATS_COLS, k: int = _STATS_K
) -> str:
    nulls = ", ".join(
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS nulls_{c}, CAST(MIN({c}) AS VARCHAR) AS min_{c}, "
        f"CAST(MAX({c}) AS VARCHAR) AS max_{c}"
        for c in cols
    )
    parts = [
        f"one AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, {nulls} "
        "FROM lineitem)"
    ]
    finals = []
    for c in cols:
        h = duck_md5_int(f"CAST({c} AS VARCHAR)")
        parts.append(
            f"d_{c} AS (SELECT DISTINCT {h} AS h FROM lineitem "
            f"WHERE {c} IS NOT NULL)"
        )
        parts.append(
            f"k_{c} AS (SELECT MAX(h) AS hk FROM "
            f"(SELECT h FROM d_{c} ORDER BY h LIMIT {k}))"
        )
        parts.append(
            f"n_{c} AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndv_exact "
            f"FROM d_{c})"
        )
        finals.append(
            f"SELECT '{c}' AS col_name, one.n_rows, one.nulls_{c} AS "
            f"n_nulls, CAST(CASE WHEN n_{c}.ndv_exact >= {k} THEN "
            f"floor({float(k - 1)} * {float(1 << 60)} / "
            f"CAST(k_{c}.hk AS DOUBLE)) ELSE "
            f"CAST(n_{c}.ndv_exact AS DOUBLE) END AS BIGINT) AS ndv_est, "
            f"n_{c}.ndv_exact, one.min_{c} AS min_value, "
            f"one.max_{c} AS max_value FROM one, n_{c}, k_{c}"
        )
    body = "\nUNION ALL\n".join(finals)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT * FROM ({body})\nORDER BY col_name"
    )


# REGISTERED r14 (staged r13 with tri-SF + ANSI-on parity per the
# COVERAGE.md inventory discipline; VERDICT r13 #1 leads with these —
# the genuinely 100 TB-shaped constant-size-shuffle sketches).
# --------------------------------------------------------------------------
# Per-group exact quantiles — STAGED for r16 registration: the GROUPED
# generalization of exact_quantiles (quantile_sketch_eval grades the
# global selector; real warehouse asks are per-segment: median price by
# return flag). Same two-phase distributed selection, but the prefix
# sum PARTITIONS BY the group key, so it's a window over the VALUE-
# KEYED COUNT TABLE (|distinct values per group| rows — never the raw
# input) and each group's slice sorts independently. Rank targets are
# exact rationals k = ceil(p·n_g) per group; integer arithmetic end to
# end, so rows hash cross-engine. The probs dimension is a JVM literal
# (the _log_rows_df lesson — no Python-rows frames on the hot path).
# Registration must add the entry to _CARTESIAN_OK in tests/test_plans.py
# (the |groups|×|probs| rank-target cross — 3×2 rows here).
# --------------------------------------------------------------------------
_GQ_PROBS = [(1, 2), (9, 10)]


def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("val"),
    )
    from data_engineer_development_spark.cache import track_persist

    # ONE input scan (review r15): n_g re-derives from the value-keyed
    # count table instead of a second full-input aggregate — the same
    # shared-control-scan discipline as q_quantile_sketch_eval
    cnt = track_persist(
        li.groupBy("grp", "val").agg(F.count(F.lit(1)).alias("c"))
    )
    n_g = cnt.groupBy("grp").agg(F.sum("c").alias("n_g"))
    from data_engineer_development_spark.functions import jvm_rows_df

    probs = jvm_rows_df(spark, "p_num int, p_den int", _GQ_PROBS)
    tgt = n_g.join(F.broadcast(probs)).select(
        "grp",
        "p_num",
        "p_den",
        F.expr("(p_num * n_g + p_den - 1) div p_den").alias("k"),
    )
    w = Window.partitionBy("grp").orderBy("val").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cnt.withColumn("cum", F.sum("c").over(w))
    return (
        cum.alias("c")
        .join(
            F.broadcast(tgt).alias("t"),
            (F.col("c.grp") == F.col("t.grp")) & (F.col("cum") >= F.col("k")),
        )
        .groupBy(F.col("c.grp").alias("grp"), "p_num", "p_den", "k")
        .agg(F.min("val").alias("q"))
        .orderBy("grp", "p_num", "p_den")
    )


_GROUPED_QUANTILES_SQL = f"""
WITH v AS (SELECT l_returnflag AS grp,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS val
           FROM lineitem),
cnt AS (SELECT grp, val, COUNT(*) AS c FROM v GROUP BY grp, val),
ng AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g FROM v GROUP BY grp),
p(p_num, p_den) AS (VALUES {', '.join(f'({n}, {d})' for n, d in _GQ_PROBS)}),
tgt AS (SELECT grp, p_num, p_den,
               (p_num * n_g + p_den - 1) // p_den AS k
        FROM ng CROSS JOIN p),
cum AS (SELECT grp, val,
               SUM(c) OVER (PARTITION BY grp ORDER BY val
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM cnt)
SELECT t.grp, t.p_num, t.p_den, CAST(t.k AS BIGINT) AS k,
       CAST(MIN(c.val) AS BIGINT) AS q
FROM cum c JOIN tgt t ON t.grp = c.grp AND c.cum >= t.k
GROUP BY t.grp, t.p_num, t.p_den, t.k
ORDER BY t.grp, t.p_num, t.p_den
"""


# --------------------------------------------------------------------------
# Per-group approx percentiles, GRADED — STAGED for r17 registration
# (VERDICT r15 #8's grouped_quantiles-backed approx pair): the grouped
# histogram sketch (operators/sketches.grouped_histogram_quantiles —
# ≤|groups|·1024 counters, group-partitioned crossing window, division-
# first binning) evaluated per (group, percentile) against the exact
# grouped selection, BOTH sides sharing the one value-keyed count-table
# scan. est ≥ exact always (one-sided, pinned in tests); overestimate is
# bounded by the per-group bin width. Registration must add the entry to
# _CARTESIAN_OK in tests/test_plans.py (the |groups|×|probs| prob-grid
# cross on the stats frame — 3×2 rows here).
# --------------------------------------------------------------------------
_AGP_PROBS = [(1, 2), (19, 20)]
_AGP_BINS = 1024


def q_approx_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from data_engineer_development_spark.cache import track_persist
    from data_engineer_development_spark.functions import jvm_rows_df
    from data_engineer_development_spark.operators.sketches import (
        grouped_histogram_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("val"),
    )
    # ONE input scan: the value-keyed count table feeds the sketch side,
    # the exact selection, and the per-group n_g
    cnt = track_persist(
        li.groupBy("grp", "val").agg(F.count(F.lit(1)).alias("c"))
    )
    est = grouped_histogram_quantiles(
        cnt, "grp", "val", "c", _AGP_PROBS, _AGP_BINS
    )
    # exact side: the grouped two-phase selection (q_grouped_quantiles'
    # shape, same count table)
    n_g = cnt.groupBy("grp").agg(F.sum("c").alias("n_g"))
    probs = jvm_rows_df(spark, "p_num int, p_den int", _AGP_PROBS)
    tgt = n_g.join(F.broadcast(probs)).select(
        "grp", "p_num", "p_den",
        F.expr("(p_num * n_g + p_den - 1) div p_den").alias("k"),
    )
    w = Window.partitionBy("grp").orderBy("val").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cnt.withColumn("cum", F.sum("c").over(w))
    exact = (
        cum.alias("c")
        .join(
            F.broadcast(tgt).alias("t"),
            (F.col("c.grp") == F.col("t.grp")) & (F.col("cum") >= F.col("k")),
        )
        .groupBy(F.col("c.grp").alias("grp"), "p_num", "p_den", "k")
        .agg(F.min("val").alias("exact"))
    )
    return (
        est.join(exact, ["grp", "p_num", "p_den", "k"])
        .select(
            "grp", "p_num", "p_den",
            F.col("k").alias("target_rank"),
            F.col("exact").alias("exact_cents"),
            F.col("est").alias("est_cents"),
            (F.col("est") - F.col("exact")).alias("overestimate"),
        )
        .orderBy("grp", "p_num", "p_den")
    )


_AGP_VALS = ", ".join(f"({n}, {d})" for n, d in _AGP_PROBS)
_APPROX_GROUP_PCTL_SQL = f"""
WITH v AS (SELECT l_returnflag AS grp,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS val
           FROM lineitem),
cnt AS (SELECT grp, val, COUNT(*) AS c FROM v GROUP BY grp, val),
s AS (SELECT grp, MIN(val) AS lo, MAX(val) AS hi,
             CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY grp),
p(p_num, p_den) AS (VALUES {_AGP_VALS}),
t AS (SELECT grp, p_num, p_den, (p_num * n + p_den - 1) // p_den AS k,
             lo, hi
      FROM s CROSS JOIN p),
b AS (SELECT c.grp,
             LEAST({_AGP_BINS} - 1,
                   (c.val - s.lo) // ((s.hi - s.lo + {_AGP_BINS}) // {_AGP_BINS}))
               AS bin,
             c.c
      FROM cnt c JOIN s ON s.grp = c.grp),
h AS (SELECT grp, bin, SUM(c) AS hc FROM b GROUP BY grp, bin),
hc AS (SELECT grp, bin,
              SUM(hc) OVER (PARTITION BY grp ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum
       FROM h),
crossing AS (SELECT t.grp, t.p_num, t.p_den, t.k, t.lo, t.hi,
                    MIN(hc.bin) AS bin
             FROM hc JOIN t ON hc.grp = t.grp AND hc.cum >= t.k
             GROUP BY t.grp, t.p_num, t.p_den, t.k, t.lo, t.hi),
est AS (SELECT grp, p_num, p_den, k,
               lo + bin * ((hi - lo + {_AGP_BINS}) // {_AGP_BINS})
                  + LEAST(((hi - lo + {_AGP_BINS}) // {_AGP_BINS}) - 1,
                          (hi - lo)
                          - bin * ((hi - lo + {_AGP_BINS}) // {_AGP_BINS}))
                 AS est
        FROM crossing),
cc AS (SELECT grp, val, c,
              SUM(c) OVER (PARTITION BY grp ORDER BY val
                           ROWS UNBOUNDED PRECEDING) AS cum
       FROM cnt),
exact AS (SELECT t.grp, t.p_num, t.p_den, t.k, MIN(cc.val) AS exact
          FROM cc JOIN t ON cc.grp = t.grp AND cc.cum >= t.k
          GROUP BY t.grp, t.p_num, t.p_den, t.k)
SELECT_PLACEHOLDER
"""
_APPROX_GROUP_PCTL_SQL = _APPROX_GROUP_PCTL_SQL.replace(
    "SELECT_PLACEHOLDER",
    """SELECT e.grp, e.p_num, e.p_den, CAST(e.k AS BIGINT) AS target_rank,
       CAST(x.exact AS BIGINT) AS exact_cents,
       CAST(e.est AS BIGINT) AS est_cents,
       CAST(e.est - x.exact AS BIGINT) AS overestimate
FROM est e JOIN exact x
  ON e.grp = x.grp AND e.p_num = x.p_num AND e.p_den = x.p_den
     AND e.k = x.k
ORDER BY e.grp, e.p_num, e.p_den""",
)


QUERIES: dict = {
    "cms_freq": q_cms_freq,
    "bloom_prune_eval": q_bloom_prune_eval,
    "join_size_estimate": q_join_size_estimate,
    # registered r15 (staged r14, tri-SF + ANSI-on parity on record)
    "quantile_sketch_eval": q_quantile_sketch_eval,
    "analyze_table_stats": q_analyze_table_stats,
    # registered r16 (staged r15, tri-SF + ANSI-on parity on record)
    "grouped_quantiles": q_grouped_quantiles,
    # registered r17 (staged r16, tri-SF + ANSI-on parity on record)
    "approx_group_percentiles": q_approx_group_percentiles,
}

ORACLE: dict = {
    "grouped_quantiles": _GROUPED_QUANTILES_SQL,
    "approx_group_percentiles": _APPROX_GROUP_PCTL_SQL,
    "cms_freq": _cms_sql(),
    "bloom_prune_eval": _bloom_sql(),
    "join_size_estimate": _join_size_sql(),
    "quantile_sketch_eval": _quantile_sketch_sql(),
    "analyze_table_stats": _analyze_stats_sql(),
}
