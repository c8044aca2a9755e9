"""Probabilistic frequency / membership sketches: Count-Min and Bloom.

Both are the classic shuffle-collapsing summaries a 100 TB pipeline leans
on when exact per-key state is too big to move:

- **Count-Min** (Cormode & Muthukrishnan 2005): a depth×width grid of
  counters. Every occurrence increments ``depth`` counters (one per hash
  row); a point estimate is the MIN over the key's counters — always ≥
  the true count (one-sided error), within εN with probability 1−δ for
  width=⌈e/ε⌉, depth=⌈ln 1/δ⌉. The sketch is a SUM-monoid: partial
  sketches from disjoint slices add cell-wise into the whole-corpus
  sketch, so 1000 executors each sketch their partitions map-side and
  the shuffle carries at most depth·width counters per partial — the
  grid size is independent of input size.
- **Bloom filter** (Bloom 1970): an m-bit membership set with k hash
  probes per key; no false negatives, measurable false-positive rate
  ≈ (1 − e^(−kn/m))^k. The engine's answer to runtime semi-join
  pruning: ship a KB-scale bit set to the fact-table scan instead of
  shuffling the fact table to an equi-join (the same move Spark's own
  runtime row-group filtering and Bloom-join optimizations make —
  expressed declaratively here so the plan stays Catalyst-visible).

Cross-engine determinism: all hashing is the portable 60-bit md5 idiom
(``functions/portable_hash.py``) with the hash-row index embedded as a
string literal, so the DuckDB oracles reproduce every position bit for
bit; all counters are exact BIGINTs. Reference scope: the reference
repo has no sketches (its BigQuery SQL recomputes exact aggregates,
e.g. gcp-python-libs/bigquery.py's query paths); this family is part of
the driver-mandated training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineer_development_spark.functions.portable_hash import (
    spark_md5_int,
)

#: Count-Min defaults: width 512 / depth 4 → ε ≈ e/512 ≈ 0.5% of N,
#: δ ≈ e^-4 ≈ 1.8%. 2048 grid cells regardless of corpus size.
CMS_DEPTH = 4
CMS_WIDTH = 512

#: Bloom defaults: m = 4096 bits, k = 3 probes.
BLOOM_BITS = 4096
BLOOM_K = 3


def _pos_expr(j: int, key_sql: str, modulus: int) -> str:
    """Spark SQL for hash row ``j``'s position of ``key_sql`` — the row
    index is embedded as a string literal so Spark and the oracle hash
    byte-identical inputs."""
    md5_in = f"concat('{j}:', {key_sql})"
    return f"{spark_md5_int(md5_in)} % {modulus}"


def _positions(j_count: int, key_sql: str, modulus: int) -> Column:
    return F.array(
        *[F.expr(_pos_expr(j, key_sql, modulus)) for j in range(j_count)]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the Count-Min grid over every OCCURRENCE of ``key_col`` —
    returns (row_j, pos, c) with at most depth·width rows.

    One narrow projection (posexplode of the depth hash positions — all
    JVM-side md5, whole-stage codegen) and one hash aggregation whose
    grouping key space is the GRID, not the key space: partial
    aggregation caps every map task's contribution at depth·width rows,
    so the shuffle is constant-size no matter how many occurrences or
    distinct keys flow in. That is the entire point of the sketch at
    100 TB — the exact groupBy(key) it replaces shuffles |distinct keys|
    rows.
    """
    key_sql = f"cast({key_col} as string)"
    return (
        df.select(
            F.posexplode(_positions(depth, key_sql, width)).alias(
                "row_j", "pos"
            )
        )
        .groupBy("row_j", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-estimate each probe key's frequency: MIN over its ``depth``
    grid counters (missing counter ⇒ 0 occurrences hashed there ⇒ the
    estimate is 0 via coalesce — only possible for keys absent from the
    build side). The sketch is broadcast: it is ≤ depth·width rows BY
    CONSTRUCTION, so the probe never shuffles."""
    key_sql = f"cast({key_col} as string)"
    ppos = probes.select(
        "*",
        F.posexplode(_positions(depth, key_sql, width)).alias(
            "row_j", "pos"
        ),
    )
    keep = [c for c in probes.columns]
    return (
        ppos.join(F.broadcast(sketch), ["row_j", "pos"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias(est_col))
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_K,
) -> DataFrame:
    """Build the Bloom bit set over DISTINCT ``key_col`` — returns the
    set-bit positions (pos), at most ``m_bits`` rows. Distinct-then-
    explode keeps the aggregation keyed on the bit space (≤ m_bits
    groups), map-side combinable like the CMS grid."""
    key_sql = f"cast({key_col} as string)"
    return (
        df.select(
            F.explode(_positions(k_hashes, key_sql, m_bits)).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_K,
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """Flag each probe row with whether ALL ``k_hashes`` of its bits are
    set (the Bloom 'maybe member' verdict — never a false negative).
    The bit set is broadcast (≤ m_bits single-int rows): at scale this
    is the runtime-filter shape — the fact side is filtered in place by
    a KB-scale structure instead of shuffling to a join."""
    key_sql = f"cast({key_col} as string)"
    ppos = probes.select(
        "*",
        F.explode(_positions(k_hashes, key_sql, m_bits)).alias("pos"),
    )
    keep = [c for c in probes.columns]
    hits = (
        ppos.join(
            F.broadcast(bits.withColumn("_set", F.lit(1))), "pos", "left"
        )
        .groupBy(*keep)
        .agg(F.sum(F.coalesce(F.col("_set"), F.lit(0))).alias("_nset"))
    )
    return hits.select(
        *keep, (F.col("_nset") == k_hashes).alias(flag_col)
    )


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    est_col: str = "est_rows",
) -> DataFrame:
    """Estimate an equi-join's output cardinality from the two sides'
    Count-Min grids (built with the SAME depth/width/key hashing):
    |A ⋈ B| = Σ_k f_A(k)·f_B(k), and row j's grid inner product
    Σ_pos A[j,pos]·B[j,pos] OVERestimates that sum (colliding keys add
    cross terms, never subtract), so the MIN over the depth rows is the
    classic one-sided join-size estimate (AMS/CMS inner product).

    This is the query-planner pre-flight at 100 TB: both grids are
    constant-size summaries that already exist if the sides are
    sketched, and the estimate costs a depth·width-row join instead of
    running the join to see how big it is. Exact BIGINT throughout
    (bounded: each product ≤ |A|·|B| per cell only if one cell held an
    entire side — callers keep |A|,|B| < 2^31 per the module's overflow
    discipline, comfortably true for any per-partition or fixture
    sketch; a 100 TB deployment sums per-row partials in ≤ width cells
    so the same bound applies per row pair).

    Inner join on (row_j, pos): a cell missing from either side
    contributes 0 to the inner product — exactly the semantics of an
    empty counter.
    """
    a = sketch_a.select("row_j", "pos", F.col("c").alias("_ca"))
    b = sketch_b.select("row_j", "pos", F.col("c").alias("_cb"))
    per_row = (
        a.join(b, ["row_j", "pos"])
        .groupBy("row_j")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    return per_row.agg(F.min("_ip").alias(est_col))


#: quantile-sketch default: 4096 equi-width bins → one-sided rank-query
#: error under ceil(value span / 4096), with a bounded histogram shuffle.
QUANTILE_BINS = 4096


def _rank_targets(spark, probs: list[tuple[int, int]], stats: DataFrame):
    """(p_num, p_den, k) per prob with k = ceil(p·n), 1-based — the
    exact-rational rank definition both the estimate and the exact
    selector share (and both engines reproduce: all operands are
    non-negative, so Spark's truncating ``div`` equals DuckDB's
    flooring ``//``). ``stats`` must carry ``_n`` (and is a 1-row
    broadcast)."""
    # JVM literal, not createDataFrame: this frame executes inside every
    # quantile run and a Python-rows frame pays the multi-second
    # Python-RDD worker round-trip (functions.frames / review r15)
    from data_engineer_development_spark.functions import jvm_rows_df

    probs_df = jvm_rows_df(spark, "p_num int, p_den int", list(probs))
    return probs_df.join(F.broadcast(stats)).select(
        "p_num",
        "p_den",
        F.expr("(p_num * _n + p_den - 1) div p_den").alias("k"),
        *[c for c in stats.columns if c != "_n"],
    )


def exact_quantiles(
    vals: DataFrame,
    value_col: str,
    probs: list[tuple[int, int]],
    stats: DataFrame | None = None,
) -> DataFrame:
    """Exact rank-selection quantiles, distributed: the value at
    ascending 1-based rank ceil(p·n) for each exact-rational p —
    computed WITHOUT a global sort of the input. Shape: one
    value-keyed count aggregation (map-side combinable, |distinct
    values| rows), the distributed exclusive prefix sum over the count
    table (``ranking.with_global_cumsum``: range shuffle + narrow Arrow
    local pass + P-row offsets broadcast — no input-sized window
    anywhere), then per target rank the MIN value whose inclusive
    cumulative count covers it (a ≤|probs|-row broadcast inequality
    join). The classic two-phase distributed selection, composed from
    the engine's existing scale shapes; integer-exact end to end, so
    the result is hash-comparable cross-engine. NULL values carry no
    rank: they are filtered out before counting, so ``_n`` is the
    non-null row count (a NULL counted into ``_n`` would inflate the
    target rank k while the value-keyed selection never sees it —
    shifting or emptying the selected quantile, ADVICE r14). ``stats``
    optionally shares a precomputed 1-row frame carrying ``_n`` (e.g.
    the histogram estimate's (_lo, _hi, _n)) — a caller-supplied ``_n``
    MUST likewise count only non-null ``value_col`` rows (use
    ``F.count(col)``, not ``F.count(lit(1))``). Returns
    (p_num, p_den, k, exact) — one row per prob."""
    from data_engineer_development_spark.operators.ranking import (
        with_global_cumsum,
    )

    spark = vals.sparkSession
    vals = vals.filter(F.col(value_col).isNotNull())
    if stats is None:
        stats = vals.agg(F.count(F.lit(1)).alias("_n"))
    tgt = _rank_targets(spark, probs, stats).select("p_num", "p_den", "k")
    cnt = vals.groupBy(F.col(value_col).alias("val")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = with_global_cumsum(cnt, "c", F.col("val").asc(), cum_col="_ex")
    return (
        cum.join(F.broadcast(tgt), F.col("_ex") + F.col("c") >= F.col("k"))
        .groupBy("p_num", "p_den", "k")
        .agg(F.min("val").alias("exact"))
    )


def histogram_quantile_estimate(
    vals: DataFrame,
    value_col: str,
    probs: list[tuple[int, int]],
    bins: int = QUANTILE_BINS,
    stats: DataFrame | None = None,
) -> DataFrame:
    """One-sided histogram quantile estimate — the CMS discipline
    applied to rank queries: bin width = ceil(span / bins) with
    span = hi − lo + 1, bin = (v − lo) div width — DIVISION-FIRST on
    purpose: the naive ``(v − lo)·bins`` numerator overflows int64 for
    spans past 2^63/bins (e.g. nanosecond epochs), wrapping negative in
    non-ANSI Spark while DuckDB raises (review r14); ``v − lo ≤ span``
    can't overflow, and the estimate is computed OVERFLOW-FREE as
    ``lo + bin·width + least(width − 1, (hi − lo) − bin·width)`` —
    algebraically ``min(hi, lo + (bin+1)·width − 1)``, but with every
    intermediate bounded by ``hi``: the crossing bin comes from the
    histogram, so ``bin·width ≤ hi − lo`` always (review r15 — a
    ``least(hi, raw)`` clamp still evaluated the raw term first,
    which wraps past int64 when hi sits near Long.MAX). The form also
    TIGHTENS the last bin's estimate to the true maximum. The ≤``bins``-counter histogram caps
    every map task's shuffle regardless of input size, the cumulative
    crossing runs over the BOUNDED histogram (an unpartitioned window
    over ≤ bins rows — the range_partition_plan class, never the raw
    input), and the estimate is the crossing bin's maximum OBSERVABLE
    value: est ≥ exact ALWAYS (one-sided, like CMS counts and Bloom
    membership) with est − exact < width = ceil(span / bins). Integer
    arithmetic throughout; non-negative operands make Spark's ``div``
    equal DuckDB's ``//``. NULL values are filtered out before binning
    and counting (same rank contract as :func:`exact_quantiles`);
    ``stats`` optionally shares a precomputed 1-row (_lo, _hi, _n)
    frame with :func:`exact_quantiles` so a paired eval scans the
    input once for controls — a caller-supplied ``_n`` MUST count only
    non-null ``value_col`` rows. Returns (p_num, p_den, k, est) — one
    row per prob."""
    v = F.col(value_col)
    vals = vals.filter(v.isNotNull())
    if stats is None:
        stats = vals.agg(
            F.min(v).alias("_lo"),
            F.max(v).alias("_hi"),
            F.count(F.lit(1)).alias("_n"),
        )
    width = f"((_hi - _lo + {bins}) div {bins})"
    binned = vals.join(F.broadcast(stats)).select(
        F.expr(
            f"least({bins} - 1, ({value_col} - _lo) div {width})"
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    hcum = hist.withColumn("_cum", F.sum("c").over(wcum))
    tgt = _rank_targets(vals.sparkSession, probs, stats)
    return (
        hcum.join(F.broadcast(tgt), F.col("_cum") >= F.col("k"))
        .groupBy("p_num", "p_den", "k", "_lo", "_hi")
        .agg(F.min("bin").alias("_bin"))
        .select(
            "p_num",
            "p_den",
            "k",
            F.expr(
                f"_lo + _bin * {width} + "
                f"least({width} - 1, (_hi - _lo) - _bin * {width})"
            ).alias("est"),
        )
    )


def grouped_histogram_quantiles(
    counts: DataFrame,
    grp_col: str,
    val_col: str,
    weight_col: str,
    probs: list[tuple[int, int]],
    bins: int = QUANTILE_BINS,
) -> DataFrame:
    """Per-GROUP one-sided histogram quantile estimates over a
    value-keyed count table (the approx-percentile-per-group surface,
    staged r16 — the grouped counterpart of
    :func:`histogram_quantile_estimate`, sharing its division-first
    binning and overflow-free estimate form; see that docstring for the
    int64 reasoning). Takes ``counts`` = (grp, val, weight) — the same
    one-scan aggregate the exact selector uses, so a paired eval scans
    the input once — and returns (grp, p_num, p_den, k, est) with
    k = ceil(p·n_g) per group and est ≥ exact always (one-sided,
    est − exact < ceil(span_g / bins)).

    Scale shape: per-group (_lo, _hi, n_g) is a grouped agg on the
    COUNT TABLE; the histogram is ≤ |groups|·bins counters (map-side
    combinable); the cumulative crossing windows PARTITION BY group
    over the bounded histogram — no input-sized window, no
    unpartitioned window, no global sort anywhere.

    NULL handling: NULL values carry no rank (the exact_quantiles
    contract), and rows whose GROUP key is NULL are excluded explicitly
    — the internal equi-joins can't carry a NULL group, so the
    exclusion is a documented filter rather than a silent join drop
    (review r16); bucket NULL groups upstream (coalesce to a sentinel)
    if they need quantiles."""
    g, v, c = F.col(grp_col), F.col(val_col), F.col(weight_col)
    counts = counts.filter(v.isNotNull() & g.isNotNull())
    stats = counts.groupBy(g.alias("_g")).agg(
        F.min(v).alias("_lo"),
        F.max(v).alias("_hi"),
        F.sum(c).alias("_n"),
    )
    width = f"((_hi - _lo + {bins}) div {bins})"
    binned = counts.join(
        F.broadcast(stats), g == F.col("_g")
    ).select(
        "_g",
        F.expr(f"least({bins} - 1, ({val_col} - _lo) div {width})").alias(
            "bin"
        ),
        c.alias("_c"),
    )
    hist = binned.groupBy("_g", "bin").agg(F.sum("_c").alias("_hc"))
    wcum = (
        Window.partitionBy("_g")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hcum = hist.withColumn("_cum", F.sum("_hc").over(wcum))
    from data_engineer_development_spark.functions import jvm_rows_df

    probs_df = jvm_rows_df(
        counts.sparkSession, "p_num int, p_den int", list(probs)
    )
    tgt = stats.join(F.broadcast(probs_df)).select(
        F.col("_g").alias("_tg"),
        "p_num",
        "p_den",
        F.expr("(p_num * _n + p_den - 1) div p_den").alias("k"),
        "_lo",
        "_hi",
    )
    return (
        hcum.join(
            F.broadcast(tgt),
            (F.col("_g") == F.col("_tg")) & (F.col("_cum") >= F.col("k")),
        )
        .groupBy("_g", "p_num", "p_den", "k", "_lo", "_hi")
        .agg(F.min("bin").alias("_bin"))
        .select(
            F.col("_g").alias(grp_col),
            "p_num",
            "p_den",
            "k",
            F.expr(
                f"_lo + _bin * {width} + least({width} - 1, "
                f"(_hi - _lo) - _bin * {width})"
            ).alias("est"),
        )
    )
