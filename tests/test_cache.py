"""Scoped cache release (cache.track_persist / release_tracked).

Verdict r7 item 6: correctness of memory hygiene must not depend on
harness-side ``spark.catalog.clearCache()`` — a sweep that forgets it must
not accumulate one cached copy of the input per entry. Operators register
their load-bearing persists; ``release_tracked()`` frees exactly those.
"""

from __future__ import annotations

from conftest import SF_SMOKE

from data_engineer_development_spark import cache
from data_engineer_development_spark.queries import all_queries


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _run(spark, name: str) -> None:
    all_queries()[name](spark, SF_SMOKE).write.format("noop").mode(
        "overwrite"
    ).save()


def test_sweep_without_clearcache_leaves_no_cached_rdds(spark):
    """Run the persisting entries back-to-back with NO clearCache — only
    the scoped release — and assert zero persistent RDDs survive. Covers
    every operator family that calls track_persist: the two-pass rank
    (ntile_deciles, dictionary_encode), the posting-list dedups
    (dedup_jaccard, dedup_incremental), MinHash/LSH (dedup_minhash_lsh,
    lsh_candidate_recall), SimHash pairs, and the shingled contamination
    frame."""
    spark.catalog.clearCache()  # clean slate from earlier test modules
    cache.release_tracked()
    assert _n_cached(spark) == 0
    for name in [
        "ntile_deciles",
        "dictionary_encode",
        "dedup_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash_pairs",
        "contamination_check",
    ]:
        before = _n_cached(spark)
        _run(spark, name)
        assert _n_cached(spark) >= before, name  # persist actually engaged
        cache.release_tracked()
    assert _n_cached(spark) == 0


def test_release_tracked_reports_count_and_is_idempotent(spark):
    _run(spark, "ntile_deciles")
    assert cache.release_tracked() >= 1
    assert cache.release_tracked() == 0
    assert _n_cached(spark) == 0


def test_session_reserves_jit_code_cache(spark):
    """Pin the round-8 long-JVM fix: without -XX:ReservedCodeCacheSize the
    155+-query bench sweep exhausts the default 240 MB JIT code cache and
    the JVM silently flushes cold compiled code, inflating late queries
    1.3-2.3x (supplier_pagerank read 9.4 s in-bench vs 3.95 s fresh-JVM).
    The factory must keep reserving a larger cache unless explicitly
    overridden via $SPARK_GRAFT_DRIVER_JAVA_OPTS."""
    import os

    if os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS"):
        return  # operator override in effect; nothing to pin
    opts = spark.conf.get("spark.driver.extraJavaOptions", "")
    assert "ReservedCodeCacheSize" in opts, opts


def test_bpe_checkpoints_release_and_do_not_stack(spark):
    """localCheckpoint blocks live at the RDD layer where clearCache
    can't reach them (r12 lesson: the lineage-truncation fix would have
    leaked one persistent RDD per checkpoint generation). The tracked
    wrapper must (a) hold at most ONE generation during training —
    superseded generations free as soon as the next materializes — and
    (b) leave zero persistent RDDs after release_tracked()."""
    from data_engineer_development_spark import cache
    from data_engineer_development_spark.operators.bpe import bpe_train
    from data_engineer_development_spark.sources import load_table

    spark.catalog.clearCache()
    cache.release_tracked()
    assert _n_cached(spark) == 0
    docs = load_table(spark, SF_SMOKE, "documents")
    # k=20 crosses two BPE_PERSIST_EVERY=8 checkpoints: generation 1
    # must be freed when generation 2 lands (at most 1 checkpoint RDD
    # + the initial tracked persist alive at any point)
    bpe_train(docs, k_merges=20).collect()
    assert len(cache._TRACKED_RDDS) == 1  # the live final generation
    cache.release_tracked()
    assert _n_cached(spark) == 0 and not cache._TRACKED_RDDS


def test_local_checkpoint_does_not_capture_upstream_persist(spark):
    """ADVICE r12: the snapshot diff around the eager checkpoint must
    attribute ONLY locally-checkpointed RDDs to the checkpoint handle
    set. When the eager action is the FIRST action over an upstream
    track_persist SQL cache, that cache's RDD also first appears inside
    the diff window — misattributing it would unpersist the shared cache
    early when the handle is passed back via free=."""
    from pyspark.sql import functions as F

    spark.catalog.clearCache()
    cache.release_tracked()
    assert _n_cached(spark) == 0
    base = cache.track_persist(
        spark.range(1000).withColumn("x", F.col("id") * 2)
    )
    # no action yet: the persist is registered but NOT materialized —
    # the eager checkpoint below is its first action
    out, handles = cache.local_checkpoint_tracked(
        base.withColumn("y", F.col("x") + 1)
    )
    assert len(handles) == 1 and handles[0].isLocallyCheckpointed()
    assert _n_cached(spark) == 2  # SQL cache + checkpoint generation
    assert out.count() == 1000  # consume BEFORE freeing (lineage is cut)
    for h in handles:
        h.unpersist(True)
    # the upstream SQL cache must have survived freeing the checkpoint
    assert _n_cached(spark) == 1
    cache._TRACKED_RDDS.clear()
    cache.release_tracked()
    spark.catalog.clearCache()
    assert _n_cached(spark) == 0
