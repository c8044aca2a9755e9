"""Round-16 staged candidates (r17 registration queue): CDC MERGE
materialized as atomic versioned commits, and per-group approx
percentiles graded against exact grouped selection — oracle parity at
both fixture SFs plus each operator's semantic invariants."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from conftest import SF_CORRECT, SF_SMOKE
from pyspark.sql import functions as F


def _parity(spark, name, fn, sql):
    from tests.oracle_harness import compare

    for sf_dir in (SF_SMOKE, SF_CORRECT):
        ok, msg = compare(spark, sf_dir, name, fn, sql)
        assert ok, f"{sf_dir}: {msg}"


def test_cdc_merge_snapshot_oracle_parity(spark):
    from data_engineer_development_spark.queries.warehouse_ops import (
        _CDC_MERGE_SNAPSHOT_SQL,
        q_cdc_merge_snapshot,
    )

    _parity(
        spark,
        "cdc_merge_snapshot",
        q_cdc_merge_snapshot,
        _CDC_MERGE_SNAPSHOT_SQL,
    )


def test_merge_cdc_routes_all_three_materializations(spark):
    """One merge_cdc commit: update keys rewrite ONLY their file,
    delete keys on an untouched file become a deletion vector (no
    rewrite), unmatched keys land in one insert file, pre-merge reads
    are invariant, and an upsert∩delete key clash fails loudly before
    committing."""
    from data_engineer_development_spark.operators.snapshots import (
        append_snapshot,
        live_files,
        merge_cdc,
        read_asof,
    )

    base = os.path.join(tempfile.gettempdir(), f"mcdc-{uuid.uuid4().hex}")
    try:
        rows = spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        )
        append_snapshot(
            spark, base, 1,
            {
                "lo": rows.filter("k < 10"),
                "hi": rows.filter("k >= 10"),
            },
        )
        # updates hit only 'lo'; deletes hit only 'hi'; inserts are new
        updates = spark.range(2, 5).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("val")
        )
        inserts = spark.range(100, 103).select(
            F.col("id").alias("k"), F.lit(7).cast("long").alias("val")
        )
        deletes = spark.range(15, 17).select(F.col("id").alias("k"))
        res = merge_cdc(
            spark, base, 2, updates.unionByName(inserts), deletes, "k"
        )
        assert res == {
            "rewritten": ["lo"],
            "inserted": ["m2_ins"],
            "dv": ["hi"],
            "scanned": ["hi", "lo"],  # no stats recorded: all live files
        }
        assert live_files(spark, base, 2) == ["hi", "m2_lo", "m2_ins"] or (
            live_files(spark, base, 2) == sorted(["hi", "m2_lo", "m2_ins"])
        )
        v2 = {
            r["k"]: r["val"]
            for r in read_asof(spark, base, 2, dv_key="k").collect()
        }
        # updated
        assert all(v2[k] == -1 for k in (2, 3, 4))
        # deleted
        assert 15 not in v2 and 16 not in v2
        # inserted
        assert all(v2[k] == 7 for k in (100, 101, 102))
        # untouched survivors
        assert v2[0] == 0 and v2[11] == 110
        assert len(v2) == 20 - 2 + 3
        # pre-merge version invariant
        v1 = {
            r["k"]: r["val"]
            for r in read_asof(spark, base, 1, dv_key="k").collect()
        }
        assert len(v1) == 20 and v1[15] == 150 and v1[3] == 30

        with pytest.raises(ValueError, match="both upserts and deletes"):
            merge_cdc(
                spark, base, 3,
                spark.range(1).select(
                    F.col("id").alias("k"), F.lit(0).alias("val")
                ),
                spark.range(1).select(F.col("id").alias("k")),
                "k",
            )
        with pytest.raises(ValueError, match="empty batch"):
            merge_cdc(spark, base, 3, None, None, "k")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_append_snapshot_dvs_commit_atomically_and_validate(spark):
    """append_snapshot's dvs form: dv without dv_key and dv-on-removed
    both fail loudly; a combined add+remove+dv version reads correctly
    and the dv rows share the version's single log batch."""
    from data_engineer_development_spark.operators.snapshots import (
        append_snapshot,
        read_asof,
        snapshot_log,
    )

    base = os.path.join(tempfile.gettempdir(), f"advs-{uuid.uuid4().hex}")
    try:
        rows = spark.range(10).select(F.col("id").alias("k"))
        append_snapshot(spark, base, 1, {"a": rows.filter("k < 5"),
                                         "b": rows.filter("k >= 5")})
        with pytest.raises(ValueError, match="without dv_key"):
            append_snapshot(
                spark, base, 2, dvs={"a": rows.filter("k = 0")}
            )
        with pytest.raises(ValueError, match="removed file"):
            append_snapshot(
                spark, base, 2,
                removes=["a"],
                dvs={"a": rows.filter("k = 0")},
                dv_key="k",
            )
        append_snapshot(
            spark, base, 2,
            adds={"c": spark.range(100, 102).select(F.col("id").alias("k"))},
            removes=["b"],
            dvs={"a": rows.filter("k = 0")},
            dv_key="k",
        )
        got = sorted(
            r["k"] for r in read_asof(spark, base, 2, dv_key="k").collect()
        )
        assert got == [1, 2, 3, 4, 100, 101]
        v2 = snapshot_log(spark, base).filter("version = 2").collect()
        assert sorted((r["action"], r["file_id"]) for r in v2) == [
            ("add", "c"), ("dv", "a"), ("remove", "b"),
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_approx_group_percentiles_oracle_parity(spark):
    from data_engineer_development_spark.queries.sketch_ops import (
        _APPROX_GROUP_PCTL_SQL,
        q_approx_group_percentiles,
    )

    _parity(
        spark,
        "approx_group_percentiles",
        q_approx_group_percentiles,
        _APPROX_GROUP_PCTL_SQL,
    )


def test_grouped_histogram_estimate_one_sided_and_bounded(spark):
    """Per (group, percentile): est ≥ exact ALWAYS (one-sided, the
    sketch-family contract) and est − exact < the group's bin width
    ceil(span_g / bins)."""
    from data_engineer_development_spark.queries.sketch_ops import (
        _AGP_BINS,
        q_approx_group_percentiles,
    )
    from data_engineer_development_spark.sources import load_table

    out = q_approx_group_percentiles(spark, SF_CORRECT).collect()
    assert out, "no rows"
    spans = {
        r["grp"]: r["span"]
        for r in load_table(spark, SF_CORRECT, "lineitem")
        .select(
            F.col("l_returnflag").alias("grp"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("grp")
        .agg((F.max("cents") - F.min("cents") + 1).alias("span"))
        .collect()
    }
    for r in out:
        assert r["overestimate"] >= 0, r
        width = -(-spans[r["grp"]] // _AGP_BINS)  # ceil
        assert r["overestimate"] < width, (r, width)


def test_grouped_histogram_quantiles_null_and_exactness(spark):
    """NULL values carry no rank; a group whose values all fit distinct
    bins estimates exactly (overestimate 0 when every value is its own
    bin ceiling)."""
    from data_engineer_development_spark.operators.sketches import (
        grouped_histogram_quantiles,
    )

    cnt = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("a", None, 5), ("b", 10, 3)],
        "g string, v int, c int",
    )
    got = {
        (r["g"], r["p_num"], r["p_den"]): (r["k"], r["est"])
        for r in grouped_histogram_quantiles(
            cnt, "g", "v", "c", [(1, 2)], bins=16
        ).collect()
    }
    # group a: n=2 (NULL row excluded), k=1, est covers value 1 exactly
    # (span 2, width 1 → bin per value)
    assert got[("a", 1, 2)] == (1, 1)
    # group b: single value, k=2 of n=3, est = the value
    assert got[("b", 1, 2)] == (2, 10)


def test_snapshot_maintenance_plan_oracle_parity(spark):
    from data_engineer_development_spark.queries.warehouse_ops import (
        _SNAPSHOT_MAINTENANCE_SQL,
        q_snapshot_maintenance_plan,
    )

    _parity(
        spark,
        "snapshot_maintenance_plan",
        q_snapshot_maintenance_plan,
        _SNAPSHOT_MAINTENANCE_SQL,
    )


def test_maintenance_plan_is_dry_run(spark):
    """The plan must not delete anything: after q's fixture logic runs
    against a persistent base, expirable files still exist on disk.
    (Re-built inline since the query cleans its temp dir.)"""
    from data_engineer_development_spark.operators.snapshots import (
        append_snapshot,
        expire_versions,
        live_files,
        read_asof,
    )

    base = os.path.join(tempfile.gettempdir(), f"dry-{uuid.uuid4().hex}")
    try:
        rows = spark.range(10).select(F.col("id").alias("k"))
        append_snapshot(spark, base, 1, {"a": rows})
        append_snapshot(spark, base, 2, {"b": rows}, removes=["a"])
        dead = expire_versions(spark, base, 2, delete=False)
        assert dead == ["a"]
        assert os.path.isdir(os.path.join(base, "data", "a"))
        # a version-1 read still works after the dry run
        assert read_asof(spark, base, 1).count() == 10
        assert live_files(spark, base, 2) == ["b"]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_cdc_merge_snapshot_oracle_parity(spark):
    from data_engineer_development_spark.queries.warehouse_ops import (
        _STREAM_CDC_MERGE_SQL,
        q_stream_cdc_merge_snapshot,
    )

    _parity(
        spark,
        "stream_cdc_merge_snapshot",
        q_stream_cdc_merge_snapshot,
        _STREAM_CDC_MERGE_SQL,
    )


def test_stream_cdc_merge_is_split_invariant_and_versioned(spark):
    """The SAME change set applied as one batch and as many batches
    yields identical head content (the unique-key split-invariance
    contract), and the multi-batch run leaves a multi-version history —
    each micro-batch one atomic commit."""
    from data_engineer_development_spark.operators.snapshots import (
        append_snapshot,
        merge_cdc,
        read_asof,
        snapshot_log,
    )

    def build(n_batches: int) -> tuple[dict, int]:
        base = os.path.join(
            tempfile.gettempdir(), f"splt-{uuid.uuid4().hex}"
        )
        try:
            rows = spark.range(10).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("val")
            )
            append_snapshot(spark, base, 1, {"a": rows})
            # changes: update k in {1,2}, delete k=3, insert k in {50,51}
            ups = spark.createDataFrame(
                [(1, -1), (2, -2), (50, 500), (51, 510)], "k long, val long"
            )
            dels = spark.range(3, 4).select(F.col("id").alias("k"))
            batches: list[tuple] = []
            if n_batches == 1:
                batches = [(ups, dels)]
            else:
                batches = [
                    (ups.filter("k = 1"), None),
                    (None, dels),
                    (ups.filter("k >= 50"), None),
                    (ups.filter("k = 2"), None),
                ]
            v = 1
            for u, d in batches:
                v += 1
                merge_cdc(spark, base, v, u, d, "k")
            head = {
                r["k"]: r["val"]
                for r in read_asof(spark, base, 2**61, dv_key="k").collect()
            }
            n_versions = snapshot_log(spark, base).agg(
                F.max("version")
            ).collect()[0][0]
            return head, int(n_versions)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    one, v1 = build(1)
    many, vn = build(4)
    assert one == many
    assert v1 == 2 and vn == 5
    assert one[1] == -1 and one[2] == -2 and 3 not in one
    assert one[50] == 500 and one[51] == 510 and one[0] == 0


def test_apply_compaction_reads_through_deletion_vectors(spark):
    """Review r16: compacting a file that carries deletion vectors must
    materialize the deletes into the rewrite — a raw read would
    resurrect them (the vectors attach to the removed member). dv_key
    is REQUIRED the moment any member carries a vector; schema-divergent
    groups are refused manifest-only."""
    from data_engineer_development_spark.operators.snapshots import (
        append_deletion_vector,
        append_snapshot,
        apply_compaction,
        read_asof,
    )

    base = os.path.join(tempfile.gettempdir(), f"cdv-{uuid.uuid4().hex}")
    try:
        rows = spark.range(10).select(F.col("id").alias("k"))
        append_snapshot(spark, base, 1, {"a": rows.filter("k < 5"),
                                         "b": rows.filter("k >= 5")})
        append_deletion_vector(
            spark, base, 2, "a", rows.filter("k = 1"), "k"
        )
        with pytest.raises(ValueError, match="deletion vectors"):
            apply_compaction(spark, base, 3, [["a", "b"]])
        new = apply_compaction(spark, base, 3, [["a", "b"]], dv_key="k")
        assert new == ["compact3_0"]
        got = sorted(r["k"] for r in read_asof(spark, base, 3).collect())
        assert got == [0, 2, 3, 4, 5, 6, 7, 8, 9]  # 1 stays deleted
        # pre-compaction versions still correct
        assert read_asof(spark, base, 2, dv_key="k").count() == 9
        assert read_asof(spark, base, 1).count() == 10

        # schema-divergent group: refused manifest-only
        append_snapshot(
            spark, base, 4,
            {"w": spark.range(3).select(
                F.col("id").alias("k"), F.lit("x").alias("extra"))},
        )
        with pytest.raises(ValueError, match="mixes committed schemas"):
            apply_compaction(spark, base, 5, [["compact3_0", "w"]])
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_merge_cdc_noop_batch_and_dv_deleted_key_routing(spark):
    """Review r16: a batch matching nothing (deletes of absent keys) is
    a routine CDC no-op — no commit, no version burned, no error; and an
    upsert of a DV-deleted key routes as an INSERT (the key is logically
    absent), never a pointless rewrite of the file that once held it."""
    from data_engineer_development_spark.operators.snapshots import (
        append_deletion_vector,
        append_snapshot,
        merge_cdc,
        read_asof,
        snapshot_log,
    )

    base = os.path.join(tempfile.gettempdir(), f"noop-{uuid.uuid4().hex}")
    try:
        rows = spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        )
        append_snapshot(spark, base, 1, {"a": rows})
        # no-op: delete keys that don't exist
        res = merge_cdc(
            spark, base, 2, None,
            spark.range(100, 103).select(F.col("id").alias("k")), "k",
        )
        assert res == {"rewritten": [], "inserted": [], "dv": [],
                       "scanned": ["a"]}
        assert snapshot_log(spark, base).agg(
            F.max("version")
        ).collect()[0][0] == 1  # no version burned

        # DV-delete k=7, then upsert it: must route as an INSERT
        append_deletion_vector(
            spark, base, 2, "a", rows.filter("k = 7"), "k"
        )
        res = merge_cdc(
            spark, base, 3,
            spark.createDataFrame([(7, -7)], "k long, val long"),
            None, "k",
        )
        assert res == {"rewritten": [], "inserted": ["m3_ins"], "dv": [],
                       "scanned": ["a"]}
        head = {
            r["k"]: r["val"]
            for r in read_asof(spark, base, 3, dv_key="k").collect()
        }
        assert head[7] == -7 and len(head) == 10
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_snapshot_log_checkpoint_oracle_parity(spark):
    from data_engineer_development_spark.queries.warehouse_ops import (
        _SNAPSHOT_LOG_CKPT_SQL,
        q_snapshot_log_checkpoint,
    )

    _parity(
        spark,
        "snapshot_log_checkpoint",
        q_snapshot_log_checkpoint,
        _SNAPSHOT_LOG_CKPT_SQL,
    )


def test_checkpoint_log_compacts_and_preserves_history(spark):
    """checkpoint_log: one checkpoint file carries the FULL action
    history (time travel to any version still exact), the covered tail
    part files are deleted, post-checkpoint commits land in a fresh
    tail, a second checkpoint folds them in, and the crash window
    (checkpoint written, tail not yet compacted) double-reads without
    double-counting."""
    import glob

    from data_engineer_development_spark.operators.snapshots import (
        append_snapshot,
        checkpoint_log,
        live_files,
        read_asof,
        snapshot_log,
    )

    base = os.path.join(tempfile.gettempdir(), f"ckpt-{uuid.uuid4().hex}")
    try:
        rows = spark.range(30).select(F.col("id").alias("k"))
        append_snapshot(spark, base, 1, {"a": rows.filter("k < 10")})
        append_snapshot(spark, base, 2, {"b": rows.filter("k >= 10 and k < 20")})
        append_snapshot(spark, base, 3, {"c": rows.filter("k >= 20")},
                        removes=["a"])
        n_actions = snapshot_log(spark, base).count()
        assert n_actions == 4

        def parts() -> int:
            return len(glob.glob(os.path.join(base, "_log", "part-*.parquet")))

        assert parts() == 3
        assert checkpoint_log(spark, base) == 3
        assert parts() == 0
        # history intact through the checkpoint
        assert snapshot_log(spark, base).count() == n_actions
        assert live_files(spark, base, 1) == ["a"]
        assert live_files(spark, base, 3) == ["b", "c"]
        assert read_asof(spark, base, 2).count() == 20
        assert read_asof(spark, base, 3).count() == 20

        # post-checkpoint commit lands in a fresh tail; second
        # checkpoint folds it in
        append_snapshot(spark, base, 4, {"d": rows.filter("k < 5")})
        assert parts() == 1
        assert snapshot_log(spark, base).count() == n_actions + 1
        assert checkpoint_log(spark, base) == 4
        assert parts() == 0
        assert read_asof(spark, base, 4).count() == 25

        # crash window: rows present in BOTH checkpoint and tail must
        # not double-count (snapshot_log DISTINCTs) — simulate by
        # re-appending the EXACT duplicate of a row the checkpoint
        # already covers
        dup = snapshot_log(spark, base).filter(
            "version = 4 and action = 'add'"
        )
        dup.coalesce(1).write.mode("append").parquet(
            os.path.join(base, "_log")
        )
        assert snapshot_log(spark, base).count() == n_actions + 1
        assert read_asof(spark, base, 4).count() == 25
    finally:
        shutil.rmtree(base, ignore_errors=True)
