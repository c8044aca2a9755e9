"""Key-value store facade (SURVEY.md §2.1 S7, §2.2 K9/K10).

Reference: /root/reference/gcp-python-libs/datastore.py — kind+key entities
with schemaless properties, filtered scan (:10-15), create-or-update upsert
(:17-26), delete/update (:28-32).

Spark-native restatement: a keyed parquet table of
``(kind, key, props map<string,string>, seq)``. Upsert = append a row with a
monotonically increasing ``seq``; reads resolve latest-seq-per-key
(``row_number() = 1``) and drop tombstones. A background ``compact()``
rewrites the log to its resolved state — the classic log + compaction
split, which is also the only shape that scales: writes are appends
(no read-modify-write of a 100 TB table), and compaction is one
window-dedup job that partitions by key.
"""

from __future__ import annotations

import os
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("key", StringType(), False),
        StructField("props", MapType(StringType(), StringType()), True),
        StructField("seq", LongType(), False),
        StructField("tombstone", BooleanType(), False),
    ]
)


class KVStore:
    """Datastore-analogue facade over an append-only keyed parquet log."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._last_seq = 0
        self._buffer: list[tuple] | None = None
        os.makedirs(path, exist_ok=True)

    # -- write path --------------------------------------------------------
    def _next_seq(self) -> int:
        # strictly monotonic even when time_ns() stalls or repeats, so the
        # resolve order always equals the call order
        self._last_seq = max(self._last_seq + 1, time.time_ns())
        return self._last_seq

    def _append(self, rows: list[tuple]) -> None:
        if self._buffer is not None:
            self._buffer.extend(rows)
            return
        # Ship the rows through pandas+Arrow so the write executes entirely
        # JVM-side (a LocalRelation). createDataFrame(list-of-rows) would
        # parallelize a Python RDD and pay a Python-worker round-trip per
        # write job — ~3 s per commit vs ~0.1 s for this path. Arrow can't
        # carry MapType portably, so props travels as JSON and is rebuilt
        # with from_json.
        import json

        import pandas as pd

        pdf = pd.DataFrame(
            {
                "kind": [r[0] for r in rows],
                "key": [r[1] for r in rows],
                "props_json": [
                    None if r[2] is None else json.dumps(r[2]) for r in rows
                ],
                "seq": pd.array([r[3] for r in rows], dtype="int64"),
                "tombstone": [r[4] for r in rows],
            }
        )
        df = self.spark.createDataFrame(pdf).select(
            "kind",
            "key",
            F.from_json("props_json", "map<string,string>").alias("props"),
            "seq",
            "tombstone",
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

    @contextmanager
    def batch(self):
        """Buffer every put/delete inside the block and flush them as ONE log
        segment (one commit) on exit. Seq order is the call order, so
        overwrite-after-seed and tombstone-after-overwrite resolve exactly as
        the equivalent sequence of individual commits — at 1/Nth the write
        cost. The scale rationale: a commit is a full Spark write job; batch
        callers pay one.

        Atomic on failure: if the with-body raises, the buffered mutations
        are DISCARDED (nothing reaches the log), so a half-built seed or
        overwrite sequence never partially commits."""
        if self._buffer is not None:  # nested batch: outer flush wins
            yield self
            return
        self._buffer = []
        try:
            yield self
        except BaseException:
            self._buffer = None
            raise
        rows, self._buffer = self._buffer, None
        if rows:
            self._append(rows)

    def put(self, kind: str, key: str, props: dict[str, str]) -> None:
        """K9: create-or-replace entity by key (datastore.py:17-26 — the
        reference's per-property put loop has single-upsert intent)."""
        self._append([(kind, str(key), dict(props), self._next_seq(), False)])

    def put_many(self, kind: str, entities: dict[str, dict[str, str]]) -> None:
        """Batch upsert: one log segment for N entities (the write shape to
        prefer — per-entity puts cost one commit each)."""
        self._append(
            [
                (kind, str(k), dict(p), self._next_seq(), False)
                for k, p in entities.items()
            ]
        )

    def put_auto(self, kind: str, props: dict[str, str]) -> str:
        """K9 autokey flavor (datastore.py:19-20 allocates an id-less key)."""
        key = uuid.uuid4().hex
        self.put(kind, key, props)
        return key

    def delete(self, kind: str, key: str) -> None:
        """K10: delete by key (datastore.py:28-29) — tombstone append."""
        self._append([(kind, str(key), None, self._next_seq(), True)])

    # -- read path ---------------------------------------------------------
    def _resolved(self) -> DataFrame:
        try:
            log = self.spark.read.schema(SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], SCHEMA)
        w = Window.partitionBy("kind", "key").orderBy(F.desc("seq"))
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (~F.col("tombstone")))
            .drop("__rn", "tombstone")
        )

    def query(
        self, kind: str, filter: tuple[str, str, str] | None = None
    ) -> list[dict]:
        """S7: fetch all entities of a kind with an optional single
        (prop, op, value) predicate (datastore.py:10-15)."""
        df = self._resolved().filter(F.col("kind") == kind)
        if filter is not None:
            prop, op, value = filter
            c = F.col("props").getItem(prop)
            ops = {
                "=": c == value, "==": c == value, ">": c > value,
                "<": c < value, ">=": c >= value, "<=": c <= value,
                "!=": c != value,
            }
            df = df.filter(ops[op])
        return [
            {"kind": r["kind"], "key": r["key"], **(r["props"] or {})}
            for r in df.collect()
        ]

    def get(self, kind: str, key: str) -> dict | None:
        rows = (
            self._resolved()
            .filter((F.col("kind") == kind) & (F.col("key") == str(key)))
            .collect()
        )
        if not rows:
            return None
        r = rows[0]
        return {"kind": r["kind"], "key": r["key"], **(r["props"] or {})}

    # -- maintenance -------------------------------------------------------
    def compact(self) -> None:
        """Rewrite the log to its resolved state (bounds read amplification;
        on a cluster this is the periodic compaction job)."""
        resolved = self._resolved().withColumn(
            "tombstone", F.lit(False)
        ).select(*[f.name for f in SCHEMA.fields])
        tmp = self.path + ".compact"
        resolved.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.schema(SCHEMA).parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
