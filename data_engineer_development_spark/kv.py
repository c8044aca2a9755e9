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
        os.makedirs(path, exist_ok=True)

    # -- write path --------------------------------------------------------
    def _append(self, rows: list[tuple]) -> None:
        df = self.spark.createDataFrame(rows, SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def put(self, kind: str, key: str, props: dict[str, str]) -> None:
        """K9: create-or-replace entity by key (datastore.py:17-26 — the
        reference's per-property put loop has single-upsert intent)."""
        self._append([(kind, str(key), dict(props), time.time_ns(), False)])

    def put_many(self, kind: str, entities: dict[str, dict[str, str]]) -> None:
        """Batch upsert: one log segment for N entities (the write shape to
        prefer — per-entity puts cost one commit each)."""
        base = time.time_ns()
        self._append(
            [
                (kind, str(k), dict(p), base + i, False)
                for i, (k, p) in enumerate(entities.items())
            ]
        )

    def put_auto(self, kind: str, props: dict[str, str]) -> str:
        """K9 autokey flavor (datastore.py:19-20 allocates an id-less key)."""
        key = uuid.uuid4().hex
        self.put(kind, key, props)
        return key

    def delete(self, kind: str, key: str) -> None:
        """K10: delete by key (datastore.py:28-29) — tombstone append."""
        self._append([(kind, str(key), None, time.time_ns(), True)])

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
