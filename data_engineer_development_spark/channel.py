"""Message channel: base64(JSON) envelopes in a file directory
(SURVEY.md §2.2 K11, §2.9 F9; streaming reader §2.10).

Reference: /root/reference/airflow-dags/transfer_sercom_files.py:102-123 —
one Pub/Sub message per partner: ``base64(json.dumps(m))`` where ``m`` has
source/destination connection strings, a remove flag and an ISO event_date.

Spark-native restatement: a directory of text files, one base64(JSON) line
per message. Publishing appends a new file (atomic at the file level, like
a topic segment); consumption is either batch (``read_batch``) or a
Structured Streaming source (``read_stream``) — the streaming path is the
scale story, since a file-listing source parallelizes across executors and
checkpoints offsets exactly like any other stream.
"""

from __future__ import annotations

import base64
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

#: the transfer-command envelope of transfer_sercom_files.py:104-113
TRANSFER_MESSAGE_SCHEMA = StructType(
    [
        StructField("source_connection_string", StringType(), True),
        StructField("destination_connection_string", StringType(), True),
        StructField("remove_file", BooleanType(), True),
        StructField("event_date", StringType(), True),
    ]
)


class Channel:
    """A named topic backed by a directory of base64(JSON)-line files."""

    def __init__(self, root: str, topic: str):
        self.dir = os.path.join(root, topic)
        os.makedirs(self.dir, exist_ok=True)

    def publish(self, messages: list[dict]) -> str:
        """K11+F9: base64(json) one-per-line, one file per publish call
        (transfer_sercom_files.py:115-123 publishes one message per partner).
        Driver-side like the reference; returns the segment path."""
        path = os.path.join(self.dir, f"seg-{uuid.uuid4().hex}.txt")
        with open(path, "w") as f:
            for m in messages:
                f.write(base64.b64encode(json.dumps(m).encode()).decode() + "\n")
        return path

    def publish_df(self, df: DataFrame) -> None:
        """Distributed publish: encode a DataFrame's rows as envelopes —
        ``base64(to_json(struct(*)))`` stays JVM-side (F9)."""
        # Spark's base64 is RFC-2045 MIME (chunked with CRLF every 76 chars);
        # envelopes are one-per-line, so strip the chunk breaks.
        df.select(
            F.regexp_replace(
                F.base64(F.to_json(F.struct(*df.columns))), "[\\r\\n]", ""
            ).alias("value")
        ).write.mode("append").text(self.dir)

    def _decode(self, raw: DataFrame, schema: StructType) -> DataFrame:
        return raw.select(
            F.from_json(
                F.unbase64(F.col("value")).cast("string"), schema
            ).alias("m")
        ).select("m.*")

    def read_batch(
        self, spark: SparkSession, schema: StructType = TRANSFER_MESSAGE_SCHEMA
    ) -> DataFrame:
        return self._decode(spark.read.text(self.dir + "/*"), schema)

    def read_stream(
        self, spark: SparkSession, schema: StructType = TRANSFER_MESSAGE_SCHEMA
    ) -> DataFrame:
        """Structured Streaming source over the topic directory."""
        raw = spark.readStream.format("text").load(self.dir)
        return self._decode(raw, schema)


def build_transfer_messages(partners: list[dict], run_date: str, now_iso: str) -> list[dict]:
    """The reference's message-assembly logic (transfer_sercom_files.py:102-113):
    per partner, a dated source URI and a fixed destination prefix.
    ``run_date``/``now_iso`` are injected (no wall-clock in library code)."""
    out = []
    for p in partners:
        out.append(
            {
                "source_connection_string": p["source"].format(date=run_date),
                "destination_connection_string": p["destination"],
                "remove_file": bool(p.get("remove_file", False)),
                "event_date": now_iso,
            }
        )
    return out
