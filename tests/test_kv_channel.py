"""KV facade (datastore.py analogue) + message channel
(transfer_sercom_files.py analogue) tests."""

from __future__ import annotations

import base64
import json

from data_engineer_development_spark.channel import (
    Channel,
    build_transfer_messages,
)
from data_engineer_development_spark.kv import KVStore


def test_kv_put_get_update_delete(spark, tmp_path):
    kv = KVStore(spark, str(tmp_path / "kv"))
    kv.put("partner", "p1", {"name": "alpha", "ord": "1"})
    kv.put("partner", "p2", {"name": "beta", "ord": "2"})
    assert kv.get("partner", "p1")["name"] == "alpha"

    # upsert replaces (K9: create-or-update, datastore.py:17-26)
    kv.put("partner", "p1", {"name": "alpha2", "ord": "9"})
    assert kv.get("partner", "p1")["name"] == "alpha2"

    # filtered scan (S7: single predicate, datastore.py:10-15)
    hits = kv.query("partner", filter=("ord", ">", "5"))
    assert [h["key"] for h in hits] == ["p1"]
    assert len(kv.query("partner")) == 2

    # delete (K10, datastore.py:28-29)
    kv.delete("partner", "p2")
    assert kv.get("partner", "p2") is None
    assert len(kv.query("partner")) == 1

    # autokey (datastore.py:19-20)
    k = kv.put_auto("partner", {"name": "gamma"})
    assert kv.get("partner", k)["name"] == "gamma"

    # compaction preserves resolved state
    kv.compact()
    assert kv.get("partner", "p1")["name"] == "alpha2"
    assert kv.get("partner", "p2") is None
    assert len(kv.query("partner")) == 2


def test_kv_put_many_batch(spark, tmp_path):
    kv = KVStore(spark, str(tmp_path / "kv"))
    kv.put_many("nation", {str(i): {"name": f"n{i}"} for i in range(4)})
    assert len(kv.query("nation")) == 4

    # a later single put wins over the batch row for the same key
    kv.put("nation", "0", {"name": "replaced"})
    assert kv.get("nation", "0")["name"] == "replaced"

    # and a later batch wins over earlier singles
    kv.put_many("nation", {"1": {"name": "rebatch"}})
    assert kv.get("nation", "1")["name"] == "rebatch"


def test_channel_roundtrip_batch(spark, tmp_path):
    ch = Channel(str(tmp_path), "transfer_requests")
    msgs = build_transfer_messages(
        [
            {"source": "ftps://h:990/out/*?u=x", "destination": "landing://a/",
             "remove_file": True},
            {"source": "sftp://h2/report_{date}.csv", "destination": "landing://b/"},
        ],
        run_date="2026_08_13",
        now_iso="2026-08-13T00:00:00",
    )
    ch.publish(msgs)
    got = ch.read_batch(spark).collect()
    assert len(got) == 2
    by_dst = {r["destination_connection_string"]: r for r in got}
    assert by_dst["landing://b/"]["source_connection_string"] == (
        "sftp://h2/report_2026_08_13.csv"
    )
    assert by_dst["landing://a/"]["remove_file"] is True
    assert by_dst["landing://b/"]["remove_file"] is False


def test_channel_envelope_is_base64_json(tmp_path):
    ch = Channel(str(tmp_path), "t2")
    path = ch.publish([{"a": 1}])
    line = open(path).read().strip()
    assert json.loads(base64.b64decode(line)) == {"a": 1}


def test_channel_publish_df_and_stream(spark, tmp_path):
    from pyspark.sql import functions as F

    ch = Channel(str(tmp_path), "t3")
    df = spark.range(3).select(
        F.concat(F.lit("src"), F.col("id")).alias("source_connection_string"),
        F.lit("dst").alias("destination_connection_string"),
        F.lit(False).alias("remove_file"),
        F.lit("2026-08-13T00:00:00").alias("event_date"),
    )
    ch.publish_df(df)

    stream = ch.read_stream(spark)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("chan_t3")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("chan_t3").collect()
    assert sorted(r["source_connection_string"] for r in rows) == [
        "src0", "src1", "src2",
    ]


def test_kv_batch_is_one_segment(spark, tmp_path):
    import glob

    kv = KVStore(spark, str(tmp_path / "kv"))
    with kv.batch():
        kv.put_many("n", {str(i): {"name": f"n{i}"} for i in range(5)})
        kv.put("n", "0", {"name": "OVERWRITTEN"})  # later call wins
        kv.delete("n", "1")
        # nothing on disk until the batch flushes
        assert glob.glob(str(tmp_path / "kv" / "*.parquet")) == []
    # exactly one part file: one commit for the whole mutation history
    assert len(glob.glob(str(tmp_path / "kv" / "*.parquet"))) == 1
    resolved = {e["key"]: e["name"] for e in kv.query("n")}
    assert resolved == {"0": "OVERWRITTEN", "2": "n2", "3": "n3", "4": "n4"}


def test_kv_seq_strictly_monotonic(spark, tmp_path):
    # rapid-fire puts in one process must still resolve in call order even
    # if time_ns() repeats (the seq generator guards monotonicity itself)
    import time

    kv = KVStore(spark, str(tmp_path / "kv"))
    # force time_ns() < _last_seq for the next ~hour of wall clock
    kv._last_seq = time.time_ns() + 3_600 * 10**9
    kv.put("k", "a", {"name": "v1"})
    kv.put("k", "a", {"name": "v2"})
    kv.put("k", "a", {"name": "v3"})
    assert kv.get("k", "a")["name"] == "v3"
