"""Custom stateful streaming operator: applyInPandasWithState
sessionization (streaming/stateful.py)."""

import os

from pyspark.sql import types as T


def test_sessionize_stream_eager_and_timeout(spark, tmp_path):
    from biocache_store_spark.streaming.stateful import sessionize_stream

    staging = tmp_path / "in"
    staging.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # batch 1: u1 two events inside one session; u2 a lone event
    f1 = staging / "a.csv"
    f1.write_text(
        "user_id,ts\n"
        "1,2024-01-01 10:00:00\n"
        "1,2024-01-01 10:05:00\n"
        "2,2024-01-01 09:00:00\n"
    )
    # batch 2: u1 three hours later -> eagerly closes u1's first session;
    # the advanced watermark passes u2's (09:00 + gap) timeout -> u2's open
    # session flushes via EventTimeTimeout
    f2 = staging / "b.csv"
    f2.write_text("user_id,ts\n1,2024-01-01 13:00:00\n")
    # file source orders batches by modification time: force a.csv first
    os.utime(f1, (1000000000, 1000000000))
    os.utime(f2, (1000000100, 1000000100))

    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(staging))
    )
    q = (
        sessionize_stream(raw, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("SELECT * FROM stateful_sessions").collect(),
        key=lambda r: r.user_id,
    )
    assert [(r.user_id, str(r.session_start), str(r.session_end), r.n_events) for r in rows] == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2),
        (2, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1),
    ]


def test_sessionize_stream_string_keys_and_nonutc_tz(spark, tmp_path):
    """The sessionizer must work with a string grouping key and a
    non-UTC session timezone (tz-skewed timeout timestamps previously
    crashed or stalled the flush)."""
    import json

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    try:
        from biocache_store_spark.streaming.stateful import sessionize_stream

        staging = tmp_path / "staging"
        staging.mkdir()
        rows = [
            {"device_id": "dA", "ts": "2024-01-01 00:00:00"},
            {"device_id": "dA", "ts": "2024-01-01 00:10:00"},
            # gap > 30min closes the first session eagerly
            {"device_id": "dA", "ts": "2024-01-01 02:00:00"},
        ]
        (staging / "d.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
        raw = (
            spark.readStream.schema("device_id string, ts timestamp")
            .json(str(staging))
        )
        out_dir = str(tmp_path / "out")
        q = (
            sessionize_stream(raw, gap_seconds=1800, user_col="device_id")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out_dir).collect()
        assert len(got) == 1
        assert got[0]["device_id"] == "dA" and got[0]["n_events"] == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
