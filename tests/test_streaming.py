"""Structured Streaming: windowed counts (availableNow) and custom
stateful operators (applyInPandasWithState) over a file stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from convml_data_spark import streaming
from convml_data_spark.streaming import stateful


def _write_batches(spark, path):
    rows1 = [(1, "a"), (2, "a"), (3, "b")]
    rows2 = [(4, "a"), (5, "c"), (6, "b")]
    spark.createDataFrame(rows1, "id long, k string").write.parquet(os.path.join(path, "b1"))
    spark.createDataFrame(rows2, "id long, k string").write.parquet(os.path.join(path, "b2"))
    return path


def test_streaming_seen_filter_dedups_across_batches(spark, tmp_path):
    path = _write_batches(spark, str(tmp_path))
    stream = (
        spark.readStream.schema("id long, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/*")
    )
    out = stateful.streaming_seen_filter(stream, key_col="k", id_col="id")
    result = streaming.run_available_now(out, output_mode="append")
    got = {r["k"]: r["id"] for r in result.collect()}
    # exactly one row per key, the min id of its first-seen batch
    assert set(got) == {"a", "b", "c"}
    assert got["b"] == 3 and got["c"] == 5


def test_watermark_drops_too_late_rows(spark, tmp_path):
    """Update-mode windowed counts with a 2-day watermark across CHECKPOINT-
    chained runs (deterministic batch order): a row arriving after its
    window expired must be dropped; on-time rows still aggregate."""
    data = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")

    def append(rows):
        spark.createDataFrame(rows, "id long, ts_s string").coalesce(1).write.mode(
            "append"
        ).parquet(data)

    def drain():
        stream = spark.readStream.schema("id long, ts_s string").parquet(data)
        agg = (
            stream.withColumn("ts", F.to_timestamp("ts_s"))
            .withWatermark("ts", "2 days")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
        )
        rows = streaming.drain_available_now(agg, checkpoint=ckpt, output_mode="update")
        return {str(r["window_start"]): r["n"] for r in rows}

    # run 1: on-time rows; watermark advances to Jan 5 06:00 − 2d = Jan 3
    append([(1, "2024-01-01 06:00:00"), (2, "2024-01-05 06:00:00")])
    r1 = drain()
    assert r1.get("2024-01-01 00:00:00") == 1 and r1.get("2024-01-05 00:00:00") == 1

    # run 2: a day-1 row is now beyond the watermark → dropped, no update
    append([(3, "2024-01-01 07:00:00")])
    assert drain() == {}

    # run 3: an on-time day-5 row still updates its live window
    append([(4, "2024-01-05 08:00:00")])
    assert drain() == {"2024-01-05 00:00:00": 2}


def test_streaming_running_counts(spark, tmp_path):
    path = _write_batches(spark, str(tmp_path))
    stream = spark.readStream.schema("id long, k string").parquet(path + "/*")
    out = stateful.streaming_running_counts(stream, key_col="k")
    result = streaming.run_available_now(out, output_mode="update")
    # final state: a→3, b→2, c→1 (take the max per key across batches)
    final = {
        r["k"]: r["mx"]
        for r in result.groupBy("k").agg(F.max("running_count").alias("mx")).collect()
    }
    assert final == {"a": 3, "b": 2, "c": 1}
