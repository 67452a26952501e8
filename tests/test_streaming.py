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
