"""Structured Streaming: windowed counts (availableNow) and custom
stateful operators (applyInPandasWithState) over a file stream."""

from __future__ import annotations

import os

import pytest
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


@pytest.mark.nightly  # heavy lifecycle audit; driver-budget deselect (r18)
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


@pytest.mark.nightly  # heavy lifecycle audit; driver-budget deselect (r18)
def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Append-mode streaming sessionization across checkpoint-chained runs:
    sessions flush exactly when the watermark passes their close, and the
    full emitted set equals the batch sessionizer over the same events."""
    from convml_data_spark.operators import windows as W

    data = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts_s string, value double"

    def append(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(data)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .parquet(data)
            .withColumn("ts", F.to_timestamp("ts_s"))
        )
        out = streaming.stream_sessionize(
            stream, "user_id", "ts", gap="30 minutes", watermark="1 hour"
        )
        return streaming.drain_available_now(out, checkpoint=ckpt, output_mode="append")

    # two sessions for user 1 (gap > 30 min), one for user 2
    batch1 = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:10:00", 2.0),
        (1, "2024-01-01 12:00:00", 4.0),
        (2, "2024-01-01 11:00:00", 8.0),
    ]
    append(batch1)
    r1 = drain()
    # watermark after run 1 = 12:00 − 1h = 11:00 → only the 10:00–10:10
    # session (closes 10:40) has been passed by the watermark
    assert {(r["user_id"], str(r["session_start"])) for r in r1} == {
        (1, "2024-01-01 10:00:00")
    }

    # a far-future event closes everything else
    append([(2, "2024-01-02 09:00:00", 16.0)])
    r2 = drain()
    emitted = r1 + r2

    events = spark.createDataFrame(batch1 + [(2, "2024-01-02 09:00:00", 16.0)], schema)
    events = events.select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    batch = W.sessionize(events, ["user_id"], "ts", 1800.0, method="native")
    want = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"], float(r["sum_value"]))
        for r in batch.collect()
        # the sentinel's own session is still open (watermark never passed it)
        if str(r["session_start"]) != "2024-01-02 09:00:00"
    }
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"], float(r["sum_value"]))
        for r in emitted
    }
    assert got == want


def test_drain_to_parquet_engine_sink(spark, tmp_path):
    """Engine sink: foreachBatch parquet appends are readable back and a
    checkpoint-chained re-run appends ONLY newly arrived files."""
    data = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(data)
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string").write.parquet(
        data + "/b1"
    )

    def agg():
        stream = spark.readStream.schema("id long, k string").parquet(data + "/*")
        return stream.groupBy("k").agg(F.count("*").alias("n"))

    streaming.drain_to_parquet(agg(), checkpoint=ckpt, out_path=sink, output_mode="update")
    first = {(r["k"], r["n"]) for r in spark.read.parquet(sink).collect()}
    assert first == {("a", 1), ("b", 1)}

    spark.createDataFrame([(3, "a")], "id long, k string").write.parquet(data + "/b2")
    streaming.drain_to_parquet(agg(), checkpoint=ckpt, out_path=sink, output_mode="update")
    rows = spark.read.parquet(sink).collect()
    # update-mode re-emits revised groups; latest batch id wins per key
    latest = {}
    for r in rows:
        if r["k"] not in latest or r["_batch_id"] > latest[r["k"]][1]:
            latest[r["k"]] = (r["n"], r["_batch_id"])
    assert {k: v[0] for k, v in latest.items()} == {"a": 2, "b": 1}


def test_stream_table_handles_file_and_directory_layouts(spark, tmp_path):
    """stream_table must yield the same rows whether {name}.parquet is a
    single file (driver layout: needs dir + glob) or a directory of part
    files (Spark writer layout: glob would silently match nothing)."""
    from convml_data_spark import streaming, tables

    src = tables.load_table(spark, "/root/testdata/sf0.001", "events")
    n = src.count()
    d = str(tmp_path / "dirfmt")
    src.write.parquet(d + "/events.parquet")

    for sf_dir in ("/root/testdata/sf0.001", d):
        batch, stream = streaming.stream_table(spark, sf_dir, "events")
        assert batch.count() == n
        out = streaming.run_available_now(
            stream.groupBy().count(), output_mode="complete"
        )
        assert out.first()["count"] == n
        assert dict(batch.dtypes)["ts"] == "timestamp"


def test_stream_static_join_enriches_every_batch(spark, tmp_path):
    """Stream-static join: the broadcast dimension enriches the stream per
    micro-batch; drained counts match the batch join exactly."""
    import os

    from pyspark.sql import functions as F

    from convml_data_spark import streaming

    path = str(tmp_path / "stream_src")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", f"2024-01-0{1 + i % 3} 06:00:00") for i in range(30)],
        "id long, k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    dim = spark.createDataFrame([("a", 10), ("b", 20)], "k string, wt int")
    enriched = streaming.stream_static_join(stream, dim, "k")
    sdf = streaming.stream_windowed_counts(
        spark, path, None, group_cols=("k", "wt"), source=enriched
    )
    rows = streaming.run_available_now(sdf).collect()
    out = {(r["window_start"], r["k"], r["wt"]): r["n"] for r in rows}
    batch = {
        (r["d"], r["k"], r["wt"]): r["n"]
        for r in df.join(dim, "k")
        .groupBy(F.date_trunc("day", "ts").alias("d"), "k", "wt")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out == batch
    assert sum(out.values()) == 30
    assert {(k, w) for (_, k, w) in out} == {("a", 10), ("b", 20)}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream inner join with a time bound: the
    AvailableNow drain equals the batch interval join exactly."""
    from pyspark.sql import functions as F

    from convml_data_spark import streaming

    path = str(tmp_path / "ss_src")
    rows = []
    for u in range(3):
        for h in range(6):
            rows.append((u * 100 + h, u, "L", f"2024-01-01 {h:02d}:00:00"))
            rows.append((u * 1000 + h, u, "R", f"2024-01-01 {h:02d}:30:00"))
    df = spark.createDataFrame(rows, "id long, u long, side string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.coalesce(1).write.parquet(path)
    stream = lambda: spark.readStream.schema(df.schema).parquet(path)
    left = stream().where(F.col("side") == "L").select(
        F.col("u").alias("lu"), F.col("id").alias("lid"), F.col("ts").alias("lts")
    )
    right = stream().where(F.col("side") == "R").select(
        F.col("u").alias("ru"), F.col("id").alias("rid"), F.col("ts").alias("rts")
    )
    joined = streaming.stream_stream_interval_join(
        left, right, [("lu", "ru")], "lts", "rts", lower_s=0, upper_s=5400
    )
    got = {
        (r["lid"], r["rid"])
        for r in streaming.run_available_now(joined, output_mode="append").collect()
    }
    batch = df.where(F.col("side") == "L").alias("l").join(
        df.where(F.col("side") == "R").alias("r"),
        (F.col("l.u") == F.col("r.u"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 5400 SECOND")),
    )
    expect = {
        (r[0], r[1])
        for r in batch.select(F.col("l.id"), F.col("r.id")).collect()
    }
    assert got == expect and len(got) == 3 * (6 + 5)


@pytest.mark.nightly  # heavy lifecycle audit; driver-budget deselect (r18)
def test_stream_countmin_partials_merge_to_batch_sketch(spark, tmp_path):
    """Mergeable-sketch ingestion (drain_partial_to_parquet): a 3-file
    stream drained one file per micro-batch leaves three independent
    partial Count-Min sketches whose cellwise sum EQUALS the batch
    sketch over the union — the sketch contract under continuous
    arrival, with zero streaming state."""
    import os

    from pyspark.sql import functions as F

    from convml_data_spark import streaming
    from convml_data_spark.operators import corpus

    src = tmp_path / "docs"
    rows = [(i, f"w{i % 5} w{i % 3} common") for i in range(30)]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    for k in range(3):
        full.where(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    batch = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = tmp_path / "cells"
    streaming.drain_partial_to_parquet(
        stream,
        lambda b: corpus.countmin_sketch(b, depth=2, width=4),
        checkpoint=str(tmp_path / "ckpt"),
        out_path=str(out),
    )
    part_files = spark.read.parquet(str(out))
    # genuinely multi-batch: >1 distinct batch id wrote partials
    n_batches = part_files.select("_batch_id").distinct().count()
    assert n_batches >= 2
    merged = {
        (r["r"], r["c"]): r["s"]
        for r in part_files.groupBy("r", "c")
        .agg(F.sum("counter").alias("s"))
        .collect()
    }
    expect = {
        (r["r"], r["c"]): r["counter"]
        for r in corpus.countmin_sketch(batch, depth=2, width=4).collect()
    }
    assert merged == expect
    # restart with the same checkpoint: nothing new arrives, partials stand
    stream2 = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    streaming.drain_partial_to_parquet(
        stream2,
        lambda b: corpus.countmin_sketch(b, depth=2, width=4),
        checkpoint=str(tmp_path / "ckpt"),
        out_path=str(out),
    )
    again = {
        (r["r"], r["c"]): r["s"]
        for r in spark.read.parquet(str(out))
        .groupBy("r", "c")
        .agg(F.sum("counter").alias("s"))
        .collect()
    }
    assert again == expect
    # at-least-once REPLAY of an already-written batch (crash between the
    # parquet write and the checkpoint commit): the idempotent per-batch
    # write overwrites exactly its own _batch_id partition, so the merged
    # sketch is unchanged — a blind append would double-count the batch
    some_bid = spark.read.parquet(str(out)).agg(F.min("_batch_id")).first()[0]
    replay_partial = (
        spark.read.parquet(str(out))
        .where(F.col("_batch_id") == some_bid)
        .drop("_batch_id")
        # snapshot driver-side: the write below overwrites the very
        # partition this plan would lazily re-read
        .collect()
    )
    streaming.write_batch_partial(
        spark.createDataFrame(replay_partial), int(some_bid), str(out)
    )
    replayed = {
        (r["r"], r["c"]): r["s"]
        for r in spark.read.parquet(str(out))
        .groupBy("r", "c")
        .agg(F.sum("counter").alias("s"))
        .collect()
    }
    assert replayed == expect
