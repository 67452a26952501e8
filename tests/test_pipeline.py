"""Pipeline shell (spec → scene table, incremental sinks), W6 sequential
scan, X2 dotted-name UDAF, G8 encode."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from convml_data_spark import pipeline
from convml_data_spark.operators import inference, multimodal, windows

SPEC = {
    "source": "synth",
    "inputs": ["ch1", "ch2"],
    "t_start": "2024-01-01T00:00:00",
    "t_end": "2024-01-03T00:00:00",
    "step": "1 hour",
    "offsets": {"ch2": "0 minutes"},
    "exclude_times": {"ch1": ["2024-01-01T05:00:00"]},
    "time_intervals": [["2024-01-01T00:00:00", "2024-01-02T00:00:00"]],
    "component_filters": {"hour": [0, 5, 6, 12, 18]},
}


def test_spec_compiles_to_scene_table(spark):
    spec = pipeline.SceneSpec.from_dict(SPEC)
    scenes = pipeline.build_scene_table(spark, spec)
    rows = scenes.select("scene_id", "t", "ch1", "ch2").collect()
    # day 1 hours {0,5,6,12,18} minus excluded hour 5 (incomplete scene)
    # = 4 complete scenes; interval filter is inclusive so day-2 hour 0 stays
    hours = sorted(r["t"].hour for r in rows if r["t"].day == 1)
    assert hours == [0, 6, 12, 18]
    assert all(r["scene_id"].startswith("synth__2024") for r in rows)
    assert all(r["ch1"] and r["ch2"] for r in rows)


def test_spec_from_yaml_file(spark, tmp_path):
    import yaml

    path = os.path.join(str(tmp_path), "meta.yaml")
    with open(path, "w") as fh:
        yaml.safe_dump(SPEC, fh)
    spec = pipeline.SceneSpec.from_yaml(path)
    assert spec.source == "synth" and spec.inputs == ["ch1", "ch2"]
    scenes = pipeline.build_scene_table(spark, spec)
    assert scenes.count() == 5  # 4 on day 1 + day-2 hour 0 (inclusive edge)


def test_materialize_is_incremental(spark, tmp_path):
    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("k"))
    path = os.path.join(str(tmp_path), "out")
    assert pipeline.materialize(df, path, partition_by=["k"]) is True
    assert pipeline.materialize(df, path, partition_by=["k"]) is False  # skip
    assert pipeline.materialize(df, path, partition_by=["k"], overwrite=True) is True
    back = spark.read.parquet(path)
    assert back.count() == 10
    # partitionBy produced k=0/1/2 directories (S10 partitioned sink)
    assert sorted(d for d in os.listdir(path) if d.startswith("k=")) == ["k=0", "k=1", "k=2"]


def test_split_by_time_partition(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-01 03:00:00"), (2, "2024-01-01 17:00:00"), (3, "2024-01-02 00:30:00")],
        "id int, ts string",
    ).select("id", F.to_timestamp("ts").alias("t"))
    path = os.path.join(str(tmp_path), "split")
    assert pipeline.split_by_time_partition(df, path, time_col="t") is True
    parts = sorted(d for d in os.listdir(path) if d.startswith("_part="))
    assert parts == ["_part=2024-01-01", "_part=2024-01-02"]


def test_cf_metadata_survives_parquet_roundtrip(spark, tmp_path):
    """SURVEY §7: CF units/long_name ride as column metadata and must
    survive a parquet round-trip (the reference ASSERTS on units)."""
    from convml_data_spark.functions.userfuncs import UserFunctionRegistry

    reg = UserFunctionRegistry()

    @reg.register("bt_norm", ["bt"], units="1", long_name="normalized brightness", bounded_01=True)
    def _f(bt):
        return (bt - 250.0) / 50.0

    df = spark.createDataFrame([(1, 260.0), (2, 280.0)], "id long, bt double")
    out = reg.apply(df, "bt_norm")
    path = os.path.join(str(tmp_path), "meta")
    out.write.parquet(path)
    back = spark.read.parquet(path)
    md = back.schema["bt_norm"].metadata
    assert md["units"] == "1" and md["long_name"] == "normalized brightness"


def test_materialize_json_format(spark, tmp_path):
    """S11: the DBTarget-analog small-relation JSON sink."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    path = os.path.join(str(tmp_path), "db")
    assert pipeline.materialize(df, path, fmt="json") is True
    back = spark.read.json(path)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_sequential_scan_carries_state(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 5.0), ("a", 3, 7.0), ("b", 1, 2.0), ("b", 2, 4.0)],
        "g string, step int, v double",
    )

    def running_max(state, row):
        state = max(state, row["v"])
        return state, {"g": row["g"], "step": row["step"], "running_max": state}

    out = windows.sequential_scan(
        df.repartition(5), ["g"], ["step"], running_max, float("-inf"),
        "g string, step int, running_max double",
    )
    got = {(r["g"], r["step"]): r["running_max"] for r in out.collect()}
    assert got == {("a", 1): 10.0, ("a", 2): 10.0, ("a", 3): 10.0, ("b", 1): 2.0, ("b", 2): 4.0}


def test_grouped_reduce_by_dotted_name(spark):
    df = spark.createDataFrame(
        [("x", 1.0), ("x", 3.0), ("y", 10.0)], "g string, v double"
    )
    out = inference.grouped_reduce_by_name(
        df, ["g"], "v", "numpy.mean", kwargs={"not_a_param": 1}
    )
    got = {r["g"]: r["value"] for r in out.collect()}
    assert got == {"x": 2.0, "y": 10.0}


def test_encode_png_stub_roundtrip(spark):
    docs = spark.range(3).select(F.col("id").alias("doc_id"))
    enc = multimodal.encode_png(multimodal.attach_fake_payload(docs, width=8, height=8))
    rows = {r["doc_id"]: bytes(r["png"]) for r in enc.collect()}
    for i in range(3):
        data = rows[i]
        if data[:7] == b"STUBPNG":
            w = int.from_bytes(data[7:11], "big")
            h = int.from_bytes(data[11:15], "big")
            assert (w, h) == (8, 8)
            px = multimodal.expected_fake_pixels(i, 8, 8).astype("uint8").tobytes()
            assert data[15:] == px
        else:
            assert data[:8] == b"\x89PNG\r\n\x1a\n"  # real PIL path
