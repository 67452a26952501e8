"""Source-connector tests: schema-enforced CSV/JSON, corrupt-row routing,
binaryFile ingestion, and partition-pruned discovery of a split-by-time
dataset (S8 → read path). Plan assertions pin the 100 TB-relevant
properties: partition predicates become PartitionFilters (directory
pruning), not post-scan filters."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from convml_data_spark import pipeline, sources


def _explain(df) -> str:
    # extended, not formatted: Spark 4.1's formatted mode elides the
    # FileScan detail lines (Location/PartitionFilters) for pure-partition
    # scans, while extended prints the full FileScan node
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    return buf.getvalue()


def test_csv_round_trip_and_corrupt_routing(spark, tmp_path):
    path = os.path.join(str(tmp_path), "c.csv")
    with open(path, "w") as f:
        f.write("id,name,score\n1,a,0.5\n2,b,oops\n3,c,1.5\n")
    schema = "id INT, name STRING, score DOUBLE"
    clean = sources.read_csv(spark, path, schema)
    assert sorted((r.id, r.name, r.score) for r in clean.collect()) == [
        (1, "a", 0.5),
        (3, "c", 1.5),
    ]
    assert clean.columns == ["id", "name", "score"]  # corrupt col dropped
    kept = sources.read_csv(spark, path, schema, keep_corrupt=True)
    bad = kept.where(F.col(sources.files.CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1 and "oops" in bad[0][sources.files.CORRUPT_COL]


def test_json_requires_schema_no_inference(spark, tmp_path):
    path = os.path.join(str(tmp_path), "d.jsonl")
    with open(path, "w") as f:
        f.write('{"id": 1, "v": 2.0}\n{"id": "NOT_AN_INT", "v": 3.0}\n')
    df = sources.read_json(spark, path, "id BIGINT, v DOUBLE")
    assert [(r.id, r.v) for r in df.collect()] == [(1, 2.0)]


def test_binary_files_glob(spark, tmp_path):
    for name, data in [("a.png", b"\x89PNG123"), ("b.txt", b"nope")]:
        with open(os.path.join(str(tmp_path), name), "wb") as f:
            f.write(data)
    df = sources.read_binary_files(spark, str(tmp_path), glob="*.png")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 1
    assert rows[0].path.endswith("a.png")
    assert rows[0].length == 7 and bytes(rows[0].content) == b"\x89PNG123"


def test_partitioned_read_prunes_directories(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-01 03:00:00"), (2, "2024-01-02 05:00:00"), (3, "2024-01-03 07:00:00")],
        "id int, ts string",
    ).select("id", F.to_timestamp("ts").alias("t"))
    base = os.path.join(str(tmp_path), "split")
    assert pipeline.split_by_time_partition(df, base, time_col="t") is True

    back = sources.read_partitioned(spark, base)
    assert "_part" in back.columns  # partition dir surfaced as a column
    one_day = back.where(F.col("_part") == "2024-01-02")
    assert [r.id for r in one_day.collect()] == [2]
    plan = _explain(one_day)
    # the predicate must prune at directory level (PartitionFilters on the
    # FileScan), leaving no post-scan data filter
    assert "PartitionFilters: [isnotnull(_part" in plan
    assert "= 2024-01-02" in plan
    assert "DataFilters: []" in plan


def test_read_text_lines_and_whole(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t.txt")
    with open(path, "w") as f:
        f.write("line one\nline two\n")
    assert sources.read_text(spark, path).count() == 2
    whole = sources.read_text(spark, path, whole_file=True).collect()
    assert len(whole) == 1 and whole[0].value == "line one\nline two\n"


def test_dbtarget_yaml_roundtrip_reference_format(spark, tmp_path):
    """DBTarget compat (reference utils/luigi.py:91-117): a keyed-dict
    relation round-trips through the {db_name}.yml layout, and the file is
    readable by plain yaml.load exactly as the reference would."""
    import yaml

    from convml_data_spark.sources import dbtarget

    df = spark.createDataFrame(
        [("goes16__202003011300", "vis_a.nc", "ir_a.nc"),
         ("goes16__202003011400", "vis_b.nc", "ir_b.nc")],
        "scene_id string, vis string, ir string",
    )
    p = dbtarget.df_to_db(df, str(tmp_path), "scene_ids", key_col="scene_id")
    assert p.endswith("scene_ids.yml")
    assert dbtarget.exists_db(str(tmp_path), "scene_ids")
    # reference-side read: plain yaml load gives the keyed-dict shape
    with open(p) as fh:
        obj = yaml.safe_load(fh)
    assert obj["goes16__202003011300"] == {"vis": "vis_a.nc", "ir": "ir_a.nc"}
    back = dbtarget.db_to_df(spark, str(tmp_path), "scene_ids", key_col="scene_id")
    assert sorted(tuple(r) for r in back.select("scene_id", "vis", "ir").collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # json flavor too
    dbtarget.write_db(str(tmp_path), "meta", {"n": 2}, db_type="json")
    assert dbtarget.read_db(str(tmp_path), "meta", db_type="json") == {"n": 2}


def test_cf_metadata_survives_parquet_roundtrip(spark, tmp_path):
    """CF attrs (units/long_name) attached at the user-function layer must
    survive a parquet sink + re-read — the reference ASSERTS units on its
    ERA5 scalars (sources/era5/scalars.py:61-63)."""
    from convml_data_spark.functions.userfuncs import UserFunctionRegistry

    reg = UserFunctionRegistry()

    @reg.register("lwp_ratio", inputs=["a", "b"], units="1", long_name="liquid water path ratio")
    def _lwp(a, b):
        return a / (a + b)

    df = spark.createDataFrame([(1.0, 3.0), (2.0, 2.0)], "a double, b double")
    out = reg.apply(df, "lwp_ratio")
    meta = out.schema["lwp_ratio"].metadata
    assert meta == {"units": "1", "long_name": "liquid water path ratio"}
    path = str(tmp_path / "cf")
    assert pipeline.materialize(out, path) is True
    back = spark.read.parquet(path)
    assert back.schema["lwp_ratio"].metadata == meta


def test_fetch_executor_local_backend(spark, tmp_path):
    """execute_fetch_manifest with the local-mirror backend: fetches every
    manifest row, re-runs skip existing files (the reference's
    file-existence incrementality), missing sources report error rows
    after bounded retries without failing the job."""
    from convml_data_spark.sources import fetch_exec

    src = tmp_path / "mirror"
    src.mkdir()
    for i in range(4):
        (src / f"f{i}.nc").write_bytes(b"x" * (10 + i))
    rows = [(f"f{i}.nc", str(src / f"f{i}.nc")) for i in range(4)]
    rows.append(("missing.nc", str(src / "nope.nc")))
    manifest = spark.createDataFrame(rows, "filename string, remote_path string")
    dest = tmp_path / "dest"

    led = fetch_exec.execute_fetch_manifest(
        manifest, str(dest), fetcher=fetch_exec.local_file_fetcher,
        max_attempts=2, backoff_s=0.0,
    ).collect()
    by = {r["filename"]: r for r in led}
    assert sum(r["status"] == "fetched" for r in led) == 4
    assert by["missing.nc"]["status"] == "error"
    assert by["missing.nc"]["attempts"] == 2
    for i in range(4):
        assert (dest / f"f{i}.nc").read_bytes() == b"x" * (10 + i)
        assert by[f"f{i}.nc"]["n_bytes"] == 10 + i

    # idempotent re-run: everything that landed is skipped, not re-copied
    led2 = fetch_exec.execute_fetch_manifest(
        manifest, str(dest), fetcher=fetch_exec.local_file_fetcher,
        max_attempts=1, backoff_s=0.0,
    ).collect()
    assert sum(r["status"] == "skipped" for r in led2) == 4

    # the gated default fetcher is a loud misconfiguration, not a retry
    import pytest as _pytest

    with _pytest.raises(Exception, match="no network transport"):
        fetch_exec.execute_fetch_manifest(
            spark.createDataFrame([("a", "b")], "filename string, remote_path string"),
            str(dest / "x"),
        ).collect()


def test_fetch_executor_urllib_backend_file_urls(spark, tmp_path):
    """urllib_fetcher streams file:// URLs (the offline stand-in for the
    production http(s):// path) through the same manifest executor; a
    failing URL leaves NO .__part_* temp junk behind (per-attempt
    cleanup)."""
    from convml_data_spark.sources import fetch_exec

    src = tmp_path / "mirror"
    src.mkdir()
    payload = b"streamed-bytes" * 1000
    (src / "big.nc").write_bytes(payload)
    rows = [
        ("big.nc", (src / "big.nc").as_uri()),
        ("gone.nc", (src / "gone.nc").as_uri()),
    ]
    manifest = spark.createDataFrame(rows, "filename string, remote_path string")
    dest = tmp_path / "dest"
    led = fetch_exec.execute_fetch_manifest(
        manifest, str(dest), fetcher=fetch_exec.urllib_fetcher,
        max_attempts=2, backoff_s=0.0,
    ).collect()
    by = {r["filename"]: r for r in led}
    assert by["big.nc"]["status"] == "fetched"
    assert by["big.nc"]["n_bytes"] == len(payload)
    assert (dest / "big.nc").read_bytes() == payload
    assert by["gone.nc"]["status"] == "error"
    leftovers = [p.name for p in dest.iterdir() if "__part_" in p.name]
    assert leftovers == []
