"""TIMESTAMP_NTZ robustness — round-3 regression class.

The driver's parquet testdata switched from timestamp[ns] to timestamp[us]
(isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ; unix_micros
rejects NTZ outright and to_utc_timestamp silently re-interprets it through
the session timezone. Two defense layers are pinned here:

1. ``tables.load_table`` normalizes NTZ columns to TIMESTAMP (exact under
   the pinned-UTC session) so entry-file queries see instants, with filter
   pushdown surviving the cast;
2. the time-keyed operators (asof_join, infer_min_spacing, sessionize)
   accept raw NTZ frames directly via the dtype-aware
   ``timeutils.epoch_micros`` and return identical results either way.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from convml_data_spark import tables
from convml_data_spark.functions.timeutils import epoch_micros
from convml_data_spark.operators import asof, windows
from tests.conftest import SF_DIR

BASE = datetime(2024, 1, 1)


def _frames(spark, ntz: bool):
    cast_to = "timestamp_ntz" if ntz else "timestamp"
    left = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=37 * i)) for i in range(40)],
        "lid long, t_l timestamp",
    ).withColumn("t_l", F.col("t_l").cast(cast_to))
    right = spark.createDataFrame(
        [(j, BASE + timedelta(seconds=50 * j + 3)) for j in range(30)],
        "rid long, t_r timestamp",
    ).withColumn("t_r", F.col("t_r").cast(cast_to))
    return left, right


def test_epoch_micros_ntz_equals_ltz(spark):
    df = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=7 * i, microseconds=i)) for i in range(20)],
        "i long, t timestamp",
    )
    both = df.select(
        epoch_micros("t", "timestamp").alias("ltz"),
        epoch_micros(F.col("t").cast("timestamp_ntz"), "timestamp_ntz").alias("ntz"),
    )
    assert both.where(F.col("ltz") != F.col("ntz")).count() == 0


def test_asof_join_accepts_ntz_frames(spark):
    lt, rt = _frames(spark, ntz=False)
    ln, rn = _frames(spark, ntz=True)
    want = {
        (r["lid"], r["matched_rid"])
        for r in asof.asof_join(lt, rt, "t_l", "t_r", tolerance_seconds=20.0).collect()
    }
    got = {
        (r["lid"], r["matched_rid"])
        for r in asof.asof_join(ln, rn, "t_l", "t_r", tolerance_seconds=20.0).collect()
    }
    assert want and got == want


def test_min_spacing_and_sessionize_accept_ntz(spark):
    lt, _ = _frames(spark, ntz=False)
    ln, _ = _frames(spark, ntz=True)
    assert asof.infer_min_spacing(lt, "t_l") == asof.infer_min_spacing(ln, "t_l") == 37.0

    ev = spark.createDataFrame(
        [(i, i % 3, BASE + timedelta(seconds=i * i), float(i)) for i in range(30)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    def sessions(df):
        out = windows.sessionize(df, ["user_id"], "ts", gap_seconds=60.0, tiebreak=["event_id"])
        return {(r["user_id"], r["session_id"], r["n_events"]) for r in out.collect()}

    assert sessions(ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))) == sessions(ev)


def test_load_table_normalizes_ntz_and_keeps_pushdown(spark):
    ev = tables.load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    filtered = ev.where(F.col("ts") > F.to_timestamp(F.lit("2024-01-05 00:00:00")))
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("GreaterThan(ts" in ln for ln in pushed)
