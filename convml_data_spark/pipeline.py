"""Dataset-spec front end + incremental materialization — the reference's
primary UX (SURVEY §3).

Reference semantics: a ``meta.yaml`` dict (source, products/inputs, time
range + filters, db format) is parsed by ``DataSource``
(convml_data/__init__.py:60-207) into a Luigi DAG whose first stage builds
the scene table (§3.1, pipeline/scene_sources.py:96-156). Incrementality is
target-existence: completed outputs are skipped (pipeline/utils.py:69-77).

Spark design: the spec compiles to ONE lazy DataFrame program —
per-input calendar scans → union → J1 pivot-join → F1/F2/F3 filters → E1
scene ids — which Catalyst optimizes whole. Materialization is job-level
(``materialize``: skip when the sink's _SUCCESS exists), exactly the
reference's semantics; it is deliberately NOT a Catalyst concern.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import (
    calendar_scan,
    datetime_component_filter,
    multi_input_scene_table,
    solar_zenith_filter,
    time_interval_filter,
)


def _parse_t(v) -> datetime:
    if isinstance(v, datetime):
        return v
    return datetime.fromisoformat(str(v))


@dataclass
class SceneSpec:
    """The meta.yaml-equivalent scene-table spec."""

    source: str
    inputs: list[str]
    t_start: datetime
    t_end: datetime
    step: str = "1 hour"
    time_bucket: str | None = None
    path_formats: dict[str, str] = field(default_factory=dict)
    offsets: dict[str, str] = field(default_factory=dict)  # per-input phase (S5)
    exclude_times: dict[str, list[datetime]] = field(default_factory=dict)
    time_intervals: list[tuple[datetime, datetime]] = field(default_factory=list)  # F1
    component_filters: dict[str, list[int]] = field(default_factory=dict)  # F2
    solar_zenith: dict | None = None  # F3: {"lon": deg, "dt_hours": h}

    @classmethod
    def from_dict(cls, d: dict) -> "SceneSpec":
        return cls(
            source=d["source"],
            inputs=list(d["inputs"]),
            t_start=_parse_t(d["t_start"]),
            t_end=_parse_t(d["t_end"]),
            step=d.get("step", "1 hour"),
            time_bucket=d.get("time_bucket"),
            path_formats=dict(d.get("path_formats", {})),
            offsets=dict(d.get("offsets", {})),
            exclude_times={
                k: [_parse_t(t) for t in v] for k, v in d.get("exclude_times", {}).items()
            },
            time_intervals=[
                (_parse_t(a), _parse_t(b)) for a, b in d.get("time_intervals", [])
            ],
            component_filters={
                k: list(v) for k, v in d.get("component_filters", {}).items()
            },
            solar_zenith=d.get("solar_zenith"),
        )

    @classmethod
    def from_yaml(cls, path: str) -> "SceneSpec":
        import yaml  # optional dep; dict front door needs nothing

        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh))


def build_scene_table(spark: SparkSession, spec: SceneSpec) -> DataFrame:
    """§3.1 compiled: catalog scans ⟕ J1 ⟕ F1–F3 ⟕ scene ids, one lazy plan."""
    per_input = []
    for name in spec.inputs:
        cal = calendar_scan(
            spark,
            spec.t_start,
            spec.t_end,
            step=spec.step,
            offset=spec.offsets.get(name),
            path_format=spec.path_formats.get(name, "'" + name + "_'yyyyMMddHHmm"),
            exclude_times=spec.exclude_times.get(name),
        )
        per_input.append(
            cal.select("t", F.lit(name).alias("input_name"), F.col("path").alias("filename"))
        )
    files = per_input[0]
    for df in per_input[1:]:
        files = files.unionByName(df)
    scenes = multi_input_scene_table(
        files, spec.inputs, source_name=spec.source, time_bucket=spec.time_bucket
    )
    if spec.time_intervals:
        scenes = time_interval_filter(scenes, "t", spec.time_intervals)
    if spec.component_filters:
        scenes = datetime_component_filter(scenes, "t", spec.component_filters)
    if spec.solar_zenith:
        scenes = solar_zenith_filter(
            scenes, "t",
            lon_degrees=spec.solar_zenith["lon"],
            dt_hours=spec.solar_zenith["dt_hours"],
        )
    return scenes


def materialize(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    overwrite: bool = False,
) -> bool:
    """Incremental sink: skip when the target already exists (the
    reference's target-existence short-circuit). Returns True iff written.

    Completion is Spark's own _SUCCESS marker, so a half-written output
    from a crashed job does NOT count as done — stronger than the
    reference's bare file-existence check (regridding.py:93-117 re-checks
    inside run() for exactly that race).
    """
    done = os.path.exists(os.path.join(path, "_SUCCESS"))
    if done and not overwrite:
        return False
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return True


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    mode: str = "overwrite",
) -> DataFrame:
    """S10 sink variant: hash-bucketed, bucket-sorted external parquet
    table registered in the session catalog.

    At 100 TB the dominant recurring cost is re-shuffling fact tables by
    the same join/agg key in every job; bucketing pays that shuffle once
    at write time. Any later equi-join or groupBy on the bucket key
    (with matching bucket counts) reads co-located buckets and skips the
    Exchange entirely — plan-gated by
    ``test_plan_quality.py::test_bucketed_join_is_exchange_free``.
    Returns the registered table as a DataFrame.
    """
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .saveAsTable(name)
    )
    return df.sparkSession.table(name)


def split_by_time_partition(
    df: DataFrame, path: str, time_col: str = "t", granularity: str = "day"
) -> bool:
    """S8 (les.py:87-107 analog): split a multi-time input into one
    partition per time bucket via a partitioned re-write — downstream
    per-scene reads become partition-pruned scans."""
    keyed = df.withColumn(
        "_part", F.date_format(F.date_trunc(granularity, F.col(time_col)), "yyyy-MM-dd")
    )
    return materialize(keyed, path, partition_by=["_part"])
