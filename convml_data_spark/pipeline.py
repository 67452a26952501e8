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
        # Accept BOTH dialects: this engine's flat keys AND the
        # reference's actual meta.yaml shape (tests/example/meta.yaml):
        # `time: {N_days, t_start, filters: {N_hours_from_zenith}}`,
        # `product` instead of an explicit input list, and the solar
        # filter longitude coming from `domain.central_longitude`.
        time_d = d.get("time") or {}
        t_start = d.get("t_start", time_d.get("t_start"))
        if t_start is None:
            raise ValueError("spec needs `t_start` (top-level or under `time`)")
        t_start = _parse_t(t_start)
        t_end = d.get("t_end", time_d.get("t_end"))
        if t_end is None and "N_days" in time_d:
            from datetime import timedelta

            t_end = t_start + timedelta(days=float(time_d["N_days"]))
        if t_end is None:
            raise ValueError("spec needs `t_end` or `time.N_days`")
        inputs = d.get("inputs")
        if inputs is None:
            inputs = [d["product"]] if "product" in d else ["scene"]
        sz = d.get("solar_zenith")
        filters = time_d.get("filters") or {}
        if sz is None and "N_hours_from_zenith" in filters:
            dom = d.get("domain") or {}
            sz = {
                "lon": float(dom.get("central_longitude", 0.0)),
                "dt_hours": float(filters["N_hours_from_zenith"]),
            }
        return cls(
            source=d["source"],
            inputs=list(inputs),
            t_start=t_start,
            t_end=_parse_t(t_end),
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
            solar_zenith=sz,
        )

    @classmethod
    def from_yaml(cls, path: str) -> "SceneSpec":
        import yaml  # optional dep; dict front door needs nothing

        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh))


@dataclass
class DatasetSpec:
    """The FULL meta.yaml-equivalent dataset spec: §3.1 scenes plus the
    §3.2/§3.3 sampling + tile lifecycle the reference drives from one file.

    Reference keys mirrored (convml_data/__init__.py:100-147):
    ``sampling.resolution`` (m/px, required for tile sampling),
    ``sampling.triplets.N_triplets`` (int → ``{"train": N}``),
    ``sampling.triplets.tile_N`` (default 256), and the domain extent the
    tiles are placed in. ``tiles_kind`` dispatches exactly like
    ``GenerateTiles`` (pipeline/tiles.py:440-496): ``triplets`` |
    ``trajectories`` | ``rect-slidingwindow``.
    """

    scene: SceneSpec
    resolution: float
    tiles_kind: str = "triplets"
    n_triplets: dict[str, int] = field(default_factory=lambda: {"train": 10})
    tile_N: int = 256
    neighbor_distance_scaling: float = 1.0
    seed: int = 42
    x_range: tuple[float, float] = (0.0, 0.0)
    y_range: tuple[float, float] = (0.0, 0.0)
    aux_products: dict = field(default_factory=dict)

    @property
    def tile_size(self) -> float:
        """Tile edge in domain units: resolution · tile_N (reference
        trajectory_tiles.py:40-43 / triplets sampling)."""
        return float(self.resolution) * int(self.tile_N)

    @classmethod
    def from_dict(cls, d: dict) -> "DatasetSpec":
        scene = SceneSpec.from_dict(d)
        sampling = d.get("sampling", {}) or {}
        if "resolution" not in sampling:
            raise ValueError(
                "tile sampling requires `resolution` (m/px) under `sampling` "
                "(reference convml_data/__init__.py:103-107)"
            )
        trip = sampling.get("triplets") or {}
        n = trip.get("N_triplets", 10)
        if isinstance(n, int):
            n = {"train": n}  # reference default collection
        domain = d.get("domain", {}) or {}
        lz = float(domain.get("l_zonal", 0.0))
        lm = float(domain.get("l_meridional", 0.0))
        return cls(
            scene=scene,
            resolution=float(sampling["resolution"]),
            tiles_kind=d.get("tiles_kind", "triplets"),
            n_triplets={k: int(v) for k, v in n.items()},
            # `or {}` on BOTH nested keys: a present-but-empty YAML key
            # (`trajectories:`) loads as None, and None.get would raise
            # `or {}` on every nested key: a present-but-empty YAML key
            # (`trajectories:`) loads as None, and None.get would raise;
            # `rect-slidingwindow` is the reference's dashed spelling
            # (tests/example/meta.yaml)
            tile_N=int(
                trip.get(
                    "tile_N",
                    (sampling.get("trajectories") or {}).get(
                        "tile_N",
                        (sampling.get("rect-slidingwindow") or {}).get("tile_N", 256),
                    ),
                )
            ),
            # the reference example spells it `neigh_dist_scaling`
            # (fraction of tile size the neighbor is offset)
            neighbor_distance_scaling=float(
                trip.get(
                    "neighbor_distance_scaling", trip.get("neigh_dist_scaling", 1.0)
                )
            ),
            seed=int(d.get("seed", 42)),
            x_range=(0.0, lz),
            y_range=(0.0, lm),
            aux_products=dict(d.get("aux_products") or {}),
        )

    @classmethod
    def from_yaml(cls, path: str) -> "DatasetSpec":
        import yaml

        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh))


def build_triplet_dataset(
    spark: SparkSession,
    spec: DatasetSpec,
    trajectory: DataFrame | None = None,
    aux: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Compile the whole meta.yaml lifecycle into lazy DataFrame stages —
    the program ``tests/test_end_to_end.py`` used to wire by hand.

    Returns ``{"scenes", "splits", "triplets", "pairs", "locations",
    "tiles"}`` (+ ``"aux:<name>"`` per aux product). ``tiles`` is the
    per-scene tile table (the ``GenerateTiles``/``tiles_per_scene``
    analog): for ``triplets``, anchor+neighbor tiles land on the
    anchor scene and distant tiles on the distant scene
    (sampling/triplets.py pairing); for ``trajectories``, one tile per
    scene at the snapped trajectory point; for ``rect-slidingwindow``, the
    W5 origin grid crossed with every scene.

    Scale: every stage is the already-audited operator (global-rank split,
    broadcast pair lookup, expression-seeded placement, bucketed as-of) —
    composing them adds joins on (collection, index) and scene_id only,
    all broadcastable when the scene table is small relative to tiles.
    """
    from .operators import sampling as smp
    from .operators import tiler
    from .operators.asof import match_aux_to_scenes

    scenes = build_scene_table(spark, spec.scene)
    out: dict[str, DataFrame] = {"scenes": scenes}

    if spec.tiles_kind == "trajectories":
        if trajectory is None:
            raise ValueError("tiles_kind='trajectories' needs a trajectory DataFrame")
        out["tiles"] = tiler.trajectory_tile_locations(
            scenes.select("scene_id", "t"),
            trajectory,
            resolution=spec.resolution,
            tile_N=spec.tile_N,
            scene_time="t",
            traj_time="t_traj",
        )
    elif spec.tiles_kind == "rect-slidingwindow":
        nx = int((spec.x_range[1] - spec.x_range[0]) / spec.resolution)
        ny = int((spec.y_range[1] - spec.y_range[0]) / spec.resolution)
        grid = tiler.sliding_tiles(spark, nx, ny, spec.tile_N, spec.tile_N)
        out["tiles"] = scenes.select("scene_id").crossJoin(F.broadcast(grid))
    elif spec.tiles_kind == "triplets":
        splits = smp.proportional_split(
            scenes.select("scene_id"), "scene_id", spec.n_triplets, seed=spec.seed
        )
        out["splits"] = splits
        # triplet ids allocate contiguously per collection, dict order —
        # same shape the reference builds from N_triplets counts
        total = sum(spec.n_triplets.values())
        assign = None
        acc = 0
        items = list(spec.n_triplets.items())
        for name, c in items[:-1]:
            acc += c
            cond = F.col("id") < F.lit(acc)
            assign = (
                F.when(cond, F.lit(name))
                if assign is None
                else assign.when(cond, F.lit(name))
            )
        last = items[-1][0]
        assign = F.lit(last) if assign is None else assign.otherwise(F.lit(last))
        triplets = spark.range(total).select(
            F.col("id").alias("triplet_id"), assign.alias("collection")
        )
        out["triplets"] = triplets
        pairs = smp.pick_scene_pairs(triplets, splits, seed=spec.seed)
        out["pairs"] = pairs
        locs = smp.triplet_tile_locations(
            triplets.select("triplet_id"),
            x_range=spec.x_range,
            y_range=spec.y_range,
            tile_size=spec.tile_size,
            neighbor_distance_scaling=spec.neighbor_distance_scaling,
            seed=spec.seed,
        )
        out["locations"] = locs
        # tiles_per_scene: anchor/neighbor sample the anchor scene,
        # distant samples the distant scene (sampling/triplets.py)
        scene_for = F.when(
            F.col("tile_type").isin("anchor", "neighbor"), F.col("anchor_scene")
        ).otherwise(F.col("distant_scene"))
        out["tiles"] = (
            locs.join(F.broadcast(pairs), "triplet_id")
            .select(
                "triplet_id",
                "collection",
                "tile_type",
                scene_for.alias("scene_id"),
                "x_c",
                "y_c",
                F.lit(spec.tile_size).alias("tile_size"),
            )
        )
    else:
        raise NotImplementedError(spec.tiles_kind)

    for name, adf in (aux or {}).items():
        out[f"aux:{name}"] = match_aux_to_scenes(
            scenes.select("scene_id", F.col("t")), adf,
            strategy="all_scenes_within_dt_aux",
        )
    return out


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
