"""End-to-end lifecycle test (SURVEY §5 strategy, mirroring the reference's
``test_make_triplets``): spec → scene table → seeded triplet split/pairing →
tile placement → pixel-table tile extraction → per-tile reduction → batch
embedding → join → binned statistics. One lazy composition per stage, all on
synthetic data, asserting the reference's own invariants (tile shape,
containment, completeness) at each step."""

from __future__ import annotations

from pyspark.sql import functions as F

from convml_data_spark import pipeline
from convml_data_spark.operators import inference, sampling, tiler


def test_triplet_pipeline_end_to_end(spark, tmp_path):
    # --- §3.1: scene table from a two-channel calendar spec
    spec = pipeline.SceneSpec.from_dict(
        {
            "source": "e2e",
            "inputs": ["vis", "ir"],
            "t_start": "2024-03-01T00:00:00",
            "t_end": "2024-03-02T00:00:00",
            "step": "1 hour",
        }
    )
    scenes = pipeline.build_scene_table(spark, spec)
    n_scenes = scenes.count()
    assert n_scenes == 24
    assert scenes.where(F.col("vis").isNull() | F.col("ir").isNull()).count() == 0

    # --- R1/R2: collection split + per-triplet scene pairing
    split = sampling.proportional_split(
        scenes.select("scene_id"), "scene_id", {"train": 3, "study": 1}, seed=5
    )
    sizes = {r["collection"]: r["n"] for r in split.groupBy("collection").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"train": 18, "study": 6}
    triplets = spark.range(12).select(
        F.col("id").alias("triplet_id"),
        F.when(F.col("id") < 9, F.lit("train")).otherwise(F.lit("study")).alias("collection"),
    )
    pairs = sampling.pick_scene_pairs(triplets, split, seed=5)
    assert pairs.count() == 12
    assert pairs.where(F.col("anchor_scene") == F.col("distant_scene")).count() == 0

    # --- R3–R5: tile locations inside a 64×64 pixel domain
    locs = sampling.triplet_tile_locations(
        triplets.select("triplet_id"),
        x_range=(0.0, 64.0),
        y_range=(0.0, 64.0),
        tile_size=9.0,
        seed=5,
    )
    assert locs.count() == 36  # 12 triplets × (anchor, neighbor, distant)

    # --- G2: extract 9×9 tiles from a synthetic pixel raster (range join)
    px = (
        spark.range(64)
        .select(F.col("id").cast("int").alias("y"))
        .crossJoin(spark.range(64).select(F.col("id").cast("int").alias("x")))
        .withColumn("value", ((F.col("x") * 31 + F.col("y") * 7) % 97).cast("double"))
    )
    tiles = locs.select(
        F.concat_ws("_", "triplet_id", "tile_type").alias("tile_id"),
        (F.col("x_c") - 4.5).cast("int").alias("i0"),
        ((F.col("x_c") - 4.5).cast("int") + 9).alias("imax"),
        (F.col("y_c") - 4.5).cast("int").alias("j0"),
        ((F.col("y_c") - 4.5).cast("int") + 9).alias("jmax"),
    )
    joined = tiler.tile_pixel_join(px, tiles)

    # --- A1: per-tile reduction; reference asserts exact tile shape
    per_tile = joined.groupBy("tile_id").agg(
        F.count("*").alias("n_px"), F.avg("value").alias("mean_value")
    )
    rows = per_tile.collect()
    assert len(rows) == 36
    assert all(r["n_px"] == 81 for r in rows)  # every tile exactly 9×9

    # --- X3/J6: embed per-tile features and join back
    feats = per_tile.select(
        F.xxhash64("tile_id").alias("vec_id"),
        "tile_id",
        F.array(F.col("mean_value"), F.col("n_px").cast("double")).alias("embedding"),
    )
    emb = inference.batch_embed(feats, in_dim=2, out_dim=4, id_col="vec_id")
    analysis = feats.join(emb, "vec_id")
    assert analysis.count() == 36
    assert all(len(r["emb_out"]) == 4 for r in analysis.collect())

    # --- sink: incremental materialization (skip-on-rerun)
    out = str(tmp_path / "tiles")
    assert pipeline.materialize(per_tile, out) is True
    assert pipeline.materialize(per_tile, out) is False
    assert spark.read.parquet(out).count() == 36


def test_dataset_spec_compiles_full_lifecycle(spark):
    """DatasetSpec drives the whole §3.2/§3.3 lifecycle from one dict —
    the spec-driven analog of the manual composition above, dispatching on
    tiles_kind exactly like the reference's GenerateTiles."""
    base = {
        "source": "e2e",
        "inputs": ["vis", "ir"],
        "t_start": "2024-03-01T00:00:00",
        "t_end": "2024-03-02T00:00:00",
        "step": "1 hour",
        "sampling": {
            "resolution": 96.0,
            "triplets": {"N_triplets": {"train": 9, "study": 3}, "tile_N": 16},
        },
        "domain": {"l_zonal": 20000.0, "l_meridional": 20000.0},
    }
    spec = pipeline.DatasetSpec.from_dict(base)
    assert spec.tile_size == 1536.0
    stages = pipeline.build_triplet_dataset(spark, spec)
    assert stages["scenes"].count() == 24
    tiles = stages["tiles"]
    rows = tiles.collect()
    assert len(rows) == 36  # 12 triplets x (anchor, neighbor, distant)
    # anchor+neighbor share the anchor scene; distant differs from it
    by_trip = {}
    for r in rows:
        by_trip.setdefault(r["triplet_id"], {})[r["tile_type"]] = r["scene_id"]
    for d in by_trip.values():
        assert d["anchor"] == d["neighbor"]
        assert d["anchor"] != d["distant"]
    # containment: margin-shrunk placement bounds (margin = 2/3 tile)
    m = 1536.0 * 2 / 3
    assert all(m <= r["x_c"] <= 20000.0 - m and m <= r["y_c"] <= 20000.0 - m for r in rows)

    # rect-slidingwindow kind: W5 grid per scene
    spec_sw = pipeline.DatasetSpec.from_dict({**base, "tiles_kind": "rect-slidingwindow"})
    sw = pipeline.build_triplet_dataset(spark, spec_sw)["tiles"]
    nx = int(20000.0 / 96.0)  # 208 px -> 13 origins of span 16 per axis
    n_orig = ((nx - 16) // 16 + 1) ** 2
    assert sw.count() == 24 * n_orig

    # trajectories kind: one tile per scene at the snapped traj point
    from datetime import datetime, timedelta

    traj = spark.createDataFrame(
        [
            (datetime(2024, 3, 1) + timedelta(hours=3 * i), 10.0 + i, 20.0 - i)
            for i in range(9)
        ],
        "t_traj timestamp, lat double, lon double",
    )
    spec_tr = pipeline.DatasetSpec.from_dict({**base, "tiles_kind": "trajectories"})
    tr = pipeline.build_triplet_dataset(spark, spec_tr, trajectory=traj)["tiles"]
    trows = tr.collect()
    assert len(trows) == 24  # every scene gets exactly one tile
    assert all(r["size"] == 1536.0 for r in trows)
    # scene at 07:00 snaps to traj time 06:00 (idx 2, lat 12)
    r7 = next(r for r in trows if "202403010700" in r["scene_id"])
    assert r7["time_idx"] == 2 and r7["central_latitude"] == 12.0

    # aux products: every scene matched within tolerance of the aux axis
    aux = spark.createDataFrame(
        [(datetime(2024, 3, 1) + timedelta(hours=i), float(i)) for i in range(24)],
        "t_aux timestamp, aux_v double",
    )
    st = pipeline.build_triplet_dataset(spark, spec, aux={"era5": aux})
    assert st["aux:era5"].count() == 24


def test_dataset_spec_parses_reference_example_meta_yaml():
    """The parser consumes the reference's OWN example spec verbatim
    (reference tests/example/meta.yaml): time.N_days -> t_end,
    product -> input list, time.filters.N_hours_from_zenith +
    domain.central_longitude -> the solar-zenith filter, the dashed
    `rect-slidingwindow` sampling key, `neigh_dist_scaling`, and the
    aux-product table."""
    import os

    import pytest

    from convml_data_spark.pipeline import DatasetSpec

    path = "/root/reference/tests/example/meta.yaml"
    if not os.path.exists(path):
        pytest.skip("reference example not available")
    spec = DatasetSpec.from_yaml(path)
    assert spec.scene.source == "goes16"
    assert spec.scene.inputs == ["truecolor_rgb"]
    assert (spec.scene.t_end - spec.scene.t_start).days == 1
    assert spec.scene.solar_zenith == {"lon": -57.5, "dt_hours": 0.2}
    assert spec.resolution == 1000.0
    assert spec.tile_N == 256
    assert spec.n_triplets == {"train": 2}
    assert spec.neighbor_distance_scaling == 0.1
    assert spec.x_range == (0.0, 400000.0) and spec.y_range == (0.0, 400000.0)
    assert "sea_surface_temperature" in spec.aux_products
    assert spec.aux_products["zonal_wind"]["product"] == "u"
    assert spec.tile_size == 256000.0
