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
