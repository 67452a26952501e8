"""Batch model inference + embedding transforms — SURVEY §2.12 X3/X4.

Reference semantics: per-scene tile batches run through a torch model with
batch size 32 (convml_data/pipeline/embeddings/sampling.py:46-62,
defaults.py:1); embeddings optionally pass a fitted transform (PCA etc.,
embeddings/transforms.py:17-139).

Spark design:
- X3: ``mapInPandas`` with an Arrow batch stream — the model weights are a
  broadcast variable (sent once per executor, not per task); each pandas
  batch is a (rows × dim) matrix multiplied in one vectorized call. Real
  torch checkpoints aren't available in this container, so the default
  "model" is a deterministic seeded linear projection with tanh — the
  Spark-side plumbing (broadcast, Arrow batching, schema) is exactly what a
  torch model would use via ``predict_batch_udf``.
- X4: PCA on array<float> columns via Spark ML (``pyspark.ml.feature.PCA``),
  with array↔Vector adapters; model persistence is MLlib ``save``/``load``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BATCH_SIZE = 32  # reference: embeddings/defaults.py:1


def linear_model_weights(in_dim: int, out_dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic stand-in for a model checkpoint: seeded normal W."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((in_dim, out_dim)).astype(np.float64)


def batch_embed(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "emb_out",
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> DataFrame:
    """X3: batched NN-style inference over an embedding column.

    out = tanh(V · W); W is broadcast once. The Arrow batch is re-chunked to
    ``batch_size`` rows to bound peak memory per model call — the same knob
    as the reference's PREDICTION_BATCH_SIZE.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(linear_model_weights(in_dim, out_dim, seed))
    schema = f"{id_col} long, {out_col} array<double>"

    def infer(batches: Iterator) -> Iterator:
        import pandas as pd

        w = bc.value
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                mat = np.stack(chunk[vec_col].to_numpy()).astype(np.float64)
                out = np.tanh(mat @ w)
                yield pd.DataFrame(
                    {id_col: chunk[id_col].to_numpy(), out_col: list(out)}
                )

    return df.select(id_col, vec_col).mapInPandas(infer, schema)


def to_ml_vector(df: DataFrame, vec_col: str = "embedding", out_col: str = "features") -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(F.col(vec_col).cast("array<double>")))


def pca_transform(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
):
    """X4: fit + apply PCA (embeddings/transforms.py:17-139 analog).

    Returns (transformed DataFrame with ``out_col`` as array<double>, fitted
    model). Spark ML's PCA computes the covariance eigenbasis distributed;
    the fitted model is a broadcastable transformer, persistable via
    ``model.save(path)``.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import vector_to_array

    feats = to_ml_vector(df, vec_col=vec_col)
    model = PCA(k=k, inputCol="features", outputCol="_pca_vec").fit(feats)
    out = model.transform(feats).select(
        id_col, vector_to_array(F.col("_pca_vec")).alias(out_col)
    )
    return out, model
