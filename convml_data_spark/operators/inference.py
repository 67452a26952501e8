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
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<double>"

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


def resolve_dotted(name: str, separator: str = "__"):
    """X2: resolve ``pkg__module__fn`` (or dotted) to a callable — the
    reference's importlib dispatch for pluggable per-tile metrics
    (aux_fields/data.py:82-108)."""
    import importlib

    parts = name.split(separator) if separator in name else name.split(".")
    mod_name, fn_name = ".".join(parts[:-1]), parts[-1]
    mod = importlib.import_module(mod_name)
    return getattr(mod, fn_name)


def grouped_reduce_by_name(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    fn_name: str,
    kwargs: dict | None = None,
    out_col: str = "value",
):
    """X2: per-group array reduction by dotted/``__`` name with auto-kwarg
    filtering by signature inspection (the reference injects
    ``periodic_domain=False`` only when accepted, aux_fields/data.py:95-104).
    """
    import inspect

    import pandas as pd

    fn = resolve_dotted(fn_name)
    accepted = {}
    try:
        sig = inspect.signature(fn)
        has_varkw = any(p.kind is p.VAR_KEYWORD for p in sig.parameters.values())
        for k, v in (kwargs or {}).items():
            if has_varkw or k in sig.parameters:
                accepted[k] = v
    except (TypeError, ValueError):  # numpy ufunc-style: no signature
        accepted = dict(kwargs or {})

    group_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols)
    schema = f"{group_schema}, {out_col} double"

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row[out_col] = float(fn(pdf[value_col].to_numpy(), **accepted))
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(reduce_group, schema)


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


# ---------------------------------------------------------------------------
# X4+ embedding-transform registry (embeddings/transforms.py:17-139):
# transform_type string -> fit+apply; extra args arrive as the reference's
# "k=v,k=v" string with the same int-coercion allowlist; fitted models are
# Spark ML transformers persistable with model.save(path) (the joblib
# analog) and reusable as the pretrained_model argument.

TRANSFORM_INT_KWARGS = {
    # reference allowlist (transforms.py:96-101) + our registry's names
    "min_cluster_size", "min_samples", "pca__n_components", "n_components", "k",
}


def parse_transform_kwargs(extra_args: str) -> dict:
    """transforms.py:89-103: ``"a=1,b=2.5"`` -> {"a": 1, "b": 2.5} with the
    known integer keys coerced to int, everything else to float."""
    kwargs: dict = {}
    if extra_args:
        for s in extra_args.split(","):
            k, v = s.split("=")
            kwargs[k] = int(v) if k in TRANSFORM_INT_KWARGS else float(v)
    return kwargs


def _vector_out(df, model, id_col, out_col):
    from pyspark.ml.functions import vector_to_array

    return model.transform(df).select(
        id_col, vector_to_array(F.col("_t_out")).alias(out_col)
    )


def _fit_pca(feats, kwargs):
    from pyspark.ml.feature import PCA

    k = kwargs.get("n_components", kwargs.get("pca__n_components", 8))
    return PCA(k=int(k), inputCol="features", outputCol="_t_out").fit(feats)


def _fit_standard_scaler(feats, kwargs):
    from pyspark.ml.feature import StandardScaler

    return StandardScaler(
        withMean=True, withStd=True, inputCol="features", outputCol="_t_out"
    ).fit(feats)


def _fit_minmax_scaler(feats, kwargs):
    from pyspark.ml.feature import MinMaxScaler

    return MinMaxScaler(inputCol="features", outputCol="_t_out").fit(feats)


def _fit_kmeans_labels(feats, kwargs):
    from pyspark.ml.clustering import KMeans

    k = kwargs.get("n_components", kwargs.get("k", 8))
    return KMeans(
        k=int(k), seed=int(kwargs.get("seed", 42)),
        featuresCol="features", predictionCol="_t_label",
    ).fit(feats)


TRANSFORMS = {
    "pca": _fit_pca,
    "standard_scaler": _fit_standard_scaler,
    "minmax": _fit_minmax_scaler,
    # the reference dispatches hdbscan for clustering
    # (embeddings/transforms.py:30-40); that lib isn't in this container.
    # Two stand-ins with the same label-column shape: KMeans (centroid
    # model, fit/apply) and "dbscan" (DENSITY clustering like hdbscan —
    # exact relational DBSCAN, operators/clustering.py, dispatched in
    # apply_transform below because it has no fitted-model object)
    "kmeans": _fit_kmeans_labels,
}


def apply_transform(
    df: DataFrame,
    transform_type: str,
    pretrained_model=None,
    transform_extra_args: str = "",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "emb",
):
    """EmbeddingTransform.run (transforms.py:51-86) on DataFrames: dispatch
    by type, fit unless a pretrained model is given, apply, return
    (transformed df, model). Unknown types raise with the registry listing,
    mirroring the reference's missing-model error text shape."""
    if transform_type == "dbscan":
        # density clustering (the hdbscan dispatch target's analog): no
        # fitted model — the labels ARE the transform; clusters over the
        # first two embedding dimensions (the reference applies density
        # transforms after dimensionality reduction for the same reason)
        from .clustering import dbscan_labels

        kwargs = parse_transform_kwargs(transform_extra_args)
        pts = df.select(
            F.col(id_col),
            F.element_at(vec_col, 1).cast("double").alias("x"),
            F.element_at(vec_col, 2).cast("double").alias("y"),
        )
        out = dbscan_labels(
            pts,
            eps=float(kwargs.get("eps", 0.05)),
            min_pts=int(kwargs.get("min_samples", 5)),
            id_col=id_col,
        ).select(F.col("id").alias(id_col), F.col("label").alias(out_col), "is_core")
        return out, None
    if transform_type not in TRANSFORMS:
        avail = "\n".join(f"\t{k}" for k in sorted([*TRANSFORMS, "dbscan"]))
        raise ValueError(
            f"unknown transform type {transform_type!r}. Available transforms:\n{avail}"
        )
    kwargs = parse_transform_kwargs(transform_extra_args)
    feats = to_ml_vector(df, vec_col=vec_col)
    model = pretrained_model or TRANSFORMS[transform_type](feats, kwargs)
    if transform_type == "kmeans":
        out = model.transform(feats).select(
            id_col, F.col("_t_label").alias(out_col)
        )
    else:
        out = _vector_out(feats, model, id_col, out_col)
    return out, model
