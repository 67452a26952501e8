"""Vector expressions over ARRAY<FLOAT/DOUBLE> embedding columns.

Used by the similarity-search operators (north-star extension of the
reference's D6 embedding matrix, convml_data/pipeline/embeddings/...).
``zip_with`` + ``aggregate`` keep the arithmetic JVM-side — no UDF, no
Arrow transfer — which is what makes brute-force cosine viable as the
exact baseline at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
