"""Join strategy helpers — skew salting (SURVEY §4 "Partitioning: AQE
handles skew").

AQE's skew-join splitting handles sort-merge skew automatically, but two
cases still need explicit salting at 100 TB: (a) skewed AGGREGATIONS
(AQE never splits a hot groupBy key) and (b) joins where the hot key's
build side must be replicated. These helpers make that explicit and
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread over ``salt_factor``
    sub-keys: the large side gets a deterministic per-row salt (hash of its
    full row, partitioning-independent), the small side is replicated
    ``salt_factor``× via an explode — result is identical to
    ``large.join(small, on, how)`` for inner/left joins.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt_factor))
    l_salted = large.withColumn("_salt", salt)
    s_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = l_salted.join(s_salted, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def salted_groupby_count(
    df: DataFrame, key_cols: list[str], salt_factor: int = 8
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial count per
    (key, salt) — spreading a hot key over ``salt_factor`` reducers — then
    final sum per key. Same result as ``groupBy(key).count()``; the hot
    key's first shuffle is bounded by ``rows/salt_factor`` per task.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_factor))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_n"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_n").alias("count"))
