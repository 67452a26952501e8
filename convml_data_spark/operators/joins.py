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


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width_seconds: float | None = None,
) -> DataFrame:
    """Point-in-interval join (``start <= t <= end``) as an equi-join —
    the 1-D range join Spark has no native operator for (the time-axis
    face of G2's 2-D ``tile_pixel_join``; reference analog: per-scene
    time-window membership in aux_sources.py).

    A naive ``ON t BETWEEN start AND end`` plans as
    BroadcastNestedLoop/cartesian — O(n·m) and a driver OOM once neither
    side broadcasts. Instead the time axis is cut into buckets of
    ``bucket_width_seconds``; every interval is exploded into the buckets
    it overlaps, points land in exactly one bucket, and the join becomes
    hash-partitioned on the bucket key with the exact BETWEEN predicate
    re-checked after. With the width ≥ the longest interval (the default:
    one tiny agg infers it plan-time, like asof's A3 spacing inference)
    the replication factor is ≤ 2 — constant memory per row at any scale,
    and skewed buckets split by AQE like any hash join.

    Time columns may be TIMESTAMP or TIMESTAMP_NTZ (dtype-aware epoch
    arithmetic); both sides keep all their columns in the output. INNER
    semantics only: the BETWEEN re-check after the bucket join would
    silently drop an outer join's null-extended rows, so outer variants
    must be composed explicitly (e.g. anti-join the matched point ids).
    """
    from convml_data_spark.functions.timeutils import epoch_micros

    t_us = epoch_micros(point_col, dict(points.dtypes)[point_col])
    s_us = epoch_micros(start_col, dict(intervals.dtypes)[start_col])
    e_us = epoch_micros(end_col, dict(intervals.dtypes)[end_col])

    if bucket_width_seconds is None:
        row = intervals.agg(F.max(e_us - s_us).alias("m")).first()
        bucket_width_seconds = max((row["m"] or 0) / 1e6, 1e-6)
    w_us = int(max(bucket_width_seconds, 1e-6) * 1e6)

    p = points.withColumn("_bucket", F.floor(t_us / F.lit(w_us)))
    iv = (
        intervals.withColumn("_b0", F.floor(s_us / F.lit(w_us)))
        .withColumn("_b1", F.floor(e_us / F.lit(w_us)))
        .withColumn("_bucket", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))))
        .drop("_b0", "_b1")
    )
    joined = p.join(iv, "_bucket").where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_bucket")
