"""As-of (nearest-time, tolerance-bounded) joins — SURVEY §2.3 J2–J4, A3.

Reference semantics (convml_data/pipeline/aux_sources.py:178-231):

- ``single_scene_per_aux_time`` (J2): every AUX time is matched to the
  closest SCENE time; the match is kept only when ``|Δt| <= tolerance``.
- ``all_scenes_within_dt_aux`` (J3): every SCENE is matched to the closest
  AUX time within the tolerance.
- tolerance defaults to ``dt_aux / 2`` where ``dt_aux`` is the *minimum*
  spacing of the aux times (aux_sources.py:202-206 — A3).
- tie-break: the reference computes ``np.argmin(|Δt|)`` over the
  ascending-sorted time axis, so an exact tie picks the EARLIER candidate.
  (aux_sources.py:216-218)

Physical design (scale): Spark has no native as-of join, and the naive
``a JOIN b ON abs(a.t-b.t) <= tol`` range join is O(n·m) work. We instead
use the union-and-window idiom, which is one shuffle-sort:

1. union left rows and right rows onto one time axis;
2. per ordered partition, ``last(right_payload) IGNORE NULLS`` over
   (-∞, current] gives the previous right row, ``first(...)`` over
   [current, +∞) the next;
3. pick the nearer of prev/next (tie → prev = earlier), apply tolerance.

A keyless as-of would put the whole axis in ONE window partition, so when no
``partition_by`` is given we synthesize one: time is bucketed at twice the
tolerance and each right row is replicated into the (at most 2, often 1)
buckets covering ``[r-tol, r+tol]`` — any match within tolerance is then
guaranteed to live in the left row's bucket. That keeps the operator fully
parallel at 100 TB with right-side replication ≤ 2×. With ``partition_by``
(e.g. per aux product) the windows are already keyed and no replication is
needed — unless a single key still carries the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from convml_data_spark.functions.timeutils import epoch_micros


def infer_min_spacing(df: DataFrame, time_col: str, partition_by: list[str] | None = None):
    """A3: min spacing (seconds, float) between consecutive distinct times.

    Reference: ``dt_aux = min(diff(sorted(aux_times)))``
    (aux_sources.py:202-206). Returns a float (driver-side scalar) — this is
    plan-time metadata, like the reference's use of it.

    With ``partition_by`` the lag window is keyed and parallel. WITHOUT it,
    a bare ordered window would funnel every distinct time through one
    partition, so the keyless path uses the coarse-bucket scheme (see
    ``_right_gap_stats``): per-hour-bucket lag windows in parallel, plus
    boundary gaps from the bucket-summary table (bounded by time span).
    """
    micros = epoch_micros(time_col, dict(df.dtypes)[time_col])
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(time_col)
        gaps = (
            df.select(*partition_by, time_col)
            .distinct()
            .withColumn("_gap", micros - F.lag(micros).over(w))
            .where(F.col("_gap").isNotNull())
            .agg(F.min("_gap").alias("m"))
            .collect()
        )
        return gaps[0]["m"] / 1e6 if gaps and gaps[0]["m"] is not None else None
    rows = df.select(micros.alias("_t")).where(F.col("_t").isNotNull()).distinct()
    b = rows.withColumn("_b", F.floor(F.col("_t") / F.lit(_COARSE_US)))
    w_in = Window.partitionBy("_b").orderBy("_t")
    local = b.withColumn("_g", F.col("_t") - F.lag("_t").over(w_in))
    summary = local.groupBy("_b").agg(
        F.min("_t").alias("_mn"), F.max("_t").alias("_mx"), F.min("_g").alias("_lg")
    )
    w_b = Window.orderBy("_b")
    g = summary.withColumn("_bg", F.col("_mn") - F.lag("_mx").over(w_b))
    # least() skips nulls, so either side may be empty (single bucket /
    # no in-bucket pairs) without poisoning the min
    out = g.agg(F.least(F.min("_lg"), F.min("_bg")).alias("m")).collect()
    return out[0]["m"] / 1e6 if out and out[0]["m"] is not None else None


_COARSE_US = 3_600_000_000  # 1 h — coarse-bucket granularity for gap stats


def _right_gap_stats(df: DataFrame, time_col: str):
    """(min_us, max_us, max_consecutive_gap_us) of a time column, computed
    WITHOUT a single-partition window: per-coarse-bucket lag windows run in
    parallel (partitioned by the 1-hour bucket), and gaps that straddle
    bucket boundaries come from an ordered pass over the BUCKET SUMMARY
    table, whose row count is bounded by the data's time span in hours —
    not its row count. Returns None for an empty side. Three plan-time
    scalars, like infer_min_spacing's A3 inference."""
    t = epoch_micros(time_col, dict(df.dtypes)[time_col])
    rows = df.select(t.alias("_t")).where(F.col("_t").isNotNull())
    b = rows.withColumn("_b", F.floor(F.col("_t") / F.lit(_COARSE_US)))
    w_in = Window.partitionBy("_b").orderBy("_t")
    local = b.withColumn("_g", F.col("_t") - F.lag("_t").over(w_in))
    summary = local.groupBy("_b").agg(
        F.min("_t").alias("_mn"), F.max("_t").alias("_mx"), F.max("_g").alias("_lg")
    )
    w_b = Window.orderBy("_b")
    g = summary.withColumn("_bg", F.col("_mn") - F.lag("_mx").over(w_b))
    out = g.agg(
        F.min("_mn").alias("mn"),
        F.max("_mx").alias("mx"),
        F.greatest(
            F.coalesce(F.max("_lg"), F.lit(0)), F.coalesce(F.max("_bg"), F.lit(0))
        ).alias("gap"),
    ).collect()
    if not out or out[0]["mn"] is None:
        return None
    r = out[0]
    return int(r["mn"]), int(r["mx"]), int(r["gap"])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    tolerance_seconds: float | None = None,
    partition_by: list[str] | None = None,
    right_prefix: str = "matched_",
    keep_unmatched: bool = False,
    dt_col: str | None = None,
    right_id_col: str | None = None,
) -> DataFrame:
    """Nearest-time join: each left row gains the nearest right row's columns
    (prefixed), kept only when ``|Δt| <= tolerance`` (ties → earlier right).

    ``partition_by`` lists equi-join keys present on BOTH sides (e.g.
    ``["aux_name"]``). Without it, and with a tolerance, time-bucket
    replication (see module docstring) keeps the plan parallel.

    ``right_id_col`` (a column that uniquely keys right rows): when set,
    the union+window carries ONLY ``(right_on, right_id_col)`` and the full
    right payload equi-joins back on the id afterwards. For wide right rows
    (embedding vectors, tile arrays) this keeps the replicated/shuffled
    window input to ~16 bytes/row — the 100 TB knob. Semantics identical.
    """
    if right_id_col is not None:
        keys = list(partition_by or [])
        slim = right.select(*keys, right_on, right_id_col)
        matched = asof_join(
            left,
            slim,
            left_on,
            right_on,
            tolerance_seconds=tolerance_seconds,
            partition_by=partition_by,
            right_prefix=right_prefix,
            keep_unmatched=keep_unmatched,
            dt_col=dt_col,
            right_id_col=None,
        )
        # matched already carries the prefixed right_on; the payload join
        # contributes the id + remaining columns only
        payload = right.drop(*keys, right_on) if keys else right.drop(right_on)
        pref = payload.select(
            *[F.col(c).alias(f"{right_prefix}{c}") for c in payload.columns]
        )
        how = "left" if keep_unmatched else "inner"
        return matched.join(pref, on=f"{right_prefix}{right_id_col}", how=how)

    keys = list(partition_by or [])
    payload_cols = [c for c in right.columns if c not in keys]
    # _tus (epoch µs, computed per-side with that side's timestamp dtype —
    # TIMESTAMP or TIMESTAMP_NTZ) leads the struct: all Δt arithmetic below
    # is integer math on it, and since it is a monotone image of _t it never
    # perturbs the struct tie-ordering (equal _t ⇒ equal _tus ⇒ ties still
    # fall through to the payload fields).
    rstruct = F.struct(
        epoch_micros(right_on, dict(right.dtypes)[right_on]).alias("_tus"),
        *[F.col(c) for c in payload_cols],
    )

    lhs = (
        left.withColumn("_t", F.col(left_on))
        .withColumn("_tus", epoch_micros(left_on, dict(left.dtypes)[left_on]))
        .withColumn("_is_left", F.lit(1))
    )
    rhs = (
        right.withColumn("_t", F.col(right_on))
        .withColumn("_is_left", F.lit(0))
        .select(*keys, "_t", "_is_left", rstruct.alias("_r"))
    )

    radius_us = None
    clamp = None
    if not keys:
        if tolerance_seconds is not None:
            radius_us = max(float(tolerance_seconds), 1e-6) * 1e6
        else:
            # no tolerance given: without buckets the whole axis lands in
            # ONE window partition (the banned single-partition window —
            # 123 s at sf0.1 before this path existed). Infer a radius
            # that still guarantees exactness: with G = the rights' max
            # consecutive gap, every point CLAMPED into [min_r, max_r] has
            # its nearest right within G/2 ≤ G; out-of-range lefts clamp
            # to the boundary for BUCKETING only (their nearest right is
            # the boundary right, which lives in the clamped bucket), and
            # all Δt math still uses the original time.
            stats = _right_gap_stats(right, right_on)
            if stats is not None:
                min_us, max_us, gap_us = stats
                radius_us = float(max(gap_us, 1))
                clamp = (min_us, max_us)
    if radius_us is not None:
        # width = 2·radius with rights exploded into the buckets covering
        # [r-radius, r+radius]: that interval is exactly one bucket wide,
        # so its endpoints' floors differ by ≤1 — every right lands in ≤2
        # buckets (1 when both floors agree). Any left t in bucket b with
        # |t-r| ≤ radius satisfies r+radius ≥ t ≥ b·w and r-radius ≤ t <
        # (b+1)·w, so b is always among the covered buckets — exact.
        tol_us = F.lit(radius_us)
        w_us = F.lit(2.0 * radius_us)
        lt = F.col("_tus")
        if clamp is not None:
            lt = F.greatest(F.lit(min_us), F.least(F.lit(max_us), lt))
        lhs = lhs.withColumn("_bucket", F.floor(lt / w_us))
        rhs = rhs.withColumn(
            "_bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor((F.col("_r._tus") - tol_us) / w_us),
                        F.floor((F.col("_r._tus") + tol_us) / w_us),
                    )
                )
            ),
        )
        keys = ["_bucket"]

    lcols = [c for c in lhs.columns if c not in {"_t", "_tus", "_is_left"} and c not in keys]
    unioned = lhs.select(
        *keys, "_t", "_tus", "_is_left",
        F.lit(None).cast(rhs.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
    ).unionByName(rhs, allowMissingColumns=True)

    # order right rows before left rows at equal t so an exact match is
    # visible as "previous" with dt=0. ONE ordering serves both frames, so
    # Spark sorts each key partition exactly once (two orderings differing
    # only in _r direction forced a second sort). The _r tiebreak makes
    # TIED right timestamps deterministic — without it, AQE re-plans could
    # flip which of two same-t right rows last()/first() lands on. Tie
    # rule under the shared ascending order: among rights tied at the
    # nearest EARLIER time, last() picks the struct-MAX payload; among
    # rights tied at the nearest LATER time, first() picks the struct-MIN
    # payload. Oracles mirror this with an ORDER BY chain of
    # (|dt|, t, sign-flipped id). Struct ordering requires orderable
    # payload types; for map-typed payloads pass right_id_col so the slim
    # (t, id) struct is what gets ordered.
    w = Window.partitionBy(*keys).orderBy(
        F.col("_t").asc(), F.col("_is_left").asc(), F.col("_r").asc()
    )
    prev = F.last("_r", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = F.first("_r", ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )

    lm = F.col("_tus")
    dt_prev = lm - prev["_tus"]
    dt_next = nxt["_tus"] - lm
    use_prev = F.when(prev.isNull(), F.lit(False)).when(nxt.isNull(), F.lit(True)).otherwise(dt_prev <= dt_next)
    chosen = F.when(use_prev, prev).otherwise(nxt)
    dt = F.when(use_prev, dt_prev).otherwise(dt_next) / F.lit(1e6)

    # annotate BEFORE filtering to left rows — the window must see both sides
    matched = (
        unioned.withColumn("_chosen", chosen)
        .withColumn("_dt", dt)
        .where(F.col("_is_left") == 1)
    )
    if tolerance_seconds is not None:
        ok = F.col("_chosen").isNotNull() & (F.col("_dt") <= F.lit(float(tolerance_seconds)))
    else:
        ok = F.col("_chosen").isNotNull()
    matched = matched.withColumn("_chosen", F.when(ok, F.col("_chosen")))
    if not keep_unmatched:
        matched = matched.where(F.col("_chosen").isNotNull())

    out_cols = [F.col("_l")[c].alias(c) for c in lcols]
    if partition_by:
        out_cols = [F.col(k) for k in partition_by] + out_cols
    out_cols += [F.col("_chosen")[c].alias(f"{right_prefix}{c}") for c in payload_cols]
    if dt_col:
        out_cols.append(
            F.when(F.col("_chosen").isNotNull(), F.col("_dt")).alias(dt_col)
        )
    return matched.select(*out_cols)


def match_aux_to_scenes(
    scenes: DataFrame,
    aux: DataFrame,
    strategy: str = "single_scene_per_aux_time",
    scene_time: str = "t",
    aux_time: str = "t_aux",
    dt_aux_seconds: float | None = None,
) -> DataFrame:
    """J2/J3 with the reference's two strategies and A3 tolerance inference.

    Reference: aux_sources.py:178-231; tolerance is ``dt_aux/2`` with
    ``<=`` at the edge (aux_sources.py:219,229).
    """
    if dt_aux_seconds is None:
        dt_aux_seconds = infer_min_spacing(aux, aux_time)
        if dt_aux_seconds is None:
            raise ValueError("cannot infer dt_aux from a single aux time")
    tol = dt_aux_seconds / 2.0
    if strategy == "single_scene_per_aux_time":
        return asof_join(aux, scenes, aux_time, scene_time, tolerance_seconds=tol, right_prefix="scene_")
    if strategy == "all_scenes_within_dt_aux":
        return asof_join(scenes, aux, scene_time, aux_time, tolerance_seconds=tol, right_prefix="aux_")
    raise ValueError(f"unknown strategy {strategy!r}")
