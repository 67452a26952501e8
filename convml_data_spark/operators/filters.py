"""Filter/predicate operators (SURVEY §2.2, F1–F12).

All of these compile to Column expressions so Catalyst pushes them into the
parquet scan (check ``PushedFilters`` in ``explain('formatted')``) — at
100 TB the filter IS the scan cost, so none of these may leave the JVM.

Reference semantics:
- F1 time-interval OR-of-ranges: convml_data/__init__.py:238-248 (inclusive
  bounds on both ends, any-of-N intervals).
- F2 datetime-component membership: convml_data/utils/time_filters.py:6-26
  (any datetime attribute, value-in-list).
- F3 solar-zenith proximity: convml_data/utils/time_filters.py:29-32 —
  keep times within ``dt_zenith_max`` hours of local solar noon at the
  domain-center longitude (noon_utc ≈ 12h − lon/15°·1h).
- F6 comparison DSL ``prop__op=value`` comma-chained = AND:
  convml_data/pipeline/embeddings/aux_fields/data_filters.py:23-85.
- F7 percentile filter: data_filters.py:6-20.
- F9 longitude wrap to [−180, 180): convml_data/sources/__init__.py:324-339.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timeutils import ts_lit

_COMPONENT_FUNCS = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "dayofweek": F.dayofweek,
    "dayofyear": F.dayofyear,
}


def time_interval_filter(df: DataFrame, time_col: str, intervals: Sequence[tuple]) -> DataFrame:
    """F1: keep rows whose ``time_col`` falls inside ANY [start, end] interval
    (bounds inclusive, matching the reference's ``t_start <= t <= t_end``)."""
    pred = None
    c = F.col(time_col)
    for t0, t1 in intervals:
        p = c.between(ts_lit(t0), ts_lit(t1))
        pred = p if pred is None else (pred | p)
    return df.filter(pred) if pred is not None else df


def datetime_component_filter(df: DataFrame, time_col: str, components: dict[str, Sequence[int]]) -> DataFrame:
    """F2: keep rows whose datetime components are in the given lists,
    e.g. ``{"hour": [9, 12, 15], "minute": [0, 30]}`` (AND across components)."""
    out = df
    for name, values in components.items():
        fn = _COMPONENT_FUNCS[name]
        out = out.filter(fn(F.col(time_col)).isin(list(values)))
    return out


def solar_zenith_filter(df: DataFrame, time_col: str, lon_degrees: float, dt_hours: float) -> DataFrame:
    """F3: keep rows within ``dt_hours`` of local solar noon at ``lon_degrees``.

    Solar noon (UTC seconds-since-midnight) = (12 − lon/15)·3600, wrapped to
    a day; the comparison wraps too so 23:30 is 1 h from a 00:30 noon.
    """
    sec = (
        F.hour(F.col(time_col)) * 3600
        + F.minute(F.col(time_col)) * 60
        + F.second(F.col(time_col))
    ).cast("double")
    noon = F.lit(((12.0 - lon_degrees / 15.0) % 24.0) * 3600.0)
    diff = F.abs(sec - noon)
    wrapped = F.least(diff, F.lit(86400.0) - diff)
    return df.filter(wrapped <= F.lit(dt_hours * 3600.0))


_DSL_OPS = {
    "lt": lambda c, v: c < v,
    "gt": lambda c, v: c > v,
    "lte": lambda c, v: c <= v,
    "gte": lambda c, v: c >= v,
    "eq": lambda c, v: c == v,
    "isnan": lambda c, v: F.isnan(c) if v else ~F.isnan(c),
}


def parse_filter_dsl(spec: str) -> Column:
    """F6: ``"l_quantity__lt=10,l_discount__gte=0.05"`` → AND-ed predicate.

    Mirrors the reference's ``prop__op=value`` grammar
    (aux_fields/data_filters.py:23-85); values parse as float, bool for
    isnan, else string.
    """
    pred = None
    for clause in spec.split(","):
        lhs, _, raw = clause.partition("=")
        prop, _, op = lhs.rpartition("__")
        if not prop or op not in _DSL_OPS:
            raise ValueError(f"bad filter clause: {clause!r}")
        try:
            value = float(raw)
        except ValueError:
            value = {"true": True, "false": False}.get(raw.lower(), raw)
        p = _DSL_OPS[op](F.col(prop), F.lit(value))
        pred = p if pred is None else (pred & p)
    if pred is None:
        raise ValueError("empty filter spec")
    return pred


def percentile_filter(
    df: DataFrame, col: str, q: float, keep: str = "above", method: str = "sort"
) -> DataFrame:
    """F7: keep rows above/below the exact q-th percentile of ``col``.

    ``method="sort"`` (default) computes the limit with the distributed
    exact-quantile selection (no single-task digest) and filters on the
    resulting LITERAL — which Catalyst pushes down to the parquet scan.
    ``method="agg"`` keeps the single-plan broadcast-subquery variant
    (lazy, but the limit merge is one task). Both are exact linear
    interpolation — identical to DuckDB's ``quantile_cont``.
    """
    if method == "sort":
        from .binning import exact_quantiles

        lim = exact_quantiles(df, col, [q])[0]
        pred = F.col(col) > F.lit(lim) if keep == "above" else F.col(col) < F.lit(lim)
        return df.filter(pred)
    lim = df.agg(F.expr(f"percentile({col}, {q})").alias("_lim"))
    joined = df.join(F.broadcast(lim))
    pred = F.col(col) > F.col("_lim") if keep == "above" else F.col(col) < F.col("_lim")
    return joined.filter(pred).drop("_lim")


def wrap_longitude(col: Column) -> Column:
    """F9: wrap any longitude-like value to [−180, 180)."""
    return ((col + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
