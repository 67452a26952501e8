"""Image math on long pixel tables — SURVEY §2 G8 (RGB compositing).

Reference semantics (all pure element-wise / per-scene math):

- ``contrast_correction`` + gamma + "true green" mix:
  convml_data/sources/goes16/utils.py:5-56 (``create_true_color_img``):
  channels arrive scaled by 1/256, ``-1`` marks missing, channels are
  clipped to [0,1], gamma-corrected with exponent 0.4, the green channel is
  rebuilt as ``0.48358168·R + 0.45706946·B + 0.06038137·G``, and the stack
  gets a contrast curve with level 80.
- ``make_rgb``: convml_data/sources/images.py:12-62 — three components are
  min/max-scaled to [0,1] *within the scene* (optionally inverted).

Spark design: every step is a Column expression over the pixel table —
whole-stage codegen end to end, zero UDFs, and the per-scene min/max of
``make_rgb`` is an unordered window aggregate keyed by the scene id, so
scenes scale independently and in parallel. The reference's NaN sentinel
for missing pixels maps to SQL NULL (propagates through arithmetic
identically in Spark and any SQL oracle, which NaN does not: Spark's
``least``/``greatest`` order NaN above every number while numpy's
min/max propagate it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# true-green mixing weights (goes16/utils.py:44)
TRUE_GREEN = (0.48358168, 0.45706946, 0.06038137)
GAMMA = 0.4
CONTRAST = 80.0


def clip01(c: Column) -> Column:
    """Clip to [0,1] with NULL passthrough (CASE chain, not least/greatest,
    so a missing pixel stays missing in both engines)."""
    return F.when(c < F.lit(0.0), F.lit(0.0)).when(c > F.lit(1.0), F.lit(1.0)).otherwise(c)


def contrast_correction(c: Column, contrast: float = CONTRAST) -> Column:
    """goes16/utils.py:8-18: linear contrast curve about 0.5, clipped."""
    factor = (259.0 * (contrast + 255.0)) / (255.0 * 259.0 - contrast)
    return clip01(F.lit(factor) * (c - F.lit(0.5)) + F.lit(0.5))


def mask_missing(c: Column, sentinel: float = -1.0) -> Column:
    """goes16/utils.py:23-26: the reference turns the file sentinel into
    NaN; the relational analog is NULL."""
    return F.when(c == F.lit(sentinel), F.lit(None).cast("double")).otherwise(c)


def true_color_rgb(b: Column, r: Column, g: Column) -> tuple[Column, Column, Column]:
    """goes16/utils.py:20-55 ``channels_to_rgb`` + contrast: channels are
    pre-scaled by 1/256 with -1 = missing; returns (r, g_true, b) in [0,1].
    Argument order matches the reference's ``B, R, G = channels``."""
    r = clip01(mask_missing(r))
    g = clip01(mask_missing(g))
    b = clip01(mask_missing(b))
    r = F.pow(r, F.lit(GAMMA))
    g = F.pow(g, F.lit(GAMMA))
    b = F.pow(b, F.lit(GAMMA))
    wr, wb, wg = TRUE_GREEN
    g_true = clip01(F.lit(wr) * r + F.lit(wb) * b + F.lit(wg) * g)
    return (
        contrast_correction(r),
        contrast_correction(g_true),
        contrast_correction(b),
    )


def make_rgb(
    df: DataFrame,
    components: tuple[str, str, str],
    scene_col: str | None = None,
    alpha: float = 0.5,
    invert_values: bool = False,
) -> DataFrame:
    """images.py:12-62: scale three component columns to [0,1] by their
    min/max (per ``scene_col`` when given, else whole-table via a keyless
    agg broadcast back — NOT a keyless window, which would serialize into
    one partition). Adds ``r``, ``g``, ``b``, ``a`` columns."""
    from pyspark.sql import Window

    if scene_col is not None:
        w = Window.partitionBy(scene_col)
        bounds = {c: (F.min(c).over(w), F.max(c).over(w)) for c in components}
        out = df
    else:
        aggs = []
        for c in components:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        glob = df.agg(*aggs)
        out = df.crossJoin(F.broadcast(glob))
        bounds = {c: (F.col(f"_mn_{c}"), F.col(f"_mx_{c}")) for c in components}
    names = ("r", "g", "b")
    for name, c in zip(names, components):
        mn, mx = bounds[c]
        scaled = (F.col(c) - mn) / (mx - mn)
        if invert_values:
            scaled = F.lit(1.0) - scaled
        out = out.withColumn(name, scaled)
    out = out.withColumn("a", F.lit(float(alpha)))
    return out.drop(*[c for c in out.columns if c.startswith("_mn_") or c.startswith("_mx_")])
