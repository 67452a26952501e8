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

# Rayleigh optical depths for the GOES-ABI visible bands (λ in µm:
# C01 blue 0.47, C02 red 0.64, C03 "veggie" NIR 0.86), from the standard
# λ⁻⁴ fit τ(λ) ≈ 0.008569·λ⁻⁴·(1 + 0.0113·λ⁻² + 0.00013·λ⁻⁴)
# (Hansen & Travis 1974 / Bodhaine et al. 1999 — public literature).
def rayleigh_optical_depth(wavelength_um: float) -> float:
    l2 = wavelength_um * wavelength_um
    l4 = l2 * l2
    return 0.008569 / l4 * (1.0 + 0.0113 / l2 + 0.00013 / l4)


TAU_ABI = {
    "C01": rayleigh_optical_depth(0.47),
    "C02": rayleigh_optical_depth(0.64),
    "C03": rayleigh_optical_depth(0.86),
}


def solar_cos_zenith(time_col: Column, lat_deg: Column, lon_deg: Column) -> Column:
    """cos(solar zenith) from UTC time + geolocation — the textbook
    spherical-astronomy form (declination from day-of-year, hour angle
    from UTC fraction + longitude). Same geometry family the F3 filter
    (filters.py:63) and the derived-variable shortwave flux use; accuracy
    (±0.5° in declination) is far inside the rayleigh stand-in's error
    budget. Pure Column trig — replayable in any SQL engine.
    """
    two_pi = 6.283185307179586
    rad = 0.017453292519943295
    doy = F.dayofyear(time_col).cast("double")
    decl = F.lit(-23.44 * rad) * F.cos(F.lit(two_pi / 365.25) * (doy + F.lit(10.0)))
    sec = (
        F.hour(time_col) * 3600 + F.minute(time_col) * 60 + F.second(time_col)
    ).cast("double")
    hour_angle = F.lit(two_pi) * (sec / F.lit(86400.0) - F.lit(0.5)) + lon_deg * F.lit(rad)
    phi = lat_deg * F.lit(rad)
    return F.sin(phi) * F.sin(decl) + F.cos(phi) * F.cos(decl) * F.cos(hour_angle)


def rayleigh_reflectance(
    tau: float, mu_s: Column, mu_v: Column, cos_scat: Column
) -> Column:
    """Single-scattering Rayleigh path reflectance
    ``ρ_r = τ·P(Θ) / (4·μ_s·μ_v)`` with the Rayleigh phase function
    ``P(Θ) = ¾·(1 + cos²Θ)`` — the first-order term every atmospheric
    correction starts from (public radiative-transfer textbooks; the
    reference reaches the same physics through satpy/pyspectral's
    precomputed LUTs, sources/goes16/satpy_rgb.py:41-94).
    """
    phase = F.lit(0.75) * (F.lit(1.0) + cos_scat * cos_scat)
    return F.lit(tau) * phase / (F.lit(4.0) * mu_s * mu_v)


def rayleigh_correct(
    refl: Column, tau: float, mu_s: Column, mu_v: Column, cos_scat: Column
) -> Column:
    """Rayleigh-corrected band reflectance: subtract the single-scattering
    path reflectance, then divide by the two-way direct beam transmittance
    ``exp(−τ/2·(1/μ_s + 1/μ_v))`` (the CREFL-style correction shape used
    by NASA's public corrected-reflectance code), clipped to [0, 1].

    DOCUMENTED STAND-IN for the reference's satpy ``true_color``
    composite (sources/goes16/satpy_rgb.py:41-94): satpy interpolates
    pyspectral's multiple-scattering LUTs (shipped data files, not
    re-derivable as expressions); this is the analytic first-order term —
    same sign, same geometry dependence, within a few percent reflectance
    of the LUT for μ_s ≳ 0.2. NULL (missing pixel) propagates.
    """
    rho_r = rayleigh_reflectance(tau, mu_s, mu_v, cos_scat)
    t2 = F.exp(F.lit(-tau / 2.0) * (F.lit(1.0) / mu_s + F.lit(1.0) / mu_v))
    return clip01((refl - rho_r) / t2)


def scattering_cosine(mu_s: Column, mu_v: Column, rel_az_deg: Column) -> Column:
    """cos of the scattering angle between the solar and view rays:
    ``cosΘ = −μ_s·μ_v + sqrt(1−μ_s²)·sqrt(1−μ_v²)·cos(φ_rel)`` —
    standard backscatter-geometry identity."""
    rad = 0.017453292519943295
    s_s = F.sqrt(F.greatest(F.lit(1.0) - mu_s * mu_s, F.lit(0.0)))
    s_v = F.sqrt(F.greatest(F.lit(1.0) - mu_v * mu_v, F.lit(0.0)))
    return -mu_s * mu_v + s_s * s_v * F.cos(rel_az_deg * F.lit(rad))


def rayleigh_true_color(
    b: Column,
    r: Column,
    g: Column,
    mu_s: Column,
    mu_v: Column,
    cos_scat: Column,
) -> tuple[Column, Column, Column]:
    """Rayleigh-corrected true-color composite: each visible band gets the
    single-scattering correction (blue strongest, τ∝λ⁻⁴), then the
    existing ``true_color_rgb`` pipeline (clip→gamma→true-green
    mix→contrast) runs on the corrected reflectances — the column-algebra
    analog of satpy's corrected ``true_color`` recipe, end-to-end
    whole-stage-codegen.
    """
    b = rayleigh_correct(mask_missing(b), TAU_ABI["C01"], mu_s, mu_v, cos_scat)
    r = rayleigh_correct(mask_missing(r), TAU_ABI["C02"], mu_s, mu_v, cos_scat)
    g = rayleigh_correct(mask_missing(g), TAU_ABI["C03"], mu_s, mu_v, cos_scat)
    return true_color_rgb(b, r, g)


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
