"""Derived-variable expression DAG — SURVEY §2.11 (view/CTE layer).

Reference semantics: ``DERIVED_VARIABLES`` maps a variable name to
``(calc_fn, [input_names])``; inputs are resolved recursively (depth cap 10)
down to base variables, then executed bottom-up
(convml_data/sources/era5/base.py:127-151,
convml_data/sources/__init__.py:136-157,401-415).

Spark design: the registry stores ``name -> (fn, inputs)`` where ``fn`` maps
Column kwargs to a Column EXPRESSION. ``compile`` topologically walks the DAG
and emits one ``withColumn`` per derived variable — Catalyst's project
collapse merges the chain into a single projection, and shared intermediates
(the reference's ``alt_p`` reuse) are common subexpressions the optimizer
dedups. No UDF, no materialization between steps.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_DEPTH = 10  # reference cap: sources/__init__.py:150


class DerivedVariableRegistry:
    """name → (fn(Column kwargs) → Column, input variable names)."""

    def __init__(self) -> None:
        self._vars: dict[str, tuple[Callable[..., Column], list[str]]] = {}

    def register(self, name: str, inputs: Sequence[str]):
        def deco(fn: Callable[..., Column]):
            self._vars[name] = (fn, list(inputs))
            return fn

        return deco

    def add(self, name: str, fn: Callable[..., Column], inputs: Sequence[str]) -> None:
        self._vars[name] = (fn, list(inputs))

    def __contains__(self, name: str) -> bool:
        return name in self._vars

    def source_variables(self, name: str) -> set[str]:
        """Recursively resolve to the base (non-derived) variable set —
        the scan's minimal column list (reference
        ``_find_source_variables_set``, sources/__init__.py:136-157)."""
        return resolve_source_variables(self._vars, name)

    def _order(self, targets: Sequence[str]) -> list[str]:
        """Topological order of the derived variables needed for targets."""
        order: list[str] = []
        seen: set[str] = set()

        def visit(name: str, depth: int) -> None:
            if depth > MAX_DEPTH:
                raise ValueError(f"derived-variable recursion deeper than {MAX_DEPTH}: {name}")
            if name in seen or name not in self._vars:
                return
            _, inputs = self._vars[name]
            for i in inputs:
                visit(i, depth + 1)
            seen.add(name)
            order.append(name)

        for t in targets:
            visit(t, 0)
        return order

    def compile(self, df: DataFrame, targets: Sequence[str]) -> DataFrame:
        """Attach every derived column needed for ``targets`` (bottom-up).

        Base inputs must already exist on ``df``; a missing one raises with
        the resolved requirement set, mirroring the reference's fail-fast
        KeyError at plan-build time.
        """
        need = set()
        for t in targets:
            need |= self.source_variables(t)
        missing = need - set(df.columns)
        if missing:
            raise ValueError(f"missing base variables {sorted(missing)} for targets {list(targets)}")
        # batch CONSECUTIVE runs of the topological order into one
        # withColumns projection each: a 14-variable chain of withColumn
        # calls costs 14 full plan re-analyses, run-batched it is ~the
        # DAG's dependency chain length. Runs (not depth levels) so the
        # registration order of window-bearing variables is preserved —
        # reordering them can demote the shared (keys, order) sort below a
        # keys-only window and cost a second sort in the physical plan.
        out = df
        batch: dict[str, Column] = {}
        for name in self._order(targets):
            fn, inputs = self._vars[name]
            if any(i in batch for i in inputs):
                out = out.withColumns(batch)
                batch = {}
            batch[name] = fn(**{i: F.col(i) for i in inputs})
        if batch:
            out = out.withColumns(batch)
        return out


def resolve_source_variables(
    registry: dict[str, tuple[Callable[..., Column], list[str]]], name: str, depth: int = 0
) -> set[str]:
    if depth > MAX_DEPTH:
        raise ValueError(f"derived-variable recursion deeper than {MAX_DEPTH}: {name}")
    if name not in registry:
        return {name}
    _, inputs = registry[name]
    out: set[str] = set()
    for i in inputs:
        out |= resolve_source_variables(registry, i, depth + 1)
    return out


# physical constants (public: metpy.constants / eurec4a_environment.constants)
G = 9.80665      # gravity [m s^-2]
RD = 287.06      # dry-air gas constant [J kg^-1 K^-1]
CP = 1004.7      # dry-air specific heat [J kg^-1 K^-1]
KAPPA = 0.2854   # Rd/cp (Poisson exponent)
LV = 2.501e6     # latent heat of vaporization [J kg^-1]
EPS = 0.622      # Rd/Rv


def era5_like_registry(
    column_keys: Sequence[str] = ("cid",),
    level_col: str = "level",
    n_levels: int = 40,
) -> DerivedVariableRegistry:
    """The reference's FULL 14-variable physics DAG
    (era5/base.py:127-151, scalars.py:31-120) re-expressed on a long
    (column, level) pixel table. Every variable is a Column expression --
    per-row math stays in whole-stage codegen; per-atmospheric-column
    reductions (layer means, LTS/EIS level picks, the cumulative
    hydrostatic height integration) are WINDOW expressions partitioned by
    ``column_keys``, so the whole DAG is one shuffle by column id at any
    scale. ``level`` runs 0 (top) ... n_levels-1 (surface).

    Documented simplifications vs the reference (which runs on real ERA5
    hybrid-coordinate coefficient tables and scipy peak-finding):

    - half-level pressures use a sigma coordinate
      ``p_half(k) = sp*(k+1)/(n+1)`` instead of the ERA5 ``a_k + b_k*sp``
      table (calculate_heights_and_pressures, era5/utils.py); the
      hydrostatic layer-thickness integration over virtual temperature is
      the same cumulative-over-level recurrence.
    - ``z_lcl`` keeps Bolton's per-level T_LCL and the reference's
      ``half_minmax`` column sampling (scalars.py:31-120) but samples the
      boundary layer directly instead of the scipy ``find_peaks`` layer
      search.
    - boundary/cloud layers scale the reference's model-level slices
      (levels_bl = 120..137, levels_cl = 101..120 of 137) to ``n_levels``.
    """
    from pyspark.sql import Window

    reg = DerivedVariableRegistry()
    keys = [F.col(k) for k in column_keys]
    lev = F.col(level_col)
    w_col = Window.partitionBy(*keys)
    # cumulative from current level DOWN to the surface (level ascends
    # toward the surface): the hydrostatic sum of layer thicknesses below.
    # Both ordered windows share one (column, level) sort.
    w_below = (
        Window.partitionBy(*keys)
        .orderBy(lev)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_ord = Window.partitionBy(*keys).orderBy(lev)

    bl_lo = int(round(120 / 137 * n_levels))   # boundary layer: bl_lo..surface
    cl_lo = int(round(101 / 137 * n_levels))   # cloud layer: cl_lo..bl_lo-1
    in_bl = lev >= F.lit(bl_lo)
    in_cl = (lev >= F.lit(cl_lo)) & (lev < F.lit(bl_lo))

    def _nearest(target_p: float, value: Column, p: Column) -> Column:
        """Per-column value at the level whose pressure is nearest target:
        min-struct over (|p - target|, value), an unordered window agg."""
        return F.min(
            F.struct(F.abs(p - F.lit(target_p)).alias("d"), value.alias("v"))
        ).over(w_col)["v"]

    reg.add("umag", lambda u, v: F.sqrt(u * u + v * v), ["u", "v"])
    reg.add("sp", lambda lnsp: F.exp(lnsp), ["lnsp"])

    def _alt_p(q: Column, t: Column, z: Column, sp: Column) -> Column:
        # sigma half levels: p_half above level j = sp*(j+1)/(n+1), below =
        # sp*(j+2)/(n+1); full-level pressure = their mean. Layer thickness
        # via the hypsometric equation dz = (Rd*Tv/g)*ln(p_below/p_above);
        # the log ratio is a per-level CONSTANT under sigma spacing.
        tv = t * (F.lit(1.0) + F.lit(0.608) * q)
        lnr = F.log(
            (lev.cast("double") + F.lit(2.0)) / (lev.cast("double") + F.lit(1.0))
        )
        p_f = (
            sp
            * (F.lit(2.0) * lev.cast("double") + F.lit(3.0))
            / F.lit(2.0 * (n_levels + 1))
        )
        alt = z / F.lit(G) + F.lit(RD / G) * F.sum(tv * lnr).over(w_below)
        return F.struct(alt.alias("alt"), p_f.alias("p"))

    reg.add("alt_p", _alt_p, ["q", "t", "z", "sp"])
    reg.add("alt", lambda alt_p: alt_p["alt"], ["alt_p"])
    reg.add("p", lambda alt_p: alt_p["p"], ["alt_p"])

    def _rh(t: Column, q: Column, p: Column) -> Column:
        # metpy relative_humidity_from_specific_humidity: w/ws with Bolton
        # saturation vapor pressure
        es = F.lit(611.2) * F.exp(
            F.lit(17.67) * (t - F.lit(273.15)) / (t - F.lit(29.65))
        )
        w = q / (F.lit(1.0) - q)
        ws = F.lit(EPS) * es / (p - es)
        return w / ws

    reg.add("rh", _rh, ["t", "q", "p"])
    reg.add(
        "theta",
        lambda p, t: t * F.pow(F.lit(100000.0) / p, F.lit(KAPPA)),
        ["p", "t"],
    )

    def _lts(alt_p: Column, theta: Column) -> Column:
        # LTS = theta(700 hPa) - theta(surface)
        # (tropical_variables.lower_tropospheric_stability)
        theta_700 = _nearest(70000.0, theta, alt_p["p"])
        theta_sfc = F.min(
            F.struct((-lev.cast("double")).alias("d"), theta.alias("v"))
        ).over(w_col)["v"]
        return theta_700 - theta_sfc

    reg.add("d_theta__lts", _lts, ["alt_p", "theta"])

    def _z_lcl(alt: Column, t: Column, rh: Column) -> Column:
        # Bolton (1980): T_LCL = 1/(1/(T-55) - ln(RH)/2840) + 55 per level;
        # lift height z - cp*(T_LCL-T)/g; column value = half_minmax over
        # the boundary layer where RH>0 (scalars.py:63-106)
        t_lcl = F.lit(1.0) / (
            F.lit(1.0) / (t - F.lit(55.0)) - F.log(rh) / F.lit(2840.0)
        ) + F.lit(55.0)
        zl = alt - F.lit(CP / G) * (t_lcl - t)
        sel = F.when(in_bl & (rh > F.lit(0.0)), zl)
        return F.lit(0.5) * (F.min(sel).over(w_col) + F.max(sel).over(w_col))

    reg.add("z_lcl", _z_lcl, ["alt", "t", "rh"])

    def _eis(
        alt_p: Column,
        theta: Column,
        d_theta__lts: Column,
        t: Column,
        z_lcl: Column,
    ) -> Column:
        # Wood & Bretherton (2006): EIS = LTS - Gamma_m(T850)*(z700 - LCL)
        p = alt_p["p"]
        t850 = _nearest(85000.0, t, p)
        z700 = _nearest(70000.0, alt_p["alt"], p)
        es850 = F.lit(611.2) * F.exp(
            F.lit(17.67) * (t850 - F.lit(273.15)) / (t850 - F.lit(29.65))
        )
        qs850 = F.lit(EPS) * es850 / (F.lit(85000.0) - es850)
        gamma_m = F.lit(G / CP) * (
            F.lit(1.0)
            - (F.lit(1.0) + F.lit(LV) * qs850 / (F.lit(RD) * t850))
            / (
                F.lit(1.0)
                + F.lit(LV * LV * EPS) * qs850 / (F.lit(CP * RD) * t850 * t850)
            )
        )
        return d_theta__lts - gamma_m * (z700 - z_lcl)

    reg.add("d_theta__eis", _eis, ["alt_p", "theta", "d_theta__lts", "t", "z_lcl"])

    def _layer_mean(expr: Column, mask: Column) -> Column:
        # decimal-truncated term sum, not avg(): an unordered window frame
        # sums its ~40 doubles in partition-row order, which differs
        # between engines (and between Spark runs under AQE) by ~1 ulp —
        # enough to straddle bl_qmean's round(8) grid at float32-precision
        # q values (40/100k rows flipped at sf0.1). DECIMAL(38,18) terms
        # make the reduction exact and order-independent; the single final
        # division is the same op in both engines (corpus_entropy pattern).
        masked = F.when(mask, expr)
        s = F.sum(masked.cast("decimal(38,18)")).over(w_col)
        return s.cast("double") / F.count(masked).over(w_col)

    reg.add(
        "bl_umag", lambda u, v: _layer_mean(F.sqrt(u * u + v * v), in_bl), ["u", "v"]
    )
    reg.add(
        "cl_umag", lambda u, v: _layer_mean(F.sqrt(u * u + v * v), in_cl), ["u", "v"]
    )
    reg.add("bl_qmean", lambda q: _layer_mean(q, in_bl), ["q"])
    reg.add("cl_qmean", lambda q: _layer_mean(q, in_cl), ["q"])

    def _tpw(q: Column, p: Column) -> Column:
        # xarray differentiate over level: central differences inside,
        # one-sided at the column edges; tpw = sum(q*dp) / 9.8 (reference
        # literal, base.py:119-125)
        has_next = F.lead(p).over(w_ord).isNotNull()
        has_prev = F.lag(p).over(w_ord).isNotNull()
        dp = (
            F.coalesce(F.lead(p).over(w_ord), p)
            - F.coalesce(F.lag(p).over(w_ord), p)
        ) / F.when(has_next & has_prev, F.lit(2.0)).otherwise(F.lit(1.0))
        return F.sum(q * dp).over(w_col) / F.lit(9.8)

    reg.add("tpw", _tpw, ["q", "p"])
    return reg
