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
        out = df
        for name in self._order(targets):
            fn, inputs = self._vars[name]
            out = out.withColumn(name, fn(**{i: F.col(i) for i in inputs}))
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


def era5_like_registry() -> DerivedVariableRegistry:
    """The reference's physics DAG shape (era5/base.py:127-151) re-expressed
    on generic column names: umag = √(u²+v²), p = exp(lnsp),
    theta = t·(p0/p)^κ, lts = theta_top − theta, …"""
    reg = DerivedVariableRegistry()
    reg.add("umag", lambda u, v: F.sqrt(u * u + v * v), ["u", "v"])
    reg.add("p", lambda lnsp: F.exp(lnsp), ["lnsp"])
    reg.add(
        "theta",
        lambda t, p: t * F.pow(F.lit(100000.0) / p, F.lit(0.2854)),
        ["t", "p"],
    )
    reg.add("lts", lambda theta, theta_700: theta_700 - theta, ["theta", "theta_700"])
    # Bolton (1980) eq. 21: LCL temperature from temperature T [K] and
    # vapor pressure e [hPa]; lifting height via the dry-adiabatic lapse
    # Γ=g/cp (z_lcl = (T − T_LCL)·cp/g). Pure log arithmetic — the deepest
    # per-column physics in the reference's DAG (era5/scalars.py:31-120)
    # expressed without any UDF.
    reg.add(
        "t_lcl",
        lambda t, e: F.lit(2840.0)
        / (F.lit(3.5) * F.log(t) - F.log(e) - F.lit(4.805))
        + F.lit(55.0),
        ["t", "e"],
    )
    reg.add(
        "z_lcl",
        lambda t, t_lcl: (t - t_lcl) * F.lit(1004.7 / 9.80665),
        ["t", "t_lcl"],
    )
    return reg
