"""User-function registry — SURVEY §2.12 X1.

Reference semantics (convml_data/sources/user_functions.py:5-41): a
``user_functions.py`` next to the dataset config defines named functions;
the engine looks them up by product name, calls them with ``da_<input>``
kwargs, and VALIDATES the result (attrs ``long_name``/``units`` present;
image-producing functions must return values in [0, 1] —
sources/images.py:96-124).

Spark design: functions map Column kwargs → Column (expression-level, so
they stay in whole-stage codegen); metadata is declared at registration and
attached as column metadata; the [0,1] range check compiles to a fail-fast
``raise_error`` guard expression rather than a post-hoc scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class UserFunctionRegistry:
    def __init__(self) -> None:
        self._fns: dict[str, dict] = {}

    def register(
        self,
        name: str,
        inputs: list[str],
        units: str,
        long_name: str,
        bounded_01: bool = False,
    ):
        """Register ``fn(**input_columns) -> Column`` under ``name``.

        ``units``/``long_name`` are required — the reference *asserts* their
        presence on the returned DataArray; here absence is unrepresentable.
        """

        def deco(fn: Callable[..., Column]):
            self._fns[name] = {
                "fn": fn,
                "inputs": inputs,
                "units": units,
                "long_name": long_name,
                "bounded_01": bounded_01,
            }
            return fn

        return deco

    def __contains__(self, name: str) -> bool:
        return name in self._fns

    def metadata(self, name: str) -> dict:
        spec = self._fns[name]
        return {"units": spec["units"], "long_name": spec["long_name"]}

    def apply(self, df: DataFrame, name: str, out_col: str | None = None) -> DataFrame:
        """Attach the named derived column; enforce the [0,1] contract for
        image-producing functions with an in-plan guard (null passes, like
        the reference's NaN-tolerant masks)."""
        spec = self._fns[name]
        missing = set(spec["inputs"]) - set(df.columns)
        if missing:
            raise ValueError(f"user function {name!r} needs columns {sorted(missing)}")
        col = spec["fn"](**{i: F.col(i) for i in spec["inputs"]})
        if spec["bounded_01"]:
            col = F.when(
                col.isNull() | ((col >= 0.0) & (col <= 1.0)), col
            ).otherwise(F.raise_error(F.lit(f"user function {name}: value outside [0,1]")))
        out = out_col or name
        return df.withColumn(out, col.alias(out, metadata=self.metadata(name)))
