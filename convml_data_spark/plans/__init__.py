"""Plan-building layer: derived-variable DAG compilation (SURVEY §2.11)."""

from .derived import DerivedVariableRegistry, resolve_source_variables

__all__ = ["DerivedVariableRegistry", "resolve_source_variables"]
