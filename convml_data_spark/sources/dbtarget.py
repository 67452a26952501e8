"""YAML/JSON "database" targets — the reference's small-relation
interchange format (convml_data/utils/luigi.py:91-117, ``DBTarget``
dispatching ``YAMLTarget``/``JSONTarget``; files are ``{db_name}.yml`` or
``{db_name}.json`` under a directory, written with plain ``yaml.dump`` /
``json.dump``).

These files are by contract SMALL (scene catalogs, tiles-per-scene maps —
plan-level metadata, not data): the reference materializes every one of
them as a single YAML document, so a driver-side ``collect()`` here is the
format's own size contract, not a scale violation. Bulk relations go
through the parquet sinks in ``pipeline.py``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_EXT = {"yaml": "yml", "json": "json"}


def db_path(path: str, db_name: str, db_type: str = "yaml") -> str:
    if db_type not in _EXT:
        raise NotImplementedError(db_type)
    return os.path.join(path, f"{db_name}.{_EXT[db_type]}")


def exists_db(path: str, db_name: str, db_type: str = "yaml") -> bool:
    """Target-existence incrementality, like the reference's ``exists()``."""
    return os.path.exists(db_path(path, db_name, db_type))


def write_db(path: str, db_name: str, obj, db_type: str = "yaml") -> str:
    p = db_path(path, db_name, db_type)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as fh:
        if db_type == "yaml":
            import yaml

            yaml.dump(obj, fh)
        else:
            json.dump(obj, fh, default=str)
    return p


def read_db(path: str, db_name: str, db_type: str = "yaml"):
    with open(db_path(path, db_name, db_type)) as fh:
        if db_type == "yaml":
            import yaml

            return yaml.load(fh, Loader=yaml.SafeLoader)
        return json.load(fh)


def df_to_db(
    df: DataFrame, path: str, db_name: str, key_col: str, db_type: str = "yaml"
) -> str:
    """Write a small relation as the reference's keyed-dict layout:
    ``{key: {col: value, ...}}`` (one inner dict per row — the shape
    ``GenerateSceneIDs`` writes for scene_id → per-input files)."""
    rows = df.collect()  # small-relation contract; see module docstring
    obj = {
        r[key_col]: {c: r[c] for c in df.columns if c != key_col} for r in rows
    }
    return write_db(path, db_name, obj, db_type)


def db_to_df(
    spark: SparkSession,
    path: str,
    db_name: str,
    key_col: str = "scene_id",
    db_type: str = "yaml",
    schema: str | None = None,
) -> DataFrame:
    """Read a reference-format keyed-dict database back as a DataFrame
    (inverse of :func:`df_to_db`).

    An EMPTY database (a normal incremental-pipeline state — e.g. no
    scenes discovered yet) round-trips to an empty DataFrame instead of
    crashing schema inference; pass ``schema`` (DDL string) to control
    the empty relation's columns (default: just the key column).
    """
    obj = read_db(path, db_name, db_type) or {}
    rows = [{key_col: k, **(v or {})} for k, v in obj.items()]
    if not rows:
        return spark.createDataFrame([], schema or f"{key_col} string")
    return spark.createDataFrame(rows, schema=schema)
