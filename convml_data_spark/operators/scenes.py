"""Scene-table construction — SURVEY §2.3 J1 + §3.1 lifecycle.

Reference semantics (convml_data/pipeline/scene_sources.py:31-93):
``merge_multiinput_sources`` groups N per-input file lists by timestamp and
keeps only timestamps present in ALL N inputs (incomplete groups dropped).
The scene id is ``{source}__{yyyyMMddHHmm}`` (scene_sources.py:14-28).

Spark design: the pivot is CONDITIONAL AGGREGATION —
``groupBy(t).agg(min(when(input = k, file)) for each k)`` — not
``.pivot()``: Spark's pivot plans two aggregate phases with two shuffles
(partial by (t, input), re-shuffle by t), while the conditional form
map-side-combines straight into the pivoted layout and shuffles ONCE on t.
Input names are plan-time metadata (the configured channels), so there is
no distinct-collection job either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scene_id import make_scene_id


def multi_input_scene_table(
    files: DataFrame,
    input_names: list[str],
    time_col: str = "t",
    input_col: str = "input_name",
    file_col: str = "filename",
    source_name: str = "scene",
    time_bucket: str | None = None,
) -> DataFrame:
    """J1: N-way inner join of per-input file lists on timestamp.

    ``files`` is the long-form catalog (t, input_name, filename). Rows whose
    timestamp lacks any configured input are dropped (the reference warns and
    skips). ``time_bucket`` optionally truncates t first (e.g. ``"hour"``)
    for sources whose channels are staggered within a bucket; the earliest
    file per (bucket, input) wins, matching the reference's dict insertion
    of sorted listings.
    """
    t = F.date_trunc(time_bucket, F.col(time_col)) if time_bucket else F.col(time_col)
    base = files.where(F.col(input_col).isin(input_names)).select(
        t.alias("t"), F.col(input_col).alias("_input"), F.col(file_col).alias("_file")
    )
    pivoted = base.groupBy("t").agg(
        *[
            F.min(F.when(F.col("_input") == name, F.col("_file"))).alias(name)
            for name in input_names
        ]
    )
    complete = pivoted.na.drop(subset=input_names)
    return complete.select(
        make_scene_id(F.lit(source_name), F.col("t")).alias("scene_id"),
        "t",
        F.create_map(
            *[x for name in input_names for x in (F.lit(name), F.col(name))]
        ).alias("files"),
        *[F.col(n) for n in input_names],
    )
