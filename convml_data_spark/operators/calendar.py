"""Calendar-expansion source scans — SURVEY §2.1 S3/S5/S7.

Reference semantics:
- S3 (``era5``): generate hourly timestamps in [t_start, t_end) and format
  deterministic file paths (convml_data/sources/era5/pipeline.py:44-53,
  path template :17-41).
- S5 (``ceres_geo``): hourly expansion with a per-satellite phase offset
  (+30 min for goes16n) and exclusion of known-missing times
  (convml_data/sources/ceres_geo/query.py:11,30-53).

Spark design: the calendar is *generated on an executor* via
``explode(sequence(...))`` — no driver-side loop, no collect — and the
missing-times exclusion is a broadcast LEFT ANTI join (the missing list is
tiny plan-time metadata). Path formatting is ``date_format``/``concat`` —
pure JVM expressions.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutils import ts_lit


def calendar_scan(
    spark: SparkSession,
    t_start: datetime,
    t_end: datetime,
    step: str = "1 hour",
    offset: str | None = None,
    path_format: str | None = None,
    path_prefix: str = "",
    exclude_times: Sequence[datetime] | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """Expand a time calendar into a DataFrame(t TIMESTAMP [, path STRING]).

    ``path_format`` is a ``date_format`` pattern (e.g.
    ``yyyy/MM/dd/'file_'yyyyMMddHHmm'.nc'``) applied per timestamp.
    """
    end_expr = "to_timestamp('{}')".format(t_end.strftime("%Y-%m-%d %H:%M:%S"))
    start_expr = "to_timestamp('{}')".format(t_start.strftime("%Y-%m-%d %H:%M:%S"))
    seq = F.expr(f"sequence({start_expr}, {end_expr}, interval {step})")
    cal = spark.range(1).select(F.explode(seq).alias("t"))
    if not end_inclusive:
        cal = cal.where(F.col("t") < ts_lit(t_end))
    if offset:
        cal = cal.select((F.col("t") + F.expr(f"interval {offset}")).alias("t"))
    if exclude_times:
        # string-typed source + JVM-side parse: immune to driver-process TZ
        missing = spark.createDataFrame(
            [(t.strftime("%Y-%m-%d %H:%M:%S"),) for t in exclude_times], "ts string"
        ).select(F.to_timestamp("ts").alias("t"))
        cal = cal.join(F.broadcast(missing), on="t", how="left_anti")
    if path_format is not None:
        cal = cal.withColumn(
            "path", F.concat(F.lit(path_prefix), F.date_format("t", path_format))
        )
    return cal
