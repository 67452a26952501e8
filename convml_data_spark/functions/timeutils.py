"""Timestamp literal/plumbing helpers.

PySpark converts naive ``datetime`` literals (and collected timestamps)
through the *Python process* timezone (``time.mktime`` /
``fromtimestamp``), NOT the Spark session timezone. Routing literals
through ``to_timestamp('<string>')`` keeps interpretation on the JVM side
under the pinned-UTC session TZ, so query semantics don't depend on the
driver process's TZ environment.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_lit(t: datetime | str) -> Column:
    """Timezone-robust timestamp literal (parsed JVM-side in session TZ)."""
    if isinstance(t, datetime):
        fmt = "%Y-%m-%d %H:%M:%S.%f" if t.microsecond else "%Y-%m-%d %H:%M:%S"
        t = t.strftime(fmt)
    return F.to_timestamp(F.lit(t))


def epoch_micros(col: Column | str, dtype: str = "timestamp") -> Column:
    """Epoch microseconds (bigint) for TIMESTAMP **or** TIMESTAMP_NTZ.

    ``unix_micros`` rejects TIMESTAMP_NTZ, and ``to_utc_timestamp`` silently
    re-interprets NTZ through the session timezone. The only timezone-free
    formulation for NTZ is a wall-clock difference from the NTZ epoch
    literal — it equals DuckDB's ``epoch_us`` on the same naive value under
    any session TZ. ``dtype`` must come from ``df.dtypes`` (Columns carry no
    type before analysis).
    """
    c = F.col(col) if isinstance(col, str) else col
    if dtype == "timestamp_ntz":
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", epoch, c)
    return F.unix_micros(c)
