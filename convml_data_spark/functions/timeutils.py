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
