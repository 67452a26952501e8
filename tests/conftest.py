from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convml_data_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="convml-data-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip: bitwise-equal doubles only
    import decimal

    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    return str(v)


def rows_to_comparable(columns, rows):
    """Mirror the driver's compare: sort columns by name, stringify values,
    sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


def compare_spark_duckdb(sdf, con, sql):
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    sc, sr = rows_to_comparable(spark_cols, spark_rows)
    dc, dr = rows_to_comparable(duck_cols, duck_rows)
    assert sc == dc, f"column mismatch: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"row count mismatch: spark={len(sr)} duckdb={len(dr)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
    ][:5]
    assert not mismatches, f"value mismatches (first 5 of ...): {mismatches}"
