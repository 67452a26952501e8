"""interval_join (J10) — randomized brute-force equivalence + edge cases.

The operator must return exactly the pairs a naive O(n·m) BETWEEN scan
would, for arbitrary interval lengths (including zero-length and nested
intervals that span many buckets), any bucket width, and both timestamp
flavors."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from convml_data_spark.operators.joins import interval_join

BASE = datetime(2024, 1, 1)

point_offs = st.lists(st.integers(min_value=0, max_value=7200), min_size=1, max_size=15)
ivals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),
        st.integers(min_value=0, max_value=1800),  # length, 0 allowed
    ),
    min_size=1,
    max_size=10,
)


def _expected(p_offs, iv_specs):
    # sorted LIST, not set: duplicate pair emission (e.g. a right row
    # joining from two bucket replicas) must fail the comparison, since
    # downstream count(*) aggregates would double-count it
    out = []
    for pi, po in enumerate(p_offs):
        for ii, (s, length) in enumerate(iv_specs):
            if s <= po <= s + length:
                out.append((pi, ii))
    return sorted(out)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(p_offs=point_offs, iv_specs=ivals, width=st.integers(min_value=10, max_value=3600))
def test_interval_join_matches_brute_force(spark, p_offs, iv_specs, width):
    points = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=o)) for i, o in enumerate(p_offs)],
        "pid long, t timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (i, BASE + timedelta(seconds=s), BASE + timedelta(seconds=s + ln))
            for i, (s, ln) in enumerate(iv_specs)
        ],
        "iid long, t0 timestamp, t1 timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "t", "t0", "t1", bucket_width_seconds=width
        ).collect()
    )
    assert got == _expected(p_offs, iv_specs)


def test_interval_join_infers_width_and_accepts_ntz(spark):
    p_offs = [0, 100, 500, 999, 1000, 1001, 3600]
    iv_specs = [(0, 1000), (900, 50), (3600, 0)]
    points = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=o)) for i, o in enumerate(p_offs)],
        "pid long, t timestamp",
    ).withColumn("t", F.col("t").cast("timestamp_ntz"))
    intervals = spark.createDataFrame(
        [
            (i, BASE + timedelta(seconds=s), BASE + timedelta(seconds=s + ln))
            for i, (s, ln) in enumerate(iv_specs)
        ],
        "iid long, t0 timestamp, t1 timestamp",
    ).select(
        "iid",
        F.col("t0").cast("timestamp_ntz").alias("t0"),
        F.col("t1").cast("timestamp_ntz").alias("t1"),
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "t", "t0", "t1").collect()
    )
    assert got == _expected(p_offs, iv_specs)
