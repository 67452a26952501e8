"""Randomized property test: asof_join must match a brute-force nearest
(earlier-on-tie, tolerance-bounded) reference on arbitrary inputs —
the reference's argmin semantics (aux_sources.py:216-218) including exact
ties and tolerance edges, independent of partitioning."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from convml_data_spark.operators import asof

BASE = datetime(2024, 1, 1)


def brute_force(left_ts, right_rows, tol_s):
    """right_rows: [(rid, t)] sorted input not required. Earlier wins ties."""
    out = {}
    for lt in left_ts:
        best = None
        for rid, rt in right_rows:
            d = abs((lt - rt).total_seconds())
            if d > tol_s:
                continue
            # smaller |dt| wins; exact tie -> EARLIER right time
            if best is None or d < best[0] or (d == best[0] and rt < best[2]):
                best = (d, rid, rt)
        if best is not None:
            out[lt] = best[1]
    return out


# offsets in whole seconds keep |dt| comparisons exact (no float fuzz);
# duplicates allowed on both sides to exercise tie paths
offsets = st.lists(st.integers(min_value=0, max_value=3600), min_size=1, max_size=12)


def test_asof_right_id_payload_path_equivalent(spark):
    """The slim-window + payload-join variant (right_id_col) must return
    exactly what the struct-carrying default returns, wide columns included."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=37 * i)) for i in range(50)], "lid long, t_left timestamp"
    )
    right = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=53 * i), f"payload_{i}" * 10) for i in range(40)],
        "rid long, t_right timestamp, wide string",
    )
    kwargs = dict(tolerance_seconds=60.0, right_prefix="m_", dt_col="dt")
    a = asof.asof_join(left, right, "t_left", "t_right", **kwargs)
    b = asof.asof_join(left, right, "t_left", "t_right", right_id_col="rid", **kwargs)
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    ra = sorted(tuple(r[c] for c in cols) for r in a.collect())
    rb = sorted(tuple(r[c] for c in cols) for r in b.collect())
    assert ra == rb


def test_asof_keep_unmatched_and_partition_by(spark):
    """keep_unmatched retains every left row (nulls for no-match); with
    partition_by, matching never crosses the key."""
    left = spark.createDataFrame(
        [("a", BASE), ("a", BASE + timedelta(hours=10)), ("b", BASE)],
        "k string, t_left timestamp",
    )
    right = spark.createDataFrame(
        [("a", 1, BASE + timedelta(minutes=5)), ("b", 2, BASE + timedelta(minutes=30))],
        "k string, rid long, t_right timestamp",
    )
    out = asof.asof_join(
        left, right, "t_left", "t_right",
        tolerance_seconds=3600.0, partition_by=["k"],
        right_prefix="m_", keep_unmatched=True,
    )
    rows = {(r["k"], str(r["t_left"])): r["m_rid"] for r in out.collect()}
    assert len(rows) == 3
    assert rows[("a", str(BASE))] == 1
    assert rows[("a", str(BASE + timedelta(hours=10)))] is None  # outside tolerance
    assert rows[("b", str(BASE))] == 2  # never matches key 'a' rows


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(left_off=offsets, right_off=offsets, tol=st.integers(min_value=1, max_value=900))
def test_asof_matches_brute_force(spark, left_off, right_off, tol):
    left_ts = sorted({BASE + timedelta(seconds=o) for o in left_off})
    right = [(i, BASE + timedelta(seconds=o)) for i, o in enumerate(sorted(set(right_off)))]

    ldf = spark.createDataFrame([(t,) for t in left_ts], "t_left timestamp")
    rdf = spark.createDataFrame(right, "rid long, t_right timestamp")
    got_rows = asof.asof_join(
        ldf.repartition(3), rdf.repartition(2), "t_left", "t_right",
        tolerance_seconds=float(tol), right_prefix="m_",
    ).collect()
    got = {r["t_left"]: r["m_rid"] for r in got_rows}
    want = brute_force(left_ts, right, float(tol))
    assert got == want


def test_asof_no_tolerance_exact_at_fractional_tolerance_edge(spark):
    """Integer-µs bucket math: a right exactly AT a fractional tolerance
    (0.1 s -> tol_us = 100000.00000000001 in doubles) must still match —
    the old float floor((t±tol)/w) could misbucket the boundary row."""
    lts = [BASE + timedelta(seconds=i) for i in range(20)]
    ldf = spark.createDataFrame([(t,) for t in lts], "t_left timestamp")
    rdf = spark.createDataFrame(
        [(i, t + timedelta(microseconds=100_000)) for i, t in enumerate(lts)],
        "rid long, t_right timestamp",
    )
    out = asof.asof_join(
        ldf, rdf, "t_left", "t_right", tolerance_seconds=0.1,
        right_prefix="m_", dt_col="dt",
    ).collect()
    assert len(out) == 20
    assert all(abs(r["dt"] - 0.1) < 1e-12 for r in out)
    # and strictly-over-tolerance is dropped
    rdf2 = spark.createDataFrame(
        [(i, t + timedelta(microseconds=100_001)) for i, t in enumerate(lts)],
        "rid long, t_right timestamp",
    )
    assert (
        asof.asof_join(
            ldf, rdf2, "t_left", "t_right", tolerance_seconds=0.1, right_prefix="m_"
        ).count()
        == 0
    )


def test_asof_skew_guard_exact_across_giant_hole(spark):
    """Keyless no-tolerance as-of with a hole ~1000x the typical right gap:
    the geometric pass ladder must (a) actually engage (max gap > 4 x p99
    gap so radius starts at the p99 gap, keeping the dense region split
    across many buckets instead of a handful of hole-sized ones) and
    (b) stay EXACT for lefts in the dense regions, inside the hole (both
    halves), exactly mid-hole (tie -> earlier right), and out of range."""
    dense_a = [BASE + timedelta(seconds=10 * i) for i in range(200)]
    hole_end = dense_a[-1] + timedelta(seconds=10_000)  # 1000x the 10 s gap
    dense_b = [hole_end + timedelta(seconds=10 * i) for i in range(200)]
    right_rows = [(i, t) for i, t in enumerate(dense_a + dense_b)]
    left_ts = (
        [BASE + timedelta(seconds=7 * i) for i in range(150)]  # dense region
        + [dense_a[-1] + timedelta(seconds=s) for s in (1, 999, 4999, 5000, 5001, 9999)]
        + [BASE - timedelta(seconds=500), dense_b[-1] + timedelta(seconds=500)]
    )
    ldf = spark.createDataFrame([(t,) for t in left_ts], "t_left timestamp")
    rdf = spark.createDataFrame(right_rows, "rid long, t_right timestamp")

    stats = asof._right_gap_stats(rdf, "t_right")
    assert stats is not None
    mn, mx, gap, p99 = stats
    assert gap == 10_000 * 1_000_000 and gap > 4 * p99  # ladder engages
    # pass-1 bucket width 2*p99 keeps the dense span in MANY buckets
    assert (mx - mn) // (2 * p99) > 50

    got_rows = asof.asof_join(
        ldf.repartition(5), rdf.repartition(3), "t_left", "t_right",
        right_prefix="m_", dt_col="dt",
    ).collect()
    got = {r["t_left"]: r["m_rid"] for r in got_rows}
    want = brute_force(left_ts, right_rows, float("inf"))
    assert got == want
    assert len(got) == len(left_ts)  # no tolerance: every left matches
