"""Every queries() entry with an oracle_sql() twin must match DuckDB on the
same parquet tables — this mirrors the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, compare_spark_duckdb

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


# The slowest parity replays (>15 s each even at sf0.001 — composed
# pipelines, regrid scenes, CC/kmeans consumers) run as `nightly`: the
# driver's rotating CORRECTNESS window certifies the same keys at
# sf0.01 each round, and the round-end discipline replays ALL keys at
# sf0.01 + sf0.1 (verify skill). Deselected by default purely so the
# driver's pytest run finishes inside its budget (r18, VERIFY_r17
# timeout); run them with `pytest -m nightly`.
_NIGHTLY_PARITY = {
    "spec_curation_pipeline",
    "spec_regridded_bilinear",
    "spec_regridded_scenes",
    "spec_rag_pipeline",
    "dedup_semantic_kmeans",
    "dedup_semantic",
    "dedup_survivors",
    "dbscan_ladder",
    "dbscan_mutual_reach",
    "dbscan_merge_events",
    "emb_transform_dbscan",
    "bpe_encode_byte_ids",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.nightly) if n in _NIGHTLY_PARITY else n
        for n in sorted(ORACLES)
    ],
)
def test_oracle_parity(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    compare_spark_duckdb(sdf, ddb, ORACLES[name])


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


def test_exact_quantile_cte_matches_formula_on_mass_points(ddb):
    """Regression guard for the r14 tied-cut hazard: on a distribution
    whose 1/3 cut lands ON a mass point (five copies of 0.047059 + one
    outlier), DuckDB's quantile_cont emits 0.047059000000000004 while
    binning.exact_quantiles' formula emits exactly 0.047059 — any
    strict comparison against the cut then flips every row AT the mass
    point (18 docs at sf0.1 when langid_confident briefly used
    quantile_cont). The oracle helper _exact_quantile_cuts_cte must
    keep replaying the formula verbatim; this also asserts
    quantile_cont STILL diverges, so the helper is not 'simplified'
    back to it."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    vals = [0.047059] * 5 + [1.0]
    lit = ", ".join(f"(CAST({x!r} AS DOUBLE))" for x in vals)
    con.execute(f"CREATE VIEW vv AS SELECT x FROM (VALUES {lit}) t(x)")

    def formula(sorted_vals, q):
        n = len(sorted_vals)
        pos = (n - 1) * q
        lo = int(pos)
        hi = min(lo + 1, n - 1)
        f = pos - lo
        return (
            sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * f
            if f
            else sorted_vals[lo]
        )

    cte = entrymod._exact_quantile_cuts_cte("vv", "x", [1 / 3, 2 / 3], ["c1", "c2"])
    got = con.execute(f"WITH {cte} SELECT c1, c2 FROM cuts").fetchone()
    sv = sorted(vals)
    assert repr(got[0]) == repr(formula(sv, 1 / 3))
    assert repr(got[1]) == repr(formula(sv, 2 / 3))
    qc = con.execute("SELECT quantile_cont(x, 1.0/3.0) FROM vv").fetchone()[0]
    assert repr(qc) != repr(formula(sv, 1 / 3)), (
        "quantile_cont no longer diverges on this distribution — the "
        "helper may be simplifiable, re-evaluate before doing so"
    )
