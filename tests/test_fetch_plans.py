"""S2/S4/S6 fetch-manifest planning (sources/fetch_plans.py).

Reference parity targets: era5/pipeline.py:17-95, ceres_geo/pipeline.py:11-69
+ query.py:5-53 + download.py:3-8, goes16/pipeline.py:21-89.
"""

import contextlib
import io
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from convml_data_spark.sources import fetch_plans as fp


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_era5_manifest_levels_and_paths(spark):
    m = fp.era5_fetch_manifest(
        spark, datetime(2020, 1, 30, 3, 15), datetime(2020, 1, 30, 5),
        variables=["sst", "q"],
    ).collect()
    # floor(03:15) = 03:00, hourly, exclusive end -> 03:00, 04:00 x 2 vars
    assert len(m) == 4
    by = {(r["var"], r["t"].hour): r for r in m}
    sst = by[("sst", 3)]
    assert sst["filename"] == "ecmwf-era5_oper_an_sfc_202001300300.sst.nc"
    assert sst["remote_path"].startswith("/badc/ecmwf-era5/data/oper/an_sfc/2020/01/30/")
    # pipeline.py:11 — only sst is a surface variable; q is model-level
    assert by[("q", 4)]["filename"] == "ecmwf-era5_oper_an_ml_202001300400.q.nc"


def test_era5_manifest_rejects_unknown_variable(spark):
    with pytest.raises(ValueError, match="available source variables"):
        fp.era5_fetch_manifest(
            spark, datetime(2020, 1, 1), datetime(2020, 1, 2), variables=["nope"]
        )


def test_ceres_manifest_phase_missing_and_url(spark):
    rows = fp.ceres_fetch_manifest(
        spark, datetime(2018, 12, 18, 15), datetime(2018, 12, 18, 18)
    ).collect()
    goes = sorted(r["t"] for r in rows if r["satellite"] == "goes16n")
    met = sorted(r["t"] for r in rows if r["satellite"] == "meteosat9n")
    # goes16n is half-past (query.py:38-39) and 16:30 is a known-missing
    # time (query.py:11) — excluded
    assert goes == [datetime(2018, 12, 18, 15, 30), datetime(2018, 12, 18, 17, 30)]
    assert met == [datetime(2018, 12, 18, h) for h in (15, 16, 17)]
    u = next(r for r in rows if r["satellite"] == "meteosat9n" and r["t"].hour == 15)
    assert u["platform_id"] == "MET09_NH"
    assert u["filename"] == "201812181500__meteosat9n.nc"
    # download.py URL template with 3-digit day-of-year (Dec 18 = 352)
    assert u["url"].endswith("MET09_NH_V01.2/2018/352/CER_GEO_Ed4_MET09_NH_V01.2_2018.352.1500.06K.nc")


def test_ceres_manifest_unknown_satellite(spark):
    with pytest.raises(NotImplementedError):
        fp.ceres_fetch_manifest(
            spark, datetime(2020, 1, 1), datetime(2020, 1, 2), satellites=["ceres9"]
        )


def test_goes16_roundtrip_and_match_window(spark):
    keys = fp.goes16_key_table(
        spark, datetime(2020, 2, 1, 0), datetime(2020, 2, 1, 3),
        channels=[1, 13], step="10 minutes",
    )
    # the parse inverts the key generation exactly
    bad = keys.where(
        fp.goes16_parse_key(F.col("key")) != F.col("t")
    ).count()
    assert bad == 0
    out = fp.goes16_query_match(
        keys, [datetime(2020, 2, 1, 1, 5)], dt_max="15 minutes"
    ).collect()
    ts = sorted({r["start_time"] for r in out})
    assert ts == [datetime(2020, 2, 1, 0, 50), datetime(2020, 2, 1, 1, 0),
                  datetime(2020, 2, 1, 1, 10), datetime(2020, 2, 1, 1, 20)]
    assert all(len([r for r in out if r["start_time"] == t]) == 2 for t in ts)


def test_goes16_match_is_broadcast_bucket_join(spark):
    """The listing side must NOT shuffle and must NOT nested-loop: the
    query-time side explodes over hour buckets and broadcasts, giving a
    BroadcastHashJoin with a residual range condition."""
    keys = fp.goes16_key_table(
        spark, datetime(2020, 2, 1, 0), datetime(2020, 2, 1, 6)
    )
    out = fp.goes16_query_match(keys, [datetime(2020, 2, 1, 2, 0)])
    plan = plan_text(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan, plan
