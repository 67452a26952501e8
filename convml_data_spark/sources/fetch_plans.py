"""Fetch-manifest planning — SURVEY §2.1 S2/S4/S6 (the compute half).

The reference's three download jobs each wrap a deterministic *planning*
computation around an opaque byte transfer:

- S2 ``GOES16Query``/``GOES16Fetch`` (sources/goes16/pipeline.py:21-89):
  query an AWS key listing for files whose embedded start time falls
  within ``dt_max`` of a query time, keyed by parsed start time.
- S4 ``ERA5Query``/``ERA5File`` (sources/era5/pipeline.py:17-95): expand an
  hourly calendar per source variable into JASMIN-layout file paths
  (``an_{level}/%Y/%m/%d/ecmwf-era5_oper_an_{level}_%Y%m%d%H%M.{var}.nc``).
- S6 ``ceres_geo.QueryForData``/``FetchFile``
  (sources/ceres_geo/pipeline.py:11-69, query.py:5-53, download.py:3-8):
  hourly calendar with a per-satellite phase offset, known-missing-time
  exclusion, and day-of-year URL templating.

This module implements those planning computations as DataFrame programs;
the byte transfer itself (S3 GET / SSH copy / HTTP GET) stays out of the
engine — the manifest a job here emits is exactly the work list a fetcher
would consume.

Scale design: manifests are generated executor-side via
``explode(sequence(...))`` (no driver loop); variable/satellite dimensions
are broadcast literal arrays; the GOES16 listing match is an equi-join on
an hour-bucket key (query times exploded over their ±dt_max bucket range,
broadcast) with a residual |Δt| filter — a BroadcastHashJoin even when the
key listing is billions of rows, never a nested-loop range join.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutils import ts_lit
from ..operators.calendar import calendar_scan

# era5/base.py:14-25 — the seven source variables; era5/pipeline.py:11 maps
# only "sst" to the surface ("sfc") path level, everything else to model
# level ("ml").
ERA5_SOURCE_VARIABLES = ("sst", "lnsp", "z", "u", "v", "t", "q")
ERA5_SFC_VARIABLES = ("sst",)
ERA5_ROOT = "/badc/ecmwf-era5/data/oper"

# ceres_geo/query.py:11 + pipeline.py:56-61
CERES_MISSING_TIMES = {"goes16n": [datetime(2018, 12, 18, 16, 30)]}
CERES_PLATFORM_IDS = {"goes16n": "GOE16_NH", "meteosat9n": "MET09_NH"}
CERES_PHASE_OFFSET = {"goes16n": "30 minutes", "meteosat9n": None}
CERES_VERSION = "V01.2"
# ceres_geo/download.py:3-8 (public NASA ASDC layout)
CERES_URL_ROOT = "https://asdc.larc.nasa.gov/data/CERES/GEO/Edition4"


def era5_fetch_manifest(
    spark: SparkSession,
    t_start: datetime,
    t_end: datetime,
    variables: Sequence[str] = ERA5_SOURCE_VARIABLES,
) -> DataFrame:
    """S4 planning: (var, t, filename, remote_path) per hour in
    [floor(t_start, hour), t_end) × variables.

    Mirrors ``get_available_files`` (era5/pipeline.py:44-53) and
    ``_make_filepath`` (:17-35); unknown variables raise like
    ``ERA5Query.run`` (:76-79).
    """
    unknown = [v for v in variables if v not in ERA5_SOURCE_VARIABLES]
    if unknown:
        raise ValueError(
            f"{unknown} are not among the available source variables "
            f"{list(ERA5_SOURCE_VARIABLES)}"
        )
    t0 = t_start.replace(minute=0, second=0, microsecond=0)
    cal = calendar_scan(spark, t0, t_end, step="1 hour")
    vars_arr = F.array(*[F.lit(v) for v in variables])
    out = cal.select("t", F.explode(vars_arr).alias("var"))
    level = F.when(
        F.col("var").isin(*ERA5_SFC_VARIABLES), F.lit("sfc")
    ).otherwise(F.lit("ml"))
    filename = F.concat(
        F.lit("ecmwf-era5_oper_an_"),
        level,
        F.lit("_"),
        F.date_format("t", "yyyyMMddHHmm"),
        F.lit("."),
        F.col("var"),
        F.lit(".nc"),
    )
    return out.select(
        "var",
        "t",
        filename.alias("filename"),
        F.concat(
            F.lit(ERA5_ROOT + "/an_"),
            level,
            F.lit("/"),
            F.date_format("t", "yyyy/MM/dd"),
            F.lit("/"),
            filename,
        ).alias("remote_path"),
    )


def ceres_fetch_manifest(
    spark: SparkSession,
    t_start: datetime,
    t_end: datetime,
    satellites: Sequence[str] = ("goes16n", "meteosat9n"),
) -> DataFrame:
    """S6 planning: (satellite, t, filename, platform_id, url) per available
    hourly slot.

    Mirrors ``get_available_files`` (ceres_geo/query.py:30-53): the grid is
    floor(t_start, hour) + per-satellite phase (goes16n half past, meteosat9n
    on the hour), times listed in MISSING_TIMES are excluded, local filename
    is ``{%Y%m%d%H%M}__{satellite}.nc`` (query.py:15-21), and the URL is the
    day-of-year template of download.py:3-8 via ``FetchFile.run``'s platform
    map (pipeline.py:52-66). The reference's back-shift branch when
    ``t_start - t0 > 30min`` (query.py:46-47) is unreachable-without-crash
    there (``timedelta(hour=1)`` is a TypeError), so it is deliberately not
    reproduced; grids here start at the first phased slot of t_start's hour.
    """
    parts = []
    for sat in satellites:
        if sat not in CERES_PLATFORM_IDS:
            raise NotImplementedError(sat)
        t0 = t_start.replace(minute=0, second=0, microsecond=0)
        cal = calendar_scan(
            spark,
            t0,
            t_end,
            step="1 hour",
            offset=CERES_PHASE_OFFSET[sat],
            exclude_times=CERES_MISSING_TIMES.get(sat),
        ).where(F.col("t") < ts_lit(t_end))
        parts.append(cal.select("t", F.lit(sat).alias("satellite")))
    grid = parts[0]
    for p in parts[1:]:
        grid = grid.unionByName(p)
    platform = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in CERES_PLATFORM_IDS.items() for x in kv]
        ),
        F.col("satellite"),
    )
    doy = F.lpad(F.dayofyear("t").cast("string"), 3, "0")
    plat_ver = F.concat(platform, F.lit("_" + CERES_VERSION))
    return grid.select(
        "satellite",
        "t",
        F.concat(
            F.date_format("t", "yyyyMMddHHmm"),
            F.lit("__"),
            F.col("satellite"),
            F.lit(".nc"),
        ).alias("filename"),
        platform.alias("platform_id"),
        F.concat(
            F.lit(CERES_URL_ROOT + "/"),
            plat_ver,
            F.lit("/"),
            F.date_format("t", "yyyy"),
            F.lit("/"),
            doy,
            F.lit("/CER_GEO_Ed4_"),
            plat_ver,
            F.lit("_"),
            F.date_format("t", "yyyy"),
            F.lit("."),
            doy,
            F.lit("."),
            F.date_format("t", "HHmm"),
            F.lit(".06K.nc"),
        ).alias("url"),
    )


def goes16_key_table(
    spark: SparkSession,
    t_start: datetime,
    t_end: datetime,
    channels: Sequence[int] = (1, 2, 3),
    step: str = "10 minutes",
) -> DataFrame:
    """Synthesize a GOES-16 ABI-L1b-RadF key listing (t, channel, key) on
    the public NOAA AWS bucket layout that ``satdata.Goes16AWS`` queries
    (goes16/pipeline.py:34-51): keys embed the scan start time as
    ``s{yyyy}{DDD}{HHmmss}0``.  Stands in for the S3 LIST call so the
    query-match semantics below are testable without network I/O.
    """
    cal = calendar_scan(spark, t_start, t_end, step=step)
    ch = F.explode(F.array(*[F.lit(int(c)) for c in channels])).alias("channel")
    out = cal.select("t", ch)
    doy = F.lpad(F.dayofyear("t").cast("string"), 3, "0")
    stamp = F.concat(F.date_format("t", "yyyy"), doy, F.date_format("t", "HHmmss"))
    cc = F.lpad(F.col("channel").cast("string"), 2, "0")
    return out.select(
        "t",
        "channel",
        F.concat(
            F.lit("ABI-L1b-RadF/"),
            F.date_format("t", "yyyy"),
            F.lit("/"),
            doy,
            F.lit("/"),
            F.date_format("t", "HH"),
            F.lit("/OR_ABI-L1b-RadF-M6C"),
            cc,
            F.lit("_G16_s"),
            stamp,
            F.lit("0_e"),
            stamp,
            F.lit("0_c"),
            stamp,
            F.lit("0.nc"),
        ).alias("key"),
    )


def goes16_parse_key(key: Column) -> Column:
    """start_time parsed from the ``_s{yyyyDDDHHmmss}`` stamp in an ABI key
    (``Goes16AWS.parse_key`` analog, goes16/pipeline.py:33-35) — pure
    string slicing + ``to_timestamp``, JVM-side.
    """
    stamp = F.regexp_extract(key, r"_s(\d{13})", 1)
    return F.to_timestamp(
        F.concat(F.substring(stamp, 1, 4), F.lit("-"), F.substring(stamp, 5, 3),
                 F.lit(" "), F.substring(stamp, 8, 6)),
        "yyyy-DDD HHmmss",
    )


def goes16_query_match(
    keys: DataFrame,
    query_times: Sequence[datetime],
    dt_max: str = "30 minutes",
    key_col: str = "key",
) -> DataFrame:
    """S2 ``GOES16Query`` semantics (goes16/pipeline.py:37-56): for each
    query time, the listing keys whose parsed start time lies within
    ``dt_max``, keyed by start time → (query_time, start_time, channel?, key).

    Plan shape: the tiny query-time side is EXPLODED over the hour buckets
    its ±dt_max window can touch and broadcast, so the match against an
    arbitrarily large listing is a BroadcastHashJoin on ``bucket`` with a
    residual |Δt| ≤ dt_max filter — no nested-loop range join, no shuffle
    of the listing.
    """
    spark = keys.sparkSession
    qt = spark.createDataFrame(
        [(t.strftime("%Y-%m-%d %H:%M:%S"),) for t in query_times], "ts string"
    ).select(F.to_timestamp("ts").alias("query_time"))
    iv = F.expr(f"interval {dt_max}")
    qx = qt.select(
        "query_time",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("query_time") - iv),
                F.date_trunc("hour", F.col("query_time") + iv),
                F.expr("interval 1 hour"),
            )
        ).alias("bucket"),
    )
    parsed = keys.withColumn("start_time", goes16_parse_key(F.col(key_col)))
    parsed = parsed.withColumn("bucket", F.date_trunc("hour", "start_time"))
    extra = [c for c in ("channel",) if c in keys.columns]
    return (
        parsed.join(F.broadcast(qx), on="bucket", how="inner")
        .where(
            (F.col("start_time") >= F.col("query_time") - iv)
            & (F.col("start_time") <= F.col("query_time") + iv)
        )
        .select("query_time", "start_time", *extra, key_col)
    )
