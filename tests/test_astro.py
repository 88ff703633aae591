"""F26 sunrise/sunset daytime dimension (functions/astro.py) —
semantics pinned to the reference's astral usage
(Solar_Generation.py:110-124): daytime = sunrise <= ts <= sunset,
night rows zeroed."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from real_time_iot_data_pipeline_project_spark.functions import astro
from real_time_iot_data_pipeline_project_spark.stations import solar_station_dim


def _dim_for(spark, dates):
    d = spark.createDataFrame([(x,) for x in dates], "date date")
    return astro.daytime_dim(d, solar_station_dim(spark))


def test_daylight_duration_sanity(spark):
    """At Benban (lat 24.456): summer day ~13.5 h, winter ~10.5 h —
    the closed-form must land within ±30 min of almanac values."""
    dim = _dim_for(
        spark, [datetime.date(2024, 6, 21), datetime.date(2024, 12, 21)]
    ).filter(F.col("station_id") == "BSPP")
    rows = {r["date"].month: r for r in dim.collect()}
    summer = rows[6]["sunset_h"] - rows[6]["sunrise_h"]
    winter = rows[12]["sunset_h"] - rows[12]["sunrise_h"]
    assert 13.0 < summer < 14.2, summer
    assert 10.0 < winter < 11.0, winter
    assert summer > winter


def test_sunrise_in_utc_window(spark):
    """Egypt is ~UTC+2: local ~6am sunrise ≈ 3-5h UTC; solar noon
    ≈ 9.5-10h UTC (12 - lon/15 with lon≈32.7)."""
    dim = _dim_for(spark, [datetime.date(2024, 3, 20)])
    for r in dim.collect():
        assert 3.0 < r["sunrise_h"] < 5.5, r
        assert 15.0 < r["sunset_h"] < 18.5, r


def test_daytime_flag_noon_true_midnight_false(spark):
    facts = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 6, 21, 10, 0, 0), "BSPP"),   # UTC ~ solar noon
            (2, datetime.datetime(2024, 6, 21, 0, 30, 0), "BSPP"),   # deep night
            (3, datetime.datetime(2024, 6, 21, 23, 30, 0), "ZFSPP"),  # late night
        ],
        "event_id long, ts timestamp, station_id string",
    )
    dates = facts.select(F.to_date("ts").alias("date")).distinct()
    dim = astro.daytime_dim(dates, solar_station_dim(spark))
    out = {
        r["event_id"]: r["is_daytime"]
        for r in astro.with_daytime_flag(facts, dim).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_dim_is_broadcast_sized_and_joined_broadcast(spark):
    """The scale contract: dim = |stations| x |dates| rows and the fact
    join is a BroadcastHashJoin (no shuffle of the fact side)."""
    dates = [datetime.date(2024, 1, 1) + datetime.timedelta(days=i) for i in range(365)]
    dim = _dim_for(spark, dates)
    assert dim.count() == 365 * 3
    facts = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.element_at(
            F.array(F.lit("BSPP"), F.lit("KOSPP"), F.lit("ZFSPP")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("station_id"),
        (F.to_timestamp(F.lit("2024-06-01 00:00:00"))
         + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
    )
    plan = astro.with_daytime_flag(facts, dim)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
