"""Star-schema DWH build — the T-SQL DDL in ``DWH/SQL queries.docx``
(Dim_DateTime, Dim_SolarStation, Dim_WindStation, Dim_WeatherSolar,
Dim_WeatherWind, Fact_Solar, Fact_Wind) re-expressed as DataFrame ETL:

- dims = distinct attribute tuples + ``row_number()`` surrogate keys
  (the DDL's IDENTITY columns);
- facts = processed rows joined back to dims on natural keys to resolve
  surrogate keys — FK integrity holds by construction.

Scale notes: surrogate keys via ``row_number`` over a global window are
a single-partition bottleneck, so they are reserved for the genuinely
tiny dims (stations, distinct weather tuples). Dim_DateTime is NOT tiny
— one row per distinct timestamp is hundreds of millions of rows at
100 TB — so its key is derived deterministically from the timestamp
itself (``unix_micros``: unique at timestamp grain, embarrassingly
parallel, and stable across rebuilds, which row_number is not). Facts
keep their natural grain and get ``monotonically_increasing_id``
(partition-local, no coordination) for the fact_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _surrogate(df: DataFrame, key_name: str, order_cols: list[str]) -> DataFrame:
    w = Window.partitionBy().orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
    return df.withColumn(key_name, F.row_number().over(w))


def build_datetime_dim(processed: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Dim_DateTime: one row per distinct timestamp with calendar
    attributes (docx §Dim_DateTime: year/quarter/month/day/hour/
    day_of_week/time_of_day)."""
    base = (
        processed.select(F.col(ts_col).alias("timestamp"), "local_timestamp")
        .dropDuplicates(["timestamp"])
        .withColumn("year", F.year("local_timestamp"))
        .withColumn("quarter", F.quarter("local_timestamp"))
        .withColumn("month", F.month("local_timestamp"))
        .withColumn("day", F.dayofmonth("local_timestamp"))
        .withColumn("hour", F.hour("local_timestamp"))
        .withColumn("day_of_week", F.date_format("local_timestamp", "EEEE"))
        .withColumn(
            "time_of_day",
            F.when((F.hour("local_timestamp") >= 6) & (F.hour("local_timestamp") < 18), "Day").otherwise("Night"),
        )
    )
    # Deterministic key from the timestamp itself — no global window, no
    # single-partition Exchange, stable across incremental rebuilds.
    return base.withColumn("datetime_key", F.unix_micros(F.col("timestamp")))


def build_station_dim(station_df: DataFrame) -> DataFrame:
    """Dim_SolarStation / Dim_WindStation from the registry dimension."""
    return _surrogate(station_df, "station_key", ["station_id"])


def build_weather_dim(processed: DataFrame, weather_cols: list[str]) -> DataFrame:
    """Dim_WeatherSolar / Dim_WeatherWind: distinct weather tuples."""
    base = processed.select(*weather_cols).dropDuplicates(weather_cols)
    return _surrogate(base, "weather_key", weather_cols)


def build_fact(processed: DataFrame, datetime_dim: DataFrame,
               station_dim: DataFrame, weather_dim: DataFrame,
               weather_cols: list[str], measure_cols: list[str]) -> DataFrame:
    """Fact_Solar / Fact_Wind: resolve natural keys → surrogate keys via
    joins (station broadcast; weather/datetime shuffle on their grain),
    keep measures."""
    f = processed.join(
        datetime_dim.select("timestamp", "datetime_key"), "timestamp"
    )
    f = f.join(
        F.broadcast(station_dim.select("station_id", "station_key")), "station_id"
    )
    f = f.join(weather_dim.select(*weather_cols, "weather_key"), weather_cols)
    return f.select(
        F.monotonically_increasing_id().alias("fact_id"),
        "station_key", "datetime_key", "weather_key", *measure_cols,
    )


SOLAR_WEATHER_COLS = [
    "temperature_C", "panel_temperature_C", "solar_irradiance_Wm2", "effective_efficiency",
]
SOLAR_MEASURES = ["power_kW", "energy_kWh_10min"]

WIND_WEATHER_COLS = [
    "wind_speed_mps", "wind_dir_deg", "air_temperature_C", "air_pressure_hPa",
    "humidity_percent", "air_density_kgm3", "wind_speed_hub_mps",
]
WIND_MEASURES = ["turbine_power_kW", "farm_power_kW", "farm_energy_MWh_10min", "wind_power_density"]


def build_solar_star(processed: DataFrame, station_dim: DataFrame) -> dict[str, DataFrame]:
    dt = build_datetime_dim(processed)
    st = build_station_dim(station_dim)
    wx = build_weather_dim(processed, SOLAR_WEATHER_COLS)
    fact = build_fact(processed, dt, st, wx, SOLAR_WEATHER_COLS, SOLAR_MEASURES)
    return {"Dim_DateTime": dt, "Dim_SolarStation": st, "Dim_WeatherSolar": wx, "Fact_Solar": fact}


def build_wind_star(processed: DataFrame, station_dim: DataFrame) -> dict[str, DataFrame]:
    dt = build_datetime_dim(processed)
    st = build_station_dim(station_dim)
    wx = build_weather_dim(processed, WIND_WEATHER_COLS)
    fact = build_fact(processed, dt, st, wx, WIND_WEATHER_COLS, WIND_MEASURES)
    return {"Dim_DateTime": dt, "Dim_WindStation": st, "Dim_WeatherWind": wx, "Fact_Wind": fact}


def save_star(tables: dict[str, DataFrame], base_path: str) -> None:
    """S14 — persist as parquet tables (saveAsTable equivalent without a
    metastore dependency)."""
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{base_path}/{name}")
