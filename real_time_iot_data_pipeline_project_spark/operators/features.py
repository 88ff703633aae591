"""Feature engineering (entry point A stage 4: ``Solar_Processing.py:42-57``,
``Wind_Processing.py:46-65``, docx §solar:create_col_spark /
§wind derived columns).

All derivations are narrow ``withColumn`` projections — zero shuffles,
fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import physics, timeutils
from ..stations import solar_capacity_map_col


def add_time_features(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """local_timestamp / hour / day_of_week / time_of_day (F3-F5, F8)."""
    return (
        df.withColumn("local_timestamp", timeutils.to_local(ts_col))
        .withColumn("hour", timeutils.hour_of("local_timestamp"))
        .withColumn("day_of_week", timeutils.day_name("local_timestamp"))
        .withColumn("time_of_day", timeutils.time_of_day("hour"))
    )


def add_validity_flag(df: DataFrame, check_cols: list[str]) -> DataFrame:
    """P7 — ``is_valid`` = all key measures non-null (Wind_Processing.py:63)."""
    pred = F.lit(True)
    for c in check_cols:
        if c in df.columns:
            pred = pred & F.col(c).isNotNull()
    return df.withColumn("is_valid", pred)


def featurize_solar(df: DataFrame) -> DataFrame:
    """Solar derived columns: time features, capacity_utilization_%
    (docx §solar:create_col_spark via create_map — F22/J1), is_valid."""
    df = add_time_features(df)
    df = df.withColumn(
        "capacity_utilization_pct",
        physics.capacity_utilization_pct(
            "power_kW", solar_capacity_map_col()[F.col("station_id")]
        ),
    )
    return add_validity_flag(df, ["solar_irradiance_Wm2", "power_kW", "temperature_C"])


def featurize_wind(df: DataFrame) -> DataFrame:
    """Wind derived columns: time features, wind_power_density (F19),
    is_valid (Wind_Processing.py:46-65)."""
    df = add_time_features(df)
    df = df.withColumn(
        "wind_power_density",
        physics.wind_power_density("air_density_kgm3", "wind_speed_mps"),
    )
    return add_validity_flag(df, ["wind_speed_mps", "farm_power_kW", "air_temperature_C"])


def process_solar(df: DataFrame, *, deterministic_dedup: bool = False) -> DataFrame:
    """Raw → processed, the complete entry-point-A pipeline."""
    from . import cleaning

    return featurize_solar(cleaning.clean_solar(df, deterministic_dedup=deterministic_dedup))


def process_wind(df: DataFrame, *, deterministic_dedup: bool = False) -> DataFrame:
    from . import cleaning

    return featurize_wind(cleaning.clean_wind(df, deterministic_dedup=deterministic_dedup))
