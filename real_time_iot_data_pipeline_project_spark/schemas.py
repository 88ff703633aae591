"""Explicit schemas for the telemetry streams and derived tables.

Reproduces the reference's own declared Spark schemas
(``Azure/transformation in databricks in azure.docx`` §solar:schema,
§wind:schema) and CSV field orders (``Solar_Generation.py:157-162``,
``Wind_Genration.py:62-68``). The wind schema in the reference notebook
omits ``farm_energy_MWh_10min`` — a real schema-drift case; we carry the
full 14-field producer schema and tolerate the missing column on read
(see operators.schema_drift).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- solar reading (producer emit: Solar_Generation.py:94-103,144-151) ---
SOLAR_RAW_SCHEMA = T.StructType(
    [
        # transit form: ISO-8601 string, tz-aware (+00:00); parsed by
        # operators.cleaning.normalize_timestamp → TimestampType
        T.StructField("timestamp", T.StringType()),
        T.StructField("station_id", T.StringType()),
        T.StructField("data_source", T.StringType()),  # {API, PREDICTION}
        T.StructField("temperature_C", T.DoubleType()),
        T.StructField("panel_temperature_C", T.DoubleType()),
        T.StructField("solar_irradiance_Wm2", T.DoubleType()),
        T.StructField("effective_efficiency", T.DoubleType()),
        T.StructField("power_kW", T.DoubleType()),
        T.StructField("energy_kWh_10min", T.DoubleType()),
    ]
)

# Azure producer variant adds weather context (producer_solar.py:75-81)
SOLAR_RAW_AZURE_SCHEMA = T.StructType(
    list(SOLAR_RAW_SCHEMA.fields)
    + [
        T.StructField("clouds_%", T.DoubleType()),
        T.StructField("pressure_hPa", T.DoubleType()),
        T.StructField("humidity_%", T.DoubleType()),
    ]
)

# --- wind reading (producer emit: Wind_Genration.py:138-150; 14 fields) ---
WIND_RAW_SCHEMA = T.StructType(
    [
        # transit form: naive ISO-8601, some rows with a literal 'UTC'
        # suffix (Wind_Processing.py:23)
        T.StructField("timestamp", T.StringType()),
        T.StructField("station_id", T.StringType()),
        T.StructField("data_source", T.StringType()),
        T.StructField("wind_speed_mps", T.DoubleType()),
        T.StructField("wind_dir_deg", T.DoubleType()),
        T.StructField("air_temperature_C", T.DoubleType()),
        T.StructField("air_pressure_hPa", T.DoubleType()),
        T.StructField("humidity_percent", T.DoubleType()),
        T.StructField("air_density_kgm3", T.DoubleType()),
        T.StructField("wind_speed_hub_mps", T.DoubleType()),
        T.StructField("turbine_power_kW", T.DoubleType()),
        T.StructField("farm_power_kW", T.DoubleType()),
        T.StructField("farm_energy_kWh_10min", T.DoubleType()),
        # absent from the docx §wind:schema StructType — schema drift case
        T.StructField("farm_energy_MWh_10min", T.DoubleType()),
    ]
)

# Required columns asserted by validation (Solar_Processing.py:15-18,
# Wind_Processing.py:17-20, docx §solar:validation_spark)
SOLAR_REQUIRED_COLUMNS = [
    "timestamp",
    "station_id",
    "solar_irradiance_Wm2",
    "power_kW",
]
WIND_REQUIRED_COLUMNS = [
    "timestamp",
    "station_id",
    "wind_speed_mps",
    "farm_power_kW",
]

# Range predicates — canonical bounds per the reference's own Spark
# notebook (docx §solar:validation_spark, §wind:clean_df). The pandas
# batch variant uses tighter solar bounds (irr ≤ 1200, power ≤ 2e6,
# Solar_Processing.py:23-26); SURVEY.md §7 standardizes on the Spark
# notebook's bounds.
SOLAR_RANGE_BOUNDS: dict[str, tuple[float, float]] = {
    "power_kW": (0.0, 2e7),
    "solar_irradiance_Wm2": (0.0, 1500.0),
    "effective_efficiency": (0.0, 0.25),
}
WIND_RANGE_BOUNDS: dict[str, tuple[float, float]] = {
    "wind_speed_mps": (0.0, 60.0),
    "air_temperature_C": (-50.0, 60.0),
    "farm_power_kW": (0.0, 2e7),
}

# Null-fill defaults (Solar_Processing.py:29-32, Wind_Processing.py:37-38,
# docx §wind:clean_df fillna)
SOLAR_FILL_DEFAULTS = {"temperature_C": 25.0, "humidity_%": 50.0}
WIND_FILL_DEFAULTS = {"air_pressure_hPa": 1013.25, "humidity_percent": 50.0}

# Dedup key (Solar_Processing.py:34; docx §solar:validation_spark)
DEDUP_KEYS = ["station_id", "timestamp"]
