"""F26 — sunrise/sunset daytime test, Spark-first.

The reference computes ``sun['sunrise'] <= ts <= sun['sunset']`` per row
with the astral library (``Solar_Generation.py:110-113``,
``producer_solar.py:110-113``) and zeroes solar output at night
(``Solar_Generation.py:116-124``). Per SURVEY §4.2-2 we re-express this
as a precomputed **(station, date) → (sunrise, sunset) dimension table +
broadcast join** — codegen-friendly, no Python UDF, and at 100 TB the
dim is |stations| × |dates| rows (thousands), never a per-row Python
call over the fact table.

The solar math is the public-domain *sunrise equation* (NOAA / standard
almanac form) with the conventional 90.833° zenith (atmospheric
refraction + solar disc radius):

    B        = 2π (doy − 81) / 364
    EoT      = 9.87 sin 2B − 7.53 cos B − 1.5 sin B          [minutes]
    δ        = −23.45° · cos(2π (doy + 10) / 365)            [declination]
    noon_utc = 12 − lon/15 − EoT/60                          [hours]
    cos ω    = (cos 90.833° − sin φ sin δ) / (cos φ cos δ)
    sunrise  = noon_utc − degrees(ω)/15,  sunset = noon_utc + degrees(ω)/15

Accuracy vs astral is ±~2 minutes — the *daytime flag* (the reference's
only use) is insensitive to that at 5-s/10-min data cadence. cos ω is
clamped to [−1, 1]: polar night degenerates to sunrise = sunset = noon
(flag always false), polar day to a 24 h window centered on solar noon
(flag true except UTC-day edges when solar noon is far from 12:00 UTC —
out of scope for the reference's Egypt stations, documented here).

The formula is emitted ONCE as ANSI-SQL text that both Spark
(``F.expr``) and DuckDB parse — the cross-engine determinism trick from
the registry header (rule 2): identical expression tree, IEEE doubles on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZENITH_DEG = 90.833


def noon_omega_sql(lat: str, lon: str, doy: str) -> tuple[str, str]:
    """(solar_noon_utc_hours, half_day_width_degrees) as SQL expression
    strings over column/expression names ``lat``, ``lon``, ``doy`` —
    valid in both Spark SQL and DuckDB. sunrise = noon − ω/15,
    sunset = noon + ω/15."""
    b = f"(2.0 * pi() * (({doy}) - 81.0) / 364.0)"
    eot = f"(9.87 * sin(2.0 * {b}) - 7.53 * cos({b}) - 1.5 * sin({b}))"
    decl = f"(-23.45 * cos(2.0 * pi() * (({doy}) + 10.0) / 365.0))"
    noon = f"(12.0 - ({lon}) / 15.0 - {eot} / 60.0)"
    cos_w = (
        f"((cos(radians({ZENITH_DEG!r})) - sin(radians({lat})) * sin(radians({decl})))"
        f" / (cos(radians({lat})) * cos(radians({decl}))))"
    )
    omega_deg = f"degrees(acos(greatest(-1.0, least(1.0, {cos_w}))))"
    return noon, omega_deg


def sunrise_sunset_sql(lat: str, lon: str, doy: str) -> tuple[str, str]:
    """(sunrise_utc_hours, sunset_utc_hours) as fully-inlined SQL
    expression strings (the DuckDB-oracle form; Spark-side
    ``daytime_dim`` factors noon/ω into columns to halve codegen size —
    identical IEEE op sequence either way)."""
    noon, omega_deg = noon_omega_sql(lat, lon, doy)
    return (
        f"({noon} - {omega_deg} / 15.0)",
        f"({noon} + {omega_deg} / 15.0)",
    )


def date_spine(facts: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Dense [min_date, max_date] spine from the fact table via a
    map-side min/max aggregate — NOT ``select(to_date(ts)).distinct()``,
    which shuffles every distinct date of a 100 TB scan. Spine dates with
    no facts produce dim rows that simply never join (harmless)."""
    bounds = facts.agg(
        F.min(F.to_date(ts_col)).alias("d0"), F.max(F.to_date(ts_col)).alias("d1")
    )
    return bounds.select(F.explode(F.sequence("d0", "d1")).alias("date"))


def daytime_dim(dates: DataFrame, stations: DataFrame,
                date_col: str = "date") -> DataFrame:
    """Build the (station, date) → (sunrise_h, sunset_h) dimension.

    ``dates``: one column ``date_col`` of distinct dates (from the fact
    table or a spine). ``stations``: station_id/lat/lon. The result is
    |stations| × |dates| rows — broadcast-sized by construction even
    against decades of data.
    """
    noon, omega = noon_omega_sql("lat", "lon", "doy")
    return (
        dates.crossJoin(stations.select("station_id", "lat", "lon"))
        .withColumn("doy", F.dayofyear(F.col(date_col)).cast("double"))
        .withColumn("noon_h", F.expr(noon))
        .withColumn("omega_deg", F.expr(omega))
        .withColumn("sunrise_h", F.expr("noon_h - omega_deg / 15.0"))
        .withColumn("sunset_h", F.expr("noon_h + omega_deg / 15.0"))
        .drop("doy", "lat", "lon", "noon_h", "omega_deg")
    )


def hour_frac_utc(ts: str | F.Column) -> F.Column:
    """Hours since UTC midnight (second resolution — matches DuckDB
    ``epoch`` truncation so boundary comparisons agree cross-engine)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return (
        (F.unix_timestamp(col) - F.unix_timestamp(F.to_date(col).cast("timestamp")))
        / 3600.0
    )


def with_daytime_flag(facts: DataFrame, dim: DataFrame,
                      ts_col: str = "ts",
                      station_col: str = "station_id") -> DataFrame:
    """Broadcast-join facts to the daytime dim and add ``is_daytime``
    (the reference's ``sunrise <= ts <= sunset``, both ends inclusive)."""
    f = facts.withColumn("date", F.to_date(ts_col))
    out = f.join(F.broadcast(dim), [station_col, "date"])
    hf = hour_frac_utc(ts_col)
    return out.withColumn(
        "is_daytime", (hf >= F.col("sunrise_h")) & (hf <= F.col("sunset_h"))
    )
