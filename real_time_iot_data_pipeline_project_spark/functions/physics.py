"""Renewable-energy physics as pure Column expressions (SURVEY.md §2.9
F11–F25).

Every formula the reference computes row-at-a-time in Python
(``Solar_Generation.py:116-151``, ``Wind_Genration.py:103-150``) is
re-expressed as a Catalyst Column expression so whole-stage codegen
applies — this is the difference between ~1 M rows/s (Python UDF) and
~100 M rows/s (codegen'd arithmetic) per core at scale.

All functions accept Column-or-name and return an unaliased Column.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# --- solar (Solar_Generation.py) ---------------------------------------

def irradiance_from_clouds(clouds_pct: ColumnOrName, floor: float = 50.0) -> Column:
    """F11 — ``max(1000·(1−clouds/100), floor)`` (Solar_Generation.py:91-92)."""
    return F.greatest(F.lit(floor), F.lit(1000.0) * (F.lit(1.0) - _c(clouds_pct) / 100.0))


def effective_efficiency(panel_temp_c: ColumnOrName, *, base: float = 0.18,
                         temp_coeff: float = 0.0045, floor: float = 0.05) -> Column:
    """F12 — temperature-derated efficiency, floored (Solar_Generation.py:130-134)."""
    eff = F.lit(base) * (F.lit(1.0) - F.lit(temp_coeff) * (_c(panel_temp_c) - 25.0))
    return F.greatest(F.lit(floor), eff)


def solar_power_kw(irradiance_wm2: ColumnOrName, efficiency: ColumnOrName,
                   num_panels: ColumnOrName, *, panel_area_m2: float = 1.7,
                   system_loss: float = 0.85) -> Column:
    """F13 — ``irr·area·eff·loss·panels/1000`` kW (Solar_Generation.py:139-141)."""
    return (_c(irradiance_wm2) * panel_area_m2 * _c(efficiency)
            * system_loss * _c(num_panels) / 1000.0)


def energy_kwh(power_kw: ColumnOrName, interval_minutes: float = 10.0) -> Column:
    """F14 — energy integrated over the emit interval (Solar_Generation.py:142)."""
    return _c(power_kw) * (interval_minutes / 60.0)


def panel_temperature(ambient_c: ColumnOrName, offset: ColumnOrName | float = 5.5) -> Column:
    """Panel runs hotter than ambient (Solar_Generation.py:137 adds U(3,8);
    deterministic variant takes the offset as a column or constant)."""
    off = _c(offset) if isinstance(offset, (Column, str)) else F.lit(offset)
    return _c(ambient_c) + off


def capacity_utilization_pct(power_kw: ColumnOrName, capacity_kw: ColumnOrName) -> Column:
    """F22 — ``power/capacity·100`` (docx §solar:create_col_spark)."""
    return _c(power_kw) / _c(capacity_kw) * 100.0


# --- wind (Wind_Genration.py) -------------------------------------------

HUB_HEIGHT_M = 100.0
REF_HEIGHT_M = 10.0
SHEAR_EXPONENT = 0.14
ROTOR_DIAMETER_M = 82.0
SWEPT_AREA_M2 = math.pi * (ROTOR_DIAMETER_M / 2.0) ** 2
POWER_COEFF = 0.4
RATED_KW = 2500.0
CUT_IN_MPS = 3.0
RATED_MPS = 12.0
CUT_OUT_MPS = 25.0
GAS_CONSTANT = 287.05


def hub_height_wind(wind_speed_mps: ColumnOrName) -> Column:
    """F15 — power-law shear ``v·(100/10)^0.14`` (Wind_Genration.py:106)."""
    return _c(wind_speed_mps) * F.lit((HUB_HEIGHT_M / REF_HEIGHT_M) ** SHEAR_EXPONENT)


def air_density(pressure_hpa: ColumnOrName, temp_c: ColumnOrName) -> Column:
    """F16 — ideal gas ``p·100/(287.05·(T+273.15))`` (Wind_Genration.py:108-112)."""
    return _c(pressure_hpa) * 100.0 / (F.lit(GAS_CONSTANT) * (_c(temp_c) + 273.15))


def turbine_power_kw(air_density_kgm3: ColumnOrName, hub_speed_mps: ColumnOrName) -> Column:
    """F9+F17 — piecewise power curve with cut-in/rated/cut-out
    (Wind_Genration.py:114-131): 0 below cut-in or above cut-out, capped
    at rated power, else ``0.5·ρ·A·v³·Cp/1000``."""
    v = _c(hub_speed_mps)
    theoretical = (F.lit(0.5) * _c(air_density_kgm3) * F.lit(SWEPT_AREA_M2)
                   * F.pow(v, 3) * F.lit(POWER_COEFF) / 1000.0)
    return (
        F.when((v < CUT_IN_MPS) | (v > CUT_OUT_MPS), F.lit(0.0))
        .otherwise(F.least(F.lit(RATED_KW), theoretical))
    )


def farm_power_kw(turbine_kw: ColumnOrName, num_turbines: ColumnOrName) -> Column:
    """F18 — farm scale-up (Wind_Genration.py:134)."""
    return _c(turbine_kw) * _c(num_turbines)


def wind_power_density(air_density_kgm3: ColumnOrName, wind_speed_mps: ColumnOrName) -> Column:
    """F19 — ``0.5·ρ·v³`` (Wind_Processing.py:61, docx §wind)."""
    return F.lit(0.5) * _c(air_density_kgm3) * F.pow(_c(wind_speed_mps), 3)


def power_coefficient(power: ColumnOrName, wind_speed_mps: ColumnOrName,
                      eps: float = 0.001) -> Column:
    """F20 — ``P/(v³+ε)`` (Wind_Dashboard.py:125-126)."""
    return _c(power) / (F.pow(_c(wind_speed_mps), 3) + eps)


def electrical_power_kw(voltage: ColumnOrName, current: ColumnOrName) -> Column:
    """F21 — ``V·I/1000`` (Solar_Dashboard.py:117-119)."""
    return _c(voltage) * _c(current) / 1000.0


def wind_class(wind_speed_mps: ColumnOrName) -> Column:
    """F10 — ordered speed bins (pd.cut [0,3,7,12,20,100] →
    Calm/Light/Moderate/Strong/Storm, Wind_Dashboard.py:129-131).
    pd.cut is right-inclusive: (0,3] Calm, (3,7] Light, …"""
    v = _c(wind_speed_mps)
    return (
        F.when(v <= 3, "Calm")
        .when(v <= 7, "Light")
        .when(v <= 12, "Moderate")
        .when(v <= 20, "Strong")
        .otherwise("Storm")
    )
