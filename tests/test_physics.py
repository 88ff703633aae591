"""Physics invariants (SURVEY.md §5.2-3, property-based)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from real_time_iot_data_pipeline_project_spark.functions import physics

# column-expression formulas evaluated via plain python on scalars by
# re-deriving the same arithmetic (the Spark exprs are tested end-to-end
# in oracle parity; here we pin the math itself)


def py_turbine_power(rho: float, v: float) -> float:
    if v < physics.CUT_IN_MPS or v > physics.CUT_OUT_MPS:
        return 0.0
    return min(physics.RATED_KW,
               0.5 * rho * physics.SWEPT_AREA_M2 * v ** 3 * physics.POWER_COEFF / 1000.0)


@given(st.floats(0, 1.5), st.floats(0, 80))
@settings(max_examples=200, deadline=None)
def test_turbine_power_bounds(rho, v):
    p = py_turbine_power(rho, v)
    assert 0.0 <= p <= physics.RATED_KW


@given(st.floats(0, 2.99))
@settings(max_examples=50, deadline=None)
def test_below_cut_in_zero(v):
    assert py_turbine_power(1.2, v) == 0.0


@given(st.floats(25.01, 200))
@settings(max_examples=50, deadline=None)
def test_above_cut_out_zero(v):
    assert py_turbine_power(1.2, v) == 0.0


@given(st.floats(900, 1100), st.floats(-30, 50))
@settings(max_examples=200, deadline=None)
def test_air_density_sane(p_hpa, t_c):
    rho = p_hpa * 100.0 / (physics.GAS_CONSTANT * (t_c + 273.15))
    assert 0.8 < rho < 1.7


def test_spark_physics_matches_python(spark):
    import pyspark.sql.functions as F

    rows = [(0.5,), (3.0,), (8.0,), (12.0,), (25.0,), (25.5,), (60.0,)]
    df = spark.createDataFrame(rows, "v double").select(
        "v",
        physics.turbine_power_kw(F.lit(1.2), "v").alias("p"),
    )
    for r in df.collect():
        assert abs(r.p - py_turbine_power(1.2, r.v)) < 1e-9


def test_solar_efficiency_floor(spark):
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        physics.effective_efficiency(F.lit(200.0)).alias("hot"),
        physics.effective_efficiency(F.lit(25.0)).alias("stc"),
    )
    r = df.head()
    assert r.hot == 0.05  # floored
    assert abs(r.stc - 0.18) < 1e-12


def test_irradiance_floor_and_night(spark):
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        physics.irradiance_from_clouds(F.lit(100.0)).alias("overcast"),
        physics.irradiance_from_clouds(F.lit(0.0)).alias("clear"),
    )
    r = df.head()
    assert r.overcast == 50.0  # floor
    assert r.clear == 1000.0
