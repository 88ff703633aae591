"""Contract-drift guard for the shared table loader (registry._t).

TESTDATA.md promises "one parquet per table" — NOT a physical timestamp
encoding.  The driver has shipped events.ts both as TIMESTAMP(NANOS)
(rounds 1-3) and as timestamp[us] (round 4 regen), and the round-4 break
proved a hard-coded assumption takes out every events consumer at once.
These tests pin the loader's behavior under BOTH encodings so a future
testdata regen can never silently kill 29 queries again.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from real_time_iot_data_pipeline_project_spark.registry import _t

from conftest import SF_SMOKE

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_TS_VALUES = [
    datetime.datetime(2024, 1, 1, 0, 9, 58, 778549),
    datetime.datetime(2024, 6, 15, 12, 30, 0, 123456),
    datetime.datetime(2024, 12, 31, 23, 59, 59, 999999),
]


def _write_events_fixture(path: str, ts_unit: str) -> None:
    """Write a minimal events.parquet with ts at the given physical unit."""
    n = len(_TS_VALUES)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(_TS_VALUES, pa.timestamp(ts_unit)),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    # version=2.6 preserves nanosecond timestamps as TIMESTAMP(NANOS)
    pq.write_table(table, path, version="2.6", coerce_timestamps=None)


def test_live_testdata_loads_every_table(spark):
    """Every table in TESTDATA.md loads through _t, and events.ts arrives
    as a timestamp type regardless of how the driver encoded it."""
    for t in TABLES:
        df = _t(spark, SF_SMOKE, t)
        assert df.count() > 0, t
    ev = _t(spark, SF_SMOKE, "events")
    assert isinstance(ev.schema["ts"].dataType, (TimestampType, TimestampNTZType))


@pytest.mark.parametrize("ts_unit", ["ns", "us"])
def test_loader_accepts_both_ts_encodings(spark, tmp_path, ts_unit):
    """The loader must produce IDENTICAL timestamp values whether the file
    stores TIMESTAMP(NANOS) or timestamp[us] — the two encodings the
    driver has actually shipped."""
    d = tmp_path / f"sf_{ts_unit}"
    d.mkdir()
    _write_events_fixture(str(d / "events.parquet"), ts_unit)

    ev = _t(spark, str(d), "events")
    assert isinstance(ev.schema["ts"].dataType, (TimestampType, TimestampNTZType))
    got = [r["ts"] for r in ev.orderBy("event_id").select("ts").collect()]
    assert got == _TS_VALUES

    # time functions must work directly on the loaded column
    hours = [
        r["h"]
        for r in ev.orderBy("event_id").select(F.hour("ts").alias("h")).collect()
    ]
    assert hours == [0, 12, 23]


def test_ns_and_us_fixtures_agree_through_loader(spark, tmp_path):
    """Same logical data, both physical encodings → identical loader output
    (the exact invariant whose violation broke round 4)."""
    outs = {}
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        _write_events_fixture(str(d / "events.parquet"), unit)
        outs[unit] = sorted(
            tuple(r) for r in _t(spark, str(d), "events").collect()
        )
    assert outs["ns"] == outs["us"]


# Logical schema contract for every table (TESTDATA.md): column names
# plus TYPE FAMILIES, not physical types — the driver owns the physical
# encoding (round 4 proved it can change between rounds) and the engine
# must keep loading anything logically equivalent. A failure here is
# the early, pointed signal that a regen shifted the contract.
_FAMILIES = {
    "int": {"tinyint", "smallint", "int", "bigint"},
    "float": {"float", "double", "decimal"},
    "str": {"string"},
    "ts": {"timestamp", "timestamp_ntz"},
    "vec": {"array<float>", "array<double>"},
}

_CONTRACT = {
    "region": {"r_regionkey": "int", "r_name": "str"},
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "customer": {"c_custkey": "int", "c_name": "str", "c_nationkey": "int",
                 "c_acctbal": "float"},
    "supplier": {"s_suppkey": "int", "s_name": "str", "s_nationkey": "int"},
    "part": {"p_partkey": "int", "p_name": "str", "p_retailprice": "float"},
    "orders": {"o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "str",
               "o_totalprice": "float", "o_orderdate": "ts",
               "o_orderpriority": "str"},
    "lineitem": {"l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
                 "l_linenumber": "int", "l_quantity": "float",
                 "l_extendedprice": "float", "l_discount": "float",
                 "l_tax": "float", "l_returnflag": "str",
                 "l_linestatus": "str", "l_shipdate": "ts"},
    "events": {"event_id": "int", "ts": "ts", "user_id": "int",
               "event_type": "str", "value": "float", "props": "str"},
    "documents": {"doc_id": "int", "text": "str", "lang": "str",
                  "source": "str", "n_chars": "int"},
    "embeddings": {"vec_id": "int", "embedding": "vec", "label": "int"},
}


def _family_ok(dtype: str, family: str) -> bool:
    d = dtype.lower()
    if family == "float":
        return d in _FAMILIES["float"] or d.startswith("decimal")
    return d in _FAMILIES[family]


def test_every_table_matches_logical_contract(spark):
    for table, cols in _CONTRACT.items():
        df = _t(spark, SF_SMOKE, table)
        have = dict(df.dtypes)
        for col, family in cols.items():
            assert col in have, f"{table}.{col} missing (driver regen drift?)"
            assert _family_ok(have[col], family), (
                f"{table}.{col}: physical type {have[col]} left the "
                f"'{family}' family — update the loader, not the queries")
