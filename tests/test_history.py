"""Warehouse history tier: CDC changelog compaction and SCD Type-2
interval building (warehouse/history.py) — semantic unit tests on
hand-built changelogs where the expected snapshot/intervals are known
by construction, plus the registry queries' structural invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real_time_iot_data_pipeline_project_spark.warehouse import history


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _changelog(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts timestamp, seq long, v string, op string")


def test_cdc_latest_upsert_wins(spark):
    log = _changelog(spark, [
        (1, _ts(1), 1, "a", "U"),
        (1, _ts(2), 2, "b", "U"),
        (2, _ts(1), 3, "x", "U"),
    ])
    out = history.cdc_latest_snapshot(
        log, key_cols=["k"], order_cols=["ts", "seq"], op_col="op")
    got = {r["k"]: (r["v"], r["n_ops"]) for r in out.collect()}
    assert got == {1: ("b", 2), 2: ("x", 1)}


def test_cdc_delete_shadows_earlier_upserts(spark):
    """A tombstone that is the LATEST op removes the key even though
    upserts exist — the ordering bug a naive filter-then-aggregate
    implementation gets wrong (dropping D rows first would resurrect
    the key with its stale pre-delete value)."""
    log = _changelog(spark, [
        (1, _ts(1), 1, "a", "U"),
        (1, _ts(2), 2, "a", "D"),
        (2, _ts(1), 3, "x", "D"),
        (2, _ts(2), 4, "y", "U"),
    ])
    out = history.cdc_latest_snapshot(
        log, key_cols=["k"], order_cols=["ts", "seq"], op_col="op")
    got = {r["k"]: r["v"] for r in out.collect()}
    # key 1 latest op is D -> absent; key 2 delete then re-insert -> present
    assert got == {2: "y"}


def test_cdc_tiebreak_is_total_order(spark):
    """Equal timestamps resolve by the seq tiebreaker, not arrival."""
    log = _changelog(spark, [
        (1, _ts(1), 2, "late", "U"),
        (1, _ts(1), 1, "early", "U"),
    ])
    out = history.cdc_latest_snapshot(
        log, key_cols=["k"], order_cols=["ts", "seq"], op_col="op")
    assert out.collect()[0]["v"] == "late"


def _history(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts timestamp, seq long, state string")


def test_scd2_collapses_runs_and_closes_intervals(spark):
    h = _history(spark, [
        (1, _ts(1), 1, "low"),
        (1, _ts(2), 2, "low"),
        (1, _ts(3), 3, "high"),
        (1, _ts(4), 4, "low"),
    ])
    out = history.scd2_from_history(
        h, key_cols=["k"], ts_col="ts", attr_col="state",
        tiebreak_col="seq").orderBy("version").collect()
    assert [(r["state"], r["effective_from"], r["effective_to"],
             r["version"], r["is_current"]) for r in out] == [
        ("low", _ts(1), _ts(3), 1, False),
        ("high", _ts(3), _ts(4), 2, False),
        ("low", _ts(4), None, 3, True),
    ]


def test_scd2_null_state_is_a_legal_run(spark):
    """Null attribute values form their own runs (null-safe change
    detection): null->null is NOT a change, null->value and
    value->null are."""
    h = _history(spark, [
        (1, _ts(1), 1, None),
        (1, _ts(2), 2, None),
        (1, _ts(3), 3, "a"),
        (1, _ts(4), 4, None),
    ])
    out = history.scd2_from_history(
        h, key_cols=["k"], ts_col="ts", attr_col="state",
        tiebreak_col="seq").orderBy("version").collect()
    assert [(r["state"], r["version"]) for r in out] == [
        (None, 1), ("a", 2), (None, 3)]
    assert out[0]["effective_to"] == _ts(3)


def test_scd2_intervals_partition_the_timeline(spark):
    """Property on real data: per key, intervals are contiguous
    (effective_to == next effective_from), exactly one is open, and
    every source observation's ts falls inside the interval carrying
    its state."""
    from real_time_iot_data_pipeline_project_spark import registry
    from tests.conftest import SF_SMOKE

    out = registry.QUERIES["q98_scd2_intervals"](spark, SF_SMOKE)
    rows = out.orderBy("user_id", "version").collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r)
    assert by_key
    for k, ivs in by_key.items():
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r["is_current"] for r in ivs) == 1
        assert ivs[-1]["effective_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["effective_to"] == b["effective_from"], k
            # a real change: consecutive intervals differ in state
            assert a["state"] != b["state"], k


def test_cdc_snapshot_matches_window_formulation(spark):
    """The max_by aggregation (production shape) must agree row-for-row
    with the window/row_number formulation (the oracle shape) on real
    data — same winners, same tombstone suppression."""
    from pyspark.sql import Window
    from real_time_iot_data_pipeline_project_spark import registry
    from tests.conftest import SF_SMOKE

    agg = registry.QUERIES["q97_cdc_snapshot"](spark, SF_SMOKE)
    ev = registry._t(spark, SF_SMOKE, "events")
    log = ev.select(
        "user_id", "ts", "event_id", "value",
        F.when(F.col("event_type") == "purchase", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    win = (
        log.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(
            Window.partitionBy("user_id")))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", F.col("ts").alias("last_ts"),
                F.col("event_id").alias("last_event_id"),
                F.col("value").alias("last_value"), "n_ops")
    )
    assert agg.exceptAll(win).count() == 0
    assert win.exceptAll(agg).count() == 0


def _hist(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, tb long, a string")


def _rows(df):
    # None-safe canonical order (the null-state run makes `a` nullable)
    return sorted(map(tuple, df.collect()),
                  key=lambda t: tuple((x is None, x) for x in t))


def test_scd2_increment_equals_rebuild_at_any_split(spark):
    """The core invariant: fold(increment) over dim(base) must be
    row-identical to the full rebuild over base + increment — at every
    split point of the history."""
    rows = [
        (1, _ts(1), 1, "A"), (1, _ts(2), 2, "A"), (1, _ts(3), 3, "B"),
        (1, _ts(4), 4, "B"), (1, _ts(5), 5, "A"),
        (2, _ts(1), 6, "X"), (2, _ts(6), 7, None), (2, _ts(7), 8, "X"),
        (3, _ts(2), 9, "Q"),
    ]
    full = history.scd2_from_history(
        _hist(spark, rows), key_cols=["k"], ts_col="ts", attr_col="a",
        tiebreak_col="tb")
    expected = _rows(full)
    for split_h in (2, 3, 5, 6):
        base = [r for r in rows if r[1] <= _ts(split_h)]
        inc = [r for r in rows if r[1] > _ts(split_h)]
        dim = history.scd2_from_history(
            _hist(spark, base), key_cols=["k"], ts_col="ts", attr_col="a",
            tiebreak_col="tb")
        got = history.scd2_apply_increment(
            dim, _hist(spark, inc), key_cols=["k"], ts_col="ts",
            attr_col="a", tiebreak_col="tb")
        assert _rows(got) == expected, f"split at hour {split_h}"


def test_scd2_increment_chained_folds_equal_rebuild(spark):
    """Two successive increments == one rebuild (associativity of the
    maintenance fold — the shape a daily changelog pipeline runs)."""
    rows = [(1, _ts(h), h, a) for h, a in
            [(1, "A"), (2, "B"), (3, "B"), (4, "C"), (5, "A"), (6, "A")]]
    full = history.scd2_from_history(
        _hist(spark, rows), key_cols=["k"], ts_col="ts", attr_col="a",
        tiebreak_col="tb")
    dim = history.scd2_from_history(
        _hist(spark, rows[:2]), key_cols=["k"], ts_col="ts", attr_col="a",
        tiebreak_col="tb")
    dim = history.scd2_apply_increment(
        dim, _hist(spark, rows[2:4]), key_cols=["k"], ts_col="ts",
        attr_col="a", tiebreak_col="tb")
    dim = history.scd2_apply_increment(
        dim, _hist(spark, rows[4:]), key_cols=["k"], ts_col="ts",
        attr_col="a", tiebreak_col="tb")
    assert _rows(dim) == _rows(full)


def test_scd2_increment_untouched_keys_pass_through(spark):
    """Keys absent from the increment keep their exact rows; brand-new
    keys get a fresh version-1 interval."""
    base = [(1, _ts(1), 1, "A"), (2, _ts(1), 2, "X")]
    dim = history.scd2_from_history(
        _hist(spark, base), key_cols=["k"], ts_col="ts", attr_col="a",
        tiebreak_col="tb")
    before = {r["k"]: r for r in dim.collect()}
    out = history.scd2_apply_increment(
        dim, _hist(spark, [(2, _ts(3), 3, "Y"), (9, _ts(2), 4, "N")]),
        key_cols=["k"], ts_col="ts", attr_col="a", tiebreak_col="tb")
    got = {(r["k"], r["version"]): r for r in out.collect()}
    assert tuple(got[(1, 1)]) == tuple(before[1])      # untouched key
    assert got[(2, 1)]["is_current"] is False          # closed by Y
    assert got[(2, 2)]["a"] == "Y" and got[(2, 2)]["is_current"] is True
    assert got[(9, 1)]["a"] == "N" and got[(9, 1)]["is_current"] is True


def test_scd2_increment_rejects_history_rewrites(spark):
    """An increment row older than a key's open interval would rewrite
    closed history — refuse loudly (the full-rebuild path exists for
    that)."""
    import pytest

    dim = history.scd2_from_history(
        _hist(spark, [(1, _ts(1), 1, "A"), (1, _ts(5), 2, "B")]),
        key_cols=["k"], ts_col="ts", attr_col="a", tiebreak_col="tb")
    with pytest.raises(ValueError, match="closed history"):
        history.scd2_apply_increment(
            dim, _hist(spark, [(1, _ts(3), 9, "C")]), key_cols=["k"],
            ts_col="ts", attr_col="a", tiebreak_col="tb")


def test_scd2_increment_rejects_equal_ts_observations(spark):
    """An increment row whose ts EQUALS its key's open effective_from is
    order-ambiguous: the fold seeds the current row first regardless of
    tiebreak, while a full rebuild orders by (ts, tiebreak) — so if the
    increment's tiebreak sorted before the original opening row's, the
    incremental result would diverge from the claimed row-identical
    rebuild. Refuse it like the streaming sink's <= late filter does."""
    import pytest

    dim = history.scd2_from_history(
        _hist(spark, [(1, _ts(1), 5, "A"), (1, _ts(5), 6, "B")]),
        key_cols=["k"], ts_col="ts", attr_col="a", tiebreak_col="tb")
    # ts == open interval's effective_from (_ts(5)), tiebreak 2 < 6
    with pytest.raises(ValueError, match="at or earlier"):
        history.scd2_apply_increment(
            dim, _hist(spark, [(1, _ts(5), 2, "C")]), key_cols=["k"],
            ts_col="ts", attr_col="a", tiebreak_col="tb")


def test_warehouse_maintenance_cli(spark, tmp_path):
    """cdc-apply / scd2-apply CLI domains: fold parquet batches into
    the bucketed snapshot/dimension from the command line (the
    scheduler-operated shape of the streaming sinks' batch cores)."""
    from real_time_iot_data_pipeline_project_spark import pipelines
    from real_time_iot_data_pipeline_project_spark.streaming import scd2, upsert

    log = _changelog(spark, [(1, _ts(1), 1, "a", "U"), (2, _ts(1), 2, "b", "U"),
                             (1, _ts(2), 3, "a2", "U"), (2, _ts(3), 4, "b", "D")])
    batch_path = str(tmp_path / "batch")
    log.write.parquet(batch_path)
    snap = str(tmp_path / "snap")
    pipelines.main(["cdc-apply", batch_path, "--output", snap,
                    "--keys", "k", "--order", "ts,seq", "--buckets", "4"])
    got = {(r["k"], r["v"]) for r in
           upsert.read_snapshot(spark, snap, op_col="op").collect()}
    assert got == {(1, "a2")}

    obs = _hist(spark, [(1, _ts(1), 1, "A"), (1, _ts(2), 2, "B")])
    obs_path = str(tmp_path / "obs")
    obs.write.parquet(obs_path)
    dim = str(tmp_path / "dim")
    pipelines.main(["scd2-apply", obs_path, "--output", dim,
                    "--keys", "k", "--ts-col", "ts", "--attr-col", "a",
                    "--tiebreak", "tb", "--buckets", "4"])
    rows = {(r["k"], r["a"], r["version"], r["is_current"])
            for r in scd2.read_dim(spark, dim).collect()}
    assert rows == {(1, "A", 1, False), (1, "B", 2, True)}


def test_scd2_snapshot_at_equals_truncated_latest_state(spark):
    """The read-side contract: snapshot_at(t) over the SCD2 intervals
    must equal the latest state of the history TRUNCATED at t (one row
    per key observed by then, carrying the attribute of its last
    pre-t observation) — at several probe times."""
    rows = [
        (1, _ts(1), 1, "A"), (1, _ts(3), 2, "B"), (1, _ts(6), 3, "C"),
        (2, _ts(2), 4, "X"), (2, _ts(5), 5, "X"),
        (3, _ts(4), 6, "Q"),
    ]
    dim = history.scd2_from_history(
        _hist(spark, rows), key_cols=["k"], ts_col="ts", attr_col="a",
        tiebreak_col="tb")
    for probe_h in (1, 2, 4, 5, 7):
        snap = history.scd2_snapshot_at(dim, _ts(probe_h))
        got = {r["k"]: r["a"] for r in snap.collect()}
        # python oracle: last observation per key at/before the probe
        want = {}
        for k, ts, tb, a in sorted(rows, key=lambda r: (r[1], r[2])):
            if ts <= _ts(probe_h):
                want[k] = a
        assert got == want, f"probe at hour {probe_h}"
        # exactly one row per surviving key
        assert snap.count() == len(want)


def test_scd2_lookup_facts_outside_history_drop(spark):
    """scd2_lookup: facts before a key's first observation or for
    unknown keys drop out (inner-join semantics); in-interval facts
    resolve to the attribute valid at their timestamp."""
    dim = history.scd2_from_history(
        _hist(spark, [(1, _ts(2), 1, "A"), (1, _ts(4), 2, "B")]),
        key_cols=["k"], ts_col="ts", attr_col="a", tiebreak_col="tb")
    facts = spark.createDataFrame(
        [(1, _ts(1), 10.0),   # before history -> drops
         (1, _ts(3), 20.0),   # inside A
         (1, _ts(4), 30.0),   # boundary -> B (intervals are [from, to))
         (9, _ts(3), 40.0)],  # unknown key -> drops
        "k long, ts timestamp, v double")
    got = {(r["v"], r["a"]) for r in history.scd2_lookup(
        facts, dim, key_cols=["k"], ts_col="ts").collect()}
    assert got == {(20.0, "A"), (30.0, "B")}
