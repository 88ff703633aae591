"""Batch model-inference boundary (operators/inference.py): the three
production properties — scorer built ONCE per task, inference fed
bounded slices, null rows never reach the model — plus input
validation. The cross-engine value check is registry q117's oracle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_iot_data_pipeline_project_spark.operators import inference


def _docs(spark, n=50, parts=2):
    return spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(n)], "id long, text string"
    ).repartition(parts)


def test_scorer_built_once_per_task_even_across_batches(spark):
    """make_scorer must run once per TASK: with Arrow forced to hand
    each task many small batches, every row's score still reports
    init-count 1 — a per-batch (or per-row) re-init would score 2+."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")  # 25 rows/task -> ~4 Arrow batches/task
    try:
        # worker-process-level latch: every make_scorer call bumps a
        # counter, and every score reports the counter AT INIT time
        def make_counting():
            import builtins
            cnt = getattr(builtins, "_scorer_inits", 0) + 1
            builtins._scorer_inits = cnt

            def score(pdf):
                import pandas as pd
                return pd.Series(float(cnt), index=pdf.index)

            return score

        out = inference.batch_score(
            _docs(spark, n=50, parts=2), make_counting,
            input_cols=["text"], batch_size=1000)
        scores = {r["score"] for r in out.collect()}
        # 2 tasks -> at most 2 inits even though each task sees ~4
        # Arrow batches; a per-batch init would yield values up to ~8
        assert scores <= {1.0, 2.0}, scores
    finally:
        spark.conf.set(key, old)


def test_inference_slices_are_bounded_by_batch_size(spark):
    """The scorer must never see more rows than batch_size at once,
    whatever Arrow chunking delivers."""
    def make_scorer():
        def score(pdf):
            import pandas as pd
            assert len(pdf) <= 8, f"slice of {len(pdf)} rows leaked"
            return pd.Series(float(len(pdf)), index=pdf.index)

        return score

    out = inference.batch_score(
        _docs(spark, n=100, parts=3), make_scorer,
        input_cols=["text"], batch_size=8)
    assert out.count() == 100
    assert out.agg(F.max("score")).head()[0] <= 8.0


def test_null_rows_get_null_score_and_skip_the_model(spark):
    df = spark.createDataFrame(
        [(1, "real text"), (2, None), (3, "more text")],
        "id long, text string")

    def make_scorer():
        def score(pdf):
            import pandas as pd
            assert not pdf["text"].isna().any(), "null reached the model"
            return pd.Series(0.5, index=pdf.index)

        return score

    got = {r["id"]: r["score"] for r in inference.batch_score(
        df, make_scorer, input_cols=["text"]).collect()}
    assert got[1] == 0.5 and got[3] == 0.5
    assert got[2] is None


def test_batch_score_validates_inputs(spark):
    df = _docs(spark, n=3)
    mk = inference.default_quality_scorer
    with pytest.raises(ValueError, match="at least one column"):
        inference.batch_score(df, lambda: mk(), input_cols=[])
    with pytest.raises(ValueError, match="not in DataFrame"):
        inference.batch_score(df, lambda: mk(), input_cols=["nope"])
    with pytest.raises(ValueError, match="batch_size"):
        inference.batch_score(df, lambda: mk(), input_cols=["text"],
                              batch_size=0)
    with pytest.raises(ValueError, match="already exists"):
        inference.batch_score(df, lambda: mk(), input_cols=["text"],
                              score_col="text")


def test_default_scorer_matches_python_reference(spark):
    """The closed-form softsign model: spot-check the arithmetic on a
    handmade doc where every feature is known."""
    text = "the cat, and a dog!"  # 19 chars, 2 punct, 5 tokens, 3 stop
    df = spark.createDataFrame([(1, text)], "id long, text string")
    got = inference.batch_score(
        df, inference.default_quality_scorer,
        input_cols=["text"]).head()["score"]
    w0, w1, w2, w3 = inference.DEFAULT_WEIGHTS
    z = w0 + w1 * (2 / 19) + w2 * (3 / 5) + w3 * (19 / 2000)
    assert got == z / (1.0 + abs(z))


def test_batch_score_composes_with_streaming(spark, tmp_path):
    """The inference boundary is a stateless mapInPandas, so the SAME
    call works on a streaming DataFrame — score-as-you-ingest without a
    separate code path. File stream -> batch_score -> parquet sink must
    produce exactly the batch scores."""
    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(
        [(i, f"some text number {i} the and") for i in range(40)],
        "id long, text string")
    df.write.parquet(str(src / "f1"))
    stream = spark.readStream.schema("id long, text string").parquet(
        f"{src}/*")
    scored = inference.batch_score(
        stream, inference.default_quality_scorer,
        input_cols=["text"], batch_size=16)
    out = str(tmp_path / "out")
    q = (scored.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["id"]: r["score"] for r in spark.read.parquet(out).collect()}
    want = {r["id"]: r["score"] for r in inference.batch_score(
        df, inference.default_quality_scorer,
        input_cols=["text"], batch_size=16).collect()}
    assert got == want and len(got) == 40


def test_scorer_output_is_bound_positionally_and_shape_checked(spark):
    """A scorer that resets its Series index must NOT misalign (values
    bind by position), and a wrong-length output raises instead of
    silently NaN-filling."""
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "id long, text string"
    ).coalesce(1)

    def make_reset_index_scorer():
        def score(pdf):
            import pandas as pd
            # deliberately break label alignment
            return pd.Series([float(len(t)) for t in pdf["text"]])

        return score

    got = {r["id"]: r["score"] for r in inference.batch_score(
        df, make_reset_index_scorer, input_cols=["text"],
        batch_size=4).collect()}
    assert got == {i: float(len(f"t{i}")) for i in range(6)}

    def make_short_scorer():
        def score(pdf):
            import pandas as pd
            return pd.Series([1.0])  # wrong length

        return score

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises((Py4JJavaError, Exception), match="one float"):
        inference.batch_score(df, make_short_scorer,
                              input_cols=["text"]).collect()


def test_stateful_model_init_amortizes_per_task_exactly(spark, tmp_path):
    """VERDICT r8 item 5: a model-ish scorer with REAL internal state —
    a numpy weight matrix loaded from a file inside make_scorer — must
    be loaded exactly n_tasks times (never n_batches), pinned via a
    Spark accumulator at TWO different Arrow maxRecordsPerBatch
    settings so init semantics can't drift with Arrow chunking."""
    import numpy as np

    wfile = tmp_path / "weights.npy"
    np.save(wfile, np.array([0.5, 2.0], dtype="float64"))
    wpath = str(wfile)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    n, parts = 60, 4
    df = spark.createDataFrame(
        [(i, "x" * (i % 7 + 1)) for i in range(n)],
        "id long, text string").repartition(parts)
    expected = {i: 0.5 + 2.0 * (i % 7 + 1) for i in range(n)}

    try:
        for batch_setting in ("5", "50"):   # ~3 batches/task vs 1
            spark.conf.set(key, batch_setting)
            inits = spark.sparkContext.accumulator(0)

            def make_weighted(inits=inits, wpath=wpath):
                import numpy as _np
                w = _np.load(wpath)          # the expensive init
                inits.add(1)

                def score(pdf):
                    import pandas as _pd
                    x = pdf["text"].str.len().to_numpy(dtype="float64")
                    return _pd.Series(w[0] + w[1] * x, index=pdf.index)

                return score

            out = inference.batch_score(
                df, make_weighted, input_cols=["text"], batch_size=8)
            got = {r["id"]: r["score"] for r in out.collect()}
            assert got == expected
            # exactly one load per task, regardless of Arrow chunking
            assert inits.value == parts, (batch_setting, inits.value)
    finally:
        spark.conf.set(key, old)


def test_default_scorer_trailing_newline_is_not_a_stopword(spark):
    """Regression (round-9 review): the vectorized stopword regex must
    use \\Z, not $ — '$' matches before a trailing newline, counting
    'the\\n' as the stopword token that split(' ') membership does
    not. Both texts have 2 tokens; only the one with a real trailing
    stopword token counts it."""
    df = spark.createDataFrame(
        [(1, "hello the\n"), (2, "hello the")], "id long, text string")
    got = {r["id"]: r["score"] for r in inference.batch_score(
        df, inference.default_quality_scorer,
        input_cols=["text"]).collect()}
    w0, w1, w2, w3 = inference.DEFAULT_WEIGHTS

    def ref(text):
        toks = text.lower().split(" ")
        sr = sum(t in ("the", "a", "of", "and", "to", "in", "is",
                       "that", "it", "for") for t in toks) / len(toks)
        z = w0 + w2 * sr + w3 * (len(text) / 2000.0)
        return z / (1.0 + abs(z))

    assert got[1] == ref("hello the\n")   # 'the\n' is NOT a stopword
    assert got[2] == ref("hello the")     # 'the' IS
    assert got[1] != got[2]
