"""Video frame-sample tier (operators/multimodal.py SVID plumbing):
stride/cap sampling, the PNG-frame composition into the REAL image
decode path, and the poison-payload contract."""

from __future__ import annotations

from pyspark.sql import functions as F

def test_video_frame_sample_stride_cap_and_real_png_composition(spark):
    """Video tier (SVID synthetic container, real plumbing): stride +
    cap sampling must pick exactly the expected frame indices, and the
    PNG-encoded frames must flow through the REAL image decode path
    (image_pixel_stats) reproducing each frame's planted solid color
    exactly."""
    from real_time_iot_data_pipeline_project_spark.operators import (
        multimodal as mm,
    )

    w, h, n = 4, 3, 10
    # frame i = solid color (10*i, 20*i mod 256, 5*i)
    def frame(i):
        return bytes([(10 * i) % 256, (20 * i) % 256, (5 * i) % 256]) \
            * (w * h)

    vids = [(7, mm.encode_svid(w, h, [frame(i) for i in range(n)]))]
    df = spark.createDataFrame(vids, "media_id long, payload binary")
    out = mm.video_frame_sample(df, every_n=3, max_frames=3)
    rows = sorted(out.collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    assert all(r["n_frames"] == 10 and r["width"] == w
               and r["height"] == h for r in rows)

    # composition: sampled frames -> REAL PNG pixel stats
    frames_df = out.select(
        (F.col("media_id") * 100 + F.col("frame_idx")).alias("media_id"),
        F.col("frame_png").alias("payload"))
    stats = {r["media_id"]: r for r in
             mm.image_pixel_stats(frames_df).collect()}
    for i in (0, 3, 6):
        r = stats[700 + i]
        want = [((10 * i) % 256) / 255.0, ((20 * i) % 256) / 255.0,
                ((5 * i) % 256) / 255.0]
        # numpy's mean of n identical values can differ from the exact
        # quotient by one ulp (pairwise-sum rounding) — tolerance check
        assert all(abs(g - e) < 1e-12
                   for g, e in zip(r["channel_mean"], want))
        assert all(abs(s) < 1e-12 for s in r["channel_std"])


def test_video_frame_sample_poison_contract(spark):
    from real_time_iot_data_pipeline_project_spark.operators import (
        multimodal as mm,
    )

    good = mm.encode_svid(2, 2, [bytes(12)])
    df = spark.createDataFrame(
        [(1, good), (2, b"JUNKJUNKJUNKJUNK")],
        "media_id long, payload binary")
    import pytest as _pytest
    with _pytest.raises(Exception, match="SVID"):
        mm.video_frame_sample(df, strict=True).collect()
    rows = {r["media_id"]: r for r in
            mm.video_frame_sample(df, strict=False).collect()}
    assert rows[1]["decode_error"] is None and rows[1]["frame_idx"] == 0
    assert rows[2]["decode_error"] is not None \
        and "SVID" in rows[2]["decode_error"]
    with _pytest.raises(ValueError, match="every_n"):
        mm.video_frame_sample(df, every_n=0)
