"""Real-decode multimodal tier: pure-stdlib PNG codec + pixel-stats
operator (functions/png.py, operators/multimodal.image_pixel_stats)."""

from __future__ import annotations

import struct
import zlib

import pytest

from real_time_iot_data_pipeline_project_spark.functions import png
from real_time_iot_data_pipeline_project_spark.operators import multimodal


def _gradient(width, height, ch):
    return bytes(((x * 7 + y * 13 + c * 29) % 256)
                 for y in range(height) for x in range(width) for c in range(ch))


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
def test_png_round_trip(color_type, ch):
    w, h = 9, 7
    pix = _gradient(w, h, ch)
    data = png.encode_png(w, h, pix, color_type)
    gw, gh, gch, got = png.decode_png(data)
    assert (gw, gh, gch) == (w, h, ch)
    assert got == pix


def _filtered_png(width, height, pixels, filters):
    """Hand-build a truecolor PNG applying a chosen filter per scanline —
    exercises decode paths the filter-0 encoder never emits."""
    ch, stride = 3, width * 3
    prev = bytearray(stride)
    raw = bytearray()
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        f = filters[y % len(filters)]
        raw.append(f)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = line[i] - a
            elif f == 2:
                v = line[i] - b
            elif f == 3:
                v = line[i] - ((a + b) >> 1)
            else:
                v = line[i] - png._paeth(a, b, c)
            raw.append(v & 0xFF)
        prev = bytearray(line)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + png._chunk(b"IEND", b""))


def test_png_decode_all_filter_types():
    w, h = 8, 10
    pix = _gradient(w, h, 3)
    data = _filtered_png(w, h, pix, filters=[0, 1, 2, 3, 4])
    gw, gh, gch, got = png.decode_png(data)
    assert (gw, gh, gch) == (w, h, 3)
    assert got == pix


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        png.decode_png(b"\xff\xd8\xff JPEG-ish bytes")
    # 16-bit depth is out of the supported subset
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
           + png._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        png.decode_png(bad)


def test_png_decode_normalizes_corrupt_payloads():
    """Truncated/corrupt payloads that still carry the 8-byte signature
    raise ValueError, never zlib.error / struct.error (ADVICE r5): a
    poison payload at corpus scale must be catchable with one clause."""
    w, h = 4, 4
    good = png.encode_png(w, h, _gradient(w, h, 3), 2)
    # corrupt deflate stream inside a structurally-valid IDAT chunk
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    bad_deflate = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
                   + png._chunk(b"IDAT", b"\x00\xff\x13\x37 not deflate")
                   + png._chunk(b"IEND", b""))
    # truncated mid-chunk-header (signature + 2 bytes of a length field)
    truncated = good[:10]
    for payload in (bad_deflate, truncated):
        with pytest.raises(ValueError):
            png.decode_png(payload)


def test_image_pixel_stats_survives_corrupt_png(spark):
    """Non-strict pixel stats yields an error row (not a task death) for
    a signature-valid payload whose deflate stream is corrupt."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
           + png._chunk(b"IDAT", b"\x00\xff\x13\x37 not deflate")
           + png._chunk(b"IEND", b""))
    good = png.encode_png(2, 2, _gradient(2, 2, 3), 2)
    df = spark.createDataFrame(
        [(1, "image", bytearray(bad), None),
         (2, "image", bytearray(good[:10]), None),
         (3, "image", bytearray(good), None)],
        multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.image_pixel_stats(df).collect()}
    assert "corrupt PNG" in got[1].decode_error
    assert got[2].decode_error is not None
    assert got[3].decode_error is None and got[3].channels == 3


def test_extract_features_real_png_decode(spark):
    """codec='png' runs the REAL decoder: features are pixel-derived
    (match a local numpy oracle), malformed payloads yield null
    features, and unsupported codecs still raise NotImplementedError."""
    import numpy as np

    w, h = 6, 4
    rgb = _gradient(w, h, 3)
    rows = [
        (1, "image", bytearray(png.encode_png(w, h, rgb, 2)), None),
        (2, "image", bytearray(b"junk, not a PNG"), None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r.features
           for r in multimodal.extract_features(df, dim=16, codec="png").collect()}

    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3) / 255.0
    expect = []
    for stat in (arr.mean(axis=0), arr.std(axis=0),
                 arr.min(axis=0), arr.max(axis=0)):
        expect.extend(stat)
    hist, _ = np.histogram(arr.ravel(), bins=4, range=(0.0, 1.0))
    expect.extend(hist / arr.size)
    assert len(got[1]) == 16
    np.testing.assert_allclose(got[1], expect, atol=1e-12)
    assert got[2] is None

    with pytest.raises(NotImplementedError, match="jpeg"):
        multimodal.extract_features(df, codec="jpeg")


def test_image_pixel_stats_real_decode(spark):
    """The Spark operator decodes genuine PNG payloads and its stats
    match a local numpy oracle; a poison payload yields an error row
    instead of failing the job."""
    import numpy as np

    w, h = 6, 4
    rgb = _gradient(w, h, 3)
    grey = _gradient(w, h, 1)
    rows = [
        (1, "image", bytearray(png.encode_png(w, h, rgb, 2)), None),
        (2, "image", bytearray(png.encode_png(w, h, grey, 0)), None),
        (3, "image", bytearray(b"not an image at all"), None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.image_pixel_stats(df).collect()}

    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3) / 255.0
    assert (got[1].width, got[1].height, got[1].channels) == (w, h, 3)
    assert got[1].decode_error is None
    np.testing.assert_allclose(got[1].channel_mean, arr.mean(axis=0), atol=1e-12)
    np.testing.assert_allclose(got[1].channel_std, arr.std(axis=0), atol=1e-12)

    garr = np.frombuffer(grey, dtype=np.uint8).reshape(-1, 1) / 255.0
    assert got[2].channels == 1
    np.testing.assert_allclose(got[2].channel_mean, garr.mean(axis=0), atol=1e-12)

    assert got[3].width is None and "not a PNG" in got[3].decode_error

    # strict mode: poison payload fails the job instead
    with pytest.raises(Exception, match="not a PNG"):
        multimodal.image_pixel_stats(df, strict=True).collect()


def test_null_payload_is_error_row_not_task_death(spark):
    """Review regression: a NULL payload must yield an error/null row in
    both decode surfaces, not a TypeError task death."""
    good = png.encode_png(2, 2, _gradient(2, 2, 3), 2)
    # arbitrary input frames carry nullable payload columns — the
    # operators must not rely on MEDIA_SCHEMA's non-null declaration
    df = spark.createDataFrame(
        [(1, None), (2, bytearray(good))], "media_id long, payload binary")
    stats = {r.media_id: r for r in multimodal.image_pixel_stats(df).collect()}
    assert stats[1].width is None and "null payload" in stats[1].decode_error
    assert stats[2].channels == 3
    feats = {r.media_id: r.features
             for r in multimodal.extract_features(df, codec="png").collect()}
    assert feats[1] is None and feats[2] is not None


# ---------- WAV (audio modality) ----------

from real_time_iot_data_pipeline_project_spark.functions import wav  # noqa: E402


def test_wav_round_trip_mono_and_stereo():
    mono = [100, -200, 300, -400, 0, 32767, -32768, 5]
    data = wav.encode_wav(mono, sample_rate=8000, channels=1)
    rate, ch, got = wav.decode_wav(data)
    assert (rate, ch, got) == (8000, 1, mono)

    stereo = [1, -1, 2, -2, 3, -3]  # L/R interleaved, 3 frames
    data = wav.encode_wav(stereo, sample_rate=44100, channels=2)
    rate, ch, got = wav.decode_wav(data)
    assert (rate, ch, got) == (44100, 2, stereo)


def test_wav_rejects_malformed_with_valueerror():
    good = wav.encode_wav([1, 2, 3, 4], sample_rate=8000)
    import struct as _struct
    for payload in (
        b"not riff at all",
        good[:16],                      # truncated mid-fmt
        # float-format fmt chunk (tag 3) is unsupported
        (b"RIFF" + _struct.pack("<I", 28) + b"WAVEfmt "
         + _struct.pack("<I", 16)
         + _struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)),
    ):
        try:
            wav.decode_wav(payload)
        except ValueError:
            continue
        raise AssertionError(f"decode accepted {payload[:12]!r}")


def test_audio_signal_stats_oracle_and_poison(spark):
    """Spark audio stats match a local numpy oracle on a real sine-ish
    signal; poison and NULL payloads yield error rows; strict raises."""
    import math

    import numpy as np

    samples = [int(10000 * math.sin(2 * math.pi * i / 16)) for i in range(64)]
    good = wav.encode_wav(samples, sample_rate=8000)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"junk")), (3, None)],
        "media_id long, payload binary")
    got = {r.media_id: r for r in multimodal.audio_signal_stats(df).collect()}

    arr = np.asarray(samples, dtype=np.float64) / 32768.0
    r = got[1]
    assert (r.sample_rate, r.channels, r.n_frames) == (8000, 1, 64)
    assert abs(r.duration_s - 64 / 8000) < 1e-12
    assert abs(r.rms - float(np.sqrt(np.mean(arr * arr)))) < 1e-12
    assert abs(r.peak - float(np.max(np.abs(arr)))) < 1e-12
    signs = np.sign(arr)
    nz = signs != 0
    zc = int(np.count_nonzero(np.diff(signs[nz]) != 0))
    assert abs(r.zero_crossing_rate - zc / 63) < 1e-12

    assert got[2].rms is None and "RIFF" in got[2].decode_error
    assert got[3].rms is None and "null payload" in got[3].decode_error

    # a wrong RIFF size field alone is tolerated (parser ignores it —
    # many writers get it wrong); the payload still decodes
    lax = bytearray(good[:4] + b"\xff\xff\xff\xff" + good[8:])
    lax_df = spark.createDataFrame([(9, lax)], "media_id long, payload binary")
    assert multimodal.audio_signal_stats(lax_df).collect()[0].n_frames == 64

    import pytest as _pytest
    with _pytest.raises(Exception, match="null payload|RIFF"):
        multimodal.audio_signal_stats(df, strict=True).collect()


def test_wav_rejects_zero_channels_and_zero_rate():
    """fmt chunks declaring channels=0 or sample_rate=0 must raise
    ValueError, not ZeroDivisionError (channels=0 reaches a modulo;
    rate=0 reaches a division in audio_signal_stats) — the poison
    contract is 'one except ValueError clause suffices'."""
    import struct as _struct

    def fmt_wav(channels, rate):
        pcm = _struct.pack("<4h", 1, 2, 3, 4)
        return (b"RIFF" + _struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
                + _struct.pack("<I", 16)
                + _struct.pack("<HHIIHH", 1, channels, rate,
                               rate * 2 * max(channels, 1),
                               2 * max(channels, 1), 16)
                + b"data" + _struct.pack("<I", len(pcm)) + pcm)

    for payload in (fmt_wav(0, 8000), fmt_wav(1, 0)):
        with pytest.raises(ValueError):
            wav.decode_wav(payload)


def test_png_rejects_degenerate_dimensions():
    """A structurally-valid PNG with width=0 or height=0 must be a
    ValueError (→ error row), not a 'successful' decode that feeds NaN
    pixel stats into downstream aggregates."""
    for w, h in ((0, 2), (2, 0)):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (b"\x89PNG\r\n\x1a\n"
                   + png._chunk(b"IHDR", ihdr)
                   + png._chunk(b"IDAT", zlib.compress(b"\x00" * h))
                   + png._chunk(b"IEND", b""))
        with pytest.raises(ValueError):
            png.decode_png(payload)


def test_audit_empty_table_reports_zero_not_null(spark):
    """column_checks over an empty frame: every check reports 0
    violations (a clean empty partition must pass a == 0 publish
    gate)."""
    from pyspark.sql import functions as F
    from real_time_iot_data_pipeline_project_spark.operators import audit

    empty = spark.createDataFrame([], "id long, qty double")
    rep = audit.column_checks(
        empty, checks={"qty_null": F.col("qty").isNull()},
        unique_keys={"pk": ["id"]})
    got = {r["check_name"]: r["n_violations"] for r in rep.collect()}
    assert got == {"qty_null": 0, "pk": 0}


def test_extract_features_real_wav_decode(spark):
    """codec='wav' runs the REAL audio decoder: features are amplitude-
    derived (match a local numpy oracle), malformed payloads yield null
    features — the audio twin of the PNG feature path (VERDICT r6 #4)."""
    import numpy as np

    stereo = [1000, -1000, 2000, -2000, 3000, -3000, 4000, -4000]
    rows = [
        (1, "audio", bytearray(wav.encode_wav(stereo, sample_rate=8000,
                                              channels=2)), None),
        (2, "audio", bytearray(b"RIFFjunk, not a WAV"), None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r.features
           for r in multimodal.extract_features(df, dim=16,
                                                codec="wav").collect()}

    arr = np.asarray(stereo, dtype=np.float64).reshape(-1, 2) / 32768.0
    expect = []
    for stat in (arr.mean(axis=0), arr.std(axis=0),
                 arr.min(axis=0), arr.max(axis=0)):
        expect.extend(stat)
    hist, _ = np.histogram(arr.ravel(), bins=8, range=(-1.0, 1.0))
    expect.extend(hist / arr.size)
    assert len(got[1]) == 16
    np.testing.assert_allclose(got[1], expect, atol=1e-12)
    assert got[2] is None

    # genuinely unsupported formats still refuse up front
    with pytest.raises(NotImplementedError, match="mp3"):
        multimodal.extract_features(df, codec="mp3")


def test_wav_empty_data_chunk_rejected_explicitly():
    """A structurally-valid WAV with a ZERO-sample data chunk must be
    rejected by an explicit guard in _wav_features, not by the accident
    of numpy's empty-reduction ValueError firing before the NaN-head
    stats (mean/std on an empty array silently yield NaN)."""
    hdr = (b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
           + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", 0))
    # the decoder itself accepts it (zero samples is structurally legal)
    assert wav.decode_wav(hdr) == (8000, 1, [])
    with pytest.raises(ValueError, match="empty data chunk"):
        multimodal._wav_features(hdr, 16)
