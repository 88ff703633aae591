"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json north-star).

The Spark-side plumbing — schema, Arrow batching via ``mapInPandas``,
partition-preserving transforms — is real and tested. Decode tiers:

- ``image_pixel_stats`` is a REAL decode path: PNG payloads are decoded
  by the pure-stdlib codec (``functions.png``, RFC 2083 subset) inside
  ``mapInPandas`` and reduced to per-channel pixel statistics — no
  external image library required.
- ``audio_signal_stats`` is the REAL decode path for audio: PCM16 WAV
  payloads (``functions.wav``, RIFF subset) decode to rms / peak /
  zero-crossing-rate signal statistics, same poison-payload contract.
- ``extract_features`` keeps the deterministic stub tier for arbitrary
  codecs (JPEG, audio resample, video frame-sample need libraries not in
  this container): it raises ``NotImplementedError`` unless ``fake=True``,
  which produces a deterministic fake feature vector from the bytes (so
  tests and oracles can run end-to-end).

Scale notes: binary payloads ride the same columnar parquet path as any
other column; ``mapInPandas`` streams Arrow batches so peak memory is
one batch of payloads per task, not the partition. Set
``spark.sql.files.maxPartitionBytes`` lower for tables with large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def binary_stats(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id") -> DataFrame:
    """Payload byte length + md5 — pure Column expressions over binary."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: dim floats in [0,1)
    derived from the payload digest."""
    out: list[float] = []
    seed = payload
    while len(out) < dim:
        seed = hashlib.md5(seed).digest()
        out.extend(b / 255.0 for b in seed)
    return out[:dim]


def _png_features(payload: bytes, dim: int) -> list[float]:
    """REAL pixel-derived feature vector from a decoded PNG: per-channel
    mean/std/min/max in [0,1] plus a coarse ``dim - 4*ch``-bucket global
    intensity histogram — downsample-invariant summary features, the
    shape a real vision featurizer emits (fixed dim, [0,1] floats)."""
    import numpy as np

    from ..functions import png as _png

    w, h, ch, pix = _png.decode_png(payload)
    arr = (np.frombuffer(pix, dtype=np.uint8)
           .reshape(-1, ch).astype(np.float64) / 255.0)
    head: list[float] = []
    for stat in (arr.mean(axis=0), arr.std(axis=0),
                 arr.min(axis=0), arr.max(axis=0)):
        head.extend(float(v) for v in stat)
    n_bins = dim - len(head)
    if n_bins <= 0:
        return head[:dim]
    hist, _ = np.histogram(arr.ravel(), bins=n_bins, range=(0.0, 1.0))
    return head + [float(c) / arr.size for c in hist]


def _wav_features(payload: bytes, dim: int) -> list[float]:
    """REAL signal-derived feature vector from a decoded PCM16 WAV: per-
    channel mean/std/min/max of the [-1,1]-normalized amplitudes plus a
    coarse ``dim - 4*ch``-bucket amplitude histogram — the audio twin of
    ``_png_features`` (fixed dim, bounded floats, decoder-real)."""
    import numpy as np

    from ..functions import wav as _wav

    rate, ch, samples = _wav.decode_wav(payload)
    if not samples:
        # decode_wav accepts a structurally-valid WAV whose data chunk
        # is empty; without this guard numpy's mean/std would emit NaN
        # heads and the poison-payload contract would hinge on
        # arr.min's empty-reduction ValueError firing first — make the
        # rejection explicit instead of stat-order-dependent
        raise ValueError("corrupt WAV: empty data chunk")
    arr = (np.asarray(samples, dtype=np.float64).reshape(-1, ch) / 32768.0)
    head: list[float] = []
    for stat in (arr.mean(axis=0), arr.std(axis=0),
                 arr.min(axis=0), arr.max(axis=0)):
        head.extend(float(v) for v in stat)
    n_bins = dim - len(head)
    if n_bins <= 0:
        return head[:dim]
    hist, _ = np.histogram(arr.ravel(), bins=n_bins, range=(-1.0, 1.0))
    return head + [float(c) / arr.size for c in hist]


def extract_features(df: DataFrame, *, dim: int = 16, fake: bool = False,
                     codec: str | None = None,
                     payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    Tiers, by argument:

    - ``codec="png"`` — REAL decode: payloads run through the pure-stdlib
      RFC 2083 decoder (``functions.png``) and become pixel-derived
      features (per-channel mean/std/min/max + intensity histogram,
      ``_png_features``). Malformed payloads yield a null features row
      (decode_png normalizes every failure to ValueError).
    - ``codec="wav"`` — REAL decode for audio: PCM16 WAV payloads
      (``functions.wav``, RIFF subset) become amplitude-derived features
      (per-channel mean/std/min/max + amplitude histogram,
      ``_wav_features``), same poison-payload contract.
    - ``fake=True`` — deterministic digest-derived stub, the oracle tier
      (cross-engine value-checkable without a codec).
    - neither — ``NotImplementedError`` at execution time: JPEG / video
      frame-sample need libraries not present in this container; the
      Spark plumbing (schema, Arrow batching, signature) is identical,
      so a real featurizer drops in per-payload.
    """
    real_decoders = {"png": _png_features, "wav": _wav_features}
    if codec is not None and codec not in real_decoders:
        raise NotImplementedError(
            f"codec {codec!r} needs libraries not present in this "
            "environment; 'png' and 'wav' are the built-in real-decode "
            "paths")
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is not None:
                decode = real_decoders[codec]
                feats = []
                for p in pdf[payload_col]:
                    try:
                        # None payload: bytes(None) raises TypeError,
                        # which must be an error row, not a task death
                        feats.append(None if p is None
                                     else decode(bytes(p), dim))
                    except ValueError:
                        feats.append(None)
                yield pd.DataFrame({id_col: pdf[id_col], "features": feats})
                continue
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; pass codec='png'/'wav' for the "
                    "built-in real decoders or fake=True for the "
                    "deterministic stub"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _fake_features(bytes(p), dim) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def audio_signal_stats(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id",
                       strict: bool = False) -> DataFrame:
    """REAL audio decode → signal statistics, no external codec: PCM16
    WAV payloads (the ``functions.wav`` subset) are decoded inside
    ``mapInPandas`` and reduced to (sample_rate, channels, n_frames,
    duration_s, rms, peak, zero_crossing_rate) — amplitudes normalized
    to [-1, 1] by /32768, zcr = strict sign changes / (frames − 1) over
    the first channel (mono convention).

    Same poison-payload contract as image_pixel_stats: malformed
    payloads (decode_wav normalizes everything to ValueError) yield an
    error row with ``decode_error`` set — or raise when ``strict`` —
    and NULL payloads are error rows, never task deaths.

    Scale shape: one Arrow batch of payloads per task, per-row CPU, no
    shuffle — partition count alone controls parallelism."""
    from ..functions import wav as _wav

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    rate, ch, samples = _wav.decode_wav(bytes(payload))
                    arr = (np.asarray(samples, dtype=np.float64)
                           .reshape(-1, ch) / 32768.0)
                    n = arr.shape[0]
                    mono = arr[:, 0]
                    signs = np.sign(mono)
                    nz = signs != 0
                    zc = int(np.count_nonzero(
                        np.diff(signs[nz]) != 0)) if nz.any() else 0
                    rows.append((
                        mid, rate, ch, n, n / rate,
                        float(np.sqrt(np.mean(arr * arr))),
                        float(np.max(np.abs(arr))),
                        zc / (n - 1) if n > 1 else 0.0,
                        None,
                    ))
                except ValueError as e:
                    if strict:
                        raise
                    rows.append((mid, None, None, None, None, None, None,
                                 None, str(e)))
            yield pd.DataFrame(rows, columns=[
                id_col, "sample_rate", "channels", "n_frames", "duration_s",
                "rms", "peak", "zero_crossing_rate", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def image_pixel_stats(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id",
                      strict: bool = False) -> DataFrame:
    """REAL image decode → per-channel pixel statistics, no external
    codec: PNG payloads (8-bit grey/RGB/RGBA, the ``functions.png``
    subset) are decoded inside ``mapInPandas`` and reduced to
    (width, height, channels, per-channel mean and std in [0,1]).

    Non-PNG / unsupported payloads yield a null-stats row with the
    decode error recorded in ``decode_error`` (or raise when
    ``strict=True``) — at corpus scale a poison payload must not kill
    the job, and the error column makes the failure rate auditable with
    one grouped count.

    Scale shape: one Arrow batch of payloads in memory per task; decode
    is per-row CPU with no shuffle — partition count alone controls
    parallelism."""
    from ..functions import png as _png

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("channel_mean", T.ArrayType(T.DoubleType())),
        T.StructField("channel_std", T.ArrayType(T.DoubleType())),
        T.StructField("decode_error", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    w, h, ch, pix = _png.decode_png(bytes(payload))
                    arr = (np.frombuffer(pix, dtype=np.uint8)
                           .reshape(-1, ch).astype(np.float64) / 255.0)
                    rows.append((mid, w, h, ch,
                                 [float(m) for m in arr.mean(axis=0)],
                                 [float(s) for s in arr.std(axis=0)], None))
                except (ValueError, _zlib.error, _struct.error) as e:
                    # decode_png normalizes to ValueError; the extra types
                    # are defense in depth so a poison payload can never
                    # kill the task when strict=False (ADVICE r5 finding).
                    if strict:
                        raise
                    rows.append((mid, None, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[
                id_col, "width", "height", "channels",
                "channel_mean", "channel_std", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------
# Video tier: frame sampling over an opaque binary container
# ---------------------------------------------------------------------
# Real video codecs (mp4/h264) need libraries absent from this
# container, so the DECODE step uses SVID — a documented synthetic
# raw-frame container — while every piece of Spark-side plumbing a real
# frame sampler needs is genuine: typed explode-in-Python schema
# (several output rows per input video), Arrow-batched mapInPandas,
# stride/cap sampling, the poison-payload contract, and PNG-encoded
# frame payloads that feed the REAL image decode path downstream
# (frame_sample → image_pixel_stats is a tested composition). Swapping
# in a real codec is replacing _decode_svid.
#
# SVID layout (big-endian): b"SVID" | u16 width | u16 height |
# u16 n_frames | n_frames × (width·height·3) raw RGB bytes.

_SVID_MAGIC = b"SVID"


def encode_svid(width: int, height: int, frames: list[bytes]) -> bytes:
    """Build an SVID container from raw RGB frames (test/generator
    helper; each frame must be exactly width·height·3 bytes)."""
    import struct as _struct

    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(
            f"width/height must be in [1, 65535], got {width}x{height}")
    if not (0 < len(frames) <= 0xFFFF):
        raise ValueError(
            f"frame count must be in [1, 65535], got {len(frames)}")
    for i, f in enumerate(frames):
        if len(f) != width * height * 3:
            raise ValueError(
                f"frame {i}: {len(f)} bytes != {width}x{height}x3")
    head = _SVID_MAGIC + _struct.pack(">HHH", width, height, len(frames))
    return head + b"".join(frames)


def _decode_svid(payload: bytes) -> tuple[int, int, list[bytes]]:
    import struct as _struct

    if payload is None or len(payload) < 10:
        raise ValueError("not an SVID payload: too short")
    if payload[:4] != _SVID_MAGIC:
        raise ValueError("not an SVID payload: bad magic")
    w, h, n = _struct.unpack(">HHH", payload[4:10])
    if w == 0 or h == 0:
        raise ValueError(f"degenerate SVID dimensions {w}x{h}")
    if n == 0:
        raise ValueError("empty SVID: zero frames")
    frame_bytes = w * h * 3
    if len(payload) != 10 + n * frame_bytes:
        raise ValueError(
            f"truncated SVID: expected {10 + n * frame_bytes} bytes, "
            f"got {len(payload)}")
    body = payload[10:]
    return w, h, [body[i * frame_bytes:(i + 1) * frame_bytes]
                  for i in range(n)]


def video_frame_sample(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id", *, every_n: int = 1,
                       max_frames: int | None = None,
                       strict: bool = False) -> DataFrame:
    """Frame sampling over video payloads: one OUTPUT ROW per sampled
    frame — (id, frame_idx, n_frames, width, height, frame_png) —
    taking every ``every_n``-th frame capped at ``max_frames``. Each
    sampled frame is re-encoded as a standalone PNG by the stdlib
    codec, so the output column feeds :func:`image_pixel_stats`
    (the real decode path) directly. Poison payloads (bad magic,
    truncation, degenerate dimensions, zero frames) yield one
    (id, nulls..., decode_error) row by default — the same
    never-kill-the-job contract as the PNG/WAV tiers — or raise with
    ``strict=True``."""
    if every_n <= 0:
        raise ValueError(f"every_n must be positive, got {every_n}")
    if max_frames is not None and max_frames <= 0:
        raise ValueError(f"max_frames must be positive, got {max_frames}")
    from ..functions import png as _png

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
        T.StructField("decode_error", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, frames = _decode_svid(
                        None if payload is None else bytes(payload))
                    idxs = range(0, len(frames), every_n)
                    if max_frames is not None:
                        idxs = list(idxs)[:max_frames]
                    for i in idxs:
                        rows.append((mid, i, len(frames), w, h,
                                     _png.encode_png(w, h, frames[i]),
                                     None))
                except ValueError as e:
                    if strict:
                        raise
                    rows.append((mid, None, None, None, None, None,
                                 str(e)))
            yield pd.DataFrame(rows, columns=[
                id_col, "frame_idx", "n_frames", "width", "height",
                "frame_png", "decode_error"])

    return df.select(id_col, payload_col).mapInPandas(run,
                                                      schema=out_schema)
