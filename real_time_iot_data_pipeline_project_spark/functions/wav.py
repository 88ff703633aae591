"""Minimal pure-stdlib WAV (RIFF PCM) codec — the real-decode path for
the AUDIO modality, mirroring what ``functions.png`` does for images in
an environment with no media libraries.

Supports the canonical interchange subset: RIFF/WAVE containers with a
PCM (format tag 1) ``fmt `` chunk and 16-bit signed little-endian
samples, any channel count and sample rate. This is deliberately NOT a
general audio library — it exists so ``operators.multimodal`` can run a
genuine decode → signal-statistics path (and be oracle-tested against
encode round-trips) without optional dependencies. On a cluster with
real codecs (mp3/flac/ogg), swap the per-payload decoder; the Spark
plumbing (mapInPandas signature, Arrow batching, output schema) is
identical.

Like ``decode_png``, every malformed payload raises ``ValueError`` —
a poison payload at corpus scale must surface as a recordable error
row, never a task-killing exception type the caller didn't anticipate.
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """Encode interleaved 16-bit signed samples as a PCM WAV file."""
    if len(samples) % channels:
        raise ValueError(
            f"{len(samples)} samples do not divide into {channels} channels")
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM16 WAV payload to ``(sample_rate, channels,
    interleaved samples)``. Raises ``ValueError`` on ANY malformed
    payload: non-RIFF, missing chunks, non-PCM format tags, non-16-bit
    depth, truncated data."""
    try:
        return _decode_wav_impl(data)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt WAV: {type(e).__name__}: {e}") from e


def _decode_wav_impl(data: bytes) -> tuple[int, int, list[int]]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = bits = None
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) < length:
            raise ValueError("corrupt WAV: truncated chunk")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt_tag, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant: format_tag={fmt_tag} "
                    f"bits={bits} (PCM16 only)")
            if channels < 1 or sample_rate < 1:
                raise ValueError(
                    f"corrupt WAV: channels={channels} "
                    f"sample_rate={sample_rate} (both must be >= 1)")
        elif tag == b"data":
            pcm = payload
    if sample_rate is None or pcm is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    if len(pcm) % (2 * channels):
        raise ValueError("corrupt WAV: data size not a sample multiple")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return sample_rate, channels, samples
