"""Pure-stdlib WAV (RIFF/WAVE PCM) codec.

De-stubs the multimodal suite's audio path for the one audio format
that needs no entropy codec: uncompressed PCM. The reference has no
audio surface — this belongs to the engine's training-data-pipeline
side (feature extraction over opaque media columns), where a lake's
raw audio commonly lands as WAV/PCM before transcoding. Compressed
audio (MP3/AAC/Opus) stays on the disclosed digest stub: no codec
library exists in this container and a stdlib MDCT decoder is out of
scope.

Supports 8-bit unsigned and 16-bit signed little-endian PCM, any
channel count, arbitrary extra chunks (skipped per RIFF rules,
including the odd-size pad byte). ``fmt`` codes other than 1 (PCM)
raise ``WavError``.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Raised for malformed, truncated, or non-PCM WAV bytes."""


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (n,) or (n, channels) samples → RIFF/WAVE PCM16 bytes."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        raise WavError("encoder expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise WavError(f"unsupported sample shape {samples.shape}")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples (n, channels), sample_rate).

    8-bit PCM is widened to int16 ((v - 128) << 8) so callers see one
    dtype."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise WavError("truncated chunk")
        if fourcc == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif fourcc == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or raw is None:
        raise WavError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise WavError(
            f"non-PCM WAV (format {audio_format}) unsupported — compressed "
            "audio keeps the disclosed digest stub"
        )
    if channels < 1:
        raise WavError("zero channels")
    if bits == 16:
        arr = np.frombuffer(raw[: len(raw) // (2 * channels) * 2 * channels], "<i2")
        samples = arr.reshape(-1, channels).astype(np.int16)
    elif bits == 8:
        arr = np.frombuffer(raw[: len(raw) // channels * channels], np.uint8)
        samples = ((arr.astype(np.int16) - 128) << 8).reshape(-1, channels)
    else:
        raise WavError(f"{bits}-bit PCM unsupported (8/16 only)")
    return samples, int(sample_rate)
