"""Pure-stdlib RIFF/WAVE PCM16 codec — the audio analogue of
``png_codec``: REAL container parsing (chunk walking, header
validation), zero third-party dependencies, so the multimodal audio
path decodes genuine .wav payloads instead of stubbing.

Scope: mono PCM 16-bit little-endian (format tag 1) — the canonical
uncompressed interchange form. Compressed codecs (MP3/AAC/FLAC) need
external libraries this container does not ship; feed their DECODED
PCM through :func:`encode_wav` or gate a soundfile-backed kernel the
way ``decode_pixel_stats(kernel='pil')`` gates Pillow.

Reference semantics: multimedia columns ride Spark frames as opaque
``binary`` with typed metadata; decode runs as an Arrow kernel on the
executors (operators/multimodal.py::decode_audio_stats).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(sample_rate: int, samples) -> bytes:
    """A spec-complete mono PCM16 WAV file (playable by any player)."""
    arr = np.asarray(samples, dtype="<i2")
    data = arr.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, 1, int(sample_rate), int(sample_rate) * 2, 2, 16
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a WAV payload.

    Real chunk walking: any chunks between ``fmt `` and ``data`` (LIST /
    INFO / cue — common in the wild) are skipped per the RIFF rules
    (chunks are word-aligned: odd sizes carry a pad byte). Raises
    ``ValueError`` on anything that is not mono PCM16 — the corruption
    screen converts that to NULLs, it never guesses."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            break  # fmt must precede data per spec; nothing else needed
        pos += 8 + size + (size & 1)  # RIFF word alignment
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _block, bits = fmt
    if tag != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (tag={tag}, ch={channels}, bits={bits}):"
            " mono PCM16 only"
        )
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return int(rate), np.frombuffer(data, dtype="<i2")
