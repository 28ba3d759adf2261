"""Pure-Python PNG codec (stdlib ``zlib`` + ``struct`` only) — the REAL
decode path for the multimodal operators in this codec-less container.

Why it exists: the multimodal surface (BASELINE.json north-star; reference
treats attachments as opaque ``binary`` + typed metadata) needs at least one
genuinely real decode kernel, not just the deterministic fakes. PNG is the
one mainstream raster format fully decodable with the standard library:
chunk framing + CRC-32 (``zlib.crc32``), DEFLATE pixel data
(``zlib.decompress``), and the five scanline filters (None/Sub/Up/Average/
Paeth) are all spec-complete here per RFC 2083 / the W3C PNG spec.

Scope (asserted, errors otherwise): 8-bit depth, color types 0 (grayscale),
2 (RGB), 6 (RGBA), non-interlaced. That covers everything the in-repo
encoder emits and the overwhelming majority of real-world PNGs; unsupported
headers raise ``ValueError`` so blobs degrade to NULLs in the Arrow kernels
rather than mis-decoding.

This module is deliberately dependency-free and self-contained so the
``mapInPandas`` kernels can ship it to executors by module reference (the
package is on executor PYTHONPATH — see ``session._export_package_path``).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}

# scanline width (bytes) above which the numpy row kernels beat the
# pure-Python loops (below it, numpy array-creation overhead dominates)
_VEC_STRIDE = 256


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0) -> bytes:
    """Serialize raw 8-bit samples (row-major, no padding) to a PNG.

    ``pixels`` must be ``width * height * channels`` bytes. Scanline filter
    type rotates per row (None, Sub, Up, Average, Paeth) so round-trip tests
    exercise every defilter branch of :func:`decode_png`.
    """
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    if width < 1 or height < 1:
        raise ValueError("dimensions must be >= 1")
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {stride * height}"
        )

    # Filter predictors read ORIGINAL (unfiltered) neighbor samples, so
    # every encode filter vectorizes exactly; numpy uint8 arithmetic wraps
    # mod 256 — the spec's arithmetic. (Decode is the sequential direction
    # for Sub/Average/Paeth; see decode_png.)
    try:
        import numpy as _np
    except ImportError:  # pragma: no cover - numpy is a baked-in dep
        _np = None

    raw = bytearray()
    # numpy row ops only pay off past ~256-byte scanlines (array-creation
    # overhead dominates below; measured — tiny thumbnails are FASTER in
    # pure Python, megapixel rows ~10× faster vectorized)
    if _np is not None and stride >= _VEC_STRIDE:
        px = _np.frombuffer(pixels, dtype=_np.uint8).reshape(height, stride)
        zrow = _np.zeros(stride, dtype=_np.uint8)
        for y in range(height):
            row = px[y]
            prev_r = px[y - 1] if y else zrow
            left = _np.concatenate((zrow[:ch], row[:-ch])) if stride > ch else zrow
            ftype = y % 5
            raw.append(ftype)
            if ftype == 0:  # None
                out = row
            elif ftype == 1:  # Sub
                out = row - left
            elif ftype == 2:  # Up
                out = row - prev_r
            elif ftype == 3:  # Average
                avg = ((left.astype(_np.uint16) + prev_r) >> 1).astype(_np.uint8)
                out = row - avg
            else:  # Paeth
                prev_left = (
                    _np.concatenate((zrow[:ch], prev_r[:-ch]))
                    if stride > ch
                    else zrow
                )
                a = left.astype(_np.int16)
                b = prev_r.astype(_np.int16)
                c = prev_left.astype(_np.int16)
                p = a + b - c
                pa, pb, pc = _np.abs(p - a), _np.abs(p - b), _np.abs(p - c)
                pred = _np.where(
                    (pa <= pb) & (pa <= pc), a, _np.where(pb <= pc, b, c)
                ).astype(_np.uint8)
                out = row - pred
            raw += out.tobytes()
    else:  # pure-Python fallback (identical arithmetic)
        prev = bytes(stride)
        for y in range(height):
            row = pixels[y * stride : (y + 1) * stride]
            ftype = y % 5
            raw.append(ftype)
            if ftype == 0:
                raw += row
            elif ftype == 1:
                raw += bytes(
                    (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                    for i in range(stride)
                )
            elif ftype == 2:
                raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
            elif ftype == 3:
                raw += bytes(
                    (row[i] - (((row[i - ch] if i >= ch else 0) + prev[i]) >> 1))
                    & 0xFF
                    for i in range(stride)
                )
            else:
                raw += bytes(
                    (
                        row[i]
                        - _paeth(
                            row[i - ch] if i >= ch else 0,
                            prev[i],
                            prev[i - ch] if i >= ch else 0,
                        )
                    )
                    & 0xFF
                    for i in range(stride)
                )
            prev = row

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def parse_png_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, color_type) from the IHDR chunk only — the cheap
    metadata path (no inflate). Raises ``ValueError`` on non-PNG input."""
    if len(data) < 33 or data[:8] != _SIG:
        raise ValueError("not a PNG")
    length, tag = struct.unpack(">I4s", data[8:16])
    if tag != b"IHDR" or length != 13:
        raise ValueError("corrupt IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    if struct.unpack(">I", data[29:33])[0] != zlib.crc32(data[12:29]) & 0xFFFFFFFF:
        raise ValueError("IHDR CRC mismatch")
    return w, h, ctype


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Full decode: (width, height, color_type, raw 8-bit samples).

    Walks chunks with CRC verification, inflates the concatenated IDAT
    stream, and reverses the per-scanline filter. Supported subset per the
    module docstring; anything else raises ``ValueError``.
    """
    if len(data) < 8 or data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = ctype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos : pos + 8])
        if pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT")

    ch = _CHANNELS[ctype]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from None
    if len(raw) != (stride + 1) * h:
        raise ValueError("inflated size mismatch")

    # Defiltering is inherently sequential for Sub/Average/Paeth (each
    # reconstructed sample feeds its right neighbor), but None and Up
    # vectorize fully and Sub collapses to a per-channel uint8 cumsum
    # (numpy uint8 overflow IS the spec's mod-256); Average/Paeth keep the
    # scalar loop. numpy is optional — identical pure-Python fallback.
    try:
        import numpy as _np
    except ImportError:  # pragma: no cover - numpy is a baked-in dep
        _np = None

    out = bytearray(stride * h)
    prev = bytes(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        seg = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        if ftype == 0:
            line = bytearray(seg)
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256
            if _np is not None and stride >= _VEC_STRIDE:
                arr = _np.frombuffer(seg, dtype=_np.uint8).copy()
                arr = arr.reshape(-1, ch) if ch > 1 else arr.reshape(-1, 1)
                _np.cumsum(arr, axis=0, dtype=_np.uint8, out=arr)
                line = bytearray(arr.tobytes())
            else:
                line = bytearray(seg)
                for i in range(ch, stride):
                    line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            if _np is not None and stride >= _VEC_STRIDE:
                line = bytearray(
                    (
                        _np.frombuffer(seg, dtype=_np.uint8)
                        + _np.frombuffer(prev, dtype=_np.uint8)
                    ).tobytes()
                )
            else:
                line = bytearray(seg)
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            line = bytearray(seg)
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            line = bytearray(seg)
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return w, h, ctype, bytes(out)
