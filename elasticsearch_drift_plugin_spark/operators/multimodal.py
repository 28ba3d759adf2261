"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (north-star extension, BASELINE.json).

The full mandated surface: metadata extraction, decode, resize,
frame-sample, and feature-extract. This container has no third-party
image/audio codecs, so the DEFAULT decode/resize kernels are
deterministic fakes behind clearly-marked stubs — but a REAL decode path
exists and is golden-tested: ``functions/png_codec.py`` is a spec-complete
pure-Python PNG codec (stdlib zlib; CRC-verified chunks, all five scanline
filters), driving :func:`png_documents` → :func:`decode_pixel_stats` and
``resize_media(kernel='png')`` — genuine encode → inflate/defilter decode
→ nearest-neighbor thumbnail, oracle-paired as ``mm_png_roundtrip`` /
``mm_resize_png`` and pinned against an externally-generated PNG in
``tests/test_png_codec.py``. ``decode_media(kernel='pil'|'auto')``
additionally switches to Pillow on executors that have it, with zero plan
change (guarded import inside the kernel); video frame extraction stays a
stub (libav is heavier than a guard). ``extract_features`` is NOT stubbed
— byte-level statistical featurization runs as a real numpy kernel.

Scale notes: metadata extraction is pure Catalyst (no Python); the decode
path is ``mapInPandas`` with Arrow batches — per-partition streaming, no
per-row pickling, no driver involvement; a ``repartition`` before decode
spreads large blobs evenly.
"""

from __future__ import annotations

from collections.abc import Iterator
from struct import error as struct_error

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash60
from ..sources.flows import load_table, pin_result

FORMATS = ["png", "jpeg", "webp"]

DECODE_SCHEMA = "doc_id long, width long, height long, n_pixels long, format string"


def binary_documents(docs: DataFrame) -> DataFrame:
    """Model documents as multimodal rows: an opaque binary payload plus id.
    (With real data the payload would be image/audio bytes from source.)"""
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload"), "text")


def media_metadata(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, width, height, format): typed metadata extracted
    from the payload — byte length is real; dimensions/format are
    deterministic fakes derived from the content digest (stand-ins for a
    header parse, which a real codec would do in the same expression slot).
    """
    b = binary_documents(docs)
    h = md5_hash60(F.col("text"))
    fmt = (
        F.when(h % 3 == 0, F.lit("png"))
        .when(h % 3 == 1, F.lit("jpeg"))
        .otherwise(F.lit("webp"))
    )
    return b.select(
        "doc_id",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        (h % 640).alias("width"),
        (F.shiftright(h, 3) % 480).alias("height"),
        fmt.alias("format"),
    ).orderBy("doc_id")


METADATA_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       h % 640 AS width,
       (h >> 3) % 480 AS height,
       CASE WHEN h % 3 = 0 THEN 'png' WHEN h % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format
FROM (SELECT doc_id, text, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
      FROM documents)
ORDER BY doc_id
"""


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB — deterministic fake image decode. A real implementation would
    be e.g. ``PIL.Image.open(io.BytesIO(payload))``; that dependency is not
    in this container. The fake derives stable dimensions from content so
    tests exercise the full distributed plumbing with asserted outputs."""
    n = len(payload)
    return (n % 640 + 1, (n * 31) % 480 + 1, FORMATS[n % 3])


def decode_media(
    df: DataFrame, payload_col: str = "payload", kernel: str = "fake"
) -> DataFrame:
    """Distributed decode via mapInPandas: Arrow-batched, per-partition.

    ``kernel`` selects the per-blob decoder — the plan is identical in all
    modes (one function swap, zero plan change):

    - ``'fake'`` (default): the deterministic stub above — what the oracle
      gate pins, and the only mode exercisable in this codec-less container;
    - ``'pil'``: real image decode via Pillow on the executors
      (``PIL.Image.open``); undecodable blobs yield NULL dims/format.
      Raises a clear error if Pillow is missing;
    - ``'png'``: REAL header parse via the in-repo pure-Python PNG codec
      (IHDR + CRC check, no third-party deps); non-PNG blobs yield NULLs;
    - ``'auto'``: Pillow when importable on the executor, stub otherwise.

    The kernel closure is deliberately self-contained (nested fns pickle by
    value): referencing module-level helpers would make cloudpickle pickle
    them by reference and break on workers without this package on their
    PYTHONPATH (e.g. a driver script running from another directory).
    """
    if kernel not in ("fake", "pil", "png", "auto"):
        raise ValueError(
            f"kernel must be 'fake', 'pil', 'png' or 'auto', got {kernel!r}"
        )

    formats = list(FORMATS)
    mode = kernel

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import importlib
        import io

        image_mod = None
        if mode in ("pil", "auto"):
            try:
                image_mod = importlib.import_module("PIL.Image")
            except ImportError:
                if mode == "pil":
                    raise ImportError(
                        "decode_media(kernel='pil') requires Pillow on the "
                        "executors; install Pillow or use kernel='auto'/'fake'"
                    ) from None

        def decode(payload: bytes):
            if mode == "png":
                from elasticsearch_drift_plugin_spark.functions.png_codec import (
                    parse_png_header,
                )

                try:
                    w, h, _ctype = parse_png_header(payload)
                    return (w, h, "png")
                except ValueError:
                    return (None, None, None)  # non-PNG blob -> NULLs
            if image_mod is not None:
                try:
                    with image_mod.open(io.BytesIO(payload)) as im:
                        return (im.width, im.height, (im.format or "").lower() or None)
                except Exception:
                    return (None, None, None)  # undecodable blob -> NULLs
            # STUB — mirrors _fake_decode above; inlined for picklability.
            n = len(payload)
            return (n % 640 + 1, (n * 31) % 480 + 1, formats[n % 3])

        for pdf in batches:
            decoded = [decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_pixels": [
                        None if d[0] is None else d[0] * d[1] for d in decoded
                    ],
                    "format": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(fn, DECODE_SCHEMA)


# The fake decode is a pure function of byte length, so the full distributed
# decode path (binary cast → Arrow batches → mapInPandas kernel → typed
# output) gets a real value-level oracle, not just a rows-only check.
DECODE_SQL = """
SELECT doc_id,
       n % 640 + 1 AS width,
       (n * 31) % 480 + 1 AS height,
       (n % 640 + 1) * ((n * 31) % 480 + 1) AS n_pixels,
       CASE WHEN n % 3 = 0 THEN 'png' WHEN n % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format
FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents)
ORDER BY doc_id
"""


RESIZE_SCHEMA = (
    "doc_id long, width long, height long, n_bytes_out long, payload_out binary"
)


def resize_media(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    payload_col: str = "payload",
    kernel: str = "fake",
) -> DataFrame:
    """Distributed resize via mapInPandas (Arrow-batched, per-partition).

    ``'fake'`` (default, codec-less container): dimensions come from the
    same deterministic fake decode as :func:`decode_media`; the output size
    is an aspect-preserving integer fit into ``(target_w, target_h)``
    (downscale only — smaller images pass through), and the "resized"
    payload is the input truncated proportionally to the area ratio, so
    byte volume shrinks the way a real thumbnail pipeline's would. All
    output columns are exact integer functions of the input length —
    value-level oracle-able.

    ``'png'`` is a REAL resize: full decode via the in-repo pure-Python PNG
    codec (``functions/png_codec.py``), nearest-neighbor resample to the
    same aspect-preserving integer fit, re-encode as PNG — an actual
    thumbnail pipeline with zero external dependencies. (``'pil'`` would be
    ``Image.open(...).thumbnail((w, h))`` in the same kernel slot — zero
    plan change — but Pillow is not in this container.)
    """
    if kernel not in ("fake", "png"):
        raise ValueError("kernel must be 'fake' or 'png'")
    tw, th = int(target_w), int(target_h)
    if tw < 1 or th < 1:
        raise ValueError("target dimensions must be >= 1")

    if kernel == "png":

        def fn_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from elasticsearch_drift_plugin_spark.functions.png_codec import (
                _CHANNELS,
                decode_png,
                encode_png,
            )

            for pdf in batches:
                out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                       "n_bytes_out": [], "payload_out": []}
                for p in pdf[payload_col]:
                    try:
                        w, h, ctype, px = decode_png(bytes(p))
                    except ValueError:
                        out["width"].append(None)
                        out["height"].append(None)
                        out["n_bytes_out"].append(None)
                        out["payload_out"].append(None)
                        continue
                    ch = _CHANNELS[ctype]
                    if w <= tw and h <= th:
                        ow, oh = w, h
                    elif w * th <= h * tw:  # height is the limiting side
                        oh, ow = th, max(1, (w * th) // h)
                    else:
                        ow, oh = tw, max(1, (h * tw) // w)
                    # nearest-neighbor resample (exact integer source index)
                    res = bytearray(ow * oh * ch)
                    for oy in range(oh):
                        sy = (oy * h) // oh
                        for ox in range(ow):
                            sx = (ox * w) // ow
                            s = (sy * w + sx) * ch
                            d = (oy * ow + ox) * ch
                            res[d : d + ch] = px[s : s + ch]
                    enc = encode_png(ow, oh, bytes(res), ctype)
                    out["width"].append(ow)
                    out["height"].append(oh)
                    out["n_bytes_out"].append(len(enc))
                    out["payload_out"].append(enc)
                yield pd.DataFrame(out)

        return df.mapInPandas(fn_png, RESIZE_SCHEMA)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                   "n_bytes_out": [], "payload_out": []}
            for p in pdf[payload_col]:
                b = bytes(p)
                n = len(b)
                w, h = n % 640 + 1, (n * 31) % 480 + 1  # fake decode dims
                if w <= tw and h <= th:
                    ow, oh = w, h
                elif w * th <= h * tw:  # height is the limiting side
                    oh, ow = th, max(1, (w * th) // h)
                else:
                    ow, oh = tw, max(1, (h * tw) // w)
                k = max(1, (n * ow * oh) // (w * h)) if n else 0
                out["width"].append(ow)
                out["height"].append(oh)
                out["n_bytes_out"].append(k)
                out["payload_out"].append(b[:k])
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, RESIZE_SCHEMA)


def resize_sql(target_w: int = 224, target_h: int = 224) -> str:
    """DuckDB twin of the fake-resize integer math (dims + byte count; the
    truncated payload itself is excluded — binary stringification is not
    part of the driver's hash contract). The ``'png'`` kernel of
    :func:`resize_media` shares the same integer fit, so this oracle's
    width/height columns also pin that path (see :func:`png_resize_sql`)."""
    tw, th = int(target_w), int(target_h)
    return f"""
SELECT doc_id, width, height,
       CASE WHEN n = 0 THEN 0
            ELSE greatest(1, (n * width * height) // (w * h)) END AS n_bytes_out
FROM (
  SELECT doc_id, n, w, h,
         CASE WHEN w <= {tw} AND h <= {th} THEN w
              WHEN w * {th} <= h * {tw} THEN greatest(1, (w * {th}) // h)
              ELSE {tw} END AS width,
         CASE WHEN w <= {tw} AND h <= {th} THEN h
              WHEN w * {th} <= h * {tw} THEN {th}
              ELSE greatest(1, (h * {tw}) // w) END AS height
  FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
               CAST(octet_length(encode(text)) AS BIGINT) % 640 + 1 AS w,
               (CAST(octet_length(encode(text)) AS BIGINT) * 31) % 480 + 1 AS h
        FROM documents)
)
ORDER BY doc_id
"""


FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, mean_q long, var_q long, min_b long, max_b long"
)


def extract_features(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Per-blob byte-statistics featurization — REAL (not stubbed): numpy
    over Arrow batches computes each payload's byte-value distribution
    moments, the standard cheap featurization for opaque binary columns
    (format sniffing, corruption screens, entropy-adjacent filters).

    Exact integer outputs so both engines agree bit-for-bit: ``mean_q`` =
    ``sum*1e6 // n`` (1e-6 quanta), ``var_q`` = population variance via
    ``(n*Σb² - (Σb)²) // n²`` — int64-safe for any payload under ~50 GB.
    """
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {"doc_id": [], "n_bytes": [], "mean_q": [], "var_q": [],
                "min_b": [], "max_b": []}
        for pdf in batches:
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                n = int(b.size)
                rows["doc_id"].append(doc_id)
                rows["n_bytes"].append(n)
                if n == 0:
                    rows["mean_q"].append(None)
                    rows["var_q"].append(None)
                    rows["min_b"].append(None)
                    rows["max_b"].append(None)
                    continue
                s = int(b.sum(dtype=np.int64))
                sq = int((b.astype(np.int64) ** 2).sum())
                rows["mean_q"].append(s * 1_000_000 // n)
                rows["var_q"].append((n * sq - s * s) // (n * n))
                rows["min_b"].append(int(b.min()))
                rows["max_b"].append(int(b.max()))
        yield pd.DataFrame(rows)

    return df.mapInPandas(fn, FEATURES_SCHEMA)


# Byte-based oracle: the kernel reads the UTF-8 payload bytes, so the twin
# must too — hex() the blob and decode each byte from its two hex digits
# (ord('A')=65 ⇒ −55; ord('0')=48 ⇒ −48). A char-explode (ord(substring))
# only agrees on pure-ASCII corpora and would diverge silently if the driver
# regenerates documents with real multi-byte text (the corpus has lang='zh'
# rows), so the oracle is defined over bytes for ANY content.
FEATURES_SQL = """
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS hs,
         octet_length(encode(text)) AS n
  FROM documents
),
ch AS (
  SELECT doc_id,
         (CASE WHEN c1 >= 65 THEN c1 - 55 ELSE c1 - 48 END) * 16 +
         (CASE WHEN c2 >= 65 THEN c2 - 55 ELSE c2 - 48 END) AS b
  FROM (SELECT doc_id,
               ord(substring(hs, 2 * i - 1, 1)) AS c1,
               ord(substring(hs, 2 * i, 1)) AS c2
        FROM (SELECT doc_id, hs, unnest(generate_series(1, n)) AS i FROM hx))
),
agg AS (
  SELECT doc_id, COUNT(*) AS n, SUM(b) AS s, SUM(b * b) AS sq,
         MIN(b) AS min_b, MAX(b) AS max_b
  FROM ch GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bytes,
       CAST(a.s * 1000000 // a.n AS BIGINT) AS mean_q,
       CAST((a.n * a.sq - a.s * a.s) // (a.n * a.n) AS BIGINT) AS var_q,
       CAST(a.min_b AS BIGINT) AS min_b,
       CAST(a.max_b AS BIGINT) AS max_b
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# REAL codec path: pure-Python PNG (functions/png_codec.py — stdlib zlib)
# --------------------------------------------------------------------------
# The fake kernels above prove the distributed plumbing; these prove actual
# decoding: payloads are genuine PNG files (chunked, CRC'd, DEFLATE'd,
# scanline-filtered) and the decode kernel really inflates + defilters them.
# Synthesized images are constant-fill with md5-derived dims, so every
# output column still has a closed form the DuckDB oracle can compute —
# a broken codec (bad filter math, bad inflate, bad header) breaks the
# value hash.

PNG_MAX_DIM = 48  # synthetic dims in [1, 48] — bounded work per doc


def png_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, fill, payload): one REAL grayscale PNG per document —
    dimensions and constant fill byte derived from the text's md5 (same
    60-bit hash discipline as the rest of the engine). Arrow-batched
    ``mapInPandas`` encode; payloads are spec-complete PNGs (decodable by
    any external viewer), rotating through all five scanline filters."""
    from ..sources.flows import widen_narrow_scan

    h = md5_hash60(F.col("text"))
    # CPU-heavy Python kernels downstream (encode + full decode): widen a
    # single-split scan to cluster parallelism first, or the whole PNG
    # pipeline runs on one core (no-op when the source has real splits)
    base = widen_narrow_scan(docs).select(
        "doc_id",
        (h % PNG_MAX_DIM + 1).alias("_w"),
        (F.shiftright(h, 6) % PNG_MAX_DIM + 1).alias("_h"),
        (F.shiftright(h, 12) % 256).alias("fill"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from elasticsearch_drift_plugin_spark.functions.png_codec import encode_png

        for pdf in batches:
            payloads = [
                encode_png(int(w), int(ht), bytes([int(c)]) * (int(w) * int(ht)), 0)
                for w, ht, c in zip(pdf["_w"], pdf["_h"], pdf["fill"])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fill": pdf["fill"], "payload": payloads}
            )

    return base.mapInPandas(fn, "doc_id long, fill long, payload binary")


PIXEL_STATS_SCHEMA = (
    "doc_id long, width long, height long, n_pixels long, mean_q long,"
    " min_b long, max_b long"
)


def decode_pixel_stats(
    df: DataFrame, payload_col: str = "payload", kernel: str = "png"
) -> DataFrame:
    """(doc_id, width, height, n_pixels, mean_q, min_b, max_b): FULL real
    decode — inflate + defilter every scanline — then exact integer pixel
    statistics (``mean_q`` = sum·10⁶ // n, same quantization as
    :func:`extract_features`). Undecodable/non-PNG blobs yield NULLs
    (corruption screen posture). Arrow-batched, map-only, no shuffle.

    ``kernel='png'`` (default) is the in-repo-real path (the pure-Python
    spec-complete codec — zero third-party deps, the mode the oracle gate
    pins). ``kernel='pil'`` decodes ANY Pillow-supported format (JPEG,
    WebP, …) on the executors, converting to 8-bit grayscale (Pillow mode
    ``"L"``) before the identical stats — same plan, one function swap;
    raises a clear error if Pillow is missing (pytest golden is
    skip-if-unavailable since this container ships no Pillow)."""
    if kernel not in ("png", "pil"):
        raise ValueError(f"kernel must be 'png' or 'pil', got {kernel!r}")
    mode = kernel

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        if mode == "pil":
            try:
                from PIL import Image  # noqa: N811
            except ImportError:
                raise ImportError(
                    "decode_pixel_stats(kernel='pil') requires Pillow on the "
                    "executors; use the default kernel='png' (in-repo codec)"
                ) from None

            def decode(p: bytes):
                try:
                    with Image.open(io.BytesIO(p)) as im:
                        g = im.convert("L")
                        return g.width, g.height, list(g.getdata())
                except Exception:
                    raise ValueError("undecodable") from None
        else:
            from elasticsearch_drift_plugin_spark.functions.png_codec import (
                decode_png,
            )

            def decode(p: bytes):
                w, h, _ctype, px = decode_png(p)
                return w, h, px

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_pixels", "mean_q", "min_b", "max_b"
            )}
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    w, h, px = decode(bytes(p))
                    n = len(px)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_pixels"].append(w * h)
                    rows["mean_q"].append(sum(px) * 1_000_000 // n if n else None)
                    rows["min_b"].append(min(px) if n else None)
                    rows["max_b"].append(max(px) if n else None)
                except ValueError:
                    for k in ("width", "height", "n_pixels", "mean_q", "min_b", "max_b"):
                        rows[k].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, PIXEL_STATS_SCHEMA)


# Closed-form oracle for png_documents → decode_pixel_stats: synthetic
# images are constant-fill, so the full encode→decode round trip must
# reproduce exactly these md5-derived values.
PNG_ROUNDTRIP_SQL = f"""
WITH h AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS hv
           FROM documents)
SELECT doc_id,
       CAST(hv % {PNG_MAX_DIM} + 1 AS BIGINT) AS width,
       CAST((hv >> 6) % {PNG_MAX_DIM} + 1 AS BIGINT) AS height,
       CAST((hv % {PNG_MAX_DIM} + 1) * ((hv >> 6) % {PNG_MAX_DIM} + 1) AS BIGINT)
         AS n_pixels,
       CAST(((hv >> 12) % 256) * 1000000 AS BIGINT) AS mean_q,
       CAST((hv >> 12) % 256 AS BIGINT) AS min_b,
       CAST((hv >> 12) % 256 AS BIGINT) AS max_b
FROM h ORDER BY doc_id
"""


def png_resize_sql(tw: int, th: int) -> str:
    """Oracle for png_documents → resize_media(kernel='png', tw, th) →
    decode_pixel_stats: the aspect-preserving integer fit on md5-derived
    dims; nearest-neighbor resampling of a constant image preserves the
    fill byte exactly."""
    return f"""
WITH h AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS hv
           FROM documents),
dims AS (SELECT doc_id,
                hv % {PNG_MAX_DIM} + 1 AS w,
                (hv >> 6) % {PNG_MAX_DIM} + 1 AS h2,
                (hv >> 12) % 256 AS c
         FROM h),
fit AS (SELECT doc_id, c,
               CASE WHEN w <= {tw} AND h2 <= {th} THEN w
                    WHEN w * {th} <= h2 * {tw} THEN greatest(1, (w * {th}) // h2)
                    ELSE {tw} END AS width,
               CASE WHEN w <= {tw} AND h2 <= {th} THEN h2
                    WHEN w * {th} <= h2 * {tw} THEN {th}
                    ELSE greatest(1, (h2 * {tw}) // w) END AS height
        FROM dims)
SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       CAST(width * height AS BIGINT) AS n_pixels,
       CAST(c * 1000000 AS BIGINT) AS mean_q
FROM fit ORDER BY doc_id
"""


def png_video_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, n_frames, payload): a REAL multi-frame media payload — a
    concatenation of spec-complete PNG frames (PNG streams self-delimit at
    IEND, so back-to-back frames are a valid, externally-splittable
    container; the moral equivalent of MJPEG). Frame count and per-frame
    constant fill derive from the doc's md5 (frame i fill = (base + 7·i)
    mod 256), so frame extraction has a closed-form oracle."""
    from ..sources.flows import widen_narrow_scan

    h = md5_hash60(F.col("text"))
    base = widen_narrow_scan(docs).select(
        "doc_id",
        (h % PNG_MAX_DIM + 1).alias("_w"),
        (F.shiftright(h, 6) % PNG_MAX_DIM + 1).alias("_h"),
        (F.shiftright(h, 12) % 256).alias("_fill"),
        (F.shiftright(h, 20) % 4 + 1).alias("n_frames"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from elasticsearch_drift_plugin_spark.functions.png_codec import encode_png

        for pdf in batches:
            payloads = []
            for w, ht, c, n in zip(
                pdf["_w"], pdf["_h"], pdf["_fill"], pdf["n_frames"]
            ):
                w, ht, c, n = int(w), int(ht), int(c), int(n)
                payloads.append(
                    b"".join(
                        encode_png(w, ht, bytes([(c + 7 * i) % 256]) * (w * ht), 0)
                        for i in range(n)
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pdf["n_frames"],
                    "payload": payloads,
                }
            )

    return base.mapInPandas(fn, "doc_id long, n_frames long, payload binary")


def split_png_frames(payload: bytes) -> list[bytes]:
    """REAL container parsing: walk the chunk structure of each
    concatenated PNG (signature → chunks → IEND) and return the individual
    frame byte strings. Raises ``ValueError`` on malformed framing."""
    import struct

    sig = b"\x89PNG\r\n\x1a\n"
    frames = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 8] != sig:
            raise ValueError(f"bad frame signature at offset {pos}")
        scan = pos + 8
        while True:
            if scan + 8 > n:
                raise ValueError("truncated frame")
            (length,) = struct.unpack(">I", payload[scan : scan + 4])
            tag = payload[scan + 4 : scan + 8]
            scan += 12 + length
            if tag == b"IEND":
                break
        frames.append(payload[pos:scan])
        pos = scan
    return frames


def frame_sample_png(
    df: DataFrame, every_k: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, frame_idx, width, height, mean_q): REAL frame sampling —
    split the concatenated-PNG container by chunk structure, keep every
    ``k``-th frame, FULLY decode the kept frames (inflate + defilter), and
    report per-frame dims + exact mean. This replaces the byte-offset
    stub (:func:`frame_sample`) with an honest decode path: skipped
    frames are never inflated, which is the actual economics of frame
    sampling (container seeks are cheap, decodes are not)."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    k = int(every_k)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from elasticsearch_drift_plugin_spark.functions.png_codec import decode_png

        for pdf in batches:
            rows = {c: [] for c in ("doc_id", "frame_idx", "width", "height", "mean_q")}
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    frames = split_png_frames(bytes(p))
                except ValueError:
                    continue  # malformed container: drop doc (corruption screen)
                for i in range(0, len(frames), k):
                    try:
                        w, h, _ct, px = decode_png(frames[i])
                    except ValueError:
                        continue
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_q"].append(
                        sum(px) * 1_000_000 // len(px) if px else None
                    )
            yield pd.DataFrame(rows)

    out = df.mapInPandas(
        fn, "doc_id long, frame_idx long, width long, height long, mean_q long"
    )
    return pin_result(out).orderBy("doc_id", "frame_idx")


def png_frames_sql(every_k: int = 2) -> str:
    """Closed-form oracle for png_video_documents → frame_sample_png."""
    k = int(every_k)
    return f"""
WITH h AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS hv
           FROM documents),
d AS (SELECT doc_id,
             hv % {PNG_MAX_DIM} + 1 AS w,
             (hv >> 6) % {PNG_MAX_DIM} + 1 AS h2,
             (hv >> 12) % 256 AS c,
             (hv >> 20) % 4 + 1 AS nf
      FROM h),
fr AS (SELECT doc_id, w, h2, c,
              unnest(generate_series(0, CAST(nf - 1 AS BIGINT), {k})) AS i
       FROM d)
SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
       CAST(w AS BIGINT) AS width, CAST(h2 AS BIGINT) AS height,
       CAST(((c + 7 * i) % 256) * 1000000 AS BIGINT) AS mean_q
FROM fr ORDER BY doc_id, frame_idx
"""


def frame_sample(df: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """'Video' frame sampling stub: one output row per sampled frame index.
    Real frame extraction (ffmpeg/libav) is not available in-container; the
    row-multiplying plan shape (posexplode over a computed frame count) is
    the real part."""
    n_frames = F.greatest(
        (F.length(F.col("payload")) / F.lit(every_n_bytes)).cast("long"), F.lit(1)
    )
    return df.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "frame_offset"),
    ).select("doc_id", "frame_idx")


FRAMES_SQL = """
SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS frame_idx
FROM (SELECT doc_id,
             greatest(CAST(FLOOR(octet_length(encode(text)) / 4096.0) AS BIGINT), 1)
               AS n_frames
      FROM documents)
ORDER BY doc_id, frame_idx
"""


PHASH_CELLS = 60  # 60-bit hash: stays positive in int64 (md5_hash60 discipline)


def perceptual_hash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, phash): average-hash (aHash) over the opaque binary payload
    — the classic perceptual near-dup signature, codec-free: the payload
    bytes ARE the pixel domain (a real deployment decodes to grayscale
    first — ``decode_media(kernel='pil')`` slots in front with zero plan
    change). The bytes partition into ``PHASH_CELLS`` contiguous cells;
    bit c is set iff ``CELLS·Σcell_c > Σtotal`` (cell mean above global
    mean, compared by exact integer cross-multiplication — no division).
    Arrow-batched numpy kernel, map-only; two payloads differing by small
    local edits agree on most bits, so Hamming distance ranks near-dups.
    """
    cells = PHASH_CELLS

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(payload: bytes) -> int:
            b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
            n = b.size
            if n == 0:
                return 0
            idx = (np.arange(n, dtype=np.int64) * cells) // n
            sums = np.zeros(cells, dtype=np.int64)
            np.add.at(sums, idx, b)
            total = int(b.sum())
            h = 0
            for c in range(cells):
                if cells * int(sums[c]) > total:
                    h |= 1 << c
            return h

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [one(p) for p in pdf[payload_col]],
                }
            )

    return df.mapInPandas(fn, "doc_id long, phash long")


def phash_dedup(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, phash, canonical, dup_count): exact perceptual-duplicate
    groups — docs sharing a phash collapse to the min-id survivor. One
    signature pass + one window over (phash); for NEAR-dups (Hamming ≤ t)
    band the 60-bit hash into 4×15-bit keys and join on band equality —
    the MinHash-LSH shape with the phash as the signature."""
    from pyspark.sql import Window

    sig = perceptual_hash(df, payload_col)
    w = Window.partitionBy("phash")
    return (
        sig.select(
            "doc_id",
            "phash",
            F.min("doc_id").over(w).alias("canonical"),
            F.count(F.lit(1)).over(w).alias("dup_count"),
        )
        .orderBy("doc_id")
    )


PHASH_DEDUP_SQL = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS hs,
         octet_length(encode(text)) AS n
  FROM documents
),
ch AS (
  SELECT doc_id, i, n,
         (CASE WHEN c1 >= 65 THEN c1 - 55 ELSE c1 - 48 END) * 16 +
         (CASE WHEN c2 >= 65 THEN c2 - 55 ELSE c2 - 48 END) AS b
  FROM (SELECT doc_id, n,
               ord(substring(hs, 2 * i - 1, 1)) AS c1,
               ord(substring(hs, 2 * i, 1)) AS c2, i
        FROM (SELECT doc_id, hs, n, unnest(generate_series(1, n)) AS i FROM hx))
),
cellsums AS (
  SELECT doc_id, ((i - 1) * {PHASH_CELLS}) // n AS cell, SUM(b) AS cs
  FROM ch GROUP BY doc_id, ((i - 1) * {PHASH_CELLS}) // n
),
tot AS (SELECT doc_id, SUM(b) AS total FROM ch GROUP BY doc_id),
hashes AS (
  SELECT c.doc_id,
         CAST(SUM(CASE WHEN {PHASH_CELLS} * c.cs > t.total
                       -- integer shift, NOT `**` (DuckDB pow returns DOUBLE
                       -- and rounds bits 53+ of the packed hash)
                       THEN CAST(1 AS BIGINT) << CAST(c.cell AS INT)
                       ELSE 0 END) AS BIGINT) AS phash
  FROM cellsums c JOIN tot t USING (doc_id) GROUP BY c.doc_id
),
full_h AS (
  SELECT d.doc_id, COALESCE(h.phash, 0) AS phash
  FROM documents d LEFT JOIN hashes h USING (doc_id)
)
SELECT doc_id, phash,
       MIN(doc_id) OVER (PARTITION BY phash) AS canonical,
       COUNT(*) OVER (PARTITION BY phash) AS dup_count
FROM full_h ORDER BY doc_id
"""


def png_scene_video_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, n_frames, payload): the SHOT-STRUCTURED variant of
    :func:`png_video_documents` — frames group into scenes of md5-derived
    length (1–3 frames), constant fill WITHIN a scene and a +7 (mod 256)
    step BETWEEN scenes, so shot-boundary detection has a closed-form
    oracle while every frame is still a genuine PNG."""
    from ..sources.flows import widen_narrow_scan

    h = md5_hash60(F.col("text"))
    base = widen_narrow_scan(docs).select(
        "doc_id",
        (h % PNG_MAX_DIM + 1).alias("_w"),
        (F.shiftright(h, 6) % PNG_MAX_DIM + 1).alias("_h"),
        (F.shiftright(h, 12) % 256).alias("_fill"),
        (F.shiftright(h, 20) % 6 + 2).alias("n_frames"),
        (F.shiftright(h, 23) % 3 + 1).alias("_slen"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from elasticsearch_drift_plugin_spark.functions.png_codec import encode_png

        for pdf in batches:
            payloads = []
            for w, ht, c, n, sl in zip(
                pdf["_w"], pdf["_h"], pdf["_fill"], pdf["n_frames"], pdf["_slen"]
            ):
                w, ht, c, n, sl = int(w), int(ht), int(c), int(n), int(sl)
                payloads.append(
                    b"".join(
                        encode_png(
                            w, ht,
                            bytes([(c + 7 * (i // sl)) % 256]) * (w * ht), 0,
                        )
                        for i in range(n)
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pdf["n_frames"],
                    "payload": payloads,
                }
            )

    return base.mapInPandas(fn, "doc_id long, n_frames long, payload binary")


def scene_changes(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, n_frames, n_scenes, diff_total): shot-boundary detection —
    split the container, FULLY decode every frame, and compare consecutive
    frames by exact integer mean-absolute-pixel-difference (a boundary is
    any nonzero difference; ``diff_total`` sums the boundary magnitudes,
    the evidence a thresholding detector would rank). This is the video
    twin of the audio frame features: temporal ANALYSIS on top of the
    container the sampling path already parses. Malformed containers drop
    (corruption screen); consecutive frames with different dims raise —
    that is a broken container, not a scene cut. Arrow-batched, map-only."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from elasticsearch_drift_plugin_spark.functions.png_codec import decode_png

        for pdf in batches:
            out = []
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    frames = [decode_png(f) for f in split_png_frames(bytes(p))]
                except ValueError:
                    continue
                n_scenes, diff_total = 1, 0
                for (w0, h0, _c0, a), (w1, h1, _c1, b) in zip(frames, frames[1:]):
                    if (w0, h0) != (w1, h1):
                        raise ValueError(
                            "scene_changes: frame dims changed mid-container"
                        )
                    sad = sum(abs(x - y) for x, y in zip(a, b))
                    mad = sad // len(a)  # exact for the constant-fill space
                    if sad:
                        n_scenes += 1
                        diff_total += mad
                out.append((int(doc_id), len(frames), n_scenes, diff_total))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_frames", "n_scenes", "diff_total"]
            )

    out = df.mapInPandas(
        fn, "doc_id long, n_frames long, n_scenes long, diff_total long"
    )
    return pin_result(out).orderBy("doc_id")


# closed forms: scenes = ceil(n_frames / slen); each boundary k (at frame
# i = k·slen) has fill step |(base + 7k) mod 256 - (base + 7(k-1)) mod
# 256| — computed EXACTLY in SQL from the same md5-derived params, wrap
# included.
SCENE_CHANGES_SQL = """
WITH h AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS hv
           FROM documents),
p AS (SELECT doc_id,
             (hv >> 12) % 256 AS base,
             (hv >> 20) % 6 + 2 AS n,
             (hv >> 23) % 3 + 1 AS sl
      FROM h),
bounds AS (
  SELECT doc_id, n, sl, unnest(range(1, (n + sl - 1) // sl)) AS k FROM p
),
diffs AS (
  SELECT doc_id,
         abs((base + 7 * k) % 256 - (base + 7 * (k - 1)) % 256) AS d
  FROM bounds JOIN p USING (doc_id)
)
SELECT p.doc_id,
       CAST(p.n AS BIGINT) AS n_frames,
       CAST((p.n + p.sl - 1) // p.sl AS BIGINT) AS n_scenes,
       CAST(COALESCE(SUM(d.d), 0) AS BIGINT) AS diff_total
FROM p LEFT JOIN diffs d ON d.doc_id = p.doc_id
GROUP BY p.doc_id, p.n, p.sl ORDER BY p.doc_id
"""


# --------------------------------------------------------------------------
# REAL audio path: pure-stdlib RIFF/WAVE PCM16 (functions/wav_codec.py)
# --------------------------------------------------------------------------
# Same posture as the PNG pair: payloads are genuine playable .wav files
# (RIFF chunks, fmt header, PCM16 data) and the decode kernel really walks
# the container. Synthesized signals are SQUARE WAVES with md5-derived
# half-period/amplitude/length, so every feature column has an exact
# integer closed form the DuckDB oracle computes — a broken header parse,
# byte order, or feature kernel breaks the value hash.

WAV_RATE = 8000  # canonical telephony rate; fixed so duration_ms is exact


def wav_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): one REAL mono PCM16 WAV per document — square
    wave with half-period 4–35 samples, amplitude 500–1999, length
    400–1999 samples, all md5-derived (the engine's 60-bit hash
    discipline). Arrow-batched encode; payloads play in any player."""
    from ..sources.flows import widen_narrow_scan

    h = md5_hash60(F.col("text"))
    base = widen_narrow_scan(docs).select(
        "doc_id",
        (h % 32 + 4).alias("_p2"),
        (F.shiftright(h, 6) % 1500 + 500).alias("_amp"),
        (F.shiftright(h, 12) % 1600 + 400).alias("_n"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from elasticsearch_drift_plugin_spark.functions.wav_codec import (
            encode_wav,
        )

        for pdf in batches:
            payloads = []
            for p2, amp, n in zip(pdf["_p2"], pdf["_amp"], pdf["_n"]):
                p2, amp, n = int(p2), int(amp), int(n)
                i = np.arange(n)
                x = np.where((i // p2) % 2 == 0, amp, -amp).astype("<i2")
                payloads.append(encode_wav(WAV_RATE, x))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return base.mapInPandas(fn, "doc_id long, payload binary")


AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, duration_ms long,"
    " mean_sq long, zero_crossings long"
)


def decode_audio_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, sample_rate, n_samples, duration_ms, mean_sq,
    zero_crossings): REAL WAV decode (RIFF chunk walk, header validation)
    then exact integer signal features — ``duration_ms`` =
    n·1000 div rate, ``mean_sq`` = Σx² div n (the energy feature, exact
    in int64), ``zero_crossings`` = sign flips (the classic cheap
    pitch/voicing proxy). Undecodable payloads yield NULLs (corruption
    screen posture, like the PNG decoder). Arrow-batched, map-only."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from elasticsearch_drift_plugin_spark.functions.wav_codec import (
            decode_wav,
        )

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    rate, x = decode_wav(bytes(payload))
                    xl = x.astype(np.int64)
                    n = len(xl)
                    out.append((
                        int(doc_id), rate, n,
                        n * 1000 // rate,
                        int((xl * xl).sum()) // n if n else None,
                        int(((xl[1:] * xl[:-1]) < 0).sum()) if n else 0,
                    ))
                except (ValueError, struct_error):
                    out.append((int(doc_id), None, None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "duration_ms",
                    "mean_sq", "zero_crossings",
                ],
            )

    return df.mapInPandas(fn, AUDIO_STATS_SCHEMA)


def audio_frame_features(
    df: DataFrame, frame: int = 400, payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, frame_idx, n, mean_sq, zero_crossings): the temporal
    decomposition of :func:`decode_audio_stats` — REAL WAV decode, then
    per fixed window of ``frame`` samples (50 ms at 8 kHz) the same exact
    integer features. This is the audio analogue of the video path's
    frame sampling: the unit a VAD / segment-level quality filter
    consumes. The final short window keeps its true length (never padded
    — padding would corrupt the energy). Corrupt payloads contribute no
    frames (the corruption screen runs upstream on the doc-level stats).
    Arrow-batched, map-only; output is frames-sized, bounded by
    n_samples/frame per doc."""
    w = int(frame)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from elasticsearch_drift_plugin_spark.functions.wav_codec import (
            decode_wav,
        )

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    _, x = decode_wav(bytes(payload))
                except (ValueError, struct_error):
                    continue
                xl = x.astype(np.int64)
                n = len(xl)
                for f in range((n + w - 1) // w):
                    seg = xl[f * w : (f + 1) * w]
                    m = len(seg)
                    zc = int(((seg[1:] * seg[:-1]) < 0).sum())
                    # crossings at window seams belong to the LEFT pair's
                    # window? No — pairs span (i-1, i); a window only sees
                    # pairs fully inside it, so seam pairs are counted by
                    # neither (the closed form mirrors this exactly)
                    out.append((
                        int(doc_id), f, m,
                        int((seg * seg).sum()) // m,
                        zc,
                    ))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "n", "mean_sq",
                         "zero_crossings"],
            )

    out = df.mapInPandas(
        fn,
        "doc_id long, frame_idx long, n long, mean_sq long,"
        " zero_crossings long",
    )
    return pin_result(out).orderBy("doc_id", "frame_idx")


def audio_frames_sql(frame: int = 400) -> str:
    w = int(frame)
    return f"""
WITH h AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS hv
           FROM documents),
p AS (SELECT doc_id,
             hv % 32 + 4 AS p2,
             (hv >> 6) % 1500 + 500 AS amp,
             (hv >> 12) % 1600 + 400 AS n
      FROM h),
frames AS (
  SELECT doc_id, p2, amp, n, unnest(range(0, (n + {w} - 1) // {w})) AS f
  FROM p
)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(least((f + 1) * {w}, n) - f * {w} AS BIGINT) AS n,
       CAST(amp * amp AS BIGINT) AS mean_sq,
       -- crossings between in-window consecutive pairs (i-1, i), i.e.
       -- i in [f*w + 1, end): count of half-period boundaries there
       CAST((least((f + 1) * {w}, n) - 1) // p2 - (f * {w}) // p2 AS BIGINT)
         AS zero_crossings
FROM frames ORDER BY doc_id, frame_idx
"""


# closed forms: a ±amp square wave has Σx² = n·amp² exactly (mean_sq =
# amp²) and flips sign exactly at the half-period boundaries — crossings
# = floor((n-1) / p2); samples are never zero so the < 0 product test is
# exact.
AUDIO_STATS_SQL = f"""
WITH h AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS hv
           FROM documents),
p AS (SELECT doc_id,
             hv % 32 + 4 AS p2,
             (hv >> 6) % 1500 + 500 AS amp,
             (hv >> 12) % 1600 + 400 AS n
      FROM h)
SELECT doc_id,
       CAST({WAV_RATE} AS BIGINT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // {WAV_RATE} AS BIGINT) AS duration_ms,
       CAST(amp * amp AS BIGINT) AS mean_sq,
       CAST((n - 1) // p2 AS BIGINT) AS zero_crossings
FROM p ORDER BY doc_id
"""


def queries() -> dict:
    return {
        "mm_metadata": lambda s, d: media_metadata(load_table(s, d, "documents")),
        "mm_decode": lambda s, d: pin_result(decode_media(
            binary_documents(load_table(s, d, "documents"))
        )).orderBy("doc_id"),
        "mm_frames": lambda s, d: pin_result(frame_sample(
            binary_documents(load_table(s, d, "documents"))
        )).orderBy("doc_id", "frame_idx"),
        "mm_resize": lambda s, d: pin_result(resize_media(
            binary_documents(load_table(s, d, "documents"))
        ).select("doc_id", "width", "height", "n_bytes_out")).orderBy("doc_id"),
        "mm_features": lambda s, d: pin_result(extract_features(
            binary_documents(load_table(s, d, "documents"))
        )).orderBy("doc_id"),
        "mm_phash_dedup": lambda s, d: phash_dedup(
            binary_documents(load_table(s, d, "documents"))
        ),
        # REAL-codec paths: genuine PNG encode → inflate/defilter decode →
        # exact pixel stats (and a real nearest-neighbor thumbnail in the
        # middle for the resize variant)
        "mm_png_roundtrip": lambda s, d: pin_result(decode_pixel_stats(
            png_documents(load_table(s, d, "documents"))
        )).orderBy("doc_id"),
        "mm_frames_png": lambda s, d: frame_sample_png(
            png_video_documents(load_table(s, d, "documents")), every_k=2
        ),
        "mm_resize_png": lambda s, d: pin_result(decode_pixel_stats(
            resize_media(
                png_documents(load_table(s, d, "documents")),
                target_w=16, target_h=16, kernel="png",
            ),
            payload_col="payload_out",
        ).select("doc_id", "width", "height", "n_pixels", "mean_q"))
        .orderBy("doc_id"),
        # REAL-codec audio path: genuine RIFF/WAVE PCM16 encode → chunk-walk
        # decode → exact integer signal features (energy + zero crossings)
        "mm_audio_features": lambda s, d: pin_result(decode_audio_stats(
            wav_documents(load_table(s, d, "documents"))
        )).orderBy("doc_id"),
        # temporal decomposition: 50 ms windows, same exact features
        "mm_audio_frames": lambda s, d: audio_frame_features(
            wav_documents(load_table(s, d, "documents"))
        ),
        # video temporal ANALYSIS: shot-boundary detection over the
        # shot-structured real-PNG container (full per-frame decode)
        "mm_scene_changes": lambda s, d: scene_changes(
            png_scene_video_documents(load_table(s, d, "documents"))
        ),
    }


def oracle_sql() -> dict:
    return {
        "mm_metadata": METADATA_SQL,
        "mm_decode": DECODE_SQL,
        "mm_frames": FRAMES_SQL,
        "mm_resize": resize_sql(),
        "mm_features": FEATURES_SQL,
        "mm_phash_dedup": PHASH_DEDUP_SQL,
        "mm_png_roundtrip": PNG_ROUNDTRIP_SQL,
        "mm_resize_png": png_resize_sql(16, 16),
        "mm_frames_png": png_frames_sql(2),
        "mm_audio_features": AUDIO_STATS_SQL,
        "mm_audio_frames": audio_frames_sql(),
        "mm_scene_changes": SCENE_CHANGES_SQL,
    }
