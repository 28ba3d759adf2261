"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (north-star extension, BASELINE.json).

This container has no image/audio codecs, so the DEFAULT decode kernel is
a deterministic fake behind a clearly-marked stub — but everything
Spark-side is real and tested: the binary column handling, the Arrow batch
shape through ``mapInPandas``, the output schemas, and the metadata
extraction expressions. ``decode_media(kernel='pil'|'auto')`` switches to
real Pillow decoding on executors that have it, with zero plan change
(guarded import inside the kernel); frame extraction stays a stub (libav
is heavier than a guard).

Scale notes: metadata extraction is pure Catalyst (no Python); the decode
path is ``mapInPandas`` with Arrow batches — per-partition streaming, no
per-row pickling, no driver involvement; a ``repartition`` before decode
spreads large blobs evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash60
from ..sources.flows import load_table

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
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
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
    - ``'auto'``: Pillow when importable on the executor, stub otherwise.

    The kernel closure is deliberately self-contained (nested fns pickle by
    value): referencing module-level helpers would make cloudpickle pickle
    them by reference and break on workers without this package on their
    PYTHONPATH (e.g. a driver script running from another directory).
    """
    if kernel not in ("fake", "pil", "auto"):
        raise ValueError(f"kernel must be 'fake', 'pil' or 'auto', got {kernel!r}")

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
FROM (SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n FROM documents)
ORDER BY doc_id
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
             greatest(CAST(FLOOR(octet_length(CAST(text AS BLOB)) / 4096.0) AS BIGINT), 1)
               AS n_frames
      FROM documents)
ORDER BY doc_id, frame_idx
"""


def queries() -> dict:
    return {
        "mm_metadata": lambda s, d: media_metadata(load_table(s, d, "documents")),
        "mm_decode": lambda s, d: decode_media(
            binary_documents(load_table(s, d, "documents"))
        ).orderBy("doc_id"),
        "mm_frames": lambda s, d: frame_sample(
            binary_documents(load_table(s, d, "documents"))
        ).orderBy("doc_id", "frame_idx"),
    }


def oracle_sql() -> dict:
    return {
        "mm_metadata": METADATA_SQL,
        "mm_decode": DECODE_SQL,
        "mm_frames": FRAMES_SQL,
    }
