"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload + typed metadata struct, processed by
Arrow-batched ``mapInPandas`` — the same shape the reference uses for
its pixel-data extension (the SCI image cube read by fits.open,
/root/reference/gemProc2caom2/preview_augmentation.py:93-124, which
median-stacks and renders previews).

The actual codec step is STUBBED (no image/audio libs in this image):
``decode_image_stub`` raises NotImplementedError unless
``deterministic_fake=True``, in which case it emits seeded fake
features derived only from the bytes — so the Spark-side plumbing
(schema, batch iteration, partition behavior) is fully real and tested
while the codec is swappable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decoder: derives a pseudo
    (width, height) and an 8-dim feature vector from byte statistics."""
    if len(payload) == 0:
        return 0, 0, np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    width = int(arr[: min(4, len(arr))].sum()) % 512 + 1
    height = int(arr[-min(4, len(arr)):].sum()) % 512 + 1
    # 8 bucketed byte-histogram densities — cheap, vectorized, seeded by content
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
    return width, height, hist / hist.sum()


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_w", T.IntegerType()),
        T.StructField("resized_h", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_resize(payload: bytes, max_dim: int):
    """Deterministic stand-in for an image resize: decode the fake
    dims, scale the longer side down to ``max_dim`` (never upscale),
    and re-extract the feature from a stride-subsampled byte view —
    the compute shape of a real thumbnailer (decode -> scale ->
    re-encode/feature) without PIL."""
    w, h, _ = _fake_decode(payload)
    if w == 0 and h == 0:
        return 0, 0, 0, 0, np.zeros(8, dtype=np.float32)
    longer = max(w, h)
    if longer <= max_dim:
        rw, rh, sub = w, h, payload
    else:
        rw = w * max_dim // longer
        rh = h * max_dim // longer
        step = -(-longer // max_dim)  # ceil: subsample stride
        sub = payload[::step]
    _, _, feat = _fake_decode(sub)
    return w, h, rw, rh, feat


def resize_media(
    df: DataFrame,
    max_dim: int = 128,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    deterministic_fake: bool = True,
):
    """mapInPandas media resize (the preview/thumbnail pixel path,
    preview_augmentation.py:88-133's 1024/256-px jpg pair): emits
    original + resized dims and the post-resize feature vector."""
    if not deterministic_fake:
        raise NotImplementedError(
            "real image resizing requires PIL; not in this image"
        )

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, rw, rh, feat = _fake_resize(b, max_dim)
                rows.append((doc_id, w, h, rw, rh, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(_op, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_frame_sample(payload: bytes, n_frames: int):
    """Deterministic stand-in for video frame sampling: ``n_frames``
    evenly spaced byte windows, each 'decoded' by ``_fake_decode``.
    Real deployment replaces this with ffmpeg keyframe extraction."""
    if len(payload) == 0:
        return []
    out = []
    for i in range(n_frames):
        start = (i * len(payload)) // n_frames
        end = ((i + 1) * len(payload)) // n_frames
        win = payload[start:end]
        w, h, feat = _fake_decode(win)
        out.append((i, len(win), w, h, feat))
    return out


def sample_media_frames(
    df: DataFrame,
    n_frames: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    deterministic_fake: bool = True,
):
    """mapInPandas frame sampling: one OUTPUT ROW PER FRAME (a row-count
    -changing Arrow stage — the shape a video pipeline needs, which a
    scalar pandas UDF cannot express). Empty/null payloads emit no
    frames. Batches bounded by arrow.maxRecordsPerBatch as in
    decode_media_features."""
    if not deterministic_fake:
        raise NotImplementedError(
            "real frame extraction requires ffmpeg; not in this image"
        )

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                for i, n, w, h, feat in _fake_frame_sample(b, n_frames):
                    rows.append((doc_id, i, n, w, h, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(_op, FRAME_SCHEMA)


def decode_media_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    deterministic_fake: bool = True,
):
    """mapInPandas media feature extraction.

    Real deployment replaces ``_fake_decode`` with PIL/ffmpeg decode +
    model inference; everything else (Arrow batching, schema, partition
    layout) is production-shaped. Batches stay bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch, so one huge video per
    row cannot blow executor memory silently.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/ffmpeg; not in this image"
        )

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf[id_col], pdf[payload_col], pdf[media_type_col]
            ):
                b = bytes(payload) if payload is not None else b""
                w, h, feat = _fake_decode(b)
                rows.append((doc_id, len(b), mtype, w, h, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields]
            )

    return df.select(id_col, payload_col, media_type_col).mapInPandas(
        _op, MEDIA_FEATURE_SCHEMA
    )
