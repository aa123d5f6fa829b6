"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
`map<string,string>` metadata column; decode / feature-extract / resize /
frame-sample run as Arrow-batched functions over `mapInPandas`, so the
Spark-side plumbing (schemas, batching, partitioning) is identical to what a
real decoder would use.

The actual image/audio codecs are NOT available in this container, so the
decode step is STUBBED two ways (clearly marked):
  - real codec path: raises NotImplementedError("codec not available ...")
    unless PIL / soundfile import succeeds;
  - deterministic-fake path (default, used by tests): payloads carry a tiny
    self-describing header written by `make_media_rows`, and "decoding" parses
    that header — a pure, seeded function, so outputs are stable across
    re-runs and parallelism.

Payload layouts (big-endian):
  IMG0 | u16 width | u16 height | pixel bytes (w*h, synthetic)
  AUD0 | u32 n_samples | sample bytes
  VID0 | u16 n_frames | u16 width | u16 height | frame bytes
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
    ]
)


def make_media_rows(n: int, seed: int = 42) -> list[tuple]:
    """Deterministic synthetic media table rows (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
            payload = b"IMG0" + struct.pack(">HH", w, h) + bytes(
                rng.integers(0, 256, w * h, dtype=np.uint8)
            )
            meta = {"mime": "image/x-fake", "w": str(w), "h": str(h)}
        elif kind == "audio":
            ns = int(rng.integers(100, 1000))
            payload = b"AUD0" + struct.pack(">I", ns) + bytes(
                rng.integers(0, 256, ns, dtype=np.uint8)
            )
            meta = {"mime": "audio/x-fake", "samples": str(ns)}
        else:
            nf, w, h = int(rng.integers(2, 10)), 8, 8
            payload = b"VID0" + struct.pack(">HHH", nf, w, h) + bytes(
                rng.integers(0, 256, nf * w * h, dtype=np.uint8)
            )
            meta = {"mime": "video/x-fake", "frames": str(nf)}
        rows.append((i, kind, payload, meta))
    return rows


def _decode_image_header(payload: bytes | None) -> tuple[int, int, int] | None:
    if payload is None or len(payload) < 8 or payload[:4] != b"IMG0":
        return None
    w, h = struct.unpack(">HH", payload[4:8])
    return int(w), int(h), len(payload) - 8


def decode_image_meta(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """Image decode -> (media_id, width, height, n_bytes) via mapInPandas.

    real_codec=True is the production path: it requires an actual image
    library, which this container does not ship (STUB — clearly marked)."""
    if real_codec:
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "real image decode requires Pillow/libvips, not available in "
                "this container; use the deterministic-fake header decoder"
            ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hdr = _decode_image_header(payload)
                if hdr is not None:
                    out.append((mid, hdr[0], hdr[1], hdr[2]))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_bytes"]
            )

    return media.where(media.kind == "image").mapInPandas(batches, IMAGE_META_SCHEMA)


def extract_features(media: DataFrame, dims: int = 16) -> DataFrame:
    """Deterministic fake feature extraction: sha256-derived unit vector per
    payload (stands in for a CNN/audio embedding; pure function of bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                digest = hashlib.sha256(bytes(payload)).digest()
                need = dims * 4
                buf = (digest * (need // len(digest) + 1))[:need]
                v = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
                v = v / np.linalg.norm(v)
                feats.append((mid, [float(x) for x in v[:dims]]))
            yield pd.DataFrame(feats, columns=["media_id", "features"])

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_image(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Fake resize: nearest-neighbor subsampling of the synthetic pixel grid
    (deterministic). Real codec path would go through Pillow — STUB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hdr = _decode_image_header(payload)
                if hdr is None:
                    continue
                w, h, _ = hdr
                px = np.frombuffer(bytes(payload[8:8 + w * h]), dtype=np.uint8)
                if len(px) < w * h:
                    continue
                grid = px.reshape(h, w)
                ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
                xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
                small = grid[np.ix_(ys, xs)]
                out = b"IMG0" + struct.pack(">HH", new_w, new_h) + small.tobytes()
                rows.append((mid, "image", out, {"w": str(new_w), "h": str(new_h)}))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return media.where(media.kind == "image").mapInPandas(batches, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video payloads: one output row per kept frame."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) < 10 or payload[:4] != b"VID0":
                    continue
                nf, w, h = struct.unpack(">HHH", payload[4:10])
                for f in range(0, nf, every):
                    rows.append((mid, f, w * h))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return media.where(media.kind == "video").mapInPandas(batches, FRAME_SCHEMA)
