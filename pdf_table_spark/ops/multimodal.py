"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns (or ``media_ref`` pointers)
with struct metadata; decode / feature-extract / frame-sample run as
Arrow stages over ``mapInPandas``. The decode step itself is STUBBED
(no image/audio libraries in this container): ``FAKE_DECODE`` derives
deterministic pseudo-metadata from the payload bytes so the Spark-side
plumbing — schema, batching, partition behavior — is real and tested;
swap ``_decode_image`` for a PIL/ffmpeg call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_DECODE = True  # no codec libs in this environment

MEDIA_META_SCHEMA = ("media_ref string, n_bytes long, width int, "
                     "height int, format string, feature array<float>")

FEATURE_DIM = 16


def _decode_image(payload: bytes):
    """Decode image bytes → (width, height, format, feature vector).

    STUB: real implementation would be PIL.Image.open / cv2.imdecode.
    The deterministic fake hashes the payload into plausible dims and a
    unit-norm feature vector, so downstream plumbing is exercised with
    stable values.
    """
    if not FAKE_DECODE:  # pragma: no cover - production path
        raise NotImplementedError("image codec not available in this env")
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] * 8
    height = 64 + digest[1] * 8
    fmt = ["png", "jpeg", "webp"][digest[2] % 3]
    rng = np.frombuffer(
        hashlib.sha256(payload).digest(), dtype=np.uint8
    )[:FEATURE_DIM].astype(np.float32)
    norm = float(np.linalg.norm(rng)) or 1.0
    return width, height, fmt, (rng / norm).tolist()


def _media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {"media_ref": [], "n_bytes": [], "width": [], "height": [],
                "format": [], "feature": []}
        for ref, payload in zip(pdf["media_ref"].values,
                                pdf["payload"].values):
            data = bytes(payload) if payload is not None else b""
            w, h, fmt, feat = _decode_image(data)
            rows["media_ref"].append(ref)
            rows["n_bytes"].append(len(data))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["format"].append(fmt)
            rows["feature"].append(feat)
        yield pd.DataFrame(rows)


def decode_media(media: DataFrame) -> DataFrame:
    """media(media_ref string, payload binary) → typed metadata +
    features. Arrow-batched; scales by partitioning on media_ref."""
    return media.mapInPandas(_media_batches, schema=MEDIA_META_SCHEMA)


def media_refs_with_payloads(docs_spans: DataFrame) -> DataFrame:
    """Pull media refs out of an interleaved spans table and attach a
    deterministic synthetic payload (the blob store is out of scope in
    this sandbox; payload = utf8 bytes of the ref)."""
    refs = (
        docs_spans.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "image")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    return refs.withColumn("payload", F.encode("media_ref", "utf-8"))
