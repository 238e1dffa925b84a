"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas``.

The actual media decode is STUBBED (this container ships no image/audio
libs): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the bytes — so the Spark-side plumbing (schema, batch shape,
partitioning, UDF signature) is real and tested end-to-end, and a real
decoder drops in by replacing one function.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def decode_image(data: bytes) -> np.ndarray:
    """Replace with e.g. PIL/cv2 decode on a real cluster image."""
    raise NotImplementedError("image decode requires PIL/cv2 — not in this container")


def _fake_features(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in: bytes -> md5 -> `dim` floats in [0,1)."""
    if data is None:
        return [0.0] * dim
    h = hashlib.md5(data).digest()
    arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (arr / np.float64(2**32)).tolist()


MEDIA_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_hash string, features array<double>"
)


def extract_media_features(df: DataFrame, id_col: str, binary_col: str,
                           dim: int = 8, fake: bool = True) -> DataFrame:
    """Per-binary metadata + feature vector via mapInPandas (Arrow batches).

    fake=True uses the deterministic stub; fake=False calls decode_image
    (NotImplementedError here, real decode on a properly-provisioned
    cluster)."""

    def run(batches):
        for pdf in batches:
            data = pdf[binary_col]
            feats = []
            hashes = []
            sizes = []
            for b in data:
                bb = bytes(b) if b is not None else None
                sizes.append(len(bb) if bb is not None else 0)
                hashes.append(hashlib.md5(bb).hexdigest() if bb is not None else None)
                if fake:
                    feats.append(_fake_features(bb, dim))
                else:
                    feats.append(decode_image(bb).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "content_hash": hashes,
                    "features": feats,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)
