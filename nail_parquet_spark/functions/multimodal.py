"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInArrow``.

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
    """Per-binary metadata + feature vector via mapInArrow (Arrow batches).

    Vectorized where the work allows it: n_bytes comes from
    ``pc.binary_length`` over the whole batch, the md5 loop hashes
    zero-copy memoryview slices of the Arrow value buffer (hashlib has no
    batch API — the per-blob digest call is inherent to variable-length
    binaries), and the fake feature vectors are one numpy pass over the
    stacked digests. md5 output is byte-identical to the previous
    per-row-bytes implementation.

    fake=True uses the deterministic stub; fake=False calls decode_image
    (NotImplementedError here, real decode on a properly-provisioned
    cluster)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def run(batches):
        for b in batches:
            ids = b.column(0).cast(pa.int64())
            blobs = b.column(1)
            n = len(blobs)
            n_bytes = pc.fill_null(pc.binary_length(blobs), 0).cast(pa.int64())
            off_dt = np.int64 if pa.types.is_large_binary(blobs.type) else np.int32
            bufs = blobs.buffers()
            if bufs[1] is None:  # all-null or empty array: no offsets buffer
                offsets = np.zeros(n + 1, dtype=off_dt)
                mv = memoryview(b"")
            else:
                offsets = np.frombuffer(bufs[1], dtype=off_dt)[
                    blobs.offset : blobs.offset + n + 1
                ]
                mv = memoryview(bufs[2])
            valid = (
                np.asarray(blobs.is_valid()) if blobs.null_count
                else np.ones(n, dtype=bool)
            )
            hashes: list[str | None] = [None] * n
            digests: list[bytes] = []
            for i in range(n):
                if valid[i]:
                    d = hashlib.md5(mv[offsets[i] : offsets[i + 1]]).digest()
                    hashes[i] = d.hex()
                    digests.append(d)
            if fake:
                feats = np.zeros((n, dim), dtype=np.float64)
                if digests:
                    D = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 16)
                    reps = (dim * 4 + 15) // 16
                    T = np.ascontiguousarray(np.tile(D, (1, reps))[:, : dim * 4])
                    feats[valid] = T.view(np.uint32).astype(np.float64) / 2**32
            else:
                feats = np.zeros((n, dim), dtype=np.float64)
                for i in np.flatnonzero(valid):
                    feats[i] = decode_image(bytes(mv[offsets[i] : offsets[i + 1]]))
            flat = pa.array(feats.reshape(-1), pa.float64())
            offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
            yield pa.record_batch(
                [ids, n_bytes, pa.array(hashes, pa.string()),
                 pa.ListArray.from_arrays(offs, flat)],
                names=["doc_id", "n_bytes", "content_hash", "features"],
            )

    return df.select(id_col, binary_col).mapInArrow(run, schema=MEDIA_META_SCHEMA)
