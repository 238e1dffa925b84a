"""Per-column codec auto-selection from sampled statistics + trial encodes.

Two stages, both executor-side (no driver round-trip):
  1. cheap sampled stats (cardinality ratio, avg run length, byte entropy,
     sortedness) prune the candidate list per column kind;
  2. the surviving candidates trial-encode the sample; the winner minimizes
     encoded size, subject to the policy's throughput floor.

This replaces the reference's parquet writer-properties knobs
(/root/reference/src/commands/optimize.rs:126-135,185-198 — which it never
even applies, see :253-257) with measured, per-column decisions.

Policies:
  ratio    — smallest sample encoding wins, full stop
  balanced — smallest among candidates whose sample throughput >= floor
             (default 40 MB/s/core); fall back to ratio if none qualify
  speed    — fastest candidate within 1.3x of the smallest
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nail_parquet_spark.codec.kernels import encode_array, kind_of


@dataclass
class ColumnStats:
    n: int
    null_frac: float
    distinct_ratio: float
    avg_run_len: float
    byte_entropy: float  # bits/byte over value bytes (strings) or packed ints
    sorted_frac: float  # fraction of non-decreasing adjacent pairs (ints)
    avg_len: float  # strings/binary


def column_stats(arr: pa.Array) -> ColumnStats:
    n = len(arr)
    if n == 0:
        return ColumnStats(0, 0.0, 1.0, 1.0, 8.0, 0.0, 0.0)
    null_frac = arr.null_count / n
    kind = kind_of(arr.type)
    distinct = pc.count_distinct(arr).as_py() or 1
    distinct_ratio = distinct / n

    if kind == "int":
        v = np.asarray(arr.cast(pa.int64()).fill_null(0), dtype=np.int64) if not pa.types.is_boolean(arr.type) else np.asarray(arr.fill_null(False)).astype(np.int64)
        runs = 1 + int((v[1:] != v[:-1]).sum()) if n > 1 else 1
        sorted_frac = float((v[1:] >= v[:-1]).mean()) if n > 1 else 1.0
        byts = v.view(np.uint8)
        avg_len = 8.0
    elif kind == "float":
        v = np.asarray(arr.fill_null(0.0))
        runs = 1 + int((v[1:] != v[:-1]).sum()) if n > 1 else 1
        sorted_frac = 0.0
        byts = v.view(np.uint8)
        avg_len = v.itemsize
    else:
        from nail_parquet_spark.codec.kernels import _strbin_of

        offsets, data, _ = _strbin_of(arr)
        byts = np.frombuffer(data, dtype=np.uint8)
        avg_len = len(byts) / max(n, 1)
        # run length over value identity via offsets+hash of content: cheap
        # proxy — runs of equal consecutive string lengths AND bytes is rare
        # to fake; use arrow equality on shifted slice for exactness
        if n > 1:
            eq = pc.equal(arr.slice(0, n - 1), arr.slice(1, n - 1))
            neq = pc.fill_null(pc.invert(eq), True)
            runs = 1 + int(pc.sum(neq.cast(pa.int8())).as_py() or 0)
        else:
            runs = 1
        sorted_frac = 0.0

    # byte entropy on a bounded slice
    bs = byts[: 1 << 16]
    if len(bs):
        counts = np.bincount(bs, minlength=256).astype(np.float64)
        p = counts[counts > 0] / len(bs)
        entropy = float(-(p * np.log2(p)).sum())
    else:
        entropy = 0.0

    return ColumnStats(
        n=n,
        null_frac=null_frac,
        distinct_ratio=distinct_ratio,
        avg_run_len=n / max(runs, 1),
        byte_entropy=entropy,
        sorted_frac=sorted_frac,
        avg_len=avg_len,
    )


def candidate_codecs(kind: str, st: ColumnStats) -> list[str]:
    cands: list[str] = []
    if kind == "int":
        if st.avg_run_len >= 3:
            cands.append("rle")
        if st.distinct_ratio <= 0.2:
            cands.append("dict")
        if st.sorted_frac >= 0.9:
            cands.append("delta_bitpack")
        cands.append("for_bitpack")
        cands.append("zstd")
    elif kind == "float":
        if st.distinct_ratio <= 0.2:
            cands.append("dict")  # bit-pattern dict: bit-exact (kernels.py)
        cands.append("zstd")
        if st.byte_entropy > 7.5:
            cands.append("plain")
    else:  # str/bin
        if st.avg_run_len >= 3:
            cands.append("rle")
        if st.distinct_ratio <= 0.5:
            cands.append("dict")
        if st.byte_entropy <= 6.5 and st.avg_len >= 4:
            cands.append("fsst")
        cands.append("zstd")
        cands.append("zstd:6")  # the reference's configured level (optimize.rs:22)
        cands.append("zstd:9")
        if st.byte_entropy > 7.9:
            cands.append("plain")
    return cands


def raw_bytes_of(arr: pa.Array) -> int:
    kind = kind_of(arr.type)
    if kind == "int":
        return 8 * len(arr)
    if kind == "float":
        return arr.type.bit_width // 8 * len(arr)
    tot = pc.sum(
        pc.binary_length(arr.fill_null("" if kind == "str" else b""))
    ).as_py()
    return int(tot or 0)


# deterministic per-codec encode-speed classes (MB/s/core, measured on this
# repo's kernels over web-text workloads; see BENCH/BASELINE.md). Used for
# the balanced/speed policy floors so codec choice never flaps with host
# noise — sizes (the other input) are already deterministic.
CODEC_SPEED_MBPS = {
    "plain": 500.0,
    "zstd": 110.0,
    "zstd:6": 45.0,
    "zstd:9": 25.0,
    "dict": 80.0,
    "rle": 60.0,
    "for_bitpack": 130.0,
    "delta_bitpack": 130.0,
    "fsst": 5.0,
}


def choose_codec(
    sample: pa.Array, policy: str = "balanced", min_mbps: float = 40.0,
    trial_byte_budget: int = 1 << 21,
) -> tuple[str, ColumnStats]:
    """Pick a codec for a column given a sample of it."""
    kind = kind_of(sample.type)
    st = column_stats(sample)
    if st.n == 0:
        return "plain", st
    # cap trial-encode cost: slow codecs (fsst) on wide columns (html) would
    # otherwise dominate job setup
    if st.avg_len and st.n * st.avg_len > trial_byte_budget:
        sample = sample.slice(0, max(256, int(trial_byte_budget / st.avg_len)))
    cands = candidate_codecs(kind, st)

    results = []
    for c in cands:
        try:
            blk = encode_array(sample, c)
        except Exception:
            continue
        results.append((c, len(blk.payload), CODEC_SPEED_MBPS.get(c, 50.0)))
    if not results:
        return "plain", st

    by_size = sorted(results, key=lambda r: r[1])
    if policy == "ratio":
        return by_size[0][0], st
    if policy == "speed":
        floor_size = by_size[0][1] * 1.3
        ok = [r for r in results if r[1] <= floor_size]
        return max(ok, key=lambda r: r[2])[0], st
    # balanced
    fast = [r for r in by_size if r[2] >= min_mbps]
    if fast:
        return fast[0][0], st
    return by_size[0][0], st
