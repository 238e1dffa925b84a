"""Vectorized per-column codec kernels (numpy + pyarrow only — no per-row
Python anywhere).

These run inside ``mapInArrow`` workers over Arrow record batches.  Every
kernel is a pure function ``pa.Array -> EncodedBlock -> pa.Array`` with a
bit-identity round-trip guarantee (the north-rule gate).

Codecs
------
  plain        raw canonical buffers (ints→int64 LE, floats→raw, str/bin→
               offsets+bytes), no compression
  zstd         plain sections, each zstd-compressed (pyarrow C codec)
  for_bitpack  frame-of-reference: min-subtract then bit-pack (ints/ts)
  delta_bitpack zigzag(diff) then bit-pack — for sorted-ish ints/ts
               (cf. warc_ts per-host crawl deltas, SURVEY.md §7.2 M2)
  dod_bitpack  delta-of-delta (Gorilla family): zigzag(diff(diff)) then
               bit-pack — near-regular sequences (clock ticks, sweeps)
  sparse_for   null-suppressed FOR: non-null slots only, scattered back
               through the validity bitmap — mostly-null columns
  rle          run-length over values (ints) or dict codes (strings):
               run codes bit-packed + run lengths bit-packed
  dict         dictionary encode: distinct values (zstd) + bit-packed codes
  alp          ALP-style decimal transform for floats: round(v*10^e) as
               FOR-bit-packed int64, per-value bit-exactness enforced,
               non-representable values (NaN/inf/high-entropy) in a raw
               exception list (Afroozeh et al., SIGMOD'24 idea, pure numpy)
  fc           front coding (the parquet DELTA_BYTE_ARRAY / ORC incremental
               idea) for sorted-ish str/bin: rows store the byte length of
               the prefix shared with their group head (restart every 16
               rows, so decode stays a pure vectorized gather) plus the
               remaining suffix, suffix stream zstd'd — wins on sorted url
               columns where every neighbor shares a long scheme://host
               prefix
  fsst         FSST-style symbol-table compression for str/bin: up to 255
               symbols of 1–8 bytes learned by sampled byte-pair merging,
               escape code 255 for out-of-table bytes (Boncz et al.,
               VLDB'20 — reimplemented from the paper idea in pure numpy)
  bss          byte-stream split for floats (the parquet BYTE_STREAM_SPLIT
               idea): bytes transposed into per-position planes, zstd over
               the planes — the skewed sign/exponent planes compress while
               mantissa planes ride near-raw; wins on full-precision floats
               where alp's exception list degenerates
  list<...>    any list/large_list of the above: bit-packed per-row lengths
               + the flattened child encoded RECURSIVELY under the same
               codec name ("alp" on array<float> = lens + ALP of the
               embedded floats), nested lists peel one level per recursion

The reference (nail-parquet) only *configures* parquet-rs encodings and does
not even wire them through (/root/reference/src/commands/optimize.rs:249-265);
here the encodings are first-class, measurable, and selectable per column.

All float codecs are bit-exact: ``dict`` dictionary-encodes the IEEE bit
patterns (uint view), so -0.0 vs 0.0 and distinct NaN payloads survive the
round trip; zstd/plain copy raw bytes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ESCAPE = 255  # fsst escape code
_ZSTD_LEVEL = 3

# ---------------------------------------------------------------------------
# block container
# ---------------------------------------------------------------------------


@dataclass
class EncodedBlock:
    """One encoded column chunk: JSON-serializable header + binary payload."""

    header: dict  # codec, kind, n, null_count, params, sections=[(name, len)]
    payload: bytes

    def header_json(self) -> str:
        return json.dumps(self.header, separators=(",", ":"))

    @staticmethod
    def from_parts(header_json: str, payload: bytes) -> "EncodedBlock":
        return EncodedBlock(json.loads(header_json), payload)

    def section(self, name: str) -> bytes:
        off = 0
        for sec_name, ln in self.header["sections"]:
            if sec_name == name:
                return self.payload[off : off + ln]
            off += ln
        raise KeyError(name)

    def has_section(self, name: str) -> bool:
        return any(s[0] == name for s in self.header["sections"])


def _build(header: dict, sections: list[tuple[str, bytes]]) -> EncodedBlock:
    header = dict(header)
    header["sections"] = [[n, len(b)] for n, b in sections]
    return EncodedBlock(header, b"".join(b for _, b in sections))


# ---------------------------------------------------------------------------
# primitives: zstd, bit-packing, validity
# ---------------------------------------------------------------------------

_zstd_codecs: dict[int, pa.Codec] = {}
_zstd_d = pa.Codec("zstd")


def zstd_compress(buf: bytes, level: int = _ZSTD_LEVEL) -> bytes:
    codec = _zstd_codecs.get(level)
    if codec is None:
        codec = _zstd_codecs[level] = pa.Codec("zstd", compression_level=level)
    return codec.compress(buf, asbytes=True)


def zstd_decompress(buf: bytes, raw_len: int) -> bytes:
    if raw_len == 0:
        return b""
    return _zstd_d.decompress(buf, decompressed_size=raw_len, asbytes=True)


# General-purpose byte-stream codecs: any of these can stand where zstd
# does (the "values"/"data" section compressor), selected per column like
# every other codec. brotli closes the reference's compression-menu gap
# (optimize.rs:47-108) WITHOUT the JVM codec jar Spark lacks: blocks are
# compressed by pyarrow's C-level codecs inside the encode tasks, so the
# container parquet stays plain-readable everywhere. Default levels:
# zstd 3 (the engine's historical default), brotli 5 (its speed/ratio
# knee), gzip 6 (zlib default); lz4(frame) has no level knob in pyarrow.
GP_CODECS = ("zstd", "brotli", "lz4", "gzip")
_GP_DEFAULT_LEVEL = {"zstd": _ZSTD_LEVEL, "brotli": 5, "gzip": 6, "lz4": None}
_gp_encoders: dict[tuple[str, "int | None"], pa.Codec] = {}
_gp_decoders: dict[str, pa.Codec] = {"zstd": _zstd_d}


def gp_compress(buf: bytes, name: str, level: "int | None") -> bytes:
    if name == "lz4":
        level = None  # pyarrow's lz4 frame codec takes no level
    codec = _gp_encoders.get((name, level))
    if codec is None:
        codec = _gp_encoders[(name, level)] = (
            pa.Codec(name) if level is None
            else pa.Codec(name, compression_level=level))
    return codec.compress(buf, asbytes=True)


def gp_decompress(buf: bytes, raw_len: int, name: str) -> bytes:
    if raw_len == 0:
        return b""
    codec = _gp_decoders.get(name)
    if codec is None:
        codec = _gp_decoders[name] = pa.Codec(name)
    return codec.decompress(buf, decompressed_size=raw_len, asbytes=True)


def bit_width(max_val: int) -> int:
    return int(max_val).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values (< 2**width) into a little-endian bitstream.

    Two C passes: explode each value to a 64-bit row (unpackbits), slice the
    low ``width`` columns, re-pack. No per-row Python, no 8x intermediates.
    """
    if width == 0 or len(vals) == 0:
        return b""
    n = len(vals)
    v = np.ascontiguousarray(vals, dtype="<u8").view(np.uint8)
    bits = np.unpackbits(v, bitorder="little").reshape(n, 64)  # LE bytes => flat bit order
    return np.packbits(np.ascontiguousarray(bits[:, :width]).ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n * width, bitorder="little"
    ).reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, :width] = bits
    return (
        np.packbits(full.ravel(), bitorder="little").view("<u8").astype(np.uint64, copy=False)
    )


def pack_validity(valid: np.ndarray | None) -> bytes:
    if valid is None:
        return b""
    return np.packbits(valid.astype(np.uint8), bitorder="little").tobytes()


def unpack_validity(buf: bytes, n: int) -> np.ndarray | None:
    if not buf:
        return None
    return (
        np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little")
        .astype(bool)
    )


# ---------------------------------------------------------------------------
# canonical extraction from pyarrow arrays
# ---------------------------------------------------------------------------

_INT_KINDS = {
    pa.types.is_integer: "int",
    pa.types.is_timestamp: "int",
    pa.types.is_date: "int",
    pa.types.is_boolean: "int",
}


def kind_of(typ: pa.DataType) -> str:
    if (
        pa.types.is_integer(typ)
        or pa.types.is_timestamp(typ)
        or pa.types.is_date32(typ)
        or pa.types.is_date64(typ)
        or pa.types.is_boolean(typ)
        or pa.types.is_time(typ)
    ):
        return "int"
    if pa.types.is_floating(typ):
        return "float"
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return "str"
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return "bin"
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return "list"
    if pa.types.is_decimal(typ):
        return "other"
    return "other"


def _validity_of(arr: pa.Array) -> np.ndarray | None:
    if arr.null_count == 0:
        return None
    return np.asarray(arr.is_valid())


def _ints_of(arr: pa.Array) -> tuple[np.ndarray, np.ndarray | None]:
    """Return (int64 values with nulls zero-filled, validity-or-None)."""
    valid = _validity_of(arr)
    typ = arr.type
    if pa.types.is_boolean(typ):
        np_vals = np.asarray(arr.fill_null(False)).astype(np.int64)
    else:
        if pa.types.is_date32(typ):
            a64 = arr.cast(pa.int32()).cast(pa.int64())
        else:
            a64 = arr.cast(pa.int64())
        np_vals = np.asarray(a64.fill_null(0), dtype=np.int64)
    return np_vals, valid


def _restore_int_array(
    vals: np.ndarray, valid: np.ndarray | None, typ: pa.DataType
) -> pa.Array:
    mask = None if valid is None else ~valid
    if pa.types.is_boolean(typ):
        return pa.array(vals.astype(bool), type=pa.bool_(), mask=mask)
    base = pa.array(vals, type=pa.int64(), mask=mask)
    if pa.types.is_timestamp(typ):
        return base.cast(typ)
    if pa.types.is_date32(typ):
        return base.cast(pa.int32()).cast(typ)
    if pa.types.is_date64(typ) or pa.types.is_time(typ):
        return base.cast(typ)
    if not pa.types.is_int64(typ):
        return base.cast(typ)
    return base


def _strbin_of(arr: pa.Array) -> tuple[np.ndarray, "bytes | pa.Buffer", np.ndarray | None]:
    """Return (int64 offsets len n+1, data buffer, validity). Nulls → empty.

    The data payload stays a zero-copy ``pa.Buffer`` slice (it feeds either
    zstd's C compressor or ``np.frombuffer``, both of which take the buffer
    protocol) — no per-block copy of the column's bytes."""
    valid = _validity_of(arr)
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        a = arr.fill_null("").cast(pa.large_binary())
    else:
        a = arr.fill_null(b"").cast(pa.large_binary())
    a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    buffers = a.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(a) + 1, offset=a.offset * 8).copy()
    start, end = int(offsets[0]), int(offsets[-1])
    if buffers[2] is not None and end > start:
        data = buffers[2].slice(start, end - start)
    else:
        data = b""
    offsets = offsets - start
    return offsets, data, valid


def _restore_strbin_array(
    offsets: np.ndarray, data: bytes, valid: np.ndarray | None, typ: pa.DataType
) -> pa.Array:
    n = len(offsets) - 1
    lb = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(offsets.astype(np.int64).tobytes()), pa.py_buffer(data)],
    )
    if valid is not None:
        # re-null via mask: rebuild with take-based null injection
        mask = pa.array(~valid)
        lb = pc.if_else(mask, pa.scalar(None, type=pa.large_binary()), lb)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return lb.cast(pa.large_string()).cast(typ)
    return lb.cast(typ)


# ---------------------------------------------------------------------------
# integer codecs
# ---------------------------------------------------------------------------


def _enc_int_for(vals: np.ndarray) -> tuple[dict, list[tuple[str, bytes]]]:
    if len(vals) == 0:
        return {"ref": 0, "width": 0}, [("packed", b"")]
    m = int(vals.min())
    mu = np.array([m], dtype=np.int64).view(np.uint64)[0]
    with np.errstate(over="ignore"):
        deltas = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64) - mu
    width = bit_width(int(deltas.max()))
    return {"ref": m, "width": width}, [("packed", pack_bits(deltas, width))]


def _dec_int_for(block: EncodedBlock, n: int) -> np.ndarray:
    p = block.header["params"]
    deltas = unpack_bits(block.section("packed"), n, p["width"])
    mu = np.array([p["ref"]], dtype=np.int64).view(np.uint64)[0]
    with np.errstate(over="ignore"):
        return (deltas + mu).view(np.int64)


def _zigzag(d: np.ndarray) -> np.ndarray:
    return ((d << 1) ^ (d >> 63)).view(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64, copy=False)
    return ((z >> np.uint64(1)).view(np.int64)) ^ -((z & np.uint64(1)).view(np.int64))


def _enc_int_delta(vals: np.ndarray) -> tuple[dict, list[tuple[str, bytes]]]:
    if len(vals) == 0:
        return {"first": 0, "width": 0}, [("packed", b"")]
    first = int(vals[0])
    with np.errstate(over="ignore"):
        d = np.diff(vals.astype(np.int64))
        z = _zigzag(d)
    width = bit_width(int(z.max())) if len(z) else 0
    return {"first": first, "width": width}, [("packed", pack_bits(z, width))]


def _dec_int_delta(block: EncodedBlock, n: int) -> np.ndarray:
    p = block.header["params"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    z = unpack_bits(block.section("packed"), n - 1, p["width"])
    d = _unzigzag(z)
    out = np.empty(n, dtype=np.int64)
    out[0] = p["first"]
    with np.errstate(over="ignore"):
        np.cumsum(d, out=out[1:])
        out[1:] += p["first"]
    return out


def _enc_int_sparse_for(vals: np.ndarray,
                        valid: np.ndarray | None
                        ) -> tuple[dict, list[tuple[str, bytes]]]:
    """Null-suppressed frame-of-reference: only the NON-NULL slots' values
    are stored (FOR bitpack over the compacted array); decode scatters
    them back through the validity bitmap every block already carries.
    A mostly-null column stops paying width bits for every null slot, and
    the encoder's zero-fill stops dragging ref/width (a block of
    [10^9, null x 9] packs ~0 payload bits instead of 10 x 30)."""
    present = vals if valid is None else vals[valid]
    params, secs = _enc_int_for(present)
    params = dict(params)
    params["n_present"] = int(len(present))
    return params, secs


def _dec_int_sparse_for(block: EncodedBlock, n: int,
                        valid: np.ndarray | None) -> np.ndarray:
    p = block.header["params"]
    m = p["n_present"]
    deltas = unpack_bits(block.section("packed"), m, p["width"])
    mu = np.array([p["ref"]], dtype=np.int64).view(np.uint64)[0]
    with np.errstate(over="ignore"):
        present = (deltas + mu).view(np.int64)
    if valid is None:
        return present  # m == n: nothing was suppressed
    out = np.zeros(n, dtype=np.int64)
    out[valid] = present
    return out


def _enc_int_dod(vals: np.ndarray) -> tuple[dict, list[tuple[str, bytes]]]:
    """Delta-of-delta (Gorilla / time-series family): zigzag the SECOND
    differences and bit-pack. Near-regular sequences — clock ticks, crawl
    sweeps, auto-increment ids with gaps — have ~constant first deltas, so
    the second deltas concentrate at 0 and pack to a couple of bits where
    plain delta still pays the full step width every row."""
    if len(vals) == 0:
        return {"first": 0, "d0": 0, "width": 0}, [("packed", b"")]
    first = int(vals[0])
    with np.errstate(over="ignore"):
        d = np.diff(vals.astype(np.int64))
    if len(d) == 0:
        return {"first": first, "d0": 0, "width": 0}, [("packed", b"")]
    d0 = int(d[0])
    with np.errstate(over="ignore"):
        z = _zigzag(np.diff(d))
    width = bit_width(int(z.max())) if len(z) else 0
    return ({"first": first, "d0": d0, "width": width},
            [("packed", pack_bits(z, width))])


def _dec_int_dod(block: EncodedBlock, n: int) -> np.ndarray:
    p = block.header["params"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    out[0] = p["first"]
    if n == 1:
        return out
    z = unpack_bits(block.section("packed"), n - 2, p["width"])
    d = np.empty(n - 1, dtype=np.int64)
    d[0] = p["d0"]
    with np.errstate(over="ignore"):
        np.cumsum(_unzigzag(z), out=d[1:])
        d[1:] += p["d0"]
        np.cumsum(d, out=out[1:])
        out[1:] += p["first"]
    return out


_ALP_MAX_EXP = 14  # 10^14 < 2^53: every scaled integer stays exactly representable
_ALP_SAMPLE = 4096


def _alp_ints(fvals: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """Scale floats by 10^e to integers; return (ints, exact_mask).

    A value is *exact* when round(v * 10^e) / 10^e reproduces v bit-for-bit
    (IEEE equality plus a sign-bit check so -0.0 never silently becomes
    +0.0). NaN/inf and magnitudes whose scaled form leaves int64 range are
    never exact — they go to the exception list."""
    scale = 10.0 ** e
    scaled = fvals.astype(np.float64) * scale
    with np.errstate(invalid="ignore"):
        ok = np.isfinite(scaled) & (np.abs(scaled) < float(1 << 62))
    ints = np.zeros(len(fvals), dtype=np.int64)
    ints[ok] = np.round(scaled[ok]).astype(np.int64)
    recon = (ints.astype(np.float64) / scale).astype(fvals.dtype)
    exact = ok & (recon == fvals) & ~(np.signbit(recon) ^ np.signbit(fvals))
    return ints, exact


def _alp_pick_exp(fvals: np.ndarray) -> int:
    """Smallest decimal exponent whose sampled exact fraction clears 99%;
    falls back to the argmax exponent. Deterministic (stride sample)."""
    n = len(fvals)
    sample = fvals[:: max(1, n // _ALP_SAMPLE)][:_ALP_SAMPLE] if n else fvals
    best_e, best_frac = 0, -1.0
    for e in range(_ALP_MAX_EXP + 1):
        _, exact = _alp_ints(sample, e)
        frac = float(exact.mean()) if len(exact) else 1.0
        if frac >= 0.99:
            return e
        if frac > best_frac:
            best_e, best_frac = e, frac
    return best_e


def _enc_float_alp(fvals: np.ndarray) -> tuple[dict, list[tuple[str, bytes]]]:
    """ALP-style decimal float compression (Afroozeh et al., SIGMOD'24 idea,
    reimplemented from the paper): v -> round(v * 10^e) as frame-of-reference
    bit-packed int64, with bit-exactness enforced per value — any value the
    decimal transform cannot reproduce exactly is stored verbatim in an
    exception list (position + raw IEEE bytes). 2-decimal business doubles
    pack to ~2 bytes/value instead of 8."""
    n = len(fvals)
    e = _alp_pick_exp(fvals) if n else 0
    ints, exact = _alp_ints(fvals, e) if n else (np.zeros(0, np.int64), np.zeros(0, bool))
    exc = ~exact
    n_exc = int(exc.sum())
    if n and n_exc:
        # park exceptions at the FOR reference so they never widen the pack
        fill = int(ints[exact].min()) if n_exc < n else 0
        ints[exc] = fill
    for_params, for_secs = _enc_int_for(ints)
    pos_width = bit_width(n - 1) if n > 1 else 0
    exc_pos = np.flatnonzero(exc).astype(np.uint64)
    exc_raw = fvals[exc].tobytes()
    params = {
        "dtype": str(fvals.dtype),
        "exp": e,
        "ref": for_params["ref"],
        "width": for_params["width"],
        "n_exc": n_exc,
        "pos_width": pos_width,
        "exc_raw_len": len(exc_raw),
    }
    secs = for_secs + [
        ("exc_pos", pack_bits(exc_pos, pos_width)),
        ("exc_vals", zstd_compress(exc_raw)),
    ]
    return params, secs


def _dec_float_alp(block: EncodedBlock, n: int) -> np.ndarray:
    p = block.header["params"]
    dtype = np.dtype(p["dtype"])
    deltas = unpack_bits(block.section("packed"), n, p["width"])
    mu = np.array([p["ref"]], dtype=np.int64).view(np.uint64)[0]
    with np.errstate(over="ignore"):
        ints = (deltas + mu).view(np.int64)
    fvals = (ints.astype(np.float64) / 10.0 ** p["exp"]).astype(dtype)
    if p["n_exc"]:
        pos = unpack_bits(block.section("exc_pos"), p["n_exc"], p["pos_width"]).astype(np.int64)
        vals = np.frombuffer(
            zstd_decompress(block.section("exc_vals"), p["exc_raw_len"]), dtype=dtype
        )
        fvals[pos] = vals
    return fvals


def _runs_of(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = len(codes)
    if n == 0:
        return codes[:0], np.zeros(0, dtype=np.int64)
    starts = np.flatnonzero(np.concatenate(([True], codes[1:] != codes[:-1])))
    run_vals = codes[starts]
    run_lens = np.diff(np.append(starts, n)).astype(np.int64)
    return run_vals, run_lens


def _enc_int_rle(vals: np.ndarray) -> tuple[dict, list[tuple[str, bytes]]]:
    run_vals, run_lens = _runs_of(vals)
    vparams, vsec = _enc_int_for(run_vals)
    lw = bit_width(int(run_lens.max())) if len(run_lens) else 0
    return (
        {"n_runs": len(run_vals), "vals": vparams, "len_width": lw},
        [("run_vals", vsec[0][1]), ("run_lens", pack_bits(run_lens.view(np.uint64), lw))],
    )


def _dec_int_rle(block: EncodedBlock, n: int) -> np.ndarray:
    p = block.header["params"]
    nr = p["n_runs"]
    sub = EncodedBlock(
        {"params": p["vals"], "sections": [["packed", len(block.section("run_vals"))]]},
        block.section("run_vals"),
    )
    run_vals = _dec_int_for(sub, nr)
    run_lens = unpack_bits(block.section("run_lens"), nr, p["len_width"]).astype(np.int64)
    return np.repeat(run_vals, run_lens)


# ---------------------------------------------------------------------------
# fsst (symbol-table) codec for byte data
# ---------------------------------------------------------------------------


def _keep_alternating(p: np.ndarray) -> np.ndarray:
    """Among match positions p (sorted), drop matches overlapping a kept
    predecessor: within each run of consecutive positions keep every other."""
    if p.size <= 1:
        return p
    new_run = np.concatenate(([True], np.diff(p) != 1))
    run_ids = np.cumsum(new_run) - 1
    first_of_run = p[np.flatnonzero(new_run)]
    rel = p - first_of_run[run_ids]
    return p[rel % 2 == 0]


def fsst_encode(
    offsets: np.ndarray, data: bytes, sample_bytes: int = 1 << 16
) -> tuple[dict, list[tuple[str, bytes]]]:
    """Encode concatenated byte strings with a learned symbol table.

    Output token stream is uint8 codes; code 255 escapes a literal byte.
    """
    n = len(offsets) - 1
    raw = np.frombuffer(data, dtype=np.uint8)
    if len(raw) == 0:
        return (
            {"n_syms": 0, "sym_lens": [], "tok_counts_width": 0, "n_base": 0, "pairs": []},
            [("symbols", b""), ("tokens", b""), ("tok_counts", b"")],
        )

    # base symbols: frequent byte values get codes; rare ones are escaped
    byte_counts = np.bincount(raw, minlength=256)
    present = np.flatnonzero(byte_counts)
    order = present[np.argsort(-byte_counts[present], kind="stable")]
    base_bytes = order[: 254 - 64]  # leave >=64 codes for merged symbols
    code_of_byte = np.full(256, -2, dtype=np.int16)  # -2 = escaped byte
    code_of_byte[base_bytes] = np.arange(len(base_bytes), dtype=np.int16)
    base_symbols = [bytes([b]) for b in base_bytes]
    n_base = len(base_symbols)

    # int16 token stream with -1 separators between strings, -2 escapes
    toks = code_of_byte[raw]
    esc_mask = toks == -2
    if n > 1:
        lens = np.diff(offsets)
        str_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
        full = np.full(len(toks) + n - 1, -1, dtype=np.int16)
        full[np.arange(len(toks), dtype=np.int64) + str_of_byte] = toks
        stream = full
    else:
        stream = toks

    # learn merge pairs on a sample, then replay them over the full stream
    sample = stream[:sample_bytes].astype(np.int64)
    symbols, pairs = _fsst_train_pairs(sample, base_symbols)

    # replay: group pairs by dependency level (symbol length <= 8 bounds the
    # depth), apply all pairs of one level in a single vectorized pass — the
    # tokenization need not replicate training exactly, only expand correctly
    levels = np.zeros(len(symbols), dtype=np.int64)
    for k, (sa, sb) in enumerate(pairs):
        levels[n_base + k] = max(levels[sa], levels[sb]) + 1
    max_level = int(levels.max()) if len(pairs) else 0

    t = stream
    for lvl in range(1, max_level + 1):
        if len(t) < 2:
            break
        pk = [(sa, sb, n_base + k) for k, (sa, sb) in enumerate(pairs) if levels[n_base + k] == lvl]
        if not pk:
            continue
        # 64K-entry LUT: token ids <= 253, so keys from -1/-2 sentinels land
        # in high-byte 0xFE/0xFF rows that no valid (a,b) pair can occupy
        lut = np.full(1 << 16, -1, dtype=np.int16)
        for sa, sb, nid in pk:
            lut[(sa << 8) | sb] = nid
        a, b = t[:-1], t[1:]
        keys = (a.astype(np.uint16) << 8) | b.astype(np.uint16)
        newid = lut[keys]
        p = np.flatnonzero(newid >= 0)
        p = _keep_alternating(p)  # disjoint length-2 matches
        if p.size:
            t[p] = newid[p]
            mask = np.ones(len(t), dtype=bool)
            mask[p + 1] = False
            t = t[mask]

    # now t contains: codes >=0, -1 separators, -2 escapes (literal bytes)
    sep_positions = np.flatnonzero(t == -1)
    tok_counts = np.diff(np.concatenate(([-1], sep_positions, [len(t)]))) - 1
    keep = t != -1
    t2 = t[keep]
    esc_at = t2 == -2

    # literal bytes for escapes, in order: bytes where code_of_byte<0, in raw order
    literals = raw[esc_mask]

    # output byte stream: normal codes 1 byte; escapes 2 bytes (255, literal)
    out_len = len(t2) + int(esc_at.sum())
    out = np.empty(out_len, dtype=np.uint8)
    # positions of each token in output = index + cumulative escapes before it
    esc_cum = np.cumsum(esc_at) - esc_at  # escapes strictly before
    pos = np.arange(len(t2)) + esc_cum
    out[pos[~esc_at]] = t2[~esc_at].astype(np.uint8)
    out[pos[esc_at]] = ESCAPE
    out[pos[esc_at] + 1] = literals
    # per-string counts in output BYTES (tokens + escapes), safe for empties
    bounds = np.concatenate(([0], np.cumsum(tok_counts))).astype(np.int64)
    cesc = np.concatenate(([0], np.cumsum(esc_at))).astype(np.int64)
    byte_counts_per_str = tok_counts + (cesc[bounds[1:]] - cesc[bounds[:-1]])

    sym_lens = [len(s) for s in symbols]
    symtab = b"".join(symbols)
    cw = bit_width(int(byte_counts_per_str.max())) if n else 0
    return (
        {
            "n_syms": len(symbols),
            "sym_lens": sym_lens,
            "tok_counts_width": cw,
            "n_base": n_base,
        },
        [
            ("symbols", symtab),
            ("tokens", out.tobytes()),
            ("tok_counts", pack_bits(byte_counts_per_str.view(np.uint64), cw)),
        ],
    )


def _fsst_train_pairs(
    sample_tokens: np.ndarray, base_symbols: list[bytes], max_symbols: int = 254,
    min_gain_frac: float = 0.0005,
) -> tuple[list[bytes], list[tuple[int, int]]]:
    symbols = list(base_symbols)
    pairs: list[tuple[int, int]] = []
    lens = np.array([len(s) for s in symbols], dtype=np.int64)
    t = sample_tokens.astype(np.int64, copy=True)
    n0 = max(len(t), 1)
    while len(symbols) < max_symbols:
        if len(t) < 2:
            break
        a, b = t[:-1], t[1:]
        ok = (a >= 0) & (b >= 0)
        la = lens[np.clip(a, 0, None)]
        lb_ = lens[np.clip(b, 0, None)]
        ok &= (la + lb_) <= 8
        if not ok.any():
            break
        keys = (a[ok] << 20) | b[ok]
        uniq, counts = np.unique(keys, return_counts=True)
        bi = int(np.argmax(counts))
        cnt = int(counts[bi])
        if cnt < max(4, int(min_gain_frac * n0)):
            break
        sa, sb = int(uniq[bi] >> 20), int(uniq[bi] & 0xFFFFF)
        new_id = len(symbols)
        symbols.append(symbols[sa] + symbols[sb])
        lens = np.append(lens, lens[sa] + lens[sb])
        pairs.append((sa, sb))
        p = np.flatnonzero((a == sa) & (b == sb))
        if sa == sb:
            p = _keep_alternating(p)
        t[p] = new_id
        mask = np.ones(len(t), dtype=bool)
        mask[p + 1] = False
        t = t[mask]
    return symbols, pairs


def fsst_decode(block: EncodedBlock, n: int) -> tuple[np.ndarray, bytes]:
    """Decode to (offsets int64 len n+1, data bytes)."""
    p = block.header["params"]
    sym_lens = np.array(p["sym_lens"], dtype=np.int64)
    symtab = block.section("symbols")
    toks = np.frombuffer(block.section("tokens"), dtype=np.uint8)
    byte_counts = unpack_bits(block.section("tok_counts"), n, p["tok_counts_width"]).astype(np.int64)

    if len(toks) == 0:
        return np.zeros(n + 1, dtype=np.int64), b""

    # classify escapes: a 255 is an escape-start iff it begins at a parse
    # position; runs of 255 pair up (see run-parity argument in design notes)
    is_ff = toks == ESCAPE
    esc_start = np.zeros(len(toks), dtype=bool)
    if is_ff.any():
        ffpos = np.flatnonzero(is_ff)
        runs_new = np.concatenate(([True], np.diff(ffpos) != 1))
        run_first = ffpos[np.flatnonzero(runs_new)]
        run_ids = np.cumsum(runs_new) - 1
        rel = ffpos - run_first[run_ids]
        esc_start[ffpos[rel % 2 == 0]] = True
    literal_pos = np.flatnonzero(esc_start) + 1
    is_literal = np.zeros(len(toks), dtype=bool)
    is_literal[literal_pos[literal_pos < len(toks)]] = True

    # per-position output length: symbol len for codes, 1 for literal, 0 for esc-start
    sym_starts = np.concatenate(([0], np.cumsum(sym_lens))).astype(np.int64)
    out_lens = np.zeros(len(toks), dtype=np.int64)
    code_mask = ~esc_start & ~is_literal
    codes = toks[code_mask].astype(np.int64)
    out_lens[code_mask] = sym_lens[codes]
    out_lens[is_literal] = 1

    total = int(out_lens.sum())
    out = np.empty(total, dtype=np.uint8)
    out_starts = np.concatenate(([0], np.cumsum(out_lens)))[:-1]

    # expand symbols: gather source ranges
    symarr = np.frombuffer(symtab, dtype=np.uint8)
    cpos = out_starts[code_mask]
    clen = sym_lens[codes]
    if len(codes):
        src_start = sym_starts[codes]
        rw = _ranges_within(clen)
        seg = np.repeat(src_start, clen) + rw
        dst = np.repeat(cpos, clen) + rw
        out[dst] = symarr[seg]
    out[out_starts[is_literal]] = toks[is_literal]

    # per-string offsets: sum output lens over each string's byte-token span
    tok_bounds = np.concatenate(([0], np.cumsum(byte_counts))).astype(np.int64)
    cum_out = np.concatenate(([0], np.cumsum(out_lens))).astype(np.int64)
    offsets = cum_out[tok_bounds]
    return offsets, out.tobytes()


def _ranges_within(lens: np.ndarray) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] for an int array of lengths (zeros allowed)."""
    lens = lens[lens > 0]
    if len(lens) == 0:
        return np.zeros(0, dtype=np.int64)
    total = int(lens.sum())
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    if len(lens) > 1:
        ends = np.cumsum(lens)[:-1]
        out[ends] = -(lens[:-1] - 1)
    return np.cumsum(out)


# ---------------------------------------------------------------------------
# word-dictionary codec (wdict) — NL text as dictionary-coded tokens
# ---------------------------------------------------------------------------


def _uint_dtype_for(maxv: int) -> np.dtype:
    if maxv < 1 << 8:
        return np.dtype(np.uint8)
    if maxv < 1 << 16:
        return np.dtype(np.uint16)
    if maxv < 1 << 32:
        return np.dtype(np.uint32)
    return np.dtype(np.uint64)


def _enc_strbin_wdict(arr: pa.Array, level: int) -> tuple[dict, list[tuple[str, bytes]]]:
    """Dictionary-code natural-language text at WORD granularity (the north
    star's 'dictionary hash tables for text'): split each value on single
    spaces, dictionary-encode the token stream (arrow C++, first-occurrence
    order — deterministic per block), store per-row token counts + token
    codes as minimal-width uints compressed with zstd-1, plus the zstd'd
    token dictionary. split(' ')/join(' ') is an exact inverse for ANY
    value (consecutive/leading/trailing spaces become empty tokens), so the
    codec is lossless on arbitrary strings and binary.

    On Zipfian web text this lands ~40% smaller than zstd:6 at zstd:3-class
    speed; the trial tournament rejects it automatically when the token
    vocabulary explodes (urls, random bytes)."""
    a = arr.cast(pa.large_binary()) if not pa.types.is_large_binary(arr.type) else arr
    toks = pc.split_pattern(a, " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    denc = toks.flatten().dictionary_encode()
    codes = denc.indices.to_numpy()
    n_dict = len(denc.dictionary)
    cdt = _uint_dtype_for(max(n_dict - 1, 0))
    code_bytes = codes.astype(cdt).tobytes()
    ct_dt = _uint_dtype_for(int(counts.max()) if len(counts) else 0)
    count_bytes = counts.astype(ct_dt).tobytes()
    doff, ddata, _ = _strbin_of(denc.dictionary)
    dlens = np.diff(doff)
    dlw = bit_width(int(dlens.max())) if len(dlens) else 0
    params = {
        "n_dict": n_dict,
        "n_tokens": int(len(codes)),
        "code_dtype": cdt.str,
        "count_dtype": ct_dt.str,
        "codes_raw_len": len(code_bytes),
        "counts_raw_len": len(count_bytes),
        "dict_len_width": dlw,
        "dict_raw_len": len(ddata) if isinstance(ddata, bytes) else ddata.size,
        "level": level,
    }
    secs = [
        ("counts", zstd_compress(count_bytes, 1)),
        ("dict_lens", pack_bits(dlens.view(np.uint64), dlw)),
        ("dict_data", zstd_compress(ddata, level)),
        ("codes", zstd_compress(code_bytes, 1)),
    ]
    return params, secs


def _dec_strbin_wdict(block: EncodedBlock, n: int) -> tuple[np.ndarray, bytes]:
    p = block.header["params"]
    counts = np.frombuffer(
        zstd_decompress(block.section("counts"), p["counts_raw_len"]),
        dtype=np.dtype(p["count_dtype"]),
    ).astype(np.int64)
    codes = np.frombuffer(
        zstd_decompress(block.section("codes"), p["codes_raw_len"]),
        dtype=np.dtype(p["code_dtype"]),
    )
    dlens = unpack_bits(block.section("dict_lens"), p["n_dict"], p["dict_len_width"]).astype(np.int64)
    doff = np.concatenate(([0], np.cumsum(dlens))).astype(np.int64)
    ddata = zstd_decompress(block.section("dict_data"), p["dict_raw_len"])
    dvals = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), p["n_dict"],
        [None, pa.py_buffer(doff.tobytes()), pa.py_buffer(ddata)],
    )
    flat = dvals.take(pa.array(codes.astype(np.int64)))
    lst = pa.LargeListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int64()), flat
    )
    joined = pc.binary_join(lst, pa.scalar(b" ", pa.large_binary()))
    return _strbin_of(joined)[:2]


# ---------------------------------------------------------------------------
# front-coding codec (fc) — incremental prefix encoding for sorted-ish
# str/bin columns (the parquet DELTA_BYTE_ARRAY / ORC incremental idea)
# ---------------------------------------------------------------------------

FC_GROUP = 16  # restart stride: row i's prefix reference is row (i//G)*G


FC_MAX_PREFIX = 4096  # compare-window cap: bounds cost on very wide values


def _fc_prefix_lens(offsets: np.ndarray, src: np.ndarray, n: int) -> np.ndarray:
    """Per-row common-prefix length vs the row's group head, fully
    vectorized: one gathered byte-compare over min(len, head_len) windows,
    then per-row first mismatch by searchsorted over the global mismatch
    positions (no per-row Python). Group heads get 0 (they store full)."""
    lens = np.diff(offsets)
    rows_arange = np.arange(n, dtype=np.int64)
    head = (rows_arange // FC_GROUP) * FC_GROUP
    m = np.minimum(np.minimum(lens, lens[head]), FC_MAX_PREFIX)
    m[head == rows_arange] = 0
    if not m.any():
        return np.zeros(n, dtype=np.int64)
    within = _ranges_within(m)
    a = src[np.repeat(offsets[:-1], m) + within]
    b = src[np.repeat(offsets[:-1][head], m) + within]
    plen = m.astype(np.int64)
    neq_idx = np.flatnonzero(a != b)
    if len(neq_idx):
        # compare slots are laid out row-major: the first mismatch slot at
        # or after a row's segment start, if inside the segment, is that
        # row's first differing byte
        seg = np.concatenate(([np.int64(0)], np.cumsum(m)))
        k = np.searchsorted(neq_idx, seg[:-1], side="left")
        hit = neq_idx[np.minimum(k, len(neq_idx) - 1)]
        has = (k < len(neq_idx)) & (hit < seg[1:])
        plen[has] = hit[has] - seg[:-1][has]
    return plen


def _enc_strbin_fc(
    offsets: np.ndarray, data, level: int
) -> tuple[dict, list[tuple[str, bytes]]]:
    n = len(offsets) - 1
    lens = np.diff(offsets)
    src = (np.frombuffer(data, dtype=np.uint8) if len(data)
           else np.zeros(0, dtype=np.uint8))
    plen = _fc_prefix_lens(offsets, src, n) if n else np.zeros(0, np.int64)
    slen = lens - plen
    stored = src[np.repeat(offsets[:-1] + plen, slen) + _ranges_within(slen)].tobytes()
    pw = bit_width(int(plen.max())) if n and plen.size else 0
    params = {
        "plen_width": pw,
        "group": FC_GROUP,
        "raw_len": len(stored),
        "level": level,
    }
    secs = [
        ("plens", pack_bits(plen.view(np.uint64), pw)),
        ("data", zstd_compress(stored, level)),
    ]
    return params, secs


def _dec_strbin_fc(block: EncodedBlock, n: int) -> tuple[np.ndarray, bytes]:
    p = block.header["params"]
    lens = unpack_bits(block.section("lens"), n, p["len_width"]).astype(np.int64)
    plen = unpack_bits(block.section("plens"), n, p["plen_width"]).astype(np.int64)
    src = np.frombuffer(
        zstd_decompress(block.section("data"), p["raw_len"]), dtype=np.uint8)
    slen = lens - plen
    soff = np.concatenate(([np.int64(0)], np.cumsum(slen)))
    head = (np.arange(n, dtype=np.int64) // p["group"]) * p["group"]
    # output = head's stored bytes[:plen] (heads store full) + own suffix:
    # 2 gather segments per row, built in one repeat+ranges pass
    starts2 = np.empty(2 * n, dtype=np.int64)
    lens2 = np.empty(2 * n, dtype=np.int64)
    starts2[0::2] = soff[:-1][head]
    lens2[0::2] = plen
    starts2[1::2] = soff[:-1]
    lens2[1::2] = slen
    data = src[np.repeat(starts2, lens2) + _ranges_within(lens2)].tobytes()
    offsets = np.concatenate(([np.int64(0)], np.cumsum(lens))).astype(np.int64)
    return offsets, data


# ---------------------------------------------------------------------------
# cross-column reference codec (xref)
# ---------------------------------------------------------------------------

XREF_MIN_REF = 8  # shorter references aren't worth the position overhead


def xref_ref_of(codec: str) -> str | None:
    """The reference column named by an ``xref:<col>[:<level>]`` codec spec,
    or None for any other codec."""
    if not codec.startswith("xref"):
        return None
    parts = codec.split(":")
    if len(parts) < 2 or not parts[1]:
        raise ValueError(
            f"xref codec needs a reference column: 'xref:<col>[:<level>]' (got {codec!r})"
        )
    return parts[1]


def _enc_strbin_xref(offsets: np.ndarray, data, valid, ref_arr: pa.Array,
                     level: int) -> tuple[dict, list[tuple[str, bytes]]]:
    """Encode values as (position, residual) against a same-block reference
    column whose bytes are embedded verbatim in the value — the web-archive
    shape (html embeds the extracted text; the north-rule invariant is
    byte-identical text per url). Matched rows store only the bytes AROUND
    the reference occurrence; zstd then eats the shared template. Rows where
    the reference is null, too short, or absent fall back to storing the
    whole value (positions entry 0), so the codec is lossless on ANY input.

    Matching is bytes.find (C memmem) on the block's single data buffer with
    per-row bounds — no per-row slicing of the haystack. A carried guess
    offset (templates put the payload at the same offset row after row)
    turns the common case into one bounded startswith probe.

    v2 layout (round 5): residuals are stored as TWO contiguous streams —
    'head' (bytes before the match; the whole value for fallback rows) and
    'tail' (bytes after the match; nothing for fallback rows) — instead of
    one interleaved 'data' stream. Per-stream layout makes decode fully
    vectorizable (zero-copy from_buffers + one binary_join_element_wise,
    measured 2.4x vs the v1 per-row loop) and compresses marginally better
    (like-bytes adjacency). decode keeps a v1 branch for old blocks."""
    roff, rdata, rvalid = _strbin_of(ref_arr)
    n = len(offsets) - 1
    hay = data if isinstance(data, bytes) else bytes(data)
    ref_bytes = rdata if isinstance(rdata, bytes) else bytes(rdata)
    offs = offsets.tolist()
    roffs = roff.tolist()
    pos1 = np.zeros(n, dtype=np.int64)  # match position + 1; 0 = fallback
    heads: list[bytes] = []
    tails: list[bytes] = []
    guess = -1
    n_matched = 0
    for i in range(n):
        va, vb = offs[i], offs[i + 1]
        ra, rb = roffs[i], roffs[i + 1]
        rl = rb - ra
        p = -1
        if (
            XREF_MIN_REF <= rl <= vb - va
            and (valid is None or valid[i])
            and (rvalid is None or rvalid[i])
        ):
            needle = ref_bytes[ra:rb]
            if 0 <= guess <= (vb - va - rl) and hay.startswith(needle, va + guess, vb):
                p = va + guess
            else:
                p = hay.find(needle, va, vb)
        if p < 0:
            heads.append(hay[va:vb])
        else:
            rel = p - va
            guess = rel
            pos1[i] = rel + 1
            n_matched += 1
            heads.append(hay[va:p])
            tails.append(hay[p + rl : vb])
    head = b"".join(heads)
    tail = b"".join(tails)
    pw = bit_width(int(pos1.max())) if n and int(pos1.max()) > 0 else 0
    params = {
        "head_raw_len": len(head),
        "tail_raw_len": len(tail),
        "level": level,
        "pos_width": pw,
        "n_matched": n_matched,
    }
    secs = [
        ("positions", pack_bits(pos1.view(np.uint64), pw)),
        ("head", zstd_compress(head, level)),
        ("tail", zstd_compress(tail, level)),
    ]
    return params, secs


def _dec_strbin_xref(block: EncodedBlock, n: int,
                     ref_arr: pa.Array) -> tuple[np.ndarray, "bytes | pa.Buffer"]:
    """Rebuild (offsets, data) from positions + residuals + the DECODED
    reference column (which must be bit-identical to the encode-time
    reference — guaranteed by its own codec's round trip).

    v2 blocks ('head'/'tail' sections) decode with NO per-row Python: both
    residual streams wrap zero-copy into large_binary arrays (offsets are
    cumsums of lengths derivable from positions + value lens), the
    reference rides as-is, and one C++ binary_join_element_wise emits the
    output bytes — 2.4x the v1 loop on the web corpus. v1 blocks (single
    interleaved 'data' stream) keep the per-row bytes-slice loop; a numpy
    per-byte gather was measured 3x SLOWER there (index arrays octuple the
    byte traffic), and memoryview slicing 2x slower (buffer-protocol
    overhead per part)."""
    p = block.header["params"]
    lens = unpack_bits(block.section("lens"), n, p["len_width"]).astype(np.int64)
    pos1 = unpack_bits(block.section("positions"), n, p["pos_width"]).astype(np.int64)
    roff, rdata, _ = _strbin_of(ref_arr)

    if block.has_section("head"):  # v2 two-stream layout
        head_b = zstd_decompress(block.section("head"), p["head_raw_len"])
        tail_b = zstd_decompress(block.section("tail"), p["tail_raw_len"])
        rlen = np.diff(roff)
        m = pos1 > 0
        head_lens = np.where(m, pos1 - 1, lens)
        tail_lens = np.where(m, lens - head_lens - rlen, 0)
        hoff = np.concatenate(([0], np.cumsum(head_lens))).astype(np.int64)
        toff = np.concatenate(([0], np.cumsum(tail_lens))).astype(np.int64)
        head_arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(hoff.tobytes()), pa.py_buffer(head_b)])
        tail_arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(toff.tobytes()), pa.py_buffer(tail_b)])
        if pa.types.is_string(ref_arr.type) or pa.types.is_large_string(ref_arr.type):
            ref_lb = ref_arr.fill_null("").cast(pa.large_binary())
        else:
            ref_lb = ref_arr.fill_null(b"").cast(pa.large_binary())
        ref_part = pc.if_else(pa.array(m), ref_lb,
                              pa.scalar(b"", pa.large_binary()))
        joined = pc.binary_join_element_wise(
            head_arr, ref_part, tail_arr, pa.scalar(b"", pa.large_binary()))
        offsets, data, _ = _strbin_of(joined)
        return offsets, data

    residual = zstd_decompress(block.section("data"), p["raw_len"])
    ref_bytes = rdata if isinstance(rdata, bytes) else bytes(rdata)
    lens_l = lens.tolist()
    pos_l = pos1.tolist()
    roffs = roff.tolist()
    parts = []
    ro = 0
    for i in range(n):
        vlen = lens_l[i]
        rel = pos_l[i] - 1               # -1 = fallback (whole value stored)
        if rel < 0:
            parts.append(residual[ro : ro + vlen])
            ro += vlen
        else:
            ra, rb = roffs[i], roffs[i + 1]
            res_len = vlen - (rb - ra)
            parts.append(residual[ro : ro + rel])
            parts.append(ref_bytes[ra:rb])
            parts.append(residual[ro + rel : ro + res_len])
            ro += res_len
    data = b"".join(parts)
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    return offsets, data


# ---------------------------------------------------------------------------
# top-level encode/decode per array
# ---------------------------------------------------------------------------


def encode_array(arr: pa.Array, codec: str, ref_arr: pa.Array | None = None) -> EncodedBlock:
    """Encode one pyarrow array chunk with the named codec.

    Any general-purpose codec (zstd/brotli/lz4/gzip) accepts a level
    suffix ("zstd:6", "brotli:9"); the level only affects encode (decode
    is level-agnostic). ``xref:<col>[:<level>]`` encodes against a
    reference column (pass its same-block array as ``ref_arr``)."""
    level = _ZSTD_LEVEL
    xref_name = None
    sub_codec = codec  # original spelling (with level) for list-child recursion
    base = codec.split(":", 1)[0]
    if base in GP_CODECS:
        level = (int(codec.split(":", 1)[1]) if ":" in codec
                 else _GP_DEFAULT_LEVEL[base])
        codec = base
    elif base in ("bss", "fc"):
        if ":" in codec:
            level = int(codec.split(":", 1)[1])
        codec = base
    elif codec.startswith("xref"):
        xref_name = xref_ref_of(codec)
        parts = codec.split(":")
        if len(parts) > 2:
            level = int(parts[2])
        codec = "xref"
        if ref_arr is None:
            raise ValueError(
                f"xref codec for reference column {xref_name!r} requires ref_arr"
            )
        if len(ref_arr) != len(arr):
            raise ValueError(
                f"xref ref_arr has {len(ref_arr)} rows, value column has {len(arr)}"
            )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    typ = arr.type
    kind = kind_of(typ)
    n = len(arr)
    header = {
        "codec": codec,
        "kind": kind,
        "type": str(typ),
        "n": n,
        "null_count": arr.null_count,
    }
    valid = _validity_of(arr)
    vsec = ("validity", pack_validity(valid))

    if kind == "list":
        if codec == "xref":
            raise ValueError("xref codec is not valid for list kind")
        # canonical form: per-row lengths (null rows -> 0, bit-packed) plus
        # the flattened child values (null rows contribute no slots),
        # encoded RECURSIVELY with the same codec spelling — "alp" on an
        # array<float> column means lens + ALP over the flattened floats,
        # "fsst" on array<string> means lens + FSST over the flat strings,
        # and nested lists peel one level per recursion. Child validity
        # (nulls inside lists) rides in the child block's own section.
        lens64 = (
            np.asarray(pc.list_value_length(arr).fill_null(0), dtype=np.int64)
            if n else np.zeros(0, dtype=np.int64)
        )
        child = arr.flatten()
        lw = bit_width(int(lens64.max())) if n and lens64.size else 0
        cblk = encode_array(child, sub_codec)
        fld = typ.value_field
        header["params"] = {
            "len_width": lw,
            "child_header": cblk.header,
            "field": fld.name,
            "field_nullable": bool(fld.nullable),
            "large": bool(pa.types.is_large_list(typ)),
        }
        secs = [
            ("lens", pack_bits(lens64.view(np.uint64), lw)),
            ("child", cblk.payload),
        ]
        return _build(header, secs + [vsec])

    if kind == "int":
        vals, valid = _ints_of(arr)
        if codec == "plain":
            secs = [("values", vals.tobytes())]
            params = {}
        elif codec in GP_CODECS:
            raw = vals.tobytes()
            secs = [("values", gp_compress(raw, codec, level))]
            params = {"raw_len": len(raw), "level": level}
        elif codec == "for_bitpack":
            params, secs = _enc_int_for(vals)
        elif codec == "delta_bitpack":
            params, secs = _enc_int_delta(vals)
        elif codec == "dod_bitpack":
            params, secs = _enc_int_dod(vals)
        elif codec == "sparse_for":
            params, secs = _enc_int_sparse_for(vals, valid)
        elif codec == "rle":
            params, secs = _enc_int_rle(vals)
        elif codec == "dict":
            uniq, codes = np.unique(vals, return_inverse=True)
            w = bit_width(len(uniq) - 1) if len(uniq) > 1 else 0
            raw = uniq.tobytes()
            params = {"n_dict": len(uniq), "width": w, "dict_raw_len": len(raw)}
            secs = [
                ("dict", zstd_compress(raw)),
                ("codes", pack_bits(codes.astype(np.uint64), w)),
            ]
        else:
            raise ValueError(f"codec {codec} not valid for int kind")
        header["params"] = params
        return _build(header, secs + [vsec])

    if kind == "float":
        fvals = np.asarray(arr.fill_null(0.0))
        raw = fvals.tobytes()
        if codec == "plain":
            secs = [("values", raw)]
            params = {"dtype": str(fvals.dtype)}
        elif codec in GP_CODECS:
            secs = [("values", gp_compress(raw, codec, level))]
            params = {"dtype": str(fvals.dtype), "raw_len": len(raw), "level": level}
        elif codec == "alp":
            params, secs = _enc_float_alp(fvals)
        elif codec == "bss":
            # byte-stream split (the parquet BYTE_STREAM_SPLIT idea):
            # transpose value bytes into per-byte-position planes so the
            # skewed sign/exponent planes compress well under zstd while
            # mantissa planes ride near-raw — ~8% over whole-value zstd on
            # full-precision float32 (where ALP's exception list loses)
            w = fvals.itemsize
            planes = (fvals.view(np.uint8).reshape(-1, w).T.copy().tobytes()
                      if n else b"")
            secs = [("values", zstd_compress(planes, level))]
            params = {"dtype": str(fvals.dtype), "raw_len": len(planes),
                      "level": level}
        elif codec == "dict":
            # dict over the IEEE bit patterns, not float values: preserves
            # -0.0 vs 0.0 and distinct NaN payloads (np.unique on floats
            # canonicalizes both), keeping the codec bit-identical
            bits = fvals.view(np.dtype(f"u{fvals.dtype.itemsize}"))
            uniq, codes = np.unique(bits, return_inverse=True)
            w = bit_width(len(uniq) - 1) if len(uniq) > 1 else 0
            uraw = uniq.tobytes()
            params = {
                "dtype": str(fvals.dtype),
                "n_dict": len(uniq),
                "width": w,
                "dict_raw_len": len(uraw),
                "bitdict": True,
            }
            secs = [("dict", zstd_compress(uraw)), ("codes", pack_bits(codes.astype(np.uint64), w))]
        else:
            raise ValueError(f"codec {codec} not valid for float kind")
        header["params"] = params
        return _build(header, secs + [vsec])

    if kind in ("str", "bin"):
        offsets, data, valid = _strbin_of(arr)
        lens = np.diff(offsets)
        lw = bit_width(int(lens.max())) if n and lens.size else 0
        len_sec = ("lens", pack_bits(lens.view(np.uint64), lw))
        if codec == "plain":
            params = {"len_width": lw}
            secs = [len_sec, ("data", data)]
        elif codec in GP_CODECS:
            params = {"len_width": lw, "raw_len": len(data), "level": level}
            secs = [len_sec, ("data", gp_compress(data, codec, level))]
        elif codec == "fsst":
            params, fsecs = fsst_encode(offsets, data)
            params["len_width"] = lw  # unused but kept for inspect symmetry
            secs = fsecs
        elif codec == "xref":
            params, xsecs = _enc_strbin_xref(offsets, data, valid, ref_arr, level)
            params["len_width"] = lw
            params["ref"] = xref_name
            secs = [len_sec] + xsecs
        elif codec == "fc":
            params, fcsecs = _enc_strbin_fc(offsets, data, level)
            params["len_width"] = lw
            secs = [len_sec] + fcsecs
        elif codec == "wdict":
            params, secs = _enc_strbin_wdict(arr.fill_null("" if kind == "str" else b""), level)
        elif codec in ("dict", "rle"):
            denc = arr.dictionary_encode()
            dcodes = np.asarray(denc.indices.fill_null(0), dtype=np.int64)
            dvals = denc.dictionary
            doff, ddata, _ = _strbin_of(dvals)
            dlens = np.diff(doff)
            dlw = bit_width(int(dlens.max())) if len(dlens) else 0
            w = bit_width(len(dvals) - 1) if len(dvals) > 1 else 0
            params = {
                "n_dict": len(dvals),
                "width": w,
                "dict_len_width": dlw,
                "dict_raw_len": len(ddata),
            }
            dict_secs = [
                ("dict_lens", pack_bits(dlens.view(np.uint64), dlw)),
                ("dict_data", zstd_compress(ddata)),
            ]
            if codec == "dict":
                secs = dict_secs + [("codes", pack_bits(dcodes.astype(np.uint64), w))]
            else:
                rparams, rsecs = _enc_int_rle(dcodes)
                params["rle"] = rparams
                secs = dict_secs + [(f"rle_{nm}", bb) for nm, bb in rsecs]
        else:
            raise ValueError(f"codec {codec} not valid for {kind} kind")
        header["params"] = params
        return _build(header, secs + [vsec])

    # fallback for exotic types: arrow IPC + zstd round-trip (still columnar)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, pa.schema([("c", typ)])) as w:
        w.write_batch(pa.record_batch([arr], names=["c"]))
    raw = sink.getvalue().to_pybytes()
    header["params"] = {"raw_len": len(raw)}
    header["codec"] = "ipc_zstd"
    return _build(header, [("ipc", zstd_compress(raw)), vsec])


def decode_array(block: EncodedBlock, ref_arr: pa.Array | None = None) -> pa.Array:
    h = block.header
    codec, kind, n = h["codec"], h["kind"], h["n"]
    typ = _type_from_str(h["type"])
    valid = unpack_validity(block.section("validity"), n) if block.has_section("validity") else None
    p = h.get("params", {})

    if codec == "ipc_zstd":
        raw = zstd_decompress(block.section("ipc"), p["raw_len"])
        with pa.ipc.open_stream(pa.BufferReader(raw)) as r:
            batch = r.read_all()
        return batch.column("c").combine_chunks()

    if kind == "list":
        cblk = EncodedBlock(p["child_header"], block.section("child"))
        child = decode_array(cblk)
        lens = unpack_bits(block.section("lens"), n, p["len_width"]).astype(np.int64)
        offsets = np.concatenate(([np.int64(0)], np.cumsum(lens)))
        fld = pa.field(p["field"], child.type, nullable=p["field_nullable"])
        vbuf = pa.py_buffer(pack_validity(valid)) if valid is not None else None
        if p["large"]:
            ltyp, obuf = pa.large_list(fld), pa.py_buffer(offsets.tobytes())
        else:
            ltyp = pa.list_(fld)
            obuf = pa.py_buffer(offsets.astype(np.int32).tobytes())
        return pa.Array.from_buffers(ltyp, n, [vbuf, obuf], children=[child])

    if kind == "int":
        if codec == "plain":
            vals = np.frombuffer(block.section("values"), dtype=np.int64)
        elif codec in GP_CODECS:
            vals = np.frombuffer(gp_decompress(block.section("values"), p["raw_len"], codec), dtype=np.int64)
        elif codec == "for_bitpack":
            vals = _dec_int_for(block, n)
        elif codec == "delta_bitpack":
            vals = _dec_int_delta(block, n)
        elif codec == "dod_bitpack":
            vals = _dec_int_dod(block, n)
        elif codec == "sparse_for":
            vals = _dec_int_sparse_for(block, n, valid)
        elif codec == "rle":
            vals = _dec_int_rle(block, n)
        elif codec == "dict":
            uniq = np.frombuffer(zstd_decompress(block.section("dict"), p["dict_raw_len"]), dtype=np.int64)
            codes = unpack_bits(block.section("codes"), n, p["width"]).astype(np.int64)
            vals = uniq[codes] if len(uniq) else np.zeros(n, dtype=np.int64)
        else:
            raise ValueError(codec)
        return _restore_int_array(vals, valid, typ)

    if kind == "float":
        dtype = np.dtype(p["dtype"])
        if codec == "plain":
            fvals = np.frombuffer(block.section("values"), dtype=dtype)
        elif codec in GP_CODECS:
            fvals = np.frombuffer(gp_decompress(block.section("values"), p["raw_len"], codec), dtype=dtype)
        elif codec == "alp":
            fvals = _dec_float_alp(block, n)
        elif codec == "bss":
            w = dtype.itemsize
            raw = zstd_decompress(block.section("values"), p["raw_len"])
            fvals = (
                np.frombuffer(raw, dtype=np.uint8).reshape(w, n).T
                .copy().view(dtype).ravel()
                if n else np.zeros(0, dtype=dtype)
            )
        elif codec == "dict":
            # bitdict blocks store uint bit patterns (see encode); legacy
            # blocks stored float values directly
            ddt = np.dtype(f"u{dtype.itemsize}") if p.get("bitdict") else dtype
            uniq = np.frombuffer(zstd_decompress(block.section("dict"), p["dict_raw_len"]), dtype=ddt)
            codes = unpack_bits(block.section("codes"), n, p["width"]).astype(np.int64)
            fvals = (uniq[codes] if len(uniq) else np.zeros(n, dtype=ddt)).view(dtype)
        else:
            raise ValueError(codec)
        mask = None if valid is None else ~valid
        return pa.array(fvals, type=typ, mask=mask)

    if kind in ("str", "bin"):
        if codec == "plain" or codec in GP_CODECS:
            lens = unpack_bits(block.section("lens"), n, p["len_width"]).astype(np.int64)
            offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            data = block.section("data")
            if codec != "plain":
                data = gp_decompress(data, p["raw_len"], codec)
        elif codec == "fsst":
            offsets, data = fsst_decode(block, n)
        elif codec == "xref":
            if ref_arr is None:
                raise ValueError(
                    f"xref block references column {p.get('ref')!r}: "
                    "pass its decoded array as ref_arr"
                )
            if len(ref_arr) != n:
                raise ValueError(
                    f"xref ref_arr has {len(ref_arr)} rows, block has {n}"
                )
            offsets, data = _dec_strbin_xref(block, n, ref_arr)
        elif codec == "wdict":
            offsets, data = _dec_strbin_wdict(block, n)
        elif codec == "fc":
            offsets, data = _dec_strbin_fc(block, n)
        elif codec in ("dict", "rle"):
            dlens = unpack_bits(block.section("dict_lens"), p["n_dict"], p["dict_len_width"]).astype(np.int64)
            doff = np.concatenate(([0], np.cumsum(dlens))).astype(np.int64)
            ddata = zstd_decompress(block.section("dict_data"), p["dict_raw_len"])
            if codec == "dict":
                codes = unpack_bits(block.section("codes"), n, p["width"]).astype(np.int64)
            else:
                sub_secs = [(nm[4:], block.section(nm)) for nm, _ in h["sections"] if nm.startswith("rle_")]
                sub = _build({"params": p["rle"]}, sub_secs)
                codes = _dec_int_rle(sub, n)
            # gather dict entries by code: offsets/lens per row
            row_lens = dlens[codes] if p["n_dict"] else np.zeros(n, dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(row_lens))).astype(np.int64)
            src = np.frombuffer(ddata, dtype=np.uint8)
            starts = doff[codes] if p["n_dict"] else np.zeros(n, dtype=np.int64)
            seg = np.repeat(starts, row_lens) + _ranges_within(row_lens)
            data = src[seg].tobytes()
        else:
            raise ValueError(codec)
        return _restore_strbin_array(offsets, data, valid, typ)

    raise ValueError(f"cannot decode kind {kind}")


def _type_from_str(s: str) -> pa.DataType:
    simple = {
        "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
        "uint8": pa.uint8(), "uint16": pa.uint16(), "uint32": pa.uint32(), "uint64": pa.uint64(),
        "float": pa.float32(), "double": pa.float64(), "halffloat": pa.float16(),
        "string": pa.string(), "large_string": pa.large_string(),
        "binary": pa.binary(), "large_binary": pa.large_binary(),
        "bool": pa.bool_(), "date32[day]": pa.date32(), "date64[ms]": pa.date64(),
    }
    if s in simple:
        return simple[s]
    if s.startswith("timestamp["):
        inner = s[len("timestamp[") : -1]
        if ", tz=" in inner:
            unit, tz = inner.split(", tz=")
            return pa.timestamp(unit, tz=tz)
        return pa.timestamp(inner)
    if s.startswith("time32["):
        return pa.time32(s[7:-1])
    if s.startswith("time64["):
        return pa.time64(s[7:-1])
    if s.startswith("decimal128("):
        prec, scale = s[len("decimal128("):-1].split(",")
        return pa.decimal128(int(prec), int(scale))
    # list<item: float>, large_list<element: string not null>, nested lists
    for prefix, ctor in (("list<", pa.list_), ("large_list<", pa.large_list)):
        if s.startswith(prefix) and s.endswith(">"):
            inner = s[len(prefix):-1]
            name, sep, rest = inner.partition(": ")
            if not sep:
                raise ValueError(f"unsupported type string {s}")
            nullable = True
            if rest.endswith(" not null"):
                nullable, rest = False, rest[: -len(" not null")]
            return ctor(pa.field(name, _type_from_str(rest), nullable=nullable))
    raise ValueError(f"unsupported type string {s}")


VALID_CODECS = {
    "int": ["plain", "zstd", "brotli", "lz4", "gzip", "for_bitpack",
            "delta_bitpack", "dod_bitpack", "sparse_for", "rle", "dict"],
    "float": ["plain", "zstd", "brotli", "lz4", "gzip", "dict", "alp", "bss"],
    "str": ["plain", "zstd", "brotli", "lz4", "gzip", "fsst", "dict", "rle", "wdict", "fc"],
    "bin": ["plain", "zstd", "brotli", "lz4", "gzip", "fsst", "dict", "rle", "wdict", "fc"],
    # list<primitive> encodes lens + the flattened child with the SAME codec
    # name, so any codec valid for the child kind is valid here (not xref:
    # the child rows don't align with any same-block reference column)
    "list": ["plain", "zstd", "brotli", "lz4", "gzip", "alp", "bss", "dict",
             "rle", "for_bitpack", "delta_bitpack", "dod_bitpack",
             "sparse_for", "fsst", "wdict", "fc"],
    # "xref:<ref>[:level]" is also valid for str/bin but needs a same-block
    # reference array, so the single-column test matrices exclude it
    # (tests/test_xref.py covers it end to end)
}
