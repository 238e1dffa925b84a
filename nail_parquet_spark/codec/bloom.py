"""Per-block bloom filters: equality pushdown for high-cardinality columns.

Zone maps (codec/decode.prune_blocks) prune range predicates well, but an
equality probe on a high-cardinality column (``url = '...'``, ``doc_id =
42``) rarely prunes anything — nearly every block's [min,max] spans the
probe value. The parquet format solved this with optional split-block bloom
filters; this is the block-engine analogue: an opt-in, per-(column, block)
bloom bitmap stored in the ``bloom`` column of the blocks table, consulted
by ``decode_table_where*`` for ``=`` conjuncts.

Design for 100 TB:
- The bitmap never rides with the payload: pruning projects only the meta
  columns + ``bloom`` (~1.25 bytes per distinct value at the default 10
  bits/key), so the prune scan reads KBs per block, not MBs.
- The membership test runs DISTRIBUTED as a Catalyst expression: the probe
  value is hashed driver-side into k (h1 + i*h2) seeds, and the k bit
  probes are pure substring/conv/bit arithmetic on the ``bloom`` bytes —
  no Python, no UDF, no collect of bitmaps. Only the surviving
  (part_id, block_id) keep-set is collected (same O(#groups) contract as
  zone pruning).
- Opt-in per column (``encode_table(bloom_columns=[...])``): a bloom on a
  low-cardinality or never-probed column is pure write amplification.

Layout (bytes, all big-endian so SQL ``conv(hex(substring(...)))`` can read
them): [0]=k, [1:5]=m_bits, [5:]=bitmap. ``m_bits`` is per-block (sized to
the block's distinct count), which is why it lives in the bitmap header and
not the block header JSON.

Hashing: md5(value-bytes) -> two 57-bit lanes, double hashing
pos_i = (h1 + i*h2) mod m_bits. 57-bit lanes keep h1 + (k-1)*h2 <= 7*2^57
inside int64, so the SQL probe can carry each position's numerator as a
plain bigint literal. Value canonicalization is type-pinned: strings hash their
UTF-8 bytes, integers/booleans hash str(int(v)) — the probe side must (and
does) canonicalize identically.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BITS_PER_KEY = 10
DEFAULT_K = 7
_LANE_MASK = (1 << 57) - 1
# prefix-key support: when a bloom is built with ``prefix_len=P``, the
# first-P-byte prefix of every distinct value is ALSO inserted (tagged so
# prefix keys share the bitmap without inflating the eq-probe FPP), byte 0
# carries this flag, and P rides as the trailing byte — the bitmap itself
# stays at offset 5, so pre-prefix bitmaps and the eq probe layout are
# unchanged. A prefix predicate with len(prefix) >= P then probes the
# TRUNCATED prefix: any value starting with the full query prefix also
# starts with its first P bytes, so truncation is sound (false positives
# only, never false negatives).
_PREFIX_FLAG = 0x80
_PREFIX_TAG = b"\x01p\x01"


def bloom_lanes(value_bytes: bytes) -> tuple[int, int]:
    d = hashlib.md5(value_bytes).digest()
    h1 = int.from_bytes(d[:8], "big") & _LANE_MASK
    h2 = (int.from_bytes(d[8:], "big") & _LANE_MASK) | 1
    return h1, h2


def canonical_bytes(value, kind: str) -> bytes | None:
    """Type-pinned canonical byte string for hashing; None = this value
    cannot participate (no bloom prune, never wrong)."""
    if value is None:
        return None
    if kind == "str":
        return str(value).encode("utf-8")
    if kind == "int":
        try:
            return str(int(value)).encode("ascii")
        except (TypeError, ValueError):
            return None
    return None  # float/timestamp/binary: no bloom


def bloom_build(arr: pa.Array, bits_per_key: int = DEFAULT_BITS_PER_KEY,
                k: int = DEFAULT_K, prefix_len: int | None = None) -> bytes | None:
    """Build one block's bloom bitmap over the DISTINCT non-null values of
    ``arr``. Returns None for unsupported types or empty input (an all-null
    block gets an empty-domain bloom so equality prunes it).

    ``prefix_len``: str columns only — also insert the tagged first-P-byte
    prefix of every distinct value, enabling ``prefix`` pushdown for query
    prefixes of at least P bytes. URLs share hosts, so the extra key count
    is typically a small fraction of the value count; sizing uses the
    ACTUAL total inserted keys either way."""
    from nail_parquet_spark.codec.kernels import kind_of

    kind = kind_of(arr.type)
    if kind not in ("str", "int"):
        return None
    if prefix_len is not None and (kind != "str" or not 1 <= prefix_len <= 255):
        raise ValueError(
            f"prefix_len must be 1..255 on a string column, got {prefix_len!r} "
            f"on kind {kind!r}"
        )
    distinct = pc.unique(arr.drop_null())
    keys = [canonical_bytes(v, kind) for v in distinct.to_pylist()]
    if prefix_len:
        keys.extend({_PREFIX_TAG + b[:prefix_len] for b in keys})
    n = len(keys)
    m_bits = max(64, ((bits_per_key * max(n, 1) + 7) // 8) * 8)
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if n:
        pos = np.empty(n * k, dtype=np.int64)
        i = 0
        for b in keys:
            h1, h2 = bloom_lanes(b)
            for j in range(k):
                pos[i] = (h1 + j * h2) % m_bits
                i += 1
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    flag = _PREFIX_FLAG if prefix_len else 0
    tail = bytes([prefix_len]) if prefix_len else b""
    return bytes([k | flag]) + int(m_bits).to_bytes(4, "big") + bits.tobytes() + tail


def bloom_prefix_len_of(bloom: bytes) -> int | None:
    """The prefix-key length a bitmap was built with, or None."""
    if bloom is None or not bloom[0] & _PREFIX_FLAG:
        return None
    return bloom[-1]


def bloom_might_contain(bloom: bytes, value, kind: str,
                        op: str = "=") -> bool:
    """Driver/test-side membership probe (the SQL expression's twin).

    ``op='prefix'``: probes the tagged truncated prefix; returns True
    (no prune) when the bitmap carries no prefix keys or the query prefix
    is shorter than the stored P."""
    if bloom is None:
        return True
    b = canonical_bytes(value, kind)
    if b is None:
        return True
    if op == "prefix":
        plen = bloom_prefix_len_of(bloom)
        if plen is None or len(b) < plen:
            return True
        b = _PREFIX_TAG + b[:plen]
    k = bloom[0] & ~_PREFIX_FLAG
    m_bits = int.from_bytes(bloom[1:5], "big")
    h1, h2 = bloom_lanes(b)
    for j in range(k):
        p = (h1 + j * h2) % m_bits
        if not (bloom[5 + (p >> 3)] >> (p & 7)) & 1:
            return False
    return True


def _probe_conjunction(bloom_col: str, key: bytes, k: int) -> str:
    """The k bit-probe AND-chain for one hashed key (shared by eq/prefix)."""
    h1, h2 = bloom_lanes(key)
    m = f"cast(conv(hex(substring({bloom_col}, 2, 4)), 16, 10) as bigint)"
    probes = []
    for j in range(k):
        pos = f"pmod({h1 + j * h2}L, {m})"
        byte = (f"cast(conv(hex(substring({bloom_col}, "
                f"6 + cast(({pos}) / 8 as int), 1)), 16, 10) as int)")
        probes.append(f"(({byte} & shiftleft(1, cast(pmod({pos}, 8) as int))) != 0)")
    return "(" + " AND ".join(probes) + ")"


def bloom_prefix_probe_sql(bloom_col: str, value, plens: list[int],
                           k: int = DEFAULT_K) -> "str | None":
    """Catalyst SQL boolean: might ``bloom_col`` contain a value with
    string prefix ``value``?

    ``plens``: the stored prefix-key lengths present in the table (from
    :func:`discover_prefix_lens` — one encode run uses one P, but mixed
    dirs are legal). Each block is probed with its OWN P via a CASE on the
    trailing byte; blocks with no prefix keys, or whose P exceeds the
    query prefix, stay un-pruned (true). Returns None when no stored P is
    usable — caller skips bloom pruning entirely."""
    vb = canonical_bytes(value, "str")
    if vb is None:
        return None
    usable = sorted({p for p in plens if 1 <= p <= len(vb)})
    if not usable:
        return None
    flag = (f"(cast(conv(hex(substring({bloom_col}, 1, 1)), 16, 10) as int)"
            f" & {_PREFIX_FLAG}) != 0")
    plen = f"cast(conv(hex(substring({bloom_col}, -1, 1)), 16, 10) as int)"
    arms = " ".join(
        f"WHEN {p} THEN {_probe_conjunction(bloom_col, _PREFIX_TAG + vb[:p], k)}"
        for p in usable
    )
    return f"(NOT ({flag}) OR (CASE {plen} {arms} ELSE true END))"


def bloom_probe_sql(bloom_col: str, value, kind: str,
                    k: int = DEFAULT_K) -> "str | None":
    """Catalyst SQL boolean: might ``bloom_col`` contain ``value``?

    NULL bloom => NULL (caller treats as keep). The k byte probes read the
    big-endian header fields with substring/hex/conv — whole-stage-codegen
    arithmetic, no UDF. ``k`` must match the encode-side constant (it is
    also byte 0 of the bitmap; the expression trusts the pinned constant
    and the tests pin the two together)."""
    vb = canonical_bytes(value, kind)
    if vb is None:
        return None
    # numerators precomputed driver-side: fit int64 by the 57-bit lanes
    return _probe_conjunction(bloom_col, vb, k)


def parse_bloom_spec(specs) -> dict[str, "int | None"]:
    """Normalize bloom column specs to {column: prefix_len_or_None}.

    Accepts a dict (returned as-is), or an iterable of "col" /
    "col:<prefix_len>" strings — the CLI's ``--bloom-columns url:16,id``
    form."""
    if specs is None:
        return {}
    if isinstance(specs, dict):
        return dict(specs)
    out: dict[str, int | None] = {}
    for s in specs:
        if ":" in s:
            name, p = s.split(":", 1)
            out[name] = int(p)
        else:
            out[s] = None
    return out


def expected_fpp(n_keys: int, m_bits: int, k: int = DEFAULT_K) -> float:
    """Textbook bloom false-positive rate (for docs/tests)."""
    if m_bits <= 0:
        return 1.0
    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k
