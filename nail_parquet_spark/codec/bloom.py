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
                k: int = DEFAULT_K) -> bytes | None:
    """Build one block's bloom bitmap over the DISTINCT non-null values of
    ``arr``. Returns None for unsupported types or empty input (an all-null
    block gets an empty-domain bloom so equality prunes it)."""
    from nail_parquet_spark.codec.kernels import kind_of

    kind = kind_of(arr.type)
    if kind not in ("str", "int"):
        return None
    distinct = pc.unique(arr.drop_null())
    n = len(distinct)
    m_bits = max(64, ((bits_per_key * max(n, 1) + 7) // 8) * 8)
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if n:
        pos = np.empty(n * k, dtype=np.int64)
        vals = distinct.to_pylist()
        i = 0
        for v in vals:
            b = canonical_bytes(v, kind)
            h1, h2 = bloom_lanes(b)
            for j in range(k):
                pos[i] = (h1 + j * h2) % m_bits
                i += 1
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bytes([k]) + int(m_bits).to_bytes(4, "big") + bits.tobytes()


def bloom_might_contain(bloom: bytes, value, kind: str) -> bool:
    """Driver/test-side membership probe (the SQL expression's twin)."""
    if bloom is None:
        return True
    b = canonical_bytes(value, kind)
    if b is None:
        return True
    k = bloom[0]
    m_bits = int.from_bytes(bloom[1:5], "big")
    h1, h2 = bloom_lanes(b)
    for j in range(k):
        p = (h1 + j * h2) % m_bits
        if not (bloom[5 + (p >> 3)] >> (p & 7)) & 1:
            return False
    return True


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
    h1, h2 = bloom_lanes(vb)
    m = f"cast(conv(hex(substring({bloom_col}, 2, 4)), 16, 10) as bigint)"
    probes = []
    for j in range(k):
        # numerator precomputed driver-side: fits int64 by the 57-bit lanes
        pos = f"pmod({h1 + j * h2}L, {m})"
        byte = (f"cast(conv(hex(substring({bloom_col}, "
                f"6 + cast(({pos}) / 8 as int), 1)), 16, 10) as int)")
        probes.append(f"(({byte} & shiftleft(1, cast(pmod({pos}, 8) as int))) != 0)")
    return "(" + " AND ".join(probes) + ")"


def expected_fpp(n_keys: int, m_bits: int, k: int = DEFAULT_K) -> float:
    """Textbook bloom false-positive rate (for docs/tests)."""
    if m_bits <= 0:
        return 1.0
    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k
