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
# n-gram-key support: with ``ngram_len=N``, every length-N byte window of
# every distinct value is ALSO inserted (tagged) — a ``contains`` predicate
# with len(query) >= N then requires ALL of the query's own N-grams, each a
# substring of any containing value, so ANDing their probes prunes blocks
# soundly (false positives only). Flag 0x40 in byte 0; N rides as a
# trailing byte AFTER the prefix byte when both are present (pinned order:
# [P if prefix][N if ngram]) — the bitmap stays at offset 5 regardless.
_NGRAM_FLAG = 0x40
_NGRAM_TAG = b"\x01n\x01"
_FLAGS_MASK = _PREFIX_FLAG | _NGRAM_FLAG
_NGRAM_PROBE_CAP = 8  # AND at most this many evenly-strided query grams


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
                k: int = DEFAULT_K, prefix_len: int | None = None,
                ngram_len: int | None = None) -> bytes | None:
    """Build one block's bloom bitmap over the DISTINCT non-null values of
    ``arr``. Returns None for unsupported types or empty input (an all-null
    block gets an empty-domain bloom so equality prunes it).

    ``prefix_len``: str columns only — also insert the tagged first-P-byte
    prefix of every distinct value, enabling ``prefix`` pushdown for query
    prefixes of at least P bytes. URLs share hosts, so the extra key count
    is typically a small fraction of the value count; sizing uses the
    ACTUAL total inserted keys either way.

    ``ngram_len``: str columns only — also insert every tagged length-N
    byte window of every distinct value, enabling ``contains`` (substring)
    pushdown for queries of at least N bytes. Write amplification is real
    (~len(value)-N+1 keys per distinct value; the bitmap is sized to the
    actual key count, so expect ~value-bytes x bits_per_key/8 of bloom per
    block) — opt in only on the column you grep at scale. Values shorter
    than N insert no gram keys (they cannot contain such a query)."""
    from nail_parquet_spark.codec.kernels import kind_of

    kind = kind_of(arr.type)
    if kind not in ("str", "int"):
        return None
    if prefix_len is not None and (kind != "str" or not 1 <= prefix_len <= 255):
        raise ValueError(
            f"prefix_len must be 1..255 on a string column, got {prefix_len!r} "
            f"on kind {kind!r}"
        )
    if ngram_len is not None and (kind != "str" or not 2 <= ngram_len <= 255):
        raise ValueError(
            f"ngram_len must be 2..255 on a string column, got {ngram_len!r} "
            f"on kind {kind!r}"
        )
    distinct = pc.unique(arr.drop_null())
    keys = [canonical_bytes(v, kind) for v in distinct.to_pylist()]
    vals_only = list(keys)
    if prefix_len:
        keys.extend({_PREFIX_TAG + b[:prefix_len] for b in vals_only})
    if ngram_len:
        keys.extend({_NGRAM_TAG + b[i:i + ngram_len]
                     for b in vals_only
                     for i in range(len(b) - ngram_len + 1)})
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
    flag = (_PREFIX_FLAG if prefix_len else 0) | (_NGRAM_FLAG if ngram_len else 0)
    tail = (bytes([prefix_len]) if prefix_len else b"") + \
        (bytes([ngram_len]) if ngram_len else b"")
    return bytes([k | flag]) + int(m_bits).to_bytes(4, "big") + bits.tobytes() + tail


def bloom_prefix_len_of(bloom: bytes) -> int | None:
    """The prefix-key length a bitmap was built with, or None."""
    if bloom is None or not bloom[0] & _PREFIX_FLAG:
        return None
    return bloom[-2] if bloom[0] & _NGRAM_FLAG else bloom[-1]


def bloom_ngram_len_of(bloom: bytes) -> int | None:
    """The n-gram-key length a bitmap was built with, or None."""
    if bloom is None or not bloom[0] & _NGRAM_FLAG:
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
    elif op == "contains":
        nlen = bloom_ngram_len_of(bloom)
        if nlen is None or len(b) < nlen:
            return True
        grams = [b[i:i + nlen] for i in range(len(b) - nlen + 1)]
        return all(_probe_raw(bloom, _NGRAM_TAG + g) for g in grams)
    k = bloom[0] & ~_FLAGS_MASK
    m_bits = int.from_bytes(bloom[1:5], "big")
    h1, h2 = bloom_lanes(b)
    for j in range(k):
        p = (h1 + j * h2) % m_bits
        if not (bloom[5 + (p >> 3)] >> (p & 7)) & 1:
            return False
    return True


def _probe_raw(bloom: bytes, key: bytes) -> bool:
    """Raw key membership probe against one bitmap (no canonicalization)."""
    k = bloom[0] & ~_FLAGS_MASK
    m_bits = int.from_bytes(bloom[1:5], "big")
    h1, h2 = bloom_lanes(key)
    for j in range(k):
        p = (h1 + j * h2) % m_bits
        if not (bloom[5 + (p >> 3)] >> (p & 7)) & 1:
            return False
    return True


def _strided_grams(b: bytes, n: int, cap: int = _NGRAM_PROBE_CAP) -> list:
    """Up to ``cap`` evenly-strided length-n windows of ``b`` (pinned:
    indices i*(g-1)//(cap-1) for g windows — always includes the first and
    last gram). ANDing a SUBSET of the necessary grams is still sound."""
    g = len(b) - n + 1
    if g <= 0:
        return []
    if g <= cap:
        idx = range(g)
    else:
        idx = sorted({i * (g - 1) // (cap - 1) for i in range(cap)})
    return [b[i:i + n] for i in idx]


def bloom_ngram_probe_sql(bloom_col: str, value, nlens: list[int],
                          k: int = DEFAULT_K) -> "str | None":
    """Catalyst SQL boolean: might ``bloom_col`` contain a value with
    ``value`` as a SUBSTRING?

    ``nlens``: the stored n-gram-key lengths present in the table (mixed
    dirs are legal — each block probes with its OWN N via a CASE on the
    trailing byte). A block with no gram keys, or whose N exceeds the
    query length, stays un-pruned. Each arm ANDs the probes of up to
    ``_NGRAM_PROBE_CAP`` evenly-strided query grams — a subset of the
    necessary conditions, so capping is sound. Returns None when no
    stored N is usable."""
    vb = canonical_bytes(value, "str")
    if vb is None:
        return None
    usable = sorted({n for n in nlens if 2 <= n <= len(vb)})
    if not usable:
        return None
    flag = (f"(cast(conv(hex(substring({bloom_col}, 1, 1)), 16, 10) as int)"
            f" & {_NGRAM_FLAG}) != 0")
    nlen = f"cast(conv(hex(substring({bloom_col}, -1, 1)), 16, 10) as int)"
    arms = " ".join(
        "WHEN {n} THEN ({probes})".format(
            n=n,
            probes=" AND ".join(
                _probe_conjunction(bloom_col, _NGRAM_TAG + g, k)
                for g in _strided_grams(vb, n)),
        )
        for n in usable
    )
    return f"(NOT ({flag}) OR (CASE {nlen} {arms} ELSE true END))"


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
    b0 = f"cast(conv(hex(substring({bloom_col}, 1, 1)), 16, 10) as int)"
    flag = f"({b0} & {_PREFIX_FLAG}) != 0"
    # P rides before the N byte when gram keys are also present (pinned
    # tail order [P][N])
    ppos = f"(CASE WHEN ({b0} & {_NGRAM_FLAG}) != 0 THEN -2 ELSE -1 END)"
    plen = f"cast(conv(hex(substring({bloom_col}, {ppos}, 1)), 16, 10) as int)"
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


def parse_bloom_spec(specs) -> dict[str, "tuple[int | None, int | None]"]:
    """Normalize bloom column specs to {column: (prefix_len, ngram_len)}.

    Accepts a dict of {col: (P, N)} / {col: P} / {col: None} (normalized),
    or an iterable of strings — the CLI's ``--bloom-columns`` grammar:
    "col" (equality only), "col:<P>" (+prefix keys), "col:g<N>" (+n-gram
    keys for ``contains``), "col:<P>:g<N>" (both)."""
    if specs is None:
        return {}
    out: dict[str, tuple[int | None, int | None]] = {}
    if isinstance(specs, dict):
        for name, v in specs.items():
            if v is None:
                out[name] = (None, None)
            elif isinstance(v, tuple):
                out[name] = (v[0], v[1])
            else:
                out[name] = (int(v), None)
        return out
    for s in specs:
        parts = s.split(":")
        name, prefix, ngram = parts[0], None, None
        for p in parts[1:]:
            if p.startswith("g"):
                ngram = int(p[1:])
            else:
                prefix = int(p)
        out[name] = (prefix, ngram)
    return out


def expected_fpp(n_keys: int, m_bits: int, k: int = DEFAULT_K) -> float:
    """Textbook bloom false-positive rate (for docs/tests)."""
    if m_bits <= 0:
        return 1.0
    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k
