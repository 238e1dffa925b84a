"""Codec kernel round-trip property tests (SURVEY.md §5 adopted strategy:
encode->decode bit-identity on adversarial arrays)."""
import numpy as np
import pyarrow as pa
import pytest

from nail_parquet_spark.codec import VALID_CODECS, decode_array, encode_array
from nail_parquet_spark.codec.kernels import (
    EncodedBlock,
    kind_of,
    pack_bits,
    unpack_bits,
)

rng = np.random.default_rng(7)


def roundtrip(arr: pa.Array, codec: str):
    import pyarrow.compute as pc

    blk = encode_array(arr, codec)
    blk2 = EncodedBlock.from_parts(blk.header_json(), blk.payload)
    dec = decode_array(blk2)
    assert dec.type == arr.type, f"{codec}: type {dec.type} != {arr.type}"
    assert pc.is_null(dec).equals(pc.is_null(arr)), f"{codec}: null mask differs"
    if pa.types.is_floating(arr.type):
        # bitwise: pa equality treats NaN != NaN, and value comparison would
        # mask sign-of-zero / NaN-payload corruption
        u = f"u{arr.type.bit_width // 8}"
        a = np.asarray(arr.fill_null(0.0)).view(u)
        d = np.asarray(dec.fill_null(0.0)).view(u)
        assert np.array_equal(a, d), f"{codec}: float bit patterns differ"
    else:
        assert dec.equals(arr), f"{codec}: values differ"


INT_CASES = [
    np.arange(1000, dtype=np.int64),
    rng.integers(-(2**62), 2**62, 500),
    np.repeat(rng.integers(0, 5, 50), rng.integers(1, 40, 50)),
    np.zeros(100, dtype=np.int64),
    np.array([], dtype=np.int64),
    np.array([7], dtype=np.int64),
    np.array([-(2**63), 2**63 - 1, 0, -1], dtype=np.int64),
]


@pytest.mark.parametrize("codec", VALID_CODECS["int"])
def test_int_roundtrip(codec):
    for v in INT_CASES:
        roundtrip(pa.array(v, type=pa.int64()), codec)
        if len(v):
            mask = rng.random(len(v)) < 0.2
            roundtrip(pa.array(v, type=pa.int64(), mask=mask), codec)


@pytest.mark.parametrize("codec", VALID_CODECS["int"])
def test_timestamp_bool_date_roundtrip(codec):
    ts = pa.array(rng.integers(10**15, 2 * 10**15, 300), type=pa.int64()).cast(pa.timestamp("us"))
    roundtrip(ts, codec)
    roundtrip(pa.array(rng.random(200) < 0.5), codec)
    roundtrip(pa.array(rng.integers(0, 20000, 100), type=pa.int32()).cast(pa.date32()), codec)


@pytest.mark.parametrize("codec", VALID_CODECS["float"])
def test_float_roundtrip(codec):
    fv = rng.normal(size=400)
    fv[::17] = np.nan
    roundtrip(pa.array(fv), codec)
    roundtrip(pa.array(fv, mask=rng.random(400) < 0.1), codec)
    roundtrip(pa.array(fv.astype(np.float32), type=pa.float32()), codec)


def test_float_dict_bit_exact_special_values():
    """-0.0 vs 0.0 and distinct NaN payloads must survive the dict codec
    (dict is over IEEE bit patterns, not values)."""
    nan1 = np.uint64(0x7FF8000000000001).view(np.float64)
    nan2 = np.uint64(0x7FF8000000000002).view(np.float64)
    fv = np.array([0.0, -0.0, nan1, nan2, 1.5, 1.5, -0.0, np.inf, -np.inf] * 10)
    roundtrip(pa.array(fv), "dict")
    roundtrip(pa.array(fv, mask=rng.random(len(fv)) < 0.2), "dict")


STR_CASES = None


def _str_cases():
    words = ["the", "quick", "https://example.com/", "日本語テキスト", "émoji 🎉", ""]
    sv = ["".join(rng.choice(words, rng.integers(0, 12))) for _ in range(500)]
    return [
        pa.array(sv, type=pa.string()),
        pa.array([None if rng.random() < 0.15 else s for s in sv], type=pa.string()),
        pa.array([], type=pa.string()),
        pa.array(["", "", ""], type=pa.string()),
        pa.array(["x" * 10000], type=pa.string()),
        pa.array(np.repeat(["en", "de", "fr"], 100).tolist()),
        pa.array(sv[:50], type=pa.large_string()),
    ]


@pytest.mark.parametrize("codec", VALID_CODECS["str"])
def test_string_roundtrip(codec):
    for arr in _str_cases():
        roundtrip(arr, codec)


@pytest.mark.parametrize("codec", VALID_CODECS["bin"])
def test_binary_roundtrip(codec):
    bv = [bytes(rng.integers(0, 256, rng.integers(0, 300), dtype=np.uint8).tolist()) for _ in range(120)]
    bv += [b"\xff" * 9, b"\xff\x00\xff", b"", b"\xfe\xff" * 50]  # escape-code stress
    roundtrip(pa.array(bv, type=pa.binary()), codec)
    roundtrip(pa.array([None if rng.random() < 0.2 else b for b in bv], type=pa.binary()), codec)


def test_pack_bits_exact():
    for width in [0, 1, 3, 7, 8, 13, 31, 43, 63, 64]:
        hi = 2**width if width < 64 else 2**64
        v = rng.integers(0, hi, 257, dtype=np.uint64, endpoint=False)
        assert np.array_equal(unpack_bits(pack_bits(v, width), 257, width), v if width else np.zeros(257, np.uint64))


def test_compression_actually_compresses():
    lang = pa.array(np.repeat(rng.choice(["en", "de", "fr"], 100), 100).tolist())
    raw = sum(len(x) for x in lang.to_pylist())
    assert len(encode_array(lang, "rle").payload) < raw / 50
    ts = pa.array(np.cumsum(rng.integers(0, 1000, 10000)) + 10**15, type=pa.int64())
    assert len(encode_array(ts, "delta_bitpack").payload) < 8 * 10000 / 3


def test_kind_dispatch():
    assert kind_of(pa.int32()) == "int"
    assert kind_of(pa.timestamp("us")) == "int"
    assert kind_of(pa.float64()) == "float"
    assert kind_of(pa.string()) == "str"
    assert kind_of(pa.binary()) == "bin"


class TestAlp:
    """ALP decimal-double codec: ratio, exceptions, selector integration."""

    def test_alp_beats_zstd_on_decimal_doubles(self):
        rng = np.random.default_rng(7)
        v = np.round(rng.uniform(0, 500, 100_000), 2)
        arr = pa.array(v, type=pa.float64())
        alp = encode_array(arr, "alp")
        zstd = encode_array(arr, "zstd")
        assert alp.header["params"]["n_exc"] == 0
        assert alp.header["params"]["exp"] == 2
        assert len(alp.payload) < 0.7 * len(zstd.payload)
        out = np.asarray(decode_array(alp))
        assert np.array_equal(out.view(np.uint64), v.view(np.uint64))

    def test_alp_exceptions_bit_exact(self):
        # mix decimals with values the transform can't represent
        nan_payload = np.uint64(0x7FF8000000000003).view(np.float64)
        v = np.array([1.25, -0.0, np.inf, -np.inf, nan_payload, 1e300, 3.14, 2.50])
        arr = pa.array(v, type=pa.float64())
        b = encode_array(arr, "alp")
        assert b.header["params"]["n_exc"] >= 4  # inf/-inf/nan/1e300 at least
        out = np.asarray(decode_array(b))
        assert np.array_equal(out.view(np.uint64), v.view(np.uint64))  # incl. -0.0 & NaN payload

    def test_alp_selector_picks_and_rejects(self):
        from nail_parquet_spark.codec.select import choose_codec

        rng = np.random.default_rng(3)
        dec = pa.array(np.round(rng.uniform(0, 100, 50_000), 2), type=pa.float64())
        assert choose_codec(dec)[0] == "alp"
        noise = pa.array(rng.standard_normal(50_000), type=pa.float64())
        assert choose_codec(noise)[0] != "alp"  # exception list ~2x plain

    def test_alp_float32_and_nulls(self):
        v = np.array([1.5, 2.25, 0.75, 123.5], dtype=np.float32)
        arr = pa.array(v, type=pa.float32(), mask=np.array([False, True, False, False]))
        b = encode_array(arr, "alp")
        out = decode_array(b)
        assert out.null_count == 1
        assert out[0].as_py() == pytest.approx(1.5)
        assert out[3].as_py() == pytest.approx(123.5)


class TestFrontCoding:
    """fc codec (front coding / DELTA_BYTE_ARRAY idea): ratio on sorted
    urls, restart-group structure, selector gating on sortedness."""

    def _sorted_urls(self, n=20_000):
        rng = np.random.default_rng(5)
        hosts = [f"https://www.site{i:03d}.example.org/" for i in range(50)]
        return sorted(
            hosts[int(rng.integers(0, 50))]
            + f"section/{int(rng.integers(0, 99999)):05d}/page-{j}.html"
            for j in range(n)
        )

    def test_fc_beats_zstd_and_dict_on_sorted_urls(self):
        arr = pa.array(self._sorted_urls(), type=pa.string())
        fc = encode_array(arr, "fc")
        assert len(fc.payload) < len(encode_array(arr, "zstd").payload)
        assert len(fc.payload) < len(encode_array(arr, "dict").payload)
        assert decode_array(fc).equals(arr)

    def test_fc_prefix_lens_vs_python_model(self):
        # oracle: per-row os.path-free common prefix vs the group head
        from nail_parquet_spark.codec.kernels import FC_GROUP

        vals = ["", "a", "ab", "abcd", "abce", "xyz", "xy", "ab"] * 7
        arr = pa.array(vals, type=pa.string())
        blk = encode_array(arr, "fc")
        dec = decode_array(blk)
        assert dec.equals(arr)
        # model the stored-stream size: group heads store full bytes
        bs = [v.encode() for v in vals]
        stored = 0
        for i, b in enumerate(bs):
            h = bs[(i // FC_GROUP) * FC_GROUP]
            if i % FC_GROUP == 0:
                stored += len(b)
            else:
                p = 0
                while p < min(len(b), len(h)) and b[p] == h[p]:
                    p += 1
                stored += len(b) - p
        assert blk.header["params"]["raw_len"] == stored

    def test_fc_selector_gates_on_sortedness(self):
        from nail_parquet_spark.codec.select import candidate_codecs, column_stats

        arr = pa.array(self._sorted_urls(5_000), type=pa.string())
        st = column_stats(arr)
        assert st.sorted_frac == 1.0
        assert "fc" in candidate_codecs("str", st)
        rng = np.random.default_rng(9)
        shuffled = pa.array(
            [self._sorted_urls(5_000)[i] for i in rng.permutation(5_000)],
            type=pa.string(),
        )
        st2 = column_stats(shuffled)
        assert "fc" not in candidate_codecs("str", st2)

    def test_fc_level_suffix_and_wide_values(self):
        # values wider than FC_MAX_PREFIX still round-trip (prefix capped)
        arr = pa.array(["x" * 8000, "x" * 8000 + "tail", "x" * 7999] * 8)
        for codec in ("fc", "fc:1", "fc:6"):
            blk = encode_array(arr, codec)
            assert decode_array(blk).equals(arr)


def test_dod_beats_delta_on_regular_ticks():
    import numpy as np

    from nail_parquet_spark.codec.kernels import decode_array, encode_array

    rng = np.random.default_rng(3)
    ticks = np.cumsum(rng.integers(995, 1006, 20_000)) + 1_700_000_000_000
    arr = pa.array(ticks.tolist(), pa.int64())
    dod = encode_array(arr, "dod_bitpack")
    delta = encode_array(arr, "delta_bitpack")
    assert decode_array(dod).equals(arr)
    assert len(dod.payload) < 0.6 * len(delta.payload)


def test_selector_reaches_dod_on_near_regular():
    import numpy as np

    from nail_parquet_spark.codec.select import choose_codec

    ticks = np.arange(50_000) * 250 + 42  # perfectly regular
    arr = pa.array(ticks.tolist(), pa.int64())
    codec, _ = choose_codec(arr, policy="ratio")
    assert codec == "dod_bitpack"


def test_sparse_for_wins_on_mostly_null():
    import numpy as np

    from nail_parquet_spark.codec.kernels import decode_array, encode_array

    rng = np.random.default_rng(5)
    vals = [int(rng.integers(10**9, 2 * 10**9)) if rng.random() < 0.1 else None
            for _ in range(20_000)]
    arr = pa.array(vals, pa.int64())
    sp = encode_array(arr, "sparse_for")
    fo = encode_array(arr, "for_bitpack")
    assert decode_array(sp).equals(arr)
    assert len(sp.payload) < 0.25 * len(fo.payload)


def test_selector_reaches_sparse_for_on_mostly_null():
    import numpy as np

    from nail_parquet_spark.codec.select import choose_codec

    rng = np.random.default_rng(9)
    vals = [int(rng.integers(0, 2**40)) if i % 10 == 0 else None
            for i in range(50_000)]
    arr = pa.array(vals, pa.int64())
    codec, st = choose_codec(arr, policy="ratio")
    assert st.null_frac > 0.8
    assert codec == "sparse_for"
