"""List-kind codec round-trips: array<float> / array<string> / nested lists.

The list kernel is lens (bit-packed, null rows -> 0) + the flattened child
encoded recursively under the same codec name, so every child-kind codec is
exercised through the list wrapper. Bit-identity includes NaN payloads,
-0.0, inner nulls, null-vs-empty lists, and Spark's "element not null"
field naming (kernels.py list branch; north-rule bit-identical decode).
"""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nail_parquet_spark.codec import VALID_CODECS, decode_array, encode_array
from nail_parquet_spark.codec.kernels import EncodedBlock, kind_of
from nail_parquet_spark.codec.select import choose_codec, raw_bytes_of

rng = np.random.default_rng(11)


def roundtrip_list(arr: pa.Array, codec: str):
    blk = encode_array(arr, codec)
    blk2 = EncodedBlock.from_parts(blk.header_json(), blk.payload)
    dec = decode_array(blk2)
    assert dec.type == arr.type, f"{codec}: type {dec.type} != {arr.type}"
    assert pc.is_null(dec).equals(pc.is_null(arr)), f"{codec}: null mask"
    assert pc.list_value_length(dec).equals(pc.list_value_length(arr)), (
        f"{codec}: lens differ"
    )
    fa, fd = arr.flatten(), dec.flatten()
    assert pc.is_null(fd).equals(pc.is_null(fa)), f"{codec}: inner null mask"
    if pa.types.is_floating(fa.type):
        u = f"u{fa.type.bit_width // 8}"
        a = np.asarray(fa.fill_null(0.0)).view(u)
        d = np.asarray(fd.fill_null(0.0)).view(u)
        assert np.array_equal(a, d), f"{codec}: float bit patterns differ"
    else:
        assert fd.equals(fa), f"{codec}: child values differ"


def _float_lists(dtype, n=200, dim=16):
    rows = []
    for i in range(n):
        if i % 17 == 0:
            rows.append(None)
        elif i % 23 == 0:
            rows.append([])
        else:
            v = np.round(rng.normal(size=rng.integers(1, dim)), 3).astype(dtype)
            rows.append(v.tolist())
    return rows


FLOAT_LIST_CODECS = ["plain", "zstd", "lz4", "alp", "dict", "bss"]


@pytest.mark.parametrize("codec", FLOAT_LIST_CODECS)
def test_list_float32_roundtrip(codec):
    a = pa.array(_float_lists(np.float32), type=pa.list_(pa.float32()))
    roundtrip_list(a, codec)


@pytest.mark.parametrize("codec", FLOAT_LIST_CODECS)
def test_list_float64_adversarial(codec):
    rows = [
        [0.0, -0.0, float("nan"), float("inf"), -float("inf")],
        None,
        [],
        [1e-300, 1e300, 123.456],
        [None, 2.5, None],
    ]
    a = pa.array(rows, type=pa.list_(pa.float64()))
    roundtrip_list(a, codec)


@pytest.mark.parametrize("codec", ["plain", "zstd", "for_bitpack", "delta_bitpack", "rle", "dict"])
def test_list_int_roundtrip(codec):
    rows = [
        rng.integers(-(2**40), 2**40, rng.integers(0, 9)).tolist()
        if i % 7 else None
        for i in range(120)
    ]
    a = pa.array(rows, type=pa.list_(pa.int64()))
    roundtrip_list(a, codec)


@pytest.mark.parametrize("codec", ["plain", "zstd", "fsst", "dict", "rle", "wdict", "fc"])
def test_list_string_roundtrip(codec):
    words = ["the", "quick", "brown", "fox", "", "héllo wörld", "a" * 300]
    rows = [
        ([words[j % len(words)] for j in range(i % 5)] + ([None] if i % 4 == 0 else []))
        if i % 9 else None
        for i in range(150)
    ]
    a = pa.array(rows, type=pa.list_(pa.string()))
    roundtrip_list(a, codec)


def test_nested_list_roundtrip():
    rows = [[[1, 2], [3]], None, [[], [4, None]], [[5]]]
    a = pa.array(rows, type=pa.list_(pa.list_(pa.int64())))
    for codec in ("plain", "zstd", "for_bitpack"):
        roundtrip_list(a, codec)


def test_large_list_and_spark_field_naming():
    # Spark's arrow batches name the child field "element" (often not null);
    # the block must reproduce the exact field, not pyarrow's "item" default
    t = pa.list_(pa.field("element", pa.float32(), nullable=False))
    a = pa.array([[1.0, 2.0], [3.5]], type=t)
    roundtrip_list(a, "alp")
    lt = pa.large_list(pa.field("element", pa.string()))
    b = pa.array([["x", "y"], None, []], type=lt)
    roundtrip_list(b, "zstd")


def test_empty_and_all_null_list():
    e = pa.array([], type=pa.list_(pa.float32()))
    roundtrip_list(e, "alp")
    nn = pa.array([None, None, None], type=pa.list_(pa.int64()))
    roundtrip_list(nn, "for_bitpack")


def test_list_kind_and_valid_codecs():
    assert kind_of(pa.list_(pa.float32())) == "list"
    assert kind_of(pa.large_list(pa.string())) == "list"
    assert "alp" in VALID_CODECS["list"] and "xref" not in str(VALID_CODECS["list"])
    with pytest.raises(ValueError):
        encode_array(
            pa.array([[1.0]], type=pa.list_(pa.float64())),
            "xref:other",
            ref_arr=pa.array(["x"]),
        )


def test_list_selector_paths():
    # decimal-rounded embedding vectors: ALP must win the trial
    dec = pa.array(
        [np.round(rng.uniform(0, 100, 32), 2).tolist() for _ in range(800)],
        type=pa.list_(pa.float64()),
    )
    codec, st = choose_codec(dec)
    assert codec == "alp"
    assert st.avg_len > 0
    alp = len(encode_array(dec, "alp").payload)
    zstd = len(encode_array(dec, "zstd").payload)
    assert alp < zstd < raw_bytes_of(dec)
    # full-precision gaussians: exception list makes ALP worse than zstd/plain
    noise = pa.array(
        [rng.normal(size=32).tolist() for _ in range(800)],
        type=pa.list_(pa.float64()),
    )
    assert choose_codec(noise)[0] != "alp"


def test_bss_wins_on_full_precision_floats():
    """Byte-stream split: the selector's answer for high-entropy floats
    (full-precision embeddings) where ALP's exception list degenerates —
    planes of sign/exponent bytes compress, mantissa planes ride raw."""
    noise = pa.array(rng.normal(size=50_000).astype(np.float32))
    assert choose_codec(noise)[0] == "bss"
    bss = len(encode_array(noise, "bss").payload)
    zstd = len(encode_array(noise, "zstd").payload)
    assert bss < zstd
    # level suffix parses and only affects encode
    blk = encode_array(noise, "bss:6")
    assert len(blk.payload) <= bss
    out = decode_array(blk)
    assert np.array_equal(
        np.asarray(out).view("u4"), np.asarray(noise).view("u4"))
