"""Property-based codec round-trips (hypothesis): any generated column must
survive encode->decode bit-identically under every valid codec."""
import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

from nail_parquet_spark.codec import VALID_CODECS, decode_array, encode_array
from nail_parquet_spark.codec.kernels import EncodedBlock, pack_bits, unpack_bits

_SETTINGS = dict(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _roundtrip_all(arr: pa.Array, kind: str):
    import pyarrow.compute as pc

    for codec in VALID_CODECS[kind]:
        blk = encode_array(arr, codec)
        dec = decode_array(EncodedBlock.from_parts(blk.header_json(), blk.payload))
        assert dec.type == arr.type, f"{codec}: type {dec.type} != {arr.type}"
        assert pc.is_null(dec).equals(pc.is_null(arr)), f"{codec}: null mask differs"
        if kind == "float":
            # bitwise comparison: pa.Array.equals treats NaN != NaN, and a
            # value fallback would mask sign-of-zero / NaN-payload corruption
            a = np.asarray(arr.fill_null(0.0)).view("u8")
            d = np.asarray(dec.fill_null(0.0)).view("u8")
            assert np.array_equal(a, d), f"{codec}: float bit patterns differ"
        else:
            assert dec.equals(arr), f"{codec}: values differ"


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        max_size=300,
    )
)
def test_int_roundtrip_property(vals):
    _roundtrip_all(pa.array(vals, type=pa.int64()), "int")


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=40)),
        max_size=200,
    )
)
def test_string_roundtrip_property(vals):
    _roundtrip_all(pa.array(vals, type=pa.string()), "str")


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.binary(max_size=60)),
        max_size=150,
    )
)
def test_binary_roundtrip_property(vals):
    _roundtrip_all(pa.array(vals, type=pa.binary()), "bin")


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=200,
    )
)
def test_float_roundtrip_property(vals):
    _roundtrip_all(pa.array(vals, type=pa.float64()), "float")


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300),
    st.integers(min_value=0, max_value=63),
)
def test_pack_bits_property(vals, width):
    v = np.array([x & ((1 << width) - 1) if width else 0 for x in vals], dtype=np.uint64)
    out = unpack_bits(pack_bits(v, width), len(v), width)
    assert np.array_equal(out, v)
