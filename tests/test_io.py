"""Format IO round trips (convert.rs:30-57, io.rs:14-34 parity)."""
import pytest

from nail_parquet_spark.sources.io import _fmt_of, convert, read_data, write_data


def test_fmt_autodetect():
    assert _fmt_of("a.parquet", None) == "parquet"
    assert _fmt_of("a.csv", None) == "csv"
    assert _fmt_of("a.ndjson", None) == "json"
    assert _fmt_of("a.xlsx", None) == "xlsx"
    with pytest.raises(ValueError):
        _fmt_of("a.txt", None)  # utils/mod.rs:47-57 rejects unknown exts


def test_convert_roundtrips(spark, sample, tmp_path):
    src = str(tmp_path / "s.parquet")
    write_data(sample, src)
    info = convert(spark, src, str(tmp_path / "s.csv"))
    assert info == {"rows": 5, "cols": 4}
    csv_back = read_data(spark, str(tmp_path / "s.csv"))
    assert csv_back.count() == 5 and len(csv_back.columns) == 4
    info2 = convert(spark, str(tmp_path / "s.csv"), str(tmp_path / "s.json"))
    assert info2["rows"] == 5
    js = read_data(spark, str(tmp_path / "s.json"))
    assert js.count() == 5


def test_xlsx_roundtrip(spark, sample, tmp_path):
    """Dependency-free xlsx write+read (sources/xlsx.py): values, types,
    header, and NULLs survive a driver-side round trip (io.rs:36-322 parity
    without openpyxl)."""
    path = str(tmp_path / "s.xlsx")
    write_data(sample, path)
    back = read_data(spark, path)
    assert back.count() == sample.count()
    assert back.columns == sample.columns
    a = {r["id"]: r for r in sample.collect()}
    b = {r["id"]: r for r in back.collect()}
    for k in a:
        assert a[k]["name"] == b[k]["name"]
        assert float(a[k]["value"]) == float(b[k]["value"])


def test_xlsx_special_values(spark, tmp_path):
    from nail_parquet_spark.sources.xlsx import read_xlsx, write_xlsx

    import pandas as pd

    pdf = pd.DataFrame({
        "s": ["a<b&c>", "日本語", None, "", "x" * 500],
        "n": [1, 2.5, -3, None, 9007199254740992.0],
        "b": [True, False, None, True, False],
    })
    path = str(tmp_path / "t.xlsx")
    write_xlsx(pdf, path)
    back = read_xlsx(path)
    assert list(back.columns) == ["s", "n", "b"]
    assert back["s"][0] == "a<b&c>" and back["s"][1] == "日本語"
    assert back["s"][2] is None and back["s"][4] == "x" * 500
    assert back["n"][0] == 1 and back["n"][1] == 2.5
    assert bool(back["b"][0]) is True and bool(back["b"][1]) is False
    assert pd.isna(back["b"][2]) and pd.isna(back["n"][3])
    # control characters round-trip via the OOXML _xHHHH_ convention
    pdf2 = pd.DataFrame({"c": ["a\x01b\x00", "plain", "_x0041_literal"]})
    p2 = str(tmp_path / "ctrl.xlsx")
    write_xlsx(pdf2, p2)
    back2 = read_xlsx(p2)
    assert back2["c"][0] == "a\x01b\x00"
    assert back2["c"][2] == "_x0041_literal"  # pre-existing escapes survive
    # a row of only NULLs must not vanish
    pdf3 = pd.DataFrame({"a": ["x", None, "y"], "b": [1, None, 2]})
    p3 = str(tmp_path / "nulls.xlsx")
    write_xlsx(pdf3, p3)
    assert len(read_xlsx(p3)) == 3


def test_orc_roundtrip_and_autodetect(spark, sample, tmp_path):
    """ORC sink/scan (beyond the reference menu — Spark-native Hive/Trino
    interchange): values and schema survive, convert dispatches on the
    .orc extension, and extensionless dirs of ORC files autodetect."""
    path = str(tmp_path / "s.orc")
    write_data(sample, path, compression="zstd")
    back = read_data(spark, path)
    assert back.count() == sample.count()
    assert set(back.columns) == set(sample.columns)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))

    info = convert(spark, path, str(tmp_path / "back.parquet"))
    assert info["rows"] == sample.count()

    bare = str(tmp_path / "bare_dir")
    write_data(sample, bare, fmt="orc")
    auto = read_data(spark, bare)  # no extension: sniffed from files inside
    assert auto.count() == sample.count()


def test_arrow_ipc_roundtrip(spark, sample, tmp_path):
    """Distributed Arrow IPC / Feather-v2 sink + scan: values, schema, and
    NULLs survive; autodetect covers extension, directory, and convert."""
    assert _fmt_of("a.arrow", None) == "arrow"
    assert _fmt_of("a.feather", None) == "arrow"
    path = str(tmp_path / "s.arrow")
    write_data(sample, path)
    back = read_data(spark, path)
    assert sorted(back.columns) == sorted(sample.columns)
    assert sorted(r["name"] for r in back.collect()) == \
        ["Alice", "Bob", "Charlie", "David", "Eve"]
    assert dict(back.dtypes) == dict(sample.dtypes)
    # directory autodetect (no fmt hint)
    assert _fmt_of(path, None) == "arrow"
    # a feather reader (pyarrow) can open the part files directly
    import glob

    import pyarrow.feather as pf

    parts = glob.glob(path + "/part-*.arrow")
    assert parts
    assert sum(len(pf.read_table(p)) for p in parts) == 5
    # convert arrow -> parquet
    info = convert(spark, path, str(tmp_path / "back.parquet"))
    assert info == {"rows": 5, "cols": 4}


def test_arrow_ipc_compression_and_nulls(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (None, "y")], "k long, s string")
    for comp in ("zstd", "lz4", "none"):
        path = str(tmp_path / f"c_{comp}.arrow")
        write_data(df, path, compression=comp)
        got = read_data(spark, path)
        assert got.count() == 3
        assert got.filter("k is null").count() == 1
        assert got.filter("s is null").count() == 1
    from nail_parquet_spark.sources.io import write_arrow_ipc

    with pytest.raises(ValueError, match="zstd/lz4"):
        write_arrow_ipc(df, str(tmp_path / "bad"), compression="gzip")


def test_jsonl_gz_roundtrip(spark, tmp_path):
    """.jsonl.gz — the corpus-export interchange convention: write_data
    infers json format + gzip codec from the suffix; read autodetects."""
    import glob

    from nail_parquet_spark.sources.io import read_data, write_data

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, text string")
    out = str(tmp_path / "shard-00000.jsonl.gz")
    write_data(df, out)
    assert glob.glob(out + "/*.json.gz")  # gzip part files
    back = read_data(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_gz_roundtrip(spark, tmp_path):
    from nail_parquet_spark.sources.io import read_data, write_data

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = str(tmp_path / "dump.csv.gz")
    write_data(df, out)
    back = read_data(spark, out)
    assert back.count() == 2
