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


def test_xlsx_gated(spark, sample, tmp_path):
    with pytest.raises(NotImplementedError):
        write_data(sample, str(tmp_path / "s.xlsx"))
