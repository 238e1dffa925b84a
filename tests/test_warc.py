"""WARC source/sink (sources/warc.py): hand-built golden archive pins the
format rules; the synthetic web table round-trips write_warc -> read_warc
byte-identically on the html payload."""

import datetime as dt
import gzip

from pyspark.sql import functions as F

GOLDEN = (
    # warcinfo record (block is NOT http: kept verbatim when requested)
    b"WARC/1.0\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"WARC-Date: 2023-01-02T03:04:05Z\r\n"
    b"Content-Type: application/warc-fields\r\n"
    b"Content-Length: 9\r\n"
    b"\r\n"
    b"robots: x"
    b"\r\n\r\n"
    # response record whose BODY contains a fake version line (length-
    # directed parsing must not desync on it)
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Target-URI: https://a-site.com/x\r\n"
    b"WARC-Date: 2023-01-02T03:04:06Z\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    b"Content-Length: 62\r\n"
    b"\r\n"
    b"HTTP/1.1 200 OK\r\nX-H: 1\r\n\r\n<p>body</p>WARC/1.0 is not a record"
    b"\r\n\r\n"
    # request record (filtered out under the default types)
    b"WARC/1.0\r\n"
    b"WARC-Type: request\r\n"
    b"WARC-Target-URI: https://a-site.com/x\r\n"
    b"WARC-Date: 2023-01-02T03:04:06Z\r\n"
    b"Content-Type: application/http; msgtype=request\r\n"
    b"Content-Length: 19\r\n"
    b"\r\n"
    b"GET /x HTTP/1.1\r\n\r\n"
    b"\r\n\r\n"
)


def test_golden_parse_response_only(spark, tmp_path):
    from nail_parquet_spark.sources.warc import read_warc

    d = tmp_path / "arc"
    d.mkdir()
    (d / "a.warc").write_bytes(GOLDEN)
    rows = read_warc(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "https://a-site.com/x"
    assert r["warc_type"] == "response"
    assert bytes(r["html"]) == b"<p>body</p>WARC/1.0 is not a record"
    assert r["warc_ts"] == dt.datetime(2023, 1, 2, 3, 4, 6)


def test_golden_all_types_and_gzip(spark, tmp_path):
    from nail_parquet_spark.sources.warc import read_warc

    d = tmp_path / "arcgz"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(gzip.compress(GOLDEN))
    rows = read_warc(spark, str(d), types=()).orderBy("warc_ts",
                                                      "warc_type").collect()
    assert [r["warc_type"] for r in rows] == ["warcinfo", "request",
                                              "response"]
    # non-http block verbatim; request body after its http headers
    assert bytes(rows[0]["html"]) == b"robots: x"
    assert rows[0]["url"] is None
    assert bytes(rows[1]["html"]) == b""


def test_roundtrip_synthetic_web_table(spark, tmp_path):
    from nail_parquet_spark.sources.warc import read_warc, write_warc
    from nail_parquet_spark.synth import webpages_spark

    web = webpages_spark(spark, 2_000, seed=13, n_parts=4)
    out = str(tmp_path / "export")
    n_parts = write_warc(web, out)
    assert n_parts >= 1
    back = read_warc(spark, out)
    assert back.count() == 2_000
    # html payload byte-identical per url; capture second preserved
    j = (web.select("url", F.col("html").alias("h0"),
                    F.date_trunc("second", "warc_ts").alias("t0"))
         .join(back.select("url", "html", "warc_ts"), "url"))
    bad = j.filter((F.col("h0") != F.col("html"))
                   | (F.col("t0") != F.col("warc_ts"))).count()
    assert bad == 0


def test_truncated_archive_raises(spark, tmp_path):
    import pytest

    from nail_parquet_spark.sources.warc import read_warc

    d = tmp_path / "bad"
    d.mkdir()
    (d / "t.warc").write_bytes(GOLDEN[: len(GOLDEN) - 60])
    with pytest.raises(Exception, match="truncated|malformed"):
        read_warc(spark, str(d)).collect()


def test_cli_convert_warc_roundtrip(spark, tmp_path):
    from nail_parquet_spark.cli import main
    from nail_parquet_spark.synth import webpages_spark

    src = str(tmp_path / "pages.parquet")
    webpages_spark(spark, 300, seed=5, n_parts=2).write.parquet(src)
    arc = str(tmp_path / "export.warc.gz")
    assert main(["convert", src, "-o", arc]) == 0
    back = str(tmp_path / "back.parquet")
    assert main(["convert", arc, "-o", back]) == 0
    got = spark.read.parquet(back)
    assert got.count() == 300
    assert {"url", "warc_ts", "html"} <= set(got.columns)


def test_wet_export_and_scan(spark, tmp_path):
    from nail_parquet_spark.cli import main
    from nail_parquet_spark.synth import webpages_spark

    src = str(tmp_path / "pages2.parquet")
    webpages_spark(spark, 200, seed=3, n_parts=2).write.parquet(src)
    wet = str(tmp_path / "export.warc.wet.gz")
    assert main(["convert", src, "-o", wet]) == 0
    back = str(tmp_path / "wet_back.parquet")
    assert main(["convert", wet, "-o", back]) == 0
    got = spark.read.parquet(back)
    assert set(got.columns) == {"url", "warc_ts", "text"}
    # WET text round-trips the extracted-text column exactly
    orig = spark.read.parquet(src).select("url", F.col("text").alias("t0"))
    assert got.join(orig, "url").filter("text != t0").count() == 0
    assert got.count() == 200


def test_cdx_random_access(spark, tmp_path):
    from nail_parquet_spark.sources.warc import (
        fetch_record, read_cdx, read_warc, write_warc)
    from nail_parquet_spark.synth import webpages_spark

    web = webpages_spark(spark, 500, seed=21, n_parts=3)
    out = str(tmp_path / "indexed")
    write_warc(web, out, cdx=True)
    idx = read_cdx(spark, out)
    assert idx.count() == 500
    # every record individually fetchable and byte-identical to the source
    want = {r["url"]: bytes(r["html"]) for r in web.collect()}
    for r in idx.orderBy("url").limit(25).collect():
        headers, body = fetch_record(out, r["filename"], r["offset"],
                                     r["length"])
        assert headers["warc-target-uri"] == r["url"]
        assert body == want[r["url"]]
    # the indexed archive still reads as a normal multi-member WARC scan
    assert read_warc(spark, out).count() == 500


def test_fmt_autodetect_ignores_cdx_index(spark, tmp_path):
    from nail_parquet_spark.sources.io import _fmt_of
    from nail_parquet_spark.sources.warc import write_warc
    from nail_parquet_spark.synth import webpages_spark

    out = str(tmp_path / "arch")
    write_warc(webpages_spark(spark, 50, seed=1, n_parts=1), out, cdx=True)
    assert _fmt_of(out, None) == "warc"   # not "parquet" via _cdx/
