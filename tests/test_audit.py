"""corpus_audit one-call health report."""

import json

from pyspark.sql import functions as F

from nail_parquet_spark.functions.audit import corpus_audit


def _corpus(spark):
    prose = ("the quick brown fox jumps over the lazy dog and then "
             "the dog is with that from his word not all have new. ") * 4
    rows = (
        [(i, f"https://www.h{i % 7}.example.com/p{i}.html", prose + f"tail {i}.", "en")
         for i in range(40)]
        # 10 exact duplicates of doc 0's text
        + [(100 + i, f"https://dup.example.com/{i}", prose + "tail 0.", "en")
           for i in range(10)]
        # 5 junk docs (too short) on asset URLs
        + [(200 + i, f"https://cdn.example.com/a{i}.png", "tiny.", "de")
           for i in range(5)]
    )
    return spark.createDataFrame(rows, "doc_id long, url string, text string, lang string")


def test_audit_sections_and_values(spark):
    df = _corpus(spark)
    r = corpus_audit(df, "doc_id", "text", url_col="url", lang_col="lang")
    assert r["size"]["n_docs"] == 55
    assert r["size"]["n_tokens"] > 0 and r["size"]["n_chars"] > 0
    # 40 distinct prose texts + 1 shared dup text + 1 junk text = 42
    approx = r["dup"]["n_distinct_texts_approx"]
    assert 38 <= approx <= 46  # HLL ±~2% band, generous
    assert r["dup"]["exact_dup_rate_approx"] > 0.1
    # junk docs fail min_words; prose passes
    assert 0.5 < r["quality"]["gopher_pass_rate"] < 1.0
    # 5 asset URLs fail the extension rule
    assert abs(r["urls"]["url_pass_rate"] - 50 / 55) < 1e-6
    assert 7 <= r["urls"]["n_hosts_approx"] <= 10  # 9 hosts
    assert r["langs"] == {"en": 50, "de": 5}
    assert set(r["length_quantiles"]) == {"0.25", "0.5", "0.95"}
    assert all(v > 0 for v in r["length_quantiles"].values())


def test_audit_minimal_columns(spark):
    df = _corpus(spark).select("doc_id", "text")
    r = corpus_audit(df, "doc_id", "text")
    assert "urls" not in r and "langs" not in r
    assert r["size"]["n_docs"] == 55


def test_cli_audit(spark, tmp_path, capsys):
    from nail_parquet_spark.cli import main

    src = str(tmp_path / "docs.parquet")
    _corpus(spark).write.parquet(src)
    assert main(["audit", src, "--id-column", "doc_id",
                 "--url-column", "url", "--lang-column", "lang"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["size"]["n_docs"] == 55 and "quality" in out
