"""Extractor determinism: byte-identical text per url (the input_hint
per-row invariant) — pandas_udf output must equal the pure-python
reference function on every row, including non-UTF8 pages."""

from pyspark.sql import functions as F

from datax_spark.cdc.generator import pages_df
from datax_spark.functions.extract import extract_text, sniff_charset, with_extracted_text


def test_charset_sniff():
    assert sniff_charset(b'<meta charset="latin-1">') == "latin-1"
    assert sniff_charset(b'<meta charset="UTF-8">') == "utf-8"
    assert sniff_charset(b"no meta at all") == "utf-8"
    assert sniff_charset(b'<meta charset="klingon">') == "utf-8"


def test_extract_pure():
    html = b"<html><body><h1>A&nbsp;B</h1><script>x</script><p> c  d </p><!-- z --></body></html>"
    assert extract_text(html) == "A B c d"
    assert extract_text(None) is None


def test_extract_latin1_deterministic():
    raw = '<html><meta charset="latin-1"><body>caf\xe9</body></html>'.encode("latin-1")
    assert extract_text(raw) == "café"


def test_udf_matches_pure_python_byte_identical(spark):
    pages = pages_df(spark, 300, partitions=4)
    out = with_extracted_text(pages).select("url", "html", "text").collect()
    assert len(out) == 300
    mismatches = [r["url"] for r in out if extract_text(bytes(r["html"])) != r["text"]]
    assert mismatches == []
    # non-UTF8 slice exists and decodes deterministically
    assert any("contenté" in r["text"] for r in out)


def test_udf_stable_across_partitionings(spark):
    a = with_extracted_text(pages_df(spark, 200, partitions=2)).select("url", "text")
    b = with_extracted_text(pages_df(spark, 200, partitions=16)).select("url", "text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
