"""URL canonicalization (functions/urls.py)."""

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.urls import canonicalize_url


def _canon(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonicalize_url(F.col("url"), **kw).alias("c")).collect()]


def test_equivalent_spellings_collapse(spark):
    variants = [
        "HTTP://WWW.Example.COM/Path/?b=2&a=1#frag",
        "http://www.example.com/Path?a=1&b=2",
    ]
    c = _canon(spark, variants)
    # scheme/host lowercased, path case PRESERVED, params sorted, fragment
    # and trailing slash dropped
    assert c[0] == c[1] == "http://www.example.com/Path?a=1&b=2"


def test_distinct_urls_stay_distinct(spark):
    c = _canon(spark, ["http://a.com/x?p=1", "http://a.com/x?p=2", "http://a.com/y?p=1"])
    assert len(set(c)) == 3


def test_strip_tracking_params(spark):
    c = _canon(spark, ["http://a.com/x?utm_source=tw&p=1&utm_campaign=z",
                       "http://a.com/x?p=1"],
               strip_params=["utm_source", "utm_campaign"])
    assert c[0] == c[1] == "http://a.com/x?p=1"


def test_empty_query_and_root_path(spark):
    c = _canon(spark, ["http://a.com/", "http://a.com", "http://a.com/?#f"])
    assert c[0] == c[1] == c[2] == "http://a.com"


def test_non_url_passes_through(spark):
    c = _canon(spark, ["not a url at all"])
    assert c[0] == "not a url at all"
