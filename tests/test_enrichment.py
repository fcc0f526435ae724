"""Enrichment UDF: determinism, schema, and merge-path integration."""

from pyspark.sql import functions as F

from datax_spark.cdc.generator import changes_df, pages_df
from datax_spark.functions.extract import _enrich_one, extract_text, with_enrichment


def test_enrich_matches_pure_python(spark):
    pages = pages_df(spark, 150, partitions=4, html_paragraphs=5)
    out = with_enrichment(pages).collect()
    for r in out:
        text, lang, n_tok, quality, fp = _enrich_one(bytes(r["html"]))
        assert r["text"] == text
        assert r["lang_id"] == lang
        assert r["n_tokens"] == n_tok
        assert abs(r["quality"] - quality) < 1e-9
        assert r["fp"] == fp


def test_enrich_null_html(spark):
    df = spark.createDataFrame([(1, None)], "id long, html binary")
    r = with_enrichment(df).first()
    assert r["text"] is None and r["n_tokens"] is None


def test_enrich_inside_merge_runs_post_dedup(spark, tmp_path):
    """The transform must apply to LWW winners — final text matches the
    winning event's html, and extraction equals the pure function."""
    from pyspark.sql import types as T

    from datax_spark.cdc.apply import apply_changes
    from datax_spark.lake.table import LakeTable

    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang_id", T.StringType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("fp", T.LongType(), True),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, key_col="url", num_buckets=4)
    ch = changes_df(spark, 1200, n_keys=200, partitions=4, html_paragraphs=3).cache()
    apply_changes(t, ch, batch_id=0, transform=with_enrichment)
    rows = t.read().select("url", "html", "text").collect()
    assert rows
    for r in rows:
        assert r["text"] == extract_text(bytes(r["html"])) if r["html"] is not None else r["text"] is None
