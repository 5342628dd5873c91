"""Extraction stage: byte-identical per url (input_hint invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgap_spark.extract import with_extracted_text
from kgap_spark.extract.html_text import extract_text


def test_extract_pure_function_of_bytes():
    html = b"<html><body><nav>menu</nav><main><p>Hello &amp; bye</p><p>x</p></main><footer>f</footer></body></html>"
    assert extract_text(html) == "Hello & bye\nx"
    assert extract_text(html) == extract_text(bytes(html))  # stable
    assert extract_text(None) is None
    assert extract_text(b"") == ""
    assert extract_text(b"plain text no tags") == "plain text no tags"


def test_extract_drops_boilerplate_and_ads():
    html = (
        b"<html><head><script>track()</script><style>.x{}</style></head>"
        b'<body><header>banner</header><aside>links</aside>'
        b'<div class="ad banner">BUY</div><main><p>content here</p></main>'
        b"<footer>legal</footer></body></html>"
    )
    assert extract_text(html) == "content here"


def test_extract_handles_bad_utf8():
    html = b"<body><p>ok \xff\xfe text</p></body>"
    out = extract_text(html)
    assert "ok" in out and "text" in out  # replacement chars, no crash


def test_extract_byte_identical_vs_golden(spark, tiny):
    """sha256(extract(html)) == golden per url, for every fixture page,
    through the Spark pandas UDF path."""
    pages = tiny["web_pages"]
    extracted = with_extracted_text(pages.drop("text").withColumn("text", F.lit(None).cast("string")))
    got = extracted.select(
        "url", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("got_sha")
    )
    golden = tiny["golden_text"].select("url", F.col("text_sha256"))
    mismatches = (
        got.join(golden, "url")
        .filter(F.col("got_sha") != F.col("text_sha256"))
        .count()
    )
    assert mismatches == 0
    assert got.count() == golden.count()


def test_extract_partitioning_invariance(spark, tiny):
    """Repartitioning must not change any extracted byte (determinism
    across Arrow batch boundaries)."""
    pages = tiny["web_pages"].drop("text").withColumn("text", F.lit(None).cast("string"))
    a = with_extracted_text(pages.repartition(1)).select("url", "text")
    b = with_extracted_text(pages.repartition(7)).select("url", "text")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0


def test_prefilled_text_is_kept_and_consistent(spark, tiny):
    """Rows with a pre-extracted text column keep it, and it equals what
    the extractor would produce (the fixture guarantees consistency)."""
    pages = tiny["web_pages"]
    out = with_extracted_text(pages)
    pre = pages.filter(F.col("text").isNotNull()).select("url", "text")
    kept = out.join(pre.withColumnRenamed("text", "orig"), "url").filter(
        F.col("text") != F.col("orig")
    )
    assert kept.count() == 0
