"""functions/htmltext.py: real HTML -> text extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacanary_spark.functions.htmltext import (
    encode_html_entities,
    html_to_text,
    make_html_to_text_udf,
)


def test_blocks_become_lines_and_inline_tags_vanish():
    html = (b"<html><head><title>T</title><script>if (1 < 2) x();</script>"
            b"<style>p { color: red }</style></head>"
            b"<body><h1>Head  line</h1>"
            b"<p>one <b>bold</b> and <a href='u'>link</a></p>"
            b"<!-- secret --><div>two</div><br>three</body></html>")
    assert html_to_text(html) == "Head line\none bold and link\ntwo\nthree"


def test_entities_decoded_and_whitespace_normalized():
    assert html_to_text(b"<p>a &amp; b &lt; c\t\td</p>") == "a & b < c d"
    # multiple blank lines collapse; lines stripped
    assert html_to_text(b"<p>  x  </p>\n\n\n<p>y</p>") == "x\ny"


def test_null_and_non_utf8():
    assert html_to_text(None) is None
    assert html_to_text(b"<p>ok\xff</p>") == "ok�"


def test_nested_case_insensitive_drops():
    html = b"<BODY><SCRIPT type='x'>bad</SCRIPT><P>good</P></BODY>"
    assert html_to_text(html) == "good"


def test_udf_and_entity_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a & b < c"), (2, "plain"), (3, None)], "id long, text string")
    enc = df.withColumn("enc", encode_html_entities(F.col("text")))
    built = enc.withColumn(
        "html",
        F.encode(F.concat(F.lit("<html><body><p>"), F.col("enc"),
                          F.lit("</p></body></html>")), "utf-8"))
    out = built.withColumn(
        "extracted", make_html_to_text_udf()(F.col("html")))
    rows = {r.id: r for r in out.collect()}
    assert rows[1].extracted == "a & b < c"
    assert rows[2].extracted == "plain"
    # NULL text -> encode(concat(...)) is NULL -> extractor passes NULL
    assert rows[3].extracted is None
