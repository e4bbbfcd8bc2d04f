"""Page-metadata head signals (kg/pagemeta.py): title, robots meta,
noindex flag, rel=canonical — one decoded scan, documented recognition
simplifications. Beyond-inventory crawl mode (SURVEY §2.10)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from quickner_spark.kg.pagemeta import (
    canonical_of, noindex_of, page_meta, title_of)


def test_page_meta_extraction(spark):
    pages = spark.createDataFrame([
        Row(url="u1", html=(
            b'<html><head><title>First</title><title>Second</title>'
            b'<meta name="robots" content="NOINDEX, nofollow">'
            b'<link rel="canonical" href="https://c.org/x">'
            b"</head><body></body></html>")),
        Row(url="u2", html=(
            b"<head><meta name='robots' content='index, follow'>"
            b"<link rel='canonical' href='/y'></head>")),
        Row(url="u3", html=b"<body>no head signals at all</body>"),
    ])
    got = {r["url"]: r for r in page_meta(pages).collect()}
    assert got["u1"]["title"] == "First"              # first title wins
    assert got["u1"]["robots"] == "noindex, nofollow"  # lowercased
    assert got["u1"]["noindex"] is True
    assert got["u1"]["canonical"] == "https://c.org/x"
    assert got["u2"]["title"] == ""
    assert got["u2"]["noindex"] is False
    assert got["u2"]["canonical"] == "/y"              # single quotes
    assert got["u3"] == Row(url="u3", title="", robots="", noindex=False,
                            canonical="")


def test_title_plain_text_only(spark):
    """A title containing child markup is skipped entirely (same
    plain-text-only rule as extract_anchors); a later clean title wins."""
    df = spark.createDataFrame(
        [Row(h="<title>lead <b>bold</b></title>"),
         Row(h="<title>messy <i>x</i></title><title>clean</title>")])
    got = [r["t"] for r in
           df.select(title_of(F.col("h")).alias("t")).collect()]
    assert got == ["", "clean"]


def test_noindex_filter_usage(spark):
    """The documented pre-pipeline filter: noindex pages drop, the rest
    pass through untouched."""
    pages = spark.createDataFrame([
        Row(url="keep", html=b"<head><title>k</title></head>"),
        Row(url="drop", html=(
            b'<head><meta name="robots" content="noindex"></head>')),
    ])
    html = F.decode(F.col("html"), "UTF-8")
    kept = [r["url"] for r in
            pages.where(~noindex_of(html)).select("url").collect()]
    assert kept == ["keep"]


def test_uppercase_head_recognized(spark):
    """<TITLE> / NAME="ROBOTS" / Rel=Canonical pages (older crawl html)
    are recognized — patterns are case-insensitive."""
    pages = spark.createDataFrame([Row(url="u", html=(
        b'<HEAD><TITLE>Shouty</TITLE>'
        b'<META NAME="ROBOTS" CONTENT="NOINDEX">'
        b'<LINK REL="Canonical" HREF="/c"></HEAD>'))])
    r = page_meta(pages).head()
    assert r["title"] == "Shouty"
    assert r["noindex"] is True
    assert r["canonical"] == "/c"


def test_canonical_absent_is_empty(spark):
    df = spark.createDataFrame(
        [Row(h='<link rel="stylesheet" href="/s.css">')])
    assert df.select(
        canonical_of(F.col("h")).alias("c")).head()["c"] == ""


def test_charset_of_both_forms_and_absent(spark):
    from pyspark.sql import Row, functions as F

    from quickner_spark.kg.pagemeta import charset_of

    cases = [
        ('<html><head><META CHARSET="ISO-8859-1"></head></html>',
         "iso-8859-1"),
        ("<html><head><meta charset=utf-8></head></html>", "utf-8"),
        ('<html><head><meta http-equiv="Content-Type" '
         'content="text/html; charset=Windows-1252"></head></html>',
         "windows-1252"),
        ("<html><head></head></html>", ""),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = [r["c"] for r in
           df.select(charset_of(F.col("html")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_decode_pages_charset_dispatch(spark):
    from pyspark.sql import Row

    from quickner_spark.kg.pagemeta import decode_pages

    latin = ('<html><head><meta charset="iso-8859-1"></head>'
             '<body>caf\xe9</body></html>').encode("iso-8859-1")
    utf8 = "<html><body>café utf</body></html>".encode()
    junk = ('<html><head><meta charset="no-such-codec"></head>'
            '<body>x café</body></html>').encode()
    bad = b"<html><body>caf\xff\xfe broken</body></html>"
    df = spark.createDataFrame(
        [Row(url="l", html=bytearray(latin)),
         Row(url="u", html=bytearray(utf8)),
         Row(url="j", html=bytearray(junk)),
         Row(url="b", html=bytearray(bad)),
         Row(url="n", html=None)])
    got = {r["url"]: r["text_html"]
           for r in decode_pages(df).collect()}
    assert "café" in got["l"]          # declared latin-1 honored
    assert "café utf" in got["u"]      # utf-8 default
    assert "x café" in got["j"]        # unknown codec -> default
    assert "�" in got["b"]        # invalid bytes replaced, no raise
    assert got["n"] is None
    # decoded string feeds the column scans directly
    from pyspark.sql import functions as F

    from quickner_spark.kg.pagemeta import charset_of
    one = decode_pages(df.where(F.col("url") == "l"))
    assert one.select(charset_of(F.col("text_html")).alias("c")) \
        .head()["c"] == "iso-8859-1"
