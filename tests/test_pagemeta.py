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
