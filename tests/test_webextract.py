"""Real-web boilerplate-aware extractor: content kept, chrome dropped,
deterministic bytes-in -> text-out, and the extract-stage contract."""

from __future__ import annotations

import pytest

from quickner_spark.kg.webextract import extract_text_web

PAGE = b"""<!DOCTYPE html>
<html><head><title>Acme quarterly report</title>
<style>body { color: red }</style>
<script>var tracking = "do not extract";</script></head>
<body>
<nav><a href="/">home</a> <a href="/news">news</a> <a href="/about">about</a></nav>
<div class="sidebar"><a href="/x">related one</a> <a href="/y">related two</a></div>
<article>
<h2>Acme systems posts record results</h2>
<p>Acme systems reported a strong quarter with revenue growth across all
regions, beating analyst expectations by a wide margin.</p>
<p>The company credited its data platform and the new stream processing
product line for most of the growth in enterprise accounts.</p>
</article>
<footer>Copyright 2026 Acme &middot; <a href="/terms">terms</a></footer>
</body></html>"""


def test_content_kept_boilerplate_dropped():
    text = extract_text_web(PAGE)
    assert text is not None
    assert "revenue growth" in text
    assert "stream processing" in text
    # headline between two content paragraphs is kept (surrounded rule
    # does not apply here — it leads; it qualifies by its own word count)
    assert "record results" in text
    # chrome is gone
    assert "tracking" not in text
    assert "color: red" not in text
    assert "home" not in text.split("\n")[0] or "news" not in text
    assert "Copyright" not in text


def test_link_dense_blocks_dropped():
    html = (b"<body><div><a href='/a'>one two three four five six</a></div>"
            b"<p>plain prose block with enough words to qualify here</p>"
            b"</body>")
    text = extract_text_web(html)
    assert text == "plain prose block with enough words to qualify here"


def test_deterministic_and_charref_decoding():
    html = (b"<body><p>caf&eacute; costs &lt;5 euros which is a bargain"
            b" honestly</p></body>")
    a = extract_text_web(html)
    b2 = extract_text_web(html)
    assert a == b2 == "café costs <5 euros which is a bargain honestly"


def test_invalid_inputs_return_none():
    assert extract_text_web(None) is None
    assert extract_text_web(b"\xff\xfe\x00broken") is None
    assert extract_text_web(b"<body><nav><a href='/'>x</a></nav></body>") is None


def test_surrounded_headline_rule():
    html = (b"<body>"
            b"<p>first real paragraph with plenty of words to qualify as content</p>"
            b"<h3>Short head</h3>"
            b"<p>second real paragraph also with plenty of words to qualify</p>"
            b"</body>")
    text = extract_text_web(html)
    assert "Short head" in text


def test_extract_stage_contract_with_web_extractor(spark):
    from quickner_spark.kg.extract import extract_annotate_stage, extract_stage

    pages = spark.createDataFrame(
        [("u0", bytearray(PAGE)), ("u1", None),
         ("u2", bytearray(b"<body><p>acme systems ships data platform to "
                          b"every region this year</p></body>"))],
        "url string, html binary")
    out = {r["url"]: r["text"]
           for r in extract_stage(pages, extractor=extract_text_web).collect()}
    assert out["u1"] is None
    assert "revenue growth" in out["u0"]
    # fused variant: same text, spans from the same automaton
    fused = extract_annotate_stage(
        pages, [("acme systems", "ORG"), ("data platform", "PROD")],
        extractor=extract_text_web)
    rows = {r["url"]: r for r in fused.collect()}
    assert rows["u0"]["text"] == out["u0"]
    labs = {s["label"] for s in rows["u2"]["spans"]}
    assert labs == {"ORG", "PROD"}
    surfaces = {s["surface"] for s in rows["u2"]["spans"]}
    assert "acme systems" in surfaces
