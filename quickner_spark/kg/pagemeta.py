"""Page-metadata extraction over crawled html (web-scale extension).

Crawl indexing pipelines read three head signals before anything else:
the ``<title>``, the robots meta (``noindex`` pages must not enter the
index), and the ``rel=canonical`` link (the publisher's own dedup key —
stronger than URL normalization when present). The reference engine has
no html surface (quickner.rs ingests plain text); this module is part of
the beyond-inventory crawl operating mode (SURVEY §2.10), sibling to
:mod:`quickner_spark.kg.weblinks`.

All three are single-``regexp_extract`` column expressions sharing one
decoded-html pass in :func:`page_meta` — pure JVM scan work, zero
shuffle, no Python.

Recognition semantics (documented simplifications, shared by the q50
DuckDB oracle so they are cross-engine pinned):

* plain-text titles only — a title containing child markup is skipped
  entirely (the same rule as :func:`weblinks.extract_anchors`); the
  FIRST matching title tag wins.
* robots meta is matched with ``name`` before ``content``, quoted values
  (either style) — the dominant layout in crawl data; ``noindex`` /
  ``nofollow`` are substring tests on the content list.
* ``rel=canonical`` likewise expects ``rel`` before ``href``.
* tag and attribute names (and the robots/canonical keyword values)
  match case-insensitively — ``<TITLE>`` and ``NAME="ROBOTS"`` pages are
  recognized.

Filtering usage: ``pages.where(~noindex_of(F.col("html")))`` ahead of
``build_kg_pipeline`` keeps noindex pages out of the KG while leaving
them available to the link graph (robots semantics: noindex pages may
still pass outlink authority unless they are also nofollow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from quickner_spark.kg.weblinks import decoded_html

__all__ = ["title_of", "robots_of", "noindex_of", "canonical_of",
           "page_meta", "charset_of", "decode_pages"]

# case-insensitive on tag/attribute names AND the robots/canonical
# keyword values (<TITLE>, NAME="ROBOTS", Rel=Canonical are all valid)
_TITLE_RE = "(?i)<title[^>]*>([^<]*)</title>"
_ROBOTS_RE = ('(?i)<meta\\s[^>]*name\\s*=\\s*["\']robots["\'][^>]*'
              'content\\s*=\\s*["\']([^"\']*)["\']')
_CANONICAL_RE = ('(?i)<link\\s[^>]*rel\\s*=\\s*["\']canonical["\'][^>]*'
                 'href\\s*=\\s*["\']([^"\']*)["\']')


def title_of(html: Column) -> Column:
    """First plain-text ``<title>`` content; '' when absent."""
    return F.regexp_extract(html, _TITLE_RE, 1)


def robots_of(html: Column) -> Column:
    """Content of the robots meta tag (lowercased); '' when absent."""
    return F.lower(F.regexp_extract(html, _ROBOTS_RE, 1))


def noindex_of(html: Column) -> Column:
    """True when the robots meta contains ``noindex``."""
    return robots_of(html).contains("noindex")


def canonical_of(html: Column) -> Column:
    """``rel=canonical`` href; '' when absent."""
    return F.regexp_extract(html, _CANONICAL_RE, 1)


def page_meta(pages: DataFrame, url_col: str = "url",
              html_col: str = "html") -> DataFrame:
    """(url, title, robots, noindex, canonical) — the head signals an
    indexing pipeline reads first, extracted in ONE decoded scan pass."""
    html = decoded_html(pages, html_col)
    return pages.select(
        F.col(url_col).alias("url"),
        title_of(html).alias("title"),
        robots_of(html).alias("robots"),
        noindex_of(html).alias("noindex"),
        canonical_of(html).alias("canonical"))


# charset declaration forms, probed in precedence order: HTML5
# <meta charset="X">, then the legacy http-equiv content-type. ASCII
# superset assumption: the declaration itself is readable by decoding
# the raw bytes as latin-1 (every byte maps; the regexes only consume
# ASCII), which is how real sniffers bootstrap (WHATWG encoding sniff).
_META_CHARSET_RE = '(?i)<meta\\s[^>]*charset\\s*=\\s*["\']?([A-Za-z0-9_.:-]+)'
_HTTPEQUIV_RE = ('(?i)<meta\\s[^>]*content\\s*=\\s*["\'][^"\']*'
                 'charset=([A-Za-z0-9_.:-]+)')


def charset_of(html: Column) -> Column:
    """Declared charset of a page (lowercased): the HTML5 ``<meta
    charset=…>`` form, else the legacy ``http-equiv`` content-type
    form, else ''. Feed a latin-1/ASCII-bootstrapped decode (the
    declaration is ASCII by spec). Pure column work."""
    c = F.coalesce(
        F.nullif(F.regexp_extract(html, _META_CHARSET_RE, 1), F.lit("")),
        F.regexp_extract(html, _HTTPEQUIV_RE, 1))
    return F.lower(c)


def decode_pages(pages: DataFrame, html_col: str = "html",
                 out_col: str = "text_html",
                 default: str = "utf-8") -> DataFrame:
    """The pages table plus ``out_col``: the html BYTES decoded with
    each page's declared charset (``charset_of`` over a latin-1
    bootstrap read), falling back to ``default`` when the declaration
    is absent or names an unknown codec; undecodable byte sequences
    are replaced, never raised (crawl data is hostile — a corrupt page
    must not kill a 100 TB stage).

    One Arrow-batched ``mapInPandas`` kernel — the charset dispatch is
    per-row Python by necessity (the JVM ``decode`` expression is
    single-charset), but the bytes stay in-batch and the kernel is the
    same shape as the extract stage's. Downstream column scans
    (:func:`page_meta`, :mod:`~quickner_spark.kg.weblinks`) accept the
    decoded STRING column directly."""
    import codecs
    from typing import Iterator as _It

    import pandas as pd

    from pyspark.sql import types as T

    fields = pages.schema.fields + [T.StructField(out_col, T.StringType())]
    schema = T.StructType(fields)

    def kernel(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import re
        meta_re = re.compile(
            r'(?is)<meta\s[^>]*charset\s*=\s*["\']?([A-Za-z0-9_.:-]+)')
        equiv_re = re.compile(
            r'(?is)<meta\s[^>]*content\s*=\s*["\'][^"\']*'
            r'charset=([A-Za-z0-9_.:-]+)')
        for pdf in batches:
            out = []
            for raw in pdf[html_col].values:
                if raw is None:
                    out.append(None)
                    continue
                b = bytes(raw)
                boot = b.decode("latin-1")
                m = meta_re.search(boot) or equiv_re.search(boot)
                enc = m.group(1).lower() if m else default
                try:
                    codecs.lookup(enc)
                except LookupError:
                    enc = default
                out.append(b.decode(enc, errors="replace"))
            pdf[out_col] = out
            yield pdf

    return pages.mapInPandas(kernel, schema=schema)
