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
           "page_meta"]

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
