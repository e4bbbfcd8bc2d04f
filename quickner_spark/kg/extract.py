"""Text extraction: html binary -> text, deterministic and byte-identical
per url (BASELINE.json input_hint).

The extractor is a pure-Python deterministic function (no parser library
dependency) run as an Arrow-batched mapInPandas stage. It inverts
``kg.corpus.page_html`` exactly: the first ``<p>...</p>`` payload,
HTML-unescaped. Real-web HTML would swap in a stronger extractor behind the
same stage contract (same schema/batching); determinism per url is the
invariant the pipeline tests pin.
"""

from __future__ import annotations

import html as html_mod
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["extract_text", "extract_stage"]

_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)


def extract_text(html: bytes) -> str | None:
    """Deterministic extraction; None for undecodable/empty payloads
    (the engine-level analogue of the reference's invalid-utf8 skip,
    quickner.rs:123-126)."""
    if html is None:
        return None
    m = _P_RE.search(html)
    if not m:
        return None
    try:
        return html_mod.unescape(m.group(1).decode("utf-8"))
    except UnicodeDecodeError:
        return None


def extract_stage(pages: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """pages(url, html, ...) -> (url, text). Narrow map, no shuffle; only
    (url, html) columns are read (column pruning drops the rest at the
    scan)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                url_col: pdf[url_col],
                "text": [extract_text(h) for h in pdf[html_col].values],
            })

    return pages.select(url_col, html_col).mapInPandas(
        gen, f"{url_col} string, text string")
