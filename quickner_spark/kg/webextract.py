"""Boilerplate-aware text extraction for real-web HTML.

``kg.extract.extract_text`` inverts the synthetic corpus generator exactly
(byte-identical invariant); this module is the swap-in for non-synthetic
pages the extract stage docstring promises: a deterministic, pure-stdlib
(``html.parser``) extractor in the boilerplate-removal family of
Kohlschütter et al.'s boilerpipe (WSDM 2010) — block segmentation +
(word count, link density) features — with no parser-library dependency,
so it runs on any executor image.

Algorithm:
1. Parse once with ``HTMLParser`` (charrefs decoded by the parser).
   Content inside ``script/style/noscript/template/svg/head`` is dropped;
   block-level tags close the current text block; ``<a>`` text is counted
   toward the block's anchor-char tally.
2. A block is CONTENT iff it has >= ``min_words`` words AND its link
   density (anchor chars / text chars) is <= ``max_link_density``.
   Short low-link blocks between two content blocks are kept too
   (headline/continuation rule — the boilerpipe "surrounded" heuristic).
3. Blocks join with a single newline. Whitespace inside a block collapses
   to single spaces, so output is deterministic byte-for-byte for a given
   input (pinned by tests).

Same stage contract as ``extract_stage``: Arrow-batched ``mapInPandas``,
``(url string, text string)`` output, column-pruned scan — swap via
``extract_stage(pages, extractor=extract_text_web)`` or the fused
``extract_annotate_stage(pages, gaz, extractor=extract_text_web)``.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["extract_text_web"]

_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe"})
_BLOCK_TAGS = frozenset(
    {"p", "div", "article", "section", "li", "ul", "ol", "table", "tr",
     "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "br", "blockquote",
     "pre", "header", "footer", "nav", "aside", "main", "body", "figure",
     "figcaption", "form"})
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link"})


class _BlockParser(HTMLParser):
    """One pass -> list of (text, n_chars, n_anchor_chars) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._buf: list[str] = []
        self._anchor_chars = 0
        self._skip_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((text, len(text), self._anchor_chars))
        self._buf = []
        self._anchor_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_TAGS and tag not in _VOID_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._buf.append(data)
        if self._anchor_depth:
            self._anchor_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush()


def extract_text_web(html: bytes | None, min_words: int = 5,
                     max_link_density: float = 0.5) -> str | None:
    """Deterministic boilerplate-aware extraction; None for undecodable,
    empty, or all-boilerplate payloads (the same invalid-input contract as
    ``extract_text``)."""
    if html is None:
        return None
    try:
        raw = html.decode("utf-8")
    except UnicodeDecodeError:
        return None
    parser = _BlockParser()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        return None  # pathological markup: skip the page, never the job
    blocks = parser.blocks
    content = []
    for i, (text, n_chars, n_anchor) in enumerate(blocks):
        # count only tokens carrying at least one alphanumeric — bullet
        # separators and bare punctuation shouldn't qualify chrome blocks
        n_words = sum(1 for w in text.split()
                      if any(c.isalnum() for c in w))
        dense_link = n_chars > 0 and (n_anchor / n_chars) > max_link_density
        if dense_link:
            content.append(False)
        else:
            content.append(n_words >= min_words)
    # "surrounded" rule: a short low-link block between two content blocks
    # is a headline/continuation, keep it
    for i in range(1, len(blocks) - 1):
        if not content[i]:
            _, n_chars, n_anchor = blocks[i]
            low_link = n_chars == 0 or (n_anchor / n_chars) <= max_link_density
            if low_link and content[i - 1] and content[i + 1]:
                content[i] = True
    kept = [b[0] for b, c in zip(blocks, content) if c]
    return "\n".join(kept) if kept else None
