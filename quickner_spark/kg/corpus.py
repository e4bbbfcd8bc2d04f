"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the ``pages`` table from BASELINE.json input_hint —
(url string, warc_ts timestamp, html binary, text string, lang string) —
fully seeded (no external data), with the skew properties a real web corpus
has and that the pipeline must handle:

* Zipf-distributed entity frequency (head entities) over a synthesized
  gazetteer (shape mirrors the reference's 999-name, mostly-ORG
  data/entities.csv — synthesized, not copied).
* hot-domain URL clustering (a few domains own most pages).
* sentence templates that embed gazetteer entities around connective
  predicates, so triple extraction has ground truth.
* html synthesized FROM text, so extraction is exactly invertible and the
  "byte-identical extracted text per url" invariant is testable.

Generation is distributed: ``spark.range(n)`` -> JVM-safe deterministic
row derivation in a pandas UDF seeded per doc index (no driver-side
materialization; scales to any n).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import html as html_mod
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["synth_gazetteer", "synth_pages", "page_html", "page_html_messy",
           "PREDICATES", "LABELS"]

PREDICATES = ("was created by", "is made by", "works at", "acquired")
LABELS = ("ORG", "PERSON", "PL", "PRODUCT")

_FIRST = ["alda", "brin", "cora", "dane", "elya", "finn", "gera", "hale",
          "iris", "jude", "kira", "liam", "mira", "nash", "opal", "pell"]
_LAST = ["anders", "boyle", "chen", "diaz", "evans", "fuchs", "grant",
         "hopper", "ito", "jain", "kim", "lovett", "moss", "nolan"]
_ORG_A = ["acme", "orbit", "vertex", "quark", "zenith", "nimbus", "pylon",
          "cobalt", "ember", "flux", "gale", "helix"]
_ORG_B = ["systems", "labs", "software", "industries", "dynamics", "works",
          "computing", "networks", "analytics", "robotics"]
_FILLER = ("the quick overview explains how the platform handles scale and "
           "why teams adopt it for production workloads").split()
_DOMAINS = ["alpha.example.org", "beta.example.org", "gamma.example.org",
            "delta.example.org", "epsilon.example.org", "zeta.example.org",
            "eta.example.org", "theta.example.org"]
_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh"]


def _h(seed: int, *parts) -> int:
    """Deterministic 64-bit hash stream (stable across runs/processes)."""
    m = hashlib.blake2b(digest_size=8)
    m.update(str(seed).encode())
    for p in parts:
        m.update(b"\x1f")
        m.update(str(p).encode())
    return int.from_bytes(m.digest(), "big")


def synth_gazetteer(n: int = 999, seed: int = 42) -> list[tuple[str, str]]:
    """~n gazetteer rows, mostly ORG (shape of reference data/entities.csv).
    Deterministic; includes multi-word names and shared-prefix collisions
    (overlapping-pattern stress)."""
    out: list[tuple[str, str]] = []
    i = 0
    while len(out) < n:
        r = _h(seed, "gaz", i)
        kind = r % 10
        if kind < 7:  # ORG
            name = f"{_ORG_A[r % len(_ORG_A)]} {_ORG_B[(r >> 8) % len(_ORG_B)]}"
            if (r >> 16) % 3 == 0:
                name += f" {_ORG_B[(r >> 24) % len(_ORG_B)]}"
            out.append((name, "ORG"))
        elif kind < 9:  # PERSON
            name = f"{_FIRST[r % len(_FIRST)]} {_LAST[(r >> 8) % len(_LAST)]}"
            out.append((name, "PERSON"))
        else:  # PRODUCT
            name = f"{_ORG_A[r % len(_ORG_A)]}{(r >> 8) % 100}"
            out.append((name, "PRODUCT"))
        i += 1
    # set-dedup preserving determinism (reference gazetteer is a set)
    return sorted(set(out))[:n]


def _zipf_pick(items: list, r: int) -> object:
    """Zipf-ish pick: rank k chosen with weight ~ 1/(k+1)."""
    n = len(items)
    # cumulative harmonic inversion via a cheap approximation
    u = (r % 10_000) / 10_000.0
    k = int(n ** u) - 1
    return items[max(0, min(n - 1, k))]


def page_text(i: int, gaz: list[tuple[str, str]], seed: int = 42,
              hot_name_share: float = 0.0) -> tuple[str, list[tuple[str, str, str]]]:
    """Deterministic text for doc i + its ground-truth triples.
    ``hot_name_share``: probability that a sentence's SUBJECT is forced to
    ``gaz[0]`` — the planted head entity for skew evidence (a Zipf-1 head
    far heavier than the generator's organic Zipf tail)."""
    r0 = _h(seed, "doc", i)
    n_sent = 1 + r0 % 3
    sents = []
    triples = []
    for s in range(n_sent):
        r = _h(seed, "sent", i, s)
        if hot_name_share and (_h(seed, "hot", i, s) % 10_000
                               < hot_name_share * 10_000):
            subj, _ = gaz[0]
        else:
            subj, _ = _zipf_pick(gaz, r)
        obj, _ = _zipf_pick(gaz, r >> 16)
        if obj == subj:
            j = (r >> 32) % len(gaz)
            obj, _ = gaz[j]
            if obj == subj:  # guarantee distinct so every sentence is a triple
                obj, _ = gaz[(j + 1) % len(gaz)]
        pred = PREDICATES[(r >> 48) % len(PREDICATES)]
        filler = " ".join(
            _FILLER[(_h(seed, "f", i, s, j)) % len(_FILLER)]
            for j in range(r % 5))
        core = f"{subj} {pred} {obj}"
        sents.append((core + (" " + filler if filler else "")).strip())
        triples.append((subj, pred.replace(" ", "_"), obj))
    return ". ".join(sents) + ".", triples


def page_html(text: str, title: str) -> bytes:
    """Deterministic html synthesis — the inverse of kg.extract.extract_text.
    Escaped payload guarantees byte-identical round-trip."""
    return (f"<html><head><title>{html_mod.escape(title)}</title></head>"
            f"<body><nav>home | about</nav><p>{html_mod.escape(text)}</p>"
            f"<footer>generated</footer></body></html>").encode("utf-8")


def page_html_messy(text: str, title: str, i: int, seed: int = 42,
                    outlink_hosts: int = 0) -> bytes:
    """Real-web-shaped html for the boilerplate-aware extractor
    (``kg.webextract.extract_text_web``): the content paragraph is buried
    under deterministic chrome — a nav link bar, two link-farm lists whose
    anchor text is GAZETTEER ORG NAMES (boilerplate that the extractor
    must drop, or spurious mentions poison triple precision), inline
    script/style, and a footer. Every chrome block is either link-dense
    (anchor chars / chars > 0.5) or short (< 5 alnum words), so the
    boilerpipe-family classifier rejects it; the content block survives
    word-for-word, keeping the byte-identical-extraction invariant
    testable on messy pages too (the synthetic text is single-spaced, so
    whitespace collapse is the identity on it)."""
    esc = html_mod.escape
    r = _h(seed, "chrome", i)
    nav = " ".join(
        f'<a href="/s/{(r >> (4 * j)) % 97}">'
        f'{_FILLER[(r >> (3 * j)) % len(_FILLER)]}</a>'
        for j in range(6))
    farm = "".join(
        f'<li><a href="/t/{j}">{_ORG_A[(r >> j) % len(_ORG_A)]} '
        f'{_ORG_B[(r >> (j + 2)) % len(_ORG_B)]}</a></li>'
        for j in range(8))
    # optional cross-host chrome for hyperlink-graph work (kg.weblinks):
    # 4 deterministic absolute anchors to a bounded host universe. The
    # block is link-dense, so the boilerplate classifier drops it and the
    # byte-identical text-extraction invariant is untouched; default 0
    # keeps every existing corpus byte-for-byte.
    ext = ""
    if outlink_hosts:
        ext = "<div class=\"partners\"><ul>" + "".join(
            f'<li><a href="https://h{(r >> (5 * j)) % outlink_hosts}'
            f'.example.org/p/{j}">partner {j}</a></li>'
            for j in range(4)) + "</ul></div>"
    return (
        f"<html><head><title>{esc(title)}</title>"
        "<style>body{margin:0;font:14px sans-serif}</style>"
        f"<script>var pageId={r % 100000};trk();</script></head><body>"
        f"<nav>{nav}</nav>"
        f'<div class="sidebar"><ul>{farm}</ul></div>'
        f"<article><p>{esc(text)}</p></article>"
        f'{ext}<div class="related"><ul>{farm}</ul></div>'
        '<footer><a href="/about">about</a> | '
        '<a href="/contact">contact</a> | copyright</footer>'
        "</body></html>").encode("utf-8")


def synth_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                gaz_size: int = 999, partitions: int | None = None,
                sents_per_page: int = 1,
                html_style: str = "clean",
                hot_name_share: float = 0.0,
                hot_domain_share: float = 0.0,
                outlink_hosts: int = 0) -> DataFrame:
    """Distributed generation of the pages table. Hot-domain skew: domain
    rank chosen Zipf-style, so ~40% of urls land on one domain.
    ``sents_per_page`` > 1 concatenates that many generated pages into one
    heavy page (url/meta keyed on the page index; used by the scaling
    benchmarks to give each row realistic compute weight; default 1 keeps
    the golden-triples contract byte-identical).
    ``html_style="messy"`` wraps the same text in real-web chrome
    (:func:`page_html_messy`) for the boilerplate-aware extractor path —
    the ``text`` column (ground truth) is unchanged, so any extractor can
    be judged against it.

    Planted-skew knobs for stress evidence (default off):
    ``hot_name_share`` forces that fraction of sentence SUBJECTS to
    ``gaz[0]`` (a head entity dominating the mention distribution — the
    skew case for every surface-keyed aggregate and join);
    ``hot_domain_share`` routes that fraction of urls to ONE domain
    prefix (hot-host crawl skew; url-keyed plans must stay balanced
    because bucket/shuffle keys hash the FULL url).

    ``outlink_hosts`` (messy style only): add a 4-anchor cross-host
    "partners" block per page over a universe of that many external hosts
    (:mod:`kg.weblinks` evidence corpus; default 0 = byte-identical to
    every earlier corpus)."""
    if html_style not in ("clean", "messy"):
        raise ValueError(f"unknown html_style: {html_style!r}")
    gaz = synth_gazetteer(gaz_size, seed)
    sc_partitions = partitions or max(8, n_docs // 25_000)
    base = spark.range(0, n_docs, 1, sc_partitions)
    spp = sents_per_page
    messy = html_style == "messy"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        epoch = dt.datetime(2024, 1, 1)
        for pdf in batches:
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for i in pdf["id"].values:
                i = int(i)
                if spp == 1:
                    text, _ = page_text(i, gaz, seed, hot_name_share)
                else:
                    text = " ".join(
                        page_text(i * spp + k, gaz, seed, hot_name_share)[0]
                        for k in range(spp))
                r = _h(seed, "meta", i)
                if hot_domain_share and (_h(seed, "hotd", i) % 10_000
                                         < hot_domain_share * 10_000):
                    domain = _DOMAINS[0]
                else:
                    domain = _zipf_pick(_DOMAINS, r)
                urls.append(f"https://{domain}/doc/{i}")
                tss.append(epoch + dt.timedelta(seconds=i % 864000))
                htmls.append(
                    page_html_messy(text, f"doc {i}", i, seed,
                                    outlink_hosts=outlink_hosts)
                    if messy else page_html(text, f"doc {i}"))
                texts.append(text)
                langs.append(_LANGS[(r >> 8) % len(_LANGS)])
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls,
                                "text": texts, "lang": langs})

    return base.mapInPandas(
        gen, "url string, warc_ts timestamp, html binary, text string, "
             "lang string")


def golden_triples(n_docs: int, seed: int = 42,
                   gaz_size: int = 999) -> list[tuple[str, str, str, str]]:
    """Ground-truth (subj, pred, obj, url) for the synthetic corpus —
    the frozen oracle for triple-level P/R."""
    gaz = synth_gazetteer(gaz_size, seed)
    out = []
    for i in range(n_docs):
        _, triples = page_text(i, gaz, seed)
        r = _h(seed, "meta", i)
        domain = _zipf_pick(_DOMAINS, r)
        url = f"https://{domain}/doc/{i}"
        for t in triples:
            out.append((*t, url))
    return out
