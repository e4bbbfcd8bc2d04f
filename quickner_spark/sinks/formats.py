"""Serialization sinks K1-K7 (SURVEY.md §2.2) with reference format parity.

Dispatch mirrors Format::save (quickner-core/src/models.rs:39-47). Every
format quirk is replicated on purpose (and flagged in the docstrings):

* K3 "csv" writes JSON lines with a .csv extension (models.rs:92-102).
* K4 brat uses char offsets as byte offsets when slicing (models.rs:114) —
  we slice by chars (safe superset; identical for ASCII) and note it.
* K5 CoNLL assigns the label to the FIRST whitespace token that *contains*
  the surface as a substring; no B-/I- prefixes (models.rs:123-165).
* K7 spaCy generator uses the misspelled key ``"entitiy"``
  (src/pyquickner.rs:373).

Two write paths per format:
* ``*_lines(df)`` — a DataFrame of formatted lines: the distributed path
  (``.write.text``), scales to any size.
* ``to_*(df, path)`` — single local file for byte-parity with the
  reference CLI (driver-side iteration; small outputs only).

The path always has its extension replaced like Format::
remove_extension_from_path (models.rs:49-55).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "save_annotations", "to_jsonl", "to_spacy", "to_csv", "to_brat",
    "to_conll", "to_numpy", "spacy_generator", "jsonl_lines",
    "spacy_lines", "conll_lines", "brat_lines", "ntriples_lines",
    "wet_lines", "cdxj_lines", "wat_lines",
]


def _strip_ext(path: str) -> str:
    """models.rs:49-55 — truncate at the LAST dot anywhere in the path."""
    if "." in path:
        return path[: path.rindex(".")]
    return path


def _doc_json(doc_id: str, text: str, label) -> str:
    """serde_json-compatible compact encoding: {"id","text","label":[[s,e,l]]}."""
    payload = {"id": doc_id, "text": text,
               "label": [[int(s), int(e), l] for s, e, l in label]}
    return json.dumps(payload, separators=(",", ":"), ensure_ascii=False)


def _iter_docs(df: DataFrame) -> Iterator[tuple[str, str, list]]:
    for row in df.select("id", "text", "label").toLocalIterator():
        label = [(s["start"], s["end"], s["label"]) for s in (row["label"] or [])]
        yield row["id"], row["text"], label


def _json_str(col):
    """JSON string literal (quoted + escaped) for a string column, JVM-side:
    wrap in a 1-element array through ``to_json`` and strip the brackets —
    Jackson applies the same RFC 8259 escapes as ``json.dumps(...,
    ensure_ascii=False)`` (quotes, backslashes, control chars; raw
    unicode kept), which is what byte-parity with the driver writers
    requires. Hand-rolled concat would corrupt any text containing a
    quote or backslash."""
    j = F.to_json(F.array(col))
    return j.substr(F.lit(2), F.length(j) - 2)


def jsonl_lines(df: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """K1 distributed path: one JSON line per document, byte-identical to
    ``to_jsonl``'s serde-compatible encoding (models.rs:80-90) —
    ``{"id":…,"text":"…","label":[[s,e,"L"],…]}`` with UNQUOTED integer
    offsets, built entirely JVM-side by string assembly (``to_json`` alone
    cannot emit the reference's heterogeneous ``[int, int, str]`` span
    arrays — a typed Spark array would quote the offsets). A string ``id``
    is JSON-escaped; numeric ids serialize bare, matching ``json.dumps``.
    ``keep_cols``: pass-through columns next to ``value``."""
    sid = df.schema["id"].dataType.simpleString()
    id_json = (_json_str(F.col("id")) if sid == "string"
               else F.col("id").cast("string"))
    spans = F.concat_ws(",", F.transform(
        F.coalesce("label", F.array()),
        lambda sp: F.concat(
            F.lit("["), sp["start"].cast("long").cast("string"), F.lit(","),
            sp["end"].cast("long").cast("string"), F.lit(","),
            _json_str(sp["label"]), F.lit("]"))))
    value = F.concat(F.lit('{"id":'), id_json,
                     F.lit(',"text":'), _json_str(F.col("text")),
                     F.lit(',"label":['), spans, F.lit("]}"))
    return df.select(*keep_cols, value.alias("value"))


def spacy_lines(df: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """K2 distributed path: one spaCy envelope ELEMENT per document —
    ``["text",{"entity":[[s,e,"L"],…]}]`` (models.rs:57-78, correct
    spelling) — byte-identical to the elements ``to_spacy`` emits: joining
    the rows with "," inside "[...]" reproduces the driver writer's single
    JSON array byte-for-byte (pinned by test). The enclosing array is the
    only driver-side part; a distributed text sink writes one element per
    line (JSONL-style spaCy, the form spaCy's own converters accept)."""
    spans = F.concat_ws(",", F.transform(
        F.coalesce("label", F.array()),
        lambda sp: F.concat(
            F.lit("["), sp["start"].cast("long").cast("string"), F.lit(","),
            sp["end"].cast("long").cast("string"), F.lit(","),
            _json_str(sp["label"]), F.lit("]"))))
    value = F.concat(F.lit("["), _json_str(F.col("text")),
                     F.lit(',{"entity":['), spans, F.lit("]}]"))
    return df.select(*keep_cols, value.alias("value"))


def conll_lines(df: DataFrame, keep_cols: tuple[str, ...] = (),
                max_spans: int | None = None) -> DataFrame:
    """K5 distributed path: one row per document whose ``value`` is the
    document's whole CoNLL block (token\\tlabel lines; ``.write.text``
    appends the final newline, yielding the blank separator line). Entirely
    JVM-side higher-order functions — no Python in the hot path; scales to
    any corpus size, unlike ``to_conll``'s driver-side single file.

    Replicates the models.rs:123-165 heuristic exactly: whitespace tokens,
    label goes to the FIRST token containing the span's surface as a
    substring (later spans overwrite), all others "O".

    ``keep_cols``: pass-through columns (e.g. a doc id) carried next to
    ``value`` — useful for keyed comparisons or partitioned writes.

    Cost bound: the tag fold is O(words x spans) PER DOCUMENT (each span
    rewrites the whole tag array) — linear for real corpora (spans <<
    words), quadratic only on adversarial span-dense documents. For
    untrusted input set ``max_spans``: spans beyond the first
    ``max_spans`` (in the caller's sort order — (start, end, label) by
    convention) are dropped from tagging, bounding per-document work at
    O(words x max_spans); the same drop-the-degenerate-tail philosophy as
    the LSH ``max_bucket`` cap. Default None tags every span.

    NULL-text documents are DROPPED: they would emit an empty sentence
    block, which CoNLL readers parse as a spurious boundary (the JSON
    sinks instead keep the row with ``"text":null`` — a structured
    format can carry the null; a positional one cannot)."""
    df = df.where(F.col("text").isNotNull())
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    label_src = F.coalesce("label", F.array())
    if max_spans is not None:
        label_src = F.slice(label_src, 1, max_spans)
    d = df.select(*keep_cols, "text",
                  label_src.alias("label"),
                  words.alias("words"))
    # Hit positions are precomputed into the AGGREGATE'S INPUT array —
    # evaluated exactly once per row regardless of how Catalyst collapses
    # projections (the same guarantee _minhash_sig relies on). The naive
    # formulation put the O(words) word scan inside the per-element
    # zip_with lambda, re-evaluating it per (span x word): O(spans x
    # words^2) interpreted HOF work, ~30 s for ONE 200-word/200-span
    # document. This shape is O(spans x words) string work in the input +
    # O(spans x words) integer compares in the fold.
    hit_pos = F.transform(
        F.col("label"),
        lambda sp: F.struct(
            F.array_position(
                F.transform(F.col("words"),
                            lambda w: w.contains(F.col("text").substr(
                                sp["start"] + 1, sp["end"] - sp["start"]))),
                F.lit(True)).alias("hit"),
            sp["label"].alias("lab")))
    idx_arr = F.sequence(F.lit(1), F.size("words").cast("long"))
    # left-to-right fold over spans, LATER SPANS OVERWRITE — identical
    # semantics to applying spans in order onto a tag array
    tags = F.aggregate(
        hit_pos,
        F.transform(F.col("words"), lambda w: F.lit("O")),
        lambda acc, h: F.zip_with(
            acc, idx_arr,
            lambda t, i: F.when(i == h["hit"], h["lab"]).otherwise(t)))
    lines = F.concat_ws(
        "\n", F.zip_with(F.col("words"), tags,
                         lambda w, t: F.concat_ws("\t", w, t)))
    value = F.when(F.size("words") == 0, F.lit("")) \
        .otherwise(F.concat(lines, F.lit("\n")))
    return d.select(*keep_cols, value.alias("value"))


def brat_lines(df: DataFrame,
               keep_cols: tuple[str, ...] = ()) -> tuple[DataFrame, DataFrame]:
    """K4 distributed path: ``(txt_lines, ann_lines)`` DataFrames for
    ``.write.text`` (the ``{base}.txt`` texts and ``{base}.ann``
    annotations). Same per-document counter reset as ``to_brat``
    (models.rs:104-121); surface slicing is by chars (see ``to_brat``).
    Documents with no spans contribute no .ann rows, matching the driver
    writer. JVM-side throughout. ``keep_cols``: pass-through columns
    carried next to ``value`` in both outputs."""
    txt = df.select(*keep_cols, F.col("text").alias("value"))
    spans = F.zip_with(
        F.col("label"), F.sequence(F.lit(0), F.size("label") - 1),
        lambda sp, i: F.concat_ws(
            "\t", F.concat(F.lit("T"), i.cast("string")), sp["label"],
            sp["start"].cast("string"), sp["end"].cast("string"),
            F.col("text").substr(sp["start"] + 1, sp["end"] - sp["start"])))
    ann = (df.where(F.size(F.coalesce("label", F.array())) > 0)
           .select(*keep_cols, F.concat_ws("\n", spans).alias("value")))
    return txt, ann


def to_jsonl(df: DataFrame, path: str) -> str:
    """K1 — models.rs:80-90."""
    out = _strip_ext(path) + ".jsonl"
    with open(out, "w", encoding="utf-8") as fh:
        for doc_id, text, label in _iter_docs(df):
            fh.write(_doc_json(doc_id, text, label))
            fh.write("\n")
    return _strip_ext(path)


def to_csv(df: DataFrame, path: str) -> str:
    """K3 — quirk: JSON lines under a .csv extension (models.rs:92-102)."""
    out = _strip_ext(path) + ".csv"
    with open(out, "w", encoding="utf-8") as fh:
        for doc_id, text, label in _iter_docs(df):
            fh.write(_doc_json(doc_id, text, label))
            fh.write("\n")
    return _strip_ext(path)


def to_spacy(df: DataFrame, path: str) -> str:
    """K2 — single JSON array [[text, {"entity": [[s,e,l],...]}], ...]
    (models.rs:57-78; note the CORRECT spelling here, unlike K7)."""
    out = _strip_ext(path) + ".json"
    docs = [[text, {"entity": [[int(s), int(e), l] for s, e, l in label]}]
            for _, text, label in _iter_docs(df)]
    with open(out, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(docs, separators=(",", ":"), ensure_ascii=False))
    return _strip_ext(path)


def to_brat(df: DataFrame, path: str) -> str:
    """K4 — {path}.txt (one text per line) + {path}.ann with
    ``T{id}\\t{label}\\t{start}\\t{end}\\t{surface}``; the entity counter
    resets per document while all docs share one file (models.rs:104-121).
    The reference slices text[start..end] treating char offsets as byte
    offsets (panics on non-ASCII); we slice by chars — identical output for
    ASCII, well-defined for the rest."""
    base = _strip_ext(path)
    with open(base + ".txt", "w", encoding="utf-8") as ftxt, \
            open(base + ".ann", "w", encoding="utf-8") as fann:
        for _, text, label in _iter_docs(df):
            ftxt.write(text)
            ftxt.write("\n")
            for i, (s, e, lab) in enumerate(label):
                fann.write(f"T{i}\t{lab}\t{s}\t{e}\t{text[s:e]}\n")
    return base


def to_conll(df: DataFrame, path: str) -> str:
    """K5 — whitespace tokens, label assigned to the FIRST token containing
    the surface as a substring, others "O"; token\\tlabel lines, blank line
    between documents (models.rs:123-165). Multi-token entities collapse to
    one token — reference quirk, replicated."""
    out = _strip_ext(path) + ".txt"
    with open(out, "w", encoding="utf-8") as fh:
        for _, text, label in _iter_docs(df):
            words = text.split()
            tags = ["O"] * len(words)
            for s, e, lab in label:
                surface = text[s:e]
                for idx, w in enumerate(words):
                    if surface in w:
                        tags[idx] = lab
                        break
            for w, t in zip(words, tags):
                fh.write(f"{w}\t{t}\n")
            fh.write("\n")
    return _strip_ext(path)


def save_annotations(df: DataFrame, path: str, format: str = "jsonl") -> str:
    """Format dispatch (models.rs:39-47 / pyquickner.rs:207-225)."""
    fn = {"jsonl": to_jsonl, "csv": to_csv, "spacy": to_spacy,
          "brat": to_brat, "conll": to_conll}[format]
    return fn(df, path)


def to_numpy(df: DataFrame):
    """K6 — object ndarray of (id, text, [(s,e,label),...]) rows
    (src/pyquickner.rs:398-448); Arrow-accelerated collect."""
    import numpy as np

    rows = [(doc_id, text, label) for doc_id, text, label in _iter_docs(df)]
    return np.array(rows, dtype=object)


def spacy_generator(df: DataFrame, chunks: int | None = None):
    """K7 — iterator of chunks of [(text, {"entitiy": [...]}), ...].

    ``chunks`` is the CHUNK SIZE despite the name (quickner.rs:694-715;
    asserted by tests/test.py:143-155: 5 docs, chunks=2 -> 3 chunks).
    The key is misspelled "entitiy" for parity (src/pyquickner.rs:373).
    """
    docs = [(text, {"entitiy": [(int(s), int(e), l) for s, e, l in label]})
            for _, text, label in _iter_docs(df)]
    size = chunks if chunks else len(docs)
    if size <= 0:
        size = max(len(docs), 1)
    for i in range(0, len(docs), size):
        yield docs[i:i + size]


# N-Triples IRI-unsafe characters (W3C N-Triples grammar: IRIREF excludes
# control chars, space and <>"{}|^`\). '%' is escaped FIRST so encoded
# ids round-trip even if a raw id already contains a percent sign.
_NT_UNSAFE = [("%", "%25"), (" ", "%20"), ("<", "%3C"), (">", "%3E"),
              ('"', "%22"), ("{", "%7B"), ("}", "%7D"), ("|", "%7C"),
              ("^", "%5E"), ("`", "%60"), ("\\", "%5C")]


def _nt_iri(col):
    for raw, enc in _NT_UNSAFE:
        col = F.replace(col, F.lit(raw), F.lit(enc))
    return col


def ntriples_lines(edges: DataFrame, base_iri: str = "http://example.org/kg/",
                   subj_col: str = "src", pred_col: str = "pred",
                   obj_col: str = "dst",
                   keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """KG interchange sink: one W3C N-Triples line per edge/triple —
    ``<{base}e/{subj}> <{base}p/{pred}> <{base}e/{obj}> .`` — ready for
    ``.write.text`` into any RDF toolchain. IRI-unsafe characters in the
    canonical ids / predicates (spaces in min-alias canonicals, etc.)
    are percent-encoded JVM-side; the whole line is a codegen-able
    concat/replace chain, no Python. Works on the pipeline's ``edges``
    table (src, dst, pred) or directly on ``triples``
    (``subj_col="subj", obj_col="obj"``)."""
    ent = lambda c: F.concat(F.lit(f"<{base_iri}e/"),
                             _nt_iri(F.col(c)), F.lit(">"))
    prd = F.concat(F.lit(f"<{base_iri}p/"),
                   _nt_iri(F.col(pred_col)), F.lit(">"))
    line = F.concat_ws(" ", ent(subj_col), prd, ent(obj_col), F.lit("."))
    return edges.select(*keep_cols, line.alias("value"))


def _warc_record_id(url: Column, ts: Column) -> Column:
    """Deterministic ``WARC-Record-ID`` for an exported record:
    ``urn:uuid:`` + a name-based UUID derived from md5(url, date) with
    the version/variant nibbles pinned (RFC 4122 v5-shaped). ISO 28500
    makes the header mandatory on EVERY record; a content-derived id is
    deterministic across runs/engines (re-exports are idempotent,
    oracles replayable) where a random v4 would not be. md5 is in both
    engines' built-ins — same portability choice as the cdxj digest
    twin."""
    h = F.md5(F.concat(F.lit("warc-record-id:"), url, F.lit(":"), ts))
    return F.concat(
        F.lit("urn:uuid:"), F.substring(h, 1, 8),
        F.lit("-"), F.substring(h, 9, 4),
        F.lit("-5"), F.substring(h, 14, 3),
        F.lit("-a"), F.substring(h, 18, 3),
        F.lit("-"), F.substring(h, 21, 12))


def _warc_header_parts(pages: DataFrame, warc_type: str, url_col: str,
                       ts_col: str | None) -> list[Column]:
    """Shared WARC header framing for :func:`wet_lines`/:func:`wat_lines`:
    version line, Type, deterministic Record-ID, Target-URI, and a
    per-ROW conditional WARC-Date. The conditional matters: a NULL
    timestamp must not null the whole record concat (``.write.text``
    rejects NULL lines and every header after the date would vanish), so
    a NULL-ts row exports without the Date header — the documented
    ``ts_col=None`` conformance gap applied row-wise. Record ids for
    non-null rows are unchanged by the NULL guard (coalesce to '' only
    fires on NULL), so exports stay byte-identical and oracle-exact."""
    ts_str: Column = F.lit(None).cast("string")
    if ts_col is not None:
        ts_str = F.col(ts_col)
        if isinstance(pages.schema[ts_col].dataType, T.TimestampType):
            ts_str = F.date_format(ts_str, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    parts = [F.lit(f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
                   "WARC-Record-ID: <"),
             _warc_record_id(F.col(url_col),
                             F.coalesce(ts_str, F.lit(""))),
             F.lit(">\r\nWARC-Target-URI: "), F.col(url_col)]
    if ts_col is not None:
        parts.append(F.when(ts_str.isNotNull(),
                            F.concat(F.lit("\r\nWARC-Date: "), ts_str))
                      .otherwise(F.lit("")))
    return parts


def wet_lines(pages: DataFrame, url_col: str = "url",
              text_col: str = "text",
              ts_col: str | None = "warc_ts") -> DataFrame:
    """Common-Crawl WET sink: one WARC ``conversion`` record per page as
    a single multi-line string — the extracted-text companion format to
    ``sources.warc.read_warc`` (pages in as WARC, text out as WET).
    ``.write.text`` + gzip lands ``.warc.wet``-shaped output ready for
    any CC-consuming pipeline.

    Record layout (WARC/1.0, ISO 28500 §4): version line, Type/Record-
    ID/Target-URI/Date/Content-Type headers, Content-Length in BYTES of
    the UTF-8 text (``octet_length``, not character count), blank line,
    payload, trailing blank lines. All one JVM concat — no Python.
    ``WARC-Record-ID`` is the deterministic content-derived urn:uuid of
    :func:`_warc_record_id`. A timestamp ``ts_col`` formats as ISO-8601
    in the SESSION timezone (set ``spark.sql.session.timeZone=UTC`` for
    spec-conformant output); a string column passes through verbatim.

    Conformance gaps, documented: ``ts_col=None`` omits WARC-Date, which
    ISO 28500 also makes mandatory — strict readers reject such records,
    so pass a real capture timestamp for conforming output (fabricating
    one engine-side would be worse than the gap). WARC-Block-Digest is
    optional and not emitted. Pages whose text is NULL (dropped by the
    extractor) are skipped; a NULL timestamp drops only that row's
    WARC-Date header (see :func:`_warc_header_parts`), never the
    record."""
    txt = F.col(text_col)
    parts = _warc_header_parts(pages, "conversion", url_col, ts_col)
    parts += [F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
              F.octet_length(txt).cast("string"),
              F.lit("\r\n\r\n"), txt, F.lit("\r\n\r\n")]
    return (pages.where(txt.isNotNull())
            .select(F.concat(*parts).alias("value")))


def cdxj_lines(pages: DataFrame, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "html",
               mime: str = "text/html", status: str | None = "200",
               digest: str = "sha1", sort: bool = False,
               partitions: int | None = None) -> DataFrame:
    """Common-Crawl CDXJ URL-index sink: one ``SURT key, 14-digit
    timestamp, JSON block`` line per capture — the index format the CC
    index server and pywb range-scan (completes the artifact family:
    WARC in via ``read_warc``, WET out via ``wet_lines``, CDXJ out
    here). One JVM concat per page; no Python.

    * key: :func:`kg.weblinks.surt_key` of ``url_col``.
    * timestamp: a TIMESTAMP column formats as ``yyyyMMddHHmmss`` in the
      session timezone; a STRING column keeps its first 14 digits
      (ISO-8601 strings collapse to the same 14 digits — no parsing).
    * JSON block: ``url`` (RFC 8259-escaped), ``mime``, ``status``
      (optional, string-typed like CC's), ``digest`` (hex of the
      payload bytes; ``digest="sha1"`` is the CC-conventional default,
      ``"md5"`` is the DuckDB-portable oracle twin; note CC publishes
      base32 sha1 — hex is the documented variant), ``length`` (payload
      BYTES, string-typed like CC's).
    * ``sort=True`` range-repartitions on the key and sorts within
      partitions: the shard set is GLOBALLY ordered (shard i's keys all
      precede shard i+1's) without a single-reducer sort — the layout a
      binary-searchable index needs. Default off: the oracle comparison
      is order-insensitive and plain exports don't pay the extra
      exchange.
    """
    ts: Column = F.col(ts_col)
    if isinstance(pages.schema[ts_col].dataType, T.TimestampType):
        ts = F.date_format(ts, "yyyyMMddHHmmss")
    else:
        ts = F.substring(F.regexp_replace(ts, "[^0-9]", ""), 1, 14)
    payload = F.col(payload_col)
    if digest == "sha1":
        dig = F.sha1(payload)
    elif digest == "md5":
        dig = F.md5(payload)
    else:
        raise ValueError(f"unknown digest {digest!r}")
    from quickner_spark.kg.weblinks import surt_key

    parts = [surt_key(F.col(url_col)), F.lit(" "), ts, F.lit(' {"url":'),
             _json_str(F.col(url_col)),
             F.lit(f',"mime":"{mime}"')]
    if status is not None:
        parts.append(F.lit(f',"status":"{status}"'))
    parts += [F.lit(',"digest":"'), dig,
              F.lit('","length":"'),
              F.octet_length(payload).cast("string"), F.lit('"}')]
    out = pages.select(F.concat(*parts).alias("value"))
    if sort:
        n = partitions or out.sparkSession.conf.get(
            "spark.sql.shuffle.partitions")
        out = (out.repartitionByRange(int(n), "value")
               .sortWithinPartitions("value"))
    return out


def wat_lines(pages: DataFrame, url_col: str = "url",
              ts_col: str | None = "warc_ts",
              html_col: str = "html") -> DataFrame:
    """Common-Crawl WAT sink (simplified): one WARC ``metadata`` record
    per page whose JSON payload carries the computed page metadata —
    completing the CC artifact family this engine speaks (WARC in via
    ``read_warc``; WET/``wet_lines``, CDXJ/``cdxj_lines`` and WAT out).

    Payload layout (a documented flat simplification of CC's nested
    Envelope/Payload-Metadata WAT schema — same signals, one level):
    ``{"url":…,"title":…,"robots":…,"canonical":…,"links":[href,…]}``
    with title/robots/canonical per :mod:`quickner_spark.kg.pagemeta`
    (first plain-text title, lowercased robots meta, rel=canonical) and
    ``links`` the in-document-order anchor hrefs of
    :func:`quickner_spark.kg.weblinks.extract_links` — computed here as
    an IN-ROW ``regexp_extract_all`` array, so the record needs no join
    or shuffle against the exploded links table. Every string is RFC
    8259-escaped JVM-side; record framing matches ``wet_lines``
    (Content-Type: application/json, Content-Length in UTF-8 bytes,
    deterministic ``WARC-Record-ID`` via :func:`_warc_record_id`, and
    the same documented WARC-Date conformance gap when ``ts_col`` is
    None).
    One decoded scan pass + one concat per page; no Python."""
    from quickner_spark.kg.pagemeta import (canonical_of, robots_of,
                                            title_of)
    from quickner_spark.kg.weblinks import HREF_PATTERN, decoded_html

    html = decoded_html(pages, html_col)
    links = F.regexp_extract_all(html, F.lit(HREF_PATTERN), F.lit(1))
    payload = F.concat(
        F.lit('{"url":'), _json_str(F.col(url_col)),
        F.lit(',"title":'), _json_str(title_of(html)),
        F.lit(',"robots":'), _json_str(robots_of(html)),
        F.lit(',"canonical":'), _json_str(canonical_of(html)),
        F.lit(',"links":['),
        F.concat_ws(",", F.transform(links, _json_str)), F.lit("]}"))
    parts = _warc_header_parts(pages, "metadata", url_col, ts_col)
    parts += [F.lit("\r\nContent-Type: application/json\r\n"
                    "Content-Length: "),
              F.octet_length(payload).cast("string"),
              F.lit("\r\n\r\n"), payload, F.lit("\r\n\r\n")]
    return pages.select(F.concat(*parts).alias("value"))
