"""WARC (Web ARChive, ISO 28500) source — the Common-Crawl-native ingest
path for the KG pipeline's pages table.

:func:`read_warc` returns exactly the pages schema the pipeline consumes
(``url string, warc_ts timestamp, html binary, text string, lang string``
— BASELINE input_hint; kg/corpus.py:4), so
``build_kg_pipeline(..., pages_format="warc")`` runs the full
extract→annotate→…→graph build straight off crawl archives.

Scale design (the part that matters at 100 TB):

* **Granularity = one WARC file per task.** Common-Crawl WARCs are
  per-record gzip members concatenated into ~1 GiB archives — the stream
  is not arbitrarily splittable without scanning, so whole-file tasks are
  the standard Spark pattern for this format. ``spark.read.format
  ("binaryFile")`` provides the distributed file scan (file listing,
  pruning and ``pathGlobFilter`` pushdown stay on the JVM side); a crawl
  segment has thousands of archives, so parallelism comes from the file
  count, not intra-file splits.
* **Parsing is one Arrow-batched ``mapInPandas`` kernel** — bytes are
  decompressed, record-framed and HTTP-unwrapped inside a single Python
  pass per file; no per-row Python UDF, no driver materialization.
* **Malformed records are skipped, not fatal** (``strict=False``
  default). Real crawl archives contain truncated members and garbage
  frames; a 100 TB job must survive them. The kernel resynchronizes on
  the next ``WARC/`` magic after a bad record. ``strict=True`` raises
  with file + byte-offset context for debugging a specific archive.

The record framing follows the public ISO 28500 / WARC 1.0 layout
(version line, CRLF header block, Content-Length payload, CRLF CRLF
separator); reference parity: quickner itself has no WARC reader — this
is part of the web-scale generalization the north star prescribes.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "stream_warc", "warc_record_bytes",
           "write_warc_file", "parse_warc_stream", "latest_by_url"]

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes, strict: bool) -> bytes:
    """Decompress a stream of CONCATENATED gzip members (the CC per-record
    layout). zlib.decompressobj(wbits=31) per member; trailing garbage
    after the last complete member is tolerated when not strict."""
    out = []
    pos, n = 0, len(data)
    while pos < n:
        if data[pos:pos + 2] != _GZIP_MAGIC:
            if strict:
                raise ValueError(f"not a gzip member at offset {pos}")
            break
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(data[pos:]))
        except zlib.error as e:
            if strict:
                raise ValueError(f"corrupt gzip member at {pos}: {e}") from e
            break
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # no forward progress — bail rather than spin
            if strict:
                raise ValueError(f"zero-length gzip member at {pos}")
            break
        pos += consumed
    return b"".join(out)


def _parse_warc_date(s: str):
    """WARC-Date (ISO 8601, UTC 'Z' suffix) -> tz-naive UTC datetime
    (Spark TimestampType convention); None on garbage."""
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def parse_warc_stream(data: bytes, *, strict: bool = False,
                      record_types: tuple[str, ...] = ("response",),
                      source: str = "<bytes>") -> Iterator[dict]:
    """Frame WARC records out of an (already decompressed) byte stream.

    Yields dicts ``{url, warc_ts, html}`` for records whose WARC-Type is
    in ``record_types``. ``response`` records have their HTTP envelope
    stripped (payload after the first CRLF CRLF); other types (e.g.
    ``conversion`` for WET text, ``resource``) yield the raw payload.

    Lenient mode skips any record it cannot frame and resynchronizes at
    the next ``WARC/`` magic — the invariant is "never raise, never
    loop": every iteration either yields or strictly advances ``pos``.
    """
    pos, n = 0, len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            if strict:
                raise ValueError(f"{source}: unterminated header at {start}")
            return
        headers: dict[str, str] = {}
        ok = True
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                ok = False
                break
            try:
                headers[k.strip().decode("ascii").lower()] = \
                    v.strip().decode("utf-8", "replace")
            except UnicodeDecodeError:
                ok = False
                break
        clen = headers.get("content-length", "")
        if not (ok and clen.isdigit()):
            if strict:
                raise ValueError(f"{source}: bad header block at {start}")
            pos = start + 5  # resync past this magic
            continue
        body_start = hdr_end + 4
        body_end = body_start + int(clen)
        if body_end > n:
            if strict:
                raise ValueError(f"{source}: truncated payload at {start}")
            return
        payload = data[body_start:body_end]
        pos = body_end  # next find() skips the inter-record CRLFs
        rtype = headers.get("warc-type", "")
        if rtype not in record_types:
            continue
        if rtype == "response":
            # strip the HTTP response envelope; a payload without one
            # (non-HTTP capture) passes through whole
            sep_at = payload.find(b"\r\n\r\n")
            if payload[:5] in (b"HTTP/",) and sep_at >= 0:
                payload = payload[sep_at + 4:]
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
            "html": payload,
        }


def _framing_kernel(strict: bool, record_types: tuple[str, ...]):
    """Arrow-batched (path, content) -> pages framing kernel, shared by
    the batch (:func:`read_warc`) and streaming (:func:`stream_warc`)
    scans — one archive's bytes are framed entirely within its task."""
    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for src, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:2] == _GZIP_MAGIC:
                    data = _gunzip_members(data, strict)
                for rec in parse_warc_stream(data, strict=strict,
                                             record_types=record_types,
                                             source=src):
                    rows.append(rec)
            out = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
            out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            out["text"] = pd.Series([None] * len(out), dtype="object")
            out["lang"] = pd.Series([None] * len(out), dtype="object")
            yield out

    return parse


def read_warc(spark: SparkSession, path: str, *, strict: bool = False,
              record_types: tuple[str, ...] = ("response",),
              path_glob: str | None = None) -> DataFrame:
    """Distributed WARC scan -> pages DataFrame
    ``(url, warc_ts, html, text=NULL, lang=NULL)``.

    ``path_glob`` (e.g. ``"*.warc.gz"``) is pushed to the binaryFile
    source as ``pathGlobFilter`` so non-archive files in the directory
    are pruned at listing time, before any bytes move.
    """
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_framing_kernel(strict, record_types),
                             PAGES_SCHEMA)


# the binaryFile source's fixed schema; streaming file sources require it
# declared up front (no inference pass over an unbounded directory)
_BINARY_FILE_SCHEMA = ("path string, modificationTime timestamp, "
                       "length long, content binary")


def stream_warc(spark: SparkSession, path: str, *, strict: bool = False,
                record_types: tuple[str, ...] = ("response",),
                path_glob: str = "*.warc*",
                max_files_per_trigger: int | None = None) -> DataFrame:
    """STREAMING WARC scan: a directory where crawl archives keep landing
    (the Common-Crawl segment-drop model) -> an unbounded pages DataFrame
    with the same schema and framing kernel as :func:`read_warc`. Feed it
    to ``streaming.kg_stream.incremental_kg`` for a continuously-updated
    KG: each micro-batch is a set of whole archives (archive-per-task,
    same as the batch scan), the file-source checkpoint makes batch
    composition restart-stable, and ``max_files_per_trigger`` bounds
    per-batch work (backpressure for bursty segment drops)."""
    reader = (spark.readStream.format("binaryFile")
              .schema(_BINARY_FILE_SCHEMA)
              .option("pathGlobFilter", path_glob))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_framing_kernel(strict, record_types),
                             PAGES_SCHEMA)


def latest_by_url(pages: DataFrame) -> DataFrame:
    """Snapshot dedup for crawl ingest: Common-Crawl revisits URLs across
    segments and snapshots, and the KG pipeline keys documents on url —
    keep only the LATEST capture per url (warc_ts, ties broken by the
    remaining row so the result is deterministic). Map-side arg-max
    aggregate, ~|urls| rows shuffled — see
    :func:`operators.events.latest_by_key`."""
    from quickner_spark.operators.events import latest_by_key
    return latest_by_key(pages, "url", "warc_ts")


# ---------------------------------------------------------------------------
# writer helpers — used by tests/fixtures to synthesize archives, and as a
# sink for round-tripping the pages table back out to crawl format


def warc_record_bytes(url: str, date: str, payload: bytes,
                      rec_type: str = "response",
                      http_status: str | None = "200 OK") -> bytes:
    """One WARC 1.0 record (ISO 28500 framing). ``response`` records get
    a minimal HTTP envelope unless ``http_status=None``."""
    body = payload
    if rec_type == "response" and http_status is not None:
        body = (f"HTTP/1.1 {http_status}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
                ).encode("ascii") + payload
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {rec_type}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {date}\r\n"
           f"Content-Length: {len(body)}\r\n"
           f"\r\n").encode("ascii")
    return hdr + body + b"\r\n\r\n"


def write_warc_file(path: str, records: list[bytes],
                    compress: bool = True) -> None:
    """Write records to one archive file. ``compress=True`` gzips EACH
    record as its own member (the Common-Crawl layout — members stay
    independently decompressible for range requests)."""
    with open(path, "wb") as f:
        for rec in records:
            if compress:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(rec)
                f.write(buf.getvalue())
            else:
                f.write(rec)
