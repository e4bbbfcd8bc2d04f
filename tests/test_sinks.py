"""Format-parity tests for the sinks (K1-K7 quirks per SURVEY.md §2.2)."""

from __future__ import annotations

import json

import pytest

from quickner_spark.api import Document, Entity, Quickner
from quickner_spark.sinks import formats as sk
from quickner_spark.sources import from_jsonl, from_spacy

from tests.test_matcher import ENTITIES, TEXTS


@pytest.fixture(scope="module")
def processed(spark):
    q = Quickner(documents=[Document(t) for t in TEXTS],
                 entities=[Entity(*e) for e in ENTITIES], spark=spark)
    q.process()
    return q


def test_jsonl_roundtrip(processed, spark, tmp_path):
    path = str(tmp_path / "out.whatever")
    base = processed.save_annotations(path, "jsonl")
    assert base == str(tmp_path / "out")
    lines = open(base + ".jsonl").read().splitlines()
    assert len(lines) == 5
    rec = json.loads(lines[0])
    assert set(rec) == {"id", "text", "label"}
    assert rec["text"] == TEXTS[0].lower()
    assert [tuple(l) for l in rec["label"]] == [(0, 4, "PL"), (16, 23, "ORG")]
    # compact serde-style encoding: no spaces after separators
    assert ": " not in lines[0].split('"text"')[0]
    # S4 reload + gazetteer inference (quickner.rs:585-635)
    docs_df, ents_df = from_jsonl(spark, base + ".jsonl")
    assert docs_df.count() == 5
    inferred = {(r["name"], r["label"]) for r in ents_df.collect()}
    assert ("rust", "PL") in inferred
    assert ("sun microsystems", "ORG") in inferred


def test_csv_quirk_writes_json_lines(processed, tmp_path):
    path = str(tmp_path / "out.csv")
    processed.save_annotations(path, "csv")
    first = open(str(tmp_path / "out.csv")).readline()
    json.loads(first)  # models.rs:92-102: JSON payload despite .csv


def test_spacy_file_and_reload(processed, spark, tmp_path):
    path = str(tmp_path / "sp.json")
    processed.save_annotations(path, "spacy")
    data = json.loads(open(str(tmp_path / "sp.json")).read())
    assert len(data) == 5
    text, ent = data[0]
    assert text == TEXTS[0].lower()
    assert ent == {"entity": [[0, 4, "PL"], [16, 23, "ORG"]]}  # correct spelling here
    docs_df, ents_df = from_spacy(spark, str(tmp_path / "sp.json"))
    assert docs_df.count() == 5
    assert ents_df.count() >= 9


def test_brat_output(processed, tmp_path):
    base = processed.save_annotations(str(tmp_path / "b.out"), "brat")
    txt = open(base + ".txt").read().splitlines()
    ann = open(base + ".ann").read().splitlines()
    assert len(txt) == 5
    assert ann[0] == "T0\tPL\t0\t4\trust"
    # counter resets per document (models.rs:113)
    assert sum(1 for l in ann if l.startswith("T0\t")) == 5


def test_conll_contains_heuristic(processed, tmp_path):
    base = processed.save_annotations(str(tmp_path / "c.x"), "conll")
    blocks = open(base + ".txt").read().split("\n\n")
    first = [l.split("\t") for l in blocks[0].splitlines()]
    # "rust is made by mozilla": first token containing "rust" gets PL
    assert first[0] == ["rust", "PL"]
    assert first[1] == ["is", "O"]
    assert first[4] == ["mozilla", "ORG"]
    # multi-token entity collapses to ONE token (quirk, models.rs:136-146):
    # "sun microsystems" labels token "sun"? No: first token CONTAINING the
    # full surface — multi-token surfaces match no single token, so all "O".
    third = [l.split("\t") for l in blocks[2].splitlines()]
    assert ["sun", "O"] in third and ["microsystems,", "O"] not in third


def test_conll_lines_matches_driver_writer(processed, tmp_path):
    """The distributed CoNLL writer (conll_lines -> .write.text) must be
    byte-identical to the driver single-file writer on the golden fixture
    (reference quirks from models.rs:123-165 intact)."""
    import glob

    base = sk.to_conll(processed._annotated_df(), str(tmp_path / "drv.x"))
    expected = open(base + ".txt").read()
    out_dir = str(tmp_path / "dist_conll")
    sk.conll_lines(processed._annotated_df()).coalesce(1) \
        .write.mode("overwrite").text(out_dir)
    part, = glob.glob(out_dir + "/part-*")
    assert open(part).read() == expected


def test_brat_lines_match_driver_writer(processed, tmp_path):
    """Distributed brat writers vs the driver files: same .txt content and
    the same .ann rows (per-document T-counter reset included)."""
    import glob

    base = sk.to_brat(processed._annotated_df(), str(tmp_path / "drvb.x"))
    exp_txt = open(base + ".txt").read()
    exp_ann = open(base + ".ann").read()
    txt, ann = sk.brat_lines(processed._annotated_df())
    tdir, adir = str(tmp_path / "bt"), str(tmp_path / "ba")
    txt.coalesce(1).write.mode("overwrite").text(tdir)
    ann.coalesce(1).write.mode("overwrite").text(adir)
    tp, = glob.glob(tdir + "/part-*")
    ap, = glob.glob(adir + "/part-*")
    assert open(tp).read() == exp_txt
    assert open(ap).read() == exp_ann


def test_conll_lines_empty_and_unlabeled_docs(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("label", T.ArrayType(T.StructType([
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("label", T.StringType())]))),
    ])
    df = spark.createDataFrame(
        [("a", "plain words here", None), ("b", "", [])], schema)
    vals = [r["value"] for r in sk.conll_lines(df).collect()]
    assert vals[0] == "plain\tO\nwords\tO\nhere\tO\n"
    assert vals[1] == ""
    txt, ann = sk.brat_lines(df)
    assert txt.count() == 2 and ann.count() == 0


def test_numpy_export(processed):
    arr = processed.numpy()
    assert arr.shape[0] == 5
    assert arr[0][1] == TEXTS[0].lower()
    assert list(arr[0][2][0]) == [0, 4, "PL"]


def test_conll_lines_span_dense_doc_bounded(spark):
    """Planted worst case: one document whose span list is as long as its
    word list (the O(words x spans) quadratic regime). max_spans bounds
    the fold to O(words x max_spans); the capped output must equal
    tagging only the first max_spans spans, and complete quickly."""
    import time

    from quickner_spark.sinks.formats import conll_lines

    n = 1500
    text = " ".join(f"w{i:04d}" for i in range(n))
    spans = []
    pos = 0
    for i in range(n):
        spans.append((pos, pos + 5, f"L{i % 7}"))
        pos += 6
    df = spark.createDataFrame(
        [("d0", text, spans)],
        "doc_id string, text string, "
        "label array<struct<start:int, end:int, label:string>>")
    t0 = time.monotonic()
    out = conll_lines(df, keep_cols=("doc_id",), max_spans=100).collect()
    capped_s = time.monotonic() - t0
    assert capped_s < 30, f"capped fold took {capped_s:.1f}s"
    lines = out[0]["value"].rstrip("\n").split("\n")
    assert len(lines) == n
    # first 100 spans tagged, the degenerate tail dropped
    assert lines[0] == "w0000\tL0"
    assert lines[99] == "w0099\tL1"
    assert lines[100] == "w0100\tO"
    assert all(l.endswith("\tO") for l in lines[100:])


def _labeled_df(spark, rows):
    """(id, text, [(s,e,label)...]) -> the sink input shape."""
    data = [(i, t, [(s, e, l) for s, e, l in spans]) for i, t, spans in rows]
    return spark.createDataFrame(
        data, "id string, text string, "
              "label array<struct<start: int, end: int, label: string>>")


def test_jsonl_lines_byte_identical_to_driver_writer(processed, spark,
                                                     tmp_path):
    """The distributed K1 writer must reproduce to_jsonl's serde-compact
    bytes exactly — unquoted integer offsets included."""
    base = processed.save_annotations(str(tmp_path / "p.x"), "jsonl")
    expected = open(base + ".jsonl").read().splitlines()
    df = processed._annotated_df()
    got = [r["value"] for r in sk.jsonl_lines(df).collect()]
    assert sorted(got) == sorted(expected)
    for line in got:
        rec = json.loads(line)
        assert all(isinstance(s, int) and isinstance(e, int)
                   for s, e, _ in rec["label"])


def test_spacy_lines_byte_identical_to_driver_writer(processed, spark,
                                                     tmp_path):
    """Joining spacy_lines rows with ',' inside '[...]' must reproduce
    to_spacy's single JSON array byte-for-byte."""
    processed.save_annotations(str(tmp_path / "sp.json"), "spacy")
    expected = open(str(tmp_path / "sp.json")).read()
    df = processed._annotated_df()
    # to_spacy iterates toLocalIterator order; collect preserves it here
    got = "[" + ",".join(r["value"]
                         for r in sk.spacy_lines(df).collect()) + "]"
    assert json.loads(got) == json.loads(expected)
    assert sorted(got[1:-1].split('],["')) == \
        sorted(expected[1:-1].split('],["'))


def test_json_line_writers_escape_hostile_text(spark):
    """Text with quotes, backslashes, newlines and unicode must produce
    VALID JSON identical to json.dumps(..., ensure_ascii=False) — the
    driver writers' encoding."""
    rows = [("d0", 'he said "hi" \\ bye\nnew\tline', [(0, 2, 'L"B')]),
            ("d1", "plain ünïcode text", [])]
    df = _labeled_df(spark, rows)
    for r in sk.jsonl_lines(df).collect():
        rec = json.loads(r["value"])  # must parse
        src = next(x for x in rows if x[0] == rec["id"])
        assert rec["text"] == src[1]
        expected = json.dumps(
            {"id": src[0], "text": src[1],
             "label": [[s, e, l] for s, e, l in src[2]]},
            separators=(",", ":"), ensure_ascii=False)
        assert r["value"] == expected
    got = {json.loads(r["value"])[0] for r in sk.spacy_lines(df).collect()}
    assert got == {t for _, t, _ in rows}


def test_ntriples_lines_byte_exact_and_escaped(spark):
    from quickner_spark.sinks.formats import ntriples_lines

    e = spark.createDataFrame(
        [("acme analytics", "acquired by", "globex"),
         ("a%b<c>", 'p"q', "x\\y")],
        "src string, pred string, dst string")
    got = sorted(r["value"] for r in ntriples_lines(e).collect())
    assert got == sorted([
        "<http://example.org/kg/e/acme%20analytics> "
        "<http://example.org/kg/p/acquired%20by> "
        "<http://example.org/kg/e/globex> .",
        "<http://example.org/kg/e/a%25b%3Cc%3E> "
        "<http://example.org/kg/p/p%22q> "
        "<http://example.org/kg/e/x%5Cy> .",
    ])


def test_ntriples_lines_on_triples_table(spark):
    from quickner_spark.sinks.formats import ntriples_lines

    t = spark.createDataFrame([("s", "p", "o")],
                              "subj string, pred string, obj string")
    (row,) = ntriples_lines(t, base_iri="urn:kg/", subj_col="subj",
                            obj_col="obj").collect()
    assert row["value"] == "<urn:kg/e/s> <urn:kg/p/p> <urn:kg/e/o> ."


def _rid(url: str, ts: str) -> str:
    """Reference restatement of formats._warc_record_id."""
    import hashlib

    h = hashlib.md5(f"warc-record-id:{url}:{ts}".encode()).hexdigest()
    return (f"urn:uuid:{h[0:8]}-{h[8:12]}-5{h[13:16]}"
            f"-a{h[17:20]}-{h[20:32]}")


def test_wet_lines_byte_exact(spark):
    from pyspark.sql import Row

    from quickner_spark.sinks.formats import wet_lines

    df = spark.createDataFrame([
        Row(url="https://h.org/p", warc_ts="2025-03-01T08:00:00Z",
            text="héllo"),                    # 6 BYTES, 5 chars
        Row(url="https://h.org/skip", warc_ts="2025-03-01T08:00:00Z",
            text=None),                       # extractor-dropped
    ])
    got = [r["value"] for r in wet_lines(df).collect()]
    rid = _rid("https://h.org/p", "2025-03-01T08:00:00Z")
    assert got == [
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <{rid}>\r\n"
        "WARC-Target-URI: https://h.org/p\r\n"
        "WARC-Date: 2025-03-01T08:00:00Z\r\n"
        "Content-Type: text/plain\r\n"
        "Content-Length: 6\r\n"
        "\r\n"
        "héllo\r\n\r\n"
    ]
    # the id is deterministic: same page, same id, run over run
    got2 = [r["value"] for r in wet_lines(df).collect()]
    assert got2 == got
    # ts_col=None omits WARC-Date (documented conformance gap) but the
    # mandatory Record-ID is still present
    (row,) = wet_lines(df.limit(1), ts_col=None).collect()
    assert "WARC-Date" not in row["value"]
    assert f"WARC-Record-ID: <{_rid('https://h.org/p', '')}>" \
        in row["value"]


def test_wet_wat_null_timestamp_row_still_exports(spark):
    """A NULL warc_ts must drop only that ROW's WARC-Date header, not
    null the whole record concat (a NULL line breaks .write.text and
    silently loses the page from the export). Non-null rows keep their
    exact bytes — same Record-ID as the all-non-null test."""
    from pyspark.sql import Row

    from quickner_spark.sinks.formats import wat_lines, wet_lines

    df = spark.createDataFrame([
        Row(url="https://h.org/p", warc_ts="2025-03-01T08:00:00Z",
            text="héllo", html=bytearray(b"<html></html>")),
        Row(url="https://h.org/null-ts", warc_ts=None,
            text="x", html=bytearray(b"<html></html>")),
    ])
    for fn in (wet_lines, wat_lines):
        got = {r["value"] for r in fn(df).collect()}
        assert len(got) == 2 and None not in got
        (null_row,) = [v for v in got if "/null-ts" in v]
        assert "WARC-Date" not in null_row
        # NULL ts hashes like ts_col=None: the empty-string coalesce
        assert f"WARC-Record-ID: <{_rid('https://h.org/null-ts', '')}>" \
            in null_row
        (full_row,) = [v for v in got if "/p\r" in v]
        assert "WARC-Date: 2025-03-01T08:00:00Z\r\n" in full_row


def test_wet_lines_timestamp_formatting(spark):
    from pyspark.sql import Row, functions as F

    from quickner_spark.sinks.formats import wet_lines

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.createDataFrame(
            [Row(url="u", text="x")]).select(
            "url", "text",
            F.to_timestamp(F.lit("2025-03-01 08:15:30")).alias("warc_ts"))
        (row,) = wet_lines(df).collect()
        assert "WARC-Date: 2025-03-01T08:15:30Z\r\n" in row["value"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_wet_roundtrip_through_read_warc(spark, tmp_path):
    """wet_lines output written as text parses back through read_warc's
    conversion-record path: url/ts/payload all survive."""
    import gzip

    from pyspark.sql import Row

    from quickner_spark.sinks.formats import wet_lines
    from quickner_spark.sources.warc import read_warc

    rows = [Row(url=f"https://h.org/{i}",
                warc_ts="2025-03-01T08:00:0%dZ" % i,
                text=f"body {i} é") for i in range(3)]
    lines = [r["value"] for r in
             wet_lines(spark.createDataFrame(rows)).collect()]
    wet = tmp_path / "seg.warc.wet.gz"
    wet.write_bytes(gzip.compress("\n".join(lines).encode()))
    back = (read_warc(spark, str(tmp_path), path_glob="*.warc.wet.gz",
                      record_types=("conversion",))
            .orderBy("url").collect())
    assert [(r["url"], bytes(r["html"]).decode()) for r in back] == \
        [(r.url, r.text) for r in rows]
    assert back[0]["warc_ts"].isoformat().startswith("2025-03-01T08:00:00")


def test_cdxj_lines_byte_exact(spark):
    import hashlib

    from pyspark.sql import Row

    from quickner_spark.sinks.formats import cdxj_lines

    html = b"<html>x</html>"
    df = spark.createDataFrame([Row(
        url='https://www.H.org/A?b=2&a=1',
        warc_ts="2025-03-01T08:00:05Z", html=bytearray(html))])
    (row,) = cdxj_lines(df).collect()
    assert row["value"] == (
        'org,h)/a?a=1&b=2 20250301080005 '
        '{"url":"https://www.H.org/A?b=2&a=1","mime":"text/html",'
        f'"status":"200","digest":"{hashlib.sha1(html).hexdigest()}",'
        f'"length":"{len(html)}"}}')
    # md5 twin + status omission
    (row,) = cdxj_lines(df, digest="md5", status=None).collect()
    assert hashlib.md5(html).hexdigest() in row["value"]
    assert '"status"' not in row["value"]


def test_cdxj_lines_timestamp_column_and_sort(spark):
    from pyspark.sql import Row, functions as F

    from quickner_spark.sinks.formats import cdxj_lines

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        rows = [Row(url=f"https://h{i % 7}.org/p/{i}", html=bytearray(b"x"))
                for i in range(40)]
        df = spark.createDataFrame(rows).select(
            "*", F.to_timestamp(F.lit("2025-03-01 08:15:30")).alias("warc_ts"))
        (row,) = cdxj_lines(df.limit(1)).collect()
        assert " 20250301081530 " in row["value"]
        # sort=True: shard set globally ordered — concatenating the
        # partitions in order yields the fully sorted line list
        out = cdxj_lines(df, sort=True, partitions=4)
        parts = out.rdd.glom().collect()
        flat = [r["value"] for p in parts for r in p]
        assert flat == sorted(flat)
        assert sum(1 for p in parts if p) >= 2  # actually range-partitioned
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_wat_lines_byte_exact_and_json_parses(spark):
    import json as _json

    from pyspark.sql import Row

    from quickner_spark.sinks.formats import wat_lines

    html = ('<html><head><TITLE>A "B"é</TITLE>'
            '<meta name="robots" content="NOINDEX, nofollow">'
            '<link rel="canonical" href="https://h.org/c">'
            '</head><body><a href="/x">x</a>'
            '<A HREF="https://o.org/y">y</A></body></html>')
    df = spark.createDataFrame([Row(
        url="https://h.org/p", warc_ts="2025-03-01T08:00:00Z",
        html=bytearray(html.encode()))])
    (row,) = wat_lines(df).collect()
    head, _, payload = row["value"].partition("\r\n\r\n")
    rid = _rid("https://h.org/p", "2025-03-01T08:00:00Z")
    assert head.startswith(
        "WARC/1.0\r\nWARC-Type: metadata\r\n"
        f"WARC-Record-ID: <{rid}>\r\n"
        "WARC-Target-URI: https://h.org/p\r\n"
        "WARC-Date: 2025-03-01T08:00:00Z\r\n"
        "Content-Type: application/json\r\n"
        "Content-Length: ")
    body = payload[:-4]
    assert int(head.rsplit(" ", 1)[1]) == len(body.encode())
    assert _json.loads(body) == {
        "url": "https://h.org/p", "title": 'A "B"é',
        "robots": "noindex, nofollow", "canonical": "https://h.org/c",
        "links": ["/x", "https://o.org/y"]}


def test_wat_lines_absent_signals_and_no_links(spark):
    import json as _json

    from pyspark.sql import Row

    from quickner_spark.sinks.formats import wat_lines

    df = spark.createDataFrame([Row(
        url="u", warc_ts="2025-01-01T00:00:00Z",
        html=bytearray(b"<html><body>plain</body></html>"))])
    (row,) = wat_lines(df).collect()
    body = row["value"].partition("\r\n\r\n")[2][:-4]
    assert _json.loads(body) == {"url": "u", "title": "", "robots": "",
                                 "canonical": "", "links": []}
