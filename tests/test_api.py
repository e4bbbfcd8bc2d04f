"""Mirror of the reference test suite (/root/reference/tests/test.py),
one test per reference test, run against the Spark-backed facade."""

from __future__ import annotations

import pytest

from quickner_spark.api import Document, Entity, Quickner

from tests.test_matcher import ENTITIES, TEXTS


@pytest.fixture()
def quick(spark):
    docs = [Document(t) for t in TEXTS]
    ents = [Entity(*e) for e in ENTITIES]
    return Quickner(documents=docs, entities=ents, spark=spark)


def _labels_count(q):
    return sum(len(d.label) for d in q.documents)


def test_quickner_from_documents(spark):
    # tests/test.py:49-60
    docs = [Document(t) for t in TEXTS]
    q = Quickner(documents=docs, spark=spark)
    assert len(q.documents) == 5
    assert len(q.entities) == 0
    q.entities = [Entity(*e) for e in ENTITIES]
    q.process()
    assert _labels_count(q) == 12


def test_quickner_from_documents_and_entities(quick):
    # tests/test.py:62-71
    assert len(quick.documents) == 5
    assert len(quick.entities) == 10
    quick.process()
    assert _labels_count(quick) == 12


def test_find_document_by_label(quick):
    # tests/test.py:73-84
    quick.process()
    assert len(quick.find_documents_by_label("PL")) == 5
    assert len(quick.find_documents_by_label("ORG")) == 3
    assert len(quick.find_documents_by_label("PERSON")) == 3


def test_setting_documents(quick):
    # tests/test.py:86-115
    quick.process()
    quick.documents = []
    assert len(quick.documents) == 0
    quick.documents = [Document(t) for t in TEXTS]
    quick.process()
    assert len(quick.documents) == 5
    assert len(quick.find_documents_by_entity("Rust")) == 2
    for name in ("Python", "Java", "Swift", "Mozilla", "Apple",
                 "Sun Microsystems", "Guido van Rossum", "James Gosling",
                 "Chris Lattner"):
        assert len(quick.find_documents_by_entity(name)) == 1


def test_find_document_by_entity(quick):
    # tests/test.py:117-141
    quick.process()
    assert len(quick.find_documents_by_entity("Rust")) == 2
    assert len(quick.find_documents_by_entity("Python")) == 1
    assert len(quick.find_documents_by_entity("Sun Microsystems")) == 1


def test_get_spacy_generator(quick):
    # tests/test.py:143-155 — ``chunks`` is chunk size
    quick.process()
    assert len(list(quick.spacy())) == 1
    assert len(list(quick.spacy(chunks=2))) == 3
    assert len(list(quick.spacy(chunks=3))) == 2
    assert len(list(quick.spacy(chunks=5))) == 1
    # format parity: misspelled key (src/pyquickner.rs:373)
    chunk = next(iter(quick.spacy(chunks=2)))
    assert "entitiy" in chunk[0][1]


def test_single_document_annotation(spark):
    # tests/test.py:157-165
    rust = Document.from_string("rust is made by Mozilla")
    entities = [Entity("Rust", "PL"), Entity("Mozilla", "ORG")]
    rust.annotate(entities, case_sensitive=True)
    assert len(rust.label) == 1
    rust.annotate(entities, case_sensitive=False)
    assert len(rust.label) == 2
    assert rust.label[0][2] == "ORG"
    assert rust.label[1][2] == "PL"


def test_character_level_slicing(spark):
    # tests/test.py:167-174
    document = Document("Indizes auf Zeichenebene anstelle von Indizes auf "
                        "Byteebene, um Python-Slicing zu unterstützen")
    document.annotate([Entity("Python", "PL")], case_sensitive=False)
    assert len(document.label) == 1
    s, e, _ = document.label[0]
    assert document.text[s:e] == "Python"


def test_process_lowercases_stored_text(quick):
    # quickner.rs:267-270 — batch process mutates stored text
    quick.process()
    assert quick.documents[0].text == TEXTS[0].lower()


def test_repr_histogram(quick):
    quick.process()
    r = repr(quick)
    assert "Entities: 10" in r and "Documents: 5" in r and "PL: 6" in r


def test_pretty_highlights_spans():
    # src/pydocument.rs:122-168 — color per label in first-seen order
    # (red=31 first, green=32 second), spans walked sorted by start
    d = Document("rust is made by mozilla",
                 label=[(16, 23, "ORG"), (0, 4, "PL")])
    p = d.pretty()
    assert p == ("\x1b[32mrust\x1b[0m[PL] is made by "
                 "\x1b[31mmozilla\x1b[0m[ORG]")


def test_pretty_out_of_range_raises():
    import pytest as _pytest

    d = Document("short", label=[(0, 99, "X")])
    with _pytest.raises(ValueError):
        d.pretty()


def test_text_model_reference_parity(spark):
    """models.rs:13-16 / quickner.pyi:39-46: Text(text) with text-field
    equality + hash; a ported reference snippet constructing Text objects
    runs unchanged through Quickner and documents_from_rows."""
    from quickner_spark.api import Document, Quickner, Text
    from quickner_spark.sources.loaders import documents_from_rows

    a, b, c = Text("rust is fast"), Text("rust is fast"), Text("other")
    assert a == b and hash(a) == hash(b) and a != c
    assert a.text == "rust is fast"
    assert len({a, b, c}) == 2          # HashSet semantics
    assert repr(a) == 'Text(text="rust is fast")'

    # constructor ingest: Text envelopes become Documents, text-deduped
    q = Quickner(documents=[a, b, c, Document("plain doc")])
    assert [d.text for d in q.documents] == \
        ["rust is fast", "other", "plain doc"]
    assert all(isinstance(d, Document) for d in q.documents)

    # loader ingest: strings and Text envelopes mix
    df = documents_from_rows(spark, [a, "raw string"])
    assert [r["text"] for r in df.collect()] == \
        ["rust is fast", "raw string"]


def test_constructor_accepts_raw_strings(spark):
    """Raw strings in Quickner(documents=...) take the Text path:
    wrapped into Documents with HashSet text-equality dedup (same
    semantics as the reference's texts ingestion, quickner.rs:424-427).
    Regression: pre-round-5-close this raised AttributeError in
    process() ('str' object has no attribute 'id')."""
    from quickner_spark.api import Document, Entity, Quickner

    q = Quickner(documents=["Apple acquired Beats.", "Apple acquired Beats.",
                            "other text"],
                 entities=[Entity("Apple", "ORG")], spark=spark)
    assert [d.text for d in q.documents] == \
        ["Apple acquired Beats.", "other text"]
    assert all(isinstance(d, Document) for d in q.documents)
    q.process()
    assert q.documents[0].label == [(0, 5, "ORG")]
    assert q.documents[1].label == []
