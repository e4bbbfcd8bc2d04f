"""Golden + property tests for the span-matching kernel.

Goldens are the reference's own fixtures (/root/reference/tests/test.py:8-41)
asserted *stronger* than the reference suite: exact span lists per text, not
just counts (the reference's _test_correct loop is vacuous post-lowercasing;
see SURVEY.md §5).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from quickner_spark.matcher import Matcher, annotate_text, find_spans

TEXTS = [
    "rust is made by Mozilla",
    "Python was created by Guido van Rossum",
    "Java was created by James Gosling at Sun Microsystems",
    "Swift was created by Chris Lattner and Apple",
    "You can find more information about Rust at https://www.rust-lang.org/",
]

ENTITIES = [
    ("Rust", "PL"),
    ("Python", "PL"),
    ("Java", "PL"),
    ("Swift", "PL"),
    ("Mozilla", "ORG"),
    ("Apple", "ORG"),
    ("Sun Microsystems", "ORG"),
    ("Guido van Rossum", "PERSON"),
    ("James Gosling", "PERSON"),
    ("Chris Lattner", "PERSON"),
]

GOLDEN = {
    "rust is made by mozilla": [(0, 4, "PL"), (16, 23, "ORG")],
    "python was created by guido van rossum": [(0, 6, "PL"), (22, 38, "PERSON")],
    "java was created by james gosling at sun microsystems": [
        (0, 4, "PL"), (20, 33, "PERSON"), (37, 53, "ORG")],
    "swift was created by chris lattner and apple": [
        (0, 5, "PL"), (21, 34, "PERSON"), (39, 44, "ORG")],
}

LOWER_ENTS = sorted({(n.lower(), l) for n, l in ENTITIES})


def spans_for(text: str, backend: str = "find"):
    return find_spans(text.lower(), LOWER_ENTS, backend=backend)


@pytest.mark.parametrize("backend", ["find", "ac", "bnd"])
def test_golden_spans(backend):
    total = 0
    for text in TEXTS:
        got = spans_for(text, backend)
        key = text.lower()
        if key in GOLDEN:
            assert got == GOLDEN[key], text
        total += len(got)
    assert total == 12  # tests/test.py:58-59


@pytest.mark.parametrize("backend", ["find", "ac", "bnd"])
def test_rust_matched_twice_in_url(backend):
    # "Rust" and "rust" inside https://www.rust-lang.org/ (punct boundaries)
    got = spans_for(TEXTS[4], backend)
    assert len(got) == 2
    assert all(lab == "PL" for _, _, lab in got)
    text = TEXTS[4].lower()
    assert [text[s:e] for s, e, _ in got] == ["rust", "rust"]


def test_unicode_character_offsets():
    # /root/reference/tests/test.py:167-174 — char-level offsets with 'ü'
    text = ("Indizes auf Zeichenebene anstelle von Indizes auf Byteebene, "
            "um Python-Slicing zu unterstützen")
    new_text, labels = annotate_text(text, [], [("Python", "PL")],
                                     case_sensitive=False)
    assert len(labels) == 1
    s, e, lab = labels[0]
    assert new_text == text  # PyDocument::annotate leaves stored text alone
    assert new_text[s:e] == "Python"  # test.py:172-174


def test_single_document_case_sensitivity_and_order():
    # /root/reference/tests/test.py:157-165
    text = "rust is made by Mozilla"
    ents = [("Rust", "PL"), ("Mozilla", "ORG")]
    text1, labels = annotate_text(text, [], ents, case_sensitive=True)
    assert len(labels) == 1  # only "Mozilla" matches case-sensitively
    assert labels[0][2] == "ORG"
    text2, labels = annotate_text(text1, labels, ents, case_sensitive=False)
    assert len(labels) == 2
    assert labels[0][2] == "ORG"  # order preserved: ORG first
    assert labels[1][2] == "PL"


def test_suffix_rule_d_quirk():
    # quickner.rs:180-183 — a match ending exactly at end-of-text is
    # accepted with NO preceding-boundary check ("xrust" end of text).
    got = find_spans("i love xrust", [("rust", "PL")])
    assert got == [(8, 12, "PL")]
    # clean mode rejects it — the documented divergence
    got_clean = find_spans("i love xrust", [("rust", "PL")], mode="clean")
    assert got_clean == []
    # mid-text non-boundary matches rejected in both modes
    assert find_spans("xrust here", [("rust", "PL")]) == []


def test_end_of_text_without_suffix_rule_needs_rule_d():
    # end-of-text next char reads sentinel 'N' -> rules a/b/c fail; rule d
    # catches it (byte arithmetic).
    assert find_spans("made by mozilla", [("mozilla", "ORG")]) == [(8, 15, "ORG")]


def test_overlapping_patterns_all_reported():
    ents = [("sun", "STAR"), ("sun microsystems", "ORG")]
    got = find_spans("at sun microsystems today", ents)
    assert got == [(3, 6, "STAR"), (3, 19, "ORG")]


def test_consecutive_dedup_same_triple():
    # duplicate (name,label) entries collapse after M3 dedup
    ents = [("rust", "PL"), ("rust", "PL")]
    assert find_spans("rust rules", ents) == [(0, 4, "PL")]


def test_same_name_different_labels_both_kept():
    ents = [("rust", "PL"), ("rust", "GAME")]
    got = find_spans("rust rules", ents)
    assert got == [(0, 4, "GAME"), (0, 4, "PL")] or got == [(0, 4, "PL"), (0, 4, "GAME")]
    assert len(got) == 2


@settings(max_examples=300, deadline=None)
@given(
    text=st.text(alphabet="ab .x-", min_size=0, max_size=40),
    pats=st.lists(
        st.text(alphabet="ab x", min_size=1, max_size=5).filter(str.strip),
        min_size=1, max_size=6),
)
def test_backends_agree(text, pats):
    ents = sorted({(p, "X") for p in pats})
    a = Matcher(ents, backend="ac").find_spans(text)
    b = Matcher(ents, backend="find").find_spans(text)
    c = Matcher(ents, backend="re").find_spans(text)
    d = Matcher(ents, backend="bnd").find_spans(text)
    assert a == b == c == d
    ac = Matcher(ents, backend="ac").find_spans_clean(text)
    dc = Matcher(ents, backend="bnd").find_spans_clean(text)
    assert ac == dc


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(min_size=0, max_size=60),
    pats=st.lists(st.text(min_size=1, max_size=4), min_size=1, max_size=5),
)
def test_backends_agree_unicode(text, pats):
    ents = sorted({(p, "X") for p in pats})
    a = Matcher(ents, backend="ac").find_spans(text)
    b = Matcher(ents, backend="find").find_spans(text)
    c = Matcher(ents, backend="re").find_spans(text)
    d = Matcher(ents, backend="bnd").find_spans(text)
    assert a == b == c == d
    ac = Matcher(ents, backend="ac").find_spans_clean(text)
    dc = Matcher(ents, backend="bnd").find_spans_clean(text)
    assert ac == dc
