"""Reference-shaped Python API: ``Quickner`` / ``Document`` / ``Entity``.

A user of the reference (``from quickner import Quickner, Document,
Entity``) can switch to ``from quickner_spark.api import Quickner, Document,
Entity`` and run the same programs. Method-for-method port of the PyO3
surface (src/pyquickner.rs, src/pydocument.rs, src/pyentity.rs), executed on
Spark for the batch paths:

* ``process()``  -> EP1: broadcast gazetteer + mapInPandas annotate
  (results collected back into ``self.documents``, matching the reference's
  copy-back at src/pyquickner.rs:190-204).
* ``Document.annotate`` -> EP2: the same kernel, driver-side (the reference
  builds a throwaway automaton per call, document.rs:72-76).
* ``from_jsonl`` / ``from_spacy`` -> EP3 loaders with gazetteer inference.

Identity note: ids are xxhash64-hex of the text (reference DefaultHasher is
unstable across Rust releases; ids are never asserted by reference tests).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterable, Optional

from quickner_spark.config import Config, Format
from quickner_spark.matcher import annotate_text
from quickner_spark.sinks import formats as sink_formats

__all__ = ["Quickner", "Document", "Entity", "Text"]


def _hash_id(text: str) -> str:
    """xxhash64-as-hex doc id (shape-compatible with utils.rs:95-102)."""
    try:
        import xxhash  # type: ignore

        return format(xxhash.xxh64_intdigest(text), "x")
    except ImportError:
        import hashlib

        return hashlib.sha256(text.encode("utf-8")).hexdigest()[:16]


class Text:
    """quickner-core/src/models.rs:13-16 / quickner.pyi:39-46 — the
    CSV-row text envelope. Equality and hash are the TEXT FIELD only
    (the reference derives Eq+Hash and collects ``Text`` rows into a
    ``HashSet``, which is where text-level dedup happens,
    quickner.rs:419-424): two ``Text`` objects with equal strings are one
    set member. Accepted wherever a raw string is: the ``Quickner``
    constructor's ``documents`` list (converted via
    ``Document.from_string``, mirroring quickner.rs:424-427) and
    ``sources.loaders.documents_from_rows``."""

    __slots__ = ("text",)

    def __init__(self, text: str):
        self.text = text

    def __eq__(self, other):
        return isinstance(other, Text) and self.text == other.text

    def __hash__(self):
        return hash(self.text)

    def __repr__(self):
        return f'Text(text="{self.text}")'


@dataclass
class Entity:
    """src/pyentity.rs — (name, label) pair."""

    name: str
    label: str

    def __iter__(self):
        return iter((self.name, self.label))


class Document:
    """src/pydocument.rs — id + text + span list."""

    def __init__(self, text: str, label: Optional[list] = None):
        self.id = _hash_id(text)
        self.text = text
        self.label: list[tuple[int, int, str]] = [tuple(l) for l in (label or [])]

    @staticmethod
    def from_string(text: str) -> "Document":
        return Document(text)

    def annotate(self, entities: Iterable[Entity], case_sensitive: bool = False):
        """EP2 (pydocument.rs:75-87): matches on a fresh copy — stored text
        is NOT lowercased; new spans appended then order-preserving dedup."""
        ents = [(e.name, e.label) for e in entities]
        _, self.label = annotate_text(self.text, self.label, ents,
                                      case_sensitive=case_sensitive)

    def __eq__(self, other):
        return (isinstance(other, Document) and self.id == other.id
                and self.text == other.text and self.label == other.label)

    def __repr__(self):
        spans = ", ".join(f"({s}, {e}, {l})" for s, e, l in self.label)
        return f'Document(id="{self.id}", text="{self.text}", label=[{spans}])'

    def pretty(self) -> str:
        """ANSI-highlighted span rendering (src/pydocument.rs:122-168):
        each distinct label gets a color cycling [red..cyan] in FIRST-SEEN
        order of the unsorted span list; spans are then walked sorted by
        start, each annotated ``colorized(surface)[LABEL]``. Out-of-range
        offsets raise ValueError (pydocument.rs:154-158). The reference
        slices bytes (panics on overlapping spans and splits multi-byte
        chars); we slice chars — identical output for ASCII,
        well-defined otherwise, and overlapping spans render with empty
        gap text instead of crashing (the reference marks its own overlap
        handling as broken: pydocument.rs:118 TODO)."""
        colors = [31, 32, 33, 34, 35, 36]  # red green yellow blue magenta cyan
        color_map: dict[str, int] = {}
        for _, _, lab in self.label:
            if lab not in color_map:
                color_map[lab] = colors[len(color_map) % len(colors)]
        out = []
        pos = 0
        for s, e, lab in sorted(self.label, key=lambda t: t[0]):
            if s > len(self.text) or e > len(self.text):
                raise ValueError(
                    "start_label is greater than the length of the text")
            code = color_map[lab]
            out.append(self.text[pos:s])
            out.append(f"\x1b[{code}m{self.text[s:e]}\x1b[0m")
            out.append(f"[{lab}]")
            pos = e
        out.append(self.text[pos:])
        return "".join(out)


class Quickner:
    """src/pyquickner.rs — session facade, Spark-backed batch paths."""

    def __init__(self, documents: Optional[list[Document]] = None,
                 entities: Optional[list[Entity]] = None,
                 config: Optional[Config] = None,
                 spark=None):
        # Text envelopes and raw strings are accepted alongside Documents
        # (the reference constructor takes only Vec<PyDocument>,
        # pyquickner.rs:87-98; its texts HashSet path turns strings into
        # documents with Document::from_string, quickner.rs:424-427) —
        # both get the HashSet text-equality dedup, Documents do not.
        docs, seen_texts = [], set()
        for d in (documents or []):
            if isinstance(d, str):
                d = Text(d)
            if isinstance(d, Text):
                if d.text in seen_texts:
                    continue
                seen_texts.add(d.text)
                d = Document.from_string(d.text)
            docs.append(d)
        self.documents: list[Document] = docs
        self.entities: list[Entity] = list(entities or [])
        self.config = config or Config()
        self.config_path = ""
        self._spark = spark

    # -- Spark plumbing -----------------------------------------------------
    def _get_spark(self):
        if self._spark is None:
            from quickner_spark.session import get_spark

            self._spark = get_spark("quickner-api", cores=int(
                os.environ.get("SPARK_GRAFT_CPUS", "4")))
        return self._spark

    def _documents_df(self):
        spark = self._get_spark()
        rows = [(d.id, d.text) for d in self.documents]
        return spark.createDataFrame(rows, "id string, text string")

    def _annotated_df(self):
        """Doc-level DataFrame with span arrays from current state."""
        spark = self._get_spark()
        rows = [(d.id, d.text,
                 [{"start": s, "end": e, "label": l} for s, e, l in d.label])
                for d in self.documents]
        return spark.createDataFrame(
            rows, "id string, text string, "
                  "label array<struct<start:int,end:int,label:string>>")

    # -- EP1: process -------------------------------------------------------
    def process(self, save: bool = False):
        """quickner.rs:406-491: load (if empty) -> excludes anti-join ->
        entity lowering -> annotate -> optional sink dispatch. Mutates
        ``self.documents`` (text lowercased under case-insensitive config)
        exactly like the reference copy-back."""
        from quickner_spark.operators.annotate import (annotate_documents,
                                                       normalize_gazetteer)
        from quickner_spark.sources import (load_entities_csv,
                                            load_excludes_csv,
                                            load_texts_csv)

        spark = self._get_spark()
        cfg = self.config
        if not self.entities and cfg.entities.input.path:
            ents_df = load_entities_csv(
                spark, cfg.entities.input.path, cfg.entities.filters,
                apply_filter=bool(cfg.entities.input.filter))
            self.entities = [Entity(r["name"], r["label"])
                             for r in ents_df.collect()]
        if not self.documents and cfg.texts.input.path:
            docs_df = load_texts_csv(
                spark, cfg.texts.input.path, cfg.texts.filters,
                apply_filter=bool(cfg.texts.input.filter))
            self.documents = [Document(r["text"]) for r in docs_df.collect()]
        excludes = None
        if cfg.entities.excludes.path:
            excludes = [r["name"] for r in
                        load_excludes_csv(spark, cfg.entities.excludes.path).collect()]
        gaz = normalize_gazetteer(
            [(e.name, e.label) for e in self.entities],
            case_sensitive=cfg.entities.filters.case_sensitive,
            excludes=excludes)
        self.entities = [Entity(n, l) for n, l in gaz]
        # A6 — "number of unique checks" work metric (quickner.rs:460-470)
        self.last_check_count = len(self.entities) * len(self.documents)
        annotated = annotate_documents(
            self._documents_df(), gaz, text_col="text",
            case_sensitive=cfg.texts.filters.case_sensitive)
        by_id = {d.id: d for d in self.documents}
        new_docs = []
        for row in annotated.collect():
            doc = by_id.get(row["id"]) or Document(row["text"])
            doc.text = row["text"]  # lowercased under insensitive config
            doc.label = list(doc.label) + [
                (s["start"], s["end"], s["label"]) for s in row["label"]]
            new_docs.append(doc)
        # preserve original order (collect() order is partition order; keep
        # the caller's list order like the reference's in-place par_iter_mut)
        order = {d.id: i for i, d in enumerate(self.documents)}
        new_docs.sort(key=lambda d: order.get(d.id, len(order)))
        self.documents = new_docs
        if save:
            sink_formats.save_annotations(
                self._annotated_df(), self.config.annotations.output.path,
                self.config.annotations.format.value)

    # -- Q1/Q2 lookups (src/pyquickner.rs:297-360) ---------------------------
    def find_documents_by_label(self, label: str) -> list[Document]:
        out, seen = [], set()
        for d in self.documents:
            if any(l == label for _, _, l in d.label) and d.id not in seen:
                seen.add(d.id)
                out.append(d)
        return out

    def find_documents_by_entity(self, name: str) -> list[Document]:
        name = name.lower()
        out, seen = [], set()
        for d in self.documents:
            for s, e, _ in d.label:
                if d.text[s:e].lower() == name and d.id not in seen:
                    seen.add(d.id)
                    out.append(d)
        return out

    # -- mutation (Q4) -------------------------------------------------------
    def add_document(self, document: Document):
        if any(d.id == document.id for d in self.documents):
            return
        self.documents.append(document)

    def add_entity(self, entity: Entity):
        if any(e.name == entity.name and e.label == entity.label
               for e in self.entities):
            return
        self.entities.append(entity)

    # -- exports (K1-K7) -----------------------------------------------------
    def save_annotations(self, path: Optional[str] = None,
                         format: str = "jsonl") -> str:
        path = path or self.config.annotations.output.path
        return sink_formats.save_annotations(self._annotated_df(), path, format)

    def to_jsonl(self, path: Optional[str] = None):
        sink_formats.to_jsonl(self._annotated_df(),
                              path or self.config.annotations.output.path)

    def to_csv(self, path: Optional[str] = None):
        sink_formats.to_csv(self._annotated_df(),
                            path or self.config.annotations.output.path)

    def to_spacy(self, path: Optional[str] = None):
        sink_formats.to_spacy(self._annotated_df(),
                              path or self.config.annotations.output.path)

    def spacy(self, chunks: Optional[int] = None):
        """K7 generator; ``chunks`` is chunk SIZE (quirk, quickner.rs:694-715)."""
        return sink_formats.spacy_generator(self._annotated_df(), chunks)

    def numpy(self):
        return sink_formats.to_numpy(self._annotated_df())

    # -- EP3 loaders ---------------------------------------------------------
    @staticmethod
    def from_jsonl(path: str, spark=None) -> "Quickner":
        q = Quickner(spark=spark)
        from quickner_spark.sources import from_jsonl as _load

        docs_df, ents_df = _load(q._get_spark(), path)
        q.documents = [
            Document(r["text"],
                     [(s["start"], s["end"], s["label"]) for s in r["label"]])
            for r in docs_df.collect()]
        q.entities = [Entity(r["name"], r["label"]) for r in ents_df.collect()]
        return q

    @staticmethod
    def from_spacy(path: str, spark=None) -> "Quickner":
        q = Quickner(spark=spark)
        from quickner_spark.sources import from_spacy as _load

        docs_df, ents_df = _load(q._get_spark(), path)
        q.documents = [
            Document(r["text"],
                     [(s["start"], s["end"], s["label"]) for s in r["label"]])
            for r in docs_df.collect()]
        q.entities = [Entity(r["name"], r["label"]) for r in ents_df.collect()]
        return q

    def __repr__(self):
        counts: dict[str, int] = {}
        for d in self.documents:
            for _, _, l in d.label:
                counts[l] = counts.get(l, 0) + 1
        hist = ", ".join(f"{k}: {v}" for k, v in counts.items())
        return (f"Entities: {len(self.entities)} | "
                f"Documents: {len(self.documents)} | Annotations: {hist}")
