"""Engine configuration — mirror of the reference TOML config.

Port of quickner-core/src/config.rs:27-245 as plain dataclasses parsed with
stdlib ``tomllib``. Driver-side only; no Spark involvement (reference S6,
SURVEY.md §2.1). Defaults match config.rs:99-113 exactly.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional

from quickner_spark.filters import Filters

__all__ = ["Config", "Texts", "Entities", "Annotations", "Input", "Output",
           "Excludes", "Format", "Logging"]


class Format(str, Enum):
    """Output formats (config.rs:199-212); default jsonl."""

    CSV = "csv"
    JSONL = "jsonl"
    SPACY = "spacy"
    BRAT = "brat"
    CONLL = "conll"


@dataclass
class Input:
    path: str = ""
    filter: Optional[bool] = True  # config.rs:76-83 default Some(true)


@dataclass
class Output:
    path: str = ""


@dataclass
class Excludes:
    path: Optional[str] = None


@dataclass
class Texts:
    input: Input = field(default_factory=Input)
    filters: Filters = field(default_factory=Filters)


@dataclass
class Entities:
    input: Input = field(default_factory=Input)
    filters: Filters = field(default_factory=Filters)
    excludes: Excludes = field(default_factory=Excludes)


@dataclass
class Annotations:
    output: Output = field(default_factory=Output)
    format: Format = Format.JSONL


@dataclass
class Logging:
    level: str = "info"


@dataclass
class Config:
    texts: Texts = field(default_factory=Texts)
    annotations: Annotations = field(default_factory=Annotations)
    entities: Entities = field(default_factory=Entities)
    logging: Optional[Logging] = field(default_factory=Logging)

    def to_dict(self) -> dict:
        """Config object tree back to the TOML-shaped dict (inverse of
        ``from_dict``; reference PyConfig exposes the full mutable tree,
        src/pyconfig.rs:1-409 — this plus dataclass mutability is the
        write-back half of that parity)."""
        def filters(f: Filters) -> dict:
            d = {"alphanumeric": f.alphanumeric,
                 "case_sensitive": f.case_sensitive,
                 "min_length": f.min_length, "max_length": f.max_length,
                 "punctuation": f.punctuation, "numbers": f.numbers,
                 "special_characters": f.special_characters}
            if f.accept_special_characters is not None:
                d["accept_special_characters"] = f.accept_special_characters
            return d

        out: dict = {
            "texts": {
                "input": {"path": self.texts.input.path,
                          "filter": self.texts.input.filter},
                "filters": filters(self.texts.filters),
            },
            "annotations": {
                "output": {"path": self.annotations.output.path},
                "format": self.annotations.format.value,
            },
            "entities": {
                "input": {"path": self.entities.input.path,
                          "filter": self.entities.input.filter},
                "filters": filters(self.entities.filters),
            },
        }
        if self.entities.excludes.path is not None:
            out["entities"]["excludes"] = {"path": self.entities.excludes.path}
        if self.logging is not None:
            out["logging"] = {"level": self.logging.level}
        return out

    def to_toml(self, path: Optional[str] = None) -> str:
        """Serialize to TOML (stdlib ``tomllib`` is read-only, so emission
        is local — the schema is flat key/value sections). ``path`` also
        writes the file. Round-trips: ``Config.from_dict(tomllib.loads(
        cfg.to_toml()))`` reproduces the object."""
        def fmt(v) -> str:
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, int):
                return str(v)
            escaped = str(v).replace("\\", "\\\\").replace('"', '\\"')
            return f'"{escaped}"'

        lines: list[str] = []

        def emit(prefix: str, d: dict) -> None:
            scalars = {k: v for k, v in d.items() if not isinstance(v, dict)}
            if scalars or not d:
                lines.append(f"[{prefix}]")
                for k, v in scalars.items():
                    lines.append(f"{k} = {fmt(v)}")
                lines.append("")
            for k, v in d.items():
                if isinstance(v, dict):
                    emit(f"{prefix}.{k}", v)

        for section, body in self.to_dict().items():
            # top-level scalar keys (annotations.format) live in the
            # section header table and must precede its sub-tables
            emit(section, body)
        text = "\n".join(lines)
        if path is not None:
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(text)
        return text

    @staticmethod
    def from_file(path: str) -> "Config":
        with open(path, "rb") as fh:
            raw = tomllib.load(fh)
        return Config.from_dict(raw)

    @staticmethod
    def from_dict(raw: dict) -> "Config":
        def filters(d: dict) -> Filters:
            known = {k: d[k] for k in (
                "alphanumeric", "case_sensitive", "min_length", "max_length",
                "punctuation", "numbers", "special_characters",
                "accept_special_characters") if k in d}
            return Filters(**known)

        def input_(d: dict) -> Input:
            return Input(path=d.get("path", ""), filter=d.get("filter", True))

        t = raw.get("texts", {})
        e = raw.get("entities", {})
        a = raw.get("annotations", {})
        cfg = Config(
            texts=Texts(input=input_(t.get("input", {})),
                        filters=filters(t.get("filters", {}))),
            entities=Entities(input=input_(e.get("input", {})),
                              filters=filters(e.get("filters", {})),
                              excludes=Excludes(path=e.get("excludes", {}).get("path"))),
            annotations=Annotations(output=Output(path=a.get("output", {}).get("path", "")),
                                    format=Format(a.get("format", "jsonl"))),
            logging=Logging(**raw["logging"]) if "logging" in raw else Logging(),
        )
        return cfg
