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
