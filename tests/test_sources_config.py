"""CSV loader (S1-S3), TOML config (S6), and excludes anti-join (J2) tests."""

from __future__ import annotations

import pytest

from quickner_spark.api import Document, Entity, Quickner
from quickner_spark.config import Config, Format
from quickner_spark.filters import Filters
from quickner_spark.sources import (load_entities_csv, load_excludes_csv,
                                    load_texts_csv)

from tests.test_matcher import ENTITIES, TEXTS


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    (d / "texts.csv").write_text(
        "text\n" + "\n".join(f'"{t}"' for t in TEXTS) +
        f'\n"{TEXTS[0]}"\n')  # duplicate row -> set semantics
    (d / "entities.csv").write_text(
        "name,label\n" + "\n".join(f'"{n}","{l}"' for n, l in ENTITIES) +
        '\n"Rust","PL"\n')  # duplicate entity
    (d / "excludes.csv").write_text("name\nApple\n")
    return d


def test_texts_csv_dedup(spark, csv_dir):
    df = load_texts_csv(spark, str(csv_dir / "texts.csv"))
    assert df.count() == 5  # HashSet<Text> semantics (quickner.rs:537-563)
    assert set(df.columns) == {"id", "text"}


def test_texts_csv_filtered(spark, csv_dir):
    f = Filters(min_length=50)
    df = load_texts_csv(spark, str(csv_dir / "texts.csv"), f, apply_filter=True)
    texts = {r["text"] for r in df.collect()}
    assert all(len(t.encode()) >= 50 for t in texts)
    assert 0 < len(texts) < 5


def test_entities_csv_lowering_only_under_filter(spark, csv_dir):
    # quickner.rs:505-514: lowering happens only inside the filter branch
    raw = load_entities_csv(spark, str(csv_dir / "entities.csv"))
    assert ("Rust", "PL") in {(r["name"], r["label"]) for r in raw.collect()}
    assert raw.count() == 10
    filt = load_entities_csv(spark, str(csv_dir / "entities.csv"),
                             Filters(), apply_filter=True)
    assert ("rust", "PL") in {(r["name"], r["label"]) for r in filt.collect()}


def test_excludes_csv(spark, csv_dir):
    ex = load_excludes_csv(spark, str(csv_dir / "excludes.csv"))
    assert [r["name"] for r in ex.collect()] == ["Apple"]


def test_process_with_config_files(spark, csv_dir, tmp_path):
    # EP1 from config: CSV ingest + excludes anti-join (J2, quickner.rs:429-446)
    cfg = Config.from_dict({
        "texts": {"input": {"path": str(csv_dir / "texts.csv"),
                            "filter": False}},
        "entities": {"input": {"path": str(csv_dir / "entities.csv"),
                               "filter": False},
                     "excludes": {"path": str(csv_dir / "excludes.csv")}},
        "annotations": {"output": {"path": str(tmp_path / "out.jsonl")},
                        "format": "jsonl"},
    })
    q = Quickner(config=cfg, spark=spark)
    q.process(save=True)
    assert len(q.documents) == 5
    # Apple excluded: ORG mentions drop from 3 to 2
    assert len(q.find_documents_by_entity("Apple")) == 0
    assert len(q.find_documents_by_entity("Mozilla")) == 1
    assert sum(len(d.label) for d in q.documents) == 11
    assert (tmp_path / "out.jsonl").exists()


def test_config_toml_roundtrip(tmp_path):
    toml = tmp_path / "config.toml"
    toml.write_text("""
[texts]
[texts.input]
path = "texts.csv"
filter = true
[texts.filters]
case_sensitive = false
min_length = 0
max_length = 1024

[entities]
[entities.input]
path = "entities.csv"
[entities.filters]
case_sensitive = false
special_characters = true
accept_special_characters = ".-"
[entities.excludes]
path = "excludes.csv"

[annotations]
format = "spacy"
[annotations.output]
path = "annotations.json"

[logging]
level = "debug"
""")
    cfg = Config.from_file(str(toml))
    assert cfg.annotations.format is Format.SPACY
    assert cfg.entities.filters.accept_special_characters == ".-"
    assert "." not in cfg.entities.filters._special
    assert "@" in cfg.entities.filters._special
    assert cfg.entities.excludes.path == "excludes.csv"
    assert cfg.logging.level == "debug"


def test_config_to_toml_write_back(tmp_path):
    """Config write-back (reference PyConfig parity, src/pyconfig.rs):
    mutate -> save -> reload reproduces the object tree exactly."""
    import tomllib

    cfg = Config()
    cfg.annotations.format = Format.CONLL
    cfg.annotations.output.path = "out.x"
    cfg.entities.filters.special_characters = True
    cfg.entities.filters.accept_special_characters = '.-"\\'
    cfg.entities.excludes.path = "ex.csv"
    cfg.logging.level = "debug"
    # string round-trip
    again = Config.from_dict(tomllib.loads(cfg.to_toml()))
    assert again.to_dict() == cfg.to_dict()
    assert again.annotations.format is Format.CONLL
    assert again.entities.filters.accept_special_characters == '.-"\\'
    # file round-trip
    p = str(tmp_path / "cfg.toml")
    cfg.to_toml(p)
    assert Config.from_file(p).to_dict() == cfg.to_dict()
