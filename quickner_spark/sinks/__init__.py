from quickner_spark.sinks.formats import (
    save_annotations,
    to_jsonl,
    to_spacy,
    to_csv,
    to_brat,
    to_conll,
    to_numpy,
    spacy_generator,
)

__all__ = [
    "save_annotations", "to_jsonl", "to_spacy", "to_csv", "to_brat",
    "to_conll", "to_numpy", "spacy_generator",
]
