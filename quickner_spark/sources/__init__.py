"""Corpus / gazetteer / annotation loaders (SURVEY.md §2.1, S1-S7).

All loaders return DataFrames; filters are Column predicates (Catalyst
pushes them into the scan). Dedup semantics mirror the reference's
HashSet-at-ingest (quickner.rs:500-563) via ``dropDuplicates``.
"""

from quickner_spark.sources.loaders import (
    load_texts_csv,
    load_entities_csv,
    load_excludes_csv,
    from_jsonl,
    from_spacy,
    documents_from_rows,
)

__all__ = [
    "load_texts_csv",
    "load_entities_csv",
    "load_excludes_csv",
    "from_jsonl",
    "from_spacy",
    "documents_from_rows",
]
