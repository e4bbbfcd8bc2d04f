"""quickner_spark — a from-scratch PySpark-native generalization of the
Quickner gazetteer-NER engine (reference: omarmhaimdat/quickner) into a
knowledge-graph construction pipeline over web-scale corpora.

Layers
------
matcher        pure-Python span-matching kernel (M1-M3), Spark-free
filters        row validity predicates (F1-F5), Python + Column + SQL forms
config         TOML config mirror (S6)
operators.*    DataFrame operators: annotate, indexes/lookups, dedup,
               text analytics, similarity search
sources        CSV / JSONL / spaCy loaders with gazetteer inference (S1-S5)
sinks          jsonl / spacy / csv / brat / conll / numpy writers (K1-K7)
api            drop-in reference-shaped Python API (Quickner/Document/Entity)
kg             north-rule pipeline: extract -> annotate -> link -> triples ->
               canonicalize -> materialize, resumable with per-stage metrics
"""

__version__ = "0.1.0"
