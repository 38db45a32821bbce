"""jerex_spark — PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the capabilities of lavis-nlp/jerex
(joint entity-level relation extraction, EACL 2021) as a Spark-first
pipeline: documents -> mentions -> coref clusters -> typed entities ->
(subj, pred, obj) triples, plus canonicalization, dedup, and the
training-data-pipeline operators a 100 TB corpus needs.

The reference's four-stage architecture is documented in SURVEY.md with
file:line citations into /root/reference; no code is copied from it.
"""

__version__ = "0.1.0"
