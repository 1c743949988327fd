"""eventstream_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference event-bus library (christophertubbs/EventStream, surveyed in
/root/repo/SURVEY.md) as an idiomatic PySpark engine:

- ``session``    — SparkSession factory tuned for large-scale batch + streaming.
- ``catalog``    — table registry over the parquet lakehouse layout.
- ``codec``      — event-envelope codec (typed envelope + open props payload),
                   the Spark analog of the reference's Message model.
- ``registry``   — per-event schema registry with weighted-specificity
                   resolution (reference: event_stream/messages/__init__.py).
- ``operators``  — relational query builders, dedup, similarity search,
                   text analysis, as-of joins, multimodal plumbing.
- ``plans``      — route compiler: declarative pipeline spec -> DataFrame DAG
                   (reference: event_stream/configuration/bus.py).
- ``streaming``  — Structured Streaming semantics: windows, watermarks,
                   dedup, completion barrier (reference: communication.py).
"""

__version__ = "0.1.0"
