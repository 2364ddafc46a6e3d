"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``pengjuntc/mapreduce-in-pthreads``
(a pthreads MapReduce that builds an inverted index — see SURVEY.md),
re-expressed Spark-first and extended with the relational + LLM-data-
pipeline operator surface required for 100 TB-scale training-data work.

Layout
------
- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC).
- ``sources``    — parquet table loaders + word-per-line text corpus
                   reader (reference fidelity: per-file 1-based line
                   numbers, mapreduce.c:106-121 semantics).
- ``functions``  — reusable column expressions (normalization, vector
                   math, hashing/minhash, decimal-stable aggregates).
- ``operators``  — the query library: every operator has a
                   ``(spark, sf_dir) -> DataFrame`` callable and (where
                   SQL-expressible) a DuckDB oracle twin.
- ``plans``      — the registry mapping query names to (callable,
                   oracle_sql) consumed by ``__spark_entry__.py``.
- ``streaming``  — Structured Streaming variants of the event-window
                   operators (batch-first; streaming parity tested via
                   file sources, not the driver oracle).

Design rules (100 TB): DataFrame/Catalyst first; no ``collect()`` on
unbounded data; no row-at-a-time Python UDFs on hot paths; broadcast
declared for dimension joins; aggregations partial-aggregable where
semantics allow; AQE left on.
"""

__version__ = "0.1.0"
