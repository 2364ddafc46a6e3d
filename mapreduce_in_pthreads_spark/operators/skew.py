"""Skew-mitigation operators (100 TB contract, SURVEY.md §2.3 notes).

The documents vocabulary is tiny (~31 distinct words over 260K+ token
occurrences at sf0.1) — a genuinely skewed key space where a naive
groupBy concentrates whole key populations on single reducers (the
reference had the same issue: `hash(word) % NC` sends every 'the' to
one consumer, mapreduce.c:117).

``salted_word_count`` is the classic two-stage rewrite: salt the key →
partial aggregate over (key, salt) → final aggregate over key. The
first shuffle spreads each hot key over SALT_BUCKETS reducers; the
second shuffles only #keys × SALT_BUCKETS tiny partial rows. Result is
IDENTICAL to the plain aggregation (counts are associative), which the
shared oracle proves.

AQE's skew-join splitting handles the JOIN version of this problem
automatically (enabled in session.py); explicit salting remains the
tool for skewed AGGREGATIONS with non-combinable state or extreme
single-key hotspots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.inverted_index import TOKENS_FILTERED_SQL, tokens

SALT_BUCKETS = 16


def salted_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → count via salt → partial → final. Same result as
    ``word_count``, skew-proof shuffle profile."""
    t = tokens(spark, sf_dir)
    salted = t.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id", "pos"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("word", "salt").agg(
        F.count(F.lit(1)).alias("partial_n"))
    return partial.groupBy("word").agg(
        F.sum("partial_n").alias("n_occurrences"))


SALTED_WORD_COUNT_SQL = f"""
SELECT word, count(*) AS n_occurrences
FROM ({TOKENS_FILTERED_SQL}) w GROUP BY word
"""
