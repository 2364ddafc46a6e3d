"""The flagship inverted index as a STREAMING query over the wordline
source (SURVEY.md §7 stretch: a second wordline micro-batch scenario).

The reference engine is architecturally a stream processor — bounded
producers feed blocking queues that consumers drain incrementally
(mapreduce.c:75-87, 97-222) — but it can only ever run to completion
over a fixed file list. This module runs the SAME logical index query
as ``operators/inverted_index.py`` with files arriving one per
micro-batch (``SimpleDataSourceStreamReader`` offsets = file index,
``sources/wordline_datasource.py``), which is what "a new corpus shard
landed" looks like in production: the index is re-emitted complete
and correct after every arrival, no batch rebuild.

Execution contract:
- complete output mode — the index aggregation state IS the index;
  each trigger re-emits every word's current postings. No watermark:
  corpus shards are not event-time data and never "expire".
- per-word state is the posting multiset — the same unbounded
  collect_list the reference holds in uthash (mapreduce.c:170-174);
  the documented 100 TB surface stays the capped/count-style derived
  queries (``index_top_docs``, ``word_count``), streaming included.
- determinism: arrival order is pinned away by ``sort_array`` exactly
  as in batch, so stream-vs-batch parity is exact string equality
  (tests/test_streaming.py::test_wordline_streaming_index_parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import normalize_word
from ..sources import wordline_datasource


def _index_over(lines: DataFrame) -> DataFrame:
    """The shared logical plan: wordline rows → reference index rows
    (``word, n_occurrences, occurrences``) — golden line format per
    mapreduce.c:171,180,218, bare file names like argv (c:309)."""
    words = (
        lines.select(
            F.element_at(F.split("filename", "/"), -1).alias("filename"),
            "linenum",
            normalize_word("raw_line").alias("word"))
        .filter(F.col("word") != "")
    )
    occ = F.sort_array(F.collect_list(F.struct("filename", "linenum")))
    return words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.concat_ws(
            ", ",
            F.transform(occ, lambda o: F.format_string(
                "(%s: %s)", o["filename"], o["linenum"])),
        ).alias("occurrences"),
    )


def streaming_reference_index(spark: SparkSession, corpus: str) -> DataFrame:
    """Unbounded variant: the index over every file that has arrived
    under ``corpus`` so far, one file per micro-batch."""
    wordline_datasource.register(spark)
    return _index_over(spark.readStream.format("wordline").load(corpus))


def batch_reference_index(spark: SparkSession, corpus: str) -> DataFrame:
    """The identical logical plan on the batch reader — the parity
    oracle for the streaming variant."""
    wordline_datasource.register(spark)
    return _index_over(spark.read.format("wordline").load(corpus))
