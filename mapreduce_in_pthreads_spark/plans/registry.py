"""Query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and by the local oracle-parity
tests.

Every implemented operator from SURVEY.md §2 appears here as a named
``Query``: a ``(spark, sf_dir) -> DataFrame`` callable plus, where the
semantics are ANSI-SQL-expressible, the DuckDB oracle twin the driver
runs side-by-side at sf=0.01. ``oracle=None`` marks the genuinely
non-SQL ops (approximate sketches, ML-backed similarity) → the driver
records the weaker rows-only check.

Column-name contract: the driver sorts columns by NAME before hashing,
so every computed column is aliased identically in the Spark callable
and the SQL twin.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators import inverted_index as ii

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    oracle: Optional[str]
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, fn: QueryFn, oracle: Optional[str], doc: str = "") -> None:
    if name in REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc)


# --- flagship + derived (reference parity: mapreduce.c R1-R11) ----------
register("inverted_index", ii.inverted_index, ii.INVERTED_INDEX_SQL,
         "reference flagship: word → canonical posting string")
register("word_count", ii.word_count, ii.WORD_COUNT_SQL,
         "derived: word → occurrence count (map-side combinable)")
register("doc_frequency", ii.doc_frequency, ii.DOC_FREQUENCY_SQL,
         "derived: word → distinct containing docs")
register("corpus_stats", ii.corpus_stats, ii.CORPUS_STATS_SQL,
         "derived: corpus invariants (occurrences/words/docs)")
register("index_top_docs", ii.index_top_docs, ii.INDEX_TOP_DOCS_SQL,
         "scale-capped index: bounded top-k postings per word")
