"""Iterative algorithms — the class the driver contract exempts from
SQL oracles ('genuinely non-SQL-expressible ops … iterative
algorithms'); correctness is pinned by unit tests instead
(tests/test_rows_only.py).

``pagerank_word_graph``: power-iteration PageRank over the word
co-occurrence graph (nodes = words, edges = bigram adjacency from
``documents``). The Spark-idiomatic iteration shape:

- the edge list is computed ONCE and cached — every iteration joins
  against the same partitioned relation, so the per-iteration cost is
  one shuffle of the (small) rank vector, not a re-scan of the corpus;
- ranks are a DataFrame, never driver-side state (no collect in the
  loop — the 100 TB rule);
- lineage is TRUNCATED each iteration with ``localCheckpoint`` —
  without it the logical plan doubles per iteration and Catalyst
  planning time explodes exponentially (measured: 10 iterations
  un-checkpointed never finish planning). On a cluster, prefer
  ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
  fault-tolerant truncation; localCheckpoint trades that for speed.

Determinism: rank mass per word is a sum of float contributions whose
order varies run to run, so results are rounded to 10 dp — the unit
test asserts determinism at that precision plus the mass-conservation
invariant Σrank ≈ 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import dedup as dd

DAMPING = 0.85
ITERATIONS = 10
MAX_CC_ITERATIONS = 20


def pagerank_word_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → PageRank over the bigram co-occurrence graph."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(F.get(toks, i).alias("src"),
                           F.get(toks, i + 1).alias("dst")),
    )
    # directed edges with multiplicity = bigram frequency
    edges = (
        docs.select(F.explode(bigrams).alias("e"))
        .select("e.src", "e.dst")
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))
        .cache()
    )
    out_weight = edges.groupBy("src").agg(
        F.sum("weight").alias("out_w")).cache()
    nodes = (edges.select(F.col("src").alias("word"))
             .union(edges.select(F.col("dst").alias("word")))
             .distinct().cache())
    n_nodes = nodes.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(ITERATIONS):
        contribs = (
            edges.join(ranks, edges.src == ranks.word)
            .join(out_weight, "src")
            .select(F.col("dst").alias("word"),
                    (F.col("rank") * F.col("weight") / F.col("out_w"))
                    .alias("contrib"))
            .groupBy("word")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "word", "left")
            .select(
                "word",
                ((1 - DAMPING) / n_nodes
                 + DAMPING * F.coalesce("in_mass", F.lit(0.0))
                 ).alias("rank"),
            )
        )
        # dangling nodes (no outgoing edges) leak mass; redistribute it
        # uniformly so Σrank stays 1 — the standard correction, kept as
        # a DataFrame aggregation (no collect): total leaked = 1 - Σrank
        total = ranks.agg(F.sum("rank").alias("s"))
        ranks = ranks.crossJoin(F.broadcast(total)).select(
            "word",
            (F.col("rank") + (1 - F.col("s")) / n_nodes).alias("rank"))
        # truncate lineage: one materialization per iteration
        ranks = ranks.localCheckpoint(eager=True)

    return ranks.select("word", F.round("rank", 10).alias("rank"))


def connected_components_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → duplicate-cluster id + canonical flag.

    Completes the fuzzy-dedup pipeline: the similarity join
    (``jaccard_similarity_join``) emits PAIRS, but a real dedup pass
    must transitively close them — if A≈B and B≈C, one of {A,B,C}
    survives, even when A and C are not directly similar. Clustering is
    Hash-Min label propagation (the MapReduce-era connected-components
    algorithm; see Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14): every node starts labeled with its own id
    and repeatedly takes the min label over its neighborhood until
    fixpoint.

    Scale notes (100 TB):
    - convergence needs O(graph diameter) rounds; near-dup clusters are
      shallow (diameter ≤ a few hops), so the loop exits after 2-4
      rounds in practice — ``MAX_CC_ITERATIONS`` is a runaway bound,
      not the expected count. For adversarially long chain graphs,
      swap the body for large-star/small-star (same paper) — same
      DataFrame shape, logarithmic rounds.
    - the convergence test is a scalar aggregate (Σlabels, which is
      monotonically non-increasing and integer, so equality == exact
      fixpoint) — one tiny action per round, never a data collect.
    - lineage is truncated per round with ``localCheckpoint`` (same
      rationale as ``pagerank_word_graph``).

    Unlike PageRank this IS oracle-checkable: min-label-at-fixpoint is
    expressible as a DuckDB recursive CTE (``CONNECTED_COMPONENTS_SQL``)
    — the iterative DataFrame loop and the recursive SQL must agree
    exactly, which pins the transitive-closure semantics.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dd.jaccard_similarity_join(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"),
                         F.col("doc_a").alias("dst")))
        .cache()
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    for _ in range(MAX_CC_ITERATIONS):
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
            .withColumnRenamed("src", "doc_id")
        )
        labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select("doc_id",
                    F.least("cluster_id",
                            F.coalesce("nbr_min", F.col("cluster_id")))
                    .alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(
        "doc_id", "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"))


CONNECTED_COMPONENTS_SQL = f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({dd.JACCARD_JOIN_SQL})),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
reach(id, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS doc_id, min(r) AS cluster_id, id = min(r) AS is_canonical
FROM reach GROUP BY id
"""
