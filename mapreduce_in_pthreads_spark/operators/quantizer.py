"""Trained coarse quantizer for IVF similarity search (SURVEY.md §2.3
'Vector similarity search' — the scale path's missing piece).

``ann_ivf_topk`` (operators/similarity.py) prunes candidates by the
``label`` column standing in for a trained quantizer. This module
trains the REAL thing: Lloyd-iteration k-means over the embeddings,
expressed Spark-first — assignment is a broadcast-centroids map-side
expression, the re-estimation is one combinable aggregation per
iteration, and the only driver traffic is K×(D+1) scalars per
iteration (the same bounded-scalar-collect contract as
operators/iterative.py's convergence checks).

Cross-engine exactness design: k-means over raw float embeddings is
NOT oracle-checkable — per-dimension float means are summation-order-
dependent, and decimal casts of arbitrary doubles tie-break differently
across engines (functions/numeric.py ``money`` docstring; the reason
``label_centroid_norms`` is rows-only). So the quantizer trains over
the INT8-QUANTIZED codes (the ``embedding_quantize_int8`` formula, the
same move ``ann_lsh_topk`` makes): integer sums are associative ⇒
order-independent ⇒ bit-identical in any engine, centroid means are
exact-int-over-int double divisions, and per-row distance folds run in
one defined order on both sides. That is also the production shape —
FAISS-style pipelines quantize first and train/search on codes.

Reference anchor: the reference engine has no vector surface at all
(SURVEY.md §2.1); this extends the north-star ANN family mandated by
BASELINE.json.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from ..sources.tables import load_table

KM_K = 8        # coarse cells
KM_ITERS = 3    # Lloyd iterations
KM_D = 64       # embedding dims
N_QUERIES = 10  # vec_id < 10 serve as the query set (same as similarity.py)
TOP_K = 10

_CODES_SQL = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
    "(CAST(127.0 AS DOUBLE) / CAST(list_max(list_transform(embedding, "
    "y -> abs(y))) AS DOUBLE))) AS BIGINT))")


def _coded(emb: DataFrame) -> DataFrame:
    """vec_id, embedding, int64 codes (embedding_quantize_int8 formula
    — Spark round() and DuckDB round() agree on doubles, proven by that
    entry's green oracle)."""
    absmax = F.array_max(F.transform("embedding", F.abs))
    scale = F.lit(127.0) / absmax
    codes = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * scale)
        .cast("long"))
    return emb.select("vec_id", "embedding", codes.alias("codes"))


def _dist(centroid: list[float]) -> F.Column:
    """Squared L2 distance codes↔centroid as a sequential fold —
    (0.0+t1)+t2+… matches DuckDB's list_reduce (t1+t2)+… exactly
    (adding 0.0 to a finite double is the identity)."""
    cent = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(F.col("codes").cast("array<double>"), cent,
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def _assign(coded: DataFrame,
            centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment: broadcast the K×D centroid matrix
    as literals, argmin via array_min over (dist, cell) structs —
    struct comparison tie-breaks on cell exactly like the oracle's
    ORDER BY dist, cell."""
    scores = F.array(*[
        F.struct(_dist(c).alias("dist"), F.lit(int(cell)).alias("cell"))
        for cell, c in centroids
    ])
    return coded.withColumn("cell", F.array_min(scores)["cell"])


def _train(spark: SparkSession, sf_dir: str):
    """Returns (coded, cents_prev, cents_final, last_counts): the coded
    relation, the centroids that produced the final assignment, the
    final re-estimated centroids, and the final per-cell counts."""
    emb = load_table(spark, sf_dir, "embeddings")
    coded = _coded(emb)
    seeds = (
        coded.withColumn(
            "r", F.md5(F.col("vec_id").cast("string").cast("binary")))
        .orderBy("r", "vec_id").limit(KM_K).select("codes").collect())
    cents = [(i, [float(v) for v in row.codes])
             for i, row in enumerate(seeds)]
    cents_prev = cents
    counts: dict[int, int] = {}
    for _ in range(KM_ITERS):
        cents_prev = cents
        stats = (
            _assign(coded, cents).groupBy("cell").agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at(F.col("codes"), d + 1)).alias(f"s{d}")
                  for d in range(KM_D)])
        ).collect()  # K rows × (D+1) scalars — bounded driver traffic
        # int/int division in Python is the correctly-rounded double of
        # the exact quotient == SQL CAST(sum AS DOUBLE)/n (sum < 2^53)
        cents = sorted(
            (int(r["cell"]), [r[f"s{d}"] / r["n"] for d in range(KM_D)])
            for r in stats)
        counts = {int(r["cell"]): int(r["n"]) for r in stats}
    return coded, cents_prev, cents, counts


def kmeans_quantizer_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means coarse-quantizer training summary: one row per surviving
    cell with its member count (final assignment) and the L2 norm of
    its re-estimated centroid. Cells that lose every member drop out
    (deterministically, in both engines)."""
    coded, cents_prev, cents_final, _ = _train(spark, sf_dir)
    norm_entries = []
    for cell, c in cents_final:
        acc = 0.0
        for m in c:  # same left-to-right fold as the oracle's list_reduce
            acc += m * m
        norm_entries += [F.lit(int(cell)), F.lit(math.sqrt(acc))]
    norm_map = F.create_map(*norm_entries)
    return (
        _assign(coded, cents_prev)
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
        .select(F.col("cell").cast("bigint").alias("cell"), "n_vecs",
                norm_map[F.col("cell")].alias("centroid_l2"))
    )


def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over the TRAINED quantizer: index assignment uses the
    final k-means centroids (not the ``label`` stand-in), each query
    probes only its own cell, and the exact cosine verify runs on the
    full-precision embeddings for candidates only — train-on-codes,
    verify-on-floats, the production IVF recipe end to end. Recall < 1
    by design (single-probe)."""
    coded, _, cents_final, _ = _train(spark, sf_dir)
    assigned = _assign(coded, cents_final).withColumn(
        "nrm", l2_norm("embedding"))
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
        F.col("cell").alias("query_cell"),
        F.col("nrm").alias("query_nrm"))
    scored = (
        assigned.join(F.broadcast(q),
                      assigned.cell == q.query_cell)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", dot("embedding", "query_emb")
                    / (F.col("nrm") * F.col("query_nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


_DIST_SQL = ("list_reduce(list_transform(range(1, {d1}), i -> "
             "(CAST(v.codes[i] AS DOUBLE) - t.c[i]) * "
             "(CAST(v.codes[i] AS DOUBLE) - t.c[i])), "
             "(a, b) -> a + b)").format(d1=KM_D + 1)


def _assign_cte(name: str, cents: str) -> str:
    """One nearest-centroid assignment block (argmin via row_number
    ORDER BY dist, cell — the tie-break _assign() encodes in its
    struct comparison)."""
    return f"""
{name} AS (
    SELECT vec_id, codes, cell FROM (
        SELECT v.vec_id, v.codes, t.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_DIST_SQL}, t.cell) AS rn
        FROM coded v CROSS JOIN {cents} t
    ) WHERE rn = 1
)"""


SAMPLE_PER_CELL = 20


def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware subsampling: keep at most ``SAMPLE_PER_CELL``
    vectors per trained cluster, in deterministic md5 pseudo-random
    order — the curation primitive that rebalances a training corpus
    across embedding clusters (the cluster-space analogue of
    ``deterministic_sample_per_lang``'s language strata; near-duplicate
    heavy clusters stop dominating the mix). One window over one
    shuffle after the map-side cell assignment; exact stratum sizes,
    reproducible across engines and releases."""
    coded, _, cents_final, _ = _train(spark, sf_dir)
    assigned = _assign(coded, cents_final)
    rnd = F.md5(F.col("vec_id").cast("string").cast("binary"))
    w = Window.partitionBy("cell").orderBy(rnd, "vec_id")
    return (
        assigned.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= SAMPLE_PER_CELL)
        .select(F.col("cell").cast("bigint").alias("cell"),
                "vec_id", "rnk")
    )


def _iteration_ctes() -> str:
    blocks = []
    for it in range(1, KM_ITERS + 1):
        blocks.append(_assign_cte(f"a{it}", f"cents{it - 1}") + f""",
cents{it} AS (
    SELECT cell, list(m ORDER BY d) AS c FROM (
        SELECT cell, d, CAST(sum(codes[d]) AS DOUBLE) / count(*) AS m
        FROM a{it} CROSS JOIN range(1, {KM_D + 1}) t(d)
        GROUP BY cell, d
    ) GROUP BY cell
)""")
    return ",".join(blocks)


_PREFIX_SQL = f"""
WITH coded AS (
    SELECT vec_id, embedding, {_CODES_SQL} AS codes FROM embeddings
),
cents0 AS (
    SELECT rn - 1 AS cell, c FROM (
        SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                  vec_id) AS rn,
               list_transform(codes, x -> CAST(x AS DOUBLE)) AS c
        FROM coded
    ) WHERE rn <= {KM_K}
),{_iteration_ctes()}
"""

KMEANS_CELLS_SQL = f"""{_PREFIX_SQL}
SELECT CAST(a.cell AS BIGINT) AS cell, count(*) AS n_vecs,
       any_value(sqrt(list_reduce(list_transform(t.c, m -> m * m),
                                  (x, y) -> x + y))) AS centroid_l2
FROM a{KM_ITERS} a JOIN cents{KM_ITERS} t ON a.cell = t.cell
GROUP BY a.cell
"""

CLUSTER_SAMPLE_SQL = f"""{_PREFIX_SQL},{_assign_cte("afinal",
                                                    f"cents{KM_ITERS}")}
SELECT CAST(cell AS BIGINT) AS cell, vec_id, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY cell
                              ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                       vec_id) AS rnk
    FROM afinal
) WHERE rnk <= {SAMPLE_PER_CELL}
"""

ANN_IVF_TRAINED_SQL = f"""{_PREFIX_SQL},{_assign_cte("afinal",
                                                     f"cents{KM_ITERS}")},
vecs AS (
    SELECT c.vec_id, a.cell, CAST(c.embedding AS DOUBLE[]) AS e
    FROM coded c JOIN afinal a ON c.vec_id = a.vec_id
),
q AS (
    SELECT vec_id AS query_id, cell AS query_cell, e AS query_emb
    FROM vecs WHERE vec_id < {N_QUERIES}
),
scored AS (
    SELECT q.query_id, v.vec_id,
           list_cosine_similarity(v.e, q.query_emb) AS cos_sim
    FROM vecs v JOIN q ON v.cell = q.query_cell
    WHERE v.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos_sim, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
) WHERE rank <= {TOP_K}
"""