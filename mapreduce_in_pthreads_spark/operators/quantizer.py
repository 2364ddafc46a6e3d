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
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import truncate_lineage
from ..functions.vectors import dot, l2_norm
from ..sources.tables import load_embeddings_parallel, load_table

# Coarse-cell count scales with the corpus: K = clamp(n // KM_TARGET_CELL,
# KM_K_MIN, KM_K_MAX). A FIXED K is the one measured super-linear scaling
# trap in this fleet (round-9 scale probe: Σ|cell|² pair work inside
# semdedup_prune / label_knn_agreement grew ~quadratically when cells were
# not re-trained as n grew — 41.8× / 61× under 10× data). With |cell| held
# near KM_TARGET_CELL, within-cell pair stages do Σ|cell|² ≈ n·target work
# — linear in n. The count is exact and deterministic, so the DuckDB twins
# derive the SAME K from `count(*) // KM_TARGET_CELL` (Python `//` and
# DuckDB `//` agree on non-negative integers) and stay bit-identical.
# KM_K_MAX bounds the broadcast-literal centroid matrix in the plan; past
# it (n > 64k vectors here) the production move is a two-level (coarse ×
# residual) quantizer, not a bigger flat codebook.
KM_K_MIN = 8         # floor = the original fixed K (sf<=0.01 unchanged)
KM_K_MAX = 512       # plan-size guard for the centroid literal matrix
KM_TARGET_CELL = 125  # aim |cell| ~= 125 so pair stages stay ~n*target
KM_ITERS = 3    # Lloyd iterations
KM_D = 64       # embedding dims
N_QUERIES = 10  # vec_id < 10 serve as the query set (same as similarity.py)
TOP_K = 10

_CODES_SQL = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
    "(CAST(127.0 AS DOUBLE) / CAST(list_max(list_transform(embedding, "
    "y -> abs(y))) AS DOUBLE))) AS BIGINT))")


def km_k(n: int) -> int:
    """Corpus-proportional coarse-cell count (see the KM_K_MIN block
    comment). Mirrored verbatim by the oracle's scalar subquery."""
    return max(KM_K_MIN, min(KM_K_MAX, n // KM_TARGET_CELL))


def _coded(emb: DataFrame) -> DataFrame:
    """vec_id, embedding, int64 codes (embedding_quantize_int8 formula
    — Spark round() and DuckDB round() agree on doubles, proven by that
    entry's green oracle).

    The relation is round-robin repartitioned to the session's
    parallelism BEFORE the compute-heavy per-row stages: every
    downstream consumer evaluates a K×D distance fold per row (the
    nearest-centroid assignment — interpreted, higher-order functions
    don't enter codegen), so inheriting the scan's file-split layout
    (a single-file embeddings table = 1-2 partitions regardless of
    core count) serializes exactly the stage K ∝ n makes heavier. The
    same hazard class as round 9's RDD 2-partition reduce; measured on
    the 10× probe. The shuffle moves vec-count rows of ~300 B — bytes-
    trivial — and every result is order-independent (per-row maps into
    keyed aggregations/windows)."""
    absmax = F.array_max(F.transform("embedding", F.abs))
    scale = F.lit(127.0) / absmax
    codes = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * scale)
        .cast("long"))
    par = emb.sparkSession.sparkContext.defaultParallelism
    return (emb.repartition(par)
            .select("vec_id", "embedding", codes.alias("codes")))


def _dist(centroid: list[float]) -> F.Column:
    """Squared L2 distance codes↔centroid as a sequential fold —
    (0.0+t1)+t2+… matches DuckDB's list_reduce (t1+t2)+… exactly
    (adding 0.0 to a finite double is the identity)."""
    cent = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(F.col("codes").cast("array<double>"), cent,
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def _score_array(centroids: list[tuple[int, list[float]]]) -> F.Column:
    """array<struct<dist,cell>> of code↔centroid distances, built as
    TWO constant-foldable literal arrays (cell ids, K×D matrix) and ONE
    shared fold lambda over the centroid index — instead of K inlined
    copies of the 64-literal fold expression. Same float semantics (the
    per-centroid sequential ``_dist`` fold, struct tie-break on cell);
    ~K× smaller plan tree, which matters now that K scales with the
    corpus (at K=160 the inlined form pushed Catalyst analysis + codegen
    into minutes per job — measured on the 10× probe)."""
    cells = F.array(*[F.lit(int(cell)) for cell, _ in centroids])
    matrix = F.array(*[
        F.array(*[F.lit(float(v)) for v in c]) for _, c in centroids])
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    return F.transform(idx, lambda i: F.struct(
        F.aggregate(
            F.zip_with(F.col("codes").cast("array<double>"),
                       F.element_at(matrix, i + F.lit(1)),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x).alias("dist"),
        F.element_at(cells, i + F.lit(1)).alias("cell")))


# Kernel gate for the nearest-centroid assignment. Up to this many
# cells the assignment is a pure JVM expression (zero Python in the
# plan — the committed SFs all train K ≤ 16, so every budget-pinned
# plan stays on this path). Beyond it the K×D distance work is dense
# linear algebra that Spark's expression layer executes INTERPRETED
# (higher-order lambdas never enter codegen: measured ~ms/row at
# K=160 = minutes per pass at 20k rows; the lambda-free expansion
# instead breaks janino's 64 KB method limit), so large K switches to
# a vectorized Arrow kernel — the same adaptive-kernel move as
# `embedding_near_dup`'s exact-vs-blocked gate, and the production
# answer (FAISS assignment is a BLAS kernel, not a relational op).
# Bit-exactness across the gate is guaranteed by construction — the
# kernel accumulates dimension-sequentially, replaying the fold's
# (((0+t1)+t2)+…) IEEE order — and pinned by
# tests/test_quantizer.py::test_arrow_assignment_matches_expression.
KM_EXPR_MAX_K = 32


def _assign_arrow(coded: DataFrame,
                  centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Vectorized Arrow twin of the expression assignment: per batch,
    accumulate squared-distance terms dimension-by-dimension (the exact
    float-op sequence of the ``_dist`` fold, vectorized across rows ×
    cells), then argmin — numpy's first-minimum tie-break equals the
    oracle's ORDER BY dist, cell because ``centroids`` is sorted by
    cell id."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    cells = [int(c) for c, _ in centroids]
    assert cells == sorted(cells), "tie-break needs cell-sorted centroids"
    matrix = [[float(v) for v in c] for _, c in centroids]
    # copy — StructType.add MUTATES the DataFrame's cached schema object
    schema = StructType(list(coded.schema.fields)
                        + [StructField("cell", IntegerType())])

    def batches(it):
        import numpy as _np

        C = _np.asarray(matrix, dtype="float64")          # K×D
        cl = _np.asarray(cells, dtype="int64")
        for pdf in it:
            if not len(pdf):
                continue
            E = _np.asarray([_np.asarray(x, dtype="float64")
                             for x in pdf["codes"]])      # b×D
            acc = _np.zeros((len(E), len(cl)))
            for k in range(C.shape[1]):
                d = E[:, k, None] - C[None, :, k]
                acc += d * d  # same (((0+t1)+t2)+…) order as the fold
            pdf = pdf.copy()
            pdf["cell"] = cl[acc.argmin(axis=1)].astype("int32")
            yield pdf

    return coded.mapInPandas(batches, schema)


def _assign(coded: DataFrame,
            centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment: broadcast the K×D centroid matrix
    as literals, argmin via array_min over (dist, cell) structs —
    struct comparison tie-breaks on cell exactly like the oracle's
    ORDER BY dist, cell. Above ``KM_EXPR_MAX_K`` cells the same math
    runs in the vectorized Arrow kernel (see the gate comment). A
    product codebook (``_ProductCents``, the past-the-K-cap regime)
    assigns per half — O(K_h), not O(K_h²)."""
    if isinstance(centroids, _ProductCents):
        return _assign_imi(coded, centroids)
    if len(centroids) <= KM_EXPR_MAX_K:
        return coded.withColumn(
            "cell", F.array_min(_score_array(centroids))["cell"])
    return _assign_arrow(coded, centroids)


# --- two-level (product / IMI) codebook past the flat-K cap ---------------
# The flat codebook stops scaling at KM_K_MAX cells: past
# n > KM_K_MAX * KM_TARGET_CELL vectors the clamp makes |cell| grow
# ∝ n again, so Σ|cell|² pair work inside the 14 quantizer-backed
# entries re-enters the quadratic regime the K ∝ n rule exists to
# prevent — and an UNCAPPED flat K would instead make training itself
# quadratic (KM_ITERS passes of n·K·D distance work with K ∝ n).
# The production answer (Babenko & Lempitsky, "The Inverted
# Multi-Index", CVPR 2012) is a PRODUCT codebook: train TWO
# independent K_h-means over the two 32-dim halves of the code
# vector; a cell is a PAIR (a, b) of half-cells, giving
# K_total = K_h² cells for 2·K_h half-distance evaluations per row.
# With K_h = ceil(sqrt(n / target)), K_total keeps tracking n
# (|cell| ≈ target, Σ|cell|² ≈ n·target) while per-row assignment
# work and per-half training grow only ∝ sqrt(n).
#
# The gate is INERT at every committed SF (n ≤ ~2k ≪ 64k): every
# adjudicated output and oracle is byte-identical to the flat path.
# Past the gate the oracle twins (which replay the FLAT trainer with
# the same clamp) are not adjudicated — synthetic-scale probes are
# perf evidence, not correctness inputs (tools/scale_probe.py
# discipline, same as embedding_near_dup's blocked path).
KM_IMI_MIN_N = KM_K_MAX * KM_TARGET_CELL  # 64 000 vectors
KM_HALF_D = KM_D // 2


def imi_kh(n: int) -> int:
    """Per-half cell count: the smallest K_h with K_h² ≥ n / target,
    clamped to the same [KM_K_MIN, KM_K_MAX] band as km_k — so the
    product cell count K_h² tracks n / KM_TARGET_CELL from 64k up to
    ~33G vectors before the next (third) level would be needed."""
    want = max(1, n // KM_TARGET_CELL)
    return max(KM_K_MIN, min(KM_K_MAX, math.isqrt(want - 1) + 1))


class _ProductCents(list):
    """Flat ``[(cell, concat-centroid)]`` view of an IMI product
    codebook — iteration/len behave exactly like the flat list
    (OCCUPIED product cells only, cell-sorted), so list-reading
    consumers (norm maps, probe ranking) work unchanged. ``halves``
    carries the per-half centroid lists ``_assign``/``_silhouette``
    need for the O(K_h) product kernels; ``stride`` maps a half-cell
    pair to the flat id: cell = a * stride + b."""

    def __init__(self, flat, halves, stride):
        super().__init__(flat)
        self.halves = halves
        self.stride = stride


def _half_dist_matrix(E, M):
    """b×K_h squared-distance matrix accumulated dimension-
    sequentially — the same (((0+t1)+t2)+…) IEEE order as the
    ``_dist`` fold and ``_assign_arrow``, applied per half."""
    import numpy as _np

    acc = _np.zeros((E.shape[0], M.shape[0]))
    for k in range(M.shape[1]):
        d = E[:, k, None] - M[None, :, k]
        acc += d * d
    return acc


def _assign_imi(coded: DataFrame, pc: "_ProductCents") -> DataFrame:
    """Product assignment: per-half argmin over the two 32-dim slices
    (numpy first-minimum tie-break = lowest half-cell id, the
    ``_assign_arrow`` convention per half), flat id a*stride + b."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    (h1, h2), stride = pc.halves, pc.stride
    c1 = [int(c) for c, _ in h1]
    c2 = [int(c) for c, _ in h2]
    assert c1 == sorted(c1) and c2 == sorted(c2), \
        "tie-break needs cell-sorted half centroids"
    m1 = [[float(v) for v in c] for _, c in h1]
    m2 = [[float(v) for v in c] for _, c in h2]
    schema = StructType(list(coded.schema.fields)
                        + [StructField("cell", IntegerType())])

    def batches(it):
        import numpy as _np

        C1 = _np.asarray(m1, dtype="float64")
        C2 = _np.asarray(m2, dtype="float64")
        l1 = _np.asarray(c1, dtype="int64")
        l2 = _np.asarray(c2, dtype="int64")
        for pdf in it:
            if not len(pdf):
                continue
            E = _np.asarray([_np.asarray(x, dtype="float64")
                             for x in pdf["codes"]])
            a = _half_dist_matrix(E[:, :KM_HALF_D], C1).argmin(axis=1)
            b = _half_dist_matrix(E[:, KM_HALF_D:], C2).argmin(axis=1)
            pdf = pdf.copy()
            pdf["cell"] = (l1[a] * stride + l2[b]).astype("int32")
            yield pdf

    return coded.mapInPandas(batches, schema)


def _silhouette_imi(coded: DataFrame, pc: "_ProductCents") -> DataFrame:
    """Product twin of ``_silhouette_arrow``: da² = d1[a*] + d2[b*];
    db² = nearest OTHER product cell = min(s1 + m2, m1 + s2) with
    m/s the best/second-best per-half distances — changing BOTH
    halves gives s1 + s2 ≥ either option, so the two single-half
    swaps cover the true second minimum over the full product."""
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType)

    (h1, h2), stride = pc.halves, pc.stride
    c1 = [int(c) for c, _ in h1]
    c2 = [int(c) for c, _ in h2]
    assert c1 == sorted(c1) and c2 == sorted(c2)
    assert len(c1) >= 2 and len(c2) >= 2, \
        "product silhouette needs >=2 surviving cells per half"
    m1 = [[float(v) for v in c] for _, c in h1]
    m2 = [[float(v) for v in c] for _, c in h2]
    schema = StructType(list(coded.schema.fields)
                        + [StructField("own", IntegerType()),
                           StructField("da", DoubleType()),
                           StructField("db", DoubleType())])

    def batches(it):
        import numpy as _np

        C1 = _np.asarray(m1, dtype="float64")
        C2 = _np.asarray(m2, dtype="float64")
        l1 = _np.asarray(c1, dtype="int64")
        l2 = _np.asarray(c2, dtype="int64")
        for pdf in it:
            if not len(pdf):
                continue
            E = _np.asarray([_np.asarray(x, dtype="float64")
                             for x in pdf["codes"]])
            d1 = _half_dist_matrix(E[:, :KM_HALF_D], C1)
            d2 = _half_dist_matrix(E[:, KM_HALF_D:], C2)
            rows = _np.arange(len(E))
            a = d1.argmin(axis=1)
            b = d2.argmin(axis=1)
            m1v = d1[rows, a]
            m2v = d2[rows, b]
            d1[rows, a] = _np.inf
            d2[rows, b] = _np.inf
            s1v = d1.min(axis=1)
            s2v = d2.min(axis=1)
            pdf = pdf.copy()
            pdf["own"] = (l1[a] * stride + l2[b]).astype("int32")
            pdf["da"] = _np.sqrt(m1v + m2v)
            pdf["db"] = _np.sqrt(_np.minimum(s1v + m2v, m1v + s2v))
            yield pdf

    return coded.mapInPandas(batches, schema)


def _imi_probe_rows(coded: DataFrame, pc: "_ProductCents"):
    """(query_id, probe_cell) pairs: per query vector, the NPROBE
    nearest OCCUPIED product cells by the flat concat-centroid
    distance (dim-sequential fold over the full 64 dims via the two
    half matrices), tie-broken by cell id — the product analogue of
    the expression path's array_sort over (dist, cell) structs.
    Driver-side over the ≤ N_QUERIES collected query code rows."""
    import numpy as np

    qrows = (coded.filter(F.col("vec_id") < N_QUERIES)
             .select("vec_id", "codes").collect())
    cells = np.asarray([c for c, _ in pc], dtype="int64")
    M = np.asarray([v for _, v in pc], dtype="float64")
    out = []
    for r in sorted(qrows, key=lambda r: r.vec_id):
        E = np.asarray([r.codes], dtype="float64")
        d = _half_dist_matrix(E, M)[0]  # full-D fold: same math, D=64
        order = sorted(range(len(cells)), key=lambda i: (d[i], cells[i]))
        for i in order[:NPROBE]:
            out.append((int(r.vec_id), int(cells[i])))
    return out


def _lloyd_half(coded: DataFrame, kh: int, lo: int):
    """KM_ITERS Lloyd iterations over one 32-dim slice of the codes —
    the flat trainer's loop verbatim, on half codes. Returns
    (prev, final) half-centroid lists [(idx, vec)], idx from the
    md5-ordered seed enumeration, survivors only, idx-sorted."""
    half = coded.select(
        "vec_id", F.slice("codes", lo + 1, KM_HALF_D).alias("codes"))
    seeds = (
        half.withColumn(
            "r", F.md5(F.col("vec_id").cast("string").cast("binary")))
        .orderBy("r", "vec_id").limit(kh).select("codes").collect())
    cents = [(i, [float(v) for v in row.codes])
             for i, row in enumerate(seeds)]
    prev = cents
    for _ in range(KM_ITERS):
        prev = cents
        stats = (
            _assign(half, cents).groupBy("cell").agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at(F.col("codes"), d + 1)).alias(f"s{d}")
                  for d in range(KM_HALF_D)])
        ).collect()  # K_h rows × (D/2+1) scalars — bounded
        cents = sorted(
            (int(r["cell"]),
             [r[f"s{d}"] / r["n"] for d in range(KM_HALF_D)])
            for r in stats)
    return prev, cents


def _train_imi(coded: DataFrame, n: int):
    """Product-codebook training: two independent half Lloyd runs,
    then ONE occupancy pass (assignment by the prev halves — the same
    'centroids that produced the final assignment' convention as the
    flat trainer) shared by both flat views, so every cell a consumer
    aggregates exists in both lists (the flat path's guarantee).
    Returns (cents_prev, cents_final, counts) with the cents as
    ``_ProductCents``."""
    kh = imi_kh(n)
    h1_prev, h1_final = _lloyd_half(coded, kh, 0)
    h2_prev, h2_final = _lloyd_half(coded, kh, KM_HALF_D)
    stride = kh
    occ = (_assign_imi(coded, _ProductCents([], (h1_prev, h2_prev), stride))
           .groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
           .collect())  # ≤ min(n, K_h²) rows of 2 ints — bounded
    occupied = sorted(int(r["cell"]) for r in occ)
    counts = {int(r["cell"]): int(r["n"]) for r in occ}

    def view(halves):
        d1, d2 = dict(halves[0]), dict(halves[1])
        flat = [(cell, d1[cell // stride] + d2[cell % stride])
                for cell in occupied]
        return _ProductCents(flat, halves, stride)

    return (view((h1_prev, h2_prev)), view((h1_final, h2_final)), counts)


def _silhouette_arrow(coded: DataFrame,
                      centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Large-K Arrow twin of the silhouette distance columns: own cell
    (argmin, same tie-break as ``_assign_arrow``), da = sqrt(dist to
    own centroid), db = sqrt(nearest OTHER centroid) — same
    dimension-sequential accumulation, np.sqrt is the same IEEE-
    correctly-rounded sqrt as F.sqrt."""
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType)

    cells = [int(c) for c, _ in centroids]
    assert cells == sorted(cells), "tie-break needs cell-sorted centroids"
    matrix = [[float(v) for v in c] for _, c in centroids]
    schema = StructType(list(coded.schema.fields)
                        + [StructField("own", IntegerType()),
                           StructField("da", DoubleType()),
                           StructField("db", DoubleType())])

    def batches(it):
        import numpy as _np

        C = _np.asarray(matrix, dtype="float64")
        cl = _np.asarray(cells, dtype="int64")
        for pdf in it:
            if not len(pdf):
                continue
            E = _np.asarray([_np.asarray(x, dtype="float64")
                             for x in pdf["codes"]])
            acc = _np.zeros((len(E), len(cl)))
            for k in range(C.shape[1]):
                d = E[:, k, None] - C[None, :, k]
                acc += d * d
            idx = acc.argmin(axis=1)
            rows = _np.arange(len(E))
            da2 = acc[rows, idx]
            acc[rows, idx] = _np.inf  # db = nearest OTHER centroid
            db2 = acc.min(axis=1)
            pdf = pdf.copy()
            pdf["own"] = cl[idx].astype("int32")
            pdf["da"] = _np.sqrt(da2)
            pdf["db"] = _np.sqrt(db2)
            yield pdf

    return coded.mapInPandas(batches, schema)


# Trained-artifact memo (a tiny in-process model registry): training
# is DETERMINISTIC per sf_dir (md5-seeded, integer Lloyd updates), and
# ~9 registry entries consume the same trained centroids — without the
# memo each entry re-runs the seed + per-iteration driver collects.
# Only plain-Python centroid/count data is cached (a few KB); the
# ``coded`` DataFrame is rebuilt per call because DataFrames are bound
# to the session that created them.
_TRAIN_MEMO: dict = {}


def _data_fingerprint(sf_dir: str) -> tuple:
    """Cheap invalidation token folded into every memo key: max
    mtime_ns + total byte size over the embeddings parquet path (file
    or directory-of-parts). Rewriting the data under a long-lived
    process (fixture regeneration, a notebook session) changes the
    fingerprint, so later registry entries retrain instead of silently
    consuming stale centroids (r5 ADVICE)."""
    p = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    paths = ([os.path.join(p, f) for f in sorted(os.listdir(p))]
             if os.path.isdir(p) else [p])
    stats = [os.stat(x) for x in paths if os.path.exists(x)]
    return (max((s.st_mtime_ns for s in stats), default=0),
            sum(s.st_size for s in stats))


def _train(spark: SparkSession, sf_dir: str):
    """Returns (coded, cents_prev, cents_final, last_counts): the coded
    relation, the centroids that produced the final assignment, the
    final re-estimated centroids, and the final per-cell counts."""
    key = ("km", os.path.abspath(sf_dir), _data_fingerprint(sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    coded = _coded(emb)
    if key in _TRAIN_MEMO:
        cents_prev, cents, counts = _TRAIN_MEMO[key]
        return coded, cents_prev, cents, counts
    # K scales with the corpus (one exact metadata-cheap count, memoized
    # with the trained centroids) — the round-9 probe's fixed-K fix.
    n = emb.count()
    if n > KM_IMI_MIN_N:  # past the flat-K cap: product codebook
        cents_prev, cents, counts = _train_imi(coded, n)
        _TRAIN_MEMO[key] = (cents_prev, cents, counts)
        return coded, cents_prev, cents, counts
    k = km_k(n)
    seeds = (
        coded.withColumn(
            "r", F.md5(F.col("vec_id").cast("string").cast("binary")))
        .orderBy("r", "vec_id").limit(k).select("codes").collect())
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
    _TRAIN_MEMO[key] = (cents_prev, cents, counts)
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
    ranked = _ivf_ranked(spark, sf_dir)
    return (ranked.filter(F.col("rank") <= TOP_K)
            .select("query_id", "vec_id", "cos_sim", "rank"))


def _ivf_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared IVF scoring: every same-cell candidate exact-cosine
    ranked per query (trained quantizer assignment, broadcast query
    set) — ``ann_ivf_trained_topk`` reads the head, the hard-negative
    miner reads the band behind it."""
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
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint"))


def hard_negatives_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per
    query, the candidates ranked JUST BEHIND the top-k — rank
    k+1 .. 2k by exact cosine among the query's own IVF cell — the
    near-misses that make informative negatives (random negatives are
    trivially separable; in-cell near-top ones are not). This is the
    standard retrieval-training companion of ``ann_ivf_trained_topk``:
    same trained quantizer, same scored relation (shared
    ``_ivf_ranked`` builder), one rank band over.

    Scale: identical plan to the IVF search — cell-pruned broadcast
    join + per-query window; the band filter changes WHICH rows
    survive, not what shuffles.
    """
    ranked = _ivf_ranked(spark, sf_dir)
    return (ranked
            .filter((F.col("rank") > TOP_K)
                    & (F.col("rank") <= 2 * TOP_K))
            .select("query_id", "vec_id", "cos_sim", "rank"))


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


# SemDeDup prune threshold. The synthetic corpus' cosine mass tops out
# near 0.5 (measured sf0.01: 14 pairs round to 0.5, 257 to 0.4), so the
# paper's 0.9+ "semantic duplicate" band would prune nothing here;
# 0.35 exercises the real decision surface — hundreds of in-cell pairs
# straddle it — while staying far from float-boundary ties.
SEMDEDUP_TAU = 0.35


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means cluster the embedding space, then inside
    each cluster mark every vector whose cosine similarity to a
    LOWER-id cluster-mate reaches ``SEMDEDUP_TAU`` as a duplicate —
    the keep-one-representative-per-ε-ball policy made deterministic
    by keeping the minimum vec_id. One row per vector:
    (vec_id, cell, pruned 0/1).

    This is the curation step the quantizer family exists to serve:
    ``cluster_balanced_sample`` rebalances cluster SIZES, SemDeDup
    removes REDUNDANCY inside each cluster — together they are the
    paper's recipe for pruning web-scale training corpora with
    negligible quality loss.

    Scale: the pairwise cosine runs ONLY within a cell (equi-join on
    the trained assignment — the same candidate-blocking shape as
    ``embedding_near_dup``'s scale path), so pair fan-out is
    Σ|cell|²/2, not n²/2; per-row norms are computed once per side
    below the join; the dup verdict is a distinct + left join on
    vec_id. At 100 TB the clustering bound is what makes SemDeDup
    tractable at all — that is the paper's own argument.

    Exactness: cell assignment is the integer-code k-means (module
    docstring); the cosine chain is bit-identical with DuckDB's
    ``list_cosine_similarity`` on DOUBLE[] (proven by
    ``ann_ivf_trained_topk``'s green oracle); τ sits between the
    attainable cosine values, never ON one.
    """
    coded, _, cents_final, _ = _train(spark, sf_dir)
    assigned = _assign(coded, cents_final).withColumn(
        "nrm", l2_norm("embedding"))
    a = assigned.select(F.col("vec_id").alias("vec_a"),
                        F.col("embedding").alias("ea"),
                        F.col("cell").alias("cell_a"),
                        F.col("nrm").alias("nrm_a"))
    b = assigned.select(F.col("vec_id").alias("vec_b"),
                        F.col("embedding").alias("eb"),
                        F.col("cell").alias("cell_b"),
                        F.col("nrm").alias("nrm_b"))
    dup = (
        a.join(b, (F.col("cell_a") == F.col("cell_b"))
               & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_sim",
                    dot("ea", "eb") / (F.col("nrm_a") * F.col("nrm_b")))
        .filter(F.col("cos_sim") >= SEMDEDUP_TAU)
        .select(F.col("vec_b").alias("vec_id")).distinct()
        .withColumn("is_dup", F.lit(1)))
    return (
        assigned.select("vec_id", F.col("cell").cast("bigint").alias("cell"))
        .join(dup, "vec_id", "left")
        .select("vec_id", "cell",
                F.coalesce(F.col("is_dup"), F.lit(0)).cast("bigint")
                .alias("pruned")))


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
    ) WHERE rn <= (SELECT greatest({KM_K_MIN},
                                   least({KM_K_MAX},
                                         count(*) // {KM_TARGET_CELL}))
                   FROM coded)
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

SEMDEDUP_SQL = f"""{_PREFIX_SQL},{_assign_cte("afinal",
                                              f"cents{KM_ITERS}")},
vecs AS (
    SELECT c.vec_id, a.cell, CAST(c.embedding AS DOUBLE[]) AS e
    FROM coded c JOIN afinal a ON c.vec_id = a.vec_id
),
dup AS (
    SELECT DISTINCT b.vec_id
    FROM vecs a JOIN vecs b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= {SEMDEDUP_TAU}
)
SELECT v.vec_id, CAST(v.cell AS BIGINT) AS cell,
       CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS pruned
FROM vecs v LEFT JOIN dup d ON v.vec_id = d.vec_id
"""

# Shared ranked-scored prefix: every trained-IVF SQL consumer appends
# ONLY its own final WHERE over `rank` — mirroring how the Spark side
# shares _ivf_ranked() — so editing the CTE tail can't silently
# produce malformed consumer SQL (r5 ADVICE: the old rsplit("WHERE
# rank") surgery broke loudly-never, wrongly-maybe).
_IVF_RANKED_SQL = f"""{_PREFIX_SQL},{_assign_cte("afinal",
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
) """

ANN_IVF_TRAINED_SQL = _IVF_RANKED_SQL + f"WHERE rank <= {TOP_K}\n"

HARD_NEGATIVES_SQL = (
    _IVF_RANKED_SQL
    + f"WHERE rank > {TOP_K} AND rank <= {2 * TOP_K}\n")

# --- product quantization + ADC search ----------------------------------

PQ_M = 8        # subspaces
PQ_SUB = 8      # dims per subspace (PQ_M * PQ_SUB == KM_D)
PQ_K = 16       # codebook size per subspace
PQ_ITERS = 2    # Lloyd iterations per subspace


def _dist_col(col: F.Column, centroid: list[float]) -> F.Column:
    """Squared L2 distance between an integer-code array column and a
    float centroid — same sequential fold contract as ``_dist``."""
    cent = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(col.cast("array<double>"), cent,
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def _pq_train(spark: SparkSession, sf_dir: str):
    """Train PQ_M independent PQ_K-centroid codebooks, one per
    PQ_SUB-dim slice of the int8 code vector. Returns (coded, cents)
    with cents[m] = [(cell, centroid)] sorted by cell.

    All PQ_M assignments + re-estimations run as ONE union job per
    iteration (one pass over the codes); driver traffic is
    M × K × (PQ_SUB + 1) scalars per iteration — the same
    bounded-collect contract as ``_train``. Integer sums keep every
    iteration bit-identical cross-engine (module docstring)."""
    key = ("pq", os.path.abspath(sf_dir), _data_fingerprint(sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    coded = _coded(emb)
    if key in _TRAIN_MEMO:
        return coded, _TRAIN_MEMO[key]
    seeds = (
        coded.withColumn(
            "r", F.md5(F.col("vec_id").cast("string").cast("binary")))
        .orderBy("r", "vec_id").limit(PQ_K).select("codes").collect())
    cents = {
        m: [(cell, [float(v)
                    for v in row.codes[m * PQ_SUB:(m + 1) * PQ_SUB]])
            for cell, row in enumerate(seeds)]
        for m in range(PQ_M)}
    for _ in range(PQ_ITERS):
        parts = []
        for m in range(PQ_M):
            sub = coded.select(
                "vec_id",
                F.slice("codes", m * PQ_SUB + 1, PQ_SUB).alias("sub"))
            scores = F.array(*[
                F.struct(_dist_col(F.col("sub"), c).alias("dist"),
                         F.lit(int(cell)).alias("cell"))
                for cell, c in cents[m]])
            parts.append(
                sub.withColumn("cell", F.array_min(scores)["cell"])
                .groupBy("cell").agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(F.element_at("sub", d + 1)).alias(f"s{d}")
                      for d in range(PQ_SUB)])
                .withColumn("m", F.lit(m)))
        stats = parts[0]
        for p in parts[1:]:
            stats = stats.unionByName(p)
        rows = stats.collect()
        cents = {
            m: sorted((int(r["cell"]),
                       [r[f"s{d}"] / r["n"] for d in range(PQ_SUB)])
                      for r in rows if r["m"] == m)
            for m in range(PQ_M)}
    _TRAIN_MEMO[key] = cents
    return coded, cents


def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) — the memory-side of the FAISS IVF-PQ recipe: every vector
    is stored as PQ_M codebook ids (8 bytes here vs 256 bytes of
    float32), queries stay uncompressed, and distance is the sum of
    per-subspace lookups into a query-specific table. Approximate by
    construction (quantization error), which is why the exact
    ``ann_topk_bruteforce`` stays the recall baseline.

    Scale design: codebooks are M×K×SUB scalars — literals in the
    plan; encoding is a per-row expression (no shuffle); the LUT
    relation is N_QUERIES rows broadcast to a map-side join; scoring
    is one fold over PQ_M map lookups per (vec, query); top-k is a
    bounded window. The corpus is scanned, never shuffled (the one
    window shuffles (query_id, vec, dist) tuples, not vectors).

    Exactness: LUT entries are computed driver-side with the same
    sequential IEEE fold DuckDB's list_reduce performs (0.0 + t1 ≡ t1;
    squares are never -0.0), centroid means are exact-int-over-int
    divisions, and the final ADC sum folds the PQ_M contributions in
    fixed subspace order — so the oracle hash-matches despite three
    layers of trained quantization."""
    from pyspark.sql import Window

    coded, cents = _pq_train(spark, sf_dir)
    enc = coded
    for m in range(PQ_M):
        sub = F.slice("codes", m * PQ_SUB + 1, PQ_SUB)
        scores = F.array(*[
            F.struct(_dist_col(sub, c).alias("dist"),
                     F.lit(int(cell)).alias("cell"))
            for cell, c in cents[m]])
        enc = enc.withColumn(f"pq{m}", F.array_min(scores)["cell"])
    enc = enc.select(
        "vec_id",
        F.array(*[F.col(f"pq{m}") for m in range(PQ_M)]).alias("pq"))

    qrows = sorted(
        coded.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "codes").collect(),
        key=lambda r: r.vec_id)  # bounded: N_QUERIES rows
    lut_rows = []
    for r in qrows:
        lut = {}
        for m in range(PQ_M):
            qsub = [float(v) for v in r.codes[m * PQ_SUB:(m + 1) * PQ_SUB]]
            for cell, c in cents[m]:
                acc = 0.0
                for qq, cc in zip(qsub, c):
                    acc += (qq - cc) * (qq - cc)
                lut[m * PQ_K + cell] = acc
        lut_rows.append((int(r.vec_id), lut))
    lut_df = spark.createDataFrame(
        lut_rows, "query_id bigint, lut map<bigint,double>")

    adc = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda m: F.col("lut")[
                (m * PQ_K
                 + F.element_at("pq", (m + 1).cast("int"))).cast("bigint")]),
        F.lit(0.0), lambda a, x: a + x)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id"))
    return (
        enc.crossJoin(F.broadcast(lut_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


_PQ_DIST_SQL = ("list_reduce(list_transform(range(1, {d1}), i -> "
                "(CAST(v.sub[i] AS DOUBLE) - t.c[i]) * "
                "(CAST(v.sub[i] AS DOUBLE) - t.c[i])), "
                "(a, b) -> a + b)").format(d1=PQ_SUB + 1)


def _pq_assign_cte(name: str, cents: str) -> str:
    return f"""
{name} AS (
    SELECT vec_id, m, sub, cell FROM (
        SELECT v.vec_id, v.m, v.sub, t.cell,
               row_number() OVER (PARTITION BY v.vec_id, v.m
                                  ORDER BY {_PQ_DIST_SQL}, t.cell) AS rn
        FROM subs v JOIN {cents} t ON v.m = t.m
    ) WHERE rn = 1
)"""


def _pq_iteration_ctes() -> str:
    blocks = []
    for it in range(1, PQ_ITERS + 1):
        blocks.append(_pq_assign_cte(f"pa{it}", f"pcents{it - 1}") + f""",
pcents{it} AS (
    SELECT m, cell, list(mn ORDER BY d) AS c FROM (
        SELECT m, cell, d,
               CAST(sum(sub[d]) AS DOUBLE) / count(*) AS mn
        FROM pa{it} CROSS JOIN range(1, {PQ_SUB + 1}) t(d)
        GROUP BY m, cell, d
    ) GROUP BY m, cell
)""")
    return ",".join(blocks)


PQ_ADC_TOPK_SQL = f"""
WITH coded AS (
    SELECT vec_id, {_CODES_SQL} AS codes FROM embeddings
),
subs AS (
    SELECT vec_id, m,
           list_slice(codes, m * {PQ_SUB} + 1, (m + 1) * {PQ_SUB}) AS sub
    FROM coded CROSS JOIN range(0, {PQ_M}) t(m)
),
seedrows AS (
    SELECT vec_id,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                              vec_id) AS rn
    FROM coded
),
pcents0 AS (
    SELECT s.m, r.rn - 1 AS cell,
           list_transform(s.sub, x -> CAST(x AS DOUBLE)) AS c
    FROM subs s JOIN seedrows r ON s.vec_id = r.vec_id
    WHERE r.rn <= {PQ_K}
),{_pq_iteration_ctes()},{_pq_assign_cte("penc", f"pcents{PQ_ITERS}")},
q AS (
    SELECT vec_id AS query_id, m,
           list_transform(sub, x -> CAST(x AS DOUBLE)) AS qsub
    FROM subs WHERE vec_id < {N_QUERIES}
),
contribs AS (
    SELECT q.query_id, e.vec_id, e.m,
           list_reduce(list_transform(range(1, {PQ_SUB + 1}), i ->
               (q.qsub[i] - t.c[i]) * (q.qsub[i] - t.c[i])),
               (a, b) -> a + b) AS contrib
    FROM penc e
    JOIN pcents{PQ_ITERS} t ON e.m = t.m AND e.cell = t.cell
    JOIN q ON q.m = e.m
    WHERE e.vec_id <> q.query_id
),
dists AS (
    SELECT query_id, vec_id,
           list_reduce(list(contrib ORDER BY m), (a, b) -> a + b)
               AS adc_dist
    FROM contribs GROUP BY query_id, vec_id
)
SELECT query_id, vec_id, adc_dist, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, vec_id) AS rank
    FROM dists
) WHERE rank <= {TOP_K}
"""


NPROBE = 2  # cells probed per query (multi-probe IVF)


def ann_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF over the trained quantizer: each query probes
    its ``NPROBE`` nearest cells instead of one — THE standard recall
    lever in production IVF (FAISS ``nprobe``): candidate volume
    scales linearly with probes while recall climbs steeply, because
    true neighbors near a cell boundary land in the second-closest
    cell. ``ann_recall_report`` measures the gain against the same
    brute-force baseline (single-probe trained IVF ≈ 0.48 mean
    recall@10 at sf0.01; two probes roughly double the candidate
    pool).

    Exactness: probe selection ranks cells by the same integer-code
    distance fold as assignment, tie-broken by cell id — the
    ``array_sort`` struct order here IS the oracle's
    ``ORDER BY dist, cell``; candidate membership uses the final
    assignment, so a vector appears via exactly one probe (cells
    partition the corpus — no dedup needed).

    Scale: identical plan shape to single-probe IVF, with the
    broadcast query side ``NPROBE``× larger (still ≤ N_QUERIES × 2
    rows) — candidates stay an equi-join on the cell key.
    """
    coded, _, cents_final, _ = _train(spark, sf_dir)
    assigned = _assign(coded, cents_final).withColumn(
        "nrm", l2_norm("embedding"))
    if isinstance(cents_final, _ProductCents):
        # product regime: rank the OCCUPIED product cells per query
        # driver-side (N_QUERIES × K_total distances over the ≤10
        # collected query code rows — bounded driver traffic, same
        # dim-sequential fold + (dist, cell) tie-break as the
        # expression path) instead of a K_total-literal plan.
        probe_rows = _imi_probe_rows(coded, cents_final)
        probes_df = coded.sparkSession.createDataFrame(
            probe_rows, "query_id long, probe_cell int")
        q = (coded.filter(F.col("vec_id") < N_QUERIES)
             .select(F.col("vec_id").alias("query_id"),
                     F.col("embedding").alias("query_emb"),
                     l2_norm("embedding").alias("query_nrm"))
             .join(probes_df, "query_id"))
    else:
        scores = F.array_sort(_score_array(cents_final))
        probes = F.transform(F.slice(scores, 1, NPROBE),
                             lambda s: s["cell"])
        q = (coded.filter(F.col("vec_id") < N_QUERIES)
             .select(F.col("vec_id").alias("query_id"),
                     F.col("embedding").alias("query_emb"),
                     l2_norm("embedding").alias("query_nrm"),
                     F.explode(probes).alias("probe_cell")))
    scored = (
        assigned.join(F.broadcast(q), assigned.cell == q.probe_cell)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", dot("embedding", "query_emb")
                    / (F.col("nrm") * F.col("query_nrm"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rank"))


ANN_IVF_MULTIPROBE_SQL = f"""{_PREFIX_SQL},{_assign_cte("afinal",
                                                        f"cents{KM_ITERS}")},
vecs AS (
    SELECT c.vec_id, a.cell, CAST(c.embedding AS DOUBLE[]) AS e
    FROM coded c JOIN afinal a ON c.vec_id = a.vec_id
),
qprobe AS (
    SELECT vec_id AS query_id, cell AS probe_cell FROM (
        SELECT v.vec_id, t.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_DIST_SQL}, t.cell) AS rn
        FROM coded v CROSS JOIN cents{KM_ITERS} t
        WHERE v.vec_id < {N_QUERIES}
    ) WHERE rn <= {NPROBE}
),
q AS (
    SELECT vec_id AS query_id, e AS query_emb
    FROM vecs WHERE vec_id < {N_QUERIES}
),
scored AS (
    SELECT qp.query_id, v.vec_id,
           list_cosine_similarity(v.e, q.query_emb) AS cos_sim
    FROM vecs v
    JOIN qprobe qp ON v.cell = qp.probe_cell
    JOIN q ON q.query_id = qp.query_id
    WHERE v.vec_id <> qp.query_id
)
SELECT query_id, vec_id, cos_sim, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, vec_id)
                   AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {TOP_K}
"""


PCA_D = KM_D     # embedding dims
PCA_ITERS = 4    # fixed power-iteration steps (a spec, not a tolerance)
PCA_SCALE = 1000000.0  # per-iteration re-quantization scale (1e6)


def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding table by POWER
    ITERATION on the exact integer Gram matrix — the embedding-wide
    spectral summary (dominant variance direction + its Rayleigh-
    quotient eigenvalue) that drives whitening / ABTT-style
    post-processing decisions, computed fully distributed.

    Method: over the int8-quantized codes (the module's exactness
    contract), build the uncentered second-moment matrix
    M_ij = Σ_n c[n,i]·c[n,j] — one combinable n·D²-row aggregation —
    then run ``PCA_ITERS`` fixed steps of w = M·v with the vector
    re-quantized to integers after every step
    (v' = round(w/max|w|·1e6)): integer sums are order-independent,
    so every iterate is bit-identical on any engine and the float
    work per step is 3 correctly-rounded double ops per element.
    Output: one row per dimension with the unit-norm loading and the
    Rayleigh quotient vᵀMv / vᵀv (identical on all rows) — the
    4-step power-iteration estimate BY SPEC, so the oracle unrolls
    the same 4 steps as CTEs rather than chasing a convergence
    tolerance.

    Exactness bounds: M_ij ≤ n·127² stays int64-exact past 5×10¹¹
    rows and DECIMAL(38,0)-exact effectively forever; the per-step
    products M·v ≤ D·M·1e6 exceed double's 2⁵³ around n ≈ 10⁹ rows,
    after which the decimal→double cast before the division is still
    correctly rounded and engine-identical — only the printed 6-dp
    loadings' last digit could differ from an infinite-precision run,
    never between the two engines.

    Scale: the Gram aggregation is the only data-sized stage (n·D²
    exploded rows, map-side combinable; at 100 TB swap in a
    mapInArrow per-partition int64 outer-product partial — same
    output contract, D² rows per partition instead of n·D²); the
    iteration joins touch D²-row relations with the D-row vector
    broadcast; the Gram relation is lineage-truncated once so its
    five consumers (4 steps + Rayleigh) re-read D² rows, not the
    corpus, and each step's D-row iterate is cut too — the final
    vector has three downstream consumers (norm, Rayleigh, output),
    which would otherwise each replay the whole iteration chain
    (static plan: 150 exchanges un-cut vs 8 cut).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    coded = _coded(emb)
    e1 = coded.select("codes", F.posexplode("codes").alias("i0", "ci"))
    pairs = e1.select(
        (F.col("i0") + 1).alias("i"), "ci",
        F.posexplode("codes").alias("j0", "cj"))
    gram = truncate_lineage(
        pairs.groupBy("i", (F.col("j0") + 1).alias("j"))
        .agg(F.sum((F.col("ci") * F.col("cj")).cast("decimal(38,0)"))
             .alias("m")))
    v = spark.range(1, PCA_D + 1).select(
        F.col("id").alias("j"), F.lit(1).cast("long").alias("v"))
    for _ in range(PCA_ITERS):
        w = (gram.join(F.broadcast(v), "j")
             .groupBy("i")
             .agg(F.sum(F.col("m") * F.col("v")).alias("w")))
        mx = w.agg(F.max(F.abs("w")).alias("mx"))
        v = truncate_lineage(
            w.join(F.broadcast(mx))
            .select(F.col("i").alias("j"),
                    F.round(F.col("w").cast("double")
                            / F.col("mx").cast("double")
                            * F.lit(PCA_SCALE))
                    .cast("long").alias("v")))
    norm2 = v.agg(F.sum(F.col("v") * F.col("v")).alias("n2"))
    vtmv = (gram.join(F.broadcast(v), "j")
            .join(F.broadcast(v.select(F.col("j").alias("i"),
                                       F.col("v").alias("vi"))), "i")
            .agg(F.sum(F.col("m") * F.col("v") * F.col("vi"))
                 .alias("vtmv")))
    eig = (norm2.join(F.broadcast(vtmv))
           .select(F.round(F.col("vtmv").cast("double")
                           / F.col("n2").cast("double"), 6)
                   .alias("eigenvalue")))
    return (v.join(F.broadcast(norm2)).join(F.broadcast(eig))
            .select(F.col("j").cast("bigint").alias("dim"),
                    F.round(F.col("v").cast("double")
                            / F.sqrt(F.col("n2").cast("double")), 6)
                    .alias("loading"),
                    "eigenvalue"))


def _pca_iteration_ctes() -> str:
    blocks = []
    for it in range(1, PCA_ITERS + 1):
        blocks.append(f""",
w{it} AS (
    SELECT i, sum(m * v) AS w
    FROM gram JOIN v{it - 1} USING (j) GROUP BY i
),
v{it} AS (
    SELECT i AS j,
           CAST(round(CAST(w AS DOUBLE)
                      / CAST((SELECT max(abs(w)) FROM w{it}) AS DOUBLE)
                      * {PCA_SCALE!r}) AS BIGINT) AS v
    FROM w{it}
)""")
    return "".join(blocks)


PCA_POWER_SQL = f"""
WITH coded AS (
    SELECT vec_id, {_CODES_SQL} AS codes FROM embeddings
),
gram AS (
    SELECT i, j, CAST(sum(codes[i] * codes[j]) AS DECIMAL(38,0)) AS m
    FROM coded
    CROSS JOIN range(1, {PCA_D + 1}) t(i)
    CROSS JOIN range(1, {PCA_D + 1}) u(j)
    GROUP BY i, j
),
v0 AS (
    SELECT j, CAST(1 AS BIGINT) AS v FROM range(1, {PCA_D + 1}) t(j)
){_pca_iteration_ctes()},
n2 AS (SELECT sum(v * v) AS n2 FROM v{PCA_ITERS}),
vtmv AS (
    SELECT sum(g.m * a.v * b.v) AS vtmv
    FROM gram g
    JOIN v{PCA_ITERS} a ON a.j = g.j
    JOIN v{PCA_ITERS} b ON b.j = g.i
)
SELECT CAST(f.j AS BIGINT) AS dim,
       round(CAST(f.v AS DOUBLE) / sqrt(CAST(n2.n2 AS DOUBLE)), 6)
           AS loading,
       round(CAST(vtmv.vtmv AS DOUBLE) / CAST(n2.n2 AS DOUBLE), 6)
           AS eigenvalue
FROM v{PCA_ITERS} f CROSS JOIN n2 CROSS JOIN vtmv
ORDER BY dim
"""


KNN_K = 5   # neighbors consulted per vector for the label audit


def label_knn_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit by k-NN label agreement (the confident-
    learning / deep-kNN screen, Northcutt et al. 2021 lineage): for
    every vector, the fraction of its ``KNN_K`` nearest within-cell
    neighbors (trained k-means cells, exact cosine) sharing its label;
    reported per label as the member count, mean agreement, and how
    many members a majority of neighbors CONTRADICT — the table that
    decides whether a label column is trustworthy enough to train on.

    Neighborhoods are cell-restricted on purpose: that is the IVF
    candidate discipline (`ann_ivf_trained_topk`) — at 100 TB the
    k-NN graph is only computable per-bucket, and a label audit needs
    exactly the same pruning to stay linear. Cells with fewer than
    K+1 members use every available neighbor (the denominator is the
    per-anchor neighbor count, never a padded constant).

    Exactness: shared/neighbor counts are integers; the per-anchor
    ratio is one exact-int division round(·,10)-pinned to decimal
    before the per-label sum; mean agreement is one final division.

    Scale: one Σ|cell|² within-cell pair relation (never n²), one
    rank window per anchor, two combinable aggregations. The
    assignment reuses the trained centroids as plan literals.
    """
    coded, _, cents_final, _ = _train(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = (_assign(coded, cents_final)
                .join(emb.select("vec_id", "label"), "vec_id")
                .withColumn("nrm", l2_norm("embedding")))
    nb = assigned.select(F.col("vec_id").alias("nb_id"),
                         F.col("cell").alias("nb_cell"),
                         F.col("embedding").alias("nb_emb"),
                         F.col("nrm").alias("nb_nrm"),
                         F.col("label").alias("nb_label"))
    pairs = (assigned.join(nb, assigned.cell == nb.nb_cell)
             .filter(F.col("vec_id") != F.col("nb_id"))
             .withColumn("cos_sim", dot("embedding", "nb_emb")
                         / (F.col("nrm") * F.col("nb_nrm"))))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("nb_id"))
    knn = (pairs.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= KNN_K))
    anchors = (knn.groupBy("vec_id", "label")
               .agg(F.count(F.lit(1)).alias("n_nb"),
                    F.sum((F.col("nb_label") == F.col("label"))
                          .cast("int")).alias("shared"))
               .select("vec_id", "label", "n_nb", "shared",
                       F.round(F.col("shared") / F.col("n_nb"), 10)
                       .cast("decimal(25,10)").alias("ratio")))
    return (anchors.groupBy(F.col("label").cast("bigint").alias("label"))
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.round(F.sum("ratio").cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_agreement"),
                 F.sum((F.col("shared") * 2 < F.col("n_nb"))
                       .cast("int")).cast("bigint").alias("n_flagged")))


LABEL_KNN_SQL = f"""{_PREFIX_SQL},{_assign_cte("afinal",
                                               f"cents{KM_ITERS}")},
vecs AS (
    SELECT c.vec_id, a.cell, CAST(c.embedding AS DOUBLE[]) AS e,
           e2.label
    FROM coded c
    JOIN afinal a ON a.vec_id = c.vec_id
    JOIN embeddings e2 ON e2.vec_id = c.vec_id
),
knn AS (
    SELECT vec_id, label, nb_label FROM (
        SELECT v.vec_id, v.label, n.label AS nb_label,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_cosine_similarity(v.e, n.e) DESC,
                            n.vec_id) AS rnk
        FROM vecs v JOIN vecs n
          ON n.cell = v.cell AND n.vec_id <> v.vec_id
    ) WHERE rnk <= {KNN_K}
),
anchors AS (
    SELECT vec_id, label, count(*) AS n_nb,
           CAST(sum(CASE WHEN nb_label = label THEN 1 ELSE 0 END)
                AS BIGINT) AS shared,
           CAST(round(sum(CASE WHEN nb_label = label THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 10)
                AS DECIMAL(25,10)) AS ratio
    FROM knn GROUP BY vec_id, label
)
SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
       round(CAST(sum(ratio) AS DOUBLE) / count(*), 6)
           AS avg_agreement,
       CAST(count(CASE WHEN shared * 2 < n_nb THEN 1 END) AS BIGINT)
           AS n_flagged
FROM anchors GROUP BY label ORDER BY label
"""


# --- simplified silhouette (cluster-quality audit) ------------------------

def silhouette_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell simplified-silhouette audit of the trained coarse
    quantizer (Vendramin et al. 2010's "simplified silhouette": a =
    distance to the OWN centroid, b = distance to the nearest OTHER
    centroid, s = (b−a)/max(a,b)) — the cluster-quality gate that
    decides whether the IVF index is worth probing before anything
    builds on its cells. Near 1 = compact/separated; near 0 = the
    cell boundary cuts through mass (multiprobe territory); negative
    = vectors landed in the wrong cell (centroid drift).

    Why the SIMPLIFIED variant: the classical silhouette's a/b are
    mean pairwise distances — Σ|cell|² work, the SemDeDup cost
    profile. Against centroids it is K distance expressions per row,
    all map-side (the same broadcast-literal matrix the assignment
    itself evaluates) — linear at any scale, no joins, one combinable
    aggregation.

    Exactness: distances are the ``_dist`` sequential fold (exact-
    double, engine-identical per that helper's contract); sqrt is
    IEEE-correctly-rounded on both engines; each s is one pinned
    round(·,10) → DECIMAL(25,10); per-cell mean = exact decimal sum /
    count. The degenerate max(a,b)=0 guard (a vector EQUAL to two
    centroids) returns 0 identically on both engines."""
    coded, cents_prev, _, _ = _train(spark, sf_dir)
    if isinstance(cents_prev, _ProductCents):
        # past-the-cap product regime: O(K_h) per-half kernel
        rows = _silhouette_imi(coded, cents_prev)
    elif len(cents_prev) <= KM_EXPR_MAX_K:
        scores = _score_array(cents_prev)
        best = F.array_min(scores)
        rows = (coded.withColumn("own", best["cell"])
                .withColumn("da", F.sqrt(best["dist"]))
                .withColumn("db", F.sqrt(F.array_min(
                    F.filter(scores,
                             lambda s: s["cell"] != F.col("own")))["dist"])))
    else:  # large-K: the gated Arrow kernel (KM_EXPR_MAX_K comment)
        rows = _silhouette_arrow(coded, cents_prev)
    rows = (rows
            .withColumn("s", F.when(
                F.greatest("da", "db") > 0,
                F.round((F.col("db") - F.col("da"))
                        / F.greatest("da", "db"), 10))
                .otherwise(F.lit(0.0)).cast("decimal(25,10)")))
    return (rows.groupBy(F.col("own").cast("bigint").alias("cell"))
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.round(F.sum("s").cast("double")
                         / F.count(F.lit(1)), 6)
                 .alias("mean_silhouette")))


SILHOUETTE_SQL = f"""{_PREFIX_SQL},
sil AS (
    SELECT a.vec_id, a.cell AS own,
           sqrt(min(CASE WHEN t.cell = a.cell
                         THEN {_DIST_SQL} END)) AS da,
           sqrt(min(CASE WHEN t.cell <> a.cell
                         THEN {_DIST_SQL} END)) AS db
    FROM coded v
    JOIN a{KM_ITERS} a ON v.vec_id = a.vec_id
    CROSS JOIN cents{KM_ITERS - 1} t
    GROUP BY a.vec_id, a.cell
)
SELECT CAST(own AS BIGINT) AS cell, count(*) AS n_vecs,
       round(CAST(sum(CAST(CASE WHEN greatest(da, db) > 0
                                THEN round((db - da) / greatest(da, db),
                                           10)
                                ELSE 0 END AS DECIMAL(25,10)))
                  AS DOUBLE) / count(*), 6) AS mean_silhouette
FROM sil GROUP BY own
"""


KC_SEEDS = 4   # 1 deterministic start + 3 farthest-first selections


def kcenter_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gonzalez farthest-first traversal (the classic 2-approximation
    for k-center, Gonzalez 1985) over the int8-quantized embeddings —
    the coverage-maximizing seed selector used for quantizer init and
    coreset/data-pruning anchors (pick the K most mutually distant
    exemplars, then audit how well they cover the corpus).

    Selection: seed 1 is the minimum vec_id (a deterministic start, as
    the algorithm permits any); each next seed is the point with the
    LARGEST distance to its nearest already-chosen seed (argmax of the
    running min — ties break on vec_id). The report then assigns every
    point to its nearest seed and emits per-seed member counts and the
    covering radius — max-over-members of the min-distance, i.e. the
    k-center objective the traversal 2-approximates.

    Exactness: distances are squared L2 over int codes — integer-
    valued doubles (≤ 64·254² per pair), exact in both engines; the
    selection trace and the radius are emitted as BIGINT.

    Scale: each of the 3 selection rounds is ONE full scan with a
    broadcast ≤K-row seed list folded into a `least(...)` expression +
    a TakeOrdered(1) — bounded driver traffic (one row per round), no
    shuffle of the corpus; the final assignment is the same broadcast
    argmin expression + one combinable aggregation. The O(n·K) total
    work is the textbook cost of farthest-first.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    coded = _coded(emb).select("vec_id", "codes")
    first = coded.orderBy("vec_id").limit(1).collect()[0]
    seeds = [(int(first.vec_id),
              [float(v) for v in first.codes], 0)]
    for _ in range(KC_SEEDS - 1):
        dists = [_dist(c) for _, c, _ in seeds]
        mind = F.least(*dists) if len(dists) > 1 else dists[0]
        far = (coded.select("vec_id", "codes", mind.alias("d"))
               .orderBy(F.col("d").desc(), "vec_id").limit(1)
               .collect()[0])
        seeds.append((int(far.vec_id),
                      [float(v) for v in far.codes], int(far.d)))
    scores = F.array(*[
        F.struct(_dist(c).alias("dist"),
                 F.lit(i + 1).alias("seed_rank"))
        for i, (_, c, _) in enumerate(seeds)
    ])
    nearest = coded.select(
        F.array_min(scores)["seed_rank"].alias("seed_rank"),
        F.array_min(scores)["dist"].alias("d"))
    members = nearest.groupBy("seed_rank").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("d").cast("bigint").alias("radius_sq"))
    trace = spark.createDataFrame(
        [(i + 1, sid, d) for i, (sid, _, d) in enumerate(seeds)],
        "seed_rank int, vec_id bigint, picked_dist_sq bigint")
    return (trace.join(members, "seed_rank")
            .select(F.col("seed_rank").cast("bigint").alias("seed_rank"),
                    "vec_id", "picked_dist_sq", "n_members", "radius_sq"))


def _kc_dist(a: str, b: str) -> str:
    return (f"list_reduce(list_transform(range(1, {KM_D + 1}), i -> "
            f"(CAST({a}.codes[i] AS DOUBLE) - CAST({b}.codes[i] AS "
            f"DOUBLE)) * (CAST({a}.codes[i] AS DOUBLE) - "
            f"CAST({b}.codes[i] AS DOUBLE))), (x, y) -> x + y)")


def _kcenter_sql() -> str:
    picks = ["s1 AS (SELECT vec_id, codes, CAST(0 AS DOUBLE) AS d "
             "FROM coded ORDER BY vec_id LIMIT 1)"]
    for r in range(2, KC_SEEDS + 1):
        mind = ", ".join(_kc_dist("v", f"p{j}") for j in range(1, r))
        mind = f"least({mind})" if r > 2 else mind
        froms = " ".join(f"CROSS JOIN s{j} p{j}" for j in range(1, r))
        picks.append(
            f"s{r} AS (SELECT v.vec_id, v.codes, {mind} AS d "
            f"FROM coded v {froms} "
            f"ORDER BY d DESC, v.vec_id LIMIT 1)")
    seeds_union = " UNION ALL ".join(
        f"SELECT {r} AS seed_rank, vec_id, codes, d FROM s{r}"
        for r in range(1, KC_SEEDS + 1))
    return f"""
WITH coded AS (
    SELECT vec_id, {_CODES_SQL} AS codes FROM embeddings
),
{", ".join(picks)},
seeds AS ({seeds_union}),
assigned AS (
    SELECT seed_rank, dd FROM (
        SELECT s.seed_rank, {_kc_dist("v", "s")} AS dd,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_kc_dist("v", "s")},
                                           s.seed_rank) AS rn
        FROM coded v CROSS JOIN seeds s
    ) WHERE rn = 1
),
members AS (
    SELECT seed_rank, count(*) AS n_members,
           CAST(max(dd) AS BIGINT) AS radius_sq
    FROM assigned GROUP BY seed_rank
)
SELECT CAST(s.seed_rank AS BIGINT) AS seed_rank, s.vec_id,
       CAST(s.d AS BIGINT) AS picked_dist_sq, m.n_members, m.radius_sq
FROM seeds s JOIN members m ON m.seed_rank = s.seed_rank
"""


KCENTER_SEEDS_SQL = _kcenter_sql()


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift audit over the int8-quantized codes:
    for each label, the cosine between the label centroid and the
    GLOBAL centroid plus the centroid's own L2 norm — the
    embedding-space counterpart of ``ks_drift_by_source`` (is one
    slice of the corpus pointing somewhere else?), and the audit run
    before trusting per-label balanced sampling.

    The scaling identity that makes this oracle-exact: cosine is
    scale-invariant, so cos(mean_l, mean_g) == cos(SUM_l, SUM_g) — and
    the per-dimension SUMS of integer codes are exact integers
    (associative, order-independent), unlike float means
    (``label_centroid_norms`` is rows-only for exactly that reason).
    Every dot/norm is an exact integer; the single sqrt+division is
    one written order on both engines, round 10 dp. Int64 headroom:
    Σ s·g per dim is bounded by (127·n_l)·(127·n) — overflows int64
    past n ≈ 7.5×10⁸ vectors; switch the products to DECIMAL(38,0)
    beyond that.

    Scale: ONE combinable (label, dim) aggregation over the exploded
    codes (the only corpus-sized shuffle, lineage-cut because both the
    global rollup and the per-label dot consume it); everything
    downstream is |labels|×D rows.
    """
    emb = load_embeddings_parallel(spark, sf_dir)
    absmax = F.array_max(F.transform("embedding", F.abs))
    scale = F.lit(127.0) / absmax
    codes = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * scale)
        .cast("long"))
    pc = truncate_lineage(
        emb.select("label", F.posexplode(codes).alias("d", "c"))
        .groupBy("label", "d").agg(F.sum("c").alias("s")))
    glob = pc.groupBy("d").agg(F.sum("s").alias("g"))
    n2g = glob.agg(F.sum(F.col("g") * F.col("g")).alias("n2g"))
    nl = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    per = (pc.join(F.broadcast(glob), "d")
           .groupBy("label")
           .agg(F.sum(F.col("s") * F.col("g")).alias("dot"),
                F.sum(F.col("s") * F.col("s")).alias("n2l")))
    return (per.join(F.broadcast(nl), "label")
            .crossJoin(F.broadcast(n2g))
            .select(F.col("label").cast("bigint").alias("label"),
                    "n_vecs",
                    F.round(F.col("dot")
                            / F.sqrt(F.col("n2l").cast("double")
                                     * F.col("n2g").cast("double")), 10)
                    .alias("cos_to_global"),
                    F.round(F.sqrt(F.col("n2l").cast("double"))
                            / F.col("n_vecs"), 10)
                    .alias("centroid_norm")))


CENTROID_DRIFT_SQL = f"""
WITH coded AS (
    SELECT vec_id, label, {_CODES_SQL} AS codes FROM embeddings
),
pc AS (
    SELECT label, d, sum(codes[d]) AS s
    FROM coded CROSS JOIN range(1, {KM_D + 1}) t(d)
    GROUP BY 1, 2
),
gsum AS (SELECT d, sum(s) AS g FROM pc GROUP BY d),
n2gt AS (SELECT sum(g * g) AS n2g FROM gsum),
nl AS (SELECT label, count(*) AS n_vecs FROM coded GROUP BY label),
per AS (
    SELECT p.label, sum(p.s * g.g) AS dot, sum(p.s * p.s) AS n2l
    FROM pc p JOIN gsum g ON g.d = p.d
    GROUP BY p.label
)
SELECT CAST(per.label AS BIGINT) AS label, nl.n_vecs,
       round(CAST(dot AS DOUBLE)
             / sqrt(CAST(n2l AS DOUBLE) * CAST(n2g AS DOUBLE)), 10)
           AS cos_to_global,
       round(sqrt(CAST(n2l AS DOUBLE)) / nl.n_vecs, 10) AS centroid_norm
FROM per JOIN nl ON nl.label = per.label CROSS JOIN n2gt
"""


CTFIDF_TOP = 5   # labeling terms per cluster


def ctfidf_cluster_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster labeling by class-based TF-IDF (the BERTopic recipe,
    Grootendorst 2022): assign every document to its trained k-means
    cell through the shared doc_id = vec_id key space (the
    ``hybrid_search_rrf`` convention), then score each (cell, word) by
    c-TF-IDF = tf(word, cell) · ln(1 + A / tf_corpus(word)), A = mean
    per-cell token mass, and emit the top-5 terms per cell — "what is
    this embedding cluster ABOUT", the human-readable face of the
    quantizer family (SemDeDup prunes cells, this names them).

    Exactness: term frequencies are integers; the ln factor is
    round(·,10)-pinned before the tf multiply; one final round 6.
    Ranking ties break on word.

    Scale: docs join the broadcast cell assignment (vec-count-sized id
    pairs, not text); one combinable (cell, word) aggregation; the idf
    side is a vocab-sized relation; top-k is a per-cell window.
    """
    coded, _, cents_final, _ = _train(spark, sf_dir)
    assigned = _assign(coded, cents_final).select("vec_id", "cell")
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.join(F.broadcast(assigned),
                     docs.doc_id == assigned.vec_id)
           .select("cell", F.explode(F.split("text", " ")).alias("word")))
    tf = truncate_lineage(
        tok.groupBy("cell", "word").agg(F.count(F.lit(1)).alias("tf")))
    corpus_tf = tf.groupBy("word").agg(F.sum("tf").alias("ctf"))
    avg_mass = (tf.groupBy("cell").agg(F.sum("tf").alias("mass"))
                .agg((F.sum("mass") / F.count(F.lit(1)))
                     .alias("a")))
    idf = (corpus_tf.crossJoin(F.broadcast(avg_mass))
           .select("word",
                   F.round(F.log(F.lit(1.0)
                                 + F.col("a") / F.col("ctf")), 10)
                   .cast("decimal(25,10)").alias("idf")))
    scored = (tf.join(F.broadcast(idf), "word")
              .select("cell", "word",
                      F.round(F.col("tf")
                              * F.col("idf").cast("double"), 6)
                      .alias("ctfidf")))
    w = Window.partitionBy("cell").orderBy(
        F.col("ctfidf").desc(), "word")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= CTFIDF_TOP)
            .select(F.col("cell").cast("bigint").alias("cell"), "word",
                    "ctfidf", F.col("rnk").cast("bigint").alias("rnk")))


CTFIDF_SQL = f"""{_PREFIX_SQL},{_assign_cte("afinal", f"cents{KM_ITERS}")},
tok AS (
    SELECT a.cell, unnest(string_split(d.text, ' ')) AS word
    FROM documents d JOIN afinal a ON a.vec_id = d.doc_id
),
tf AS (SELECT cell, word, count(*) AS tf FROM tok GROUP BY 1, 2),
ctf AS (SELECT word, sum(tf) AS ctf FROM tf GROUP BY word),
am AS (
    SELECT sum(mass) / count(*) AS a FROM (
        SELECT cell, sum(tf) AS mass FROM tf GROUP BY cell)
),
idf AS (
    SELECT word,
           CAST(round(ln(1.0 + a / ctf), 10) AS DECIMAL(25,10)) AS idf
    FROM ctf CROSS JOIN am
),
scored AS (
    SELECT tf.cell, tf.word,
           round(tf.tf * CAST(idf.idf AS DOUBLE), 6) AS ctfidf
    FROM tf JOIN idf ON idf.word = tf.word
)
SELECT CAST(cell AS BIGINT) AS cell, word, ctfidf,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, row_number() OVER (PARTITION BY cell
                                 ORDER BY ctfidf DESC, word) AS rnk
    FROM scored
) WHERE rnk <= {CTFIDF_TOP}
"""


# --- k-means coreset sensitivity weights ----------------------------------

CORESET_M = 64   # coreset size the share column is denominated in


def kmeans_coreset_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell k-means SSE decomposition + coreset sensitivity
    shares (the lightweight-coreset construction of Bachem, Lucic &
    Krause 2018, with the trained quantizer cells as the anchor): each
    cell's share of the total within-cluster squared error, blended
    half-and-half with its population share — q(cell) = ½·SSE_cell/
    SSE_tot + ½·n_cell/n — and the number of draws a CORESET_M-point
    importance sample would take from it. The table that says WHERE a
    compressed training sample must spend its points (high-SSE cells
    are under-described by their centroid; uniform mass keeps small
    clean cells represented).

    Exactness: SSE is computed in EXACT INTEGER arithmetic — per
    vector Σ_d (m·x_d − s_d)² with m the cell count and s the per-dim
    integer code sums, so SSE_cell = Σ/m² divides exact integers and
    NO float ever accumulates; the K-term total and shares use the
    fleet's running-sum idiom over the K-row cell relation.

    Scale: assignment is the proven broadcast-centroid map-side plan;
    the integer-sum relation is K×(D+1) scalars; everything after is
    K rows.
    """
    coded, cents_prev, _cents_final, _counts = _train(spark, sf_dir)
    assign = _assign(coded, cents_prev)
    stats = (assign.groupBy("cell").agg(
        F.count(F.lit(1)).alias("m"),
        *[F.sum(F.element_at(F.col("codes"), d + 1)).alias(f"s{d}")
          for d in range(KM_D)])
    ).collect()  # K rows x (D+1) scalars — the _train-proven collect
    cells = spark.createDataFrame(
        [(int(r["cell"]), int(r["m"]),
          [int(r[f"s{d}"]) for d in range(KM_D)]) for r in stats],
        "cell int, m long, s array<long>")
    d2m2 = F.aggregate(
        F.zip_with(F.col("codes"), F.col("s"),
                   lambda x, s: (F.col("m") * x - s)
                   * (F.col("m") * x - s)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    per_cell = (assign.join(F.broadcast(cells), "cell")
                .select("cell", "m", d2m2.alias("d2m2"))
                .groupBy("cell", "m")
                .agg(F.count(F.lit(1)).alias("n_vecs"),
                     F.sum("d2m2").alias("sd2m2")))
    sse = (F.col("sd2m2").cast("double")
           / (F.col("m") * F.col("m")).cast("double"))
    w_run = (Window.orderBy("cell")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
    w_all = (Window.orderBy("cell")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    staged = (per_cell.withColumn("sse", sse)
              .withColumn("cum_sse", F.sum("sse").over(w_run))
              .withColumn("cum_n", F.sum("n_vecs").over(w_run)))
    tot_sse = F.max("cum_sse").over(w_all)
    tot_n = F.max("cum_n").over(w_all)
    share = (F.lit(0.5) * F.col("sse") / tot_sse
             + F.lit(0.5) * F.col("n_vecs").cast("double")
             / tot_n.cast("double"))
    return staged.select(
        F.col("cell").cast("bigint").alias("cell"), "n_vecs",
        F.round(F.col("sse"), 6).alias("sse"),
        F.round(share, 10).alias("sens_share"),
        F.floor(F.lit(float(CORESET_M)) * share).cast("bigint")
        .alias("coreset_draws"))


KMEANS_CORESET_SQL = f"""{_PREFIX_SQL},
sums AS (
    SELECT cell, CAST(any_value(n) AS BIGINT) AS m,
           list(sd ORDER BY d) AS s
    FROM (
        SELECT a.cell, t.d, CAST(sum(a.codes[t.d]) AS BIGINT) AS sd,
               any_value(cnt.n) AS n
        FROM a{KM_ITERS} a
        JOIN (SELECT cell, count(*) AS n FROM a{KM_ITERS}
              GROUP BY cell) cnt USING (cell)
        CROSS JOIN range(1, {KM_D + 1}) t(d)
        GROUP BY a.cell, t.d
    ) GROUP BY cell
), pv AS (
    SELECT a.cell, s.m,
           list_reduce(
               list_transform(range(1, {KM_D + 1}),
                   i -> (s.m * a.codes[i] - s.s[i])
                        * (s.m * a.codes[i] - s.s[i])),
               (x, y) -> x + y) AS d2m2
    FROM a{KM_ITERS} a JOIN sums s USING (cell)
), per_cell AS (
    SELECT cell, m, count(*) AS n_vecs,
           CAST(sum(d2m2) AS BIGINT) AS sd2m2
    FROM pv GROUP BY cell, m
), staged AS (
    SELECT cell, n_vecs,
           CAST(sd2m2 AS DOUBLE) / CAST(m * m AS DOUBLE) AS sse,
           sum(CAST(sd2m2 AS DOUBLE) / CAST(m * m AS DOUBLE)) OVER (
               ORDER BY cell
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_sse,
           sum(n_vecs) OVER (
               ORDER BY cell
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_n
    FROM per_cell
)
SELECT CAST(cell AS BIGINT) AS cell, n_vecs,
       round(sse, 6) AS sse,
       round(0.5 * sse / max(cum_sse) OVER ()
             + 0.5 * CAST(n_vecs AS DOUBLE)
               / CAST(max(cum_n) OVER () AS DOUBLE), 10)
           AS sens_share,
       CAST(floor({float(CORESET_M)!r}
                  * (0.5 * sse / max(cum_sse) OVER ()
                     + 0.5 * CAST(n_vecs AS DOUBLE)
                       / CAST(max(cum_n) OVER () AS DOUBLE)))
            AS BIGINT) AS coreset_draws
FROM staged
"""
