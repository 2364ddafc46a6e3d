"""Round-11 two-level (IMI product) quantizer gate pins.

The gate (quantizer.KM_IMI_MIN_N = 64 000 vectors) is INERT at every
committed SF — the first test proves it — so these tests force the
product path by monkeypatching the threshold to 0 at sf0.001, the
KM_EXPR_MAX_K=0 discipline from tests/test_quantizer.py.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mapreduce_in_pthreads_spark.operators import quantizer as qz
from mapreduce_in_pthreads_spark.sources.tables import table_row_count_hint

SF_SMOKE = "/root/testdata/sf0.001"
SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")


@pytest.fixture()
def imi(monkeypatch):
    """Force the product path; isolate the memo so flat-path entries
    in other tests never see product artifacts (and vice versa)."""
    saved = dict(qz._TRAIN_MEMO)
    qz._TRAIN_MEMO.clear()
    monkeypatch.setattr(qz, "KM_IMI_MIN_N", 0)
    yield
    qz._TRAIN_MEMO.clear()
    qz._TRAIN_MEMO.update(saved)


def test_gate_inert_at_committed_sfs(spark):
    """Every committed SF is far below the gate, and the flat trainer
    keeps returning plain lists there — adjudicated outputs and
    oracles are untouched by the IMI code."""
    for sfd in SF_DIRS:
        n = table_row_count_hint(sfd, "embeddings")
        assert n is not None and n < qz.KM_IMI_MIN_N // 10
    coded, cents_prev, cents_final, _ = qz._train(spark, SF_SMOKE)
    assert not isinstance(cents_prev, qz._ProductCents)
    assert not isinstance(cents_final, qz._ProductCents)


def test_imi_kh_formula():
    """K_h is the smallest half-K with K_h² ≥ n/target, clamped like
    km_k — so K_total = K_h² keeps |cell| ≈ target past the flat cap."""
    t, kmax = qz.KM_TARGET_CELL, qz.KM_K_MAX
    for n in (kmax * t + 1, 2 * kmax * t, 10 * kmax * t, 100 * kmax * t):
        kh = qz.imi_kh(n)
        assert kh * kh >= n // t or kh == kmax
        assert (kh - 1) * (kh - 1) < n // t
        assert qz.KM_K_MIN <= kh <= kmax
    # asymptote: clamp at KM_K_MAX per half → K_total = KM_K_MAX²
    assert qz.imi_kh(kmax * kmax * t * 100) == kmax


def test_assign_imi_matches_numpy_replica(spark, imi):
    """Product assignment = per-half argmin with lowest-id tie-break,
    flat id a*stride + b — replayed in pure numpy from the memoized
    halves over every sf0.001 vector."""
    coded, cents_prev, _, _ = qz._train(spark, SF_SMOKE)
    assert isinstance(cents_prev, qz._ProductCents)
    (h1, h2), stride = cents_prev.halves, cents_prev.stride
    got = {r.vec_id: r.cell
           for r in qz._assign(coded, cents_prev)
           .select("vec_id", "cell").collect()}
    rows = coded.select("vec_id", "codes").collect()
    C1 = np.asarray([v for _, v in h1])
    C2 = np.asarray([v for _, v in h2])
    l1 = [c for c, _ in h1]
    l2 = [c for c, _ in h2]
    hd = qz.KM_HALF_D
    for r in rows:
        E = np.asarray([r.codes], dtype="float64")
        a = int(qz._half_dist_matrix(E[:, :hd], C1)[0].argmin())
        b = int(qz._half_dist_matrix(E[:, hd:], C2)[0].argmin())
        assert got[r.vec_id] == l1[a] * stride + l2[b], r.vec_id


def test_imi_partition_and_views(spark, imi):
    """Cells partition the corpus (counts sum to n); both flat views
    list exactly the prev-assignment-occupied cells (the flat
    trainer's guarantee that every aggregated cell exists in both
    lists); centroids are the 64-dim half concatenations."""
    coded, cents_prev, cents_final, counts = qz._train(spark, SF_SMOKE)
    n = coded.count()
    assert sum(counts.values()) == n
    occupied = sorted(counts)
    assert [c for c, _ in cents_prev] == occupied
    assert [c for c, _ in cents_final] == occupied
    assert all(len(v) == qz.KM_D for _, v in cents_prev)
    assert all(len(v) == qz.KM_D for _, v in cents_final)
    # the assignment the counts describe really is the prev-halves one
    assigned = {r.cell for r in qz._assign(coded, cents_prev)
                .select("cell").distinct().collect()}
    assert assigned == set(occupied)


def test_silhouette_imi_db_is_true_product_second_min(spark, imi):
    """db = min(s1+m2, m1+s2) must equal the brute-force second
    minimum over ALL product cells — verified per vector against a
    full K_h² scan in numpy."""
    coded, cents_prev, _, _ = qz._train(spark, SF_SMOKE)
    (h1, h2), stride = cents_prev.halves, cents_prev.stride
    rows = {r.vec_id: (r.own, r.da, r.db)
            for r in qz._silhouette_imi(coded, cents_prev)
            .select("vec_id", "own", "da", "db").collect()}
    data = coded.select("vec_id", "codes").collect()
    C1 = np.asarray([v for _, v in h1])
    C2 = np.asarray([v for _, v in h2])
    l1 = [c for c, _ in h1]
    l2 = [c for c, _ in h2]
    hd = qz.KM_HALF_D
    for r in data[:200]:
        E = np.asarray([r.codes], dtype="float64")
        d1 = qz._half_dist_matrix(E[:, :hd], C1)[0]
        d2 = qz._half_dist_matrix(E[:, hd:], C2)[0]
        full = sorted((d1[i] + d2[j], l1[i] * stride + l2[j])
                      for i in range(len(l1)) for j in range(len(l2)))
        own, da, db = rows[r.vec_id]
        assert own == full[0][1]
        assert da == pytest.approx(math.sqrt(full[0][0]), abs=0)
        assert db == pytest.approx(math.sqrt(full[1][0]), abs=0)


IMI_ENTRIES = ("kmeans_quantizer_cells", "silhouette_cells",
               "ann_ivf_multiprobe_topk", "semdedup_prune",
               "kmeans_coreset_weights", "cluster_balanced_sample")


@pytest.mark.parametrize("name", IMI_ENTRIES)
def test_imi_entries_run_and_are_deterministic(spark, imi, name):
    """Every list-reading / kernel-reading consumer shape works in the
    product regime and is run-to-run deterministic (memo cleared in
    between, so the second run retrains from scratch)."""
    from mapreduce_in_pthreads_spark.plans.registry import REGISTRY

    def run():
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        return sorted(tuple(r) for r in df.collect())

    first = run()
    assert first  # non-degenerate at sf0.001
    qz._TRAIN_MEMO.clear()
    assert run() == first
