"""Semantic pins for the four operators the round-6 VERDICT flagged as
oracle-matched but replica-less (kneser_ney_bigram_logprob,
hits_hubs_authorities, benford_first_digit, silhouette_cells) — the
oracle proves Spark==DuckDB; these prove both equal the algorithm as
specified (both-engines-wrong is the failure mode oracle parity cannot
catch)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import pytest

from .conftest import SF_CORRECT, SF_SMOKE


def _doc_texts(sf_dir: str) -> list[str]:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["text"])["text"].to_pylist()


def _doc_rows(sf_dir: str) -> list[tuple]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _dec10(x: float) -> Decimal:
    """round(x, 10) -> DECIMAL(25,10), the engines' pin, replicated.
    Python round() is banker's where Spark/DuckDB are HALF_UP; the
    pinned values here are irrational products so exact .5 ties at the
    10th decimal do not occur (same argument the operators make)."""
    return Decimal(f"{x:.10f}")


def test_benford_first_digit_python_replica(spark):
    """Digit census must equal a '%.2f'-formatting replica exactly;
    shares sum to 1; the expected column is the Benford literal."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.advanced import (
        BENFORD_EXPECTED, benford_first_digit)

    totals = pq.read_table(f"{SF_CORRECT}/orders.parquet",
                           columns=["o_totalprice"])["o_totalprice"] \
        .to_pylist()
    want = Counter(int(f"{t:.2f}"[0]) for t in totals)

    rows = benford_first_digit(spark, SF_CORRECT).collect()
    got = {r["digit"]: r for r in rows}
    assert {d: r["n"] for d, r in got.items()} == dict(want)
    n_total = sum(want.values())
    assert n_total == len(totals)
    for d, r in got.items():
        assert r["benford_expected"] == BENFORD_EXPECTED[d]
        assert r["share"] == pytest.approx(
            round(r["n"] / n_total, 10), abs=1e-12)
        assert r["delta"] == pytest.approx(
            round(r["share"] - r["benford_expected"], 10), abs=1e-12)
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_hits_python_replica(spark):
    """Hub/authority scores must match a pure-Python HITS replica that
    mirrors the engines' pinning (contributions round(.,10), decimal
    sums, one double division per normalization); both score vectors
    are L1-normalized and non-negative."""
    from mapreduce_in_pthreads_spark.operators.iterative import (
        HITS_ITERATIONS, hits_hubs_authorities)

    edges: Counter = Counter()
    for text in _doc_texts(SF_CORRECT):
        toks = text.split(" ")
        for v, w in zip(toks, toks[1:]):
            edges[(v, w)] += 1
    nodes = sorted({v for v, _ in edges} | {w for _, w in edges})
    hub = {n: _dec10(1.0 / len(nodes)) for n in nodes}
    auth: dict = {}

    def _normalize(raw: dict) -> dict:
        total = sum(raw.values(), Decimal(0))
        return {n: _dec10(float(raw.get(n, Decimal(0))) / float(total))
                for n in nodes}

    for _ in range(HITS_ITERATIONS):
        araw: dict = {}
        for (v, w), c in edges.items():
            araw[w] = araw.get(w, Decimal(0)) + _dec10(float(hub[v]) * c)
        auth = _normalize(araw)
        hraw: dict = {}
        for (v, w), c in edges.items():
            hraw[v] = hraw.get(v, Decimal(0)) + _dec10(float(auth[w]) * c)
        hub = _normalize(hraw)

    rows = hits_hubs_authorities(spark, SF_CORRECT).collect()
    assert {r["word"] for r in rows} == set(nodes)
    for r in rows:
        assert r["hub"] == pytest.approx(float(hub[r["word"]]), abs=1e-9)
        assert r["authority"] == pytest.approx(
            float(auth[r["word"]]), abs=1e-9)
        assert r["hub"] >= 0 and r["authority"] >= 0
    assert sum(r["hub"] for r in rows) == pytest.approx(1.0, abs=1e-6)
    assert sum(r["authority"] for r in rows) == pytest.approx(
        1.0, abs=1e-6)


def test_kneser_ney_python_replica(spark):
    """Per-doc mean KN log-prob must match a Counter replica of the
    exact formula (D=3/4, continuation counts from the bigram-TYPE
    relation, logp pinned at 10 dp before the per-doc sum)."""
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        KN_DISCOUNT, kneser_ney_bigram_logprob)

    doc_bigrams: dict[int, list] = {}
    lm2: Counter = Counter()
    for doc_id, text in _doc_rows(SF_CORRECT):
        toks = text.split(" ")
        pairs = list(zip(toks, toks[1:]))
        doc_bigrams[doc_id] = pairs
        lm2.update(pairs)
    cv: Counter = Counter()
    n1v: Counter = Counter()
    n1w: Counter = Counter()
    for (v, w), c in lm2.items():
        cv[v] += c
        n1v[v] += 1
        n1w[w] += 1
    n1tot = len(lm2)
    logp = {
        (v, w): _dec10(math.log(
            (c - KN_DISCOUNT) / cv[v]
            + KN_DISCOUNT * n1v[v] / cv[v] * (n1w[w] / float(n1tot))))
        for (v, w), c in lm2.items()
    }

    rows = kneser_ney_bigram_logprob(spark, SF_CORRECT).collect()
    assert {r["doc_id"] for r in rows} == {
        d for d, ps in doc_bigrams.items() if ps}
    for r in rows:
        pairs = doc_bigrams[r["doc_id"]]
        assert r["n_bigrams"] == len(pairs)
        lp_sum = sum((logp[p] for p in pairs), Decimal(0))
        want = float(lp_sum) / len(pairs)
        assert r["avg_kn_logprob"] == pytest.approx(want, abs=1e-6)
        # observed-bigram probabilities are strictly positive =>
        # every score is finite and negative (probabilities < 1 here)
        assert math.isfinite(r["avg_kn_logprob"])
        assert r["avg_kn_logprob"] < 0


def test_silhouette_cells_numpy_replica(spark):
    """Per-cell simplified silhouette must match a numpy replica fed
    by the SAME pure-Python training replica test_quantizer.py proves
    against the engines; scores live in [-1, 1]."""
    import numpy as np

    from mapreduce_in_pthreads_spark.operators.quantizer import (
        KM_ITERS, silhouette_cells)

    from .test_quantizer import _codes, _load_vecs, _train_reference_prev

    codes = _codes(_load_vecs())
    cents_prev = _train_reference_prev(codes)

    per_cell: dict[int, list] = {}
    for vid, c in codes.items():
        x = c.astype(np.float64)
        dists = sorted((float(np.sum((x - cc) ** 2)), cell)
                       for cell, cc in cents_prev.items())
        (d_own, own), (d_other, _) = dists[0], dists[1]
        da, db = math.sqrt(d_own), math.sqrt(d_other)
        s = ((db - da) / max(da, db)) if max(da, db) > 0 else 0.0
        per_cell.setdefault(own, []).append(_dec10(s))

    rows = silhouette_cells(spark, SF_SMOKE).collect()
    assert {r["cell"] for r in rows} == set(per_cell)
    for r in rows:
        ss = per_cell[r["cell"]]
        assert r["n_vecs"] == len(ss)
        want = float(sum(ss, Decimal(0))) / len(ss)
        assert r["mean_silhouette"] == pytest.approx(want, abs=1e-6)
        assert -1.0 <= r["mean_silhouette"] <= 1.0
