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


# --- round-7 additions ------------------------------------------------------


def _winnow_replica(tokens: list[str], k: int, w: int):
    """Pure-Python winnowing: k-gram md5-top-60-bit hashes, min per
    w-window, distinct selected set."""
    import hashlib

    grams = [" ".join(tokens[i:i + k])
             for i in range(len(tokens) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
          for g in grams]
    sel = [min(hs[j:j + w]) for j in range(len(hs) - w + 1)]
    return hs, sel, set(sel)


def test_winnowing_python_replica_and_guarantee(spark):
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        WINNOW_K, WINNOW_W, winnowing_fingerprints)

    rows = {r["doc_id"]: r
            for r in winnowing_fingerprints(spark, SF_CORRECT).collect()}
    docs = dict(_doc_rows(SF_CORRECT))
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        toks = text.split(" ")
        hs, sel, fps = _winnow_replica(toks, WINNOW_K, WINNOW_W)
        r = rows[doc_id]
        assert r["n_grams"] == len(hs)
        assert r["n_windows"] == max(len(hs) - WINNOW_W + 1, 0)
        assert r["n_fingerprints"] == len(fps)
        if r["n_windows"]:
            assert r["density"] == pytest.approx(
                round(len(fps) / r["n_windows"], 10), abs=1e-12)

    # the SIGMOD 2003 local guarantee: a shared run of >= W+K-1 tokens
    # forces a shared fingerprint (checked on the replica, which the
    # engines were just proven equal to)
    shared = ["s%d" % i for i in range(WINNOW_W + WINNOW_K - 1)]
    a = ["a1", "a2", "a3"] + shared + ["a4"]
    b = ["b1"] + shared + ["b2", "b3", "b4"]
    _, _, fa = _winnow_replica(a, WINNOW_K, WINNOW_W)
    _, _, fb = _winnow_replica(b, WINNOW_K, WINNOW_W)
    assert fa & fb


def test_prefix_filter_join_is_lossless(spark):
    """The PPJoin prefix/length filters must be LOSSLESS at t=1/2:
    identical pair set, shared counts, and jaccard values as the
    unfiltered baseline join."""
    from mapreduce_in_pthreads_spark.operators.dedup import (
        jaccard_similarity_join, prefix_filter_jaccard_join)

    base = {(r["doc_a"], r["doc_b"]): (r["shared"], r["jaccard"])
            for r in jaccard_similarity_join(spark, SF_CORRECT).collect()}
    pf = {(r["doc_a"], r["doc_b"]): (r["shared"], r["jaccard"])
          for r in prefix_filter_jaccard_join(spark, SF_CORRECT)
          .collect()}
    assert pf == base
    assert base  # non-vacuous: the corpus has near-dup pairs


def test_split_leakage_python_replica(spark):
    import hashlib

    from mapreduce_in_pthreads_spark.operators.curation import \
        split_leakage_audit
    from mapreduce_in_pthreads_spark.operators.dedup import \
        jaccard_similarity_join
    from mapreduce_in_pthreads_spark.operators.text_analysis import \
        TRAIN_FRAC_HEX

    def split(doc_id: int) -> str:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        return "train" if h < TRAIN_FRAC_HEX else "holdout"

    pairs = [(r["doc_a"], r["doc_b"])
             for r in jaccard_similarity_join(spark, SF_CORRECT)
             .collect()]
    want: dict = {}
    for a, b in pairs:
        sa, sb = split(a), split(b)
        cls = ("train-train" if sa == sb == "train"
               else "holdout-holdout" if sa == sb == "holdout"
               else "cross")
        d = want.setdefault(cls, {"n": 0, "docs": set(), "ho": set()})
        d["n"] += 1
        d["docs"] |= {a, b}
        for x, s in ((a, sa), (b, sb)):
            if s == "holdout":
                d["ho"].add(x)
    total_holdout = sum(
        1 for doc_id, _ in _doc_rows(SF_CORRECT)
        if split(doc_id) == "holdout")

    rows = {r["pair_class"]: r
            for r in split_leakage_audit(spark, SF_CORRECT).collect()}
    assert set(rows) == set(want)
    for cls, d in want.items():
        r = rows[cls]
        assert r["n_pairs"] == d["n"]
        assert r["n_docs"] == len(d["docs"])
        assert r["n_holdout_docs"] == len(d["ho"])
        assert r["holdout_share"] == pytest.approx(
            round(len(d["ho"]) / total_holdout, 10), abs=1e-12)
    assert sum(r["n_pairs"] for r in rows.values()) == len(pairs)


def test_psi_python_replica_and_nonnegative(spark):
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.curation import (
        PSI_BUCKET, psi_drift_by_source)

    t = pq.read_table(f"{SF_CORRECT}/documents.parquet",
                      columns=["source", "n_chars"])
    pairs = list(zip(t["source"].to_pylist(), t["n_chars"].to_pylist()))
    cnt: Counter = Counter((s, n // PSI_BUCKET) for s, n in pairs)
    sources = {s for s, _ in cnt}
    buckets = {b for _, b in cnt}
    n_g = len(pairs)
    nb = len(buckets)
    c_b = Counter()
    for (s, b), c in cnt.items():
        c_b[b] += c
    rows = {r["source"]: r
            for r in psi_drift_by_source(spark, SF_CORRECT).collect()}
    assert set(rows) == sources
    for s in sources:
        n_s = sum(c for (s2, _), c in cnt.items() if s2 == s)
        psi = sum(
            (Decimal(f"{x:.10f}") for x in (
                ((cnt.get((s, b), 0) + 1) / float(n_s + nb)
                 - (c_b[b] + 1) / float(n_g + nb))
                * math.log(((cnt.get((s, b), 0) + 1) / float(n_s + nb))
                           / ((c_b[b] + 1) / float(n_g + nb)))
                for b in buckets)),
            Decimal(0))
        r = rows[s]
        assert r["n_docs"] == n_s and r["n_bins"] == nb
        assert r["psi"] == pytest.approx(float(psi), abs=1e-6)
        # smoothed p and q are proper distributions -> every term and
        # hence PSI is >= 0 (Gibbs' inequality, symmetrized)
        assert r["psi"] >= 0


def test_heaps_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        HEAPS_BUCKET_DOCS, heaps_law_fit)

    nt_b: Counter = Counter()
    first: dict = {}
    for doc_id, text in sorted(_doc_rows(SF_CORRECT)):
        toks = text.split(" ")
        nt_b[doc_id // HEAPS_BUCKET_DOCS] += len(toks)
        for w in toks:
            if w not in first or doc_id < first[w]:
                first[w] = doc_id
    new_b: Counter = Counter()
    for w, fd in first.items():
        new_b[fd // HEAPS_BUCKET_DOCS] += 1
    n = v = 0
    xs, ys = [], []
    for b in sorted(nt_b):
        n += nt_b[b]
        v += new_b.get(b, 0)
        xs.append(float(Decimal(f"{math.log(n):.10f}")))
        ys.append(float(Decimal(f"{math.log(v):.10f}")))
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(round(x * y, 10) for x, y in zip(xs, ys))
    sx2 = sum(round(x * x, 10) for x in xs)
    beta = (k * sxy - sx * sy) / (k * sx2 - sx * sx)
    ln_k = (sy - beta * sx) / k

    r = heaps_law_fit(spark, SF_CORRECT).collect()[0]
    assert r["n_points"] == k
    assert r["total_tokens"] == n and r["vocab_size"] == v
    assert r["heaps_beta"] == pytest.approx(beta, abs=1e-5)
    assert r["heaps_ln_k"] == pytest.approx(ln_k, abs=1e-4)
    assert 0 <= r["heaps_beta"] < 1   # vocabulary grows sublinearly


def test_dedup_token_impact_consistent_with_components(spark):
    """The token bill must reconcile EXACTLY with the standalone
    operators it composes: exact-removed docs vs exact_dedup's copy
    counts, near-removed docs vs the canonical flags of exact
    keepers, and the integer token identity raw = removed + surviving."""
    from mapreduce_in_pthreads_spark.operators.curation import \
        dedup_token_impact
    from mapreduce_in_pthreads_spark.operators.dedup import exact_dedup
    from mapreduce_in_pthreads_spark.operators.iterative import \
        connected_components_dedup

    rows = dedup_token_impact(spark, SF_CORRECT).collect()
    ed = exact_dedup(spark, SF_CORRECT).collect()
    cc = {r["doc_id"]: r["is_canonical"]
          for r in connected_components_dedup(spark, SF_CORRECT)
          .collect()}
    keepers = {r["keep_doc_id"] for r in ed}

    assert sum(r["exact_removed_docs"] for r in rows) \
        == sum(r["n_copies"] - 1 for r in ed)
    assert sum(r["near_removed_docs"] for r in rows) \
        == sum(1 for d in keepers if not cc[d])
    for r in rows:
        assert (r["raw_tokens"] == r["exact_removed_tokens"]
                + r["near_removed_tokens"] + r["surviving_tokens"])
        assert r["savings_share"] == pytest.approx(
            round((r["raw_tokens"] - r["surviving_tokens"])
                  / r["raw_tokens"], 10), abs=1e-12)
