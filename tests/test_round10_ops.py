"""Semantic pins for the round-10 additions. The oracle contract proves
Spark==DuckDB; these prove both equal the algorithm as specified — the
audio-fingerprint retrieval pinned against a pure-python struct-unpack
replica (int16-LE PCM windows, first-max peaks, landmark packing,
brute-force shared-fingerprint retrieval)."""

from __future__ import annotations

import struct
from collections import Counter

from .conftest import SF_CORRECT


def _docs():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_CORRECT}/documents.parquet",
                      columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _fingerprints():
    """doc_id -> set of landmark fingerprints, by the module's spec."""
    from mapreduce_in_pthreads_spark.operators.multimodal import (
        AUDIO_WIN, FP_BAND_SHIFT, FP_DPOS_SHIFT, FP_MAX_WIN)

    fps: dict[int, set[int]] = {}
    for doc_id, text in _docs():
        payload = text.encode("utf-8")
        buf = payload[:len(payload) & ~1]
        samples = [struct.unpack("<h", buf[2 * i:2 * i + 2])[0]
                   for i in range(len(buf) // 2)]
        n_win = min(len(samples) // AUDIO_WIN, FP_MAX_WIN)
        peaks = []
        for w in range(n_win):
            win = samples[w * AUDIO_WIN:(w + 1) * AUDIO_WIN]
            pv = max(win)
            peaks.append((pv, win.index(pv)))  # FIRST max position
        out = set()
        for (pv1, pp1), (pv2, pp2) in zip(peaks, peaks[1:]):
            out.add(((pv1 + 32768) >> FP_BAND_SHIFT) * 512
                    + ((pv2 + 32768) >> FP_BAND_SHIFT) * 16
                    + (((pp2 - pp1 + AUDIO_WIN) % AUDIO_WIN)
                       >> FP_DPOS_SHIFT))
        if out:
            fps[doc_id] = out
    return fps


def _replica():
    from mapreduce_in_pthreads_spark.operators.multimodal import (
        FP_TOP_K, N_AUDIO_QUERIES)

    fps = _fingerprints()
    exp = []
    for q_doc, qset in fps.items():
        if q_doc >= N_AUDIO_QUERIES:
            continue
        scores = Counter()
        for doc_id, cset in fps.items():
            if doc_id != q_doc and qset & cset:
                scores[doc_id] = len(qset & cset)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (doc_id, shared) in enumerate(ranked[:FP_TOP_K], 1):
            exp.append((q_doc, doc_id, rank, shared))
    return exp


def test_audio_fingerprint_python_replica(spark):
    """Every (query, match, rank, score) row must equal the
    struct-unpack brute-force replica — same fingerprints, same
    intersection counts, same (score desc, doc_id) ranking."""
    from mapreduce_in_pthreads_spark.operators.multimodal import (
        audio_fingerprint_retrieval)

    got = sorted(tuple(r) for r in
                 audio_fingerprint_retrieval(spark, SF_CORRECT).collect())
    assert got == sorted(_replica())
    assert got, "retrieval must be non-degenerate at the test SF"


def test_audio_fingerprint_invariants(spark):
    """Structural invariants: ranks are 1..k dense per query with
    non-increasing scores, matches never echo the query clip, and
    every query doc is inside the declared query id range."""
    from mapreduce_in_pthreads_spark.operators.multimodal import (
        FP_TOP_K, N_AUDIO_QUERIES, audio_fingerprint_retrieval)

    rows = audio_fingerprint_retrieval(spark, SF_CORRECT).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.q_doc < N_AUDIO_QUERIES
        assert r.match_doc != r.q_doc
        assert r.shared_fps >= 1
        by_q.setdefault(r.q_doc, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= FP_TOP_K
        scores = [r.shared_fps for r in rs]
        assert scores == sorted(scores, reverse=True)
