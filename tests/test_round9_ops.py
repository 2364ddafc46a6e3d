"""Semantic pins for the round-9 additions. The oracle contract proves
Spark==DuckDB; these prove both equal the algorithm as specified — the
keyframe/caption alignment pinned against a pure-python byte-level
replica (UTF-8 span tiling, shot-cut selection, caption windowing)."""

from __future__ import annotations

from .conftest import SF_CORRECT


def _docs():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_CORRECT}/documents.parquet",
                      columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _replica():
    from mapreduce_in_pthreads_spark.operators.multimodal import (
        CAPTION_W, FRAME_BYTES, SHOT_DELTA_THRESH)

    exp = []
    for doc_id, text in _docs():
        payload = text.encode("utf-8")
        n_frames = max(len(payload) // FRAME_BYTES, 1)
        prev, keyframes = None, []
        for f in range(n_frames):
            inten = sum(payload[f * FRAME_BYTES:(f + 1) * FRAME_BYTES])
            if f == 0 or (prev is not None
                          and abs(inten - prev) >= SHOT_DELTA_THRESH):
                keyframes.append((f, inten))
            prev = inten
        tokens = text.split(" ")
        spans = [0]
        for tok in tokens:
            spans.append(spans[-1] + len(tok.encode("utf-8")) + 1)
        k = 0
        for f, inten in keyframes:
            pos = f * FRAME_BYTES
            while spans[k + 1] <= pos:
                k += 1
            exp.append((doc_id, f, pos, inten, k,
                        " ".join(tokens[k:k + CAPTION_W])))
    return exp


def test_keyframe_caption_python_replica(spark):
    """Every (keyframe, caption) pair must equal the byte-level
    replica: same keyframe set (frame 0 + cuts), same aligned token,
    same caption window."""
    from mapreduce_in_pthreads_spark.operators.multimodal import (
        keyframe_caption_align)

    got = sorted(tuple(r) for r in
                 keyframe_caption_align(spark, SF_CORRECT).collect())
    assert got == sorted(_replica())


def test_keyframe_caption_invariants(spark):
    """Structural invariants: frame 0 of every doc is a keyframe; byte
    positions are frame-aligned; token spans tile, so every keyframe
    aligns to a token whose span contains its position."""
    from mapreduce_in_pthreads_spark.operators.multimodal import (
        CAPTION_W, FRAME_BYTES, keyframe_caption_align)

    rows = keyframe_caption_align(spark, SF_CORRECT).collect()
    docs = dict(_docs())
    seen_zero = set()
    for r in rows:
        assert r.byte_pos == r.frame_idx * FRAME_BYTES
        if r.frame_idx == 0:
            seen_zero.add(r.doc_id)
        tokens = docs[r.doc_id].split(" ")
        start = sum(len(t.encode("utf-8")) + 1
                    for t in tokens[:r.token_idx])
        end = start + len(tokens[r.token_idx].encode("utf-8")) + 1
        assert start <= r.byte_pos < end, r
        assert r.caption == " ".join(
            tokens[r.token_idx:r.token_idx + CAPTION_W])
    assert seen_zero == set(docs), "frame 0 missing for some doc"
