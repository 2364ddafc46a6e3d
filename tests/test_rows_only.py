"""Unit tests for queries without a SQL oracle (the driver only
rows-checks these, so the real assertions live here)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mapreduce_in_pthreads_spark.plans.registry import REGISTRY


def test_approx_distinct_bounded(spark, sf_dir):
    """Audit panel: exact NDVs match a recomputation and the HLL++
    within-5% flags (the driver-adjudicated bound) hold."""
    row = REGISTRY["approx_distinct"].fn(spark, sf_dir).first()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert row.exact_orders == li.select("l_orderkey").distinct().count()
    assert row.exact_parts == li.select("l_partkey").distinct().count()
    assert row.orders_within_bound == 1
    assert row.parts_within_bound == 1


def test_simhash_deterministic_and_64bit(spark, sf_dir):
    df = REGISTRY["simhash_fingerprints"].fn(spark, sf_dir)
    a = {r.doc_id: r.simhash_hex for r in df.collect()}
    b = {r.doc_id: r.simhash_hex for r in
         REGISTRY["simhash_fingerprints"].fn(spark, sf_dir).collect()}
    assert a == b                       # deterministic across runs
    assert len(a) == 500
    # 64 bits as 16 lowercase hex chars
    assert all(isinstance(v, str) and len(v) == 16
               and set(v) <= set("0123456789abcdef") for v in a.values())
    # near-dup contract: identical docs → identical fingerprints
    # (all docs distinct here, so just check the fingerprint spreads)
    assert len(set(a.values())) > 400


def test_simhash_matches_pure_python_reference(spark):
    """Pin the bit layout against an independent pure-Python simhash
    over md5 (bit i = bit (i%4) of nibble (15 - i//4); vote > 0 sets
    the bit) — guards both engines against a silent layout drift."""
    import hashlib

    from .conftest import SF_SMOKE

    rows = REGISTRY["simhash_fingerprints"].fn(spark, SF_SMOKE).collect()
    got = {r.doc_id: r.simhash_hex for r in rows}
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet",
                        columns=["doc_id", "text"])
    for doc_id, text in list(zip(tbl["doc_id"].to_pylist(),
                                 tbl["text"].to_pylist()))[:25]:
        votes = [0] * 64
        for word in text.split(" "):
            h = int(hashlib.md5(word.encode()).hexdigest()[:16], 16)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        fp = sum(1 << i for i in range(64) if votes[i] > 0)
        assert got[doc_id] == format(fp, "016x"), doc_id


def test_label_centroid_norms_vs_numpy(spark, sf_dir):
    got = {r.label: r.centroid_norm
           for r in REGISTRY["label_centroid_norms"].fn(spark, sf_dir).collect()}
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    for label, grp in tbl.groupby("label"):
        mat = np.stack(grp["embedding"].map(np.asarray)).astype(np.float64)
        centroid = np.mean(mat, axis=0)
        expect = float(np.linalg.norm(centroid))
        # decimal pinning at 1e-10 perturbs the norm ~1e-9; float32
        # inputs only carry ~1e-7 anyway
        assert math.isclose(got[label], expect, rel_tol=1e-7), label
    assert len(got) == 10


def test_lang_id_domain_and_determinism(spark, sf_dir):
    df = REGISTRY["lang_id_heuristic"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 500
    assert {r.pred_lang for r in rows} <= {"de", "en", "es", "fr", "zh"}
    assert all(r.marker_hits >= 0 for r in rows)


def test_minhash_lsh_subset_of_exact(spark, sf_dir):
    """LSH output must be a SUBSET of the exact Jaccard join at the
    same threshold (LSH can miss pairs, never invent them)."""
    lsh = {(r.doc_a, r.doc_b)
           for r in REGISTRY["minhash_lsh_dedup"].fn(spark, sf_dir).collect()}
    exact = {(r.doc_a, r.doc_b)
             for r in REGISTRY["jaccard_similarity_join"].fn(spark, sf_dir).collect()}
    assert lsh <= exact


def test_ann_ivf_subset_of_bruteforce_candidates(spark, sf_dir):
    """IVF results only contain same-cell vectors; each result's
    similarity must equal the brute-force similarity for that pair."""
    bf = {(r.query_id, r.vec_id): r.cos_sim
          for r in REGISTRY["ann_topk_bruteforce"].fn(spark, sf_dir).collect()}
    ivf = REGISTRY["ann_ivf_topk"].fn(spark, sf_dir).collect()
    emb_label = {r.vec_id: r.label for r in
                 spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                 .select("vec_id", "label").collect()}
    for r in ivf:
        assert emb_label[r.vec_id] == emb_label[r.query_id]
        if (r.query_id, r.vec_id) in bf:
            assert bf[(r.query_id, r.vec_id)] == r.cos_sim


def test_pagerank_mass_and_determinism(spark, sf_dir):
    """PageRank invariants: Σrank ≈ 1 (dangling correction holds),
    all ranks positive, deterministic at the rounded precision, and
    the top word is a high-degree hub (sanity)."""
    fn = REGISTRY["pagerank_word_graph"].fn
    a = {r.word: r.rank for r in fn(spark, sf_dir).collect()}
    b = {r.word: r.rank for r in fn(spark, sf_dir).collect()}
    assert a == b
    assert abs(sum(a.values()) - 1.0) < 1e-6
    assert all(v > 0 for v in a.values())
    assert len(a) >= 30


def test_multimodal_decode_headers():
    """decode_image is a real pure-Python header decode: correct dims
    for spec-valid PNG/BMP headers, ValueError (never a crash class the
    mapInPandas caller can't map to NULLs) on unrecognized payloads."""
    import struct

    from mapreduce_in_pthreads_spark.operators.multimodal import decode_image

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    assert decode_image(png) == ("PNG", 640, 480)
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG....")  # truncated magic-only payload
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")


def test_inverted_index_partition_invariance(spark, sf_dir):
    """Reference invariant (SURVEY.md §2.2): result independent of
    reducer count — here, of spark.sql.shuffle.partitions."""
    fn = REGISTRY["inverted_index"].fn
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        many = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert one == many


def test_stratified_sample_invariants(spark, sf_dir):
    """The raw sampleBy draw (the entry's internal stage) stays
    deterministic for a fixed seed and a strict subset of the source;
    the entry's audit panel (now driver-adjudicated) reports every
    stratum within its 6-sigma binomial band with exact stratum sizes
    and the requested fractions."""
    from mapreduce_in_pthreads_spark.operators.curation import (
        SAMPLE_FRACTIONS, SAMPLE_SEED)
    from mapreduce_in_pthreads_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    draw = lambda: {(r.doc_id, r.lang) for r in docs.sampleBy(
        "lang", SAMPLE_FRACTIONS, seed=SAMPLE_SEED)
        .select("doc_id", "lang").collect()}
    a, b = draw(), draw()
    assert a == b, "sampleBy not deterministic for fixed seed"
    source = {(r.doc_id, r.lang) for r in
              docs.select("doc_id", "lang").collect()}
    assert a <= source
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    panel = {r.lang: r for r in
             REGISTRY["stratified_sample_fractions"]
             .fn(spark, sf_dir).collect()}
    assert set(panel) == set(SAMPLE_FRACTIONS) & set(totals)
    for lang, r in panel.items():
        assert r.n_stratum == totals[lang]
        assert r.sample_frac == SAMPLE_FRACTIONS[lang]
        assert r.rate_within_6sigma == 1, (lang, r)


def test_ann_blas_matches_bruteforce(spark, sf_dir):
    """The BLAS/Arrow fast path must agree with the expression-kernel
    bruteforce: the entry's own agreement panel (set equality +
    sims-within-1e-9, now driver-adjudicated) must report all-1 flags
    for every query with a full top-k."""
    from mapreduce_in_pthreads_spark.operators.similarity import (
        N_QUERIES, TOP_K)
    rows = REGISTRY["ann_topk_blas"].fn(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert r.n_topk == TOP_K, r
        assert r.set_matches_expression == 1, r
        assert r.sims_within_tolerance == 1, r


def test_hll_sketch_users_bounds(spark, sf_dir):
    """Audit panel: exact distincts match recomputation, every
    within-5% flag (incl. the sketch-UNION 'ALL' row's) holds, and
    the raw union estimate still covers at least the largest type and
    at most the sum of per-type estimates (recomputed here — the
    entry's output deliberately carries only exact values + flags)."""
    rows = {r.event_type: r for r in
            REGISTRY["hll_sketch_users"].fn(spark, sf_dir).collect()}
    all_row = rows.pop("ALL")
    assert rows, "expected per-type sketch rows"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {r.event_type: r.n for r in ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")).collect()}
    for et, r in rows.items():
        assert r.exact_users == exact[et]
        assert r.est_within_bound == 1
    assert all_row.exact_users == ev.select("user_id").distinct().count()
    assert all_row.est_within_bound == 1
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"))
    ests = {r.event_type: r.e for r in sk.select(
        "event_type", F.hll_sketch_estimate("sk").alias("e")).collect()}
    union_est = sk.agg(F.hll_sketch_estimate(
        F.hll_union_agg("sk")).alias("e")).first().e
    assert union_est >= max(ests.values())
    assert union_est <= sum(ests.values())


def test_quantization_error_bound(spark, sf_dir):
    """Dequantized values must sit within half a quantization step of
    the originals: |x - code/scale| <= 0.5/scale (+1 ulp slack)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = REGISTRY["embedding_quantize_int8"].fn(spark, sf_dir)
    originals = {r.vec_id: r.embedding for r in emb.collect()}
    for r in q.collect():
        scale = 127.0 / r.abs_max
        step = 0.5 / scale
        xs = originals[r.vec_id]
        # codes ship as a space-joined string (the comparison harness
        # cannot hash list cells) — parse back for the numeric check
        codes = [int(c) for c in r.codes.split(" ")]
        assert len(xs) == len(codes)
        for x, code in zip(xs, codes):
            assert abs(x - code / scale) <= step * (1 + 1e-9)
            assert -127 <= code <= 127


def test_approx_top_k_words_counts_exact(spark, sf_dir):
    """With maxItemsTracked >= vocabulary, approx_top_k counts are
    exact: every sketched (word, count) must equal the exact aggregate,
    and every word with count above the top-20 boundary must appear."""
    from pyspark.sql import functions as F

    from mapreduce_in_pthreads_spark.plans.registry import REGISTRY

    sketched = {r.word: r.n_occurrences
                for r in REGISTRY["approx_top_k_words"]
                .fn(spark, sf_dir).collect()}
    exact = {r.word: r.n_occurrences
             for r in REGISTRY["word_count"].fn(spark, sf_dir).collect()}
    assert len(sketched) == 20
    for w, c in sketched.items():
        assert exact[w] == c, w
    boundary = min(sketched.values())
    strictly_above = {w for w, c in exact.items() if c > boundary}
    assert strictly_above <= set(sketched)


def test_incremental_merge_equals_direct_index(spark, sf_dir):
    """Merge-equivalence pinned inside Spark too (the oracle already
    proves it vs DuckDB): state+delta partial-postings merge must be
    row-identical to the direct full-corpus flagship."""
    direct = sorted(map(tuple, REGISTRY["inverted_index"]
                        .fn(spark, sf_dir).collect()))
    merged = sorted(map(tuple, REGISTRY["incremental_index_merge"]
                        .fn(spark, sf_dir).collect()))
    assert direct == merged


def test_triangle_count_graph_invariants(spark, sf_dir):
    """Census sanity: edges bounded by C(nodes,2), triangles by
    C(nodes,3), and nothing negative."""
    row = REGISTRY["triangle_count"].fn(spark, sf_dir).collect()[0]
    n, e, t = row.n_nodes, row.n_edges, row.n_triangles
    assert 0 <= e <= n * (n - 1) // 2
    assert 0 <= t <= n * (n - 1) * (n - 2) // 6
    assert n > 0 and e > 0  # the sf0.01 corpus graph is non-trivial


def test_ann_lsh_same_bucket_and_scores_match_bruteforce(spark, sf_dir):
    """LSH results must score identically to bruteforce for the same
    (query, vec) pair, and every returned neighbor shares the query's
    sign-LSH bucket — asserted by RECOMPUTING the buckets here with an
    independent numpy replica of the quantize+project pipeline (ADVICE
    r3: the bucket claim must be checked, not just stated)."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.similarity import _lsh_signs

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {vid: np.asarray(e, dtype=np.float64)
           for vid, e in zip(tbl["vec_id"].to_pylist(),
                             tbl["embedding"].to_pylist())}
    signs = np.asarray(_lsh_signs(), dtype=np.int64)  # (planes, dims)

    def bucket(vid: int) -> str:
        v = emb[vid]
        x = v * (127.0 / np.abs(v).max())
        # Spark round() is HALF_UP (away from zero); np.round is
        # half-to-even — replicate Spark's rule explicitly.
        codes = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        return "".join("1" if p >= 0 else "0" for p in signs @ codes)

    bf = {(r.query_id, r.vec_id): r.cos_sim for r in
          REGISTRY["ann_topk_bruteforce"].fn(spark, sf_dir).collect()}
    lsh = REGISTRY["ann_lsh_topk"].fn(spark, sf_dir).collect()
    assert len(lsh) > 0
    n_overlap = 0
    for r in lsh:
        assert bucket(r.query_id) == bucket(r.vec_id), (
            "cross-bucket member", r.query_id, r.vec_id)
        if (r.query_id, r.vec_id) in bf:
            n_overlap += 1
            assert bf[(r.query_id, r.vec_id)] == r.cos_sim, (
                r.query_id, r.vec_id)
    # the score-parity clause must actually bite, not vacuously pass
    assert n_overlap > 0, "no (query, vec) overlap with bruteforce top-k"


def test_delta_dedup_consistent_with_lsh_and_exact(spark, sf_dir):
    """Cross-operator consistency for the incremental dedup: every
    drop_near incoming doc must appear in a minhash_lsh_dedup verified
    pair (the delta op reuses that exact candidate pipeline, filtered
    to cross-membership pairs), and every drop_exact doc's fingerprint
    must be a multi-copy group in exact_dedup."""
    import hashlib

    delta = REGISTRY["delta_dedup_vs_corpus"].fn(spark, sf_dir).collect()
    assert delta, "incoming batch must not be empty"
    incoming_ids = {r.doc_id for r in delta}
    # membership split must match the md5 contract
    for r in delta:
        assert hashlib.md5(str(r.doc_id).encode()).hexdigest()[0] >= "c"

    lsh_pairs = REGISTRY["minhash_lsh_dedup"].fn(spark, sf_dir).collect()
    lsh_docs = {r.doc_a for r in lsh_pairs} | {r.doc_b for r in lsh_pairs}
    for r in delta:
        if r.decision == "drop_near":
            assert r.n_near_dups > 0
            assert r.doc_id in lsh_docs, r.doc_id
        if r.decision == "drop_exact":
            assert r.is_exact_dup == 1

    # every drop_exact doc's content fingerprint must be a multi-copy
    # group in the symmetric exact census (an exact dup of an existing
    # doc implies ≥ 2 copies corpus-wide)
    exact = REGISTRY["exact_dedup"].fn(spark, sf_dir).collect()
    dup_groups = {r.fingerprint for r in exact if r.n_copies > 1}
    from pyspark.sql import functions as F
    fp_by_doc = {
        r.doc_id: r.fp
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.md5("text").alias("fp")).collect()}
    for r in delta:
        if r.is_exact_dup == 1:
            assert fp_by_doc[r.doc_id] in dup_groups, r.doc_id
    # decisions partition the incoming set
    assert {r.decision for r in delta} <= {"drop_exact", "drop_near", "keep"}
    assert len(incoming_ids) == len(delta)  # one manifest row per doc


def test_embedding_quality_audit_flags_dirty_vectors(spark, tmp_path):
    """The audit's violation branches fire on a synthetic dirty table:
    wrong dim, NaN element, zero vector, and a norm outlier — none of
    which the clean committed corpus contains (its report is all-zero
    violations with unit norms, verified by the oracle contract)."""
    import math

    from mapreduce_in_pthreads_spark.operators.similarity import (
        EMB_DIM, embedding_quality_audit)

    def vec(scale):
        return [float(scale)] * EMB_DIM

    rows = [
        (0, vec(1.0), 0),               # good, norm 8
        (1, vec(1.0), 0),               # good, norm 8
        (2, vec(1.0), 0),               # good, norm 8 (median group)
        (3, vec(10.0), 0),              # good but outlier (norm 80)
        (4, [1.0] * (EMB_DIM - 1), 0),  # wrong dimensionality
        (5, [float("nan")] + [1.0] * (EMB_DIM - 1), 0),  # NaN element
        (6, vec(0.0), 0),               # zero vector (norm 0)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = embedding_quality_audit(spark, str(tmp_path)).collect()[0]
    assert out.n_vecs == 7
    assert out.n_bad_dim == 1
    assert out.n_bad_value == 1
    assert out.n_zero_norm == 1
    # valid set = {0,1,2,3,6}: ranks over norms [0, 8, 8, 8, 80]
    assert out.median_norm == round(math.sqrt(EMB_DIM), 6)
    # outliers vs median 8: the zero vector (0 < 4) and the 80 (> 16)
    assert out.n_outliers == 2
