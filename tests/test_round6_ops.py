"""Semantic pins for the round-6 operators — each asserts the CLAIM in
the operator's docstring (the oracle contract already pins the values;
these pin the story the values are supposed to tell)."""

from __future__ import annotations

from .conftest import SF_CORRECT


def test_zorder_balances_both_dimensions(spark):
    """Z-order must scan less than the linear layouts' BAD dimension
    on BOTH dimensions, and be roughly balanced across them."""
    from mapreduce_in_pthreads_spark.operators.layout import \
        zorder_pruning_audit

    rows = {r["layout"]: r
            for r in zorder_pruning_audit(spark, SF_CORRECT).collect()}
    z, lu, lh = (rows["zorder"], rows["linear_user"],
                 rows["linear_hour"])
    # each linear layout is near-unprunable on its OTHER dimension
    assert lu["scan_frac_hour"] > 0.5 and lh["scan_frac_user"] > 0.5
    # z-order beats that collapse on both dimensions by >2x
    assert z["scan_frac_user"] < lh["scan_frac_user"] / 2
    assert z["scan_frac_hour"] < lu["scan_frac_hour"] / 2
    # and is balanced: neither dimension pays more than 3x the other
    ratio = z["scan_frac_user"] / z["scan_frac_hour"]
    assert 1 / 3 < ratio < 3


def test_wand_guarantee_and_nontrivial_pruning(spark):
    from mapreduce_in_pthreads_spark.operators.text_analysis import \
        wand_upper_bound_pruning

    rows = wand_upper_bound_pruning(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r["n_violations"] == 0          # the safety guarantee
        assert 0 < r["n_prunable"] < r["n_candidates"]


def test_band_sweep_recall_monotone_in_rows(spark):
    """1-(1-j^r)^b with b*r fixed is DECREASING in r for j in (0,1):
    stricter bands trade recall for precision — the s-curve lesson."""
    from mapreduce_in_pthreads_spark.operators.dedup import \
        minhash_band_sweep

    rows = sorted(minhash_band_sweep(spark, SF_CORRECT).collect(),
                  key=lambda r: r["rows_per_band"])
    recalls = [r["expected_recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    assert rows[0]["expected_recall"] > 0.99   # (8,1) catches ~all
    js = [r["j_star"] for r in rows]
    assert js == sorted(js)                    # threshold rises with r


def test_reciprocal_nn_pairs_are_mutual_and_in_cell(spark):
    from pyspark.sql import functions as F

    from mapreduce_in_pthreads_spark.operators.similarity import \
        reciprocal_nn_pairs
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    pairs = reciprocal_nn_pairs(spark, SF_CORRECT)
    lab = load_table(spark, SF_CORRECT, "embeddings").select(
        "vec_id", "label")
    rows = (pairs
            .join(lab.withColumnRenamed("vec_id", "vec_a")
                  .withColumnRenamed("label", "la"), "vec_a")
            .join(lab.withColumnRenamed("vec_id", "vec_b")
                  .withColumnRenamed("label", "lb"), "vec_b")).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["la"] == r["lb"]              # blocked within cell
        assert r["vec_a"] < r["vec_b"]         # canonical direction
        key = (r["vec_a"], r["vec_b"])
        assert key not in seen                 # each pair once
        seen.add(key)
        assert -1.0 <= r["cos_sim"] <= 1.0


def test_suffix_prefix_overlap_verifies(spark):
    """Every reported pair must actually overlap by overlap_k tokens,
    re-checked in Python against the raw text."""
    from mapreduce_in_pthreads_spark.operators.dedup import \
        suffix_prefix_overlap
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    docs = {r["doc_id"]: r["text"].split(" ")
            for r in load_table(spark, SF_CORRECT, "documents")
            .collect()}
    rows = suffix_prefix_overlap(spark, SF_CORRECT).collect()
    assert rows
    for r in rows[:200]:
        a, b, k = docs[r["doc_a"]], docs[r["doc_b"]], r["overlap_k"]
        assert k >= 2
        assert a[-k:] == b[:k]
        # maximality: k+1 must NOT match (or exceed a doc)
        k1 = k + 1
        assert (k1 > min(len(a), len(b))
                or a[-k1:] != b[:k1])


def test_weighted_sample_prefers_heavy_docs(spark):
    """A-ES with w = n_chars must over-represent long documents: the
    sample's mean weight exceeds the corpus mean weight."""
    from pyspark.sql import functions as F

    from mapreduce_in_pthreads_spark.operators.curation import \
        weighted_sample_aes
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    sample_mean = (weighted_sample_aes(spark, SF_CORRECT)
                   .agg(F.avg("weight")).first()[0])
    corpus_mean = (load_table(spark, SF_CORRECT, "documents")
                   .agg(F.avg("n_chars")).first()[0])
    assert sample_mean > corpus_mean


def test_calibration_bins_partition_corpus(spark):
    from pyspark.sql import functions as F

    from mapreduce_in_pthreads_spark.operators.evaluation import \
        lang_confidence_calibration
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    out = lang_confidence_calibration(spark, SF_CORRECT).collect()
    assert len(out) >= 3                       # non-degenerate spread
    n_total = (load_table(spark, SF_CORRECT, "documents").count())
    assert sum(r["n_docs"] for r in out) == n_total  # nothing dropped
    for r in out:
        assert 0.0 <= r["mean_conf"] <= 1.0
        assert 0.0 <= r["accuracy"] <= 1.0


def test_kappa_below_accuracy_for_skewed_chance(spark):
    """kappa must sit below raw agreement whenever chance agreement is
    positive — the whole point of the correction."""
    from mapreduce_in_pthreads_spark.operators.evaluation import \
        cohens_kappa_lang

    r = cohens_kappa_lang(spark, SF_CORRECT).first()
    assert 0 < r["pe"] < 1
    assert r["kappa"] < r["po"]
    assert -1.0 <= r["kappa"] <= 1.0
