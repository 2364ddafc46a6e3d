"""Negative controls for the five audit panels (VERDICT r9 item 3).

Each panel outputs within-bound/agreement flags the DuckDB oracle pins
to 1. These tests prove the flags are LIVE computations, not constants
that happen to match the pinned 1s: tightening the panel's band to an
unsatisfiable value must flip the flag to 0 on the same data. Every
band is a module constant read at call time, so monkeypatch swaps it
for one run and pytest restores it afterwards. An impossible (negative)
band is used rather than "~0" so the control cannot pass vacuously even
if an engine approximation happens to be exact on the test corpus.
"""

from __future__ import annotations

from mapreduce_in_pthreads_spark.plans.registry import REGISTRY


def test_approx_distinct_flags_flip_under_impossible_bound(
        spark, sf_dir, monkeypatch):
    from mapreduce_in_pthreads_spark.operators import relational

    monkeypatch.setattr(relational, "APPROX_DISTINCT_BOUND", -1.0)
    row = REGISTRY["approx_distinct"].fn(spark, sf_dir).first()
    # |approx − exact|/exact >= 0 can never be <= -1: both flags must
    # report the violation while the exact counts stay live.
    assert row.orders_within_bound == 0
    assert row.parts_within_bound == 0
    assert row.exact_orders > 0 and row.exact_parts > 0


def test_hll_sketch_flags_flip_under_impossible_bound(
        spark, sf_dir, monkeypatch):
    from mapreduce_in_pthreads_spark.operators import timeseries

    monkeypatch.setattr(timeseries, "HLL_EST_BOUND", -1.0)
    rows = REGISTRY["hll_sketch_users"].fn(spark, sf_dir).collect()
    assert rows, "panel must still emit per-type + ALL rows"
    assert {r.event_type for r in rows} >= {"ALL"}
    for r in rows:
        assert r.est_within_bound == 0, r
        assert r.exact_users > 0, r


def test_approx_quantiles_flags_flip_under_impossible_slack(
        spark, sf_dir, monkeypatch):
    from mapreduce_in_pthreads_spark.operators import timeseries

    # tol = n/accuracy + slack; a hugely negative slack makes the rank
    # interval test unsatisfiable for every group.
    monkeypatch.setattr(timeseries, "APPROX_Q_SLACK", -1e18)
    rows = REGISTRY["approx_quantiles_events"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.median_within_bound == 0, r
        assert r.p99_within_bound == 0, r
        assert r.n_values > 0, r


def test_stratified_sample_flags_flip_under_impossible_band(
        spark, sf_dir, monkeypatch):
    from mapreduce_in_pthreads_spark.operators import curation

    # band = SAMPLE_SIGMA_BAND·σ + 1; with σ ≥ 0 a -1e9 multiplier
    # drives the band far below |n_s − μ| ≥ 0 for every stratum.
    monkeypatch.setattr(curation, "SAMPLE_SIGMA_BAND", -1e9)
    rows = (REGISTRY["stratified_sample_fractions"]
            .fn(spark, sf_dir).collect())
    assert rows
    for r in rows:
        assert r.rate_within_6sigma == 0, r
        assert r.n_stratum > 0, r


def test_ann_blas_sim_flag_flips_under_impossible_tolerance(
        spark, sf_dir, monkeypatch):
    from mapreduce_in_pthreads_spark.operators import similarity

    # maxdiff = max|blas − expression| >= 0 can never be <= -1; the
    # set-equality flag is untouched (it compares the two top-k sets,
    # proven live by test_rows_only.test_ann_blas_matches_bruteforce).
    monkeypatch.setattr(similarity, "BLAS_SIM_TOL", -1.0)
    rows = REGISTRY["ann_topk_blas"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.sims_within_tolerance == 0, r
        assert r.n_topk > 0, r
