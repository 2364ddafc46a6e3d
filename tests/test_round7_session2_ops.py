"""Semantic pins for the round-7 session-2 additions
(good_turing_discounts, seasonal_naive_mase, session_overlap_pairs,
table_stats_profile). The oracle contract proves Spark==DuckDB; these
prove both equal the algorithm as specified — including the lossless
claim of the bucketed interval join, which is pinned against an
all-pairs brute force."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from .conftest import SF_CORRECT, SF_SMOKE


def _doc_texts(sf_dir: str) -> list[str]:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["text"])["text"].to_pylist()


def _events(sf_dir: str) -> list[tuple[int, int, int]]:
    """(user_id, event_id, ts_epoch_us) triples."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_id", "ts"])
    ts_us = t["ts"].cast("int64").to_pylist()
    return list(zip(t["user_id"].to_pylist(),
                    t["event_id"].to_pylist(), ts_us))


def test_good_turing_python_replica(spark):
    """r, N_r, N_{r+1}, r* and class mass must equal a Counter-based
    Good-Turing replica over the same trigram table; r* uses the
    textbook (r+1)N_{r+1}/N_r with N at EXACTLY r+1 (a gap in the FoF
    table must yield r*=0, not the next populated class)."""
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        GT_MAX_R, good_turing_discounts)

    counts: Counter = Counter()
    for text in _doc_texts(SF_CORRECT):
        t = text.split(" ")
        for g in zip(t, t[1:], t[2:]):
            counts[g] += 1
    fof = Counter(counts.values())
    n_total = sum(counts.values())

    rows = good_turing_discounts(spark, SF_CORRECT).collect()
    assert {r["r"] for r in rows} == {r for r in fof if r <= GT_MAX_R}
    for row in rows:
        r = row["r"]
        assert row["n_r"] == fof[r]
        assert row["n_next"] == fof.get(r + 1, 0)
        assert row["n_total"] == n_total
        r_star = (r + 1) * fof.get(r + 1, 0) / fof[r]
        assert row["r_star"] == pytest.approx(r_star, abs=1e-12)
        assert row["class_mass"] == pytest.approx(
            r_star * fof[r] / n_total, abs=1e-12)
    # the discounted masses of the reported classes are a proper
    # sub-unit share of the distribution
    assert 0.0 < sum(r["class_mass"] for r in rows) < 1.0


def test_seasonal_naive_mase_python_replica(spark):
    """MASE per event_type must equal a dense-grid numpy-free replica:
    hourly counts, lag-24 abs diffs, last-24h test split."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.timeseries import (
        MASE_SEASON_H, seasonal_naive_mase)

    t = pq.read_table(f"{SF_CORRECT}/events.parquet",
                      columns=["event_type", "ts"])
    hours = [us // 3_600_000_000
             for us in t["ts"].cast("int64").to_pylist()]
    types = t["event_type"].to_pylist()
    counts = Counter(zip(types, hours))
    hmin, hmax = min(hours), max(hours)

    want = {}
    for et in set(types):
        y = {h: counts.get((et, h), 0) for h in range(hmin, hmax + 1)}
        train, test = [], []
        for h in range(hmin + MASE_SEASON_H, hmax + 1):
            ad = abs(y[h] - y[h - MASE_SEASON_H])
            (test if h > hmax - MASE_SEASON_H else train).append(ad)
        want[et] = (len(train), len(test),
                    sum(train) / len(train), sum(test) / len(test))

    rows = seasonal_naive_mase(spark, SF_CORRECT).collect()
    assert {r["event_type"] for r in rows} == set(want)
    for row in rows:
        n_train, n_test, mae_tr, mae_te = want[row["event_type"]]
        assert row["n_train"] == n_train
        assert row["n_test"] == n_test == MASE_SEASON_H
        assert row["mae_insample"] == pytest.approx(mae_tr, abs=1e-12)
        assert row["mae_test"] == pytest.approx(mae_te, abs=1e-12)
        assert row["mase"] == pytest.approx(mae_te / mae_tr, abs=1e-12)


def _replica_sessions(sf_dir: str, gap_us: int):
    """[(user, start, end_exclusive)] with the 30-min tail applied."""
    by_user: defaultdict = defaultdict(list)
    for u, eid, ts in _events(sf_dir):
        by_user[u].append((ts, eid))
    sessions = []
    for u, evs in by_user.items():
        evs.sort()
        start = prev = None
        for ts, _ in evs:
            if start is None or ts - prev > gap_us:
                if start is not None:
                    sessions.append((u, start, prev + gap_us))
                start = ts
            prev = ts
        sessions.append((u, start, prev + gap_us))
    return sessions


def test_session_overlap_brute_force_replica(spark):
    """The bucketed interval join must be LOSSLESS: per-day pair
    counts and mean overlap must equal an all-pairs O(n^2) brute force
    over the same session intervals (no pair missed by bucketing, no
    pair double-counted across the buckets it spans)."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        OVL_GAP_US, OVL_HOUR_US, session_overlap_pairs)

    sessions = _replica_sessions(SF_SMOKE, OVL_GAP_US)
    per_day: defaultdict = defaultdict(list)
    for i in range(len(sessions)):
        u1, s1, e1 = sessions[i]
        for j in range(i + 1, len(sessions)):
            u2, s2, e2 = sessions[j]
            if u1 == u2:
                continue
            lo, hi = max(s1, s2), min(e1, e2)
            if lo < hi:
                per_day[(lo // OVL_HOUR_US) // 24].append(hi - lo)

    rows = session_overlap_pairs(spark, SF_SMOKE).collect()
    got = {r["day"].toordinal() - 719163: r for r in rows}  # epoch day
    assert set(got) == set(per_day)
    for day, spans in per_day.items():
        assert got[day]["n_pairs"] == len(spans)
        assert got[day]["avg_overlap_s"] == pytest.approx(
            sum(spans) / len(spans) / 1e6, abs=1e-9)
    # same-user sessions can never overlap (gap > tail by construction)
    by_user: defaultdict = defaultdict(list)
    for u, s, e in sessions:
        by_user[u].append((s, e))
    for ivs in by_user.values():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert e1 <= s2


def test_table_stats_profile_pyarrow_replica(spark):
    """Per-column stats must equal a pyarrow replica; every branch's
    parquet scan must read exactly ONE column (the documented
    k-narrow-scans-not-Expand plan shape)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.layout import (
        _PROFILE_COLS, table_stats_profile)

    df = table_stats_profile(spark, SF_CORRECT)
    rows = {r["column_name"]: r for r in df.collect()}
    assert set(rows) == {c for c, _ in _PROFILE_COLS}

    t = pq.read_table(f"{SF_CORRECT}/lineitem.parquet",
                      columns=[c for c, _ in _PROFILE_COLS])
    for col, kind in _PROFILE_COLS:
        arr = t[col]
        vals = arr.to_pylist()
        nonnull = [v for v in vals if v is not None]
        if kind == "date":
            nonnull = [v.date() for v in nonnull]
        r = rows[col]
        assert r["n_rows"] == len(vals)
        assert r["n_nonnull"] == len(nonnull)
        assert r["ndv"] == len(set(nonnull))
        assert r["min_str"] == str(min(nonnull))
        assert r["max_str"] == str(max(nonnull))

    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    # an executed adaptive plan prints initial+final, so count as a set
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", plan))
    assert len(schemas) == len(_PROFILE_COLS)
    for s in schemas:
        assert s.count(":") == 1, f"branch reads >1 column: {s}"
