"""Semantic pins for the ten round-7 session-2 additions
(good_turing_discounts, seasonal_naive_mase, session_overlap_pairs,
table_stats_profile, sessionization_sensitivity,
hourly_seasonality_strength, negative_sampling_weights,
direct_standardization_rates, rbo_ranker_agreement,
markov_temporal_holdout). The oracle contract proves Spark==DuckDB;
these prove both equal the algorithm as specified — including the
lossless claim of the bucketed interval join (pinned against an
all-pairs brute force) and RBO's depth-membership trick (pinned
against the textbook prefix-intersection formula)."""

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


def test_sessionization_sensitivity_python_replica(spark):
    """sessions(T) = users + #{gaps > T} must equal a per-user sorted
    replica, and the monotonicity a gap CDF implies must hold: larger
    gap thresholds never increase the session count."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        SESS_GAPS_MIN, sessionization_sensitivity)

    by_user: defaultdict = defaultdict(list)
    for u, eid, ts in _events(SF_CORRECT):
        by_user[u].append((ts, eid))
    gaps = []
    for evs in by_user.values():
        evs.sort()
        gaps.extend(b[0] - a[0] for a, b in zip(evs, evs[1:]))
    n_events = sum(len(v) for v in by_user.values())

    rows = {r["gap_minutes"]: r
            for r in sessionization_sensitivity(spark, SF_CORRECT)
            .collect()}
    assert set(rows) == set(SESS_GAPS_MIN)
    prev = None
    for m in sorted(SESS_GAPS_MIN):
        broken = sum(1 for g in gaps if g > m * 60_000_000)
        want_sessions = len(by_user) + broken
        r = rows[m]
        assert r["n_sessions"] == want_sessions
        assert r["events_per_session"] == pytest.approx(
            n_events / want_sessions, abs=1e-12)
        assert r["break_share"] == pytest.approx(
            broken / len(gaps), abs=1e-12)
        if prev is not None:
            assert r["n_sessions"] <= prev  # monotone in the threshold
        prev = r["n_sessions"]


def test_hourly_seasonality_strength_python_replica(spark):
    """Strength must equal a dense-grid replica that mirrors the
    engines' pinning (per-slot S²/n round(·,4) → Decimal sum), and
    must sit in [0, 1] (means-model SS_within <= SS_tot)."""
    import pyarrow.parquet as pq
    from decimal import Decimal

    from mapreduce_in_pthreads_spark.operators.timeseries import (
        hourly_seasonality_strength)

    t = pq.read_table(f"{SF_CORRECT}/events.parquet",
                      columns=["event_type", "ts"])
    hours = [us // 3_600_000_000
             for us in t["ts"].cast("int64").to_pylist()]
    types = t["event_type"].to_pylist()
    counts = Counter(zip(types, hours))
    hmin, hmax = min(hours), max(hours)

    rows = {r["event_type"]: r
            for r in hourly_seasonality_strength(spark, SF_CORRECT)
            .collect()}
    assert set(rows) == set(types)
    for et in set(types):
        y = [counts.get((et, h), 0) for h in range(hmin, hmax + 1)]
        slots: defaultdict = defaultdict(list)
        for off, v in enumerate(y):
            slots[(hmin + off) % 24].append(v)
        a = float(sum(Decimal(f"{sum(v)**2 / len(v):.4f}")
                      for v in slots.values()))
        sy, syy, n = sum(y), sum(v * v for v in y), len(y)
        b = sy * sy / n
        r = rows[et]
        assert r["n_hours"] == n
        assert r["ss_tot"] == pytest.approx(syy - b, abs=1e-9)
        assert r["ss_within"] == pytest.approx(syy - a, abs=1e-9)
        assert r["strength"] == pytest.approx((a - b) / (syy - b),
                                              abs=1e-12)
        assert -1e-9 <= r["strength"] <= 1.0 + 1e-9


def test_negative_sampling_weights_python_replica(spark):
    """Damped probabilities must equal a Counter+pow replica with the
    same round(·,6)-Decimal pinning; the head is damped DOWN (ratio
    < 1 for every reported word when its unigram share exceeds its
    damped share) and probabilities stay sub-unit."""
    from decimal import Decimal

    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        NEG_TOP_K, negative_sampling_weights)

    counts: Counter = Counter()
    for text in _doc_texts(SF_CORRECT):
        counts.update(text.split(" "))
    w = {t: Decimal(f"{c ** 0.75:.6f}") for t, c in counts.items()}
    z = sum(w.values())
    n_tokens = sum(counts.values())
    head = sorted(counts, key=lambda t: (-counts[t], t))[:NEG_TOP_K]

    rows = negative_sampling_weights(spark, SF_CORRECT).collect()
    assert [r["word"] for r in rows] == head or \
        {r["word"] for r in rows} == set(head)
    for r in rows:
        c = counts[r["word"]]
        assert r["c"] == c
        assert r["damped_weight"] == pytest.approx(
            float(w[r["word"]]), abs=1e-12)
        p_uni = c / n_tokens
        p_neg = float(w[r["word"]]) / float(z)
        assert r["p_unigram"] == pytest.approx(p_uni, abs=1e-15)
        assert r["p_negative"] == pytest.approx(p_neg, abs=1e-15)
        assert r["damp_ratio"] == pytest.approx(p_neg / p_uni, abs=1e-12)
        assert 0.0 < r["p_negative"] < 1.0


def test_direct_standardization_python_replica(spark):
    """Pooled and language-standardized long-doc rates must equal a
    dict-based replica with the same round(·,10)-Decimal term pins;
    a source covering every language with the corpus mix would have
    gap 0 — the replica checks the actual gaps, and that
    standardized rates are convex combinations of cell rates."""
    import pyarrow.parquet as pq
    from decimal import Decimal

    from mapreduce_in_pthreads_spark.operators.curation import (
        STD_LONG_CHARS, direct_standardization_rates)

    t = pq.read_table(f"{SF_CORRECT}/documents.parquet",
                      columns=["source", "lang", "n_chars"])
    rows_in = list(zip(t["source"].to_pylist(), t["lang"].to_pylist(),
                       t["n_chars"].to_pylist()))
    n_corpus = len(rows_in)
    lang_n: Counter = Counter(l for _, l, _ in rows_in)
    cells: defaultdict = defaultdict(lambda: [0, 0])
    for s, l, nc in rows_in:
        cells[(s, l)][0] += 1
        cells[(s, l)][1] += 1 if nc > STD_LONG_CHARS else 0

    got = {r["source"]: r
           for r in direct_standardization_rates(spark, SF_CORRECT)
           .collect()}
    sources = {s for s, _, _ in rows_in}
    assert set(got) == sources
    for s in sources:
        n_docs = sum(v[0] for (src, _), v in cells.items() if src == s)
        n_long = sum(v[1] for (src, _), v in cells.items() if src == s)
        swr = sum((Decimal(f"{lang_n[l] / n_corpus * (v[1] / v[0]):.10f}")
                   for (src, l), v in cells.items() if src == s),
                  Decimal(0))
        sw = sum((Decimal(f"{lang_n[l] / n_corpus:.10f}")
                  for (src, l), v in cells.items() if src == s),
                 Decimal(0))
        r = got[s]
        assert r["n_docs"] == n_docs and r["n_long"] == n_long
        assert r["rate_pooled"] == pytest.approx(n_long / n_docs,
                                                 abs=1e-15)
        std = float(swr) / float(sw)
        assert r["rate_standardized"] == pytest.approx(std, abs=1e-12)
        assert r["confounding_gap"] == pytest.approx(
            n_long / n_docs - std, abs=1e-12)
        cell_rates = [v[1] / v[0]
                      for (src, _), v in cells.items() if src == s]
        assert min(cell_rates) - 1e-9 <= std <= max(cell_rates) + 1e-9


def test_rbo_python_replica(spark):
    """RBO_min@k must equal the TEXTBOOK prefix-intersection formula
    computed in pure Python from the same two rankings (pins the
    max(r1,r2)<=d depth-membership trick and the frozen decimal
    coefficients); identical rankings would score sum(coefs), so every
    score must lie in [0, sum(coefs)] and overlap@k must be A_k/k."""
    from decimal import Decimal

    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        RBO_DEPTH, _RBO_C, _bm25_per_doc, _ql_per_doc,
        rbo_ranker_agreement)

    bm = [(r["query_id"], r["doc_id"], r["score_sum"])
          for r in _bm25_per_doc(spark, SF_CORRECT).collect()]
    ql = [(r["query_id"], r["doc_id"], r["ql_sum"])
          for r in _ql_per_doc(spark, SF_CORRECT).collect()]

    def ranking(rows):
        by_q: defaultdict = defaultdict(list)
        for q, doc, score in rows:
            by_q[q].append((-score, doc))
        return {q: [doc for _, doc in sorted(v)]
                for q, v in by_q.items()}

    ra, rb = ranking(bm), ranking(ql)
    got = {r["query_id"]: r
           for r in rbo_ranker_agreement(spark, SF_CORRECT).collect()}
    assert set(got) == set(ra)
    coef_total = sum(Decimal(c) * (d + 1)
                     for d, c in enumerate(_RBO_C))  # Σ c_d·d = Σ w_d
    for q in ra:
        want = Decimal(0)
        a_k = None
        for d in range(1, RBO_DEPTH + 1):
            a_d = len(set(ra[q][:d]) & set(rb[q][:d]))
            want += Decimal(_RBO_C[d - 1]) * a_d
            if d == RBO_DEPTH:
                a_k = a_d
        r = got[q]
        assert r["rbo_min"] == pytest.approx(float(want), abs=1e-12)
        assert r["overlap_at_k"] == pytest.approx(a_k / RBO_DEPTH,
                                                  abs=1e-15)
        assert -1e-12 <= r["rbo_min"] <= float(coef_total) + 1e-12
        assert r["n_candidates"] == len(ra[q])


def test_markov_temporal_holdout_python_replica(spark):
    """Per-state accuracy must equal a sorted-transitions replica with
    the same day cutoff; the rule must be trained ONLY on pre-cutoff
    transitions (no future leakage — verified by recomputing the
    argmax from the replica's train side alone)."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        TEMPORAL_TRAIN_DAYS, markov_temporal_holdout)

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_CORRECT}/events.parquet",
                      columns=["user_id", "event_id", "event_type",
                               "ts"])
    ts_us = t["ts"].cast("int64").to_pylist()
    rows = list(zip(t["user_id"].to_pylist(),
                    t["event_id"].to_pylist(),
                    t["event_type"].to_pylist(), ts_us))
    dmin = min(us // 86_400_000_000 for us in ts_us)
    cutoff = dmin + TEMPORAL_TRAIN_DAYS

    by_user: defaultdict = defaultdict(list)
    for u, eid, et, us in rows:
        by_user[u].append((us, eid, et))
    train: Counter = Counter()
    test: defaultdict = defaultdict(list)
    for evs in by_user.values():
        evs.sort()
        for (us1, _, a), (us2, _, b) in zip(evs, evs[1:]):
            if us2 // 86_400_000_000 < cutoff:
                train[(a, b)] += 1
            else:
                test[a].append(b)

    rules = {}
    for (a, b), c in train.items():
        cur = rules.get(a)
        if cur is None or (-c, b) < (-cur[1], cur[0]):
            rules[a] = (b, c)
    got = {r["current_event"]: r
           for r in markov_temporal_holdout(spark, SF_CORRECT)
           .collect()}
    assert set(got) == set(test)
    for v, nexts in test.items():
        pred = rules.get(v, (None,))[0]
        correct = sum(1 for w in nexts if w == pred)
        r = got[v]
        assert r["predicted"] == pred
        assert r["n_test"] == len(nexts)
        assert r["n_correct"] == correct
        assert r["top1_accuracy"] == pytest.approx(
            round(correct / len(nexts), 10), abs=1e-12)
