"""Semantic pins for the eight round-7 session-3 additions
(readability_forcast, mann_whitney_auc, data_expectations_audit,
broadcast_join_advisor, t_closeness_audit, adamic_adar_links,
acf_correlogram, cusum_changepoint). The oracle contract proves
Spark==DuckDB; these prove both equal the algorithm as specified —
including CUSUM's prefix-minus-running-min closed form pinned against
the textbook max(0,·) recursion, and the ACF's expanded integer-moment
formula pinned against the naive centered-product sum."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

from .conftest import SF_CORRECT


def _documents(sf_dir: str, cols):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=cols)
    return [tuple(t[c][i].as_py() for c in cols) for i in range(t.num_rows)]


def _hourly_dense(sf_dir: str):
    """{event_type: [y_0..y_T]} densified on the global hour bounds."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "ts"])
    hours = [us // 3_600_000_000
             for us in t["ts"].cast("int64").to_pylist()]
    types = t["event_type"].to_pylist()
    counts = Counter(zip(types, hours))
    hmin, hmax = min(hours), max(hours)
    return hmin, {et: [counts.get((et, h), 0)
                       for h in range(hmin, hmax + 1)]
                  for et in set(types)}


def test_readability_forcast_python_replica(spark):
    """Per-lang mean FORCAST grade and accessibility share must equal
    a re.findall vowel-run replica (monosyllable = exactly one
    [aeiouy]+ run; grade via mean-linearity, band at r >= 0.6)."""
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        FORCAST_EASY_MONO_RATE, readability_forcast)

    agg = defaultdict(lambda: [0, 0.0, 0])  # n, sum r, n_easy
    for lang, text in _documents(SF_CORRECT, ["lang", "text"]):
        words = text.split(" ")
        mono = sum(1 for w in words
                   if len(re.findall(r"[aeiouy]+", w)) == 1)
        r = mono / len(words)
        a = agg[lang]
        a[0] += 1
        a[1] += round(r, 10)
        a[2] += r >= FORCAST_EASY_MONO_RATE

    rows = readability_forcast(spark, SF_CORRECT).collect()
    assert {r["lang"] for r in rows} == set(agg)
    for row in rows:
        n, sr, easy = agg[row["lang"]]
        assert row["n_docs"] == n
        assert row["mean_grade"] == pytest.approx(20 - 15 * sr / n,
                                                  abs=1e-9)
        assert row["n_accessible"] == easy
        assert row["accessible_share"] == pytest.approx(easy / n,
                                                        abs=1e-12)
        # FORCAST grades live on [5, 20] by construction
        assert 5.0 <= row["mean_grade"] <= 20.0


def test_mann_whitney_python_replica(spark):
    """U, AUC and tie-corrected z must equal the textbook
    average-rank replica (ranks assigned on the pooled sorted sample,
    ties share the mean rank)."""
    from mapreduce_in_pthreads_spark.operators.advanced import (
        MW_SRC_A, MW_SRC_B, mann_whitney_auc)

    a_vals, b_vals = [], []
    for src, v in _documents(SF_CORRECT, ["source", "n_chars"]):
        if src == MW_SRC_A:
            a_vals.append(v)
        elif src == MW_SRC_B:
            b_vals.append(v)
    pooled = sorted(a_vals + b_vals)
    # average rank per value
    first = {}
    for i, v in enumerate(pooled, 1):
        first.setdefault(v, i)
    cnt = Counter(pooled)
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    r_a = sum(avg_rank[v] for v in a_vals)
    n1, n2 = len(a_vals), len(b_vals)
    u_a = r_a - n1 * (n1 + 1) / 2
    auc = u_a / (n1 * n2)
    nn = n1 + n2
    tie = sum(c ** 3 - c for c in cnt.values())
    var_u = n1 * n2 / 12 * ((nn + 1) - tie / (nn * (nn - 1)))
    z = (u_a - n1 * n2 / 2) / math.sqrt(var_u)

    [row] = mann_whitney_auc(spark, SF_CORRECT).collect()
    assert (row["n_a"], row["n_b"]) == (n1, n2)
    assert row["u_a"] == pytest.approx(u_a, abs=1e-9)
    assert row["auc"] == pytest.approx(auc, abs=1e-6)
    assert row["z_score"] == pytest.approx(z, abs=1e-5)


def test_data_expectations_python_replica(spark):
    """All five constraint metrics must equal a pyarrow replica; the
    synthetic orders table should pass every expectation."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.layout import (
        data_expectations_audit)

    t = pq.read_table(f"{SF_CORRECT}/orders.parquet")
    n = t.num_rows
    custkey = t["o_custkey"].to_pylist()
    keys = t["o_orderkey"].to_pylist()
    status = t["o_orderstatus"].to_pylist()
    price = t["o_totalprice"].to_pylist()
    years = [d.year for d in t["o_orderdate"].to_pylist()]
    want = {
        "completeness_o_custkey":
            sum(v is not None for v in custkey) / n,
        "uniqueness_o_orderkey": len(set(keys)) / n,
        "membership_o_orderstatus":
            sum(s in ("O", "F", "P") for s in status) / n,
        "non_negative_o_totalprice": sum(p > 0 for p in price) / n,
        "range_o_orderdate":
            sum(1992 <= y <= 1998 for y in years) / n,
    }

    rows = data_expectations_audit(spark, SF_CORRECT).collect()
    assert {r["constraint"] for r in rows} == set(want)
    for row in rows:
        assert row["metric"] == pytest.approx(
            want[row["constraint"]], abs=1e-12)
        assert row["threshold"] == 1.0
        assert row["passed"] == (row["metric"] >= 1.0)


def test_broadcast_advisor_python_replica(spark):
    """Size estimates must equal the declared row model computed by
    pyarrow, and the strategy must flip exactly at the 10 MB line."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.layout import (
        ADVISOR_TABLES, BROADCAST_THRESHOLD_BYTES, broadcast_join_advisor)

    rows = {r["table_name"]: r
            for r in broadcast_join_advisor(spark, SF_CORRECT).collect()}
    assert set(rows) == set(ADVISOR_TABLES)
    for t, (n_fixed, str_cols) in ADVISOR_TABLES.items():
        tbl = pq.read_table(f"{SF_CORRECT}/{t}.parquet",
                            columns=list(str_cols))
        n = tbl.num_rows
        payload = sum(len(v) for c in str_cols
                      for v in tbl[c].to_pylist())
        est = n * (8 * n_fixed + 16 * len(str_cols)) + payload
        r = rows[t]
        assert r["n_rows"] == n
        assert r["est_bytes"] == est
        assert r["strategy"] == (
            "broadcast" if est <= BROADCAST_THRESHOLD_BYTES else "shuffle")


def test_t_closeness_python_replica(spark):
    """Per-class EMD must equal the Counter replica of the ordered
    cumulative-difference formula, including classes missing buckets
    that the corpus has (they must still move mass)."""
    from mapreduce_in_pthreads_spark.operators.curation import (
        LEN_BUCKET, T_CLOSE_BUCKETS, T_CLOSE_MAX, t_closeness_audit)

    m = T_CLOSE_BUCKETS
    by_class: defaultdict = defaultdict(Counter)
    glob: Counter = Counter()
    for lang, source, n_chars in _documents(
            SF_CORRECT, ["lang", "source", "n_chars"]):
        b = min(n_chars // LEN_BUCKET, m - 1)
        by_class[(lang, source)][b] += 1
        glob[b] += 1
    n_corpus = sum(glob.values())

    rows = t_closeness_audit(spark, SF_CORRECT).collect()
    assert {(r["lang"], r["source"]) for r in rows} == set(by_class)
    for row in rows:
        cls = by_class[(row["lang"], row["source"])]
        n_class = sum(cls.values())
        cum = 0.0
        emd = 0.0
        for b in range(m):
            cum += round(cls.get(b, 0) / n_class
                         - glob.get(b, 0) / n_corpus, 10)
            emd += abs(cum)
        emd /= m - 1
        assert row["n_docs"] == n_class
        assert row["t_emd"] == pytest.approx(emd, abs=1e-9)
        assert row["passed"] == (row["t_emd"] <= T_CLOSE_MAX)


def test_adamic_adar_python_replica(spark):
    """Top-20 AA scores must equal a Counter replica end-to-end: the
    positive-PMI edge set (exact integer inequality), the wedge
    enumeration, existing-edge exclusion, and 1/ln(deg)
    accumulation."""
    from mapreduce_in_pthreads_spark.operators.iterative import (
        AA_TOP_K, adamic_adar_links)

    cab: Counter = Counter()
    for (text,) in _documents(SF_CORRECT, ["text"]):
        t = text.split(" ")
        for a, b in zip(t, t[1:]):
            if a != b:
                cab[(min(a, b), max(a, b))] += 1
    n = sum(cab.values())
    m: Counter = Counter()
    for (a, b), c in cab.items():
        m[a] += c
        m[b] += c
    edges = {p for p, c in cab.items() if 2 * n * c > m[p[0]] * m[p[1]]}
    assert len(edges) > 50, "PMI graph degenerated to near-empty"
    assert len(edges) < len(cab), "PMI graph degenerated to complete"
    nbrs: defaultdict = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scores: defaultdict = defaultdict(float)
    common: defaultdict = defaultdict(int)
    for z, nb in nbrs.items():
        w_z = round(1.0 / math.log(len(nb)), 10)
        snb = sorted(nb)
        for i, u in enumerate(snb):
            for w in snb[i + 1:]:
                scores[(u, w)] += w_z
                common[(u, w)] += 1
    cand = [(round(s, 9), u, w) for (u, w), s in scores.items()
            if (u, w) not in edges]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = cand[:AA_TOP_K]

    rows = adamic_adar_links(spark, SF_CORRECT).collect()
    assert len(rows) == min(AA_TOP_K, len(want))
    assert rows, "top-k must be non-degenerate on this corpus"
    for row, (s, u, w) in zip(rows, want):
        assert (row["word_a"], row["word_b"]) == (u, w)
        assert row["n_common"] == common[(u, w)]
        assert row["aa_score"] == pytest.approx(s, abs=1e-8)


def test_acf_python_replica(spark):
    """r_k must equal the naive centered-product estimator on the
    dense hourly series (the operator computes it via expanded
    integer moments — this is the both-engines-wrong guard for that
    algebra), every r_k must respect |r_k| <= 1, and the synthetic
    events stream must read as near-white noise: every |r_k| inside
    the 5/sqrt(n) band (the correlogram's job on THIS corpus is to
    show there is no spurious seasonality for the seasonal-naive /
    Holt family to exploit — consistent with seasonal_naive_mase
    hovering near 1)."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        ACF_MAX_LAG, acf_correlogram)

    _, dense = _hourly_dense(SF_CORRECT)
    want = {}
    for et, y in dense.items():
        n = len(y)
        ybar = sum(y) / n
        den = sum((v - ybar) ** 2 for v in y)
        for k in range(1, ACF_MAX_LAG + 1):
            num = sum((y[t] - ybar) * (y[t + k] - ybar)
                      for t in range(n - k))
            want[(et, k)] = (n - k, num / den)

    rows = acf_correlogram(spark, SF_CORRECT).collect()
    assert {(r["event_type"], r["lag"]) for r in rows} == set(want)
    by_type: defaultdict = defaultdict(dict)
    for row in rows:
        m, acf = want[(row["event_type"], row["lag"])]
        assert row["n_pairs"] == m
        assert row["acf"] == pytest.approx(acf, abs=1e-9)
        assert abs(row["acf"]) <= 1.0 + 1e-12
        n_hours = len(next(iter(dense.values())))
        assert abs(row["acf"]) <= 5 / math.sqrt(n_hours), \
            "synthetic events should be near-white noise"
        by_type[row["event_type"]][row["lag"]] = row["acf"]


def test_cusum_closed_form_equals_recursion(spark):
    """The prefix-sum − running-min closed form must equal the
    textbook max(0, C+(y−μ−kσ)) recursion, computed on the same
    round(·,6) decimal z values (scaled-int arithmetic, no float
    accumulation in the replica either)."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        CUSUM_H_SIGMA, cusum_changepoint)

    hmin, dense = _hourly_dense(SF_CORRECT)
    want = {}
    for et, y in dense.items():
        n = len(y)
        mu = sum(y) / n
        sigma = math.sqrt((sum(v * v for v in y)
                           - sum(y) * sum(y) / n) / n)
        c = 0
        peak, peak_i = -1, -1
        for i, v in enumerate(y):
            z6 = round(v - mu - 0.5 * sigma, 6)
            zi = round(z6 * 1_000_000)  # exact scaled-int decimal
            c = max(0, c + zi)
            if c > peak:
                peak, peak_i = c, i
        want[et] = (n, mu, sigma, peak / 1_000_000, hmin + peak_i)

    rows = cusum_changepoint(spark, SF_CORRECT).collect()
    assert {r["event_type"] for r in rows} == set(want)
    for row in rows:
        n, mu, sigma, peak, hour = want[row["event_type"]]
        assert row["n_hours"] == n
        assert row["mu"] == pytest.approx(mu, abs=1e-12)
        assert row["sigma"] == pytest.approx(sigma, abs=1e-12)
        assert row["peak_cusum"] == pytest.approx(peak, abs=1e-9)
        assert row["peak_hour"] == hour
        assert row["alarm"] == (row["peak_cusum"]
                                > CUSUM_H_SIGMA * row["sigma"])


# --- batch 2 (same session): snapshot diff, KMV, conformal, LSH planner ----


def _md5hex(v) -> str:
    import hashlib

    return hashlib.md5(str(v).encode()).hexdigest()


def test_snapshot_diff_python_replica(spark):
    """Class counts must equal the hashlib replica of the md5 slices,
    and the audit must reconcile: removed+changed+unchanged == |v1| −
    |adds' sources|... precisely: |v1| = removed + changed_price +
    changed_status-or-unchanged rows, |v2| = |v1| − removed + added."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.layout import (
        DIFF_ADD_PREFIX, DIFF_DROP_PREFIX, DIFF_PRICE_PREFIX,
        DIFF_STATUS_PREFIX, snapshot_diff_audit)

    t = pq.read_table(f"{SF_CORRECT}/orders.parquet",
                      columns=["o_orderkey", "o_orderstatus"])
    keys = t["o_orderkey"].to_pylist()
    status = t["o_orderstatus"].to_pylist()
    want = Counter()
    for k, s in zip(keys, status):
        pfx = _md5hex(k)[:2]
        if pfx == DIFF_DROP_PREFIX:
            want["removed"] += 1
        elif pfx == DIFF_PRICE_PREFIX:
            want["changed_price"] += 1
        elif pfx == DIFF_STATUS_PREFIX:
            want["changed_status" if s != "F" else "unchanged"] += 1
        else:
            want["unchanged"] += 1
        if pfx == DIFF_ADD_PREFIX:
            want["added"] += 1

    rows = {r["change_type"]: r["n_rows"]
            for r in snapshot_diff_audit(spark, SF_CORRECT).collect()}
    assert rows == {k: v for k, v in want.items() if v}
    n_v1 = len(keys)
    assert (rows.get("removed", 0) + rows.get("changed_price", 0)
            + rows.get("changed_status", 0)
            + rows.get("unchanged", 0)) == n_v1
    # every change class should actually be exercised on this corpus
    for cls in ("added", "removed", "changed_price", "unchanged"):
        assert rows.get(cls, 0) > 0, cls


def test_kmv_sketch_python_replica(spark):
    """Estimates must equal the hashlib replica ((k−1)/u_k over exact
    52-bit uniforms of the distinct-user set), and the relative error
    must sit inside the ~4/sqrt(k) ballpark KMV theory predicts."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.advanced import (
        KMV_K, KMV_POW52, kmv_distinct_sketch)

    t = pq.read_table(f"{SF_CORRECT}/events.parquet",
                      columns=["event_type", "user_id"])
    by_type: defaultdict = defaultdict(set)
    for et, uid in zip(t["event_type"].to_pylist(),
                       t["user_id"].to_pylist()):
        by_type[et].add(uid)

    rows = kmv_distinct_sketch(spark, SF_CORRECT).collect()
    assert {r["event_type"] for r in rows} == set(by_type)
    for row in rows:
        users = by_type[row["event_type"]]
        n = len(users)
        assert row["n_exact"] == n
        us = sorted((int(_md5hex(u)[:13], 16) + 1) / KMV_POW52
                    for u in users)
        est = n if n < KMV_K else (KMV_K - 1) / us[KMV_K - 1]
        assert row["ndv_estimate"] == pytest.approx(est, abs=1e-5)
        assert abs(row["rel_error"]) <= 4 / math.sqrt(KMV_K)


def test_conformal_coverage_python_replica(spark):
    """τ and coverage must equal the hashlib replica of the split
    (exact ceil rank, ties by event_id), and the empirical coverage
    must honor the marginal ≥ 1−α guarantee within finite-sample
    slack."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.advanced import (
        CONF_ALPHA_DEN, CONF_ALPHA_NUM, CONF_CAL_HEX,
        conformal_interval_coverage)

    t = pq.read_table(f"{SF_CORRECT}/events.parquet",
                      columns=["event_type", "event_id", "value"])
    cal: defaultdict = defaultdict(list)
    test: defaultdict = defaultdict(list)
    for et, eid, v in zip(t["event_type"].to_pylist(),
                          t["event_id"].to_pylist(),
                          t["value"].to_pylist()):
        (cal if _md5hex(eid)[0] in CONF_CAL_HEX else test)[et] \
            .append((eid, v))

    from decimal import Decimal
    rows = conformal_interval_coverage(spark, SF_CORRECT).collect()
    assert {r["event_type"] for r in rows} == set(cal)
    for row in rows:
        et = row["event_type"]
        n_cal = len(cal[et])
        dec = sum(Decimal(str(round(v, 4))) for _, v in cal[et])
        mu = float(dec) / n_cal
        scores = sorted((abs(v - mu), eid) for eid, v in cal[et])
        k = min(((n_cal + 1) * CONF_ALPHA_NUM + CONF_ALPHA_DEN - 1)
                // CONF_ALPHA_DEN, n_cal)
        tau = scores[k - 1][0]
        covered = sum(abs(v - mu) <= tau for _, v in test[et])
        assert row["n_cal"] == n_cal
        assert row["n_test"] == len(test[et])
        assert row["tau"] == pytest.approx(tau, abs=1e-12)
        assert row["n_covered"] == covered
        assert row["coverage"] == pytest.approx(covered / len(test[et]),
                                                abs=1e-12)
        assert row["coverage"] >= (CONF_ALPHA_NUM / CONF_ALPHA_DEN) - 0.05


def test_lsh_planner_python_replica(spark):
    """Expected candidate yields must equal a full hashlib replica of
    the minhash → band → candidate → Jaccard-histogram → S-curve
    pipeline, and OR-amplification must be monotone: more bands (same
    8 hashes) ⇒ strictly higher expected yield on a non-degenerate
    histogram."""
    from mapreduce_in_pthreads_spark.operators.dedup import (
        HASH_FAMILY, LSH_PLAN_BINS, P_MINHASH, _lsh_s_curve,
        lsh_parameter_planner)

    docs = _documents(SF_CORRECT, ["doc_id", "text"])
    shsets = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        shsets[doc_id] = {" ".join(toks[i:i + 3])
                          for i in range(len(toks) - 2)}
    sigs = {}
    for doc_id, sh in shsets.items():
        hs = [int(_md5hex(s)[:15], 16) % P_MINHASH for s in sh]
        sigs[doc_id] = tuple(min((a * h + b) % P_MINHASH for h in hs)
                             for a, b in HASH_FAMILY) if hs else None
    buckets: defaultdict = defaultdict(set)
    for doc_id, sig in sigs.items():
        if sig is None:
            continue
        for band in range(4):
            buckets[(band, sig[2 * band], sig[2 * band + 1])].add(doc_id)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                cand.add((a, b))
    hist: Counter = Counter()
    for a, b in cand:
        inter = len(shsets[a] & shsets[b])
        j = inter / (len(shsets[a]) + len(shsets[b]) - inter)
        hist[min(int(j * LSH_PLAN_BINS), LSH_PLAN_BINS - 1)] += 1
    curve = _lsh_s_curve()
    want = {}
    for bands in {c[0] for c in curve}:
        exp = sum(round(hist[i] * p, 6)
                  for b, r, i, p in curve if b == bands)
        want[bands] = (sum(hist.values()), exp)

    rows = lsh_parameter_planner(spark, SF_CORRECT).collect()
    assert {r["n_bands"] for r in rows} == set(want)
    for row in rows:
        n_pairs, exp = want[row["n_bands"]]
        assert row["n_pairs_binned"] == n_pairs
        assert row["expected_candidates"] == pytest.approx(exp, abs=1e-6)
        assert row["expected_rate"] == pytest.approx(exp / n_pairs,
                                                     abs=1e-9)
    by_bands = sorted((r["n_bands"], r["expected_candidates"])
                      for r in rows)
    for (b1, e1), (b2, e2) in zip(by_bands, by_bands[1:]):
        assert e1 < e2, "OR-amplification must be monotone in bands"


def _censored_replica(sf_dir: str):
    """{user: (h, event)} replica of the shared censored-durations
    relation (hour-bucketed first-view→first-purchase, right-censored
    at the corpus max ts)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type", "ts"])
    ts_us = t["ts"].cast("int64").to_pylist()
    horizon = max(ts_us)
    first_view: dict = {}
    purch: defaultdict = defaultdict(list)
    for u, et, ts in zip(t["user_id"].to_pylist(),
                         t["event_type"].to_pylist(), ts_us):
        if et == "view":
            first_view[u] = min(first_view.get(u, ts), ts)
        elif et == "purchase":
            purch[u].append(ts)
    out = {}
    for u, fv in first_view.items():
        later = [p for p in purch.get(u, []) if p > fv]
        if later:
            out[u] = ((min(later) - fv) // 3_600_000_000, 1)
        else:
            out[u] = ((horizon - fv) // 3_600_000_000, 0)
    return out


def test_kaplan_meier_python_replica(spark):
    """The life table and survival curve must equal the textbook
    product-limit replica, survival must be monotone non-increasing,
    and must sit strictly above the converted-only empirical CDF
    complement at the last event time (the censoring-bias direction
    the estimator exists to fix)."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        kaplan_meier_conversion)

    dur = _censored_replica(SF_CORRECT)
    lt: defaultdict = defaultdict(lambda: [0, 0])
    for h, ev in dur.values():
        lt[h][ev == 0] += 1
    total = len(dur)
    s = 1.0
    seen = 0
    want = {}
    for h in sorted(lt):
        d, c = lt[h]
        n_risk = total - seen
        seen += d + c
        if d < n_risk:
            s *= 1.0 - d / n_risk
        else:
            s = 0.0
        if d >= 1:
            want[h] = (n_risk, d, c, s)

    rows = kaplan_meier_conversion(spark, SF_CORRECT).collect()
    assert {r["duration_h"] for r in rows} == set(want)
    prev = 1.0
    for row in sorted(rows, key=lambda r: r["duration_h"]):
        n_risk, d, c, s = want[row["duration_h"]]
        assert row["n_risk"] == n_risk
        assert row["n_events"] == d
        assert row["n_censored"] == c
        assert row["survival"] == pytest.approx(s, abs=1e-5)
        assert row["survival"] <= prev + 1e-12
        prev = row["survival"]
    # censoring-bias direction: KM survival >= converted-only
    # complement (dropping censored users overstates conversion)
    last = max(want)
    conv = [h for h, ev in dur.values() if ev == 1]
    naive = 1.0 - sum(h <= last for h in conv) / len(conv)
    assert want[last][3] >= naive - 1e-12


def test_logrank_python_replica(spark):
    """O/E/V/z must equal the Mantel replica over the same life
    table, and the deterministic md5 50/50 arms must be exchangeable:
    |z| inside a generous null band."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        logrank_conversion_arms)

    dur = _censored_replica(SF_CORRECT)
    lt: defaultdict = defaultdict(lambda: [0, 0, 0, 0])
    t1 = t2 = 0
    for u, (h, ev) in dur.items():
        a = _md5hex(u)[0] in "01234567"
        t1 += a
        t2 += not a
        lt[h][(0 if ev else 1) + (0 if a else 2)] += 1
    o = e = v = 0.0
    seen1 = seen2 = 0
    for h in sorted(lt):
        d1, c1, d2, c2 = lt[h]
        n1, n2 = t1 - seen1, t2 - seen2
        seen1 += d1 + c1
        seen2 += d2 + c2
        d, n = d1 + d2, n1 + n2
        if d >= 1 and n > 1:
            o += d1
            e += round(d * n1 / n, 6)
            v += round(d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1),
                       6)
    z = (o - e) / math.sqrt(v)

    [row] = logrank_conversion_arms(spark, SF_CORRECT).collect()
    assert (row["n_users_a"], row["n_users_b"]) == (t1, t2)
    assert row["o_a"] == o
    assert row["e_a"] == pytest.approx(e, abs=1e-6)
    assert row["var_a"] == pytest.approx(v, abs=1e-6)
    assert row["z_score"] == pytest.approx(z, abs=1e-5)
    assert abs(row["z_score"]) < 5.0, "md5 arms must be exchangeable"


# --- batch 3 (same session): Wilson, capture-recapture, jackknife, EB ------


def test_wilson_ci_python_replica(spark):
    """Intervals must equal the textbook Wilson replica, stay inside
    [0,1] (the property Wald lacks), and contain the point rate."""
    from mapreduce_in_pthreads_spark.operators.advanced import (
        WILSON_LONG_CHARS, WILSON_Z, wilson_ci_rates)

    agg: defaultdict = defaultdict(lambda: [0, 0])
    for src, nc in _documents(SF_CORRECT, ["source", "n_chars"]):
        agg[src][0] += 1
        agg[src][1] += nc > WILSON_LONG_CHARS

    rows = wilson_ci_rates(spark, SF_CORRECT).collect()
    assert {r["source"] for r in rows} == set(agg)
    z = WILSON_Z
    for row in rows:
        n, k = agg[row["source"]]
        p = k / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n
                             + z * z / (4 * n * n)) / denom
        assert (row["n"], row["k"]) == (n, k)
        assert row["rate"] == pytest.approx(p, abs=1e-6)
        assert row["ci_lo"] == pytest.approx(center - half, abs=1e-5)
        assert row["ci_hi"] == pytest.approx(center + half, abs=1e-5)
        assert 0.0 <= row["ci_lo"] <= row["rate"] <= row["ci_hi"] <= 1.0


def test_capture_recapture_python_replica(spark):
    """n1/n2/m and the Chapman estimate must equal the set replica;
    under near-independent capture the estimate should land within
    25% of the truth on this corpus."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.advanced import (
        CR_SAMPLE_A, CR_SAMPLE_B, capture_recapture_users)

    t = pq.read_table(f"{SF_CORRECT}/events.parquet",
                      columns=["user_id", "event_type"])
    ua, ub, allu = set(), set(), set()
    for u, et in zip(t["user_id"].to_pylist(),
                     t["event_type"].to_pylist()):
        allu.add(u)
        if et == CR_SAMPLE_A:
            ua.add(u)
        elif et == CR_SAMPLE_B:
            ub.add(u)
    n1, n2, m = len(ua), len(ub), len(ua & ub)
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1

    [row] = capture_recapture_users(spark, SF_CORRECT).collect()
    assert (row["n1"], row["n2"], row["m"]) == (n1, n2, m)
    assert row["n_true"] == len(allu)
    assert row["n_estimate"] == pytest.approx(est, abs=1e-5)
    assert abs(row["rel_error"]) < 0.25


def test_jackknife_python_replica(spark):
    """Leave-one-group ratios, R̄, and the jackknife se must equal
    the hashlib replica (round-6 pinned replicates, scaled-decimal
    deviation sums), and the CI must contain the full-sample ratio."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.advanced import (
        JK_GROUPS, WILSON_Z, jackknife_ratio_variance)

    t = pq.read_table(f"{SF_CORRECT}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    sc = [0] * JK_GROUPS
    st = [0] * JK_GROUPS
    for did, text, nc in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist(),
                             t["n_chars"].to_pylist()):
        g = int(_md5hex(did)[:15], 16) % JK_GROUPS
        sc[g] += nc
        st[g] += len(text.split(" "))
    tc, tt = sum(sc), sum(st)
    rg = [round((tc - sc[g]) / (tt - st[g]), 6)
          for g in range(JK_GROUPS)]
    rbar = sum(rg) / JK_GROUPS
    ss = sum(round((x - rbar) ** 2, 10) for x in rg)
    se = math.sqrt((JK_GROUPS - 1) / JK_GROUPS * ss)

    [row] = jackknife_ratio_variance(spark, SF_CORRECT).collect()
    assert row["n_groups"] == JK_GROUPS
    assert row["ratio"] == pytest.approx(tc / tt, abs=1e-6)
    assert row["jackknife_se"] == pytest.approx(se, abs=1e-5)
    assert row["ci_lo"] == pytest.approx(tc / tt - WILSON_Z * se,
                                         abs=1e-4)
    assert row["ci_hi"] == pytest.approx(tc / tt + WILSON_Z * se,
                                         abs=1e-4)
    assert row["ci_lo"] <= row["ratio"] <= row["ci_hi"]


def test_eb_shrinkage_python_replica(spark):
    """Shrunk rates must equal the pseudo-count replica, shrinkage
    must strictly contract every source toward the pooled rate, and
    small sources must move MORE than large ones."""
    from mapreduce_in_pthreads_spark.operators.curation import (
        EB_LONG_CHARS, EB_PRIOR_STRENGTH, eb_shrinkage_rates)

    agg: defaultdict = defaultdict(lambda: [0, 0])
    for src, nc in _documents(SF_CORRECT, ["source", "n_chars"]):
        agg[src][0] += 1
        agg[src][1] += nc > EB_LONG_CHARS
    tn = sum(n for n, _ in agg.values())
    tk = sum(k for _, k in agg.values())
    pbar = tk / tn

    rows = eb_shrinkage_rates(spark, SF_CORRECT).collect()
    assert {r["source"] for r in rows} == set(agg)
    for row in rows:
        n, k = agg[row["source"]]
        p_eb = (k + EB_PRIOR_STRENGTH * pbar) / (n + EB_PRIOR_STRENGTH)
        assert (row["n"], row["k"]) == (n, k)
        assert row["rate_raw"] == pytest.approx(k / n, abs=1e-6)
        assert row["rate_eb"] == pytest.approx(p_eb, abs=1e-6)
        # contraction: shrunk rate strictly between raw and pooled
        lo, hi = sorted((k / n, pbar))
        assert lo - 1e-9 <= row["rate_eb"] <= hi + 1e-9
        assert row["rank_delta"] == row["rank_raw"] - row["rank_eb"]
    # both rank columns are permutations of 1..|sources|
    assert sorted(r["rank_raw"] for r in rows) == \
        list(range(1, len(rows) + 1))
    assert sorted(r["rank_eb"] for r in rows) == \
        list(range(1, len(rows) + 1))


# --- batch 4 (same session): Kruskal-Wallis, trend, McNemar, skyline --------


def test_kruskal_wallis_python_replica(spark):
    """H and its tie correction must equal the textbook average-rank
    replica over all sources; with k=2 restricted data the statistic
    must equal the square of the Mann-Whitney z (the classical
    identity, checked against scipy-free math)."""
    from mapreduce_in_pthreads_spark.operators.advanced import (
        kruskal_wallis_sources)

    by_src: defaultdict = defaultdict(list)
    for src, v in _documents(SF_CORRECT, ["source", "n_chars"]):
        by_src[src].append(v)
    pooled = sorted(v for vs in by_src.values() for v in vs)
    first = {}
    for i, v in enumerate(pooled, 1):
        first.setdefault(v, i)
    cnt = Counter(pooled)
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    n = len(pooled)
    sum_r2n = sum(sum(avg_rank[v] for v in vs) ** 2 / len(vs)
                  for vs in by_src.values())
    h = 12 / (n * (n + 1)) * sum_r2n - 3 * (n + 1)
    corr = 1 - sum(c ** 3 - c for c in cnt.values()) / (n ** 3 - n)

    [row] = kruskal_wallis_sources(spark, SF_CORRECT).collect()
    assert row["n_sources"] == len(by_src)
    assert row["n_total"] == n
    assert row["df"] == len(by_src) - 1
    assert row["h_stat"] == pytest.approx(h, abs=1e-4)
    assert row["h_tie_corrected"] == pytest.approx(h / corr, abs=1e-4)
    assert row["h_tie_corrected"] >= row["h_stat"] - 1e-9


def test_trend_mann_kendall_python_replica(spark):
    """S, the tie-corrected continuity-corrected z, and the Theil-Sen
    lower-median slope must equal the brute-force pairwise replica on
    the daily counts."""
    import pyarrow.parquet as pq

    from mapreduce_in_pthreads_spark.operators.timeseries import (
        trend_mann_kendall)

    t = pq.read_table(f"{SF_CORRECT}/events.parquet",
                      columns=["event_type", "ts"])
    daily: defaultdict = defaultdict(Counter)
    for et, us in zip(t["event_type"].to_pylist(),
                      t["ts"].cast("int64").to_pylist()):
        daily[et][us // 86_400_000_000] += 1

    rows = {r["event_type"]: r
            for r in trend_mann_kendall(spark, SF_CORRECT).collect()}
    assert set(rows) == set(daily)
    for et, cnts in daily.items():
        days = sorted(cnts)
        ys = [cnts[d] for d in days]
        nd = len(days)
        s = slopes = 0
        sl = []
        for i in range(nd):
            for j in range(i + 1, nd):
                diff = ys[j] - ys[i]
                s += (diff > 0) - (diff < 0)
                sl.append((diff / (days[j] - days[i]),
                           days[i], days[j]))
        sl.sort()
        ts_slope = sl[(len(sl) + 1) // 2 - 1][0]
        tie = sum(c * (c - 1) * (2 * c + 5)
                  for c in Counter(ys).values())
        var_s = (nd * (nd - 1) * (2 * nd + 5) - tie) / 18
        z = ((s - 1) if s > 0 else (s + 1) if s < 0 else 0) \
            / math.sqrt(var_s)
        row = rows[et]
        assert row["n_days"] == nd
        assert row["s"] == s
        assert row["mk_z"] == pytest.approx(z, abs=1e-5)
        assert row["theil_sen_slope"] == pytest.approx(ts_slope,
                                                       abs=1e-6)


def test_mcnemar_python_replica(spark):
    """The three cells must reconcile with the registry's own two
    detector relations, and the continuity-corrected chi2 must match
    the textbook formula."""
    from mapreduce_in_pthreads_spark.operators.dedup import (
        mcnemar_dedup_methods, minhash_lsh_dedup, simhash_hamming_dedup)

    mh = {(r["doc_a"], r["doc_b"])
          for r in minhash_lsh_dedup(spark, SF_CORRECT).collect()}
    sh = {(r["doc_a"], r["doc_b"])
          for r in simhash_hamming_dedup(spark, SF_CORRECT).collect()}
    both, b, c = len(mh & sh), len(mh - sh), len(sh - mh)
    chi2 = 0.0 if b + c == 0 else (abs(b - c) - 1) ** 2 / (b + c)

    [row] = mcnemar_dedup_methods(spark, SF_CORRECT).collect()
    assert (row["n_both"], row["b_only_minhash"],
            row["c_only_simhash"]) == (both, b, c)
    assert row["mcnemar_chi2"] == pytest.approx(chi2, abs=1e-6)


def test_skyline_python_replica(spark):
    """The skyline must equal the O(n²) brute-force dominance replica
    exactly — every returned doc undominated, every omitted doc
    dominated by some returned point."""
    from mapreduce_in_pthreads_spark.operators.advanced import (
        skyline_pareto_docs)

    pts = {}
    for did, text, nc in _documents(SF_CORRECT,
                                    ["doc_id", "text", "n_chars"]):
        pts[did] = (nc, len(set(text.split(" "))))

    def dominated(p):
        c, t = pts[p]
        return any((c2 >= c and t2 >= t and (c2 > c or t2 > t))
                   for q, (c2, t2) in pts.items() if q != p)

    want = {p for p in pts if not dominated(p)}
    rows = skyline_pareto_docs(spark, SF_CORRECT).collect()
    got = {r["doc_id"] for r in rows}
    assert got == want
    for r in rows:
        assert (r["n_chars"], r["n_distinct_tokens"]) == pts[r["doc_id"]]
    assert 1 <= len(got) < len(pts)


# --- batch 5 (same session): Gumbel return levels, decile lift --------------


def test_gumbel_python_replica(spark):
    """Moment fit and return levels must equal the replica, and the
    ordering invariants must hold: rl_365d > rl_30d > loc_mu, and
    both return levels exceed the observed mean daily max."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        GUMBEL_GAMMA, GUMBEL_K30, GUMBEL_K365, GUMBEL_SQRT6_PI,
        gumbel_return_levels)

    _, dense = _hourly_dense(SF_CORRECT)
    rows = {r["event_type"]: r
            for r in gumbel_return_levels(spark, SF_CORRECT).collect()}
    assert set(rows) == set(dense)
    for et, ys in dense.items():
        # daily maxima over the dense grid (day = h_abs // 24 — the
        # operator buckets absolute epoch-hours, so replicate that)
        maxima: defaultdict = defaultdict(int)
        hmin = _hourly_dense(SF_CORRECT)[0]
        for i, y in enumerate(ys):
            maxima[(hmin + i) // 24] = max(maxima[(hmin + i) // 24], y)
        m = list(maxima.values())
        n = len(m)
        mean = sum(m) / n
        var = (sum(v * v for v in m) - sum(m) ** 2 / n) / (n - 1)
        beta = math.sqrt(var) * GUMBEL_SQRT6_PI
        mu = mean - GUMBEL_GAMMA * beta
        row = rows[et]
        assert row["n_days"] == n
        assert row["loc_mu"] == pytest.approx(mu, abs=1e-5)
        assert row["scale_beta"] == pytest.approx(beta, abs=1e-5)
        assert row["rl_30d"] == pytest.approx(mu + beta * GUMBEL_K30,
                                              abs=1e-4)
        assert row["rl_365d"] == pytest.approx(mu + beta * GUMBEL_K365,
                                               abs=1e-4)
        assert row["rl_365d"] > row["rl_30d"] > row["loc_mu"]
        assert row["rl_30d"] > mean


def test_decile_lift_python_replica(spark):
    """Decile cells and cumulative lifts must equal the sorted
    replica (ntile semantics: earlier deciles get the extra rows),
    decile-1 lift must be the maximum, and the final cumulative lift
    must be exactly 1."""
    from mapreduce_in_pthreads_spark.operators.advanced import (
        LIFT_DECILES, LIFT_LONG_CHARS, decile_lift_table)

    pts = [(len(set(text.split(" "))), did, nc > LIFT_LONG_CHARS)
           for did, text, nc in _documents(
               SF_CORRECT, ["doc_id", "text", "n_chars"])]
    pts.sort(key=lambda p: (-p[0], p[1]))
    n = len(pts)
    q, r = divmod(n, LIFT_DECILES)
    want = {}
    idx = 0
    for d in range(1, LIFT_DECILES + 1):
        size = q + (1 if d <= r else 0)
        chunk = pts[idx:idx + size]
        idx += size
        want[d] = (size, sum(p[2] for p in chunk))
    base = sum(p[2] for p in pts) / n

    rows = sorted(decile_lift_table(spark, SF_CORRECT).collect(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cn = cp = 0
    for row in rows:
        size, pos = want[row["decile"]]
        cn += size
        cp += pos
        assert row["n_docs"] == size
        assert row["n_pos"] == pos
        assert row["rate"] == pytest.approx(pos / size, abs=1e-6)
        assert row["cum_lift"] == pytest.approx((cp / cn) / base,
                                                abs=1e-5)
    assert rows[0]["cum_lift"] == max(r["cum_lift"] for r in rows)
    assert rows[-1]["cum_lift"] == pytest.approx(1.0, abs=1e-9)
