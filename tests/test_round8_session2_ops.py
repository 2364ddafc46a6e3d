"""Semantic pins for the eleven round-8 session-2 additions
(nelson_aalen_hazard, runs_test_updown, entropy_rate_markov,
median_of_means, power_mde_planner, sprt_sequential_ab,
burrows_delta_stylometry, fleiss_kappa_dedup, token_budget_planner,
kmeans_coreset_weights, cramers_v_matrix). The oracle contract proves
Spark==DuckDB; these prove both equal the algorithm as specified —
including the coreset SSE pinned against the pure-python Lloyd replica
(integer Σ(m·x − s)² arithmetic) and the SPRT walk re-run in exact
Decimal."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest

from .conftest import SF_CORRECT, SF_SMOKE


def _col(table: str, cols, sf=SF_CORRECT):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/{table}.parquet", columns=cols)
    return [tuple(t[c][i].as_py() for c in cols)
            for i in range(t.num_rows)]


def _round10(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("1e-10"), ROUND_HALF_UP)


def _md5_mod(x, m: int) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16) % m


def _life_table():
    """(h, d, c) rows of the right-censored view→purchase table —
    the KM/Nelson-Aalen shared input."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        KM_HOUR_US)

    rows = _col("events", ["user_id", "ts", "event_type"])
    first_view, first_purch = {}, {}
    horizon = max(ts for _, ts, _ in rows)
    for u, ts, et in rows:
        if et == "view" and (u not in first_view
                             or ts < first_view[u]):
            first_view[u] = ts
    for u, ts, et in rows:
        if (et == "purchase" and u in first_view
                and ts > first_view[u]
                and (u not in first_purch or ts < first_purch[u])):
            first_purch[u] = ts
    lt = Counter()
    for u, fv in first_view.items():
        if u in first_purch:
            us = first_purch[u] - fv
            h = int(us.total_seconds() * 1_000_000) // KM_HOUR_US
            lt[(h, 1)] += 1
        else:
            us = horizon - fv
            h = int(us.total_seconds() * 1_000_000) // KM_HOUR_US
            lt[(h, 0)] += 1
    hours = sorted({h for h, _ in lt})
    return [(h, lt.get((h, 1), 0), lt.get((h, 0), 0)) for h in hours]


def test_nelson_aalen_python_replica(spark):
    """Ĥ must equal the textbook Σ d/n increment replica and
    exp(−Ĥ) must upper-bound the KM product-limit curve (the
    classical NA ≥ KM survival inequality)."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        nelson_aalen_hazard)

    lt = _life_table()
    n_total = sum(d + c for _, d, c in lt)
    at_risk = n_total
    cum = Decimal(0)
    expect = {}
    for h, d, c in lt:
        inc = _round10(d / at_risk)
        cum += inc
        if d >= 1:
            expect[h] = (at_risk, d, float(inc), float(cum))
        at_risk -= d + c
    rows = nelson_aalen_hazard(spark, SF_CORRECT).collect()
    assert {r["duration_h"] for r in rows} == set(expect)
    for r in rows:
        n_risk, d, inc, cum_h = expect[r["duration_h"]]
        assert r["n_risk"] == n_risk
        assert r["n_events"] == d
        assert r["hazard_inc"] == pytest.approx(inc, abs=1e-12)
        assert r["cum_hazard"] == pytest.approx(cum_h, abs=1e-9)
        assert r["na_survival"] == pytest.approx(
            math.exp(-cum_h), abs=1e-6)
    # NA survival ≥ KM survival at every event time (1-x ≤ e^-x)
    from mapreduce_in_pthreads_spark.plans.registry import REGISTRY
    km = {r["duration_h"]: r["survival"]
          for r in REGISTRY["kaplan_meier_conversion"]
          .fn(spark, SF_CORRECT).collect()}
    for r in rows:
        assert r["na_survival"] >= km[r["duration_h"]] - 1e-6


def test_runs_test_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        runs_test_updown)

    daily = Counter()
    for et, ts in _col("events", ["event_type", "ts"]):
        daily[(et, int(ts.timestamp()) // 86400)] += 1
    series = defaultdict(list)
    for (et, day), y in sorted(daily.items()):
        series[et].append(y)
    rows = runs_test_updown(spark, SF_CORRECT).collect()
    assert {r["event_type"] for r in rows} == set(series)
    for r in rows:
        ys = series[r["event_type"]]
        signs = [1 if b > a else -1
                 for a, b in zip(ys, ys[1:]) if b != a]
        n1 = sum(1 for s in signs if s > 0)
        n2 = len(signs) - n1
        runs = sum(1 for i, s in enumerate(signs)
                   if i == 0 or signs[i - 1] != s)
        assert (r["n_moves"], r["n_up"], r["n_down"], r["n_runs"]) \
            == (len(signs), n1, n2, runs)
        if n1 and n2 and len(signs) > 1:
            n = n1 + n2
            e = 1 + 2 * n1 * n2 / n
            v = (2 * n1 * n2 * (2 * n1 * n2 - n)) / (n * n * (n - 1))
            assert r["z"] == pytest.approx((runs - e) / math.sqrt(v),
                                           abs=1e-6)


def _session_transitions():
    rows = sorted(_col("events",
                       ["user_id", "ts", "event_id", "event_type"]))
    by_user = defaultdict(list)
    for u, ts, eid, et in rows:
        by_user[u].append((ts, eid, et))
    trans = Counter()
    for u, evs in by_user.items():
        evs.sort()
        for (t1, _, a), (t2, _, b) in zip(evs, evs[1:]):
            if (t2 - t1).total_seconds() * 1_000_000 < 30 * 60 * 1e6:
                trans[(a, b)] += 1
    return trans


def test_entropy_rate_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        entropy_rate_markov)

    trans = _session_transitions()
    n = sum(trans.values())
    row_tot = Counter()
    for (a, _), c in trans.items():
        row_tot[a] += c
    s = sum((_round10((c / n) * math.log(c / row_tot[a]))
             for (a, _), c in trans.items()), Decimal(0))
    h = -float(s)
    [r] = entropy_rate_markov(spark, SF_CORRECT).collect()
    assert r["n_transitions"] == n
    assert r["n_states"] == len(row_tot)
    assert r["entropy_rate_nats"] == pytest.approx(h, abs=1e-6)
    assert r["perplexity"] == pytest.approx(math.exp(h), abs=1e-6)
    assert 0.0 <= r["entropy_rate_nats"] <= math.log(r["n_states"]) \
        + 1e-9
    assert r["predictability"] == pytest.approx(
        1 - h / math.log(len(row_tot)), abs=1e-6)


def test_median_of_means_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.advanced import (
        MOM_BUCKETS, median_of_means)

    sums = defaultdict(lambda: [0, Decimal(0)])
    for eid, v in _col("events", ["event_id", "value"]):
        b = _md5_mod(eid, MOM_BUCKETS)
        sums[b][0] += 1
        sums[b][1] += Decimal(repr(v)).quantize(Decimal("0.0001"),
                                                ROUND_HALF_UP)
    means = sorted((float(s) / n, b) for b, (n, s) in sums.items())
    lo, hi = means[MOM_BUCKETS // 2 - 1][0], means[MOM_BUCKETS // 2][0]
    n_all = sum(n for n, _ in sums.values())
    plain = float(sum(s for _, s in sums.values())) / n_all
    [r] = median_of_means(spark, SF_CORRECT).collect()
    assert r["n"] == n_all
    assert r["n_buckets"] == MOM_BUCKETS
    assert r["mom"] == pytest.approx((lo + hi) / 2, abs=1e-9)
    assert r["plain_mean"] == pytest.approx(plain, abs=1e-9)
    assert r["abs_shift"] == pytest.approx(
        abs((lo + hi) / 2 - plain), abs=1e-9)


def test_power_mde_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.advanced import (
        MDE_Z_ALPHA, MDE_Z_BETA, power_mde_planner)

    conv = defaultdict(int)
    for u, et in _col("events", ["user_id", "event_type"]):
        conv[u] |= et == "purchase"
    n1 = sum(1 for u in conv if _md5_mod(u, 2) == 0)
    n2 = len(conv) - n1
    c_all = sum(conv.values())
    p = c_all / len(conv)
    zs = MDE_Z_ALPHA + MDE_Z_BETA
    mde = zs * math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    [r] = power_mde_planner(spark, SF_CORRECT).collect()
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert r["p_pooled"] == pytest.approx(p, abs=1e-9)
    assert r["mde_abs"] == pytest.approx(mde, abs=1e-6)
    assert r["mde_rel"] == pytest.approx(mde / p, abs=1e-6)
    assert r["n_per_arm_for_1pt"] == math.ceil(
        zs * zs * 2 * p * (1 - p) / 1e-4)


def test_sprt_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        SPRT_BOUND, SPRT_LA, SPRT_LB, sprt_sequential_ab)

    la, lb = Decimal(SPRT_LA), Decimal(SPRT_LB)
    bound = Decimal(SPRT_BOUND)
    arms = defaultdict(list)
    for u, ts, eid, et in sorted(
            _col("events", ["user_id", "ts", "event_id",
                            "event_type"]),
            key=lambda t: (t[1], t[2])):
        arms[_md5_mod(u, 2)].append(1 if et == "purchase" else 0)
    rows = {r["arm"]: r
            for r in sprt_sequential_ab(spark, SF_CORRECT).collect()}
    assert set(rows) == set(arms)
    for arm, xs in arms.items():
        llr, cross, decision = Decimal(0), None, "continue"
        for i, x in enumerate(xs, 1):
            llr += la if x else lb
            if cross is None and (llr >= bound or llr <= -bound):
                cross = i
                decision = "accept_h1" if llr >= bound else "accept_h0"
        r = rows[arm]
        assert r["n_trials"] == len(xs)
        assert r["n_success"] == sum(xs)
        assert r["llr_final"] == pytest.approx(float(llr), abs=1e-9)
        assert r["first_cross_idx"] == cross
        assert r["decision"] == decision


def test_burrows_delta_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        DELTA_TOP_WORDS, burrows_delta_stylometry)

    cnt = defaultdict(Counter)
    for src, text in _col("documents", ["source", "text"]):
        cnt[src].update(text.split(" "))
    vocab = Counter()
    for c in cnt.values():
        vocab.update(c)
    top = [w for w, _ in sorted(vocab.items(),
                                key=lambda kv: (-kv[1], kv[0]))
           [:DELTA_TOP_WORDS]]
    srcs = sorted(cnt)
    f = {(w, s): float(_round10(cnt[s][w]
                                / sum(cnt[s].values())))
         for w in top for s in srcs}
    z = {}
    for w in top:
        vals = [f[(w, s)] for s in srcs]
        sf_ = float(sum((Decimal(repr(v)) for v in vals), Decimal(0)))
        sff = float(sum((Decimal(repr(v)) * Decimal(repr(v))
                         for v in vals), Decimal(0)))
        s_ = len(srcs)
        var = (sff - sf_ * sf_ / s_) / (s_ - 1)
        sd = math.sqrt(var) if var > 0 else 0.0
        for s in srcs:
            z[(w, s)] = ((f[(w, s)] - sf_ / s_) / sd) if sd > 0 else 0.0
    rows = burrows_delta_stylometry(spark, SF_CORRECT).collect()
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        a, b = r["source_a"], r["source_b"]
        assert a < b
        assert r["k_words"] == len(top)
        delta = float(sum(
            (_round10(abs(z[(w, a)] - z[(w, b)])) for w in top),
            Decimal(0))) / len(top)
        assert r["delta"] == pytest.approx(delta, abs=1e-6)


def test_fleiss_kappa_formula_pin(spark):
    """κ must equal the textbook two-category Fleiss formula applied
    to the three raters' own flag sets (taken from the registry's
    dedup relations), and the vote histogram must partition n."""
    from mapreduce_in_pthreads_spark.operators.dedup import (
        fleiss_kappa_dedup, minhash_lsh_dedup, simhash_hamming_dedup)

    docs = _col("documents", ["doc_id", "text"])
    text_groups = Counter(t for _, t in docs)
    ex = {d for d, t in docs if text_groups[t] >= 2}
    mh_pairs = minhash_lsh_dedup(spark, SF_CORRECT) \
        .select("doc_a", "doc_b").collect()
    sh_pairs = simhash_hamming_dedup(spark, SF_CORRECT) \
        .select("doc_a", "doc_b").collect()
    mh = {x for r in mh_pairs for x in (r["doc_a"], r["doc_b"])}
    sh = {x for r in sh_pairs for x in (r["doc_a"], r["doc_b"])}
    ks = [int(d in ex) + int(d in mh) + int(d in sh) for d, _ in docs]
    n = len(ks)
    pbar = sum(k * k + (3 - k) * (3 - k) for k in ks) / (6 * n) \
        - 3 * n / (6 * n)
    p = sum(ks) / (3 * n)
    pe = p * p + (1 - p) * (1 - p)
    [r] = fleiss_kappa_dedup(spark, SF_CORRECT).collect()
    assert r["n_docs"] == n
    hist = Counter(ks)
    assert (r["n_k0"], r["n_k1"], r["n_k2"], r["n_k3"]) == (
        hist[0], hist[1], hist[2], hist[3])
    assert r["n_k0"] + r["n_k1"] + r["n_k2"] + r["n_k3"] == n
    assert r["p_bar"] == pytest.approx(pbar, abs=1e-9)
    assert r["p_e"] == pytest.approx(pe, abs=1e-9)
    if pe < 1:
        assert r["fleiss_kappa"] == pytest.approx(
            (pbar - pe) / (1 - pe), abs=1e-6)
        assert r["fleiss_kappa"] <= 1.0


def test_token_budget_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.curation import (
        BUDGET_MAX_EPOCHS, BUDGET_TARGET_TOKENS, token_budget_planner)

    toks = Counter()
    for src, text in _col("documents", ["source", "text"]):
        toks[src] += len(text.split(" "))
    srcs = sorted(toks)
    cum, cums = 0.0, {}
    for s in srcs:
        cum += math.sqrt(toks[s])
        cums[s] = cum
    total = cum
    rows = token_budget_planner(spark, SF_CORRECT).collect()
    assert {r["source"] for r in rows} == set(srcs)
    for r in rows:
        s = r["source"]
        quota = math.floor(float(BUDGET_TARGET_TOKENS)
                           * math.sqrt(toks[s]) / total)
        cap = math.floor(BUDGET_MAX_EPOCHS * toks[s])
        assert r["n_tokens"] == toks[s]
        assert r["token_quota"] == quota
        assert r["epochs"] == pytest.approx(quota / toks[s], abs=1e-6)
        assert r["over_ceiling"] == (quota / toks[s]
                                     > BUDGET_MAX_EPOCHS)
        assert r["granted_tokens"] == min(quota, cap)
        assert r["deficit_tokens"] == quota - min(quota, cap)


def test_kmeans_coreset_python_replica(spark):
    """Per-cell SSE and sensitivity shares must equal the pure-python
    Lloyd replica's integer Σ(m·x − s)² arithmetic (sf0.001, the
    quantizer-suite scale)."""
    import numpy as np

    from mapreduce_in_pthreads_spark.operators.quantizer import (
        CORESET_M, kmeans_coreset_weights)

    from .test_quantizer import _codes, _load_vecs, _train_reference

    codes = _codes(_load_vecs())
    assign, _, _ = _train_reference(codes)
    members = defaultdict(list)
    for vid, cell in assign.items():
        members[cell].append(codes[vid])
    expect = {}
    for cell, ms in members.items():
        m = len(ms)
        s = np.sum(np.stack(ms), axis=0, dtype=np.int64)
        d2m2 = sum(int(np.sum((m * c - s) ** 2)) for c in ms)
        expect[cell] = (m, d2m2 / (m * m))
    tot_sse = sum(v for _, v in expect.values())
    tot_n = sum(m for m, _ in expect.values())
    rows = kmeans_coreset_weights(spark, SF_SMOKE).collect()
    assert {r["cell"] for r in rows} == set(expect)
    shares = 0.0
    for r in rows:
        m, sse = expect[r["cell"]]
        assert r["n_vecs"] == m
        assert r["sse"] == pytest.approx(sse, abs=1e-6)
        share = 0.5 * sse / tot_sse + 0.5 * m / tot_n
        assert r["sens_share"] == pytest.approx(share, abs=1e-9)
        assert r["coreset_draws"] == math.floor(CORESET_M * share)
        shares += r["sens_share"]
    assert shares == pytest.approx(1.0, abs=1e-6)


def test_cramers_v_python_replica(spark):
    from mapreduce_in_pthreads_spark.operators.curation import (
        CRAMER_LEN_BAND, cramers_v_matrix)

    docs = [(lang, src, nc // CRAMER_LEN_BAND)
            for lang, src, nc in _col(
                "documents", ["lang", "source", "n_chars"])]

    def v_of(ai, bi):
        obs = Counter((d[ai], d[bi]) for d in docs)
        ra = Counter(d[ai] for d in docs)
        ca = Counter(d[bi] for d in docs)
        n = len(docs)
        chi2 = float(sum(
            (_round10((obs.get((x, y), 0) - ra[x] * ca[y] / n) ** 2
                      / (ra[x] * ca[y] / n))
             for x in ra for y in ca), Decimal(0)))
        mind = min(len(ra) - 1, len(ca) - 1)
        return (n, len(ra), len(ca), chi2,
                math.sqrt(chi2 / (n * mind)))

    expect = {"lang~source": v_of(0, 1), "lang~len_band": v_of(0, 2),
              "source~len_band": v_of(1, 2)}
    rows = cramers_v_matrix(spark, SF_CORRECT).collect()
    assert {r["pair"] for r in rows} == set(expect)
    for r in rows:
        n, ra, ca, chi2, v = expect[r["pair"]]
        assert (r["n_docs"], r["levels_a"], r["levels_b"]) == (
            n, ra, ca)
        assert r["dof"] == (ra - 1) * (ca - 1)
        assert r["chi2"] == pytest.approx(chi2, abs=1e-5)
        assert r["cramers_v"] == pytest.approx(v, abs=1e-6)
        assert 0.0 <= r["cramers_v"] <= 1.0 + 1e-9


def test_median_of_means_resists_poisoned_bucket(spark, tmp_path):
    """The docstring's robustness CLAIM, demonstrated: poisoning every
    event md5-routed to ONE of the 16 buckets with a huge value drags
    the plain mean far away but moves the median of bucket means only
    within the clean buckets' spread."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import shutil

    from mapreduce_in_pthreads_spark.operators.advanced import (
        MOM_BUCKETS, median_of_means)

    n = 4000
    ids = list(range(1, n + 1))
    vals = [float(1 + (i % 7)) for i in ids]          # clean: mean ~4
    poison = 1_000_000.0
    vals = [poison if _md5_mod(i, MOM_BUCKETS) == 0 else v
            for i, v in zip(ids, vals)]
    ts = pa.array([0] * n, type=pa.timestamp("us"))
    tbl = pa.table({
        "event_id": pa.array(ids, type=pa.int64()),
        "ts": ts,
        "user_id": pa.array(ids, type=pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(vals, type=pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    sf_dir = tmp_path / "poisoned"
    sf_dir.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SF_CORRECT}/{t}.parquet",
                    sf_dir / f"{t}.parquet")
    pq.write_table(tbl, sf_dir / "events.parquet")
    [r] = median_of_means(spark, str(sf_dir)).collect()
    assert r["plain_mean"] > 10_000      # dragged by the poison bucket
    assert r["mom"] < 10                 # the median barely notices
    assert r["abs_shift"] > 10_000
