"""Semantic pins for the eight round-8 additions (sliding_window_dau,
fellegi_sunter_linkage, curriculum_interleave, label_propagation_round,
grouped_ols_fit, dbscan_grid_core, rake_keyphrases, hill_tail_index).
The oracle contract proves Spark==DuckDB; these prove both equal the
algorithm as specified — including the DBSCAN census pinned against a
BRUTE-FORCE O(n²) neighbor count (the grid blocking must be lossless)
and the RAKE ranking pinned against an exact-Decimal replica of the
pinned-ratio sums."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest

from .conftest import SF_CORRECT


def _col(table: str, cols):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_CORRECT}/{table}.parquet", columns=cols)
    return [tuple(t[c][i].as_py() for c in cols)
            for i in range(t.num_rows)]


def _round10(x: float) -> Decimal:
    """Replica of Spark F.round(double, 10) / the oracle's round(x, 10):
    HALF_UP on the shortest decimal repr of the double."""
    return Decimal(repr(x)).quantize(Decimal("1e-10"), ROUND_HALF_UP)


def _events_days():
    rows = _col("events", ["user_id", "ts"])
    return [(u, int(ts.timestamp()) // 86400) for u, ts in rows]


def test_sliding_window_dau_python_replica(spark):
    """DAU, trailing-7-day WAU and stickiness must equal the direct
    per-day set replica."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        DAU_WINDOW_DAYS, sliding_window_dau)

    user_days = set(_events_days())
    days = {d for _, d in user_days}
    by_user = defaultdict(set)
    for u, d in user_days:
        by_user[u].add(d)
    rows = sliding_window_dau(spark, SF_CORRECT).collect()
    assert {r["day"] for r in rows} == days
    for r in rows:
        d = r["day"]
        dau1 = sum(1 for u in by_user if d in by_user[u])
        dau7 = sum(1 for u in by_user
                   if any(d - DAU_WINDOW_DAYS + 1 <= x <= d
                          for x in by_user[u]))
        assert r["dau1"] == dau1
        assert r["dau7"] == dau7
        assert r["stickiness"] == pytest.approx(dau1 / dau7, abs=1e-9)
        assert r["dau1"] <= r["dau7"]  # a day's actives are in its WAU


def test_fellegi_sunter_python_replica(spark):
    """Agreement-pattern counts and ln(m/u) weights must equal the
    blocked all-pairs replica with frequency-estimated u."""
    from mapreduce_in_pthreads_spark.operators.dedup import (
        FS_AFFIX, FS_LEN_BAND, FS_M_PREFIX, FS_M_SOURCE, FS_M_SUFFIX,
        fellegi_sunter_linkage)

    docs = [(i, lang, src, text[:FS_AFFIX], text[-FS_AFFIX:],
             nc // FS_LEN_BAND)
            for i, lang, src, text, nc in _col(
                "documents",
                ["doc_id", "lang", "source", "text", "n_chars"])]
    n = len(docs)

    def u(vals):
        c = Counter(vals)
        return sum(v * v for v in c.values()) / (n * n)

    u_src = u([d[2] for d in docs])
    u_pre = u([d[3] for d in docs])
    u_suf = u([d[4] for d in docs])
    blocks = defaultdict(list)
    for d in docs:
        blocks[(d[1], d[5])].append(d)
    census = Counter()
    for blk in blocks.values():
        blk = sorted(blk)
        for i in range(len(blk)):
            for j in range(i + 1, len(blk)):
                a, b = blk[i], blk[j]
                census[(int(a[2] == b[2]), int(a[3] == b[3]),
                        int(a[4] == b[4]))] += 1

    def w(ag, m, uf):
        return math.log(m / uf) if ag else math.log((1 - m) / (1 - uf))

    rows = fellegi_sunter_linkage(spark, SF_CORRECT).collect()
    assert {(r["ag_source"], r["ag_prefix"], r["ag_suffix"])
            for r in rows} == set(census)
    for r in rows:
        pat = (r["ag_source"], r["ag_prefix"], r["ag_suffix"])
        assert r["n_pairs"] == census[pat]
        expect = (w(pat[0], FS_M_SOURCE, u_src)
                  + w(pat[1], FS_M_PREFIX, u_pre)
                  + w(pat[2], FS_M_SUFFIX, u_suf))
        assert r["match_weight"] == pytest.approx(expect, abs=1e-6)
    # full-agreement must outweigh full-disagreement
    by_pat = {(r["ag_source"], r["ag_prefix"], r["ag_suffix"]):
              r["match_weight"] for r in rows}
    if (1, 1, 1) in by_pat and (0, 0, 0) in by_pat:
        assert by_pat[(1, 1, 1)] > by_pat[(0, 0, 0)]


def _ntile(n_rows: int, n_buckets: int):
    """bucket (1-based) per 0-based rank — both engines' ntile rule:
    the first n_rows % n_buckets buckets take the extra row."""
    base, extra = divmod(n_rows, n_buckets)
    out = []
    for b in range(1, n_buckets + 1):
        out.extend([b] * (base + (1 if b <= extra else 0)))
    return out


def test_curriculum_interleave_python_replica(spark):
    """Decile placement stats must equal the ntile + md5-shuffle +
    round-robin replica, and round-robin must hold: the mean gap of
    every full decile is within 1 of the decile count."""
    from mapreduce_in_pthreads_spark.operators.curation import (
        CURRICULUM_DECILES, curriculum_interleave)

    by_lang = defaultdict(list)
    for doc_id, lang, n_chars in _col(
            "documents", ["doc_id", "lang", "n_chars"]):
        by_lang[lang].append((n_chars, doc_id))
    expect = {}
    for lang, items in by_lang.items():
        items.sort()
        dec = _ntile(len(items), CURRICULUM_DECILES)
        staged = []  # (r, decile) per doc after md5 in-decile shuffle
        per_dec = defaultdict(list)
        for (n_chars, doc_id), d in zip(items, dec):
            h = hashlib.md5(str(doc_id).encode()).hexdigest()
            per_dec[d].append((h, doc_id))
        for d, lst in per_dec.items():
            lst.sort()
            for r, (h, doc_id) in enumerate(lst, 1):
                staged.append((r, d))
        staged.sort()
        for pos, (r, d) in enumerate(staged, 1):
            rec = expect.setdefault((lang, d), [0, None, None])
            rec[0] += 1
            rec[1] = pos if rec[1] is None else min(rec[1], pos)
            rec[2] = pos if rec[2] is None else max(rec[2], pos)

    rows = curriculum_interleave(spark, SF_CORRECT).collect()
    assert {(r["lang"], r["decile"]) for r in rows} == set(expect)
    for r in rows:
        n, first, last = expect[(r["lang"], r["decile"])]
        assert (r["n_docs"], r["first_pos"], r["last_pos"]) == (
            n, first, last)
        if n > 1:
            gap = (last - first) / (n - 1)
            assert r["mean_gap"] == pytest.approx(gap, abs=1e-9)
            assert abs(gap - CURRICULUM_DECILES) <= 1.0


def test_label_propagation_python_replica(spark):
    """Top-20 communities must equal the heaviest-neighbor-argmax
    replica over symmetrized bigram edges."""
    from mapreduce_in_pthreads_spark.operators.iterative import (
        LPA_TOP, label_propagation_round)

    weight = Counter()
    for (text,) in _col("documents", ["text"]):
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            weight[(a, b)] += 1
            weight[(b, a)] += 1
    nbrs = defaultdict(dict)
    for (a, b), c in weight.items():
        nbrs[a][b] = c
    comm = Counter()
    for a, nb in nbrs.items():
        lab = min(nb, key=lambda v: (-nb[v], v))
        comm[lab] += 1
    top = sorted(comm.items(), key=lambda kv: (-kv[1], kv[0]))[:LPA_TOP]

    rows = sorted(label_propagation_round(spark, SF_CORRECT).collect(),
                  key=lambda r: r["rk"])
    assert [(r["new_label"], r["n_members"]) for r in rows] == top
    assert [r["rk"] for r in rows] == list(range(1, len(top) + 1))


def test_grouped_ols_python_replica(spark):
    """Slope/intercept must equal the closed form over exact decimal
    hourly sums (values HALF_UP-quantized at 4 dp, the dsum rule)."""
    from mapreduce_in_pthreads_spark.operators.advanced import (
        grouped_ols_fit)

    agg = defaultdict(lambda: defaultdict(
        lambda: [0, Decimal(0)]))  # type -> h -> [n_h, S_h]
    for et, ts, v in _col("events", ["event_type", "ts", "value"]):
        h = (int(ts.timestamp()) // 3600) % 24
        rec = agg[et][h]
        rec[0] += 1
        rec[1] += Decimal(repr(v)).quantize(Decimal("0.0001"),
                                            ROUND_HALF_UP)
    rows = grouped_ols_fit(spark, SF_CORRECT).collect()
    assert {r["event_type"] for r in rows} == set(agg)
    for r in rows:
        grid = agg[r["event_type"]]
        n = sum(g[0] for g in grid.values())
        sx = sum(g[0] * h for h, g in grid.items())
        sxx = sum(g[0] * h * h for h, g in grid.items())
        sy = float(sum(g[1] for g in grid.values()))
        sxy = float(sum(h * g[1] for h, g in grid.items()))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert r["n"] == n
        assert r["slope"] == pytest.approx(slope, abs=1e-7)
        assert r["intercept"] == pytest.approx(
            (sy - slope * sx) / n, abs=1e-6)


def test_dbscan_census_equals_bruteforce(spark):
    """The grid-blocked census must equal a BRUTE-FORCE O(n²)
    neighbor count — proving the 3×3 cell patch loses no pairs."""
    from mapreduce_in_pthreads_spark.operators.similarity import (
        DBSCAN_EPS, DBSCAN_MINPTS, dbscan_grid_core)

    pts = [(vid, lab, float(e[0]), float(e[1]))
           for vid, lab, e in _col(
               "embeddings", ["vec_id", "label", "embedding"])]
    eps2 = DBSCAN_EPS * DBSCAN_EPS
    nnb = {vid: 0 for vid, *_ in pts}
    near = defaultdict(set)
    for i, (va, la, xa, ya) in enumerate(pts):
        for vb, lb, xb, yb in pts[i + 1:]:
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= eps2:
                nnb[va] += 1
                nnb[vb] += 1
                near[va].add(vb)
                near[vb].add(va)
    core = {v for v, c in nnb.items() if c >= DBSCAN_MINPTS}
    expect = defaultdict(lambda: [0, 0, 0, 0])
    for vid, lab, *_ in pts:
        e = expect[lab]
        e[0] += 1
        if vid in core:
            e[1] += 1
        elif near[vid] & core:
            e[2] += 1
        else:
            e[3] += 1
    rows = dbscan_grid_core(spark, SF_CORRECT).collect()
    assert {r["label"] for r in rows} == set(expect)
    for r in rows:
        assert [r["n_points"], r["n_core"], r["n_border"],
                r["n_noise"]] == expect[r["label"]]
    # the census is a partition
    assert all(r["n_core"] + r["n_border"] + r["n_noise"]
               == r["n_points"] for r in rows)


def test_rake_python_replica(spark):
    """Top-20 phrases and scores must equal the exact-Decimal RAKE
    replica (deg/freq pinned at 10 dp, then summed exactly)."""
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        RAKE_STOPWORDS, RAKE_TOP, rake_keyphrases)

    stop = set(RAKE_STOPWORDS)
    phrases = Counter()
    freq = Counter()
    deg = Counter()
    for (text,) in _col("documents", ["text"]):
        run = []
        for w in text.split(" ") + ["the"]:  # sentinel flush
            if w in stop:
                if run:
                    phrases[" ".join(run)] += 1
                    for x in run:
                        freq[x] += 1
                        deg[x] += len(run)
                    run = []
            else:
                run.append(w)
    score_w = {w: _round10(deg[w] / freq[w]) for w in freq}
    scored = [(phrase,
               sum((score_w[w] for w in phrase.split(" ")),
                   Decimal(0)),
               len(phrase.split(" ")), n)
              for phrase, n in phrases.items()]
    scored.sort(key=lambda t: (-t[1], t[0]))
    top = scored[:RAKE_TOP]

    rows = sorted(rake_keyphrases(spark, SF_CORRECT).collect(),
                  key=lambda r: r["rk"])
    assert [r["phrase"] for r in rows] == [t[0] for t in top]
    for r, (phrase, sdec, n_words, n_occ) in zip(rows, top):
        assert r["n_words"] == n_words
        assert r["n_occurrences"] == n_occ
        assert r["score"] == pytest.approx(float(sdec), abs=1e-9)


def test_hill_tail_index_python_replica(spark):
    """α̂(k) must equal the order-statistic replica; rungs without
    k+1 users must be absent."""
    from mapreduce_in_pthreads_spark.operators.advanced import (
        HILL_KS, hill_tail_index)

    counts = Counter(u for (u,) in _col("events", ["user_id"]))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [x for _, x in ranked]
    rows = sorted(hill_tail_index(spark, SF_CORRECT).collect(),
                  key=lambda r: r["k"])
    want_ks = [k for k in HILL_KS if len(xs) >= k + 1]
    assert [r["k"] for r in rows] == sorted(want_ks)
    for r in rows:
        k = r["k"]
        xk1 = xs[k]  # 0-based: x_(k+1)
        assert r["x_k1"] == xk1
        s = sum((_round10(math.log(xs[i] / xk1)) for i in range(k)),
                Decimal(0))
        assert r["alpha"] == pytest.approx(k / float(s), abs=1e-5)
        assert r["alpha"] > 0
