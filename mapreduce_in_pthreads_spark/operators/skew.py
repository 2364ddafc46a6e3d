"""Skew-mitigation operators (100 TB contract, SURVEY.md §2.3 notes).

The documents vocabulary is tiny (~31 distinct words over 260K+ token
occurrences at sf0.1) — a genuinely skewed key space where a naive
groupBy concentrates whole key populations on single reducers (the
reference had the same issue: `hash(word) % NC` sends every 'the' to
one consumer, mapreduce.c:117).

``salted_word_count`` is the classic two-stage rewrite: salt the key →
partial aggregate over (key, salt) → final aggregate over key. The
first shuffle spreads each hot key over SALT_BUCKETS reducers; the
second shuffles only #keys × SALT_BUCKETS tiny partial rows. Result is
IDENTICAL to the plain aggregation (counts are associative), which the
shared oracle proves.

AQE's skew-join splitting handles the JOIN version of this problem
automatically (enabled in session.py); explicit salting remains the
tool for skewed AGGREGATIONS with non-combinable state or extreme
single-key hotspots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.inverted_index import TOKENS_FILTERED_SQL, tokens
from ..sources.tables import load_table

SALT_BUCKETS = 16


def salted_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → count via salt → partial → final. Same result as
    ``word_count``, skew-proof shuffle profile."""
    t = tokens(spark, sf_dir)
    salted = t.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id", "pos"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("word", "salt").agg(
        F.count(F.lit(1)).alias("partial_n"))
    return partial.groupBy("word").agg(
        F.sum("partial_n").alias("n_occurrences"))


SALTED_WORD_COUNT_SQL = f"""
SELECT word, count(*) AS n_occurrences
FROM ({TOKENS_FILTERED_SQL}) w GROUP BY word
"""


def gini_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis: per event_type, the concentration
    profile of the ``user_id`` key population — key count, total rows,
    the hottest key's share, and the Gini coefficient of the per-key
    row-count distribution. This is the audit you run BEFORE picking a
    shuffle key at 100 TB: Gini near 0 = uniform keys (hash partition
    and move on), Gini near 1 / high max_share = a salted rewrite
    (``salted_word_count``) or AQE skew-split territory.

    Gini via the rank identity over ascending-sorted counts x_1..x_n:
        G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n · Σ x_i)
    — every term an exact BIGINT (Σ i·x_i ≤ n·Σx fits int64 far past
    any real key population), so the single final division is one
    correctly-rounded double op on both engines (round 10 dp). Ties in
    the sort order are harmless: equal x values contribute the same
    Σ i·x_i over their rank block in any permutation.

    Scale: one combinable (event_type, user_id) count, then a window
    over the PER-KEY relation (|users| rows per type, not |events|) —
    the window partitions by event_type whose per-partition population
    is the key count, already reduced. No joins, no global sort.
    """
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("x"))
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    ranked = per_key.withColumn("i", F.row_number().over(w))
    return (ranked.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("x").alias("total_rows"),
                 F.max("x").alias("max_key_rows"),
                 F.sum(F.col("i") * F.col("x")).alias("s_ix"))
            .select(
                "event_type", "n_keys", "total_rows",
                F.round(F.col("max_key_rows")
                        / F.col("total_rows").cast("double"), 10)
                .alias("max_share"),
                F.round((2 * F.col("s_ix")
                         - (F.col("n_keys") + 1) * F.col("total_rows"))
                        / (F.col("n_keys")
                           * F.col("total_rows")).cast("double"), 10)
                .alias("gini")))


GINI_KEY_SKEW_SQL = """
WITH per_key AS (
    SELECT event_type, user_id, count(*) AS x
    FROM events GROUP BY event_type, user_id
), ranked AS (
    SELECT event_type, x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY x, user_id) AS i
    FROM per_key
)
SELECT event_type,
       count(*) AS n_keys,
       CAST(sum(x) AS BIGINT) AS total_rows,
       round(max(x) / CAST(sum(x) AS DOUBLE), 10) AS max_share,
       round((2 * sum(i * x) - (count(*) + 1) * sum(x))
             / CAST(count(*) * sum(x) AS DOUBLE), 10) AS gini
FROM ranked
GROUP BY event_type
"""


SALT_AUDIT_PARTS = 32   # simulated shuffle partition count


def salting_effectiveness_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Quantify what `salted_word_count`'s rewrite actually buys: the
    per-partition load profile of the word-count shuffle under (a)
    plain hash partitioning on the word and (b) salted two-phase
    partitioning on (word, salt) — the companion measurement to
    `gini_key_skew`'s diagnosis (that one says WHETHER to salt; this
    one shows the shuffle the salt produces). Reported per scheme:
    simulated partition count, rows routed, the hottest partition's
    rows and share, and the max/mean imbalance factor.

    Partition assignment is simulated with the md5-mod hash (the
    repo's cross-engine uniform family) over 32 partitions — the same
    mod arithmetic a HashPartitioner applies, so the profile is the
    one the real exchange would see modulo hash choice; the salt is
    the occurrence ordinal mod SALT_BUCKETS, the deterministic
    per-row salt the shipped operator derives from (doc_id, pos).

    Exactness: routing and loads are integers; share and imbalance
    are divisions of exact ints (share < 1 round-10-pinned;
    imbalance = max·parts/total left unrounded — identical operands).

    Scale: two combinable (scheme, partition) counts over the token
    relation + a tiny per-scheme rollup. The audit costs one scan; a
    wrong shuffle key at 100 TB costs a straggler.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"))
    plain_part = (F.conv(F.substring(F.md5("word"), 1, 15), 16, 10)
                  .cast("long") % SALT_AUDIT_PARTS)
    salt = F.pmod(F.col("pos"), F.lit(SALT_BUCKETS))
    salted_part = (F.conv(F.substring(
        F.md5(F.concat("word", F.lit("#"), salt.cast("string"))),
        1, 15), 16, 10).cast("long") % SALT_AUDIT_PARTS)
    routed = (tok.select(F.lit("plain").alias("scheme"),
                         plain_part.alias("part"))
              .unionAll(tok.select(F.lit("salted").alias("scheme"),
                                   salted_part.alias("part"))))
    loads = (routed.groupBy("scheme", "part")
             .agg(F.count(F.lit(1)).alias("rows")))
    return (loads.groupBy("scheme")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.sum("rows").alias("total_rows"),
                 F.max("rows").alias("max_part_rows"))
            .select("scheme", "n_parts", "total_rows", "max_part_rows",
                    F.round(F.col("max_part_rows")
                            / F.col("total_rows"), 10)
                    .alias("max_part_share"),
                    (F.col("max_part_rows")
                     * F.lit(SALT_AUDIT_PARTS).cast("double")
                     / F.col("total_rows")).alias("imbalance")))


SALTING_AUDIT_SQL = f"""
WITH tok AS (
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           string_split(text, ' ')[CAST(i AS INT)] AS word
    FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
          FROM documents),
         unnest(range(1, len(toks) + 1)) AS t(i)
), routed AS (
    SELECT 'plain' AS scheme,
           ('0x' || substring(md5(word), 1, 15))::BIGINT
               % {SALT_AUDIT_PARTS} AS part
    FROM tok
    UNION ALL
    SELECT 'salted',
           ('0x' || substring(md5(word || '#' ||
                CAST(pos % {SALT_BUCKETS} AS VARCHAR)), 1, 15))::BIGINT
               % {SALT_AUDIT_PARTS}
    FROM tok
), loads AS (
    SELECT scheme, part, count(*) AS rows
    FROM routed GROUP BY 1, 2
)
SELECT scheme, count(*) AS n_parts,
       CAST(sum(rows) AS BIGINT) AS total_rows,
       max(rows) AS max_part_rows,
       round(CAST(max(rows) AS DOUBLE) / sum(rows), 10)
           AS max_part_share,
       CAST(max(rows) AS DOUBLE) * {SALT_AUDIT_PARTS} / sum(rows)
           AS imbalance
FROM loads GROUP BY scheme
"""
