"""Semi-structured / nested-type surface beyond plain JSON extraction:
map-typed columns, outer explodes, malformed-input resilience
(SURVEY.md §2.3 'Scalar fns' map/JSON rows).

Map values never cross the oracle boundary directly (map key order is
engine-dependent); queries project maps down to sorted arrays and
scalar lookups, which compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map from the tokenized document (word → first position),
    then exercise lookups / keys / size. map_from_entries keeps the
    FIRST entry per key via upstream aggregation (explicit, since
    duplicate-key maps are engine-dependent)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
    firsts = (tok.groupBy("doc_id", "word")
              .agg(F.min(F.col("pos0") + 1).alias("first_pos")))
    per_doc = firsts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word", "first_pos"))))
        .alias("m"))
    # vocab is serialized to one space-joined string: the driver's
    # canonicalizer (pandas sort_values) cannot hash list cells, so
    # array-valued OUTPUT columns must cross the boundary as scalars.
    return per_doc.select(
        "doc_id",
        F.size("m").cast("bigint").alias("n_distinct_words"),
        F.concat_ws(" ", F.sort_array(F.map_keys("m"))).alias("vocab_sorted"),
        # try_element_at: plain element_at throws on a missing map key
        # under ANSI mode; the oracle's CASE yields NULL
        F.try_element_at("m", F.lit("the")).cast("bigint").alias("the_first_pos"),
    )


MAP_FUNCTIONS_SQL = """
WITH tok AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
    FROM documents
), firsts AS (
    SELECT doc_id, word, min(pos) AS first_pos
    FROM tok GROUP BY doc_id, word
)
SELECT doc_id,
       count(*) AS n_distinct_words,
       coalesce(array_to_string(list_sort(list(word)), ' '), '')
           AS vocab_sorted,
       max(CASE WHEN word = 'the' THEN first_pos END) AS the_first_pos
FROM firsts GROUP BY doc_id
"""


def explode_outer_rare_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: docs keep a row (null word) even when their
    rare-word array is empty — the outer-join-shaped explode."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    rare = F.filter(F.array_distinct(toks),
                    lambda t: F.length(t) >= 8)
    return docs.select(
        "doc_id", F.explode_outer(rare).alias("rare_word"))


EXPLODE_OUTER_SQL = """
SELECT doc_id, u.rare_word
FROM documents
LEFT JOIN LATERAL (
    SELECT unnest(list_filter(list_distinct(string_split(text, ' ')),
                              t -> length(t) >= 8)) AS rare_word
) u ON TRUE
"""


def malformed_json_resilience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resilience contract for dirty data: half the inputs are
    deliberately corrupted (truncated JSON); the typed parse must
    yield NULL — never fail the job — and the query reports the
    parse-success census. At 100 TB some fraction of every feed is
    malformed; a pipeline that throws on row 3 billion is wrong."""
    ev = load_table(spark, sf_dir, "events")
    dirty = F.when(F.col("event_id") % 2 == 0,
                   F.expr("substring(props, 1, length(props) - 2)")
                   ).otherwise(F.col("props"))
    k = F.from_json(dirty, "k INT")["k"]
    return (
        ev.select("event_id", k.alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("k").alias("n_parsed"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .alias("n_malformed"),
            F.sum("k").alias("sum_k"),
        )
    )


MALFORMED_JSON_SQL = """
WITH dirty AS (
    SELECT event_id,
           CASE WHEN event_id % 2 = 0
                THEN substring(props, 1, length(props) - 2)
                ELSE props END AS props
    FROM events
), parsed AS (
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN CAST(json_extract_string(props, '$.k') AS INT)
                END AS k
    FROM dirty
)
SELECT count(*) AS n_rows,
       count(k) AS n_parsed,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM parsed
"""


def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the VARIANT type (Spark 4):
    parse_json once into the binary variant encoding, extract many —
    the scale answer to repeated get_json_object calls, which re-parse
    the JSON string per extraction. Missing paths go through
    try_variant_get → NULL (counted in the audit column), mirroring
    the malformed-JSON resilience contract.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.does_not_exist", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"),
             F.count("m").alias("n_missing_path"))
    )


VARIANT_PROPS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       count(json_extract_string(props, '$.does_not_exist'))
           AS n_missing_path
FROM events
GROUP BY event_type
"""


def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — ``map_filter`` / ``map_zip_with``
    over per-doc word→count and word→first-position maps, projected to
    an engine-comparable sorted-entry string. The per-doc maps are
    bounded by doc vocabulary, so the whole pipeline stays one
    tokenize-shuffle wide at any corpus size (same shuffle as the
    flagship index; the map algebra is a zero-shuffle projection)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
    firsts = (tok.groupBy("doc_id", "word")
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.min(F.col("pos0") + 1).alias("first_pos")))
    per_doc = firsts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word", "cnt"))))
        .alias("m_cnt"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word", "first_pos"))))
        .alias("m_pos"))
    repeated = F.map_filter("m_cnt", lambda k, v: v >= 2)
    # union-of-keys semantics: non-repeated words surface NULL counts,
    # dropped by the second map_filter
    scores = F.map_zip_with(
        repeated, "m_pos",
        lambda k, c, p: c * 100 + p.cast("bigint"))
    scores = F.map_filter(scores, lambda k, v: v.isNotNull())
    return per_doc.select(
        "doc_id",
        F.size(scores).cast("bigint").alias("n_repeated"),
        F.array_join(
            F.transform(
                F.sort_array(F.map_entries(scores)),
                lambda e: F.format_string("%s:%d", e.key, e.value)),
            ",").alias("repeated_summary"))


MAP_HIGHER_ORDER_SQL = """
WITH tok AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
    FROM documents
), firsts AS (
    SELECT doc_id, word, count(*) AS cnt, min(pos) AS first_pos
    FROM tok GROUP BY doc_id, word
)
SELECT doc_id,
       count(*) FILTER (cnt >= 2) AS n_repeated,
       coalesce(string_agg(printf('%s:%d', word, cnt * 100 + first_pos),
                           ',' ORDER BY word) FILTER (cnt >= 2),
                '') AS repeated_summary
FROM firsts GROUP BY doc_id
"""
