"""Expression-class completeness: the scalar/generator operator classes
SURVEY.md §2.11 lists as absent from the reference (explode/flatten, regex
*extraction*, JSON *generation*, map functions, math scalars). Each gets an
oracle-paired query so the engine's claim to them is verified, not asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from .catalog import _register, _t


@_register(
    "explode_tokens_with_pos",
    r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t != '') AS toks
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           generate_subscripts(toks, 1) - 1 AS pos,
           unnest(toks) AS token
    FROM tok
    """,
    "Generator expressions: posexplode of the token array (0-based position "
    "parity with unnest+subscripts)",
    reference="SURVEY.md §2.11 (explode absent in reference; added)",
    tags=("explode",),
)
def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    return toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    )


@_register(
    "flatten_array_slices",
    """
    SELECT doc_id,
           array_to_string(flatten([toks[1:3], toks[4:6]]), ' ') AS first_six
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
      FROM documents
    )
    WHERE len(toks) >= 6
    """,
    "Array slice + flatten + join: nested-array manipulation entirely "
    "JVM-side",
    reference="SURVEY.md §2.11 (flatten absent in reference; added)",
    tags=("explode", "arrays"),
)
def q_flatten_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    df = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 6)
    flat = F.flatten(F.array(F.slice("toks", 1, 3), F.slice("toks", 4, 3)))
    return df.select("doc_id", F.array_join(flat, " ").alias("first_six"))


@_register(
    "regex_extract_fields",
    r"""
    SELECT event_id,
           regexp_extract(event_type || '_' || CAST(event_id AS VARCHAR),
                          '([a-z]+)_([0-9]+)', 1) AS code,
           CAST(regexp_extract(event_type || '_' || CAST(event_id AS VARCHAR),
                               '([a-z]+)_([0-9]+)', 2) AS BIGINT) AS num
    FROM events
    """,
    "Regex group extraction (the reference only ever *replaces*)",
    reference="SURVEY.md §2.11 (regex extraction absent in reference; added)",
    tags=("regex",),
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = F.concat(F.col("event_type"), F.lit("_"), F.col("event_id").cast("string"))
    return ev.select(
        "event_id",
        F.regexp_extract(s, r"([a-z]+)_([0-9]+)", 1).alias("code"),
        F.regexp_extract(s, r"([a-z]+)_([0-9]+)", 2).cast("long").alias("num"),
    )


@_register(
    "json_generation_roundtrip",
    """
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type))::VARCHAR
             AS payload,
           CAST(json_extract_string(
             to_json(struct_pack(event_id := event_id, event_type := event_type)),
             '$.event_id') AS BIGINT) AS roundtrip_id
    FROM events
    """,
    "JSON *generation* (the reference only parses): to_json(struct) with a "
    "parse-back roundtrip; byte-identical compact formatting across engines",
    reference="SURVEY.md §2.11 (JSON generation absent in reference; added); "
    "run_producer.py:145 (producer-side serialize, re-homed in-engine)",
    tags=("json", "K1"),
)
def q_json_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    j = F.to_json(F.struct("event_id", "event_type"))
    return ev.select(
        "event_id",
        j.alias("payload"),
        F.get_json_object(j, "$.event_id").cast("long").alias("roundtrip_id"),
    )


@_register(
    "map_column_functions",
    """
    SELECT event_id,
           map_extract(MAP{'uid': user_id, 'eid': event_id}, 'uid')[1] AS uid_val,
           CAST(len(map_keys(MAP{'uid': user_id, 'eid': event_id})) AS INTEGER) AS n_keys
    FROM events
    """,
    "MapType columns: construction, key lookup, cardinality (engine-side "
    "map machinery; outputs plain columns for cross-engine comparison)",
    reference="SURVEY.md §1.3 (MapType for props columns, [NORTH-STAR])",
    tags=("map",),
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("uid"), F.col("user_id"), F.lit("eid"), F.col("event_id")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "uid").alias("uid_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@_register(
    "math_scalar_functions",
    """
    SELECT event_id,
           sqrt(value) AS sqrt_v,
           abs(value - 100) AS abs_dev,
           CAST(floor(value) AS BIGINT) AS floor_v,
           CAST(ceil(value) AS BIGINT) AS ceil_v,
           CAST(sign(value - 100) AS DOUBLE) AS sign_dev
    FROM events
    """,
    "Math scalar battery (IEEE-deterministic subset: sqrt/abs/floor/ceil/"
    "sign — transcendentals excluded from oracle comparison by design, "
    "libm last-ulp differences)",
    reference="SURVEY.md §2.11 (math functions absent in reference; added)",
    tags=("math",),
)
def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.sqrt(v).alias("sqrt_v"),
        F.abs(v - 100).alias("abs_dev"),
        F.floor(v).alias("floor_v"),
        F.ceil(v).alias("ceil_v"),
        F.signum(v - 100).cast("double").alias("sign_dev"),
    )
