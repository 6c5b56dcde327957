"""Scalar-function library coverage (SURVEY.md §2.2 notes the reference
has no scalar functions beyond JSON (de)serialization — an engine needs
them; these pin Spark's function surface against DuckDB).

Each query exercises a function family over the synthetic tables.
Where the two engines share syntax the SAME string runs on both;
otherwise the formulations are kept side-by-side so divergences are
explicit and reviewable (e.g. get_json_object vs json_extract_string,
unix_micros vs epoch_us).

All functions here are JVM built-ins — whole-stage-codegen'd, no
Python in any path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views


def _sql(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


# --- string functions (shared syntax) ------------------------------------------

SQL_STRING = """
SELECT c_custkey,
  upper(c_name) AS up,
  lower(c_mktsegment) AS lo,
  substring(c_name, 1, 8) AS sub,
  length(c_name) AS len,
  reverse(c_name) AS rev,
  replace(c_name, 'Customer', 'Cust') AS repl,
  lpad(CAST(c_custkey AS STRING), 10, '0') AS padded,
  trim('  ' || c_name || '  ') AS trimmed,
  concat(c_name, '/', c_mktsegment) AS joined,
  levenshtein(c_mktsegment, 'BUILDING') AS lev
FROM customer
"""

# --- datetime functions (per-engine epoch/interval spellings) -------------------

_DT_BODY = """
SELECT event_id,
  CAST(year(ts) AS INTEGER) AS y,
  CAST(month(ts) AS INTEGER) AS m,
  CAST(day(ts) AS INTEGER) AS d,
  CAST(hour(ts) AS INTEGER) AS h,
  date_trunc('week', ts) AS week_start,
  ts + INTERVAL 90 MINUTE AS plus90m,
  {epoch_us}(ts) AS us
FROM events
"""

SQL_DT_SPARK = _DT_BODY.format(epoch_us="unix_micros")
# DuckDB: date_trunc('week') yields DATE (Spark: TIMESTAMP); align types.
SQL_DT_DUCK = (
    _DT_BODY.replace("INTERVAL 90 MINUTE", "INTERVAL 90 MINUTES")
    .replace("date_trunc('week', ts)", "CAST(date_trunc('week', ts) AS TIMESTAMP)")
    .format(epoch_us="epoch_us")
)

# --- JSON functions -------------------------------------------------------------

SQL_JSON_SPARK = """
SELECT event_id,
  get_json_object(props, '$.k') AS k_str,
  CAST(get_json_object(props, '$.k') AS INTEGER) AS k_int,
  get_json_object(props, '$.source') AS source,
  get_json_object(props, '$.missing') AS missing,
  to_json(named_struct('id', event_id, 'type', event_type)) AS rendered
FROM events
"""

SQL_JSON_DUCK = """
SELECT event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
  json_extract_string(props, '$.source') AS source,
  json_extract_string(props, '$.missing') AS missing,
  '{"id":' || CAST(event_id AS VARCHAR) || ',"type":"' || event_type || '"}' AS rendered
FROM events
"""

# --- array higher-order functions ----------------------------------------------

SQL_ARRAY_SPARK = """
WITH t AS (SELECT doc_id,
  filter(split(lower(text), ' '), x -> x <> '') AS tok FROM documents)
SELECT doc_id,
  size(tok) AS n,
  slice(tok, 1, 3) AS first3,
  array_contains(tok, 'the') AS has_the,
  size(array_distinct(tok)) AS n_distinct,
  aggregate(tok, 0, (acc, x) -> acc + length(x)) AS total_chars,
  array_max(transform(tok, x -> length(x))) AS max_len,
  array_join(slice(sort_array(array_distinct(tok)), 1, 5), ',') AS first5_sorted
FROM t
"""

SQL_ARRAY_DUCK = """
WITH t AS (SELECT doc_id,
  list_filter(string_split(lower(text), ' '), x -> x <> '') AS tok FROM documents)
SELECT doc_id,
  len(tok) AS n,
  tok[1:3] AS first3,
  list_contains(tok, 'the') AS has_the,
  len(list_distinct(tok)) AS n_distinct,
  CAST(COALESCE(list_sum(list_transform(tok, x -> length(x))), 0) AS INTEGER) AS total_chars,
  CAST(list_max(list_transform(tok, x -> length(x))) AS INTEGER) AS max_len,
  array_to_string(list_sort(list_distinct(tok))[1:5], ',') AS first5_sorted
FROM t
"""

# --- conditional / null-handling (shared syntax) --------------------------------

SQL_COND = """
SELECT o_orderkey,
  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_mapped,
  greatest(o_totalprice, 100000.0) AS floor_price,
  least(o_totalprice, 400000.0) AS capped_price,
  CASE WHEN o_totalprice > 300000 THEN 'large'
       WHEN o_totalprice > 100000 THEN 'medium'
       ELSE 'small' END AS bucket,
  (o_custkey % 2 = 0) AND (o_totalprice > 200000) AS flag
FROM orders
"""

# --- hashing / encoding (shared: md5, sha2-free to stay common) -----------------

SQL_HASH_SPARK = """
SELECT doc_id, md5(text) AS h_md5,
  sha2(text, 256) AS h_sha256,
  base64(encode(substring(text, 1, 12), 'UTF-8')) AS b64,
  CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) AS hash_prefix_int
FROM documents
"""

SQL_HASH_DUCK = """
SELECT doc_id, md5(text) AS h_md5,
  sha256(text) AS h_sha256,
  to_base64(encode(substring(text, 1, 12))) AS b64,
  CAST(('0x' || substring(md5(text), 1, 8))::UBIGINT AS BIGINT) AS hash_prefix_int
FROM documents
"""


# --- statistics: exact order-independent formulations ---------------------------
# stddev/avg over raw doubles is FP-order-dependent across engines; the
# moments are computed from exact DECIMAL sums, and only the final
# sqrt/divide happens in double (deterministic both sides). Median via
# linear interpolation (Spark percentile ≡ DuckDB quantile_cont on the
# same multiset).

_QD = "CAST(l_quantity AS DECIMAL(18,2))"

_STATS_BODY = f"""
SELECT l_returnflag,
  COUNT(*) AS n,
  CAST(SUM({_QD}) AS DOUBLE) AS sum_qty,
  round(CAST(SUM({_QD}) AS DOUBLE) / COUNT(*), 6) AS mean_qty,
  round(sqrt((CAST(SUM({_QD} * {_QD}) AS DOUBLE)
              - CAST(SUM({_QD}) AS DOUBLE) * CAST(SUM({_QD}) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1)), 6) AS sd_qty,
  round({{median}}, 6) AS median_qty,
  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""

SQL_STATS_SPARK = _STATS_BODY.format(median="percentile(l_quantity, 0.5)")
SQL_STATS_DUCK = _STATS_BODY.format(median="quantile_cont(l_quantity, 0.5)")


# --- approximate sketches (rows-only: estimates are engine-specific) ------------
# At 100 TB exact COUNT(DISTINCT) shuffles every key; sketches keep the
# shuffle at sketch-size per group. DuckDB's approx algorithms differ by
# design, so these register WITHOUT an oracle (the driver still pins row
# count + schema) — the exact counterparts are oracle-checked in
# agg_distinct / fn_stats_moments.

def q_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT event_type,
          approx_count_distinct(user_id) AS approx_users,
          approx_percentile(value, array(0.5, 0.95, 0.99)) AS value_quantiles,
          hll_sketch_estimate(hll_sketch_agg(user_id)) AS hll_users
        FROM events GROUP BY event_type
    """)


def register(queries: dict, oracles: dict) -> None:
    queries["agg_approx_sketch"] = q_approx_sketch
    entries = [
        ("fn_string", SQL_STRING, SQL_STRING),
        ("fn_datetime", SQL_DT_SPARK, SQL_DT_DUCK),
        ("fn_json", SQL_JSON_SPARK, SQL_JSON_DUCK),
        ("fn_array_hof", SQL_ARRAY_SPARK, SQL_ARRAY_DUCK),
        ("fn_conditional", SQL_COND, SQL_COND),
        ("fn_hash_encode", SQL_HASH_SPARK, SQL_HASH_DUCK),
        ("fn_stats_moments", SQL_STATS_SPARK, SQL_STATS_DUCK),
    ]
    for name, spark_sql, duck_sql in entries:
        queries[name] = _sql(spark_sql)
        oracles[name] = duck_sql
