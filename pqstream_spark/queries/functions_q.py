"""Scalar-function library coverage (SURVEY.md §2.2 notes the reference
has no scalar functions beyond JSON (de)serialization — an engine needs
them; these pin Spark's function surface against DuckDB).

Each entry exercises the function families sharing a source table in a
single projection (the driver checks at most a fixed number of catalog
entries, so families are packed per-table without losing any function):
- fn_scalar_suite:  string + conditional/null-handling   (customer)
- fn_datetime_json: datetime/epoch/interval + JSON       (events)
- fn_array_hash:    array higher-order fns + hash/encode (documents)
Exact moments / COUNT(DISTINCT) live in agg_stats_distinct
(relational.py) over lineitem.

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


# --- string + conditional / null-handling (shared syntax, one scan) -------------

SQL_SCALAR_SUITE = """
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
  levenshtein(c_mktsegment, 'BUILDING') AS lev,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS segment_mapped,
  greatest(c_acctbal, 1000.0) AS floor_bal,
  least(c_acctbal, 5000.0) AS capped_bal,
  CASE WHEN c_acctbal > 7500 THEN 'large'
       WHEN c_acctbal > 2500 THEN 'medium'
       ELSE 'small' END AS bucket,
  (c_custkey % 2 = 0) AND (c_acctbal > 0) AS flag,
  split_part(c_name, '#', 2) AS name_num,
  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
  repeat('*', CAST(c_custkey % 4 AS INTEGER)) AS stars,
  contains(c_name, '00') AS has_00,
  abs(c_acctbal) AS abs_bal,
  round(c_acctbal, 1) AS bal_1dp,
  CAST(floor(c_acctbal) AS DOUBLE) AS bal_floor,
  CAST(ceil(c_acctbal) AS DOUBLE) AS bal_ceil,
  CAST(sign(c_acctbal) AS DOUBLE) AS bal_sign,
  round(sqrt(abs(c_acctbal)), 6) AS bal_sqrt,
  round(ln(abs(c_acctbal) + 1.0), 6) AS bal_ln,
  round(log10(abs(c_acctbal) + 1.0), 6) AS bal_log10,
  round(power(c_acctbal / 1000.0, 2), 6) AS bal_pow2,
  CAST(c_custkey % 7 AS BIGINT) AS mod7
FROM customer
"""

# --- datetime + JSON functions (per-engine spellings, one scan of events) --------

_DT_JSON_BODY = """
SELECT event_id,
  CAST(year(ts) AS INTEGER) AS y,
  CAST(month(ts) AS INTEGER) AS m,
  CAST(day(ts) AS INTEGER) AS d,
  CAST(hour(ts) AS INTEGER) AS h,
  date_trunc('week', ts) AS week_start,
  CAST(quarter(ts) AS INTEGER) AS q,
  {last_day} AS month_end,
  CAST({isodow} AS INTEGER) AS iso_dow,
  CAST({day_diff} AS INTEGER) AS days_since_2024,
  ts + INTERVAL 90 MINUTE AS plus90m,
  {epoch_us}(ts) AS us,
  {json_k} AS k_str,
  CAST({json_k} AS INTEGER) AS k_int,
  {json_source} AS source,
  {json_missing} AS missing,
  {rendered} AS rendered
FROM events
"""

SQL_DT_JSON_SPARK = _DT_JSON_BODY.format(
    epoch_us="unix_micros",
    last_day="last_day(CAST(ts AS DATE))",
    isodow="weekday(ts) + 1",
    day_diff="datediff(CAST(ts AS DATE), DATE '2024-01-01')",
    json_k="get_json_object(props, '$.k')",
    json_source="get_json_object(props, '$.source')",
    json_missing="get_json_object(props, '$.missing')",
    rendered="to_json(named_struct('id', event_id, 'type', event_type))",
)
# DuckDB: date_trunc('week') yields DATE (Spark: TIMESTAMP); align types.
SQL_DT_JSON_DUCK = (
    _DT_JSON_BODY.replace("INTERVAL 90 MINUTE", "INTERVAL 90 MINUTES")
    .replace("date_trunc('week', ts)", "CAST(date_trunc('week', ts) AS TIMESTAMP)")
    .format(
        epoch_us="epoch_us",
        last_day="last_day(CAST(ts AS DATE))",
        isodow="isodow(ts)",
        day_diff="date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))",
        json_k="json_extract_string(props, '$.k')",
        json_source="json_extract_string(props, '$.source')",
        json_missing="json_extract_string(props, '$.missing')",
        rendered="'{\"id\":' || CAST(event_id AS VARCHAR) || ',\"type\":\"' || event_type || '\"}'",
    )
)

# --- array higher-order functions + hashing/encoding (one scan of documents) -----

SQL_ARRAY_HASH_SPARK = """
WITH t AS (SELECT doc_id, text,
  filter(split(lower(text), ' '), x -> x <> '') AS tok FROM documents)
SELECT doc_id,
  size(tok) AS n,
  array_join(slice(tok, 1, 3), ',') AS first3,
  array_contains(tok, 'the') AS has_the,
  size(array_distinct(tok)) AS n_distinct,
  aggregate(tok, 0, (acc, x) -> acc + length(x)) AS total_chars,
  array_max(transform(tok, x -> length(x))) AS max_len,
  array_join(slice(sort_array(array_distinct(tok)), 1, 5), ',') AS first5_sorted,
  md5(text) AS h_md5,
  sha2(text, 256) AS h_sha256,
  base64(encode(substring(text, 1, 12), 'UTF-8')) AS b64,
  CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) AS hash_prefix_int
FROM t
"""

SQL_ARRAY_HASH_DUCK = """
WITH t AS (SELECT doc_id, text,
  list_filter(string_split(lower(text), ' '), x -> x <> '') AS tok FROM documents)
SELECT doc_id,
  len(tok) AS n,
  array_to_string(tok[1:3], ',') AS first3,
  list_contains(tok, 'the') AS has_the,
  len(list_distinct(tok)) AS n_distinct,
  CAST(COALESCE(list_sum(list_transform(tok, x -> length(x))), 0) AS INTEGER) AS total_chars,
  CAST(list_max(list_transform(tok, x -> length(x))) AS INTEGER) AS max_len,
  array_to_string(list_sort(list_distinct(tok))[1:5], ',') AS first5_sorted,
  md5(text) AS h_md5,
  sha256(text) AS h_sha256,
  to_base64(encode(substring(text, 1, 12))) AS b64,
  CAST(('0x' || substring(md5(text), 1, 8))::UBIGINT AS BIGINT) AS hash_prefix_int
FROM t
"""


# --- approximate sketches, tolerance-certified against exact --------------------
# At 100 TB exact COUNT(DISTINCT) shuffles every key; sketches keep the
# shuffle at sketch-size per group. Raw estimates are engine-specific
# (Spark HLL++/KLL vs DuckDB's algorithms), so the raw values can never
# hash-match an oracle. Instead the entry emits the EXACT statistics
# (hash-comparable: both engines compute count distinct / interpolated
# percentiles identically, rounded to 6 dp) plus one boolean per sketch
# asserting |estimate − exact| is within tolerance (5% relative for the
# HLL cardinalities — default-precision HLL std error is ~2.3% — and 5%
# + 1e-6 absolute for the percentile sketches). The exact percentiles
# use DISCRETE semantics (percentile_disc / quantile_disc): the
# approx_percentile sketch returns an actual element of the group, so
# certifying it against an interpolated quantile adds the inter-element
# gap to the error budget — at small group sizes the tail gap alone can
# exceed any reasonable tolerance (observed at sf0.001's ~200-row
# groups). Against the discrete quantile the sketch is EXACT whenever
# the group fits its accuracy budget, and within rank-error bounds
# beyond it. The DuckDB oracle
# produces the same exact columns and literal TRUEs, so the driver's
# hash check now CERTIFIES sketch accuracy: an out-of-tolerance
# estimator flips a boolean and fails the gate.
#
# Tolerance vs sketch precision: approx_count_distinct is called with
# rsd=0.01 so the 5% tolerance is a ~5 sigma bound — at the DEFAULT
# rsd=0.05 the tolerance equals one standard deviation and the boolean
# flips on ordinary estimator luck (observed at sf0.1). The HLL-sketch
# column keeps its default precision (lgConfigK=12, ~2.3% rsd ≈ 2
# sigma); datasketches HLL is materially more accurate than its rsd
# suggests at these cardinalities.

# One grouped aggregate computes exact AND approx side by side — no
# self-join on the group key (an inner join would silently drop a NULL
# event_type group the oracle's plain GROUP BY keeps).
SQL_APPROX_SKETCH_SPARK = """
WITH g AS (
  SELECT event_type,
    count(DISTINCT user_id) AS exact_users,
    round(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), 6) AS q50_exact,
    round(percentile_disc(0.95) WITHIN GROUP (ORDER BY value), 6) AS q95_exact,
    round(percentile_disc(0.99) WITHIN GROUP (ORDER BY value), 6) AS q99_exact,
    approx_count_distinct(user_id, 0.01) AS a_users,
    hll_sketch_estimate(hll_sketch_agg(user_id)) AS a_hll,
    approx_percentile(value, 0.5D) AS a_q50,
    approx_percentile(value, 0.95D) AS a_q95,
    approx_percentile(value, 0.99D) AS a_q99
  FROM events GROUP BY event_type
)
SELECT event_type, exact_users, q50_exact, q95_exact, q99_exact,
  abs(a_users - exact_users) <= 0.05 * exact_users AS approx_users_ok,
  abs(a_hll - exact_users) <= 0.05 * exact_users AS hll_users_ok,
  -- coalesce: an all-NULL value column makes both the exact quantile and
  -- the sketch NULL, which would surface as a NULL boolean and a
  -- confusing certification-flip hash mismatch vs the oracle's literal
  -- TRUE. A degenerate group certifies vacuously (exact IS NULL → TRUE);
  -- a NULL sketch against a non-NULL exact still fails loudly (→ FALSE).
  coalesce(abs(a_q50 - q50_exact) <= 0.05 * abs(q50_exact) + 1e-6,
           q50_exact IS NULL) AS q50_ok,
  coalesce(abs(a_q95 - q95_exact) <= 0.05 * abs(q95_exact) + 1e-6,
           q95_exact IS NULL) AS q95_ok,
  coalesce(abs(a_q99 - q99_exact) <= 0.05 * abs(q99_exact) + 1e-6,
           q99_exact IS NULL) AS q99_ok
FROM g
"""

SQL_APPROX_SKETCH_DUCK = """
SELECT event_type,
  count(DISTINCT user_id) AS exact_users,
  round(quantile_disc(value, 0.5), 6) AS q50_exact,
  round(quantile_disc(value, 0.95), 6) AS q95_exact,
  round(quantile_disc(value, 0.99), 6) AS q99_exact,
  TRUE AS approx_users_ok,
  TRUE AS hll_users_ok,
  TRUE AS q50_ok,
  TRUE AS q95_ok,
  TRUE AS q99_ok
FROM events GROUP BY event_type
"""


def q_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_APPROX_SKETCH_SPARK)


def register(queries: dict, oracles: dict) -> None:
    entries = [
        ("fn_scalar_suite", SQL_SCALAR_SUITE, SQL_SCALAR_SUITE),
        ("fn_datetime_json", SQL_DT_JSON_SPARK, SQL_DT_JSON_DUCK),
        ("fn_array_hash", SQL_ARRAY_HASH_SPARK, SQL_ARRAY_HASH_DUCK),
    ]
    for name, spark_sql, duck_sql in entries:
        queries[name] = _sql(spark_sql)
        oracles[name] = duck_sql
    queries["agg_approx_sketch"] = q_approx_sketch
    oracles["agg_approx_sketch"] = SQL_APPROX_SKETCH_DUCK
