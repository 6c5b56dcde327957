"""Relational operator coverage: joins, aggregations, windows, sorts,
set ops, grouping sets — the surface SURVEY.md §2.2 notes as absent
from the reference but expected of the engine (Spark gives it to us;
these queries pin the semantics against the DuckDB oracle and are the
bench workload).

Determinism rules for oracle hash-matching:
- monetary aggregates are computed in DECIMAL (exact, order-independent)
  and cast to DOUBLE only at the output boundary;
- every ORDER BY ... LIMIT has a unique total order (explicit tiebreak);
- raw double columns pass through untouched (bit-identical in parquet).

Where Spark SQL and DuckDB SQL agree we run the SAME string on both
engines; DataFrame-API formulations are used where they exercise our
operators (window, semi/anti join, pivot, as-of, range join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.rangejoin import range_join
from ..sources.tables import load_table, register_views


def _sql(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


DEC = "DECIMAL(18,2)"
REV = f"CAST(l_extendedprice AS {DEC}) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

# --- q1: pricing summary (scan + filter + groupBy agg) ------------------------
SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
  CAST(SUM({REV}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({REV} * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# --- q3: shipping priority (3-way join + agg + deterministic top-k) -----------
SQL_Q3 = f"""
SELECT l_orderkey,
  CAST(SUM({REV}) AS DOUBLE) AS revenue,
  o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

# --- q5: local supplier volume (6-way join) -----------------------------------
SQL_Q5 = f"""
SELECT n_name,
  CAST(SUM({REV}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""

# --- top-k: global sort+limit AND per-group rank, one entry ---------------------
# The global branch must stay a TakeOrderedAndProject (no full sort —
# pinned by tests/test_plans.py); the grouped branch is the windowed
# row_number top-n. `rn` is NULL on global rows (rank is undefined there
# without forcing a single-partition window).

SQL_TOPK_GLOBAL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_topk_global_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    glob = spark.sql(SQL_TOPK_GLOBAL).select(
        F.lit("global").alias("scope"),
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("int").alias("rn"),
    )
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    grouped = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.lit("per_customer").alias("scope"),
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            "rn",
        )
    )
    return glob.unionByName(grouped)


ORACLE_TOPK = """
SELECT 'global' AS scope, o_custkey, o_orderkey, o_totalprice,
       CAST(NULL AS INTEGER) AS rn
FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
UNION ALL
SELECT 'per_customer' AS scope, o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""

# --- multi-level grouping: ROLLUP + CUBE(+GROUPING markers) + GROUPING SETS ------
# One entry, three grouping strategies over the same aggregate, each kept
# in its native syntax (the optimizer expands all three to an Expand node;
# partial aggregation still applies). Shared syntax on both engines.
SQL_MULTILEVEL = f"""
SELECT 'rollup' AS mode, l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube' AS mode, l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'sets' AS mode, l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
"""

# --- distinct aggregation + exact statistical moments (one groupBy) -------------
# COUNT(DISTINCT) twice over + exact order-independent moments from
# DECIMAL sums (stddev/avg over raw doubles is FP-order-dependent across
# engines; only the final sqrt/divide happens in double). Median via
# linear interpolation (Spark percentile ≡ DuckDB quantile_cont).

_QD = "CAST(l_quantity AS DECIMAL(18,2))"

_STATS_DISTINCT_BODY = f"""
SELECT l_returnflag,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps,
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

SQL_STATS_DISTINCT_SPARK = _STATS_DISTINCT_BODY.format(
    median="percentile(l_quantity, 0.5)"
)
SQL_STATS_DISTINCT_DUCK = _STATS_DISTINCT_BODY.format(
    median="quantile_cont(l_quantity, 0.5)"
)

# --- set operations + semi/anti joins (one entry) --------------------------------
# INTERSECT/EXCEPT/UNION branches share schema with the semi/anti join
# branches (EXISTS / NOT EXISTS duals); the Spark side exercises the
# DataFrame left_semi/left_anti operators, the oracle spells both out.
SQL_SETOPS = """
SELECT 'union' AS src, k, CAST(NULL AS STRING) AS name FROM (
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
  UNION
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
)
UNION ALL
SELECT 'intersect' AS src, k, CAST(NULL AS STRING) AS name FROM (
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
  INTERSECT
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
)
UNION ALL
SELECT 'except' AS src, k, CAST(NULL AS STRING) AS name FROM (
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
  EXCEPT
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
)
"""


def q_setops_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    setops = spark.sql(SQL_SETOPS)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    semi = cust.join(orders, "c_custkey", "left_semi").select(
        F.lit("with_orders").alias("src"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
    )
    anti = cust.join(orders, "c_custkey", "left_anti").select(
        F.lit("no_orders").alias("src"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
    )
    return setops.unionByName(semi).unionByName(anti)


ORACLE_SETOPS_SEMI_ANTI = (
    SQL_SETOPS
    + """
UNION ALL
SELECT 'with_orders' AS src, c_custkey AS k, c_name AS name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'no_orders' AS src, c_custkey AS k, c_name AS name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""
)


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    # l_quantity completes the tiebreak: rows still tied after it have
    # equal quantities, so the running-sum multiset is deterministic.
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double").alias("running_qty"),
    )


ORACLE_WINDOW_RUNNING = f"""
SELECT l_suppkey, l_orderkey, l_linenumber,
  CAST(SUM(CAST(l_quantity AS {DEC})) OVER (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
FROM lineitem
"""


# --- hourly time-bucket aggregation, pivoted (one entry) --------------------------
# The long form (hour × event_type counts + DECIMAL-exact value sums) and
# the wide pivot are the same aggregate; pivoting to one row per hour
# keeps both features in a single pass — the Spark side exercises the
# pivot operator, the oracle is the conditional-aggregation expansion.
# Counts are filled to 0 (pivot leaves missing cells NULL; COUNT(CASE)
# yields 0); sums stay NULL on empty cells in both engines.

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .pivot("event_type", EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum"),
        )
    )
    return out.na.fill(0, [f"{t}_n" for t in EVENT_TYPES])


ORACLE_EVENTS_PIVOT = (
    # CAST: duckdb's date_trunc('hour') yields DATE-less TIMESTAMP fine but
    # keep the explicit cast for parity with Spark's TIMESTAMP output
    "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, "
    + ", ".join(
        f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}_n, "
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS {DEC}) END) AS DOUBLE) AS {t}_sum"
        for t in EVENT_TYPES
    )
    + " FROM events GROUP BY date_trunc('hour', ts)"
)


# --- sessionization (gaps and islands, 30-minute gap) ------------------------------

SPARK_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN unix_micros(ts) - LAG(unix_micros(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""

ORACLE_SESSIONIZE = SPARK_SESSIONIZE.replace("unix_micros(ts)", "epoch_us(ts)")


# --- as-of join: purchase attribution (custom operator) -----------------------------

def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="p_ts",
        value_cols=["p_event_id", "p_value"],
        tiebreak="p_event_id",
        how="inner",
    )
    return out.select(
        "event_id", "user_id", "asof_p_event_id", "asof_p_value"
    )


ORACLE_ASOF = """
SELECT event_id, user_id, asof_p_event_id, asof_p_value FROM (
  SELECT c.event_id, c.user_id,
         p.event_id AS asof_p_event_id, p.value AS asof_p_value,
         ROW_NUMBER() OVER (PARTITION BY c.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM events c
  JOIN events p ON p.user_id = c.user_id AND p.event_type = 'purchase'
                AND p.ts <= c.ts
  WHERE c.event_type = 'click'
) WHERE rn = 1
"""


# --- range join: events within 1 h after a purchase (custom operator) ----------------

def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    others = ev.select("event_id", "user_id", "ts", "value")
    pairs = range_join(
        others, purchases, left_time="ts", right_time="p_ts",
        duration_seconds=3600, key=None,
    ).filter(F.col("user_id") == F.col("p_user_id"))
    return pairs.groupBy("p_event_id").agg(
        F.count("*").alias("n_following"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )


ORACLE_RANGE = f"""
SELECT p.event_id AS p_event_id,
       COUNT(*) AS n_following,
       CAST(SUM(CAST(e.value AS {DEC})) AS DOUBLE) AS sum_value
FROM events p
JOIN events e ON e.user_id = p.user_id
             AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


# --- q4: order priority via EXISTS (semi-join through a subquery) --------------
SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""

# --- q6 + q19: selective-predicate global aggregates (one entry) -----------------
# q6 (tight single-table filter + global agg — the pushdown showcase,
# plan-pinned in tests/test_plans.py) and q19 (disjunction of conjunctive
# predicates across a join) share an output shape; the variant column
# keeps both plans visible to the oracle in one entry.
SQL_Q6 = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {DEC}) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

# --- q7: volume shipping between a nation pair (disjunctive join filter) --------
SQL_Q7 = f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year, {REV} AS vol
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

# --- q10: returned items, top 20 customers by lost revenue ----------------------
SQL_Q10 = f"""
SELECT c_custkey, c_name, CAST(SUM({REV}) AS DOUBLE) AS revenue, c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# --- q14: promo revenue share (conditional aggregation with FILTER) -------------
SQL_Q14 = f"""
SELECT
  CAST(SUM({REV}) FILTER (WHERE p_type = 'PROMO') AS DOUBLE) AS promo_revenue,
  CAST(SUM({REV}) AS DOUBLE) AS total_revenue,
  round(CAST(SUM({REV}) FILTER (WHERE p_type = 'PROMO') AS DOUBLE)
        / CAST(SUM({REV}) AS DOUBLE), 6) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""

# --- q18: large-volume orders (IN + GROUP BY HAVING subquery) -------------------
SQL_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS {DEC})) > CAST(250 AS {DEC}))
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
"""

def q_q18_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass q18: the SQL IN-subquery form aggregates lineitem
    TWICE (once for HAVING, once for the output sum). Aggregating once
    and joining the survivors halves the heavy scan+shuffle — at 100 TB
    lineitem is the table you never touch twice."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > F.lit(250).cast(DEC))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            F.col("l_orderkey").alias("o_orderkey"),
            "o_orderdate",
            F.col("qty").cast("double").alias("total_qty"),
        )
    )


# --- q19: disjunction of conjunctive predicates across a join -------------------
SQL_Q19 = f"""
SELECT CAST(SUM({REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size >= 1 AND p_size <= 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size >= 10 AND p_size <= 30
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size >= 20 AND p_size <= 50
       AND l_quantity >= 20 AND l_quantity <= 40)
"""

# --- selective-agg + optimizer-stressor union (q6 ∪ q19 ∪ q9 ∪ q21) -------------
# One catalog entry, four classic plans behind a `variant` discriminator
# (the 50-entry cap discipline; round 9 adds the two optimizer stressors
# the catalog lacked):
# - q6_forecast / q19_disjunctive: selective single-agg scans (as before).
# - q9_profit: the multi-join profit aggregation — lineitem joined to a
#   LIKE-filtered part side plus supplier/orders/nation, grouped by
#   (nation, order year). The testdata has no partsupp table, so supply
#   cost is proxied as 10% of p_retailprice per unit — same join graph
#   and agg shape as TPC-H q9, just a different constant on the part
#   side. Every dimension side must broadcast; the only shuffle is the
#   final group-by.
# - q21_wait: the correlated EXISTS / NOT EXISTS multi-(semi,anti)-join
#   — suppliers in one nation whose lineitem on a finalized order
#   shipped late (no l_receiptdate/l_commitdate in this testdata:
#   "late" = shipped >120 days after the order date) while being the
#   ONLY late supplier on a multi-supplier order. Exercises LeftSemi +
#   LeftAnti against the same fact table with mixed equality and
#   non-equality correlation.
_Q9_COST = ("CAST(p_retailprice AS DECIMAL(12,2)) * "
            "CAST(l_quantity AS DECIMAL(4,1)) * CAST(0.10 AS DECIMAL(3,2))")


def _q6_q19_stressors_sql(interval_120d: str) -> str:
    return f"""
SELECT 'q6_forecast' AS variant, CAST(NULL AS STRING) AS k1,
       CAST(NULL AS STRING) AS k2, revenue, n_items
FROM ({SQL_Q6.strip()})
UNION ALL
SELECT 'q19_disjunctive' AS variant, CAST(NULL AS STRING) AS k1,
       CAST(NULL AS STRING) AS k2, revenue, n_items
FROM ({SQL_Q19.strip()})
UNION ALL
SELECT 'q9_profit' AS variant, nation AS k1, CAST(o_year AS STRING) AS k2,
       CAST(SUM(amount) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM (
  SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
         {REV} - {_Q9_COST} AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
UNION ALL
SELECT 'q21_wait' AS variant, s_name AS k1, CAST(NULL AS STRING) AS k2,
       CAST(NULL AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_7'
  AND l1.l_shipdate > o_orderdate + {interval_120d}
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + {interval_120d})
GROUP BY s_name
"""


SQL_Q6_Q19_SPARK = _q6_q19_stressors_sql("INTERVAL '120' DAY")
SQL_Q6_Q19_DUCK = _q6_q19_stressors_sql("INTERVAL 120 DAY")

# --- q22: idle customers (NOT EXISTS anti-join + uncorrelated scalar subquery) --
# threshold = SUM/COUNT in DECIMAL then one double divide: DuckDB's
# AVG(DECIMAL) returns an order-dependent DOUBLE, so avg is spelled out.
SQL_Q22 = f"""
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) / COUNT(*)
      FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
) idle
GROUP BY cntrycode
"""

# --- advanced subqueries: correlated scalar ∪ recursive CTE ---------------------
# Two subquery forms the engine must support beyond plain joins, packed
# into one entry (variant, k, label, v):
# - corr_scalar: parts priced far above their brand average (correlated
#   scalar subquery → Catalyst rewrites to an aggregate + self-join).
# - recursive_years: WITH RECURSIVE (Spark 4 iterative execution; the
#   same text runs in DuckDB modulo INTERVAL/STRING spelling) generating
#   the full year series between the first and last order date and
#   LEFT-joining order counts — the gap-filling calendar pattern, with
#   empty years surfacing as 0 rather than silently missing. Yearly
#   steps on purpose: each recursion level is a separate Spark job, so
#   a monthly series (~80 levels ≈ 15 s) prices recursion out of the
#   gate while ~7 yearly levels cost ~2 s.


def _advanced_subquery_sql(spark: bool) -> str:
    interval = "INTERVAL '1' YEAR" if spark else "INTERVAL 1 YEAR"
    s = "STRING" if spark else "VARCHAR"
    return f"""
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('year', MIN(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('year', MAX(o_orderdate)) AS DATE) AS hi
  FROM orders
),
years(y) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT CAST(y + {interval} AS DATE) FROM years, bounds WHERE y < hi
),
ycnt AS (
  SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS y, COUNT(*) AS n
  FROM orders GROUP BY CAST(date_trunc('year', o_orderdate) AS DATE)
)
SELECT 'recursive_years' AS variant, CAST(NULL AS BIGINT) AS k,
       CAST(years.y AS {s}) AS label, CAST(COALESCE(ycnt.n, 0) AS DOUBLE) AS v
FROM years LEFT JOIN ycnt ON years.y = ycnt.y
UNION ALL
SELECT 'corr_scalar' AS variant, p_partkey AS k, p_brand AS label,
       p_retailprice AS v
FROM part p
WHERE p_retailprice > 1.04 * (
  SELECT CAST(SUM(CAST(p2.p_retailprice AS {DEC})) AS DOUBLE) / COUNT(*)
  FROM part p2 WHERE p2.p_brand = p.p_brand)
"""


# --- analytic window functions + RANGE frame (one entry) ------------------------
# lag/lead/first_value/ntile over a ROWS-ordered window, plus a RANGE
# frame bounded by VALUE distance (30 days in epoch seconds — the frame
# type used for time-decayed features; ROWS frames are covered by
# window_running_sum). RANGE needs a numeric order key, so the date
# becomes epoch seconds; parquet dates surface as TIMESTAMP_NTZ, which
# unix_seconds rejects — the session TZ is UTC so the cast is an
# identity relabel.


def _window_analytics_sql(epoch: str) -> str:
    return f"""
SELECT o_custkey, o_orderkey,
  lag(o_orderkey) OVER w AS prev_order,
  lead(o_orderkey) OVER w AS next_order,
  first_value(o_orderkey) OVER w AS first_order,
  nth_value(o_orderkey, 2) OVER w AS second_order,
  CAST(o_orderdate = first_value(o_orderdate) OVER w AS BOOLEAN) AS is_first_date,
  ntile(4) OVER w AS quartile,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY {epoch}
    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


SQL_WINDOW_ANALYTICS_SPARK = _window_analytics_sql(
    "unix_seconds(CAST(o_orderdate AS TIMESTAMP))"
)
SQL_WINDOW_ANALYTICS_DUCK = _window_analytics_sql("epoch(o_orderdate)")

# --- FULL OUTER join with coalesced keys (join-type closure) --------------------
SQL_OUTER_JOIN = """
SELECT coalesce(h.c_custkey, r.o_custkey) AS custkey,
       h.c_acctbal, r.n_recent,
       h.c_custkey IS NOT NULL AS has_high_balance,
       r.o_custkey IS NOT NULL AS has_recent_orders
FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) h
FULL JOIN (SELECT o_custkey, COUNT(*) AS n_recent FROM orders
           WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
           GROUP BY o_custkey) r
  ON h.c_custkey = r.o_custkey
"""

# --- lateral explode / unnest with ordinality ------------------------------------
SQL_EXPLODE_SPARK = """
SELECT doc_id, pos, tok
FROM (SELECT doc_id, filter(split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents)
LATERAL VIEW posexplode(toks) AS pos, tok
WHERE pos < 5
"""

SQL_EXPLODE_DUCK = """
SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, t.toks[u.i] AS tok
FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents) t,
     UNNEST(range(1, len(t.toks) + 1)) AS u(i)
WHERE u.i <= 5
"""


def register(queries: dict, oracles: dict) -> None:
    for name, sql in [
        ("q1_pricing_summary", SQL_Q1),
        ("q3_shipping_priority", SQL_Q3),
        ("q4_order_priority_exists", SQL_Q4),
        ("q5_local_supplier_volume", SQL_Q5),
        ("q7_volume_shipping", SQL_Q7),
        ("q10_returned_items", SQL_Q10),
        ("q14_promo_share", SQL_Q14),
        ("q22_idle_customers", SQL_Q22),
        ("agg_multilevel_grouping", SQL_MULTILEVEL),
        ("join_full_outer", SQL_OUTER_JOIN),
    ]:
        queries[name] = _sql(sql)
        oracles[name] = sql

    queries["q6_q19_selective_agg"] = _sql(SQL_Q6_Q19_SPARK)
    oracles["q6_q19_selective_agg"] = SQL_Q6_Q19_DUCK

    queries["corr_scalar_subquery"] = _sql(_advanced_subquery_sql(True))
    oracles["corr_scalar_subquery"] = _advanced_subquery_sql(False)

    queries["topk_global_grouped"] = q_topk_global_grouped
    oracles["topk_global_grouped"] = ORACLE_TOPK
    queries["agg_stats_distinct"] = _sql(SQL_STATS_DISTINCT_SPARK)
    oracles["agg_stats_distinct"] = SQL_STATS_DISTINCT_DUCK
    queries["setops_semi_anti"] = q_setops_semi_anti
    oracles["setops_semi_anti"] = ORACLE_SETOPS_SEMI_ANTI
    queries["events_hourly_pivot"] = q_events_hourly_pivot
    oracles["events_hourly_pivot"] = ORACLE_EVENTS_PIVOT
    queries["window_analytics_frames"] = _sql(SQL_WINDOW_ANALYTICS_SPARK)
    oracles["window_analytics_frames"] = SQL_WINDOW_ANALYTICS_DUCK
    queries["window_running_sum"] = q_window_running
    oracles["window_running_sum"] = ORACLE_WINDOW_RUNNING
    queries["sessionize"] = _sql(SPARK_SESSIONIZE)
    oracles["sessionize"] = ORACLE_SESSIONIZE
    queries["asof_join_attribution"] = q_asof_attribution
    oracles["asof_join_attribution"] = ORACLE_ASOF
    queries["range_join_purchase_window"] = q_range_join
    oracles["range_join_purchase_window"] = ORACLE_RANGE
    queries["fn_explode_lateral"] = _sql(SQL_EXPLODE_SPARK)
    oracles["fn_explode_lateral"] = SQL_EXPLODE_DUCK
    queries["q18_large_volume_in_having"] = q_q18_single_pass
    oracles["q18_large_volume_in_having"] = SQL_Q18
