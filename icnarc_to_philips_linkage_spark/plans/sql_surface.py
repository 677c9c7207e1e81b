"""Spark SQL surface (SURVEY.md §3 'entry point 2', §2.2 F6-F8) plus
advanced analytics beyond the reference (rollup/cube/grouping sets,
ranking windows, batch sessionization, pivot/unpivot).

Most queries here are SHARED-TEXT: one ANSI SQL string executed verbatim
by both the engine (``spark.sql`` over registered temp views) and the
DuckDB oracle — demonstrating that the engine's SQL surface is standard.
Only pivot/unpivot use DataFrame-API operators (their SQL syntax is
dialect-specific) with an equivalent conditional-aggregation oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.plans.tables import load, register_views


def _sql(text: str):
    def run(spark: SparkSession, sf: str) -> DataFrame:
        register_views(spark, sf)
        return spark.sql(text)

    return run


# F6+A13+O2: the reference's dimension-discovery query shape
# (variable_location_in_ICCA.sql:28,49-57 — LIKE scan, grouped MIN +
# COUNT(DISTINCT), TOP-k with deterministic tie-break)
SQL_DIM_SEARCH = """
SELECT p_brand, MIN(p_name) AS first_name, COUNT(DISTINCT p_type) AS n_types
FROM part
WHERE p_type LIKE '%STAND%'
GROUP BY p_brand
ORDER BY n_types DESC, p_brand
LIMIT 10
"""

# F7+F8: IN-subquery fact filtering with conjunctive predicates
# (variable_location_in_ICCA.sql:84,97)
SQL_IN_SUBQUERY = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part
                    WHERE p_size < 15 AND p_type LIKE '%MED%')
GROUP BY l_returnflag
"""

# correlated EXISTS (subquery family completeness)
SQL_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""

# beyond-reference: hierarchical aggregates
SQL_ROLLUP = """
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""

SQL_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""

SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

# ranking window family; unique ORDER BY makes every rank deterministic
SQL_WINDOW_RANK = """
SELECT * FROM (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         RANK() OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey) AS rnk,
         DENSE_RANK() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS drnk,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal DESC, c_custkey) AS quartile,
         ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey), 6)
             AS pct_rank
  FROM customer) t
WHERE rnk <= 5
"""

# batch sessionization: lag → new-session flag → running-sum session id →
# per-session aggregate (the batch twin of streaming/chartevents.sessionize)
SQL_SESSIONIZE = """
WITH seq AS (
  SELECT user_id, event_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
flags AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM seq),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
  FROM flags)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_id
"""

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def s2_pivot_wide(spark: SparkSession, sf: str) -> DataFrame:
    """S2 family: long→wide pivot (the CMP wide-table construction
    pattern) via the DataFrame pivot operator with explicit pivot values
    (no extra distinct-scan pass; required for a deterministic schema on
    a 100 TB input)."""
    e = load(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
        )
        .withColumnsRenamed({t: f"{t}_value" for t in EVENT_TYPES})
    )


S2_PIVOT_SQL = "SELECT user_id,\n" + ",\n".join(
    f"  CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS {t}_value"
    for t in EVENT_TYPES
) + "\nFROM events GROUP BY user_id"


def u2_unpivot_melt(spark: SparkSession, sf: str) -> DataFrame:
    """Wide→long unpivot (melt) — the inverse of S2, needed whenever a
    wide CMP-style table feeds an EAV consumer."""
    l = load(spark, sf, "lineitem")
    return l.melt(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


U2_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS metric_value
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
"""


# correlated SCALAR subquery (Catalyst rewrites to an aggregate + join);
# the inner AVG goes through decimal so partial-agg order can't move it
SQL_SCALAR_SUBQUERY = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (SELECT AVG(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
"""

# NOT EXISTS anti form (the SQL spelling of the J4 anti join):
# customers who never placed a top-decile order
SQL_NOT_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 450000)
"""

# chained CTEs feeding a join + re-aggregation
SQL_CTE_CHAIN = """
WITH big AS (
  SELECT o_custkey, COUNT(*) AS n
  FROM orders WHERE o_totalprice > 100000 GROUP BY o_custkey
),
seg AS (SELECT c_custkey, c_mktsegment FROM customer)
SELECT s.c_mktsegment,
       COUNT(*) AS n_big_buyers,
       SUM(b.n) AS n_big_orders
FROM big b JOIN seg s ON s.c_custkey = b.o_custkey
GROUP BY s.c_mktsegment
"""


# recursive CTE (Spark >= 4.0 WITH RECURSIVE): custkey hop-chains from
# ten roots, stepping +13 up to depth 8 — each recursion step is one
# join against customer, the iterative-fixpoint surface DuckDB shares
# verbatim. Depth is explicitly bounded so the iteration count (and the
# plan) is scale-factor-independent.
SQL_RECURSIVE = """
WITH RECURSIVE chain AS (
  SELECT c_custkey AS root, c_custkey AS cur, 0 AS depth
  FROM customer WHERE c_custkey <= 10
  UNION ALL
  SELECT ch.root, c.c_custkey, ch.depth + 1
  FROM chain ch JOIN customer c ON c.c_custkey = ch.cur + 13
  WHERE ch.depth + 1 < 8
)
SELECT root, COUNT(*) AS n_nodes, MAX(depth) AS max_depth
FROM chain GROUP BY root
"""


# LATERAL correlated subquery: per-nation top-2 customers by balance —
# the dependent-join surface (each outer row drives an ordered+limited
# inner query). DuckDB runs the identical text.
SQL_LATERAL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
"""


# Spark SQL PIVOT clause (round 6): the relational pivot on the SQL
# surface itself, not just the DataFrame API (s2_pivot_wide). The IN
# list is explicit — Spark's and DuckDB's dynamic-pivot forms both
# require knowing the columns at plan time anyway for a stable schema —
# and the oracle is the engine-neutral conditional aggregation.
SQL_PIVOT_CLAUSE = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
)
PIVOT (
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
  FOR o_orderstatus IN ('O' AS open_total, 'F' AS filled_total,
                        'P' AS pending_total)
)
"""

SQL_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS open_total,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS filled_total,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS pending_total
FROM orders GROUP BY o_orderpriority
"""


# Aggregate FILTER clause (round 6) — shared text: the ANSI way to
# compute conditional aggregates without CASE pyramids; Spark plans it
# as the same conditional-count aggregate the quality gates use.
SQL_FILTER_CLAUSE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled
FROM orders
GROUP BY o_orderpriority
"""

# GROUP BY ALL / ORDER BY ALL (round 6) — shared text: group on every
# non-aggregate select item. Spark 4 and DuckDB agree on the semantics.
SQL_GROUP_BY_ALL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ALL
ORDER BY ALL
"""

# NATURAL JOIN (round 6) — shared text; aliased subqueries give the
# single common column the join binds on.
SQL_NATURAL_JOIN = """
SELECT n_name, COUNT(*) AS n_customers
FROM (SELECT c_nationkey AS nationkey, c_custkey FROM customer)
NATURAL JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation)
GROUP BY n_name
"""

# Spark 4 VARIANT ingestion of the events JSON props column. The
# oracle uses DuckDB's JSON path functions — semantically the same
# extraction, dialect-specific text (like pivot).
SQL_VARIANT_JSON = """
SELECT pmod(variant_get(parse_json(props), '$.k', 'int'), 10) AS k_mod,
       COUNT(*) AS n,
       SUM(variant_get(parse_json(props), '$.k', 'bigint')) AS sum_k
FROM events
WHERE props IS NOT NULL
GROUP BY pmod(variant_get(parse_json(props), '$.k', 'int'), 10)
"""

SQL_VARIANT_JSON_ORACLE = """
SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
       COUNT(*) AS n,
       SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k
FROM events
WHERE props IS NOT NULL
GROUP BY 1
"""


# SQL UNPIVOT clause (round 6): the melt on the SQL surface itself —
# u2_unpivot_melt covers the DataFrame API. DuckDB's UNPIVOT differs
# syntactically, so the oracle is the engine-neutral UNION ALL melt.
SQL_UNPIVOT_CLAUSE = """
SELECT o_orderpriority, metric, val FROM (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price
  FROM orders GROUP BY o_orderpriority
) UNPIVOT (val FOR metric IN (n_orders, total_price))
"""

SQL_UNPIVOT_ORACLE = """
WITH agg AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS val FROM agg
UNION ALL
SELECT o_orderpriority, 'total_price', total_price FROM agg
"""

# VALUES inline table joined against real data — shared text: the
# literal-dimension decode/config pattern without a physical dim table.
SQL_VALUES_INLINE = """
SELECT r.r_name, t.tier, COUNT(*) AS n_nations
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN (VALUES ('EUROPE', 'core'), ('ASIA', 'growth'), ('AMERICA', 'core'))
     AS t(rname, tier)
  ON r.r_name = t.rname
GROUP BY r.r_name, t.tier
"""


QUERIES: dict[str, tuple] = {
    "sql_lateral_topk": (_sql(SQL_LATERAL), SQL_LATERAL),
    "sql_recursive_cte": (_sql(SQL_RECURSIVE), SQL_RECURSIVE),
    "sql_dim_search": (_sql(SQL_DIM_SEARCH), SQL_DIM_SEARCH),
    "sql_scalar_subquery": (_sql(SQL_SCALAR_SUBQUERY), SQL_SCALAR_SUBQUERY),
    "sql_not_exists": (_sql(SQL_NOT_EXISTS), SQL_NOT_EXISTS),
    "sql_cte_chain": (_sql(SQL_CTE_CHAIN), SQL_CTE_CHAIN),
    "sql_in_subquery": (_sql(SQL_IN_SUBQUERY), SQL_IN_SUBQUERY),
    "sql_exists_correlated": (_sql(SQL_EXISTS), SQL_EXISTS),
    "sql_rollup": (_sql(SQL_ROLLUP), SQL_ROLLUP),
    "sql_cube": (_sql(SQL_CUBE), SQL_CUBE),
    "sql_grouping_sets": (_sql(SQL_GROUPING_SETS), SQL_GROUPING_SETS),
    "sql_window_rank": (_sql(SQL_WINDOW_RANK), SQL_WINDOW_RANK),
    "sql_sessionize": (_sql(SQL_SESSIONIZE), SQL_SESSIONIZE),
    "sql_pivot_clause": (_sql(SQL_PIVOT_CLAUSE), SQL_PIVOT_ORACLE),
    "sql_filter_clause": (_sql(SQL_FILTER_CLAUSE), SQL_FILTER_CLAUSE),
    "sql_group_by_all": (_sql(SQL_GROUP_BY_ALL), SQL_GROUP_BY_ALL),
    "sql_natural_join": (_sql(SQL_NATURAL_JOIN), SQL_NATURAL_JOIN),
    "sql_variant_json": (_sql(SQL_VARIANT_JSON), SQL_VARIANT_JSON_ORACLE),
    "sql_unpivot_clause": (_sql(SQL_UNPIVOT_CLAUSE), SQL_UNPIVOT_ORACLE),
    "sql_values_inline": (_sql(SQL_VALUES_INLINE), SQL_VALUES_INLINE),
    "s2_pivot_wide": (s2_pivot_wide, S2_PIVOT_SQL),
    "u2_unpivot_melt": (u2_unpivot_melt, U2_UNPIVOT_SQL),
}

# Every _sql() query registers the FIXED-NAME temp views (tables.py
# register_views) and materializes lazily afterwards — two of these
# in flight for different sf dirs clobber each other's views. The
# pivot/unpivot DataFrame queries also call register_views-free load()
# only, but s2/u2 share QUERIES for simplicity of the exclusion set.
EXCLUSIVE: frozenset[str] = frozenset(QUERIES)
