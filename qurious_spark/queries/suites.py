"""Composite expression suites: several SURVEY §2.3/§2.4 rows per query.

The driver hash-checks a bounded window of the registry, so single-purpose
queries (one per expression form) crowd each other out. Each suite below
packs a family of expression rows into ONE deterministic, oracle-checked
query — the same consolidation the reference's slt files use (e.g.
qurious/tests/sql/basic_test.slt mixes casts, EXTRACT and timestamps in one
file). The single-purpose variants stay registered for local runs.

Conventions follow the registry header: integer SUMs cast to BIGINT on both
sides, double aggregates ROUNDed, every column aliased identically.
"""

from __future__ import annotations

from qurious_spark.queries import sql_query

# BETWEEN (sql.rs:1042-1059), IN / NOT IN value lists incl. NULL Kleene
# semantics (sql.rs:1060-1099), LIKE / NOT LIKE / ILIKE (like.rs:27-42),
# IS [NOT] NULL (is_null.rs) — one scan of part, one output row.
sql_query(
    "predicate_suite",
    """
    SELECT
      CAST(SUM(CASE WHEN p_retailprice BETWEEN 1200 AND 1500 THEN 1 ELSE 0 END) AS BIGINT) AS n_between,
      CAST(SUM(CASE WHEN p_size IN (5, 10, 15) THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
      CAST(SUM(CASE WHEN p_size NOT IN (200, NULLIF(0, 0)) THEN 1 ELSE 0 END) AS BIGINT) AS n_not_in_null,
      CAST(SUM(CASE WHEN p_name LIKE '%ous%' THEN 1 ELSE 0 END) AS BIGINT) AS n_like,
      CAST(SUM(CASE WHEN p_type NOT LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT) AS n_not_like,
      CAST(SUM(CASE WHEN p_type ILIKE '%brass%' THEN 1 ELSE 0 END) AS BIGINT) AS n_ilike,
      CAST(SUM(CASE WHEN NULLIF(p_size, 1) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(SUM(CASE WHEN NULLIF(p_size, 1) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null
    FROM part
    """,
)

# Cast incl. ``::`` suffix + DATE typed string (cast.rs, sql.rs:1005-1012),
# searched + simple CASE (case.rs:14-48, simple→searched rewrite
# sql.rs:1100-1136), INTERVAL arithmetic (sql.rs:1146-1229), EXTRACT (the
# reference's one builtin, extract.rs:19-81), select-list alias referenced
# in GROUP BY (alias map sql.rs:296-312).
sql_query(
    "scalar_suite",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           count(*) AS n_orders,
           MIN(CAST(o_orderdate + INTERVAL '7' DAY AS DATE)) AS first_due,
           MAX(o_orderkey::BIGINT) AS max_key,
           CAST(SUM(CASE o_orderstatus WHEN 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
    FROM orders
    WHERE o_orderdate >= DATE '1993-01-01'
    GROUP BY yr
    """,
    duck_sql="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           count(*) AS n_orders,
           MIN(CAST(o_orderdate + INTERVAL 7 DAY AS DATE)) AS first_due,
           MAX(o_orderkey::BIGINT) AS max_key,
           CAST(SUM(CASE o_orderstatus WHEN 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
    FROM orders
    WHERE o_orderdate >= DATE '1993-01-01'
    GROUP BY yr
    """,
)

# EXISTS → left-semi (decorrelate_predicate_subquery.rs:37-199), IN
# (SELECT ...) (panics upstream, sql.rs:1142 — works here), uncorrelated
# scalar subquery (subquery.rs:12-21), all under a global NoGrouping
# aggregate (no_grouping.rs:9-70).
sql_query(
    "subquery_suite",
    """
    SELECT count(*) AS n_cust,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
      AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
      AND c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
