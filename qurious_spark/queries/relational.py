"""Core relational operator surface (SURVEY.md §2.1/§2.3/§2.4 parity + §2.5 beyond).

Each ``sql_query`` registers identical ANSI SQL for Spark and the DuckDB
oracle; ``df_query`` entries exercise the DataFrame fluent layer (the
reference's entry point B, qurious/src/dataframe/mod.rs:15-59) and carry a
hand-written oracle.

Reference parity notes are inline; everything here is expressed so Catalyst
chooses the physical strategy (broadcast joins for dims, partial aggregation,
TakeOrderedAndProject for top-n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qurious_spark.queries import df_query, sql_query, table

# --------------------------------------------------------------------------- #
# Projection / Filter / Sort / Limit  (reference: logical/plan/{projection,
# filter,sort,limit}.rs; Spark: select/filter/orderBy/limit)
# --------------------------------------------------------------------------- #

sql_query(
    "projection_arith",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity * (1 - l_discount), 4) AS net_qty,
           ROUND(l_extendedprice * (1 + l_tax), 4) AS gross_price,
           l_extendedprice - l_discount AS spread
    FROM lineitem WHERE l_orderkey < 200
    """,
)

sql_query(
    "filter_compound",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE (l_quantity > 45 AND l_discount < 0.02) OR (l_tax > 0.07 AND NOT l_returnflag = 'A')
    """,
)

# Kleene 3-valued logic (reference: physical/expr/binary.rs and_kleene/or_kleene)
sql_query(
    "filter_null_kleene",
    """
    SELECT count(*) AS kept
    FROM lineitem
    WHERE NOT (NULLIF(l_discount, 0.0) > 0.05 AND l_quantity > 10)
    """,
)

sql_query(
    "sort_multi_key",
    """
    SELECT o_orderpriority, o_orderstatus, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
)

sql_query(
    "limit_offset",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100 OFFSET 50
    """,
)

# Top-N: Catalyst fuses orderBy+limit into TakeOrderedAndProject — the
# reference hand-fuses the same way (planner/mod.rs:69-83).
sql_query(
    "topn_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)

sql_query(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)

sql_query(
    "select_no_from",
    "SELECT 1 AS one, 'x' AS tag, CAST(2.5 AS DOUBLE) AS v",
)

sql_query(
    "values_inline",
    "SELECT a, b FROM VALUES (1, 'x'), (2, 'y'), (3, NULL) AS t(a, b)",
    duck_sql="SELECT a, b FROM (VALUES (1, 'x'), (2, 'y'), (3, NULL)) t(a, b)",
)

sql_query(
    "subquery_alias",
    """
    SELECT t.flag, t.cnt FROM (
        SELECT l_returnflag AS flag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag
    ) t WHERE t.cnt > 100
    """,
)

# --------------------------------------------------------------------------- #
# Joins — all six types + cross + non-equi (reference: common/join_type.rs,
# physical/plan/join/*; Spark picks broadcast/shuffle-hash/SMJ/BNLJ)
# --------------------------------------------------------------------------- #

sql_query(
    "cross_join",
    """
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)

sql_query(
    "join_inner",
    """
    SELECT n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)

sql_query(
    "join_left_outer",
    """
    SELECT n.n_name, r.r_name
    FROM nation n LEFT JOIN (SELECT * FROM region WHERE r_regionkey < 3) r
      ON n.n_regionkey = r.r_regionkey
    """,
)

sql_query(
    "join_right_outer",
    """
    SELECT n.n_name, r.r_name
    FROM (SELECT * FROM nation WHERE n_regionkey < 3) n
      RIGHT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)

sql_query(
    "join_full_outer",
    """
    SELECT n.n_name, r.r_name
    FROM (SELECT * FROM nation WHERE n_regionkey >= 2) n
      FULL JOIN (SELECT * FROM region WHERE r_regionkey <= 2) r
      ON n.n_regionkey = r.r_regionkey
    """,
)


@df_query(
    "join_left_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@df_query(
    "join_left_anti",
    # Anti-join against a FILTERED orders subset: every testdata customer has
    # at least one order, so an unfiltered NOT EXISTS returns 0 rows and a
    # broken anti-join that always returns empty would also "pass". The
    # >300000 filter leaves a non-empty, discriminating result (30 rows at
    # sf0.01).
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# Non-equi join → Spark BroadcastNestedLoopJoin (reference: NestedLoopJoinExec)
sql_query(
    "join_non_equi",
    """
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)

# Comma-join + WHERE → inner join (reference rule EliminateCrossJoin;
# Catalyst infers join conditions from filters natively)
sql_query(
    "comma_join_elimination",
    """
    SELECT n_name, r_name FROM nation, region
    WHERE n_regionkey = r_regionkey AND r_name IN ('ASIA', 'EUROPE')
    """,
)

# Qualified wildcard expansion (reference sql.rs:1288-1325: Wildcard /
# QualifiedWildcard select items): t.* expands to exactly t's columns even
# when other relations are in scope — a bare * here would also pull r's.
sql_query(
    "wildcard_qualified",
    """
    SELECT n.*, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name <> 'ASIA'
    ORDER BY n.n_nationkey
    """,
)

# --------------------------------------------------------------------------- #
# Predicates: IN / BETWEEN / LIKE / IS NULL / CASE  (reference §2.3)
# --------------------------------------------------------------------------- #

sql_query(
    "in_list",
    """
    SELECT count(*) AS cnt FROM lineitem
    WHERE l_returnflag IN ('A', 'N') AND l_linenumber NOT IN (5, 6, 7)
    """,
)

# NOT IN over a subquery producing a NULL → empty result (SQL three-valued
# semantics; the reference's AND-chain rewrite preserves the same, sql.rs:1060-1099)
sql_query(
    "not_in_with_null",
    """
    SELECT count(*) AS cnt FROM nation
    WHERE n_regionkey NOT IN (SELECT NULLIF(r_regionkey, 0) FROM region)
    """,
)

sql_query(
    "between_pred",
    """
    SELECT l_orderkey, l_quantity FROM lineitem
    WHERE l_quantity BETWEEN 20 AND 22 AND l_shipdate NOT BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1996-12-31'
    """,
)

sql_query(
    "like_patterns",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_type LIKE '%BRASS%' OR p_name LIKE '_o%' OR p_brand NOT LIKE 'Brand#1%'
    """,
)

sql_query(
    "ilike_pattern",
    "SELECT count(*) AS cnt FROM part WHERE p_type ILIKE '%brass%'",
)

sql_query(
    "is_null_checks",
    """
    SELECT
      count(*) AS total,
      CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS zero_discount,
      CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nonzero_discount
    FROM lineitem
    """,
)

sql_query(
    "case_searched",
    """
    SELECT o_orderkey,
      CASE WHEN o_totalprice > 300000 THEN 'big'
           WHEN o_totalprice > 100000 THEN 'mid'
           ELSE 'small' END AS bucket
    FROM orders WHERE o_orderkey < 500
    """,
)

# Simple CASE — the reference rewrites it to searched form at plan time
# (sql.rs:1100-1136); Spark handles natively.
sql_query(
    "case_simple",
    """
    SELECT l_linenumber,
      CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'R' THEN 'returned' END AS verdict,
      count(*) AS cnt
    FROM lineitem GROUP BY l_linenumber, l_returnflag
    """,
)

# --------------------------------------------------------------------------- #
# Casts / dates / intervals / EXTRACT  (reference §2.3: cast.rs, EXTRACT UDF,
# interval constant-folding sql.rs:1146-1229)
# --------------------------------------------------------------------------- #

sql_query(
    "cast_expr",
    """
    SELECT l_orderkey,
           CAST(l_linenumber AS STRING) AS ln_str,
           CAST(l_shipdate AS DATE) AS ship_day,
           CAST(l_orderkey AS DOUBLE) AS key_dbl,
           l_linenumber::BIGINT AS ln_big
    FROM lineitem WHERE l_orderkey < 100
    """,
    duck_sql="""
    SELECT l_orderkey,
           CAST(l_linenumber AS VARCHAR) AS ln_str,
           CAST(l_shipdate AS DATE) AS ship_day,
           CAST(l_orderkey AS DOUBLE) AS key_dbl,
           l_linenumber::BIGINT AS ln_big
    FROM lineitem WHERE l_orderkey < 100
    """,
)

sql_query(
    "interval_arith",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL '30' DAY AS due_ts,
           o_orderdate - INTERVAL '1' MONTH AS prior_month
    FROM orders WHERE o_orderkey < 300
    """,
    duck_sql="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           o_orderdate - INTERVAL 1 MONTH AS prior_month
    FROM orders WHERE o_orderkey < 300
    """,
)

sql_query(
    "extract_parts",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
           CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
           count(*) AS cnt
    FROM orders GROUP BY 1, 2, 3
    """,
)

sql_query(
    "date_trunc_agg",
    """
    SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS month_start,
           count(*) AS orders_cnt,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS month_rev
    FROM orders GROUP BY 1
    """,
)

# --------------------------------------------------------------------------- #
# Aggregation  (reference §2.4: SUM/MIN/MAX/AVG/COUNT only; we add the full
# Spark surface: DISTINCT aggs, stats, median, grouping sets)
# --------------------------------------------------------------------------- #

sql_query(
    "agg_basic",
    """
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(l_quantity) AS n_qty,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           ROUND(AVG(l_quantity), 4) AS avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)

sql_query(
    "agg_no_grouping",
    """
    SELECT count(*) AS n, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
           MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
    FROM orders
    """,
)

sql_query(
    "agg_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           CAST(SUM(DISTINCT l_linenumber) AS BIGINT) AS sum_distinct_ln
    FROM lineitem GROUP BY l_returnflag
    """,
)

sql_query(
    "agg_stats",
    """
    SELECT o_orderstatus,
           ROUND(stddev_samp(o_totalprice), 4) AS sd_price,
           ROUND(var_samp(o_totalprice), 4) AS var_price,
           ROUND(median(o_custkey), 4) AS med_cust
    FROM orders GROUP BY o_orderstatus
    """,
)

sql_query(
    "having_filter",
    """
    SELECT l_partkey, ROUND(SUM(l_quantity), 4) AS total_qty
    FROM lineitem GROUP BY l_partkey
    HAVING SUM(l_quantity) > 150 AND count(*) > 3
    """,
)

sql_query(
    "group_by_expr",
    """
    SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
           l_returnflag,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT), l_returnflag
    """,
)

sql_query(
    "rollup_agg",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           count(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

sql_query(
    "cube_agg",
    """
    SELECT coalesce(o_orderstatus, '?') AS status,
           coalesce(o_orderpriority, '?') AS prio,
           count(*) AS cnt, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS rev
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)

sql_query(
    "grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)

# Manual pivot via conditional aggregation (portable to the oracle; the
# DataFrame .pivot() variant is exercised in tests/)
sql_query(
    "pivot_case",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 4) AS qty_f,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 4) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)

# The inverse: UNPIVOT via stack() — wide metric columns to (metric, value)
# rows, one generator pass, no join. Oracle restates it as UNION ALL.
sql_query(
    "unpivot_stack",
    """
    SELECT l_returnflag, metric, val FROM (
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc
        FROM lineitem GROUP BY l_returnflag
    ) LATERAL VIEW stack(2, 'sum_qty', sum_qty, 'avg_disc', avg_disc) AS metric, val
    ORDER BY l_returnflag, metric
    """,
    duck_sql="""
    WITH w AS (
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM w
    UNION ALL
    SELECT l_returnflag, 'avg_disc' AS metric, avg_disc AS val FROM w
    ORDER BY l_returnflag, metric
    """,
)

# --------------------------------------------------------------------------- #
# Subqueries  (reference §2.3 + optimizer rules 3/4: scalar→join,
# EXISTS→semi/anti; Catalyst does both natively)
# --------------------------------------------------------------------------- #

sql_query(
    "scalar_subquery",
    """
    SELECT count(*) AS above_avg FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)

sql_query(
    "correlated_scalar_subquery",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
)

sql_query(
    "exists_subquery",
    """
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
    )
    """,
)

sql_query(
    "not_exists_subquery",
    # NOT EXISTS against a FILTERED lineitem subset: every sf0.01 part has
    # at least one lineitem, so the unfiltered form returns 0 rows and can
    # never catch a broken anti-join (114 rows with the quantity filter).
    """
    SELECT p_partkey FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
    )
    """,
)

sql_query(
    "in_subquery",
    """
    SELECT count(*) AS cnt FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    )
    """,
)

sql_query(
    "cte_query",
    """
    WITH big_orders AS (
        SELECT o_custkey, count(*) AS n FROM orders
        WHERE o_totalprice > 200000 GROUP BY o_custkey
    )
    SELECT c.c_mktsegment, CAST(SUM(b.n) AS BIGINT) AS big_order_cnt
    FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
    GROUP BY c.c_mktsegment
    """,
)

# --------------------------------------------------------------------------- #
# Set operations  (absent in the reference — §2.5; Spark built-in)
# --------------------------------------------------------------------------- #

sql_query(
    "union_all",
    """
    SELECT n_nationkey AS k, 'nation' AS src FROM nation
    UNION ALL
    SELECT r_regionkey AS k, 'region' AS src FROM region
    """,
)

sql_query(
    "union_distinct",
    """
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey AS k FROM supplier
    """,
)

sql_query(
    "intersect_keys",
    """
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
)

sql_query(
    "except_keys",
    # the right side is a filtered supplier subset: every nation has SOME
    # supplier, so the unfiltered EXCEPT is empty and vacuously green
    # (11 surviving keys with the filter).
    """
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey AS k FROM supplier WHERE s_suppkey < 20
    """,
)

# --------------------------------------------------------------------------- #
# Window functions  (absent in the reference — §2.5; Spark built-in)
# --------------------------------------------------------------------------- #

sql_query(
    "window_row_number",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    duck_sql="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn = 1
    """,
)

sql_query(
    "window_rank_dense",
    """
    SELECT l_returnflag, l_quantity,
           CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS BIGINT) AS drnk
    FROM lineitem WHERE l_orderkey < 100
    """,
)

# ORDER BY carries l_quantity as a tiebreak: (l_orderkey, l_linenumber) is
# unique in well-formed data, but under key-collapsing (hot-key) inputs the
# pair duplicates and lag/lead over tied sort keys is engine-nondeterministic
# (found by tools/skew_sweep.py). Any remaining ties share l_quantity, so
# every permutation yields identical output.
sql_query(
    "window_lag_lead",
    """
    SELECT l_orderkey, l_linenumber,
           lag(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS prev_qty,
           lead(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS next_qty
    FROM lineitem WHERE l_orderkey < 200
    """,
)

sql_query(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders WHERE o_custkey < 50
    """,
)

sql_query(
    "window_range_frame",
    """
    SELECT l_orderkey, l_quantity,
           CAST(count(*) OVER (
               PARTITION BY l_orderkey ORDER BY l_quantity
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_cnt
    FROM lineitem WHERE l_orderkey < 100
    """,
)

sql_query(
    "window_ntile_percent",
    """
    SELECT o_orderkey,
           CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
           ROUND(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct
    FROM orders WHERE o_orderkey < 400
    """,
)


@df_query(
    "range_join_binned",
    """
    SELECT o_orderpriority,
           COUNT(*) AS pairs,
           ROUND(SUM(l_quantity), 4) AS qty_sum
    FROM lineitem
    JOIN orders
      ON l_shipdate >= o_orderdate
     AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
    WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-06-08 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via bin bucketing (operators/rangejoin.py):
    shipments landing inside each order's 7-day window, per priority, for
    orders placed in one calendar week. The naive BETWEEN condition would
    plan a BroadcastNestedLoopJoin. The interval side is date-bounded
    because an every-point x every-interval week-window join has output
    quadratic in data density (both sides share one fixed time axis) — any
    engine pays that; the realistic shape is points against a SELECTIVE
    interval set, and the bin equi-join then prunes every out-of-window
    point at the shuffle."""
    from qurious_spark.operators.rangejoin import range_join

    day = 86400.0
    points = table(spark, sf_dir, "lineitem").select(
        "l_quantity", F.unix_timestamp("l_shipdate").alias("p")
    )
    intervals = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-06-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-06-08")))
        )
        .select(
            "o_orderpriority",
            F.unix_timestamp("o_orderdate").alias("s"),
            (F.unix_timestamp("o_orderdate") + F.lit(7 * day)).alias("e"),
        )
    )
    joined = range_join(
        points, intervals, F.col("p"), F.col("s"), F.col("e"), bin_width=7 * day
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("pairs"),
            F.round(F.sum("l_quantity"), 4).alias("qty_sum"),
        )
        .orderBy("o_orderpriority")
    )


# Recursive CTE (Spark 4 WITH RECURSIVE; beyond the reference, whose planner
# has no recursion — qurious/src/planner/sql.rs plans CTEs as plain
# SubqueryAlias). A recursive month spine left-joined to per-month order
# counts: materializes empty months, the relational cousin of the
# time-series gapfill spine.
sql_query(
    "recursive_cte_months",
    """
    WITH RECURSIVE months(m) AS (
      SELECT CAST('1995-01-01' AS DATE)
      UNION ALL
      SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
      WHERE m < CAST('2001-07-01' AS DATE)
    ),
    o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                 count(*) AS n
          FROM orders GROUP BY 1)
    SELECT months.m AS month_start, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
    FROM months LEFT JOIN o ON months.m = o.m
    """,
    duck_sql="""
    WITH RECURSIVE months(m) AS (
      SELECT CAST('1995-01-01' AS DATE)
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < CAST('2001-07-01' AS DATE)
    ),
    o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                 count(*) AS n
          FROM orders GROUP BY 1)
    SELECT months.m AS month_start, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
    FROM months LEFT JOIN o ON months.m = o.m
    """,
)


_QUALIFY_SQL = """
    SELECT CAST(c_nationkey AS BIGINT) AS nk, c_custkey AS ck
    FROM customer
    QUALIFY row_number() OVER (
        PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) <= 2
"""


@df_query("window_qualify", _QUALIFY_SQL)
def window_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB/Snowflake QUALIFY clause (top-2 customers per nation by
    account balance): the dialect desugars it into a post-window filter
    (dialect.rewrite_qualify; Spark has no QUALIFY), while DuckDB runs the
    IDENTICAL text natively — a genuine cross-dialect semantic check, not a
    restated oracle."""
    from qurious_spark.queries import ensure_views
    from qurious_spark.session import Session

    ensure_views(spark, sf_dir)
    return Session(spark).sql(_QUALIFY_SQL)
