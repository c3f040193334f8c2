"""Reference partsupp join topology (VERDICT missing-item #2).

The reference's TPC-H corpus joins through a ``partsupp`` table
(/root/reference/qurious/tests/tpch/create_tables.slt:2-11; q2.slt,
q11.slt), which the driver testdata does not ship. Rather than keep
approximating those shapes, ``partsupp`` is DERIVED deterministically from
part x supplier with pure integer arithmetic both engines evaluate
identically — 4 supplier rows per part, keys guaranteed in range via a
modulus on the live supplier count — and the reference join topologies run
unchanged on top of it:

- tpch_q2_partsupp  — q2.slt shape: 5-way comma join + correlated MIN
  subquery on supplycost (adapted columns: testdata supplier/part carry no
  address/phone/comment/mfgr).
- tpch_q11_partsupp — q11.slt shape: partsupp ⋈ supplier ⋈ nation with
  HAVING vs a global-threshold scalar subquery.
- tpch_q16_partsupp / tpch_q20_partsupp — standard TPC-H topologies over
  partsupp (beyond the reference's q1-q12 corpus; exclusion predicate
  adapted to available columns).

Money sums follow tpch.py's determinism convention: row-local double
products cast to DECIMAL before SUM so partition order can't flip a hash.
"""

from __future__ import annotations

from qurious_spark.queries import sql_query

# 4 deterministic supplier rows per part; ps_suppkey stays in range at any
# scale factor because the modulus is the live supplier count. k*13 mod any
# tested supplier count keeps the 4 keys distinct per part, so
# (ps_partkey, ps_suppkey) is unique.
PARTSUPP_CTE = """
partsupp AS (
    SELECT p_partkey AS ps_partkey,
           CAST((p_partkey * 7 + k * 13) % (SELECT count(*) FROM supplier) AS BIGINT) AS ps_suppkey,
           CAST((p_partkey * 13 + k * 5) % 9999 + 1 AS BIGINT) AS ps_availqty,
           CAST((p_partkey * 31 + k * 7) % 10000 + 100 AS DOUBLE) / 100.0 AS ps_supplycost
    FROM part
    CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) ks
)
"""

sql_query(
    "tpch_q2_partsupp",
    f"""
    WITH {PARTSUPP_CTE}
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
    FROM part p, supplier s, partsupp ps, nation n, region r
    WHERE p.p_partkey = ps.ps_partkey
      AND s.s_suppkey = ps.ps_suppkey
      AND p.p_size < 15
      AND p.p_type LIKE '%DARD'
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost)
          FROM partsupp ps2, supplier s2, nation n2, region r2
          WHERE p.p_partkey = ps2.ps_partkey
            AND s2.s_suppkey = ps2.ps_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 10
    """,
)

sql_query(
    "tpch_q11_partsupp",
    f"""
    WITH {PARTSUPP_CTE}
    SELECT ps.ps_partkey,
           CAST(ROUND(SUM(CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(24,4))), 2) AS DOUBLE) AS value
    FROM partsupp ps, supplier s, nation n
    WHERE ps.ps_suppkey = s.s_suppkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_name = 'NATION_7'
    GROUP BY ps.ps_partkey
    HAVING CAST(SUM(CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(24,4))) AS DOUBLE) > (
        SELECT CAST(SUM(CAST(ps2.ps_supplycost * ps2.ps_availqty AS DECIMAL(24,4))) AS DOUBLE) * 0.0001
        FROM partsupp ps2, supplier s2, nation n2
        WHERE ps2.ps_suppkey = s2.s_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_name = 'NATION_7'
    )
    ORDER BY value DESC
    """,
)

sql_query(
    "tpch_q16_partsupp",
    f"""
    WITH {PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps, part p
    WHERE p.p_partkey = ps.ps_partkey
      AND p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM POLISHED%'
      AND p.p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)

sql_query(
    "tpch_q20_partsupp",
    f"""
    WITH {PARTSUPP_CTE}
    SELECT s.s_name, n.n_name
    FROM supplier s, nation n
    WHERE s.s_nationkey = n.n_nationkey
      -- q20's single-nation filter, generalized to a REGION: a hardcoded
      -- nation name is data-pick-dependent (NATION_9 was chosen because it
      -- had qualifying suppliers at sf0.01; any single nation can go empty
      -- at another SF — round-9 sf1-gate find), while nation/region are
      -- fixed-cardinality tables (25/5) at every SF, so a region keeps the
      -- selective dimension filter scale-free (13 / 207 / 2070 suppliers
      -- at sf0.01/0.1/1)
      AND n.n_regionkey = 0
      AND s.s_suppkey IN (
          SELECT ps.ps_suppkey
          FROM partsupp ps
          WHERE ps.ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 's%'
          )
          AND ps.ps_availqty > (
              SELECT 0.5 * SUM(l.l_quantity)
              FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
                AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
                AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          )
      )
    ORDER BY s.s_name
    """,
)
