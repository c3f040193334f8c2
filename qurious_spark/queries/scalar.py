"""Scalar-function surface queries.

The reference has NO string/math/array functions (SURVEY.md §2.3: "absent
scalar-function surface" — only EXTRACT exists); Spark has them all built-in.
These queries pin down the exposed surface and its DuckDB-checked semantics.
"""

from __future__ import annotations

from qurious_spark.queries import sql_query

sql_query(
    "string_functions",
    """
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           substr(p_name, 1, 5) AS name5,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           p_name || '!' AS bang,
           trim('  pad  ') AS trimmed,
           replace(p_name, ' ', '_') AS snake,
           reverse(p_type) AS rev_type,
           lpad(CAST(p_size AS STRING), 4, '0') AS size4,
           split_part(p_brand, '#', 2) AS brand_num,
           position('a' IN p_name) AS a_pos,
           repeat('ab', 3) AS ab3,
           initcap(p_type) AS cap_type
    FROM part WHERE p_partkey < 100
    """,
    duck_sql="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           substr(p_name, 1, 5) AS name5,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           p_name || '!' AS bang,
           trim('  pad  ') AS trimmed,
           replace(p_name, ' ', '_') AS snake,
           reverse(p_type) AS rev_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           split_part(p_brand, '#', 2) AS brand_num,
           CAST(position('a' IN p_name) AS INT) AS a_pos,
           repeat('ab', 3) AS ab3,
           CASE WHEN p_type = 'MEDIUM' THEN 'Medium'
                WHEN p_type = 'ECONOMY' THEN 'Economy'
                WHEN p_type = 'STANDARD' THEN 'Standard'
                WHEN p_type = 'PROMO' THEN 'Promo'
                WHEN p_type = 'SMALL' THEN 'Small'
                WHEN p_type = 'LARGE' THEN 'Large' END AS cap_type
    FROM part WHERE p_partkey < 100
    """,
)

# price_k rounds via an integer scale (ROUND(x/10)/100, not ROUND(x/1000, 2)):
# money/1000 lands on exact half-points at digit 3, where Spark (shortest
# decimal string, HALF_UP) and DuckDB (binary value) round apart — surfaced
# by the sf0.01 hot-key sweep pushing 30k rows through the filter.
sql_query(
    "math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS d_abs,
           round(l_extendedprice / 10) / 100 AS price_k,
           CAST(floor(l_quantity / 7) AS BIGINT) AS q_floor,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS q_ceil,
           ROUND(power(l_quantity, 2), 4) AS q_sq,
           ROUND(sqrt(l_quantity), 6) AS q_sqrt,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(exp(l_discount), 6) AS d_exp,
           sign(l_discount - 0.05) AS d_sign,
           CAST(l_quantity AS BIGINT) % 7 AS q_mod,
           greatest(l_quantity, 25.0) AS q_hi,
           least(l_quantity, 25.0) AS q_lo
    FROM lineitem WHERE l_orderkey < 100
    """,
    duck_sql="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS d_abs,
           round(l_extendedprice / 10) / 100 AS price_k,
           CAST(floor(l_quantity / 7) AS BIGINT) AS q_floor,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS q_ceil,
           ROUND(power(l_quantity, 2), 4) AS q_sq,
           ROUND(sqrt(l_quantity), 6) AS q_sqrt,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(exp(l_discount), 6) AS d_exp,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS d_sign,
           CAST(l_quantity AS BIGINT) % 7 AS q_mod,
           greatest(l_quantity, 25.0) AS q_hi,
           least(l_quantity, 25.0) AS q_lo
    FROM lineitem WHERE l_orderkey < 100
    """,
)

sql_query(
    "conditional_functions",
    """
    SELECT o_orderkey,
           coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           nullif(o_orderpriority, '5-LOW') AS prio_nulled,
           ifnull(nullif(o_orderstatus, 'F'), 'finished') AS finished_tag,
           CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_nn
    FROM orders WHERE o_orderkey < 300
    """,
    duck_sql="""
    SELECT o_orderkey,
           coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           nullif(o_orderpriority, '5-LOW') AS prio_nulled,
           ifnull(nullif(o_orderstatus, 'F'), 'finished') AS finished_tag,
           CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_nn
    FROM orders WHERE o_orderkey < 300
    """,
)

sql_query(
    "date_functions",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           date_add(CAST(o_orderdate AS DATE), 30) AS plus30,
           datediff(DATE '2000-01-01', CAST(o_orderdate AS DATE)) AS days_to_y2k,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(EXTRACT(DOW FROM o_orderdate) AS BIGINT) - 1 AS dow,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           ROUND(months_between(DATE '2000-01-01', CAST(o_orderdate AS DATE)), 4) AS months_to_y2k,
           date_format(o_orderdate, 'yyyy-MM') AS ym
    FROM orders WHERE o_orderkey < 200
    """,
    duck_sql="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(EXTRACT(DOW FROM o_orderdate) AS BIGINT) AS dow,
           CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS doy,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           ROUND(12.0 * (EXTRACT(YEAR FROM DATE '2000-01-01') - EXTRACT(YEAR FROM o_orderdate))
                 + (EXTRACT(MONTH FROM DATE '2000-01-01') - EXTRACT(MONTH FROM o_orderdate))
                 + (1 - EXTRACT(DAY FROM o_orderdate)) / 31.0, 4) AS months_to_y2k,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey < 200
    """,
)

sql_query(
    "regexp_functions",
    """
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           length(regexp_replace(text, '[aeiou]', '')) AS no_vowel_len,
           CAST(regexp_like(text, 'data|spark') AS BOOLEAN) AS mentions_data,
           size(split(text, ' ')) AS split_count
    FROM documents WHERE doc_id < 100
    """,
    duck_sql="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS no_vowel_len,
           regexp_matches(text, 'data|spark') AS mentions_data,
           CAST(len(string_split(text, ' ')) AS INT) AS split_count
    FROM documents WHERE doc_id < 100
    """,
)

sql_query(
    "array_functions",
    # arrays are serialized to comma-joined strings on BOTH sides: the
    # driver's pandas canonicalizer crashes on list-typed cells (the r4
    # multimodal_image_features lesson — see the registry docstring)
    """
    SELECT l_orderkey,
           array_join(transform(array_sort(collect_list(l_linenumber)),
                                x -> CAST(x AS STRING)), ',') AS line_nums,
           array_join(array_sort(collect_set(l_returnflag)), ',') AS flags,
           size(collect_list(l_linenumber)) AS n_lines,
           array_max(collect_list(CAST(l_quantity AS BIGINT))) AS max_q,
           array_min(collect_list(CAST(l_quantity AS BIGINT))) AS min_q
    FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey
    """,
    duck_sql="""
    SELECT l_orderkey,
           array_to_string(list_transform(list_sort(list(l_linenumber)),
                                          x -> CAST(x AS VARCHAR)), ',') AS line_nums,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags,
           CAST(len(list(l_linenumber)) AS INT) AS n_lines,
           list_max(list(CAST(l_quantity AS BIGINT))) AS max_q,
           list_min(list(CAST(l_quantity AS BIGINT))) AS min_q
    FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey
    """,
)

sql_query(
    "string_agg",
    """
    SELECT n_regionkey,
           concat_ws(',', array_sort(collect_list(n_name))) AS nations
    FROM nation GROUP BY n_regionkey
    """,
    duck_sql="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)

sql_query(
    "hash_functions",
    """
    SELECT doc_id, md5(text) AS h_md5, sha2(text, 256) AS h_sha256
    FROM documents WHERE doc_id < 50
    """,
    duck_sql="""
    SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
    FROM documents WHERE doc_id < 50
    """,
)
