"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
maps every implemented operator (SURVEY.md §2 + §7 Phases 2/4) to a
``(spark, sf_dir) -> DataFrame`` builder; ``oracle_sql()`` holds the
DuckDB ANSI-SQL twin for each key (column names aligned, aggregated
doubles rounded identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datapoints_csv_extractor_spark.operators import relational as R


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return R.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": R.q1_pricing_summary,
        "q_metrics_rollup": R.q_metrics_rollup,
        "q_distinct": R.q_distinct,
        "q_anti_join": R.q_anti_join,
        "q_semi_join": R.q_semi_join,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q5_local_supplier_volume": R.q5_local_supplier_volume,
        "q_asof_join": R.q_asof_join,
        "q_window_rank": R.q_window_rank,
        "q_window_lag": R.q_window_lag,
        "q_window_running_sum": R.q_window_running_sum,
        "q_range_filter": R.q_range_filter,
        "q_topk_newest": R.q_topk_newest,
        "q_scalar_functions": R.q_scalar_functions,
        "q_unpivot": R.q_unpivot,
        "q_set_ops": R.q_set_ops,
        "q_json_extract": R.q_json_extract,
        "q_approx_distinct": R.q_approx_distinct,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)                                        AS sum_qty,
                   round(sum(l_extendedprice), 2)                                   AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
                   round(avg(l_quantity), 4)                                        AS avg_qty,
                   round(avg(l_extendedprice), 4)                                   AS avg_price,
                   round(avg(l_discount), 4)                                        AS avg_disc,
                   count(*)                                                         AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q_metrics_rollup": """
            SELECT coalesce(event_type, 'ALL')  AS event_type,
                   count(*)                     AS n_events,
                   count(DISTINCT user_id)      AS n_users,
                   round(sum(value), 2)         AS sum_value,
                   round(avg(value), 4)         AS avg_value
            FROM events
            GROUP BY ROLLUP(event_type)
        """,
        "q_distinct": """
            SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        """,
        "q_anti_join": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "q_semi_join": """
            SELECT c_custkey, c_name
            FROM customer c
            WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 100000
                  AND o.o_orderpriority = '1-URGENT'
            )
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
              AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey  = o_orderkey
            JOIN supplier ON l_suppkey   = s_suppkey
            JOIN customer ON o_custkey   = c_custkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "q_asof_join": """
            SELECT c.event_id, c.user_id, c.ts,
                   p.ts    AS purchase_ts,
                   p.value AS purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "q_window_rank": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_price
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders
            )
            WHERE rn = 1
        """,
        "q_window_lag": """
            SELECT event_id, user_id, ts,
                   round(value - lag(value) OVER w, 2)                  AS value_delta,
                   (epoch_ms(ts) - epoch_ms(lag(ts) OVER w))            AS gap_ms
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            QUALIFY value_delta IS NOT NULL
        """,
        "q_window_running_sum": """
            SELECT event_id, user_id, ts,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         2) AS running_value
            FROM events
        """,
        "q_range_filter": """
            SELECT event_id, user_id, ts, event_type
            FROM events
            WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
              AND ts < TIMESTAMP '2024-01-20 00:00:00'
        """,
        "q_topk_newest": """
            SELECT event_id, user_id, ts, event_type
            FROM events
            ORDER BY ts DESC, event_id DESC
            LIMIT 20
        """,
        "q_scalar_functions": """
            SELECT p_partkey,
                   trim(regexp_extract(p_brand || ' : ' || p_name, '([^:]*)$', 1))       AS series_name,
                   trim(regexp_extract(p_brand || ' : ' || p_name, '^(.*):[^:]*$', 1))   AS series_external_id,
                   round(CAST(replace(replace(CAST(p_retailprice AS VARCHAR), '.', ','),
                                      ',', '.') AS DOUBLE), 2)                           AS price_roundtrip,
                   (1550092500000 + p_partkey)                                       AS ts_ms
            FROM part
        """,
        "q_unpivot": """
            SELECT l_orderkey, l_linenumber, measure, round(value, 4) AS value
            FROM (
                UNPIVOT lineitem
                ON l_quantity, l_extendedprice, l_discount, l_tax
                INTO NAME measure VALUE value
            )
        """,
        "q_set_ops": """
            WITH b AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
                 m AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
                 h AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'HOUSEHOLD')
            SELECT 'building_and_machinery' AS set_kind, c_nationkey
            FROM (SELECT c_nationkey FROM b INTERSECT SELECT c_nationkey FROM m)
            UNION ALL
            SELECT 'bm_minus_household' AS set_kind, c_nationkey
            FROM (
                SELECT c_nationkey FROM (SELECT c_nationkey FROM b UNION SELECT c_nationkey FROM m)
                EXCEPT ALL
                SELECT DISTINCT c_nationkey FROM h
            )
        """,
        "q_json_extract": """
            SELECT event_type,
                   count(*)                                              AS n,
                   CAST(sum(CAST(props ->> 'k' AS INT)) AS BIGINT)       AS sum_k,
                   max(CAST(props ->> 'k' AS INT))                       AS max_k
            FROM events
            GROUP BY event_type
        """,
        "q_approx_distinct": """
            SELECT event_type, count(DISTINCT user_id) AS exact_users
            FROM events
            GROUP BY event_type
        """,
    }
