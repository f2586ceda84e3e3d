"""The SQL entry path: load_tables registers temp views, spark.sql runs
ANSI queries over them, and results agree with the DataFrame builders —
the same logical plan from either API (Catalyst unifies them)."""

from pyspark.sql import functions as F

from svdmovie_lens_parallel_apache_spark_spark.catalog import REGISTRY
from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_tables


def test_sql_q01_matches_builder(spark, sf_dir):
    load_tables(spark, sf_dir, ["lineitem"])
    sql_out = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               floor(sum(l_quantity) * 1e3 + 0.5) / 1e3 AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    built = REGISTRY["q01_pricing_summary"].builder(spark, sf_dir).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    key = lambda r: (r.l_returnflag, r.l_linestatus)
    a = {key(r): (r.sum_qty, r.count_order) for r in sql_out.collect()}
    b = {key(r): (r.sum_qty, r.count_order) for r in built.collect()}
    assert a == b


def test_sql_semi_join_matches_builder(spark, sf_dir):
    load_tables(spark, sf_dir, ["orders", "lineitem"])
    sql_out = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )
    built = REGISTRY["q04_order_priority"].builder(spark, sf_dir)
    a = {r.o_orderpriority: r.order_count for r in sql_out.collect()}
    b = {r.o_orderpriority: r.order_count for r in built.collect()}
    assert a == b


def test_sql_window_matches_builder(spark, sf_dir):
    load_tables(spark, sf_dir, ["events"])
    sql_out = spark.sql(
        """
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM (SELECT event_type,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
              FROM events)
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
        """
    )
    built = REGISTRY["event_transitions"].builder(spark, sf_dir)
    a = {(r.prev_type, r.next_type): r.n for r in sql_out.collect()}
    b = {(r.prev_type, r.next_type): r.n for r in built.collect()}
    assert a == b
