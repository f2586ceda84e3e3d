"""Query catalog: every implemented operator as a (PySpark builder, DuckDB
oracle SQL) pair.

This is the engine's public query surface and the driver's correctness
gate (``__spark_entry__.py`` re-exports it). Naming contract: every
computed column is aliased identically in the Spark builder and the oracle
SQL. Float discipline: arithmetic-produced doubles are rounded on BOTH
sides with the engine-portable formula ``floor(x*10^n + 0.5)/10^n``
(see ``functions.scalar.portable_round`` — ``F.round``/DuckDB ``round``
disagree on exact decimal boundaries); int-width mismatches are resolved
by explicit casts (Spark ``row_number`` is int32, DuckDB's int64, etc.).

Reference parity tags (SURVEY.md §2 operator ids) are noted per query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalar import clamp, portable_round as _r
from .operators.relational import anti_join, asof_join, semi_join, topk_per_group
from .operators.stats import keyed_stats
from .operators.windows import running_totals, sessionize, tumbling_agg
from .sources.readers import load_table


def _R(expr: str, n: int) -> str:
    """DuckDB twin of functions.scalar.portable_round."""
    return f"floor(({expr}) * 1e{n} + 0.5) / 1e{n}"


@dataclass
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver does rows-only check
    tags: tuple = ()
    description: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, tags=(), description: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, tuple(tags), description)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


# epoch seconds, floor — matches DuckDB CAST(floor(epoch(ts)) AS BIGINT)
def _epoch_s(col):
    return col.cast("long")


# ---------------------------------------------------------------------------
# Relational core (reference S1/P2-P6/A1-A7/J1-J2 + engine additions)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_R('sum(l_quantity)', 3)}                                       AS sum_qty,
           {_R('sum(l_extendedprice)', 3)}                                  AS sum_base_price,
           {_R('sum(l_extendedprice * (1 - l_discount))', 3)}               AS sum_disc_price,
           {_R('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 3)} AS sum_charge,
           {_R('avg(l_quantity)', 6)}                                       AS avg_qty,
           {_R('avg(l_extendedprice)', 6)}                                  AS avg_price,
           {_R('avg(l_discount)', 6)}                                       AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A3", "A5", "P2", "S1"),
    description="TPC-H Q1-shaped pricing summary: scan→filter→hash agg with map-side partials.",
)
def q01_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= _ts("1998-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity"), 3).alias("sum_qty"),
            _r(F.sum("l_extendedprice"), 3).alias("sum_base_price"),
            _r(F.sum(disc_price), 3).alias("sum_disc_price"),
            _r(F.sum(disc_price * (1 + F.col("l_tax"))), 3).alias("sum_charge"),
            _r(F.avg("l_quantity"), 6).alias("avg_qty"),
            _r(F.avg("l_extendedprice"), 6).alias("avg_price"),
            _r(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    f"""
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')                      AS o_orderdate,
           o_orderpriority,
           {_R('sum(l_extendedprice * (1 - l_discount))', 3)}     AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("J1", "J3", "A1", "P2"),
    description="TPC-H Q3-shaped: selective dim filters, fact join, top-10 by revenue. "
    "Customer side is broadcast (small dim).",
)
def q03_shipping_priority(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > _ts("1998-01-01 00:00:00"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 3).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


@register(
    "q05_local_supplier_volume",
    f"""
    SELECT n_name,
           {_R('sum(l_extendedprice * (1 - l_discount))', 3)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("J1", "J2", "J3"),
    description="TPC-H Q5-shaped 6-way star join; all dims broadcast, single fact shuffle.",
)
def q05_local_supplier_volume(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1999-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 3).alias("revenue"))
    )


@register(
    "per_key_stats_customer",
    f"""
    SELECT o_custkey,
           count(*)                                                    AS rating_count,
           {_R('sum(o_totalprice)', 3)}                                AS rating_sum,
           {_R('avg(o_totalprice)', 6)}                                AS rating_avg,
           {_R('(3.23 * 25.0 + sum(o_totalprice)) / (25.0 + count(*))', 6)} AS pseudo_avg
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("A1", "A2", "J1", "U5"),
    description="Customer.java stats (count/sum/avg + Movie.PseudoAvg Bayesian mean) as ONE "
    "groupBy — replaces the reference's two reduceByKey passes + join "
    "(SVDMovieLensSparkJava.java:196-203).",
)
def per_key_stats_customer(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    s = keyed_stats(orders, "o_custkey", "o_totalprice")
    return s.select(
        "o_custkey",
        "rating_count",
        _r(F.col("rating_sum"), 3).alias("rating_sum"),
        _r(F.col("rating_avg"), 6).alias("rating_avg"),
        _r(F.col("pseudo_avg"), 6).alias("pseudo_avg"),
    )


@register(
    "per_key_stats_part",
    f"""
    SELECT l_partkey,
           count(*)                                                    AS rating_count,
           {_R('sum(l_quantity)', 3)}                                  AS rating_sum,
           {_R('avg(l_quantity)', 6)}                                  AS rating_avg,
           {_R('(3.23 * 25.0 + sum(l_quantity)) / (25.0 + count(*))', 6)} AS pseudo_avg
    FROM lineitem
    GROUP BY l_partkey
    """,
    tags=("A3", "A4", "J2", "U5"),
    description="Movie.java per-item stats over the fact table (Movie.java:5-41 semantics).",
)
def per_key_stats_part(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = keyed_stats(li, "l_partkey", "l_quantity")
    return s.select(
        "l_partkey",
        "rating_count",
        _r(F.col("rating_sum"), 3).alias("rating_sum"),
        _r(F.col("rating_avg"), 6).alias("rating_avg"),
        _r(F.col("pseudo_avg"), 6).alias("pseudo_avg"),
    )


@register(
    "filter_project",
    f"""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_quantity) AS INTEGER)                  AS qty_int,
           {_R('l_extendedprice * (1 + l_tax)', 3)}            AS gross_price
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity < 10
    """,
    tags=("P2", "P6", "S1"),
    description="Projection + predicate; both reach the parquet scan (PushedFilters/ReadSchema).",
)
def filter_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 10))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor("l_quantity").cast("int").alias("qty_int"),
            _r(F.col("l_extendedprice") * (1 + F.col("l_tax")), 3).alias("gross_price"),
        )
    )


@register(
    "topk_per_group",
    """
    SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part)
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
    description="Top-3 parts per brand: per-group window sort, no global sort.",
)
def topk_per_group_q(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return topk_per_group(
        part, ["p_brand"], [F.desc("p_retailprice"), F.asc("p_partkey")], 3
    ).select("p_brand", "p_partkey", "p_retailprice", "rn")


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE c_mktsegment = 'MACHINERY'
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    """,
    tags=("join",),
    description="Left-semi join (EXISTS).",
)
def join_semi(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "MACHINERY")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
    return semi_join(cust, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
    description="Left-anti join (NOT EXISTS): customers with no urgent order.",
)
def join_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return anti_join(cust, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey").select(
        "c_custkey", "c_name"
    )


@register(
    "agg_distinct",
    f"""
    SELECT c_mktsegment,
           count(*)                         AS n_cust,
           count(DISTINCT c_nationkey)      AS n_nations,
           {_R('sum(c_acctbal)', 3)}        AS sum_bal,
           {_R('avg(c_acctbal)', 6)}        AS avg_bal,
           min(c_acctbal)                   AS min_bal,
           max(c_acctbal)                   AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg",),
    description="Multi-agg incl. distinct count (expand + two-phase agg in Spark).",
)
def agg_distinct(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        _r(F.sum("c_acctbal"), 3).alias("sum_bal"),
        _r(F.avg("c_acctbal"), 6).alias("avg_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@register(
    "set_except",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 7500.0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
    tags=("setop",),
    description="EXCEPT (distinct) — high-balance customers minus early-order customers.",
)
def set_except(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rich = cust.where(F.col("c_acctbal") > 7500.0).select("c_custkey")
    early = orders.where(F.col("o_orderdate") < _ts("1996-01-01 00:00:00")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rich.subtract(early)


@register(
    "set_union",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
    UNION
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_totalprice > 400000.0
    """,
    tags=("setop",),
    description="UNION (distinct).",
)
def set_union(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = cust.where(F.col("c_acctbal") > 9000.0).select("c_custkey")
    b = orders.where(F.col("o_totalprice") > 400000.0).select(F.col("o_custkey").alias("c_custkey"))
    return a.union(b).distinct()


# ---------------------------------------------------------------------------
# Event-time windows (engine additions; streaming twins in streaming/jobs.py)
# ---------------------------------------------------------------------------


@register(
    "window_running_totals",
    f"""
    SELECT user_id, event_id,
           CAST(row_number() OVER w AS INTEGER)          AS rn,
           {_R('sum(value) OVER w', 4)}                  AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
    description="Per-user event-time running totals.",
)
def window_running_totals(spark, sf_dir):
    return running_totals(_t(spark, sf_dir, "events"))


@register(
    "window_lag_gap",
    f"""
    SELECT user_id,
           count(*)                AS n_gaps,
           {_R('avg(gap_s)', 4)}   AS avg_gap_s,
           max(gap_s)              AS max_gap_s
    FROM (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events)
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
    tags=("window",),
    description="lag() inter-event gaps per user + per-user gap stats.",
)
def window_lag_gap(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (_epoch_s(F.col("ts")) - F.lag(_epoch_s(F.col("ts"))).over(w)).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        _r(F.avg("gap_s"), 4).alias("avg_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


@register(
    "sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800 THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*)                              AS n_events,
           min(CAST(floor(epoch(ts)) AS BIGINT)) AS session_start_s,
           max(CAST(floor(epoch(ts)) AS BIGINT)) AS session_end_s
    FROM sess
    GROUP BY user_id, session_id
    """,
    tags=("window", "session"),
    description="Gap-based sessionization (30-min gap): lag + cumulative boundary sum. "
    "Streaming twin: session_window / applyInPandasWithState.",
)
def sessionize_q(spark, sf_dir):
    return sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


@register(
    "event_tumbling_agg",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           count(*)                 AS n_events,
           {_R('sum(value)', 4)}    AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "streaming-batch-twin"),
    description="Tumbling 1h window aggregation (batch twin of the streaming job).",
)
def event_tumbling_agg(spark, sf_dir):
    out = tumbling_agg(_t(spark, sf_dir, "events"), "hour")
    return out.select(
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "json_extract_stats",
    f"""
    SELECT event_type,
           count(*)                                                          AS n,
           {_R("avg(CAST(json_extract_string(props, '$.k') AS INTEGER))", 6)} AS avg_k,
           min(CAST(json_extract_string(props, '$.k') AS INTEGER))           AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER))           AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "semi-structured"),
    description="JSON prop extraction (get_json_object) + per-type stats.",
)
def json_extract_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _r(F.avg(k), 6).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "json_variant_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0)
                AS BIGINT) AS n_even_k
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "semi-structured", "variant"),
    description="Spark-4 VARIANT path for semi-structured data: parse_json ONCE into "
    "the binary variant encoding, then multiple typed variant_get extractions — at "
    "100 TB this beats re-parsing JSON text per field (shredded binary access), and "
    "it's the shape for landing heterogeneous props columns. Oracle: DuckDB "
    "json_extract twins.",
)
def json_variant_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("v", F.parse_json("props"))
    k = F.variant_get(F.col("v"), "$.k", "long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.count_if(k % 2 == 0).alias("n_even_k"),
    )


@register(
    "rollup_pricing",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           {_R('sum(l_quantity)', 3)}    AS sum_qty,
           count(*)                      AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
    description="ROLLUP hierarchy totals (flag, status, grand total) — Catalyst expands "
    "grouping sets in a single aggregation.",
)
def rollup_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_r(F.sum("l_quantity"), 3).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("l_returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "window_rank_frames",
    f"""
    SELECT c_mktsegment, c_custkey,
           CAST(rank()       OVER w AS INTEGER) AS bal_rank,
           CAST(dense_rank() OVER w AS INTEGER) AS bal_dense_rank,
           {_R('avg(c_acctbal) OVER wf', 6)}    AS moving_avg_bal
    FROM customer
    WINDOW w  AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
           wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frames"),
    description="rank/dense_rank + rows-frame moving average per segment.",
)
def window_rank_frames(spark, sf_dir):
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wf = w.rowsBetween(-2, Window.currentRow)
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        _r(F.avg("c_acctbal").over(wf), 6).alias("moving_avg_bal"),
    )


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "pivot_event_counts",
    f"""
    SELECT user_id % 50 AS user_bucket,
           {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
    FROM events
    GROUP BY 1
    """,
    tags=("pivot", "agg"),
    description="Pivot (wide per-type counts) — one hash agg with conditional counts; "
    "explicit value list keeps the schema static (no discovery scan).",
)
def pivot_event_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 50).alias("user_bucket"))
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(0)
    )


@register(
    "stats_advanced",
    f"""
    SELECT l_returnflag,
           count(*)                                        AS n,
           {_R('stddev_samp(l_quantity)', 6)}              AS std_qty,
           {_R('var_samp(l_quantity)', 6)}                 AS var_qty,
           {_R('covar_samp(l_quantity, l_extendedprice)', 4)} AS covar_qty_price,
           {_R('corr(l_quantity, l_extendedprice)', 6)}    AS corr_qty_price,
           {_R('quantile_cont(l_quantity, 0.5)', 6)}       AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
    description="Higher-moment aggregates: stddev/variance/covariance/correlation + "
    "exact interpolated median per group.",
)
def stats_advanced(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _r(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        _r(F.var_samp("l_quantity"), 6).alias("var_qty"),
        _r(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        _r(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        _r(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
    )


@register(
    "asof_last_purchase",
    """
    WITH u AS (
      SELECT event_id, user_id, ts, 1 AS is_left,
             CAST(NULL AS BIGINT) AS p_id, CAST(NULL AS TIMESTAMP) AS p_ts,
             CAST(NULL AS BIGINT) AS tb
      FROM events
      UNION ALL
      SELECT CAST(NULL AS BIGINT), user_id, ts, 0, event_id, ts, event_id
      FROM events WHERE event_type = 'purchase'
    ), f AS (
      SELECT *,
             last_value(p_id IGNORE NULLS) OVER w AS last_purchase_id,
             last_value(p_ts IGNORE NULLS) OVER w AS last_purchase_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_left, tb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
           last_purchase_id,
           CAST(floor(epoch(ts)) AS BIGINT)
             - CAST(floor(epoch(last_purchase_ts)) AS BIGINT) AS secs_since_purchase
    FROM f WHERE is_left = 1
    """,
    tags=("asof", "window"),
    description="As-of join (operator Spark lacks natively): each event gets the user's "
    "latest purchase at-or-before its timestamp, via the union + forward-fill pattern — "
    "one shuffle on user_id, per-user sort, no range join.",
)
def asof_last_purchase(spark, sf_dir):
    from .operators.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    out = asof_join(
        left,
        right,
        partition_col="user_id",
        left_time="ts",
        right_time="ts",
        payload={"event_id": "last_purchase_id", "ts": "last_purchase_ts"},
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        _epoch_s(F.col("ts")).alias("t_s"),
        "last_purchase_id",
        (_epoch_s(F.col("ts")) - _epoch_s(F.col("last_purchase_ts"))).alias(
            "secs_since_purchase"
        ),
    )


@register(
    "correlated_min_price",
    f"""
    SELECT p.p_partkey, p.p_brand,
           {_R('l.min_price', 3)} AS min_price
    FROM part p
    JOIN (SELECT l_partkey, min(l_extendedprice) AS min_price
          FROM lineitem GROUP BY l_partkey) l
      ON p.p_partkey = l.l_partkey
    WHERE p.p_size > 40
    """,
    tags=("subquery", "join", "agg"),
    description="TPC-H Q2-shaped correlated-minimum pattern: per-key min computed once "
    "(de-correlated into agg + join, which is what Catalyst does to the subquery form).",
)
def correlated_min_price(spark, sf_dir):
    part = _t(spark, sf_dir, "part").where(F.col("p_size") > 40)
    li = _t(spark, sf_dir, "lineitem")
    mins = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    return (
        part.join(mins, part["p_partkey"] == mins["l_partkey"])
        .select("p_partkey", "p_brand", _r(F.col("min_price"), 3).alias("min_price"))
    )


@register(
    "conditional_agg_share",
    f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           {_R("sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0.0 END)", 3)} AS high_prio_revenue,
           {_R('sum(o_totalprice)', 3)} AS total_revenue,
           {_R("sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0.0 END) / sum(o_totalprice)", 6)} AS high_prio_share
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "conditional"),
    description="TPC-H Q14-shaped conditional aggregation: CASE inside sum → per-year "
    "revenue share of high-priority orders, one pass.",
)
def conditional_agg_share(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    hi = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.col("o_totalprice")
    ).otherwise(F.lit(0.0))
    return orders.groupBy(F.year("o_orderdate").alias("yr")).agg(
        _r(F.sum(hi), 3).alias("high_prio_revenue"),
        _r(F.sum("o_totalprice"), 3).alias("total_revenue"),
        _r(F.sum(hi) / F.sum("o_totalprice"), 6).alias("high_prio_share"),
    )


@register(
    "approx_quantiles_sketch",
    """
    SELECT l_returnflag,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
           percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
           CAST(count(*) AS BIGINT) AS n,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "sketch", "quantile"),
    description="percentile_approx (GK sketch, accuracy=10000) quartiles of extended "
    "price per return flag — the sketch path for quantiles at 100 TB. The sketch "
    "estimate itself is engine-specific, so (approx_distinct_sketch pattern) the "
    "hashed output carries the exact percentile_disc quartiles plus booleans "
    "asserting each sketch value lands inside the exact rank window [p-0.01, "
    "p+0.01] — 100× the GK guarantee of 1/accuracy rank error. percentile_disc "
    "is bit-identical between Spark and DuckDB (discrete: an actual data value, "
    "no interpolation), so the exact columns hash-match; a drifting sketch flips "
    "a boolean and fails the gate.",
)
def approx_quantiles_sketch(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")

    def _disc(p):
        return F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY l_extendedprice)"
        )

    agg = li.groupBy("l_returnflag").agg(
        _disc(0.25).alias("p25"),
        _disc(0.5).alias("p50"),
        _disc(0.75).alias("p75"),
        # rank-window bounds: GK guarantees rank error <= n/accuracy = n/10000,
        # far inside the +-0.01 quantile window checked here
        _disc(0.24).alias("p25_lo"),
        _disc(0.26).alias("p25_hi"),
        _disc(0.49).alias("p50_lo"),
        _disc(0.51).alias("p50_hi"),
        _disc(0.74).alias("p75_lo"),
        _disc(0.76).alias("p75_hi"),
        F.percentile_approx("l_extendedprice", 0.25, 10000).alias("a25"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.75, 10000).alias("a75"),
        F.count(F.lit(1)).alias("n"),
    )
    ok = lambda a, lo, hi: (F.col(a) >= F.col(lo)) & (F.col(a) <= F.col(hi))  # noqa: E731
    return agg.select(
        "l_returnflag",
        "p25",
        "p50",
        "p75",
        "n",
        ok("a25", "p25_lo", "p25_hi").alias("p25_ok"),
        ok("a50", "p50_lo", "p50_hi").alias("p50_ok"),
        ok("a75", "p75_lo", "p75_hi").alias("p75_ok"),
    )


@register(
    "histogram_prices",
    """
    SELECT CAST(least(9, greatest(0, floor(l_extendedprice / 11000.0))) AS INTEGER) AS bucket,
           count(*) AS n
    FROM lineitem
    GROUP BY 1
    """,
    tags=("histogram", "agg"),
    description="Fixed-width histogram (10 buckets over [0, 110k]) via portable floor "
    "arithmetic — one hash agg; the building block for distribution profiling.",
)
def histogram_prices(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.least(F.lit(9), F.greatest(F.lit(0), F.floor(F.col("l_extendedprice") / 11000.0))).cast(
        "int"
    )
    return li.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "grouping_sets_id",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           {_R('sum(l_quantity)', 3)} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg", "grouping-sets"),
    description="Explicit GROUPING SETS with grouping_id exposed (same bitmask "
    "convention in Spark and DuckDB: last column = least-significant bit).",
)
def grouping_sets_id(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               floor(sum(l_quantity) * 1e3 + 0.5) / 1e3 AS sum_qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "bigram_top",
    """
    WITH t AS (
      SELECT list_filter(string_split(trim(lower(text)), ' '), x -> x <> '') AS toks
      FROM documents),
    b AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(toks) - 1, 0)),
               i -> concat(toks[i], ' ', toks[i+1]))) AS bigram
      FROM t)
    SELECT bigram, count(*) AS n FROM b
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    tags=("text", "ngram"),
    description="Corpus bigram frequency top-20 (the n-gram LM building block): "
    "bound-token windows → explode → hash agg → ordered limit.",
)
def bigram_top(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    from .functions.text import tokens

    toksed = docs.select(tokens(F.lower(F.col("text"))).alias("__toks"))
    count = F.size("__toks") - 1
    idx = F.when(count < 1, F.array().cast("array<int>")).otherwise(F.sequence(F.lit(1), count))
    bigrams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, 2)))
    return (
        toksed.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "window_distribution_ranks",
    f"""
    SELECT c_mktsegment, c_custkey,
           CAST(ntile(4) OVER w AS INTEGER)     AS bal_quartile,
           {_R('percent_rank() OVER w', 6)}     AS bal_pct_rank,
           {_R('cume_dist() OVER w', 6)}        AS bal_cume_dist,
           first_value(c_custkey) OVER w        AS richest_custkey
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window", "distribution"),
    description="Distribution window functions: ntile/percent_rank/cume_dist + "
    "first_value per segment.",
)
def window_distribution_ranks(spark, sf_dir):
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).alias("bal_quartile"),
        _r(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        _r(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
        F.first("c_custkey").over(w).alias("richest_custkey"),
    )


@register(
    "fuzzy_part_names",
    """
    WITH p AS (SELECT p_partkey, p_brand, p_size, p_name FROM part)
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    """,
    tags=("fuzzy", "entity-resolution", "dedup"),
    description="Entity-resolution fuzzy matching: edit-distance pairs within "
    "(brand, size) blocks — blocking bounds the quadratic term, the standard "
    "record-linkage shape.",
)
def fuzzy_part_names(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size", "p_name")
    a = p.select(
        F.col("p_brand"), F.col("p_size"),
        F.col("p_partkey").alias("part_a"), F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_brand"), F.col("p_size"),
        F.col("p_partkey").alias("part_b"), F.col("p_name").alias("name_b"),
    )
    return (
        a.join(b, ["p_brand", "p_size"])
        .where(F.col("part_a") < F.col("part_b"))
        .select(
            "part_a",
            "part_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 8)
    )


@register(
    "fuzzy_part_names_snm",
    """
    WITH s AS (
      SELECT p_partkey, p_name,
             row_number() OVER (ORDER BY p_name, p_partkey) AS rn
      FROM part)
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM s a JOIN s b ON b.rn BETWEEN a.rn + 1 AND a.rn + 5
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    """,
    tags=("fuzzy", "entity-resolution", "dedup", "scale"),
    description="Output-bounded entity resolution: sorted-neighborhood "
    "method (Hernandez & Stolfo) — sort by name, compare only rank "
    "neighbors within w=5, so candidate pairs are <= w*n (linear) "
    "regardless of blocking-key cardinality. The scale-path companion "
    "to fuzzy_part_names, whose fixed-cardinality (brand,size) blocks "
    "make full-pair output quadratic in corpus size (PLANS.md r12 "
    "adjudication).",
)
def fuzzy_part_names_snm(spark, sf_dir):
    """Distributed SNM without a single-partition global window: range-
    partition by the sort key, then global rank = per-partition
    row_number + the partition's cumulative row offset (an O(#partitions)
    driver-side map — at 1000 executors still trivially small). The
    w-neighborhood band join is re-expressed as explode(sequence(rn+1,
    rn+w)) -> shuffle EQUI-join on rn, so every stage is linear: sort
    O(n log n), candidates exactly w*n, no block-size quadratic term.
    Reference parity: the record-linkage shape (J1/J2 equi-join + U4-ish
    scalar distance), scale-hardened."""
    from pyspark.sql import Window

    w = 5
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = (
        p.repartitionByRange(nparts, "p_name", "p_partkey")
        .withColumn("pid", F.spark_partition_id())
        # the persist is a CORRECTNESS pin, not a perf hint: the range
        # partitioner samples its boundaries, so the counts job below
        # and the ranked frame must see the SAME materialized
        # partitioning or the per-partition offsets could disagree
        # with the ranks. Released by the session's clearCache (bench
        # isolates per query); the eager collect is the O(#partitions)
        # offset map the distributed global rank is built from.
        .persist()
    )
    # O(#partitions) rows to the driver: the cumulative offsets that turn
    # per-partition ranks into a global rank (range partitions are
    # ordered, so pid order IS sort order)
    counts = s.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    offs, acc = [], 0
    for r in sorted(counts, key=lambda r: r["pid"]):
        offs.append((r["pid"], acc))
        acc += r["n"]
    off_df = spark.createDataFrame(offs or [(0, 0)], "pid int, off long")
    ranked = (
        s.withColumn(
            "rn_in",
            F.row_number().over(
                Window.partitionBy("pid").orderBy("p_name", "p_partkey")
            ),
        )
        .join(F.broadcast(off_df), "pid")
        .select(
            "p_partkey", "p_name", (F.col("off") + F.col("rn_in")).alias("rn")
        )
    )
    probe = ranked.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + F.lit(w))
        ).alias("rn"),
    )
    cand = ranked.select(
        F.col("p_partkey").alias("part_b"), F.col("p_name").alias("name_b"), "rn"
    )
    return (
        probe.join(cand, "rn")
        .select(
            "part_a",
            "part_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 8)
    )


@register(
    "merge_upsert_orders",
    f"""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0),
    merged AS (
      SELECT * FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
      UNION ALL
      SELECT * FROM updates)
    SELECT o_orderstatus,
           count(*)                       AS n,
           {_R('sum(o_totalprice)', 3)}   AS total
    FROM merged
    GROUP BY o_orderstatus
    """,
    tags=("merge", "upsert", "cdc"),
    description="MERGE/upsert emulation (anti-join + union — the Delta/Iceberg MERGE "
    "INTO algebra without the table format): 10% of orders updated, result checked via "
    "per-status aggregates.",
)
def merge_upsert_orders(spark, sf_dir):
    from .operators.relational import merge_upsert

    orders = _t(spark, sf_dir, "orders")
    updates = orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    merged = merge_upsert(orders, updates, "o_orderkey")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        _r(F.sum("o_totalprice"), 3).alias("total"),
    )


@register(
    "unpivot_metrics",
    f"""
    WITH wide AS (
      SELECT l_returnflag,
             {_R('sum(l_quantity)', 3)}      AS qty,
             {_R('sum(l_extendedprice)', 3)} AS price,
             {_R('sum(l_discount)', 3)}      AS disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'qty'   AS metric, qty   AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'price' AS metric, price AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'disc'  AS metric, disc  AS value FROM wide
    """,
    tags=("unpivot", "agg"),
    description="Unpivot (wide→long) via stack() — the inverse of pivot_event_counts.",
)
def unpivot_metrics(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        _r(F.sum("l_quantity"), 3).alias("qty"),
        _r(F.sum("l_extendedprice"), 3).alias("price"),
        _r(F.sum("l_discount"), 3).alias("disc"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (metric, value)",
    )


@register(
    "cube_pricing",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           {_R('sum(l_extendedprice)', 3)} AS sum_price,
           count(*)                        AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
    description="CUBE over (flag, status): all 2^2 grouping sets in one aggregation.",
)
def cube_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(_r(F.sum("l_extendedprice"), 3).alias("sum_price"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("l_returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("l_linestatus"),
            "sum_price",
            "n",
        )
    )


@register(
    "having_big_spenders",
    f"""
    SELECT o_custkey,
           count(*)                     AS n_orders,
           {_R('sum(o_totalprice)', 3)} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING sum(o_totalprice) > 2500000.0
    """,
    tags=("agg", "having"),
    description="Post-aggregation HAVING filter (Catalyst: Filter above Aggregate; the "
    "predicate can't push below the agg).",
)
def having_big_spenders(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("__total"))
        .where(F.col("__total") > 2500000.0)
        .select("o_custkey", "n_orders", _r(F.col("__total"), 3).alias("total_spend"))
    )


@register(
    "scalar_functions",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)             AS yr,
           CAST(month(o_orderdate) AS INTEGER)            AS mo,
           CAST(day(o_orderdate) AS INTEGER)              AS dom,
           CAST(quarter(o_orderdate) AS INTEGER)          AS qtr,
           upper(o_orderpriority)                         AS prio_upper,
           substr(o_orderpriority, 1, 1)                  AS prio_code,
           CAST(length(o_orderstatus) AS INTEGER)         AS status_len,
           replace(o_orderpriority, '-', '_')             AS prio_snake,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0')     AS key_padded,
           concat(o_orderstatus, ':', o_orderpriority)    AS status_prio,
           CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    WHERE o_orderpriority LIKE '%URGENT%'
    """,
    tags=("scalar", "string", "date"),
    description="Scalar function surface: date part extraction, string ops, CASE, LIKE — "
    "all JVM expressions inside codegen.",
)
def scalar_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderpriority").like("%URGENT%")).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderstatus").alias("status_len"),
        F.regexp_replace("o_orderpriority", "-", "_").alias("prio_snake"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.concat_ws(":", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.when(F.col("o_totalprice") > 200000.0, F.lit("big")).otherwise(F.lit("small")).alias(
            "size_class"
        ),
    )


@register(
    "tfidf_top_terms",
    f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id,
                   unnest({{toks}}) AS term
            FROM documents)
      GROUP BY doc_id, term),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, {_R('tfidf', 6)} AS tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """.format(toks="list_filter(string_split(trim(lower(text)), ' '), x -> x <> '')"),
    tags=("text", "tfidf"),
    description="Exact TF-IDF (tf × ln(N/df)) top-3 terms per document: explode → two "
    "hash aggs → broadcast df join → per-doc window. HashingTF/IDF (MLlib) is the "
    "approximate scale variant.",
)
def tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window

    from .functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", _r(F.col("tfidf"), 6).alias("tfidf"), "rnk")
    )


@register(
    "approx_distinct_sketch",
    """
    SELECT c_mktsegment,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           TRUE AS approx_ok
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("agg", "sketch"),
    description="approx_count_distinct (HyperLogLog++, rsd=2%) per segment — the "
    "sketch-based path for distinct counts at 100 TB; exact twin: agg_distinct. "
    "The HLL estimate itself is engine-specific, so the hashed output carries the "
    "exact distinct count plus a boolean asserting the sketch landed within 3×rsd "
    "of it — the oracle pins that boolean to TRUE, so a drifting sketch fails the "
    "hash gate.",
)
def approx_distinct_sketch(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    agg = joined.groupBy("c_mktsegment").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.count_distinct("o_custkey").alias("exact_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    tol = F.greatest(F.lit(10.0), F.col("exact_customers") * (3 * 0.02))
    return agg.select(
        "c_mktsegment",
        "exact_customers",
        "n_orders",
        (F.abs(F.col("approx_customers") - F.col("exact_customers")) <= tol).alias("approx_ok"),
    )


@register(
    "global_error_metrics",
    f"""
    SELECT count(*) AS n,
           {_R('avg(abs(l_quantity - pred))', 6)}                        AS mae,
           {_R('sqrt(avg((l_quantity - pred) * (l_quantity - pred)))', 6)} AS rmse
    FROM (
      SELECT l_quantity,
             least(50.0, greatest(1.0, l_quantity * 0.9 + 2.0)) AS pred
      FROM lineitem)
    """,
    tags=("A5", "A6", "A7", "M2", "U1", "U4"),
    description="Global n/MAE/RMSE in one pass with a clamped predictor column "
    "(reference computed these with accumulators + reduce, lines 388-393,465-470).",
)
def global_error_metrics(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    pred = clamp(F.col("l_quantity") * 0.9 + 2.0, 1.0, 50.0)
    err = F.col("l_quantity") - pred
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        _r(F.avg(F.abs(err)), 6).alias("mae"),
        _r(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
    )


@register(
    "sliding_window_agg",
    f"""
    WITH s AS (
      -- make_timestamp(micros) yields a NAIVE timestamp, so the strftime
      -- below renders identically on any verifier-host TimeZone
      -- (to_timestamp returns TIMESTAMPTZ and rendered in session TZ)
      SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000) AS w0,
             event_type, value
      FROM events),
    e AS (
      SELECT w0 AS wstart, event_type, value FROM s
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE AS wstart, event_type, value FROM s)
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)              AS n_events,
           {_R('sum(value)', 4)} AS sum_value
    FROM e
    GROUP BY 1, 2
    """,
    tags=("window", "sliding", "streaming-batch-twin"),
    description="Hopping window (1h width / 30m slide): each event lands in exactly "
    "two epoch-aligned windows. Spark's F.window(slideDuration) vs an explicit "
    "2-replica union oracle — the batch twin of a sliding streaming agg.",
)
def sliding_window_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), _r(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "top_revenue_customers",
    f"""
    SELECT c_custkey, c_name,
           count(DISTINCT o_orderkey)                        AS n_orders,
           {_R("CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)", 3)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J1", "J3", "agg", "topk"),
    description="TPC-H Q10-shaped returned-item revenue ranking: selective fact "
    "filter, broadcast dim join, hash agg, deterministic ordered limit "
    "(revenue DESC, custkey tiebreak).",
)
def top_revenue_customers(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            # decimal accumulation: exact, order-independent across partial aggs —
            # double sums of ~100 addends land on .xxx5 rounding boundaries
            _r(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
                .cast("double"),
                3,
            ).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "range_band_join",
    f"""
    WITH bands AS (
      SELECT CAST(i AS INTEGER)  AS band,
             i * 11000.0         AS lo,
             CASE WHEN i = 9 THEN 1e18 ELSE (i + 1) * 11000.0 END AS hi
      FROM range(10) t(i))
    SELECT band,
           count(*)                          AS n,
           {_R('sum(l_extendedprice)', 3)}   AS sum_price
    FROM lineitem JOIN bands
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
    tags=("join", "range-join", "interval"),
    description="Non-equi interval join: fact rows against a tiny broadcast band "
    "table on [lo, hi) range predicates (BroadcastNestedLoopJoin — the generic "
    "range-join path; at scale, bin the probe side first to recover an equi-join).",
)
def range_band_join(spark, sf_dir):
    bands = (
        spark.range(10)
        .select(
            F.col("id").cast("int").alias("band"),
            (F.col("id") * 11000.0).alias("lo"),
            F.when(F.col("id") == 9, F.lit(1e18)).otherwise((F.col("id") + 1) * 11000.0).alias("hi"),
        )
    )
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo")) & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.sum("l_extendedprice"), 3).alias("sum_price"))
    )


@register(
    "interval_overlap_join",
    """
    WITH items AS (
      SELECT l_suppkey AS k,
             l_orderkey * 10 + l_linenumber AS iid,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(l_shipdate AS DATE)) AS BIGINT) AS s,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(l_shipdate AS DATE)) AS BIGINT)
               + (l_linenumber % 5) + 1 AS e
      FROM lineitem
    )
    SELECT a.k AS l_suppkey,
           count(*) AS n_pairs,
           CAST(sum(least(a.e, b.e) - greatest(a.s, b.s) + 1) AS BIGINT)
             AS overlap_days
    FROM items a JOIN items b
      ON a.k = b.k AND a.iid < b.iid AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.k
    """,
    tags=("join", "interval-join", "overlap"),
    description="Self interval-OVERLAP join, distributed without a "
    "cartesian: per-supplier shipping windows [s, e] (day grain, "
    "deterministic synthetic length from l_linenumber) matched where "
    "the intervals intersect. Each interval explodes to the 7-day "
    "buckets it covers (<=2, since max length 6 < 7), the self-join "
    "runs as an EQUI-join on (supplier, bucket), and a pair counts "
    "only in its canonical bucket — the one containing the overlap "
    "start, floor(greatest(s_a, s_b)/7) — so straddling pairs are "
    "never double-counted. The oracle replays the quadratic "
    "per-supplier self-join directly; equality proves the bucketed "
    "decomposition is exact. At 100 TB the shuffle carries "
    "O(rows * ceil(len/W)) bucket copies and each join partition is a "
    "(supplier, week) cell — the standard distributed interval-join "
    "shape (bucket width tunes copy factor vs cell size); no "
    "BroadcastNestedLoop, plan-fingerprinted. Companion: "
    "range_band_join (static bands), asof_last_purchase (as-of).",
)
def interval_overlap_join(spark, sf_dir):
    from .operators.relational import interval_overlap_pairs

    # bucket width 7 (days) > max interval length 6: <=2 buckets/row
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("k"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iid"),
            # calendar-day number, timezone-free: NTZ -> DATE keeps the
            # naive fields on both engines
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).cast("long").alias("s"),
            F.col("l_linenumber").alias("ln"),
        )
        .withColumn("e", (F.col("s") + F.col("ln") % 5 + 1).cast("long"))
        .drop("ln")
    )
    pairs = interval_overlap_pairs(
        items, key="k", id_col="iid", start="s", end="e", bucket_width=7
    )
    return pairs.groupBy(F.col("k").alias("l_suppkey")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("overlap_len").cast("long").alias("overlap_days"),
    )


@register(
    "user_event_sequences",
    """
    SELECT user_id,
           CAST(count(*) AS INTEGER) AS n_events,
           md5(string_agg(event_type, ',' ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)) AS seq_hash
    FROM events
    GROUP BY user_id
    """,
    tags=("pipeline", "sequence", "agg"),
    description="Per-user ordered event sequences (next-event-prediction training "
    "examples): collect_list of (t, event_id, type) structs, array_sort for the "
    "deterministic order, fingerprint the joined sequence. One shuffle on user_id; "
    "the struct sort replaces a per-user window sort.",
)
def user_event_sequences(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    _epoch_s(F.col("ts")).alias("t"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("et"),
                )
            )
        ).alias("s")
    )
    seq_str = F.concat_ws(",", F.transform(F.col("s"), lambda x: x["et"]))
    return s.select(
        "user_id",
        F.size("s").alias("n_events"),
        F.md5(seq_str).alias("seq_hash"),
    )


@register(
    "salted_join_totals",
    f"""
    SELECT p_brand,
           count(*) AS n_items,
           {_R("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)", 3)} AS sum_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=("join", "skew", "salting"),
    description="Skew-salted equi-join (deterministic xxhash64 salt spreads hot "
    "keys over 8 buckets, small side replicated per salt) feeding a per-brand "
    "rollup — result provably identical to the plain join, which is exactly what "
    "the oracle replays. The manual fallback for skew AQE can't split.",
)
def salted_join_totals(spark, sf_dir):
    from .operators.relational import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pt = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    return (
        salted_join(li, pt, "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _r(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double"), 3).alias(
                "sum_price"
            ),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H completion batch: every remaining TPC-H query expressible over the
# driver fixtures (no partsupp table; no l_commitdate/l_receiptdate/
# l_shipmode/c_phone columns — those queries are adapted to the columns that
# exist, keeping the operator shape: semi/anti joins, correlated-subquery
# de-correlation, distinct aggs, OR-of-ANDs pushdown, left-join count
# distributions). Float discipline: revenue sums accumulate in DECIMAL(18,6)
# (order-independent), then cast to double and portable-round.
# ---------------------------------------------------------------------------


def _dsum(expr):
    """Order-independent sum of a double expression: accumulate as
    DECIMAL(18,6) (exact, commutative at any parallelism) then cast back."""
    return F.sum(expr.cast("decimal(18,6)")).cast("double")


def _DS(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "exists", "tpch"),
    description="TPC-H Q4-shaped order-priority check: EXISTS decorrelated to a "
    "left-semi join with a non-equi residual (l_shipdate > o_orderdate). At scale "
    "the semi join shuffles on orderkey once; the agg output is 5 rows.",
)
def q04_order_priority(spark, sf_dir):
    ords = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    kept = ords.join(
        li,
        (ords.o_orderkey == li.l_orderkey) & (li.l_shipdate > ords.o_orderdate),
        "left_semi",
    )
    return kept.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q06_revenue_forecast",
    f"""
    SELECT {_R(_DS("l_extendedprice * l_discount"), 3)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "tpch"),
    description="TPC-H Q6 forecast-revenue change: pure scan→filter→agg; all four "
    "predicates push to parquet (min/max pruning on shipdate at scale), single "
    "scalar out.",
)
def q06_revenue_forecast(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r(_dsum(F.col("l_extendedprice") * F.col("l_discount")), 3).alias("revenue"))
    )


@register(
    "q07_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {_R(_DS("volume"), 3)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "broadcast", "tpch"),
    description="TPC-H Q7 volume shipping between two nations: fact table joins "
    "orders (shuffle) then all dims broadcast; the nation-pair disjunction is "
    "applied post-join on broadcast-joined names. One agg shuffle.",
)
def q07_volume_shipping(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_r(_dsum(_rev()), 3).alias("revenue"))
    )


@register(
    "q08_market_share",
    f"""
    SELECT o_year,
           {_R("CAST(sum(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)"
               " / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)", 6)} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "broadcast", "agg", "tpch"),
    description="TPC-H Q8 national market share: star join (part/customer/nation/"
    "region/supplier all broadcast, orders shuffle-joined to the fact), share = "
    "conditional decimal sum / total decimal sum per order-year.",
)
def q08_market_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE").select("r_regionkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _rev().alias("volume")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "nation")
    )
    target = F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    return joined.groupBy("o_year").agg(
        _r(_dsum(target) / _dsum(F.col("volume")), 6).alias("mkt_share")
    )


@register(
    "q09_product_profit",
    f"""
    SELECT nation, o_year, {_R(_DS("volume"), 3)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL} AS volume
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("join", "broadcast", "like", "tpch"),
    description="TPC-H Q9-shaped product profit by supplier nation and order year "
    "(no partsupp table in the fixtures, so profit = discounted revenue): LIKE "
    "filter pushed into the broadcast part dim, fact shuffles once for orders, "
    "one agg shuffle.",
)
def q09_product_profit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%")).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n_key"), F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_key"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(_r(_dsum(_rev()), 3).alias("sum_profit"))
    )


@register(
    "q12_priority_lines",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("join", "conditional-agg", "tpch"),
    description="TPC-H Q12-shaped priority line accounting (fixtures have no "
    "l_shipmode; grouped by l_linestatus instead): shuffle join on orderkey, "
    "conditional CASE counts with map-side partials.",
)
def q12_priority_lines(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    ).select("l_orderkey", "l_linestatus")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "outer", "agg", "tpch"),
    description="TPC-H Q13 customer order-count distribution: left outer join "
    "with a residual predicate (kept customers with zero matches count as 0 via "
    "count(col) null-skipping), then a second distribution agg. Two shuffles.",
)
def q13_order_distribution(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    ords = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    return (
        cust.join(ords, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST({_REV_SQL} AS DECIMAL(18,6))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, {_R("CAST(total_rev AS DOUBLE)", 3)} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    tags=("agg", "subquery", "tpch"),
    description="TPC-H Q15 top supplier: quarterly revenue per supplier in exact "
    "DECIMAL (order-independent, so the max-equality test is deterministic at any "
    "parallelism), scalar-subquery max decorrelated to a broadcast of the 1-row "
    "max, supplier dim broadcast.",
)
def q15_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev().cast("decimal(18,6)")).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", _r(F.col("total_rev").cast("double"), 3).alias("total_revenue"))
    )


@register(
    "q16_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "distinct-agg", "tpch"),
    description="TPC-H Q16-shaped supplier-count per part attribute (fixtures "
    "have no partsupp; supplier relationships come from lineitem): broadcast "
    "part dim with IN-list + <> pushed down, two-phase distinct aggregation.",
)
def q16_supplier_counts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    f"""
    WITH part_avg AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {_R("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0", 3)} AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
    """,
    tags=("join", "correlated", "tpch"),
    description="TPC-H Q17 small-quantity-order revenue: the correlated per-part "
    "avg subquery decorrelated into a per-part WINDOW average computed AFTER the "
    "brand filter — the filter is part-level, so the broadcast semi-reduction "
    "keeps each surviving part's complete row set and the window average is "
    "identical to the whole-table one (exact decimal sum / count). One shuffle "
    "on l_partkey over the ~4%-selectivity slice replaces aggregate-all-parts + "
    "self-join (the naive decorrelation aggregates the full fact table before "
    "the filter can cut anything — measured 1.5-superlinear at sf10 from "
    "per-task hash-agg spill at 2M groups; this shape re-measured ~linear).",
)
def q17_small_qty_revenue(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select("p_partkey")
    li_b3 = li.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li_b3.withColumn("avg_qty", avg_qty)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            _r(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0, 3
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_volume_customers",
    f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_date_s,
           {_R("o_totalprice", 3)} AS o_totalprice,
           {_R("sum(l_quantity)", 3)} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 350
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("join", "having", "semi", "tpch"),
    description="TPC-H Q18 large-volume customers: the IN-subquery becomes a "
    "pre-agg + semi join (sum(l_quantity) is exact — integer-valued doubles), "
    "then fact re-join and per-order rollup. Quantity sums are order-independent.",
)
def q18_volume_customers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .where(F.col("tq") > 350)
        .select("l_orderkey")
    )
    ords = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    li2 = li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "bk")),
                  F.col("l_orderkey") == F.col("bk"), "left_semi")
    return (
        li2.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_r(F.sum("l_quantity"), 3).alias("sum_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            _epoch_s(F.col("o_orderdate").cast("timestamp")).alias("o_date_s"),
            _r(F.col("o_totalprice"), 3).alias("o_totalprice"),
            "sum_qty",
        )
    )


@register(
    "q19_banded_revenue",
    f"""
    SELECT {_R(_DS(_REV_SQL), 3)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "or-of-ands", "tpch"),
    description="TPC-H Q19 discounted revenue over OR-of-ANDs bands: the "
    "disjunction spans both sides of the join, so it stays a post-join residual; "
    "per-side implied predicates (p_size<=35, l_quantity<=30) still prune.",
)
def q19_banded_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bands = (
        ((brand == "Brand#12") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#3") & size.between(1, 25) & qty.between(10, 20))
        | ((brand == "Brand#14") & size.between(1, 35) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(bands)
        .agg(_r(_dsum(_rev()), 3).alias("revenue"))
    )


@register(
    "q21_sole_returner",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    tags=("join", "semi", "anti", "exists", "tpch"),
    description="TPC-H Q21-shaped sole-returning-supplier count (fixtures lack "
    "l_receiptdate, so 'kept waiting' becomes 'only supplier with returns on a "
    "multi-supplier finished order'): EXISTS → left-semi with non-equi residual, "
    "NOT EXISTS → left-anti, both self-joins on orderkey.",
)
def q21_sole_returner(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    ords = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    ).alias("l3")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    waiting = (
        l1.join(ords, F.col("l1.l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("k2")) & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("k3")) & (F.col("l1.l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_rich_customers",
    f"""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrygroup,
           count(*) AS numcust,
           {_R("CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)", 3)} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY cntrygroup
    """,
    tags=("anti", "subquery", "agg", "tpch"),
    description="TPC-H Q22-shaped idle-rich-customer analysis (fixtures lack "
    "c_phone; country code becomes nationkey%5, and 'no orders' becomes 'no "
    "urgent orders' since every fixture customer has orders): scalar-avg "
    "decorrelated to a broadcast 1-row cross join, NOT EXISTS → left-anti join. "
    "Average uses exact decimal sum so the > threshold is engine-portable.",
)
def q22_idle_rich_customers(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrygroup"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r(F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 3).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Events-pipeline + join-breadth additions
# ---------------------------------------------------------------------------


@register(
    "json_typed_stats",
    f"""
    SELECT event_type,
           count(k) AS n_with_k,
           CAST(min(k) AS INTEGER) AS min_k,
           CAST(max(k) AS INTEGER) AS max_k,
           {_R("CAST(sum(CAST(k AS DECIMAL(18,6))) AS DOUBLE) / count(k)", 6)} AS avg_k
    FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k
          FROM events)
    GROUP BY event_type
    """,
    tags=("json", "schema", "agg"),
    description="Typed JSON parsing: from_json with an explicit schema (the "
    "scale path — one parse per row into a typed struct, vs per-field "
    "get_json_object re-parses) feeding per-type stats; decimal-accumulated "
    "average for engine portability.",
)
def json_typed_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            _r(F.sum(F.col("k").cast("decimal(18,6)")).cast("double") / F.count("k"), 6).alias(
                "avg_k"
            ),
        )
    )


@register(
    "event_transitions",
    """
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    tags=("window", "sequence", "pipeline"),
    description="Per-user event-type transition matrix (Markov bigram counts — "
    "next-event-prediction training statistics): lag window per user (one "
    "shuffle on user_id, per-key sort) then a global pair count.",
)
def event_transitions(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type"), F.lag("event_type").over(w).alias("prev_type")
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "event_throttle_dedup",
    """
    SELECT event_type,
           count(*) AS total,
           sum(CASE WHEN prev_s IS NULL OR epoch_s - prev_s >= 300 THEN 1 ELSE 0 END) AS kept
    FROM (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
             lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_s
      FROM events)
    GROUP BY event_type
    """,
    tags=("window", "dedup", "streaming-shaped"),
    description="Throttle/rate-limit dedup (keep an event only if the previous "
    "one of the same (user, type) is ≥5 min older — the batch twin of streaming "
    "drop-duplicates-within-watermark): lag window on the composite key, "
    "conditional count. One shuffle.",
)
def event_throttle_dedup(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    e = ev.select(
        "event_type",
        _epoch_s(F.col("ts")).alias("epoch_s"),
        F.lag(_epoch_s(F.col("ts"))).over(w).alias("prev_s"),
    )
    keep = F.col("prev_s").isNull() | (F.col("epoch_s") - F.col("prev_s") >= 300)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("kept"),
    )


@register(
    "event_time_features",
    f"""
    SELECT CAST(strftime(ts, '%w') AS INTEGER) AS dow,
           CAST(hour(ts) AS INTEGER) AS hod,
           count(*) AS n_events,
           {_R("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 4)} AS avg_value
    FROM events
    GROUP BY dow, hod
    """,
    tags=("date", "features", "agg"),
    description="Cyclic time features (day-of-week × hour-of-day activity grid "
    "for temporal train-data features): date-part extraction stays in codegen; "
    "decimal-accumulated mean. Spark dayofweek is 1-based Sunday, strftime %w "
    "0-based Sunday — normalised to 0=Sunday on both sides.",
)
def event_time_features(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).alias("dow"), F.hour("ts").alias("hod")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r(F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_value"
            ),
        )
    )


@register(
    "full_outer_reconcile",
    """
    SELECT n_nationkey AS nationkey,
           coalesce(c_cnt, 0) AS n_customers,
           coalesce(s_cnt, 0) AS n_suppliers
    FROM nation
    LEFT JOIN (SELECT c_nationkey, count(*) AS c_cnt FROM customer GROUP BY c_nationkey) c
      ON n_nationkey = c_nationkey
    LEFT JOIN (SELECT s_nationkey, count(*) AS s_cnt FROM supplier GROUP BY s_nationkey) s
      ON n_nationkey = s_nationkey
    """,
    tags=("join", "outer", "agg"),
    description="Entity reconciliation across dimensions: pre-aggregate each side "
    "(count per nation) THEN outer-join the tiny rollups — never outer-join raw "
    "fact tables when only aggregates are needed. Nulls from missing sides "
    "coalesce to 0.",
)
def full_outer_reconcile(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    return (
        nation.join(F.broadcast(c), F.col("nationkey") == F.col("ck"), "left_outer")
        .join(F.broadcast(s), F.col("nationkey") == F.col("sk"), "left_outer")
        .select(
            "nationkey",
            F.coalesce(F.col("c_cnt"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("s_cnt"), F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
    """,
    tags=("setop",),
    description="INTERSECT (distinct): customers active in both 1996 and 1999 — "
    "completes the set-op surface (union/except/intersect). Catalyst plans a "
    "left-semi join over distincts.",
)
def set_intersect(spark, sf_dir):
    ords = _t(spark, sf_dir, "orders")

    def year_of(y):
        return ords.where(
            (F.col("o_orderdate") >= _ts(f"{y}-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts(f"{y + 1}-01-01 00:00:00"))
        ).select("o_custkey")

    return year_of(1996).intersect(year_of(1999))


@register(
    "click_purchase_attribution",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_s
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    tags=("join", "interval", "attribution", "streaming-shaped"),
    description="Click→purchase attribution (same user, purchase within 1h of "
    "the click): equi-join on user_id with an event-time range residual — the "
    "batch twin of the streaming stream-stream interval join "
    "(streaming/jobs.py::stream_click_attribution). One shuffle on user_id.",
)
def click_purchase_attribution(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (_epoch_s(F.col("p_ts")) - _epoch_s(F.col("c_ts"))).alias("gap_s"),
    )


@register(
    "grouped_ols_trend",
    f"""
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS x,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS yr
      FROM events),
    s AS (
      SELECT event_type, count(*) AS n, sum(x) AS sx, sum(yr) AS sy,
             sum(x * yr) AS sxy, sum(x * x) AS sxx
      FROM b GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           {_R("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 1e6", 9)} AS slope_per_s
    FROM s
    """,
    tags=("pandas-udf", "grouped-map", "ml"),
    description="Per-group OLS trend (value vs event time) via applyInPandas — "
    "the Arrow grouped-map escape hatch, exercised on semantics a GROUP BY can "
    "also express so the Python path has an EXACT oracle: all sums are exact "
    "integers (epoch seconds × 1e-6-quantised values; Python unbounded ints ↔ "
    "DuckDB HUGEINT), and both engines cast numerator/denominator to double "
    "before one IEEE division. Proves Arrow batch plumbing is bit-reproducible, "
    "not just approximately right.",
)
def grouped_ols_trend(spark, sf_dir):
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        _epoch_s(F.col("ts")).alias("x"),
        F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("yr"),
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact integer accumulation (Python ints are unbounded — x*x sums
        # overflow int64, which is why this avoids pandas' int64 .sum())
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["yr"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        # cast-then-divide mirrors DuckDB (double division of two exact ints)
        slope = (float(n * sxy - sx * sy) / float(n * sxx - sx * sx)) / 1e6
        import math

        slope = math.floor(slope * 1e9 + 0.5) / 1e9
        return pd.DataFrame(
            {"event_type": [pdf["event_type"].iloc[0]], "n": [n], "slope_per_s": [slope]}
        )

    return ev.groupBy("event_type").applyInPandas(
        ols, "event_type string, n long, slope_per_s double"
    )


@register(
    "kfold_assignment",
    """
    SELECT fold, count(*) AS n_rows, count(DISTINCT o_custkey) AS n_customers
    FROM (SELECT o_custkey,
                 CAST(CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS INTEGER) AS fold
          FROM orders)
    GROUP BY fold
    """,
    tags=("ml-prep", "sampling", "hash"),
    description="Deterministic k-fold split assignment (k=5) by portable hash of "
    "the example key — reproducible train/validation folds with no RNG state, "
    "the split recomputable by any engine (the property randomSplit lacks). "
    "Per-fold row and entity counts as the audit output.",
)
def kfold_assignment(spark, sf_dir):
    from .functions.hashing import portable_hash64

    ords = _t(spark, sf_dir, "orders")
    return (
        ords.select(
            "o_custkey",
            (portable_hash64(F.col("o_orderkey")) % 5).cast("int").alias("fold"),
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "negative_samples",
    """
    WITH purchased AS (
      SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    candidates AS (
      SELECT c.c_custkey AS custkey, p.p_partkey AS partkey,
             CAST(concat('0x', substr(md5(concat(CAST(c.c_custkey AS VARCHAR), '|', CAST(p.p_partkey AS VARCHAR))), 1, 8)) AS BIGINT) AS h
      FROM customer c CROSS JOIN part p
      WHERE c.c_custkey <= 10),
    unseen AS (
      SELECT cd.custkey, cd.partkey, cd.h
      FROM candidates cd
      WHERE NOT EXISTS (SELECT 1 FROM purchased pu
                        WHERE pu.custkey = cd.custkey AND pu.partkey = cd.partkey))
    SELECT custkey, partkey
    FROM (SELECT custkey, partkey,
                 row_number() OVER (PARTITION BY custkey ORDER BY h, partkey) AS rn
          FROM unseen)
    WHERE rn <= 5
    """,
    tags=("ml-prep", "anti", "sampling", "recsys"),
    description="Negative sampling for contrastive/recsys training: per user, "
    "5 items they never purchased, chosen by a deterministic md5 permutation "
    "(reproducible negatives, no RNG). Shape: small user slice × broadcast item "
    "dim, anti-join against the interaction set, per-user top-k window. At "
    "scale the candidate fan-out is bounded per user (sample-then-anti-join), "
    "never a full cross product.",
)
def negative_samples(spark, sf_dir):
    from pyspark.sql import Window

    from .functions.hashing import portable_hash64

    purchased = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.col("o_custkey").alias("p_custkey"), F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    users = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 10).select(
        F.col("c_custkey").alias("custkey")
    )
    items = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    cand = users.crossJoin(F.broadcast(items)).withColumn(
        "h",
        portable_hash64(
            F.concat(F.col("custkey").cast("string"), F.lit("|"), F.col("partkey").cast("string"))
        ),
    )
    unseen = cand.join(
        purchased,
        (F.col("custkey") == F.col("p_custkey")) & (F.col("partkey") == F.col("p_partkey")),
        "left_anti",
    )
    w = Window.partitionBy("custkey").orderBy("h", "partkey")
    return (
        unseen.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("custkey", "partkey")
    )


@register(
    "cohort_retention",
    """
    SELECT cohort_year, order_year, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM (
      SELECT o_custkey,
             CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(min(year(o_orderdate)) OVER (PARTITION BY o_custkey) AS INTEGER) AS cohort_year
      FROM orders)
    GROUP BY cohort_year, order_year
    """,
    tags=("window", "cohort", "agg"),
    description="Cohort retention matrix: customer cohort = first-order year "
    "(min-over-window, one shuffle on custkey), crossed with activity year. "
    "The unbounded min window needs no sort — min is frame-free.",
)
def cohort_retention(spark, sf_dir):
    from pyspark.sql import Window

    ords = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("order_year")
    )
    w = Window.partitionBy("o_custkey")
    return (
        ords.withColumn("cohort_year", F.min("order_year").over(w))
        .groupBy("cohort_year", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "event_funnel",
    """
    SELECT
      count(*) AS n_users,
      sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS signed_up,
      sum(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup THEN 1 ELSE 0 END) AS clicked_after,
      sum(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup AND t_purchase > t_click
               THEN 1 ELSE 0 END) AS purchased_after
    FROM (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_signup,
             min(CASE WHEN event_type = 'click' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_purchase
      FROM events GROUP BY user_id)
    """,
    tags=("funnel", "conditional-agg", "pipeline"),
    description="Ordered signup→click→purchase funnel: one hash agg computes "
    "per-user first-touch times (conditional min — no joins, no windows), one "
    "scalar agg folds the ordering predicates. Two shuffles total regardless "
    "of event volume.",
)
def event_funnel(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")

    def first_t(kind):
        return F.min(
            F.when(F.col("event_type") == kind, _epoch_s(F.col("ts")))
        ).alias(f"t_{kind}")

    per_user = ev.groupBy("user_id").agg(
        first_t("signup"), first_t("click"), first_t("purchase")
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(signed.cast("int")).alias("signed_up"),
        F.sum(clicked.cast("int")).alias("clicked_after"),
        F.sum(purchased.cast("int")).alias("purchased_after"),
    )


@register(
    "revenue_share_by_nation",
    f"""
    SELECT n_name AS nation,
           {_R("CAST(rev AS DOUBLE)", 3)} AS revenue,
           {_R("CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE)", 6)} AS share
    FROM (
      SELECT n_name, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY n_name)
    """,
    tags=("window", "share", "agg"),
    description="Percent-of-total: per-nation revenue share via an unpartitioned "
    "sum window — run AFTER aggregation, over the 25-row rollup, never the fact "
    "table. Decimal accumulation keeps the shares order-independent.",
)
def revenue_share_by_nation(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n_key"), F.col("n_name").alias("nation")
    )
    rolled = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_key"))
        .groupBy("nation")
        .agg(F.sum(_rev().cast("decimal(18,6)")).alias("rev"))
    )
    total = F.sum("rev").over(Window.partitionBy())
    return rolled.select(
        "nation",
        _r(F.col("rev").cast("double"), 3).alias("revenue"),
        _r(F.col("rev").cast("double") / total.cast("double"), 6).alias("share"),
    )


@register(
    "inter_event_gap_quantiles",
    """
    SELECT event_type,
           count(*) AS n_gaps,
           CAST(min(gap_s) AS BIGINT) AS min_gap,
           CAST(floor(median(gap_s) * 1e3 + 0.5) / 1e3 AS DOUBLE) AS median_gap,
           CAST(max(gap_s) AS BIGINT) AS max_gap
    FROM (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_s
      FROM events)
    WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
    tags=("window", "quantile", "stats"),
    description="Inter-event gap distribution per type (session/engagement "
    "statistics): per-(user, type) lag over integer epoch seconds, exact median "
    "over the gaps. Integer gaps make the percentile interpolation "
    "engine-portable (the .5 midpoint of two ints is exact in doubles).",
)
def inter_event_gap_quantiles(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (_epoch_s(F.col("ts")) - F.lag(_epoch_s(F.col("ts"))).over(w)).alias("gap_s"),
        )
        .where(F.col("gap_s").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").alias("min_gap"),
        (F.floor(F.expr("percentile(gap_s, 0.5)") * 1e3 + 0.5) / 1e3).alias("median_gap"),
        F.max("gap_s").alias("max_gap"),
    )


@register(
    "q11_important_parts",
    f"""
    WITH pv AS (
      SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS val
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT CAST(sum(val) AS DOUBLE) AS total FROM pv)
    SELECT l_partkey, {_R("CAST(val AS DOUBLE)", 3)} AS part_value
    FROM pv, t
    WHERE CAST(val AS DOUBLE) > total * 0.00065
    """,
    tags=("agg", "subquery", "having", "tpch"),
    description="TPC-H Q11-shaped important-stock scan (fixtures have no "
    "partsupp; value = lineitem revenue per part): per-part decimal rollup, "
    "scalar-subquery total decorrelated to a broadcast 1-row cross join, "
    "fraction-of-total HAVING as a deterministic double comparison of exact "
    "decimal sums. The total is the FLAT decimal sum over the fact table — "
    "decimal addition is exact and associative, so it equals the oracle's "
    "sum-of-per-part-sums bit-for-bit while skipping a second 2M-group "
    "hash aggregate (Spark plans no ReusedExchange across the two "
    "branches; measured 1.18 superlinear at sf10 before, spill-onset of "
    "the doubled wide-group agg).",
)
def q11_important_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("val")
    )
    total = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double").alias("total")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("val").cast("double") > F.col("total") * 0.00065)
        .select("l_partkey", _r(F.col("val").cast("double"), 3).alias("part_value"))
    )


@register(
    "q02_min_cost_supplier",
    f"""
    WITH supply AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name, pk, unit_cost
      FROM supply
        JOIN part     ON p_partkey = pk
        JOIN supplier ON s_suppkey = sk
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE p_type = 'STANDARD' AND p_size < 25 AND r_name = 'EUROPE'
    ),
    best AS (
      SELECT *, min(unit_cost) OVER (PARTITION BY pk) AS best_cost FROM eu
    )
    SELECT s_acctbal, s_name, n_name, pk AS p_partkey,
           {_R('unit_cost', 6)} AS supply_cost
    FROM best WHERE unit_cost = best_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "window", "subquery", "tpch"),
    description="TPC-H Q2-shaped min-cost supplier (fixtures have no partsupp; "
    "the supply relation is the observed min unit price per (part, supplier) "
    "from lineitem): the correlated per-part min subquery is decorrelated to a "
    "window min (one extra exchange instead of a self-join), region/nation/part "
    "dims broadcast, top-100 via TakeOrderedAndProject. Float-safe: the "
    "min-equality compares identical IEEE doubles on both engines; rounding is "
    "display-only.",
)
def q02_min_cost_supplier(spark, sf_dir):
    from pyspark.sql import Window

    supply = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 25)
    ).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal", "s_name", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE").select("r_regionkey")
    eu = (
        supply.join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    best = eu.withColumn("best_cost", F.min("unit_cost").over(Window.partitionBy("pk")))
    return (
        best.where(F.col("unit_cost") == F.col("best_cost"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("pk").alias("p_partkey"),
            _r(F.col("unit_cost"), 6).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
           {_R(_DS(_REV_SQL), 3)} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
    description="TPC-H Q10 returned-item reporting: top-20 customers by lost "
    "revenue in a quarter. Fact-side filters (quarter, returnflag) pushed to "
    "the scans, orders->lineitem shuffle join, customer+nation broadcast, "
    "decimal-accumulated revenue (order-independent), TakeOrderedAndProject "
    "with a c_custkey tiebreak for a deterministic LIMIT.",
)
def q10_returned_items(spark, sf_dir):
    ords = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment"
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(_r(_dsum(_rev()), 3).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT {_R(
        "100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN " + _REV_SQL +
        " ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) / " + _DS(_REV_SQL), 6)}
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("join", "conditional-agg", "tpch"),
    description="TPC-H Q14 promo revenue share: one month of lineitem (filter "
    "pushed to scan), part dim broadcast, both the conditional and total "
    "revenue sums accumulated in DECIMAL(18,6) so the single-row ratio is "
    "bit-identical at any parallelism.",
)
def q14_promo_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _r(100.0 * _dsum(promo) / _dsum(_rev()), 6).alias("promo_revenue_pct")
        )
    )


@register(
    "q20_excess_shippers",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    dominant AS (
      SELECT l_suppkey FROM (
        SELECT l_suppkey, l_partkey, qty,
               sum(qty) OVER (PARTITION BY l_partkey) AS part_total
        FROM shipped
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      ) WHERE qty > 0.3 * part_total
    )
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          JOIN region ON n_regionkey = r_regionkey
                          WHERE r_name = 'ASIA')
    ORDER BY s_name
    """,
    tags=("join", "semi", "window", "subquery", "tpch"),
    description="TPC-H Q20-shaped excess shippers (fixtures have no partsupp: "
    "'availqty > half of shipped' becomes 'supplier ships >30% of a widget "
    "part's yearly volume'): the nested IN-subqueries decorrelate to broadcast "
    "semi joins, the correlated per-part total to a window sum. Quantities "
    "accumulate in DECIMAL so the >30% comparison sees identical doubles on "
    "both engines.",
)
def q20_excess_shippers(spark, sf_dir):
    from pyspark.sql import Window

    widget = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%")).select("p_partkey")
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        )
        .join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("qty"))
    )
    dominant = (
        shipped.withColumn("part_total", F.sum("qty").over(Window.partitionBy("l_partkey")))
        .where(F.col("qty") > 0.3 * F.col("part_total"))
        .select("l_suppkey")
    )
    asia = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
