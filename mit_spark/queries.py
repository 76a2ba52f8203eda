"""Query registry — every SURVEY.md §2 operator family expressed as a
(spark_builder, duckdb_oracle_sql) pair over the driver's testdata tables.

Registry contract (driver __spark_entry__):
  * builder(spark, sf_dir) -> DataFrame, all computed columns aliased;
  * oracle_sql: equivalent ANSI SQL for DuckDB over pre-registered views
    (region nation customer supplier part orders lineitem events documents
    embeddings), producing identical column NAMES and values;
  * oracle_sql=None marks genuinely non-SQL-expressible ops (media
    detection path) -> the driver records a rows-only check.

Cross-engine determinism rules used throughout:
  * money sums rounded to 2dp, ratios/avgs to 4-6dp (double accumulation
    order differs between engines at ~1e-9 relative);
  * timestamps emitted as formatted strings (engines hash temporals
    differently);
  * md5() is the only hash primitive (bit-identical hex string in Spark,
    DuckDB, and python's hashlib);
  * every ORDER BY feeding a LIMIT carries a unique tiebreak key.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from mit_spark.sources.docs_source import read_table

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], Optional[str]]] = {}


def register(name: str, sql: Optional[str]):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


# ---------------------------------------------------------------------------
# relational core — scans, filters, aggregations (SURVEY.md §2.2/2.5 analogues)


@register(
    "q1_pricing_summary",
    """
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
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_topk_revenue",
    """
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        )
        .groupBy(F.col("l_orderkey").alias("orderkey"), "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    # dimension tables are tiny: broadcast them (SURVEY.md §2.6 joins note)
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    r = F.broadcast(read_table(spark, sf_dir, "region"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@register(
    "top_customer_per_nation",
    """
    SELECT nation, custkey, balance FROM (
      SELECT n.n_name AS nation, c.c_custkey AS custkey,
             round(c.c_acctbal, 2) AS balance,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rn <= 3
    ORDER BY nation, balance DESC, custkey
    """,
)
def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("custkey"),
            F.round("c_acctbal", 2).alias("balance"),
        )
        .orderBy("nation", F.desc("balance"), "custkey")
    )


@register(
    "orders_without_lineitems",
    """
    SELECT o.o_orderkey AS orderkey, o.o_orderstatus AS status
    FROM orders o ANTI JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ORDER BY orderkey
    """,
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the checkpoint-resume primitive (SURVEY.md §2.6)."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_anti")
        .select(F.col("o_orderkey").alias("orderkey"), F.col("o_orderstatus").alias("status"))
        .orderBy("orderkey")
    )


@register(
    "priority_orders_semi",
    """
    SELECT o.o_orderpriority AS priority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def priority_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


@register(
    "part_type_stats",
    """
    SELECT p_type AS type, count(*) AS n_parts,
           round(avg(p_retailprice), 4) AS avg_price,
           max(p_size) AS max_size
    FROM part
    GROUP BY p_type
    HAVING count(*) > 5
    ORDER BY type
    """,
)
def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return (
        p.groupBy(F.col("p_type").alias("type"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
        .filter(F.col("n_parts") > 5)
        .orderBy("type")
    )


@register(
    "supplier_balance_rollup",
    """
    SELECT coalesce(CAST(s_nationkey AS VARCHAR), 'ALL') AS nationkey,
           round(sum(s_acctbal), 2) AS total_bal, count(*) AS n_supp
    FROM supplier
    GROUP BY ROLLUP (s_nationkey)
    ORDER BY nationkey
    """,
)
def supplier_balance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    return (
        s.rollup("s_nationkey")
        .agg(F.round(F.sum("s_acctbal"), 2).alias("total_bal"), F.count(F.lit(1)).alias("n_supp"))
        .select(
            F.coalesce(F.col("s_nationkey").cast("string"), F.lit("ALL")).alias("nationkey"),
            "total_bal",
            "n_supp",
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# events — time windows, sessionization, per-key top-k (SURVEY.md §2.8: the
# batch forms of the streaming operators; same plan runs under foreachBatch)


@register(
    "hourly_event_stats",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
)
def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("hour", "event_type")
    )


@register(
    "user_topk_events",
    """
    SELECT user_id, event_id, round(value, 4) AS value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    ORDER BY user_id, value DESC, event_id
    """,
)
def user_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", F.round("value", 4).alias("value"))
        .orderBy("user_id", F.desc("value"), "event_id")
    )


@register(
    "user_sessions",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min), the batch analogue of a session
    window in Structured Streaming."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "event_type_matrix",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS n_click,
           count(*) FILTER (event_type = 'view')     AS n_view,
           count(*) FILTER (event_type = 'purchase') AS n_purchase
    FROM events GROUP BY user_id
    HAVING count(*) > 10
    ORDER BY user_id
    """,
)
def event_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")  # noqa: E731
    return (
        e.groupBy("user_id")
        .agg(
            cnt("click"),
            cnt("view"),
            cnt("purchase"),
            F.count(F.lit(1)).alias("_total"),
        )
        .filter(F.col("_total") > 10)
        .drop("_total")
        .orderBy("user_id")
    )
