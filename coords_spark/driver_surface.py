"""queries()/oracle_sql() registry for the driver contract (SURVEY.md §5.2).

Every SQL-expressible operator family from SURVEY.md §2 gets a (Spark
DataFrame callable, DuckDB ANSI-SQL twin) pair; the driver compares them at
sf=0.01 by row count + schema + order-insensitive value hash.

Design rules (learned from the driver compare semantics):
  * every computed column is aliased IDENTICALLY in both forms;
  * float aggregates are rounded (sum->2dp, avg/ratio->4dp, cosine->5dp)
    so accumulation-order ulps can't flip the hash;
  * timestamps leave as int64 epoch-micros (unix_micros/epoch_us) — exact;
  * word splitting filters empty tokens on both sides;
  * top-k always carries a deterministic tie-break key.

Spatial/streaming operators that ANSI SQL can't express are registered
without an oracle twin (driver records rows-only); their correctness gate
is the mini-COORDS oracle in tests/ (SURVEY.md §5.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings, repartitioned for the same single-row-group reason as
    _docs — every bucket/centroid UDF matmul otherwise runs on one task."""
    return _t(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, repartitioned to the session parallelism: the testdata
    table is a single row group, which would serialize every tokenize/
    explode/UDF stage into ONE task before the first exchange (CLAUDE.md
    gotcha; measured 1.27 -> 0.77 s on the ngram pipeline at sf0.1).
    Result-invariant: all consumers aggregate with data-keyed tie-breaks."""
    return _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )


# ===========================================================================
# A. aggregations (SURVEY.md §2.5)
# ===========================================================================


@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                           AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
           ROUND(AVG(l_quantity), 4)                                AS avg_qty,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "stats_global_orders",
    """
    SELECT COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           COUNT(DISTINCT o_custkey)   AS n_customers
    FROM orders
    """,
)
def stats_global_orders(spark, sf):
    return _t(spark, sf, "orders").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@_q(
    "distinct_parts_per_supplier",
    """
    SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_items
    FROM lineitem GROUP BY l_suppkey
    """,
)
def distinct_parts_per_supplier(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"), F.count("*").alias("n_items"))
    )


@_q(
    "rollup_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*)                         AS n,
           ROUND(SUM(o_totalprice), 2)      AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark, sf):
    return (
        _t(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@_q(
    "cube_brand_type",
    """
    SELECT COALESCE(p_brand, 'ALL') AS brand,
           COALESCE(p_type, 'ALL')  AS ptype,
           COUNT(*)                 AS n,
           ROUND(AVG(p_retailprice), 4) AS avg_price
    FROM part GROUP BY CUBE (p_brand, p_type)
    """,
)
def cube_brand_type(spark, sf):
    return (
        _t(spark, sf, "part")
        .cube("p_brand", "p_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 4).alias("avg_price"))
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            F.coalesce("p_type", F.lit("ALL")).alias("ptype"),
            "n",
            "avg_price",
        )
    )


@_q(
    "grouping_sets_nation_region",
    """
    SELECT COALESCE(n_name, 'ALL') AS nname, COALESCE(r_name, 'ALL') AS rname,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((n_name), (r_name), ())
    """,
)
def grouping_sets_nation_region(spark, sf):
    _t(spark, sf, "customer").createOrReplaceTempView("gs_customer")
    _t(spark, sf, "nation").createOrReplaceTempView("gs_nation")
    _t(spark, sf, "region").createOrReplaceTempView("gs_region")
    return spark.sql(
        """
        SELECT COALESCE(n_name, 'ALL') AS nname, COALESCE(r_name, 'ALL') AS rname,
               COUNT(*) AS n_customers
        FROM gs_customer
        JOIN gs_nation ON c_nationkey = n_nationkey
        JOIN gs_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((n_name), (r_name), ())
        """
    )


@_q(
    "having_big_customers",
    """
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey HAVING SUM(o_totalprice) > 1500000
    """,
)
def having_big_customers(spark, sf):
    # HAVING applies to the raw (unrounded) sum, as in the SQL twin
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("_raw"))
        .filter(F.col("_raw") > 1500000)
        .select("o_custkey", "n_orders", F.round("_raw", 2).alias("spend"))
    )


@_q(
    "bucket_totalprice",
    """
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def bucket_totalprice(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


# ===========================================================================
# B. joins (SURVEY.md §2.3)
# ===========================================================================


@_q(
    "q3_top_orders",
    """
    SELECT o_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey
    ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark, sf):
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("_rev", 2).alias("revenue"))
    )


@_q(
    "q5_region_nation_revenue",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey   = c_custkey
                JOIN lineitem ON l_orderkey  = o_orderkey
                JOIN supplier ON s_suppkey   = l_suppkey AND s_nationkey = n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_nation_revenue(spark, sf):
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    return (
        F.broadcast(r)
        .join(n, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_q(
    "broadcast_region_rollup",
    """
    SELECT r_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def broadcast_region_rollup(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@_q(
    "semi_join_active_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def semi_join_active_customers(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


@_q(
    "anti_join_idle_customers",
    """
    SELECT n_name, COUNT(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY n_name
    """,
)
def anti_join_idle_customers(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )


@_q(
    "outer_join_priority_fill",
    """
    SELECT o_orderpriority, COUNT(l_orderkey) AS n_items,
           ROUND(SUM(COALESCE(l_quantity, 0)), 2) AS total_qty
    FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def outer_join_priority_fill(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.round(F.sum(F.coalesce("l_quantity", F.lit(0))), 2).alias("total_qty"),
        )
    )


@_q(
    "range_join_error_clicks",
    """
    SELECT e.event_id AS error_id, COUNT(*) AS n_clicks
    FROM events e JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def range_join_error_clicks(spark, sf):
    ev = _t(spark, sf, "events")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id").alias("u"), F.col("ts").alias("ets")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    return (
        e.join(
            c,
            (F.col("cu") == F.col("u"))
            & (F.col("cts") > F.col("ets"))
            & (F.col("cts") <= F.col("ets") + F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy("error_id")
        .agg(F.count("*").alias("n_clicks"))
    )


@_q(
    "asof_last_click_before_purchase",
    """
    SELECT event_id AS purchase_id, epoch_us(click_ts) AS click_ts_us
    FROM (
      SELECT event_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ) WHERE event_type = 'purchase'
    """,
)
def asof_last_click_before_purchase(spark, sf):
    from pyspark.sql.window import Window

    ev = _t(spark, sf, "events").filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn(
            "click_ts",
            F.last(F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            # parquet timestamps load as TIMESTAMP_NTZ; cast for unix_micros
            # (session TZ is pinned to UTC so the instant is unchanged)
            F.unix_micros(F.col("click_ts").cast("timestamp")).alias("click_ts_us"),
        )
    )


@_q(
    "exists_discounted_orders",
    """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders WHERE o_orderkey IN
      (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.10)
    GROUP BY o_orderstatus
    """,
)
def exists_discounted_orders(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_discount") > 0.10)
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


# ===========================================================================
# C. windows / sort / top-k (SURVEY.md §2.6)
# ===========================================================================


@_q(
    "window_top3_per_customer",
    """
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def window_top3_per_customer(spark, sf):
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf, "orders")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@_q(
    "window_running_user_value",
    """
    SELECT event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
    FROM events
    """,
)
def window_running_user_value(spark, sf):
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf, "events")
        .withColumn("run_sum", F.round(F.sum("value").over(w), 2))
        .select("event_id", "run_sum")
    )


@_q(
    "window_lag_delta",
    """
    SELECT event_id,
           ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
             AS delta
    FROM events
    """,
)
def window_lag_delta(spark, sf):
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf, "events")
        .withColumn("delta", F.round(F.col("value") - F.lag("value").over(w), 2))
        .select("event_id", "delta")
    )


@_q(
    "window_rank_dense_ntile",
    """
    SELECT s_suppkey,
           RANK()       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
           DENSE_RANK() OVER (ORDER BY s_nationkey)               AS drnk,
           NTILE(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile
    FROM supplier
    """,
)
def window_rank_dense_ntile(spark, sf):
    from pyspark.sql.window import Window

    s = _t(spark, sf, "supplier")
    w1 = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    w2 = Window.orderBy(F.col("s_nationkey"))
    return s.select(
        "s_suppkey",
        F.rank().over(w1).cast("long").alias("rnk"),
        F.dense_rank().over(w2).cast("long").alias("drnk"),
        F.ntile(4).over(w1).cast("long").alias("quartile"),
    )


@_q(
    "topk_global_lineitems",
    """
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_global_lineitems(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


# ===========================================================================
# D. set operations (SURVEY.md §2.7)
# ===========================================================================


@_q(
    "set_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_nations(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@_q(
    "set_except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    """,
)
def set_except_nations(spark, sf):
    c = (
        _t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)  # EXCEPT (set semantics)


@_q(
    "set_except_all_segments",
    """
    SELECT c_mktsegment AS seg FROM customer WHERE c_custkey < 200
    EXCEPT ALL
    SELECT c_mktsegment FROM customer WHERE c_custkey < 100
    """,
)
def set_except_all_segments(spark, sf):
    c = _t(spark, sf, "customer")
    a = c.filter(F.col("c_custkey") < 200).select(F.col("c_mktsegment").alias("seg"))
    b = c.filter(F.col("c_custkey") < 100).select(F.col("c_mktsegment").alias("seg"))
    return a.exceptAll(b)


@_q(
    "union_labels",
    """
    SELECT label, COUNT(*) AS n FROM (
      SELECT c_mktsegment AS label FROM customer
      UNION ALL
      SELECT o_orderpriority AS label FROM orders
    ) GROUP BY label
    """,
)
def union_labels(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_mktsegment").alias("label"))
    o = _t(spark, sf, "orders").select(F.col("o_orderpriority").alias("label"))
    return c.unionByName(o).groupBy("label").agg(F.count("*").alias("n"))


# ===========================================================================
# E. scalar functions (SURVEY.md §2.8)
# ===========================================================================


@_q(
    "array_funcs_parts",
    """
    SELECT list_sort(list_distinct(string_split(LOWER(p_name), ' ')))[1]        AS word1,
           CAST(LEN(list_distinct(string_split(LOWER(p_name), ' '))) AS BIGINT) AS n_words,
           COUNT(*)                                                             AS n,
           MIN(array_to_string(list_sort(list_distinct(string_split(LOWER(p_name), ' '))), '|'))
                                                                                AS min_words
    FROM part
    GROUP BY 1, 2
    """,
)
def array_funcs_parts(spark, sf):
    """§2.8 array-function family twin: split -> array_distinct ->
    sort_array -> element_at / size / concat_ws, reduced to scalars so the
    driver hash compares strings not nested lists (grouping on the first
    sorted word gives ~90 groups at sf0.01)."""
    p = _t(spark, sf, "part")
    words = F.sort_array(F.array_distinct(F.split(F.lower("p_name"), " ")))
    return (
        p.select(
            F.element_at(words, 1).alias("word1"),
            F.size(words).cast("long").alias("n_words"),
            F.concat_ws("|", words).alias("w"),
        )
        .groupBy("word1", "n_words")
        .agg(F.count("*").alias("n"), F.min("w").alias("min_words"))
    )


@_q(
    "map_funcs_events",
    """
    SELECT array_to_string(list_sort(json_keys(props)), ',')        AS key_set,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7    AS k_mod,
           COUNT(*)                                                 AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                                                                    AS k_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def map_funcs_events(spark, sf):
    """§2.8 map-function family twin: JSON props -> map<string,string> ->
    map_keys sorted/joined + a map-value extraction, grouped so every
    (key-set, value-mod) bucket is hash-pinned."""
    ev = _t(spark, sf, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select(
            F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("key_set"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .withColumn("k_mod", F.col("k") % 7)
        .groupBy("key_set", "k_mod")
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
    )


@_q(
    "string_funcs_parts",
    """
    SELECT p_partkey,
           UPPER(p_brand)                                  AS brand_u,
           LENGTH(p_name)                                  AS name_len,
           SPLIT_PART(p_name, ' ', 1)                      AS word1,
           SPLIT_PART(p_name, ' ', 2)                      AS word2,
           CONCAT(p_type, '/', p_brand)                    AS type_brand,
           SUBSTRING(p_name, 1, 3)                         AS pre3
    FROM part
    """,
)
def string_funcs_parts(spark, sf):
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").cast("long").alias("name_len"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("word1"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("word2"),
        F.concat(F.col("p_type"), F.lit("/"), F.col("p_brand")).alias("type_brand"),
        F.substring("p_name", 1, 3).alias("pre3"),
    )


@_q(
    "date_buckets_orders",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY 1, 2
    """,
)
def date_buckets_orders(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@_q(
    "json_props_stats",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1
    """,
)
def json_props_stats(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod")
        ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@_q(
    "math_funcs_suppliers",
    """
    SELECT s_suppkey,
           ROUND(SQRT(ABS(s_acctbal)), 4)      AS sqrt_bal,
           ROUND(LN(ABS(s_acctbal) + 1), 4)    AS ln_bal,
           ROUND(POWER(s_acctbal / 1000, 2), 4) AS pow_bal,
           CAST(SIGN(s_acctbal) AS INT)        AS sgn
    FROM supplier
    """,
)
def math_funcs_suppliers(spark, sf):
    s = _t(spark, sf, "supplier")
    return s.select(
        "s_suppkey",
        F.round(F.sqrt(F.abs("s_acctbal")), 4).alias("sqrt_bal"),
        F.round(F.log(F.abs(F.col("s_acctbal")) + 1), 4).alias("ln_bal"),
        F.round(F.pow(F.col("s_acctbal") / 1000, 2), 4).alias("pow_bal"),
        F.signum("s_acctbal").cast("int").alias("sgn"),
    )


@_q(
    "case_when_segments",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           c_mktsegment, COUNT(*) AS n
    FROM customer GROUP BY 1, 2
    """,
)
def case_when_segments(spark, sf):
    c = _t(spark, sf, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band")
    )
    return c.groupBy(band, "c_mktsegment").agg(F.count("*").alias("n"))


# ===========================================================================
# F. training-data pipeline ops: dedup / text analysis (documents table)
# ===========================================================================

# shared word-splitter: regex split + drop empties, identical semantics in
# Spark (split + filter) and DuckDB (regexp_split_to_array + list_filter)
_WORDS_SPARK = "filter(split(text, '\\\\s+'), x -> x != '')"
_WORDS_DUCK = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"


@_q(
    "dedup_exact_stats",
    """
    SELECT COUNT(*)                      AS n_docs,
           COUNT(DISTINCT md5(lower(text))) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT md5(lower(text))) AS n_dupes
    FROM documents
    """,
)
def dedup_exact_stats(spark, sf):
    d = _t(spark, sf, "documents").withColumn("h", F.md5(F.lower(F.col("text"))))
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("h").alias("n_distinct"),
        (F.count("*") - F.countDistinct("h")).alias("n_dupes"),
    )


@_q(
    "dedup_keep_first",
    """
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(keep_id) AS BIGINT) AS id_sum FROM (
      SELECT lang, MIN(doc_id) AS keep_id
      FROM documents GROUP BY lang, md5(lower(text))
    ) GROUP BY lang
    """,
)
def dedup_keep_first(spark, sf):
    d = _t(spark, sf, "documents").withColumn("h", F.md5(F.lower(F.col("text"))))
    kept = d.groupBy("lang", "h").agg(F.min("doc_id").alias("keep_id"))
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"), F.sum("keep_id").alias("id_sum")
    )


@_q(
    "minhash_band_signature",
    f"""
    SELECT doc_id,
           MIN(CASE WHEN band = 0 THEN h END) AS sig0,
           MIN(CASE WHEN band = 1 THEN h END) AS sig1,
           MIN(CASE WHEN band = 2 THEN h END) AS sig2,
           MIN(CASE WHEN band = 3 THEN h END) AS sig3
    FROM (
      SELECT doc_id, band, md5(CAST(band AS VARCHAR) || ':' || sh) AS h
      FROM (
        SELECT doc_id, UNNEST(list_transform(
                 generate_series(1, GREATEST(len(words) - 2, 0)),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
        FROM (SELECT doc_id, {_WORDS_DUCK} AS words FROM documents)
      ), (SELECT UNNEST([0,1,2,3]) AS band)
    ) GROUP BY doc_id
    """,
)
def minhash_band_signature(spark, sf):
    """MinHash with 4 bands over 3-word shingles: per band, the signature is
    the min md5 of 'band:shingle' — the standard banded-LSH construction
    expressed purely in built-in functions (JVM-side, no UDF)."""
    d = _docs(spark, sf).selectExpr("doc_id", f"{_WORDS_SPARK} as words")
    sh = d.selectExpr(
        "doc_id",
        "explode(CASE WHEN size(words) >= 3 THEN transform(sequence(1, size(words) - 2), "
        "i -> concat_ws(' ', words[i-1], words[i], words[i+1])) ELSE array() END) as sh",
    )
    banded = sh.crossJoin(spark.range(4).select(F.col("id").cast("int").alias("band"))).select(
        "doc_id", "band", F.md5(F.concat(F.col("band").cast("string"), F.lit(":"), F.col("sh"))).alias("h")
    )
    return banded.groupBy("doc_id").agg(
        F.min(F.when(F.col("band") == 0, F.col("h"))).alias("sig0"),
        F.min(F.when(F.col("band") == 1, F.col("h"))).alias("sig1"),
        F.min(F.when(F.col("band") == 2, F.col("h"))).alias("sig2"),
        F.min(F.when(F.col("band") == 3, F.col("h"))).alias("sig3"),
    )


@_q(
    "ngram_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, lang, source, sh FROM (
        SELECT doc_id, lang, source, UNNEST(list_transform(
                 generate_series(1, GREATEST(len(words) - 2, 0)),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
        FROM (SELECT doc_id, lang, source, {_WORDS_DUCK} AS words FROM documents)
      )
    ), sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
    rare AS (
      SELECT s.* FROM sh s JOIN (
        SELECT lang, source, sh FROM sh
        GROUP BY lang, source, sh HAVING COUNT(*) <= 32
      ) r USING (lang, source, sh)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rare a JOIN rare b
        ON a.lang = b.lang AND a.source = b.source AND a.sh = b.sh
       AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(COUNT(*) * 1.0 / (sa.nsh + sb.nsh - COUNT(*)), 4) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    GROUP BY c.doc_a, c.doc_b, sa.nsh, sb.nsh
    HAVING COUNT(*) * 1.0 / (sa.nsh + sb.nsh - COUNT(*)) >= 0.05
    """,
)
def ngram_jaccard_pairs(spark, sf):
    """Near-dup pairs: 3-word-shingle Jaccard. Candidate generation joins
    only on DISCRIMINATIVE shingles (document frequency <= 32 within the
    (lang, source) bucket) so one ultra-frequent shingle can never make
    the self-join quadratic; the exact Jaccard is then computed over the
    FULL shingle sets, confined to candidate pairs. A pair is missed only
    if every shared shingle is frequent — the documented recall trade-off
    of DF capping (same shape as minhash_lsh_candidates + jaccard_verify)."""
    from coords_spark.operators import dedup

    # the raw docs table is tiny relative to its derived shingle volume —
    # spread it across all cores BEFORE the explode-heavy derivation, or a
    # single input split serializes the whole pipeline (the r2 .distinct()
    # used to provide this exchange as a side effect)
    d = (
        _docs(spark, sf)
        .select("doc_id", "lang", "source", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # NOT cached: per-consumer recompute of the (now shuffle-free) shingle
    # subtree measured faster than materialization (r2 A/B: cache 2.5x
    # slower). r3 plan: candidates = ONE exchange over the exploded
    # shingles (fused window-DF-cap + same-partitioning pair explode in
    # ngram_candidates); verification = two doc-keyed joins against the
    # row-local per-doc shingle arrays with array_intersect (jaccard_verify
    # shape) — no exploded-shingle join, no global distinct anywhere.
    cand = dedup.ngram_candidates(dedup.bucketed_shingles(d, n=3), df_cap=32)
    sets_ = dedup.shingle_sets(d)
    sa = sets_.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("_sa"))
    sb = sets_.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("_sb"))
    j = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("ncommon", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "_j", F.col("ncommon") / (F.size("_sa") + F.size("_sb") - F.col("ncommon"))
        )
        .filter(F.col("_j") >= 0.05)
    )
    return j.select("doc_a", "doc_b", F.round("_j", 4).alias("jaccard"))


@_q(
    "text_quality_by_source",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(len(words)), 4) AS avg_words,
           ROUND(AVG(n_chars * 1.0 / len(words)), 4) AS avg_chars_per_word,
           ROUND(AVG(len(list_filter(words, w -> w IN ('the','a','of','and','to','in')))
                     * 1.0 / len(words)), 4) AS stopword_ratio
    FROM (SELECT source, n_chars, {_WORDS_DUCK} AS words FROM documents)
    GROUP BY source
    """,
)
def text_quality_by_source(spark, sf):
    d = _docs(spark, sf).selectExpr("source", "n_chars", f"{_WORDS_SPARK} as words")
    return (
        d.selectExpr(
            "source",
            "size(words) as nw",
            "n_chars",
            "size(filter(words, w -> w IN ('the','a','of','and','to','in'))) as nstop",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("nw"), 4).alias("avg_words"),
            F.round(F.avg(F.col("n_chars") / F.col("nw")), 4).alias("avg_chars_per_word"),
            F.round(F.avg(F.col("nstop") / F.col("nw")), 4).alias("stopword_ratio"),
        )
    )


@_q(
    "langid_heuristic",
    f"""
    SELECT lang, pred, COUNT(*) AS n FROM (
      SELECT lang,
             CASE WHEN en >= de AND en >= fr THEN 'en'
                  WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred
      FROM (
        SELECT lang,
               len(list_filter(words, w -> w IN ('the','and','of','a'))) AS en,
               len(list_filter(words, w -> w IN ('der','die','das','und'))) AS de,
               len(list_filter(words, w -> w IN ('le','la','et','les'))) AS fr
        FROM (SELECT lang, {_WORDS_DUCK} AS words FROM documents)
      )
    ) GROUP BY lang, pred
    """,
)
def langid_heuristic(spark, sf):
    d = _docs(spark, sf).selectExpr("lang", f"{_WORDS_SPARK} as words")
    scored = d.selectExpr(
        "lang",
        "size(filter(words, w -> w IN ('the','and','of','a'))) as en",
        "size(filter(words, w -> w IN ('der','die','das','und'))) as de",
        "size(filter(words, w -> w IN ('le','la','et','les'))) as fr",
    )
    pred = (
        F.when((F.col("en") >= F.col("de")) & (F.col("en") >= F.col("fr")), "en")
        .when(F.col("de") >= F.col("fr"), "de")
        .otherwise("fr")
        .alias("pred")
    )
    return scored.groupBy("lang", pred).agg(F.count("*").alias("n"))


@_q(
    "token_stats_by_lang",
    f"""
    SELECT lang,
           CAST(SUM(len(words)) AS BIGINT)                                 AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT)   AS alnum_tokens,
           COUNT(*)                                           AS n_docs
    FROM (SELECT lang, text, {_WORDS_DUCK} AS words FROM documents)
    GROUP BY lang
    """,
)
def token_stats_by_lang(spark, sf):
    d = _docs(spark, sf).selectExpr(
        "lang",
        f"size({_WORDS_SPARK}) as nw",
        "size(regexp_extract_all(text, '[a-z0-9]+', 0)) as na",
    )
    return d.groupBy("lang").agg(
        F.sum("nw").alias("ws_tokens"),
        F.sum("na").alias("alnum_tokens"),
        F.count("*").alias("n_docs"),
    )


@_q(
    "doc_fingerprint_distinct",
    f"""
    SELECT lang, COUNT(DISTINCT fp) AS n_fp FROM (
      SELECT lang, md5(array_to_string(list_sort(list_distinct(words)), ' ')) AS fp
      FROM (SELECT lang, {_WORDS_DUCK} AS words FROM documents)
    ) GROUP BY lang
    """,
)
def doc_fingerprint_distinct(spark, sf):
    d = _docs(spark, sf).selectExpr(
        "lang",
        f"md5(concat_ws(' ', array_sort(array_distinct({_WORDS_SPARK})))) as fp",
    )
    return d.groupBy("lang").agg(F.countDistinct("fp").alias("n_fp"))


# ===========================================================================
# G. similarity search (embeddings table)
# ===========================================================================


@_q(
    "knn_cosine_top10",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        CAST(qe AS DOUBLE[])), 5) AS sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[])) DESC,
             vec_id
    LIMIT 10
    """,
)
def knn_cosine_top10(spark, sf):
    """Brute-force cosine top-k in pure higher-order Columns (JVM-side):
    the baseline path; the LSH-bucketed scale path is operators/similarity."""
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    j = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    dot = "aggregate(zip_with(embedding, qe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    na = "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    nb = "sqrt(aggregate(qe, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    return (
        j.selectExpr("vec_id", f"{dot} / ({na} * {nb}) as _sim")
        .orderBy(F.col("_sim").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", F.round("_sim", 5).alias("sim"))
    )


@_q(
    "embedding_norms_by_label",
    """
    SELECT label, COUNT(*) AS n,
           ROUND(AVG(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_norms_by_label(spark, sf):
    e = _t(spark, sf, "embeddings")
    norm = "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    return (
        e.selectExpr("label", f"{norm} as nrm")
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("nrm"), 4).alias("avg_norm"))
    )


@_q(
    "tumbling_window_event_counts",
    """
    SELECT epoch_us(time_bucket(INTERVAL '10 minutes', ts)) AS win_start_us,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_event_counts(spark, sf):
    """Streaming facade in batch mode (identical semantics either way)."""
    from coords_spark.streaming import tumbling_window_counts

    ev = _t(spark, sf, "events")
    return tumbling_window_counts(ev, watermark=None).select(
        F.unix_micros(F.col("win_start").cast("timestamp")).alias("win_start_us"),
        "event_type",
        "n",
        "total",
    )


@_q(
    "session_window_stats",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT epoch_us(MIN(ts)) AS sess_start_us, user_id,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_stats_q(spark, sf):
    """Gap-based sessionization (session_window, gap 5 min). SQL twin:
    lag + cumulative-sum sessionization — a new session starts when the
    gap to the previous event is >= the gap duration (Spark session
    windows are half-open [ts, ts+gap))."""
    from coords_spark.streaming import session_window_stats

    ev = _t(spark, sf, "events")
    s = session_window_stats(ev, watermark=None)
    return s.select(
        F.unix_micros(F.col("sess_start").cast("timestamp")).alias("sess_start_us"),
        "user_id",
        "n_events",
        "total",
    )


@_q(
    "sliding_window_user_counts",
    """
    SELECT epoch_us(ws) AS win_start_us, user_id, COUNT(*) AS n
    FROM (
      SELECT user_id, UNNEST([time_bucket(INTERVAL '5 minutes', ts),
                              time_bucket(INTERVAL '5 minutes', ts)
                                - INTERVAL '5 minutes']) AS ws
      FROM events
    ) GROUP BY 1, 2
    """,
)
def sliding_window_user_counts(spark, sf):
    """Sliding window (width 10 min, slide 5 min) per-user event counts
    (SURVEY §2.9). Each event lands in exactly width/slide = 2 windows;
    the twin materializes both window starts per event and aggregates."""
    from coords_spark.streaming import sliding_window_counts

    ev = _t(spark, sf, "events")
    return sliding_window_counts(ev, watermark=None).select(
        F.unix_micros(F.col("win_start").cast("timestamp")).alias("win_start_us"),
        "user_id",
        "n",
    )


@_q(
    "watermark_dedup_counts",
    """
    SELECT event_type, COUNT(*) AS n FROM (
      SELECT event_id, ANY_VALUE(event_type) AS event_type
      FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
      GROUP BY event_id
    ) GROUP BY event_type
    """,
)
def watermark_dedup_counts(spark, sf):
    """Watermark-bounded dedup (§2.9) in batch mode: duplicate the events
    feed, drop duplicates on event_id, count per type. The streaming path
    (dropDuplicatesWithinWatermark) shares this transform; stream==batch
    equivalence is pytest-gated in tests/test_streaming."""
    from coords_spark.streaming import watermark_dedup

    ev = _t(spark, sf, "events")
    return watermark_dedup(ev.unionAll(ev), key="event_id").groupBy("event_type").agg(
        F.count("*").alias("n")
    )


@_q(
    "approx_distinct_customers",
    """
    SELECT COUNT(DISTINCT o_custkey) AS exact_custkeys, TRUE AS within_2pct
    FROM orders
    """,
)
def approx_distinct_customers(spark, sf):
    """A4 approximate count-distinct: HLL++ sketch vs the exact count.
    Spark's HLL value can't be reproduced by DuckDB, so the query itself
    asserts the sketch's relative error bound (rsd 0.01 -> check 2%) and
    returns (exact, bound_held) — which the twin can hash-match."""
    o = _t(spark, sf, "orders")
    agg = o.agg(
        F.count_distinct("o_custkey").alias("exact_custkeys"),
        F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
    )
    return agg.select(
        "exact_custkeys",
        (
            F.abs(F.col("approx") - F.col("exact_custkeys"))
            / F.col("exact_custkeys")
            <= 0.02
        ).alias("within_2pct"),
    )


@_q("payload_decode_verify", None)
def payload_decode_verify(spark, sf):
    """Decode + blockhash + PSNR verification over a synthesized image
    payload batch (input_hint invariant as a query; rows-only — binary
    payloads aren't ANSI-SQL territory)."""
    from coords_spark.fixtures import gen_images
    from coords_spark.operators import images as IMG

    imgs = spark.createDataFrame(gen_images(400))
    v = IMG.with_payload_verification(imgs)
    return v.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum(F.col("payload_ok").cast("int")).alias("n_ok"),
        F.sum(F.col("caption_ok").cast("int")).alias("n_caption_ok"),
        F.round(F.min("psnr"), 2).alias("min_psnr"),
    ).orderBy("fmt")


# ===========================================================================
# H. spatial engine queries (no ANSI-SQL twin -> driver rows-only check;
#    byte-for-byte gates live in tests/ against the mini-COORDS oracle)
# ===========================================================================


def _points_from_orders(spark, sf):
    from coords_spark.operators import ingest

    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("key"), F.xxhash64("o_orderkey").alias("phash")
    )
    return ingest.with_anchor(o)


@_q("geo_pip_enrich", None)
def geo_pip_enrich(spark, sf):
    """Ray-cast PIP join (J4): order-derived image points vs the synthetic
    admin polygons (FIXTURES.md §3) — counts per polygon."""
    from coords_spark.fixtures import gen_admin_polygons
    from coords_spark.kernels import zcurve
    from coords_spark.operators import ingest, pip_join

    pts = ingest.with_anchor_cell(
        _t(spark, sf, "orders").select(
            F.col("o_orderkey").cast("string").alias("image_id"),
            F.xxhash64("o_orderkey").alias("phash"),
        ),
        zcurve.MAX_LEVEL,
    )
    polys = spark.createDataFrame(gen_admin_polygons(50))
    pairs = pip_join.pip_enrich(pts, polys)
    return pairs.groupBy("poly_id").agg(F.count("*").alias("n_points")).orderBy("poly_id")


@_q("geo_knn_ring", None)
def geo_knn_ring(spark, sf):
    """Cell-ring-expansion kNN (J5): 3 hotspot queries + 1 sparse query
    against order-derived points."""
    from coords_spark.kernels import zcurve
    from coords_spark.kernels.phash import HOTSPOTS
    from coords_spark.operators import ingest, knn

    pts = ingest.with_anchor_cell(
        _t(spark, sf, "orders").select(
            F.col("o_orderkey").cast("string").alias("image_id"),
            F.xxhash64("o_orderkey").alias("phash"),
        ),
        zcurve.MAX_LEVEL,
    )
    queries = [
        (f"q{i}", int(la * 1e7), int(lo * 1e7)) for i, (la, lo) in enumerate(HOTSPOTS[:3])
    ] + [("q_sparse", int(-55.0 * 1e7), int(100.0 * 1e7))]
    return knn.knn_join(pts, queries, k=10, level=10).orderBy("qid", "rank")


@_q("geo_raster_vector_align", None)
def geo_raster_vector_align(spark, sf):
    """Raster-tile <-> vector-chunk alignment (J6) between chunk sets built
    from orders (raster side) and lineitem suppliers (vector side)."""
    from coords_spark.operators import align, ingest, tiling

    def chunks_of(df, key, max_bytes):
        pts = ingest.with_anchor_cell(df, tiling.DEFAULT_BASE_LEVEL).withColumn(
            "nbytes", F.lit(256).cast("long")
        )
        split = tiling.compute_split_set(pts, max_bytes=max_bytes, base_level=tiling.DEFAULT_BASE_LEVEL)
        return tiling.with_chunk(pts, split, base_level=tiling.DEFAULT_BASE_LEVEL)

    raster = chunks_of(
        _t(spark, sf, "orders").select(F.xxhash64("o_orderkey").alias("phash"), F.col("o_orderkey").cast("string").alias("image_id")),
        "image_id",
        16 * 1024,
    )
    vector = chunks_of(
        _t(spark, sf, "supplier").select(F.xxhash64("s_suppkey").alias("phash"), F.col("s_suppkey").cast("string").alias("image_id")),
        "image_id",
        64 * 1024,
    )
    return align.align_chunks(raster, vector).orderBy("v_chunk", "r_chunk")


@_q("geo_coastline_classify", None)
def geo_coastline_classify(spark, sf):
    """Land/water classification of image points against the synthetic
    coastline ring (the second PIP target family, FIXTURES.md §3)."""
    import numpy as np

    from coords_spark.kernels import zcurve
    from coords_spark.kernels.phash import COAST_LAT, COAST_LON
    from coords_spark.operators import ingest, pip_join

    pts = ingest.with_anchor_cell(
        _t(spark, sf, "orders").select(
            F.col("o_orderkey").cast("string").alias("image_id"),
            F.xxhash64("o_orderkey").alias("phash"),
        ),
        zcurve.MAX_LEVEL,
    )
    ring = [
        {"lat": int(round(la * 1e7)), "lon": int(round(lo * 1e7))}
        for la, lo in zip(COAST_LAT, COAST_LON)
    ]
    import pandas as pd

    polys = spark.createDataFrame(
        pd.DataFrame([{"poly_id": 1, "outer": ring, "inners": []}]),
        "poly_id long, outer array<struct<lat:int,lon:int>>, inners array<array<struct<lat:int,lon:int>>>",
    )
    on_land = pip_join.pip_enrich(pts, polys).select("image_id").withColumn("on_land", F.lit(True))
    return (
        pts.join(on_land, "image_id", "left")
        .groupBy(F.coalesce("on_land", F.lit(False)).alias("on_land"))
        .agg(F.count("*").alias("n"))
        .orderBy("on_land")
    )


@_q("dedup_minhash_lsh_pairs", None)
def dedup_minhash_lsh_pairs(spark, sf):
    """xxhash64 banded MinHash-LSH candidates + exact Jaccard verify
    (engine-native variant of the md5 SQL twin; rows-only check)."""
    from coords_spark.operators import dedup

    d = _docs(spark, sf).select("doc_id", "text")
    cand = dedup.minhash_lsh_candidates(d, n_bands=8, rows_per_band=2)
    return dedup.jaccard_verify(d, cand, threshold=0.3).orderBy("doc_a", "doc_b")


@_q("dedup_cluster_stats", None)
def dedup_cluster_stats(spark, sf):
    """Duplicate-cluster consolidation: the verified MinHash near-dup PAIRS
    collapse into connected components (min-label propagation) and each
    cluster reports its canonical id + size — the decision a pipeline
    actually applies (keep one doc per CLUSTER). Golden twin runs
    union-find over the independently recomputed pair set."""
    from coords_spark.operators import dedup

    d = _docs(spark, sf).select("doc_id", "text")
    cand = dedup.minhash_lsh_candidates(d, n_bands=8, rows_per_band=2)
    pairs = dedup.jaccard_verify(d, cand, threshold=0.3)
    return (
        dedup.dup_clusters(pairs)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_docs"), F.sum("doc_id").alias("doc_id_sum"))
        .orderBy("cluster_id")
    )


@_q("dedup_simhash_pairs", None)
def dedup_simhash_pairs(spark, sf):
    from coords_spark.operators import dedup

    d = _docs(spark, sf).select("doc_id", "text")
    return dedup.simhash_near_dups(d, max_hamming=8).orderBy("doc_a", "doc_b")


@_q("embedding_ann_topk", None)
def embedding_ann_topk(spark, sf):
    """LSH-bucketed approximate top-k (scale path; brute-force twin is the
    knn_cosine_top10 SQL-checked query)."""
    from coords_spark.operators import similarity

    e = _embs(spark, sf)
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ann_topk(e, qv, 10, n_planes=8, probe_hamming=2).select(
        "vec_id", F.round("cosine", 5).alias("sim")
    )


@_q(
    "text_quality_scored",
    r"""
    SELECT lang, COUNT(*) AS n,
           ROUND(AVG(ROUND(CASE WHEN n_words >= 10 AND avg_word_len BETWEEN 2 AND 12
                     THEN 1.0 ELSE 0.0 END * (0.5 + alpha_ratio / 2), 4)), 4) AS avg_quality,
           ROUND(AVG(n_stop * 1.0 / GREATEST(n_words, 1)), 4) AS avg_stopword_ratio
    FROM (
      SELECT lang,
             len(words) AS n_words,
             list_aggregate(list_transform(words, w -> length(w)), 'sum') * 1.0
               / GREATEST(len(words), 1) AS avg_word_len,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
               / GREATEST(length(text), 1) AS alpha_ratio,
             len(list_filter(words, w -> w IN ('the','a','of','and','to','in'))) AS n_stop
      FROM (SELECT lang, text,
                   list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS words
            FROM documents)
    ) GROUP BY lang
    """,
)
def text_quality_scored(spark, sf):
    from coords_spark.operators import text as T

    d = T.with_quality(_docs(spark, sf))
    return d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
    )


@_q("geo_osm_way_tiling", None)
def geo_osm_way_tiling(spark, sf):
    """E3 end-to-end on the OSM-like fixture: resolve ways (J1) ->
    envelope (T3) -> deepest containing cell (T4) -> size-bounded chunk
    (T5) -> per-chunk feature counts. Fixture synthesized deterministically
    in-memory (FIXTURES.md §2)."""
    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, resolve, tiling

    nodes = spark.createDataFrame(gen_nodes(4000))
    ways = spark.createDataFrame(gen_ways(600, 4000))
    resolved = resolve.resolve_ways(ways, nodes)
    g = geometry.with_geometry_cell(geometry.with_envelope(resolved))
    g = g.withColumn("nbytes", (F.size("pts") * 8 + 64).cast("long"))
    split = tiling.compute_split_set(g, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL)
    chunked = tiling.with_chunk(g, split, base_level=tiling.DEFAULT_BASE_LEVEL)
    return (
        chunked.groupBy("chunk_id")
        .agg(F.count("*").alias("n_ways"), F.sum(F.size("pts")).alias("n_vertices"))
        .orderBy("chunk_id")
    )


@_q("geo_lod_tables", None)
def geo_lod_tables(spark, sf):
    """T7 as a query: per-zoom LOD tables (Douglas-Peucker simplification
    at the lod pixel tolerance + min-pixel-size feature drop) built from
    resolved OSM-like ways; returns per-lod feature/vertex counts. Golden
    expected rows are pinned by tests against an independent scalar DP
    (tests/oracle)."""
    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, resolve

    nodes = spark.createDataFrame(gen_nodes(4000))
    ways = spark.createDataFrame(gen_ways(600, 4000))
    resolved = resolve.resolve_ways(ways, nodes)
    lods = geometry.build_lod_tables(resolved, [6, 10, 14])
    out = None
    for lod, df in sorted(lods.items()):
        agg = (
            df.agg(
                F.count("*").cast("long").alias("n_features"),
                F.sum(F.size("pts")).cast("long").alias("n_vertices"),
            )
            .withColumn("lod", F.lit(lod))
            .select("lod", "n_features", "n_vertices")
        )
        out = agg if out is None else out.unionAll(agg)
    return out.orderBy("lod")


@_q("geo_multipolygon_assembly", None)
def geo_multipolygon_assembly(spark, sf):
    """T8 as a query: assemble multipolygons from relation member arcs;
    per-relation polygon/hole/vertex counts."""
    from coords_spark.fixtures import gen_relations
    from coords_spark.operators import multipolygon, resolve

    relations, ring_ways = gen_relations(60)
    rel_df = spark.createDataFrame(relations)
    rw_df = spark.createDataFrame(ring_ways).select(
        F.col("id").alias("way_id"), "pts"
    )
    members = resolve.resolve_relation_members(rel_df, rw_df)
    mp = multipolygon.reconstruct_multipolygons(members)
    return mp.groupBy("relation_id").agg(
        F.count("*").alias("n_polygons"),
        F.sum(F.size("outer")).alias("outer_vertices"),
        F.sum(F.size("inners")).alias("n_holes"),
    ).orderBy("relation_id")


@_q("geo_chunk_rollup", None)
def geo_chunk_rollup(spark, sf):
    """Flagship: quadtree chunk assignment + per-chunk stats (T2/T4/T5)."""
    from coords_spark.operators import ingest, tiling

    pts = ingest.with_point_cell(_points_from_orders(spark, sf), tiling.DEFAULT_BASE_LEVEL)
    pts = pts.withColumn("nbytes", F.lit(128).cast("long"))
    split = tiling.compute_split_set(pts, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL)
    chunked = tiling.with_chunk(pts, split, base_level=tiling.DEFAULT_BASE_LEVEL)
    return (
        chunked.groupBy("chunk_id")
        .agg(F.count("*").alias("n_points"), F.min("cell").alias("cell_min"), F.max("cell").alias("cell_max"))
        .orderBy("chunk_id")
    )



@_q(
    "pivot_priority_by_status",
    """
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
             AS urgent_value
    FROM orders GROUP BY o_orderstatus
    """,
)
def pivot_priority_by_status(spark, sf):
    """Pivot (wide aggregation): per-status columns for selected priority
    classes — Spark's groupBy().pivot() with an explicit value list (the
    scale-safe form: no distinct-values pre-scan)."""
    o = _t(spark, sf, "orders")
    p = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("value"),
        )
    )
    # coalesce counts to 0: Spark pivot emits NULL for an empty cell while
    # the twin's COUNT(*) FILTER emits 0 (sums stay NULL on both sides)
    return p.select(
        "o_orderstatus",
        F.coalesce(F.col("1-URGENT_n"), F.lit(0)).alias("n_urgent"),
        F.coalesce(F.col("2-HIGH_n"), F.lit(0)).alias("n_high"),
        F.coalesce(F.col("3-MEDIUM_n"), F.lit(0)).alias("n_medium"),
        F.col("1-URGENT_value").alias("urgent_value"),
    )


@_q(
    "percentile_prices_by_priority",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(MAX(o_totalprice), 2) AS pmax
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_prices_by_priority(spark, sf):
    """Exact interpolated percentiles (A4 depth): Spark `percentile` and
    DuckDB `quantile_cont` share the linear-interpolation definition, so
    the twin hash-matches bit-for-bit after rounding."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.max("o_totalprice"), 2).alias("pmax"),
    )


@_q("osm_tag_histogram", None)
def osm_tag_histogram(spark, sf):
    """Map-function surface (§2.8) as a driver query: explode the OSM tags
    map, count per key, top 15 by (count desc, key). Golden twin computed
    from the fixture in pure python."""
    from coords_spark.fixtures import gen_nodes

    nodes = spark.createDataFrame(gen_nodes(4000))
    return (
        nodes.select(F.explode(F.map_keys("tags")).alias("tag_key"))
        .groupBy("tag_key")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tag_key")
        .limit(15)
    )


@_q("geo_node_way_reverse_index", None)
def geo_node_way_reverse_index(spark, sf):
    """J3 reverse index as a driver query: node -> ways containing it
    (posexplode of way refs), top 20 highest-degree nodes."""
    from coords_spark.fixtures import gen_nodes, gen_ways

    ways = spark.createDataFrame(gen_ways(600, 4000))
    rev = ways.select(
        F.col("id").alias("way_id"), F.explode("refs").alias("node_id")
    ).distinct()
    return (
        rev.groupBy("node_id")
        .agg(F.count("*").alias("n_ways"))
        .orderBy(F.desc("n_ways"), "node_id")
        .limit(20)
    )


@_q("icepick_roundtrip_stats", None)
def icepick_roundtrip_stats(spark, sf):
    """S2-S5 end-to-end as a driver query: chunk the order-derived points,
    materialize an icepick table (atomic per-group commits, lineage,
    checksums), then read it back with manifest pruning and count per
    chunk. The golden twin pins the counts; checksum verification gates
    the payload bytes on the way through."""
    import shutil
    import tempfile

    from coords_spark.operators import ingest, tiling
    from coords_spark.sources.icepick import IcepickTable

    pts = ingest.with_point_cell(_points_from_orders(spark, sf), tiling.DEFAULT_BASE_LEVEL)
    pts = pts.withColumn("nbytes", F.lit(128).cast("long"))
    split = tiling.compute_split_set(pts, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL)
    chunked = tiling.with_chunk(pts, split, base_level=tiling.DEFAULT_BASE_LEVEL)
    tmp = tempfile.mkdtemp(prefix="icepick_rt_")
    try:
        path = f"{tmp}/points"
        tiling.materialize_chunk_table(chunked.withColumnRenamed("key", "image_id"), path)
        t = IcepickTable(path)
        assert t.verify_checksums()
        back = ingest.read_chunk_table(spark, path)
        return (
            back.groupBy("chunk_id")
            .agg(F.count("*").alias("n_points"))
            .orderBy("chunk_id")
            .localCheckpoint()  # materialize before the table dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("cpbf_ingest_stats", None)
def cpbf_ingest_stats(spark, sf):
    """S1 PBF-shaped front door (SURVEY §2.1): the entity fixtures are
    ENCODED into the cpbf blocked varint/delta/string-table format, decoded
    back through Spark (binaryFile + mapInArrow, one vectorized varint pass
    per block), and checksummed per entity kind — ids, coordinates, ref
    lists and tag strings (crc32 per k=v entry) must all survive the
    codec. Golden twin computes the same sums from the fixture tables
    directly, so any codec bit-slip breaks the hash."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.sources import cpbf

    from coords_spark.fixtures import gen_relations

    tmp = tempfile.mkdtemp(prefix="cpbf_")
    try:
        cpbf.write_cpbf(gen_nodes(4000), f"{tmp}/nodes", cpbf.KIND_NODES,
                        rows_per_block=512, blocks_per_file=3)
        cpbf.write_cpbf(gen_ways(600, 4000), f"{tmp}/ways", cpbf.KIND_WAYS,
                        rows_per_block=97, blocks_per_file=2)
        cpbf.write_cpbf(gen_relations(200)[0], f"{tmp}/rels", cpbf.KIND_RELATIONS,
                        rows_per_block=31, blocks_per_file=2)
        nd = cpbf.read_cpbf(spark, f"{tmp}/nodes", cpbf.KIND_NODES)
        wd = cpbf.read_cpbf(spark, f"{tmp}/ways", cpbf.KIND_WAYS)
        rd = cpbf.read_cpbf(spark, f"{tmp}/rels", cpbf.KIND_RELATIONS)
        tag_crc = (
            "aggregate(transform(map_entries(tags), "
            "e -> crc32(cast(concat(e.key, '=', e.value) as binary))), "
            "0L, (a, x) -> a + x)"
        )
        n_stats = nd.select(
            F.lit("nodes").alias("kind"),
            "id",
            (F.col("lat").cast("long") + F.col("lon").cast("long")).alias("payload"),
            F.size(F.map_keys("tags")).cast("long").alias("ntags"),
            F.expr(tag_crc).alias("tcrc"),
        )
        w_stats = wd.select(
            F.lit("ways").alias("kind"),
            "id",
            F.expr("aggregate(refs, 0L, (a, x) -> a + x)").alias("payload"),
            F.size(F.map_keys("tags")).cast("long").alias("ntags"),
            F.expr(tag_crc).alias("tcrc"),
        )
        # members checksum folds mtype, delta-coded ref AND role strings —
        # any codec slip in the member stream breaks the hash
        r_stats = rd.select(
            F.lit("relations").alias("kind"),
            "id",
            F.expr(
                "aggregate(transform(members, m -> cast(m.mtype as long) * 1000003 "
                "+ m.ref + crc32(cast(m.role as binary))), 0L, (a, x) -> a + x)"
            ).alias("payload"),
            F.size(F.map_keys("tags")).cast("long").alias("ntags"),
            F.expr(tag_crc).alias("tcrc"),
        )
        return (
            n_stats.unionAll(w_stats).unionAll(r_stats)
            .groupBy("kind")
            .agg(
                F.count("*").alias("n"),
                F.sum("id").alias("id_sum"),
                F.sum("payload").alias("payload_sum"),
                F.sum("ntags").alias("n_tags"),
                F.sum("tcrc").alias("tag_crc_sum"),
            )
            .orderBy("kind")
            .localCheckpoint()  # materialize before the tmp dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("pbf_ingest_stats", None)
def pbf_ingest_stats(spark, sf):
    """S1 — the REAL .osm.pbf protobuf front door (SURVEY §2.1 S1, VERDICT
    r4 ask #1): the entity fixtures are ENCODED into a spec-valid OSM PBF
    file (BlobHeader/Blob framing, zlib PrimitiveBlocks, DenseNodes,
    delta-packed refs/memids, string-table tags), decoded back through the
    distributed blob-index + seek-read path (sources/osmpbf.py), and
    checksummed per entity kind with the SAME stat formula as
    cpbf_ingest_stats — the golden twin computes those stats straight from
    the fixture tables, so any wire-format slip (zigzag, delta restart,
    keys_vals delimiting, member roles) breaks the hash."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_relations, gen_ways
    from coords_spark.sources import osmpbf

    tmp = tempfile.mkdtemp(prefix="osmpbf_")
    try:
        p = f"{tmp}/mini.osm.pbf"
        osmpbf.write_osmpbf(
            p,
            nodes=gen_nodes(4000),
            ways=gen_ways(600, 4000),
            relations=gen_relations(200)[0],
            rows_per_block=512,
        )
        nd = osmpbf.read_osmpbf(spark, p, osmpbf.KIND_NODES)
        wd = osmpbf.read_osmpbf(spark, p, osmpbf.KIND_WAYS)
        rd = osmpbf.read_osmpbf(spark, p, osmpbf.KIND_RELATIONS)
        tag_crc = (
            "aggregate(transform(map_entries(tags), "
            "e -> crc32(cast(concat(e.key, '=', e.value) as binary))), "
            "0L, (a, x) -> a + x)"
        )
        n_stats = nd.select(
            F.lit("nodes").alias("kind"),
            "id",
            (F.col("lat").cast("long") + F.col("lon").cast("long")).alias("payload"),
            F.size(F.map_keys("tags")).cast("long").alias("ntags"),
            F.expr(tag_crc).alias("tcrc"),
        )
        w_stats = wd.select(
            F.lit("ways").alias("kind"),
            "id",
            F.expr("aggregate(refs, 0L, (a, x) -> a + x)").alias("payload"),
            F.size(F.map_keys("tags")).cast("long").alias("ntags"),
            F.expr(tag_crc).alias("tcrc"),
        )
        r_stats = rd.select(
            F.lit("relations").alias("kind"),
            "id",
            F.expr(
                "aggregate(transform(members, m -> cast(m.mtype as long) * 1000003 "
                "+ m.ref + crc32(cast(m.role as binary))), 0L, (a, x) -> a + x)"
            ).alias("payload"),
            F.size(F.map_keys("tags")).cast("long").alias("ntags"),
            F.expr(tag_crc).alias("tcrc"),
        )
        return (
            n_stats.unionAll(w_stats).unionAll(r_stats)
            .groupBy("kind")
            .agg(
                F.count("*").alias("n"),
                F.sum("id").alias("id_sum"),
                F.sum("payload").alias("payload_sum"),
                F.sum("ntags").alias("n_tags"),
                F.sum("tcrc").alias("tag_crc_sum"),
            )
            .orderBy("kind")
            .localCheckpoint()  # materialize before the tmp dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def render_bbox_build(spark, sf, tmp: str) -> str:
    """BUILD phase of the render-bbox round trip: chunk the order-derived
    points and materialize an icepick table under tmp. Split out so
    bench.py can time build and read separately (VERDICT r4 ask #5 — the
    monolithic query's wall was ~90% table-build, mislabelled as a read)."""
    from coords_spark.operators import ingest, tiling

    o = (
        _t(spark, sf, "orders")
        .select(F.col("o_orderkey").alias("image_id"), F.xxhash64("o_orderkey").alias("phash"))
        # orders is a single-row-group file: without an exchange every
        # Arrow stage below runs as ONE task (CLAUDE.md gotcha)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # the fused ingest hot path (anchor+cell one Arrow stage; split set AND
    # chunk weights in one logical pass; explicit allocation at write) —
    # chunking semantics identical to the split-rule golden
    pts = ingest.with_anchor_cell(o, tiling.DEFAULT_BASE_LEVEL).withColumn(
        "nbytes", F.lit(128).cast("long")
    )
    split, weights = tiling.compute_split_set_and_weights(
        pts, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
    )
    chunked = ingest.with_anchor_cell_chunk(o, split, tiling.DEFAULT_BASE_LEVEL)
    path = f"{tmp}/points"
    tiling.materialize_chunk_table(chunked, path, chunk_weights=weights)
    return path


def render_bbox_read(spark, path: str):
    """READ phase: London-viewport fetch through the full pruning stack —
    bbox cover -> per-level chunk-id ranges (quadtree walk) -> multi-range
    manifest file pruning -> exact bbox predicate — aggregated per chunk."""
    from coords_spark.operators import ingest, tiling

    bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))  # London viewport
    got = ingest.render_read(spark, path, bbox, zoom=12, base_level=tiling.DEFAULT_BASE_LEVEL)
    return (
        got.groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_points"),
            F.sum(F.col("image_id").cast("long")).alias("key_sum"),
        )
        .orderBy("chunk_id")
    )


@_q("geo_render_bbox", None)
def geo_render_bbox(spark, sf):
    """The reference's primary user-facing READ (SURVEY §2.1 S5 / §3 E3
    render path): bbox+zoom viewport fetch. Chunks the order-derived points
    into an icepick table, then reads the London viewport through the full
    pruning stack and aggregates per chunk. Golden twin replicates the bbox
    filter + chunk assignment scalar-side. Bench accounting: bench.py times
    render_bbox_build and render_bbox_read separately."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="render_bbox_")
    try:
        path = render_bbox_build(spark, sf, tmp)
        return (
            render_bbox_read(spark, path)
            .localCheckpoint()  # materialize before the table dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("pbf_create_storage_stats", None)
def pbf_create_storage_stats(spark, sf):
    """E1 end-to-end from the REAL front door (SURVEY §3 E1,
    coordsCreateStorage <dest> <planet.pbf>): write a spec-valid mini
    .osm.pbf, read nodes+ways back through the blob-parallel protobuf
    reader, resolve (J1) -> envelope (T3) -> deepest cell (T4) -> chunk
    (T5) -> materialize an icepick table (S2/S4) -> read it back (S3) and
    roll up per chunk. The golden twin is the SAME scalar pipeline from
    the fixture tables (g_geo_osm_way_tiling's rows) — so the wire codec,
    the resolve join, the chunk rules AND the store roundtrip all gate one
    hash."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, resolve, tiling
    from coords_spark.sources import osmpbf
    from coords_spark.sources.icepick import IcepickTable

    tmp = tempfile.mkdtemp(prefix="pbf_e1_")
    try:
        p = f"{tmp}/mini.osm.pbf"
        osmpbf.write_osmpbf(
            p, nodes=gen_nodes(4000), ways=gen_ways(600, 4000), rows_per_block=512
        )
        nodes = osmpbf.read_osmpbf(spark, p, osmpbf.KIND_NODES)
        ways = osmpbf.read_osmpbf(spark, p, osmpbf.KIND_WAYS)
        resolved = resolve.resolve_ways(ways, nodes)
        g = geometry.with_geometry_cell(geometry.with_envelope(resolved)).withColumn(
            "nbytes", (F.size("pts") * 8 + 64).cast("long")
        )
        split = tiling.compute_split_set(
            g, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        chunked = tiling.with_chunk(g, split, base_level=tiling.DEFAULT_BASE_LEVEL)
        path = f"{tmp}/storage"
        tiling.materialize_chunk_table(
            chunked.select("way_id", "cell", "chunk_id", "pts"), path, key_col="way_id"
        )
        t = IcepickTable(path)
        assert t.verify_checksums()
        return (
            spark.read.parquet(*t.data_paths())
            .groupBy("chunk_id")
            .agg(F.count("*").alias("n_ways"), F.sum(F.size("pts")).alias("n_vertices"))
            .orderBy("chunk_id")
            .localCheckpoint()  # materialize before the tmp dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("incremental_update_apply", None)
def incremental_update_apply(spark, sf):
    """J3's intent end-to-end (VERDICT r4 ask #6): build a way-geometry
    chunk table, move ONE node (the first ref of the smallest way id) to
    Sydney, apply the diff incrementally (reverse-index join -> re-resolve
    -> re-chunk -> one commit_replace), and return the post-diff per-chunk
    rollup. The golden twin replays the whole thing scalar-side with the
    minicoords oracle, so a wrong chunk move, a leftover stale row, or an
    over-eager rewrite all break the hash."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, resolve, tiling, update
    from coords_spark.sources.icepick import IcepickTable

    nodes = spark.createDataFrame(gen_nodes(2000))
    ways = spark.createDataFrame(gen_ways(300, 2000))
    g = geometry.with_geometry_cell(
        geometry.with_envelope(resolve.resolve_ways(ways, nodes))
    ).withColumn("nbytes", (F.size("pts") * 8 + 64).cast("long"))
    split = tiling.compute_split_set(g, max_bytes=8 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL)
    tmp = tempfile.mkdtemp(prefix="inc_upd_")
    try:
        path = f"{tmp}/t"
        update.build_way_chunk_table(spark, nodes, ways, path, split)
        wid = ways.agg(F.min("id")).collect()[0][0]
        nid = ways.filter(F.col("id") == wid).select(F.element_at("refs", 1)).collect()[0][0]
        diff = spark.createDataFrame(
            [(int(nid), -338000000, 1512000000)], "id long, lat int, lon int"
        )
        update.apply_node_diff(spark, path, nodes, ways, diff, split)
        t = IcepickTable(path)
        return (
            spark.read.parquet(*t.data_paths())
            .groupBy("chunk_id")
            .agg(
                F.count("*").alias("n_ways"),
                F.sum(F.size("pts")).cast("long").alias("n_vertices"),
                F.sum("way_id").alias("way_id_sum"),
            )
            .orderBy("chunk_id")
            .localCheckpoint()  # materialize before the table dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("relation_diff_apply", None)
def relation_diff_apply(spark, sf):
    """Relation-diff apply end-to-end (VERDICT r5 ask #3): build a
    multipolygon chunk table from the relation fixture, re-member ONE
    relation (it takes another hotspot's rings) AND delete another, apply
    both as one incremental commit_replace, and return the post-diff
    per-chunk polygon rollup. Golden twin replays build + diff scalar-side
    (independent ring assembly + chunk rules in tools/gen_goldens.py), so
    a stale polygon row, an over-eager rewrite, or a wrong reassembly all
    break the hash."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_relations
    from coords_spark.operators import geometry, multipolygon, resolve, tiling, update
    from coords_spark.sources.icepick import IcepickTable

    relations_t, ring_ways_t = gen_relations(40)
    pl = relations_t.to_pylist()
    mps = [r for r in pl if any(m["role"] == "outer" for m in r["members"])]
    a, b, c = mps[0], mps[-1], mps[1]
    relations = spark.createDataFrame(relations_t)
    rw = spark.createDataFrame(ring_ways_t).select(F.col("id").alias("way_id"), "pts")
    polys = multipolygon.reconstruct_multipolygons(
        resolve.resolve_relation_members(relations, rw)
    )
    g = geometry.with_geometry_cell(
        geometry.with_envelope(polys, pts="outer")
    ).withColumn("nbytes", (F.size("outer") * 8 + 64).cast("long"))
    split = tiling.compute_split_set(
        g, max_bytes=4 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
    )
    tmp = tempfile.mkdtemp(prefix="rel_diff_")
    try:
        path = f"{tmp}/t"
        update.build_relation_chunk_table(spark, relations, rw, path, split)
        mod = {**a, "tags": dict(a["tags"]), "members": b["members"]}
        diff = spark.createDataFrame([mod], schema=relations.schema)
        deleted = spark.createDataFrame([(int(c["id"]),)], "relation_id long")
        update.apply_relation_diff(
            spark, path, diff, rw, deleted_relation_ids=deleted, split=split
        )
        t = IcepickTable(path)
        return (
            spark.read.parquet(*t.data_paths())
            .groupBy("chunk_id")
            .agg(
                F.count("*").alias("n_polys"),
                F.sum(F.size("outer")).cast("long").alias("outer_vertices"),
                F.sum(F.size("inners")).cast("long").alias("n_holes"),
                F.sum("relation_id").alias("rel_sum"),
            )
            .orderBy("chunk_id")
            .localCheckpoint()  # materialize before the table dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("pbf_create_tiles_stats", None)
def pbf_create_tiles_stats(spark, sf):
    """E3 composed end-to-end from the REAL front door (VERDICT r5 ask #5;
    SURVEY §3 E3): .osm.pbf -> blob-parallel protobuf read -> resolve (J1)
    -> envelope (T3) -> deepest cell (T4) -> chunk (T5) -> icepick
    materialize (S2/S4) -> render_read of the London viewport through the
    full pruning stack (S5) -> per-chunk rollup. ONE golden hash pins the
    whole reference pipeline: wire codec, resolve join, chunk rules, store
    roundtrip AND the viewport read contract. The bbox anchor is each
    way's FIRST vertex (lat/lon columns; pruning layers only shrink I/O —
    the exact anchor-in-bbox predicate is the semantic contract)."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, ingest, resolve, tiling
    from coords_spark.sources import osmpbf

    tmp = tempfile.mkdtemp(prefix="pbf_e3_")
    try:
        p = f"{tmp}/mini.osm.pbf"
        osmpbf.write_osmpbf(
            p, nodes=gen_nodes(4000), ways=gen_ways(600, 4000), rows_per_block=512
        )
        nodes = osmpbf.read_osmpbf(spark, p, osmpbf.KIND_NODES)
        ways = osmpbf.read_osmpbf(spark, p, osmpbf.KIND_WAYS)
        resolved = resolve.resolve_ways(ways, nodes)
        g = geometry.with_geometry_cell(geometry.with_envelope(resolved)).withColumn(
            "nbytes", (F.size("pts") * 8 + 64).cast("long")
        )
        split = tiling.compute_split_set(
            g, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        chunked = tiling.with_chunk(g, split, base_level=tiling.DEFAULT_BASE_LEVEL)
        rows = chunked.select(
            "way_id",
            "cell",
            "chunk_id",
            "pts",
            F.expr("pts[0].lat").alias("lat"),
            F.expr("pts[0].lon").alias("lon"),
        )
        path = f"{tmp}/tiles"
        tiling.materialize_chunk_table(rows, path, key_col="way_id")
        bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))  # London
        got = ingest.render_read(
            spark, path, bbox, zoom=12, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        return (
            got.groupBy("chunk_id")
            .agg(
                F.count("*").alias("n_ways"),
                F.sum(F.size("pts")).cast("long").alias("n_vertices"),
                F.sum("way_id").alias("way_id_sum"),
            )
            .orderBy("chunk_id")
            .localCheckpoint()  # materialize before the table dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("geo_render_map_stats", None)
def geo_render_map_stats(spark, sf):
    """COMPOSITE map tiles (the Mapnik-consumer artifact made computable):
    the line world's polylines AND the relation fixture's multipolygon
    fills composite into one mask per London-viewport tile (fills under
    strokes — mask OR), with absent layers rendering as zero. Pins the
    union of both tile sets, per-layer fan-outs, and the exact composite
    bytes. Golden twin: scalar line raster OR scalar scanline fill
    (tools/gen_goldens.py g_geo_render_map_stats)."""
    from coords_spark.fixtures import gen_nodes, gen_relations, gen_ways
    from coords_spark.operators import multipolygon, render, resolve

    nodes = spark.createDataFrame(gen_nodes(4000))
    ways = spark.createDataFrame(gen_ways(600, 4000))
    bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))  # London
    # anchor-in-viewport filter — the same S5 semantic render_read applies
    # when the line layer comes from a chunk table
    resolved = resolve.resolve_ways(ways, nodes).filter(
        F.expr("pts[0].lat").between(bbox[0], bbox[2])
        & F.expr("pts[0].lon").between(bbox[1], bbox[3])
    )
    relations, ring_ways = gen_relations(60)
    rel_df = spark.createDataFrame(relations)
    rw_df = spark.createDataFrame(ring_ways).select(F.col("id").alias("way_id"), "pts")
    mp = multipolygon.reconstruct_multipolygons(
        resolve.resolve_relation_members(rel_df, rw_df)
    )
    return (
        render.render_map_tiles(
            spark, None, None, bbox, zoom=8, ways=resolved, polys=mp
        )
        .select("tile_x", "tile_y", "n_ways", "n_polys", "n_px", "px_crc")
        .orderBy("tile_x", "tile_y")
    )


@_q("geo_render_polygons", None)
def geo_render_polygons(spark, sf):
    """Filled multipolygon raster tiles (VERDICT r6 ask #3): the shared
    relation fixture assembles through J2 + T8 (resolve_relation_members ->
    reconstruct_multipolygons), then render_polygon_tiles fills each
    viewport tile by the scanline even/odd integer rule
    (kernels/raster.py fill_rings — holes via parity, overlapping polygons
    OR). Output pins tile membership (outer-envelope rect), polygon
    fan-out, filled pixel counts AND the exact mask bytes (crc32). Golden
    twin: an independent per-scanline threshold-sort fill in
    tools/gen_goldens.py (the fill rule's third lockstep copy)."""
    from coords_spark.fixtures import gen_relations
    from coords_spark.operators import multipolygon, render, resolve

    relations, ring_ways = gen_relations(60)
    rel_df = spark.createDataFrame(relations)
    rw_df = spark.createDataFrame(ring_ways).select(F.col("id").alias("way_id"), "pts")
    members = resolve.resolve_relation_members(rel_df, rw_df)
    mp = multipolygon.reconstruct_multipolygons(members)
    bbox = (int(-85.0e7), int(-179.9e7), int(85.0e7), int(179.9e7))
    return (
        render.render_polygon_tiles(spark, None, bbox, zoom=7, polys=mp)
        .select("tile_x", "tile_y", "n_polys", "n_px", "px_crc")
        .orderBy("tile_x", "tile_y")
    )


@_q("geo_render_raster", None)
def geo_render_raster(spark, sf):
    """Raster tile render end-to-end (E3's true last mile): chunk table ->
    London-viewport pruned read (S5) -> per-tile deterministic polyline
    rasterization (kernels/raster.py, integer sampling rule) at zoom 8.
    Output pins tile membership, way fan-out, pixel counts AND the exact
    mask bytes (crc32) per tile; the golden twin re-derives every pixel
    with an independent per-sample scalar loop (tools/gen_goldens.py).
    The encoded payload column is exercised by pytest (decode == mask)
    and dropped here — the crc already pins its content."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, render, resolve, tiling

    tmp = tempfile.mkdtemp(prefix="render_raster_")
    try:
        nodes = spark.createDataFrame(gen_nodes(4000))
        ways = spark.createDataFrame(gen_ways(600, 4000))
        resolved = resolve.resolve_ways(ways, nodes)
        g = geometry.with_geometry_cell(geometry.with_envelope(resolved)).withColumn(
            "nbytes", (F.size("pts") * 8 + 64).cast("long")
        )
        split = tiling.compute_split_set(
            g, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        chunked = tiling.with_chunk(g, split, base_level=tiling.DEFAULT_BASE_LEVEL)
        rows = chunked.select(
            "way_id",
            "cell",
            "chunk_id",
            "pts",
            F.expr("pts[0].lat").alias("lat"),
            F.expr("pts[0].lon").alias("lon"),
        )
        path = f"{tmp}/tiles"
        tiling.materialize_chunk_table(rows, path, key_col="way_id")
        bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))  # London
        return (
            render.render_tile_images(spark, path, bbox, zoom=8, tile_px=256)
            .select("tile_x", "tile_y", "n_ways", "n_px", "px_crc")
            .orderBy("tile_x", "tile_y")
            .localCheckpoint()  # materialize before the table dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("pyramid_table_stats", None)
def pyramid_table_stats(spark, sf):
    """The pyramid THROUGH THE TILE SINK: same world and viewport as
    geo_render_pyramid, but materialized with build_pyramid_table (base
    renders from geometry; every coarser level reads its children back
    from the icepick sink, one committed group per level) and read back
    from the table. Must land on the SAME golden rows as the in-memory
    pyramid — the sink's commit/read-back path must be transparent, so
    the oracle maps to g_geo_render_pyramid."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, render, resolve, tiling

    tmp = tempfile.mkdtemp(prefix="pyr_table_")
    try:
        nodes = spark.createDataFrame(gen_nodes(4000))
        ways = spark.createDataFrame(gen_ways(600, 4000))
        resolved = resolve.resolve_ways(ways, nodes)
        g = geometry.with_geometry_cell(geometry.with_envelope(resolved)).withColumn(
            "nbytes", (F.size("pts") * 8 + 64).cast("long")
        )
        split = tiling.compute_split_set(
            g, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        chunked = tiling.with_chunk(g, split, base_level=tiling.DEFAULT_BASE_LEVEL)
        rows = chunked.select(
            "way_id",
            "cell",
            "chunk_id",
            "pts",
            F.expr("pts[0].lat").alias("lat"),
            F.expr("pts[0].lon").alias("lon"),
        )
        path = f"{tmp}/tiles"
        tiling.materialize_chunk_table(rows, path, key_col="way_id")
        bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))  # London
        t = render.build_pyramid_table(
            spark, path, f"{tmp}/pyramid", bbox, zoom=8, min_zoom=6, tile_px=256
        )
        return (
            spark.read.parquet(*t.data_paths())
            .select("zoom", "tile_x", "tile_y", "n_src", "n_px", "px_crc")
            .orderBy("zoom", "tile_x", "tile_y")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("vector_tile_pyramid_stats", None)
def vector_tile_pyramid_stats(spark, sf):
    """Per-zoom LOD vector tiles (VERDICT r6 ask #4): same world/table as
    vector_tiles_stats, but zooms 8..6 each assemble from geometry
    Douglas-Peucker-simplified at THAT zoom's pixel tolerance with
    sub-pixel ways dropped (T7 composed with the vector-tile fan-out — a
    coarse tile carries coarse geometry, the REF src/lod/ shape). The crc
    pins the exact per-level payload bytes; golden twin: scalar DP +
    drop rule + the shared scalar blob assembly (tools/gen_goldens.py
    g_vector_tile_pyramid_stats)."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, render, resolve, tiling

    tmp = tempfile.mkdtemp(prefix="vt_pyramid_")
    try:
        nodes = spark.createDataFrame(gen_nodes(4000))
        ways = spark.createDataFrame(gen_ways(600, 4000))
        resolved = resolve.resolve_ways(ways, nodes)
        g = geometry.with_geometry_cell(geometry.with_envelope(resolved)).withColumn(
            "nbytes", (F.size("pts") * 8 + 64).cast("long")
        )
        split = tiling.compute_split_set(
            g, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        chunked = tiling.with_chunk(g, split, base_level=tiling.DEFAULT_BASE_LEVEL)
        rows = chunked.select(
            "way_id",
            "cell",
            "chunk_id",
            "pts",
            F.expr("pts[0].lat").alias("lat"),
            F.expr("pts[0].lon").alias("lon"),
        )
        path = f"{tmp}/tiles"
        tiling.materialize_chunk_table(rows, path, key_col="way_id")
        bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))  # London
        return (
            render.vector_tile_pyramid(spark, path, bbox, zoom=8, min_zoom=6)
            .select(
                "zoom", "tile_x", "tile_y", "n_ways", "n_geoms", "n_segs",
                "payload_crc",
            )
            .orderBy("zoom", "tile_x", "tile_y")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("vector_tiles_stats", None)
def vector_tiles_stats(spark, sf):
    """VECTOR tiles of the London viewport (the Mapnik-feed shape as a
    per-tile artifact): same world/table as geo_render_raster, but each
    tile carries its ways' in-tile geometry as GenericGeometry-style LINE
    blobs in tile-local pixel coords — one blob per maximal run of
    consecutive segments, concatenated in (way_id, seg_idx) order. The
    crc pins the exact payload bytes; the golden twin re-derives
    membership (scalar piece fan-out), runs, and the blob layout with an
    inline struct.pack encoder independent of kernels/geomblob."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, render, resolve, tiling

    tmp = tempfile.mkdtemp(prefix="vector_tiles_")
    try:
        nodes = spark.createDataFrame(gen_nodes(4000))
        ways = spark.createDataFrame(gen_ways(600, 4000))
        resolved = resolve.resolve_ways(ways, nodes)
        g = geometry.with_geometry_cell(geometry.with_envelope(resolved)).withColumn(
            "nbytes", (F.size("pts") * 8 + 64).cast("long")
        )
        split = tiling.compute_split_set(
            g, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        chunked = tiling.with_chunk(g, split, base_level=tiling.DEFAULT_BASE_LEVEL)
        rows = chunked.select(
            "way_id",
            "cell",
            "chunk_id",
            "pts",
            F.expr("pts[0].lat").alias("lat"),
            F.expr("pts[0].lon").alias("lon"),
        )
        path = f"{tmp}/tiles"
        tiling.materialize_chunk_table(rows, path, key_col="way_id")
        bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))  # London
        return (
            render.vector_tiles(spark, path, bbox, zoom=8, tile_px=256)
            .select("tile_x", "tile_y", "n_ways", "n_geoms", "n_segs", "payload_crc")
            .orderBy("tile_x", "tile_y")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("geo_render_pyramid", None)
def geo_render_pyramid(spark, sf):
    """Raster tile PYRAMID (zoom levels 8..6 of the London viewport):
    base zoom rendered from geometry (geo_render_raster's pipeline), then
    overzoom_tiles rolls each level up — parents mosaic <=4 children and
    2x max-pool (masks are 0/255 so max == OR; thin lines survive every
    level). One shuffle per level with a hard fan-in of 4. Output pins
    tile membership, fan-out (ways at base, children above), pixel counts
    and exact mask bytes (crc32) per (zoom, tile); the golden twin
    re-derives the base raster per-sample and pools per-pixel
    (tools/gen_goldens.py g_geo_render_pyramid)."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_nodes, gen_ways
    from coords_spark.operators import geometry, render, resolve, tiling

    tmp = tempfile.mkdtemp(prefix="render_pyramid_")
    try:
        nodes = spark.createDataFrame(gen_nodes(4000))
        ways = spark.createDataFrame(gen_ways(600, 4000))
        resolved = resolve.resolve_ways(ways, nodes)
        g = geometry.with_geometry_cell(geometry.with_envelope(resolved)).withColumn(
            "nbytes", (F.size("pts") * 8 + 64).cast("long")
        )
        split = tiling.compute_split_set(
            g, max_bytes=64 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        chunked = tiling.with_chunk(g, split, base_level=tiling.DEFAULT_BASE_LEVEL)
        rows = chunked.select(
            "way_id",
            "cell",
            "chunk_id",
            "pts",
            F.expr("pts[0].lat").alias("lat"),
            F.expr("pts[0].lon").alias("lon"),
        )
        path = f"{tmp}/tiles"
        tiling.materialize_chunk_table(rows, path, key_col="way_id")
        bbox = (int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7))  # London
        return (
            render.render_tile_pyramid(
                spark, path, bbox, zoom=8, min_zoom=6, tile_px=256
            )
            .select("zoom", "tile_x", "tile_y", "n_src", "n_px", "px_crc")
            .orderBy("zoom", "tile_x", "tile_y")
            .localCheckpoint()  # materialize before the table dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("icepick_compact_stats", None)
def icepick_compact_stats(spark, sf):
    """Maintenance lifecycle end-to-end (VERDICT r5 ask #4): grow a table
    through 6 small commits, compact() them into target-size files (one
    atomic commit_replace, chunk clustering preserved), expire_snapshots
    (keep_n=1) to reclaim the superseded files, and report the end state —
    content aggregates read back AFTER the lifecycle plus the file and
    manifest counts the lifecycle contract fixes. Golden twin states the
    same scalars independently from the contract."""
    import os as _os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from coords_spark.sources.icepick import IcepickTable

    tmp = tempfile.mkdtemp(prefix="compact_q_")
    try:
        t = IcepickTable.create(f"{tmp}/t")
        for b in range(6):
            stage = f"{tmp}/s{b}"
            _os.makedirs(stage)
            keys = list(range(b * 100, (b + 1) * 100))
            pq.write_table(
                pa.table(
                    {
                        "image_id": pa.array(keys, pa.int64()),
                        "chunk_id": pa.array([k % 7 for k in keys], pa.int64()),
                    }
                ),
                f"{stage}/part-0.parquet",
            )
            t.commit_staged(stage, group=f"b{b}")
        c = t.compact(spark, target_bytes=1 << 20)
        e = t.expire_snapshots(keep_n=1)
        df = spark.read.parquet(*t.data_paths())
        r = df.agg(
            F.count("*").alias("n"),
            F.sum("image_id").alias("s"),
            F.countDistinct("chunk_id").alias("d"),
        ).collect()[0]
        on_disk = len([n for n in _os.listdir(t.data_dir) if n.startswith("part-")])
        return spark.createDataFrame(
            [
                (
                    int(c["files_compacted"]),
                    int(c["files_written"]),
                    len(e["removed_files"]),
                    len(t.versions()),
                    int(on_disk),
                    int(r["n"]),
                    int(r["s"]),
                    int(r["d"]),
                )
            ],
            "files_compacted long, files_written long, files_removed long, "
            "n_snapshots long, files_on_disk long, n_rows long, key_sum long, "
            "n_chunks long",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("dirty_tiles_stats", None)
def dirty_tiles_stats(spark, sf):
    """Tile expiry for the shared update-world diff batches (the public
    osm2pgsql "expire-tiles" concept composed with the update family):
    for each composed batch, derive the post-batch node/way state in
    DataFrame-land (anti-join out changed ids, union upserts), compute
    the blast radius exactly as apply_diff_batch does (reverse-index
    explode against the broadcast changed-node set, plus the way diff
    itself), resolve the affected ways' OLD and NEW geometry, and emit
    render.dirty_tiles over zooms 12..9 — the distinct (zoom, tile) set a
    tile sink must re-render after the batch (deleted ways dirty their
    old tiles: erasure re-renders too). Batch 2 depends on batch-1 state.
    Golden twin: scalar dict apply + scalar mercator pixel fan-out +
    ancestor shifts (tools/gen_goldens.py g_dirty_tiles_stats)."""
    from coords_spark.fixtures import gen_update_diffs, gen_update_world
    from coords_spark.operators import render, resolve
    from coords_spark.streaming import update_stream as US

    nodes_rows, ways_rows, rels_rows = gen_update_world(10)
    b1, b2 = gen_update_diffs(nodes_rows, ways_rows, rels_rows)
    cur_nodes = spark.createDataFrame(
        nodes_rows, "id long, version int, lat int, lon int, tags map<string,string>"
    ).drop("tags")
    cur_ways = spark.createDataFrame(
        ways_rows, "id long, version int, refs array<long>, tags map<string,string>"
    ).drop("tags")
    out = None
    for bi, batch in enumerate((b1, b2), 1):
        b = spark.createDataFrame(batch, US.DIFF_SCHEMA)
        node_up = b.filter("kind = 0 AND action = 'upsert'").select(
            "id", "version", "lat", "lon"
        )
        node_ch = b.filter("kind = 0").select("id")
        way_up = b.filter("kind = 1 AND action = 'upsert'").select(
            "id", "version", "refs"
        )
        way_ch = b.filter("kind = 1").select("id")
        post_nodes = cur_nodes.join(node_ch, "id", "anti").unionByName(node_up)
        post_ways = cur_ways.join(way_ch, "id", "anti").unionByName(way_up)
        hit = (
            cur_ways.unionByName(post_ways)
            .select(F.col("id").alias("way_id"), F.explode("refs").alias("nid"))
            .join(F.broadcast(node_ch.withColumnRenamed("id", "nid")), "nid")
            .select("way_id")
        )
        aff = hit.unionAll(way_ch.withColumnRenamed("id", "way_id")).distinct()
        aff_id = aff.withColumnRenamed("way_id", "id")
        old_geom = resolve.resolve_ways(
            cur_ways.join(aff_id, "id", "semi"), cur_nodes
        )
        new_geom = resolve.resolve_ways(
            post_ways.join(aff_id, "id", "semi"), post_nodes
        )
        dirty = render.dirty_tiles(
            old_geom.unionByName(new_geom), zoom=12, min_zoom=9
        ).withColumn("batch", F.lit(bi).cast("long"))
        out = dirty if out is None else out.unionByName(dirty)
        cur_nodes, cur_ways = post_nodes.localCheckpoint(), post_ways.localCheckpoint()
    return out.select("batch", "zoom", "tile_x", "tile_y").orderBy(
        "batch", "zoom", "tile_x", "tile_y"
    )


@_q("osc_update_render_stats", None)
def osc_update_render_stats(spark, sf):
    """Continuous E3 capstone — the full reference-style live loop in one
    hash: the shared update world is built into id-keyed entity stores +
    the derived way-chunk table; the two composed diff batches are
    round-tripped through REAL `.osc.gz` osmChange files (write_osc ->
    binaryFile read_osc); each batch applies through the streaming core
    (apply_diff_batch — ledgered, dirty-first) which also appends its
    tile-expiry list; finally the dirty zoom-12 tiles are re-rendered
    from the POST entity-store state and the query returns their exact
    masks (n_ways, n_px, crc32 per tile). A wrong XML parse, a missed
    store upsert, an over/under blast radius, a wrong expiry list, or a
    wrong pixel all change the hash. Golden twin: scalar dict-apply +
    scalar piece fan-out + scalar raster (g_osc_update_render_stats)."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_update_diffs, gen_update_world
    from coords_spark.operators import entity_store as ES
    from coords_spark.operators import geometry, render, resolve, tiling, update
    from coords_spark.sources import osc
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming import update_stream as US

    nodes_rows, ways_rows, rels_rows = gen_update_world(10)
    b1, b2 = gen_update_diffs(nodes_rows, ways_rows, rels_rows)
    tmp = tempfile.mkdtemp(prefix="osc_e3_")
    try:
        nodes = spark.createDataFrame(
            nodes_rows, "id long, version int, lat int, lon int, tags map<string,string>"
        )
        ways = spark.createDataFrame(
            ways_rows, "id long, version int, refs array<long>, tags map<string,string>"
        )
        stores = {k: f"{tmp}/store_{k}" for k in ("nodes", "ways", "rels")}
        ES.build_entity_store(nodes, stores["nodes"], id_shift=6)
        ES.build_entity_store(ways, stores["ways"], id_shift=4)
        rels = spark.createDataFrame(
            rels_rows,
            "id long, version int, "
            "members array<struct<mtype: tinyint, ref: long, role: string>>, "
            "tags map<string,string>",
        )
        ES.build_entity_store(rels, stores["rels"], id_shift=2)
        g = geometry.with_geometry_cell(
            geometry.with_envelope(resolve.resolve_ways(ways, nodes))
        ).withColumn("nbytes", (F.size("pts") * 8 + 64).cast("long"))
        split = tiling.compute_split_set(g, max_bytes=4 * 1024)
        way_table = f"{tmp}/waychunks"
        update.build_way_chunk_table(spark, nodes, ways, way_table, split)
        # r7: persistent node->ways reverse index — the batches below plan
        # O(diff) (pruned lookups), results byte-identical to the legacy
        # full-explode path (pinned by tests/test_odiff.py)
        from coords_spark.operators import rindex as RI

        rindex_nw = f"{tmp}/rindex_nw"
        RI.build_rindex_store(spark, ways.select("id", "refs"), rindex_nw, id_shift=6)

        dirty_table = f"{tmp}/dirtytiles"
        for i, batch in enumerate((b1, b2)):
            p = f"{tmp}/diff-{i}.osc.gz"
            osc.write_osc(p, batch)
            US.apply_diff_batch(
                spark,
                osc.read_osc(spark, p),
                stores["nodes"],
                stores["ways"],
                stores["rels"],
                way_table,
                None,
                group=f"diff-{i}",
                dirty_table=dirty_table,
                rindex_store=rindex_nw,
            )

        dirty_base = (
            spark.read.parquet(*IcepickTable(dirty_table).data_paths())
            .filter(F.col("zoom") == 12)
            .select("tile_x", "tile_y")
            .distinct()
        )
        dirty_list = [(r["tile_x"], r["tile_y"]) for r in dirty_base.collect()]
        post_ways = resolve.resolve_ways(
            ES.read_entity_store(spark, stores["ways"]),
            ES.read_entity_store(spark, stores["nodes"]),
        )
        world_bbox = (-850_000_000, -1_799_999_999, 850_000_000, 1_799_999_999)
        return (
            render.render_tile_images(
                spark, None, world_bbox, zoom=12, tile_px=256, ways=post_ways,
                only_tiles=dirty_list,
            )
            .join(F.broadcast(dirty_base), ["tile_x", "tile_y"])
            .select("tile_x", "tile_y", "n_ways", "n_px", "px_crc")
            .orderBy("tile_x", "tile_y")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("update_stream_apply", None)
def update_stream_apply(spark, sf):
    """Continuous-update pipeline end-to-end: id-keyed entity stores for
    nodes/ways/relations (operators/entity_store.py) plus derived
    way-chunk and multipolygon tables, with TWO composed diff batches
    applied through the streaming core (update_stream.apply_diff_batch —
    the exact function the foreachBatch sink calls; stream==batch pinned
    by pytest). Batch 2 depends on batch-1 state (the same node moves
    twice), so a store that missed an upsert, an unre-resolved way, a
    stale polygon, or an over/under blast radius all change the final
    per-layer per-chunk rollup. Golden twin re-derives the end state
    scalar-side (dict apply + independent resolve/ring/chunk rules in
    tools/gen_goldens.py)."""
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_update_diffs, gen_update_world
    from coords_spark.operators import entity_store as ES
    from coords_spark.operators import geometry, resolve, tiling, update
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming import update_stream as US

    nodes_rows, ways_rows, rels_rows = gen_update_world(10)
    b1, b2 = gen_update_diffs(nodes_rows, ways_rows, rels_rows)
    tmp = tempfile.mkdtemp(prefix="upd_stream_")
    try:
        nodes = spark.createDataFrame(
            nodes_rows, "id long, version int, lat int, lon int, tags map<string,string>"
        )
        ways = spark.createDataFrame(
            ways_rows, "id long, version int, refs array<long>, tags map<string,string>"
        )
        rels = spark.createDataFrame(
            rels_rows,
            "id long, version int, "
            "members array<struct<mtype: tinyint, ref: long, role: string>>, "
            "tags map<string,string>",
        )
        stores = {k: f"{tmp}/store_{k}" for k in ("nodes", "ways", "rels")}
        ES.build_entity_store(nodes, stores["nodes"], id_shift=6)
        ES.build_entity_store(ways, stores["ways"], id_shift=4)
        ES.build_entity_store(rels, stores["rels"], id_shift=2)
        g = geometry.with_geometry_cell(
            geometry.with_envelope(resolve.resolve_ways(ways, nodes))
        ).withColumn("nbytes", (F.size("pts") * 8 + 64).cast("long"))
        split = tiling.compute_split_set(
            g, max_bytes=4 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        way_table, rel_table = f"{tmp}/way_chunks", f"{tmp}/rel_chunks"
        update.build_way_chunk_table(spark, nodes, ways, way_table, split)
        update.build_relation_chunk_table(
            spark, rels, resolve.resolve_ways(ways, nodes), rel_table, split
        )
        # r7: both persistent reverse indexes (node->ways, way->relations)
        # — the O(diff) blast-radius path; byte-identical results pinned by
        # tests/test_odiff.py
        from coords_spark.operators import rindex as RI

        rindex_nw, rindex_wr = f"{tmp}/rindex_nw", f"{tmp}/rindex_wr"
        RI.build_rindex_store(spark, ways.select("id", "refs"), rindex_nw, id_shift=6)
        RI.build_rindex_store(
            spark,
            rels.select(
                "id",
                F.expr(
                    "transform(filter(members, m -> m.mtype = 1), m -> m.ref)"
                ).alias("refs"),
            ),
            rindex_wr,
            ref_col="way_id",
            ids_col="relation_ids",
            id_shift=4,
        )
        for i, rows in enumerate((b1, b2)):
            US.apply_diff_batch(
                spark,
                spark.createDataFrame(rows, US.DIFF_SCHEMA),
                stores["nodes"],
                stores["ways"],
                stores["rels"],
                way_table,
                rel_table,
                group=f"diff-{i}",
                rindex_store=rindex_nw,
                rel_rindex_store=rindex_wr,
            )
        pt_sum = "aggregate({c}, 0L, (a, p) -> a + p.lat + p.lon)"
        layers = [
            ES.read_entity_store(spark, stores["nodes"], with_chunk=True)
            .groupBy("chunk_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("id").alias("id_sum"),
                F.sum("version").alias("a1"),
                (F.sum("lat") + F.sum("lon")).alias("a2"),
            )
            .withColumn("layer", F.lit("nodes_store")),
            ES.read_entity_store(spark, stores["ways"], with_chunk=True)
            .groupBy("chunk_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("id").alias("id_sum"),
                F.sum("version").alias("a1"),
                F.sum(F.expr("aggregate(refs, 0L, (a, x) -> a + x)")).alias("a2"),
            )
            .withColumn("layer", F.lit("ways_store")),
            ES.read_entity_store(spark, stores["rels"], with_chunk=True)
            .groupBy("chunk_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("id").alias("id_sum"),
                F.sum("version").alias("a1"),
                F.sum(F.size("members")).cast("long").alias("a2"),
            )
            .withColumn("layer", F.lit("rels_store")),
            spark.read.parquet(*IcepickTable(way_table).data_paths())
            .groupBy("chunk_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("way_id").alias("id_sum"),
                F.sum(F.size("pts")).cast("long").alias("a1"),
                F.sum(F.expr(pt_sum.format(c="pts"))).alias("a2"),
            )
            .withColumn("layer", F.lit("way_chunks")),
            spark.read.parquet(*IcepickTable(rel_table).data_paths())
            .groupBy("chunk_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("relation_id").alias("id_sum"),
                F.sum(F.size("outer")).cast("long").alias("a1"),
                F.sum(F.expr(pt_sum.format(c="outer"))).alias("a2"),
            )
            .withColumn("layer", F.lit("rel_chunks")),
        ]
        out = layers[0]
        for lyr in layers[1:]:
            out = out.unionByName(lyr)
        return (
            out.select(
                "layer",
                F.col("chunk_id").cast("long").alias("chunk_id"),
                F.col("n").cast("long").alias("n"),
                F.col("id_sum").cast("long").alias("id_sum"),
                F.col("a1").cast("long").alias("a1"),
                F.col("a2").cast("long").alias("a2"),
            )
            .orderBy("layer", "chunk_id")
            .localCheckpoint()  # materialize before the table dirs are removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("osc_parse_rollup", None)
def osc_parse_rollup(spark, sf):
    """Real `.osc` (osmChange XML) front door: the two composed diff
    batches are WRITTEN as replication files (one gzip'd, one plain —
    sources/osc.py's spec-valid writer), read back through the Spark
    binaryFile -> mapInPandas parser, and rolled up per (kind, action).
    Coordinate sums pin the integer string math (no float round-trip),
    ref/member sums pin list parsing, n_tags pins attribute escaping.
    Golden twin computes the same rollup from the fixture rows directly
    (tools/gen_goldens.py) — the XML layer must be transparent."""
    import os
    import shutil
    import tempfile

    from coords_spark.fixtures import gen_update_diffs, gen_update_world
    from coords_spark.sources import osc

    b1, b2 = gen_update_diffs(*gen_update_world(10))
    tmp = tempfile.mkdtemp(prefix="osc_roll_")
    try:
        d = f"{tmp}/diffs"
        os.makedirs(d)
        osc.write_osc(f"{d}/000001.osc.gz", b1)
        osc.write_osc(f"{d}/000002.osc", b2)
        return (
            osc.read_osc(spark, d)
            .groupBy("kind", "action")
            .agg(
                F.count("*").alias("n"),
                F.sum("id").alias("id_sum"),
                F.sum("version").alias("ver_sum"),
                F.sum(F.coalesce(F.col("lat") + F.col("lon"), F.lit(0))).alias("coord_sum"),
                F.sum(
                    F.coalesce(F.expr("aggregate(refs, 0L, (a, x) -> a + x)"), F.lit(0))
                ).alias("ref_sum"),
                F.sum(
                    F.coalesce(
                        F.expr("aggregate(members, 0L, (a, m) -> a + m.ref)"), F.lit(0)
                    )
                ).alias("member_ref_sum"),
                F.sum(F.coalesce(F.size("tags"), F.lit(0))).alias("n_tags"),
            )
            .select(
                F.col("kind").cast("long").alias("kind"),
                F.col("action").alias("action"),
                F.col("n").cast("long").alias("n"),
                F.col("id_sum").cast("long").alias("id_sum"),
                F.col("ver_sum").cast("long").alias("ver_sum"),
                F.col("coord_sum").cast("long").alias("coord_sum"),
                F.col("ref_sum").cast("long").alias("ref_sum"),
                F.col("member_ref_sum").cast("long").alias("member_ref_sum"),
                F.col("n_tags").cast("long").alias("n_tags"),
            )
            .orderBy("kind", "action")
            .localCheckpoint()  # materialize before the diff dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("icepick_time_travel", None)
def icepick_time_travel(spark, sf):
    """Snapshot isolation (S2/S3): two deterministic commits, then read the
    table AT EACH manifest version — the first snapshot must keep returning
    exactly the first batch after the second commit lands (append-only
    manifests, Iceberg semantics). Output: (snap, n_rows, key_sum) per
    snapshot; golden twin computes both prefixes scalar-side."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from coords_spark.sources.icepick import IcepickTable

    tmp = tempfile.mkdtemp(prefix="icepick_tt_")
    try:
        t = IcepickTable.create(f"{tmp}/t")
        snaps = []
        for b, (lo, hi) in enumerate([(0, 700), (700, 1000)]):
            stage = f"{tmp}/stage{b}"
            import os as _os

            _os.makedirs(stage, exist_ok=True)
            keys = list(range(lo, hi))
            pq.write_table(
                pa.table({"image_id": pa.array(keys, pa.int64()),
                          "chunk_id": pa.array([k % 7 for k in keys], pa.int64())}),
                f"{stage}/part-0.parquet",
            )
            t.commit_staged(stage, group=f"b{b}")
            snaps.append(t.current_manifest()["version"])
        rows = []
        for i, v in enumerate(snaps):
            df = spark.read.parquet(*t.data_paths(version=v))
            r = df.agg(
                F.count("*").alias("n"), F.sum("image_id").alias("s")
            ).collect()[0]
            rows.append((i + 1, int(r["n"]), int(r["s"])))
        return spark.createDataFrame(rows, "snap int, n_rows long, key_sum long").orderBy(
            "snap"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("geo_render_tiles", None)
def geo_render_tiles(spark, sf):
    """Viewport -> per-TILE aggregation at the render zoom (the shape the
    reference's mapnik companion consumes: one output row per zoom-8 tile
    intersecting the viewport). Runs entirely on the base parquet points
    (no table build): exact bbox filter, cell-at-zoom encode, per-tile
    count + key checksum. Golden twin replicates the filter + cell id
    scalar-side."""
    from coords_spark.operators import ingest
    from coords_spark.operators.knn import cell_at_level_col

    pts = _points_from_orders(spark, sf)
    lat0, lon0, lat1, lon1 = int(50.0e7), int(-2.0e7), int(53.0e7), int(1.8e7)
    return (
        pts.filter(
            F.col("lat").between(lat0, lat1) & F.col("lon").between(lon0, lon1)
        )
        .withColumn("tile", cell_at_level_col(8))
        .groupBy("tile")
        .agg(
            F.count("*").alias("n_points"),
            F.sum(F.col("key").cast("long")).alias("key_sum"),
        )
        .orderBy("tile")
    )


@_q("embedding_ann_join_topk", None)
def embedding_ann_join_topk(spark, sf):
    """Query-SET ANN as a bucketed equi-join (the 100 TB shape: vectors
    keyed by their LSH bucket, queries exploded over multi-probe buckets,
    exact cosine re-rank confined to the bucket join)."""
    from coords_spark.operators import similarity

    e = _embs(spark, sf)
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qe")
    )
    return similarity.ann_topk_join(
        e, queries, k=5, n_planes=8, probe_hamming=2
    ).select("qid", "vec_id", F.round("cosine", 5).alias("sim"), "rank")


@_q("dedup_embedding_cosine_pairs", None)
def dedup_embedding_cosine_pairs(spark, sf):
    """Embedding-cosine near-dup via banded hyperplane LSH + exact verify,
    under the hash gate: 5 exact clones are planted (ids +10000) — the
    operator must surface exactly those pairs at cosine 1 (the corpus'
    max natural cosine is ~0.51 at this sf). Golden twin replicates the
    banding + verification scalar-side."""
    from coords_spark.operators import dedup

    e = _embs(spark, sf).select("vec_id", "embedding")
    clones = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    return dedup.embedding_near_dups(
        e.unionAll(clones), threshold=0.999, n_bands=4, planes_per_band=4
    ).orderBy("id_a", "id_b")


@_q("embedding_ivf_topk", None)
def embedding_ivf_topk(spark, sf):
    """IVF-bucketed approximate top-k for a query set (the task brief's
    "IVF or LSH-bucketed variant" — the IVF path; embedding_ann_join_topk
    is the LSH path). Deterministic sampled coarse quantizer, cell
    equi-join, exact re-rank; golden twin from the independent scalar
    replication in gen_goldens."""
    from coords_spark.operators import similarity

    e = _t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qe")
    )
    return similarity.ivf_topk_join(e, queries, k=5, n_centroids=16, nprobe=3).select(
        "qid", "vec_id", F.round("cosine", 5).alias("sim"), "rank"
    )


@_q(
    "scalar_functions_suite",
    """
    SELECT UPPER(SUBSTR(event_type, 1, 3))                     AS ev3,
           CAST(LENGTH(event_type) AS BIGINT)                  AS ev_len,
           CAST(YEAR(ts) AS INT)                               AS yr,
           CAST(MONTH(ts) AS INT)                              AS mo,
           CAST(json_extract_string(props, '$.k') AS INT) % 5  AS k_mod,
           COUNT(*)                                            AS n,
           ROUND(SUM(SQRT(ABS(value))), 2)                     AS sum_sqrt,
           ROUND(SUM(LN(ABS(value) + 1)), 2)                   AS sum_ln,
           ROUND(SUM(POWER(value / 100, 2)), 2)                AS sum_pow
    FROM events
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def scalar_functions_suite(spark, sf):
    """One consolidated §2.8 scalar-function gate — string (upper/substr/
    length), date (year/month), json (get_json_object) and math (sqrt/ln/
    pow/abs) expressions exercised in a single plan, so the driver window
    spends one slot keeping all four function families hash-verified
    (the per-family twins remain registered below the window)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        F.upper(F.substring("event_type", 1, 3)).alias("ev3"),
        F.length("event_type").cast("long").alias("ev_len"),
        F.year("ts").cast("int").alias("yr"),
        F.month("ts").cast("int").alias("mo"),
        (F.get_json_object("props", "$.k").cast("int") % 5).alias("k_mod"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.sqrt(F.abs("value"))), 2).alias("sum_sqrt"),
        F.round(F.sum(F.log(F.abs(F.col("value")) + 1)), 2).alias("sum_ln"),
        F.round(F.sum(F.pow(F.col("value") / 100, 2)), 2).alias("sum_pow"),
    )


@_q(
    "stateful_running_user_stats",
    """
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total,
           MAX(epoch_us(ts)) AS last_event_us
    FROM events GROUP BY user_id
    """,
)
def stateful_running_user_stats(spark, sf):
    """Custom stateful streaming operator (§2.9, applyInPandasWithState)
    under the driver hash gate: the events table is replayed as THREE file
    micro-batches (each user's rows span batches, so per-key state truly
    accumulates across the state store), and the FINAL state row per user
    must equal the batch groupBy — which is exactly the SQL twin. Sum is
    rounded to 2dp because the stream accumulates in batch order."""
    import os
    import shutil
    import tempfile

    from pyspark.sql.window import Window

    from coords_spark.streaming.stateful import running_user_stats

    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id", "value")
    n = ev.count()
    tmp = tempfile.mkdtemp(prefix="stateful_drv_")
    try:
        src = os.path.join(tmp, "events_in")
        (
            ev.repartition(1)
            .sortWithinPartitions("event_id")
            .write.option("maxRecordsPerFile", max(1, (n + 2) // 3))
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        name = "mem_" + os.path.basename(tmp).replace("-", "_").replace(".", "_")
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        mem = spark.table(name)
        # final state per user = the row with the largest running count
        # (n_events strictly increases each time a user's group is updated)
        w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
        return (
            mem.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "user_id",
                "n_events",
                F.round("total", 2).alias("total"),
                "last_event_us",
            )
            .localCheckpoint()  # materialize before the input dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q(
    "stream_click_purchase_join",
    """
    SELECT p.event_id AS purchase_id,
           COUNT(*) AS n_clicks,
           MAX(epoch_us(c.ts)) AS last_click_us
    FROM events p JOIN events c ON c.user_id = p.user_id
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 7 DAY
    GROUP BY 1
    """,
)
def stream_click_purchase_join(spark, sf):
    """STREAM-STREAM interval join under the driver hash gate (§2.9): the
    events table replays as 3 file micro-batches feeding two independent
    file-source streams (clicks / purchases); every cross-batch pair must
    still be found (join state buffers both sides; watermark=None keeps
    eviction off so the result equals the batch join — the SQL twin —
    exactly). The memory sink holds raw pairs; the per-purchase rollup is
    a plain batch aggregate over it."""
    import os
    import shutil
    import tempfile

    from coords_spark.streaming import click_purchase_interval_join, stream_events_from_dir

    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id", "event_type")
    n = ev.count()
    tmp = tempfile.mkdtemp(prefix="ssjoin_drv_")
    try:
        src = os.path.join(tmp, "events_in")
        (
            ev.repartition(1)
            .sortWithinPartitions("event_id")
            .write.option("maxRecordsPerFile", max(1, (n + 2) // 3))
            .parquet(src)
        )
        clicks = stream_events_from_dir(spark, src).filter(F.col("event_type") == "click")
        purchases = stream_events_from_dir(spark, src).filter(
            F.col("event_type") == "purchase"
        )
        joined = click_purchase_interval_join(clicks, purchases, lookback="7 days")
        name = "mem_" + os.path.basename(tmp).replace("-", "_").replace(".", "_")
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.table(name)
            .groupBy(F.col("purchase_id"))
            .agg(
                F.count("*").alias("n_clicks"),
                F.unix_micros(F.max("click_ts").cast("timestamp")).alias("last_click_us"),
            )
            .localCheckpoint()  # materialize before the input dir is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q("ingest_ledger_invariant", None)
def ingest_ledger_invariant(spark, sf):
    """Exactly-once streaming chunk ingest (§2.9 × north_star resume) under
    the driver hash gate: three image drops stream into an icepick table
    (one atomic manifest commit per micro-batch), then the query RESTARTS
    on the same checkpoint — the replay must re-ingest nothing. Output is
    the per-group ledger lineage (row count + distinct chunks), made
    batch-order-invariant by ranking groups on n_rows (drop sizes are
    distinct by construction), plus the checksum + restart invariants.
    Golden twin: independent scalar chunk assignment in gen_goldens.py."""
    import os
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow.parquet as papq

    from coords_spark.fixtures import gen_images
    from coords_spark.operators import ingest, tiling
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming import stream_images_from_dir, stream_ingest_images

    tmp = tempfile.mkdtemp(prefix="ingest_ledger_")
    try:
        src = os.path.join(tmp, "drops")
        os.makedirs(src)
        for i, (cnt, off) in enumerate([(120, 0), (100, 120), (80, 220)]):
            papq.write_table(
                gen_images(cnt, offset=off), os.path.join(src, f"drop-{i}.parquet")
            )
        pts = ingest.with_anchor_cell(
            spark.createDataFrame(gen_images(300, with_bytes=False)).select(
                "image_id", "phash"
            ),
            tiling.DEFAULT_BASE_LEVEL,
        ).withColumn("nbytes", F.lit(4096).cast("long"))
        split = tiling.compute_split_set(
            pts, max_bytes=256 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL
        )
        table_path = os.path.join(tmp, "table")
        ckpt = os.path.join(tmp, "ckpt")
        for _ in range(2):  # second run = restart on the same checkpoint: no-op
            q = stream_ingest_images(
                stream_images_from_dir(spark, src, max_files=1),
                table_path,
                split,
                tiling.DEFAULT_BASE_LEVEL,
                ckpt,
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        t = IcepickTable(table_path)
        checksums_ok = bool(t.verify_checksums())
        stable = t.total_rows() == 300 and len(t.committed_groups()) == 3
        by_group: dict[str, list] = {}
        for e in t.files():
            g = by_group.setdefault(e["group"], [0, set()])
            g[0] += e["rows"]
            chunks = papq.read_table(
                os.path.join(t.path, e["path"]), columns=["chunk_id"]
            ).column("chunk_id")
            g[1].update(chunks.to_pylist())
        stats = sorted(((n, len(ch)) for n, ch in by_group.values()), reverse=True)
        rows = pd.DataFrame(
            {
                "grp_rank": range(1, len(stats) + 1),
                "n_rows": [s[0] for s in stats],
                "n_chunks": [s[1] for s in stats],
                "checksums_ok": checksums_ok,
                "stable_after_restart": stable,
            }
        )
        return spark.createDataFrame(
            rows,
            "grp_rank long, n_rows long, n_chunks long, "
            "checksums_ok boolean, stable_after_restart boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ===========================================================================
# Golden twins: queries with no natural ANSI-SQL formulation get a VALUES
# oracle computed by the independent scalar implementations in
# tools/gen_goldens.py (minicoords + scalar ray-cast/DP/LSH + XXH64 kernel)
# at sf=0.01, the driver's correctness scale. Regenerate with
# `python tools/gen_goldens.py` after any semantic change.
# ===========================================================================
try:
    from coords_spark.goldens import GOLDEN_SQL as _GOLDEN_SQL

    for _gname, _gsql in _GOLDEN_SQL.items():
        if _gname in QUERIES and _gname not in ORACLE_SQL:
            ORACLE_SQL[_gname] = _gsql
except ImportError:  # goldens not generated yet
    pass


# ===========================================================================
# Registration-order window: the driver hash-checks the FIRST 50 registered
# queries only. Round-4 rotation (round-3 verdict #2): the 22 queries that
# had no driver row in CORRECTNESS_r03 — including the 4 with no driver row
# in ANY round (text_quality_scored, dedup_embedding_cosine_pairs,
# embedding_ivf_topk, and the new geo_render_bbox) — move IN; 22 r3-green
# queries whose plan shapes are duplicated by an in-window representative
# (q1/rollup/cube/pivot aggs, broadcast/semi/outer/range/asof joins,
# rank/topk windows, set ops, per-family scalar twins) rotate OUT. The 28
# keepers are the operators whose shape exists nowhere else: the spatial
# resolve/tiling/LOD/multipolygon/render chain, the icepick store, LSH/ANN,
# payload decode, and the streaming stateful/exactly-once surfaces.
# Everything past slot 50 still runs in tools/check_oracle.py and pytest,
# archived per-round in BENCH/oracle_r{N}.txt.
# ===========================================================================
_WINDOW_FIRST = [
    # unique-shape keepers (spatial chain + store + streaming + LSH/ANN)
    "geo_coastline_classify",
    "dedup_minhash_lsh_pairs",
    # r6 rotation, second wave (new operators added mid-round):
    # dedup_simhash_pairs out (r5-green; minhash_lsh/embedding_cosine/
    # keep_first/cluster_stats/minhash_band/ngram keep the dedup family) ->
    # osc_parse_rollup in (the .osc osmChange front door, never checked);
    # session_window_stats out (r5-green; tumbling/stream-stream/stateful/
    # ledger/update_stream keep streaming) -> geo_render_pyramid in (the
    # overzoom rollup, never checked); doc_fingerprint_distinct out
    # (r5-green; text_quality_scored keeps the text family) ->
    # dirty_tiles_stats in (tile expiry over the update diffs, never
    # checked).
    "osc_parse_rollup",
    "geo_render_pyramid",
    "dirty_tiles_stats",
    # embedding_ann_topk (single-query probe) rotates out — ann_join/ivf/
    # cosine-pairs keep the LSH-ANN family pinned; geo_render_tiles takes
    # the slot (the per-tile render aggregation, new this round)
    # geo_render_tiles rotates out (r5-green; geo_render_bbox keeps the
    # render-read family in-window); the NEW raster last-mile query —
    # S5 read -> per-tile pixel masks — takes the slot
    "geo_render_raster",
    "embedding_ann_join_topk",
    "geo_osm_way_tiling",
    "geo_lod_tables",
    "geo_multipolygon_assembly",
    # geo_chunk_rollup rotates out (icepick_roundtrip_stats runs the same
    # rollup+assignment transitively); icepick_time_travel takes the slot
    "icepick_time_travel",
    "geo_node_way_reverse_index",
    "icepick_roundtrip_stats",
    "osm_tag_histogram",
    "stateful_running_user_stats",
    "ingest_ledger_invariant",
    "scalar_functions_suite",
    "geo_pip_enrich",
    "geo_knn_ring",
    "geo_raster_vector_align",
    "payload_decode_verify",
    "dedup_keep_first",
    "minhash_band_signature",
    "ngram_jaccard_pairs",
    "knn_cosine_top10",
    "tumbling_window_event_counts",
    "stream_click_purchase_join",
    # never driver-checked in any round (r3 verdict #2; watermark_dedup_counts
    # rotates out — tumbling/session/stream-stream/stateful/ledger keep the
    # streaming family pinned in-window)
    "cpbf_ingest_stats",
    "geo_render_bbox",
    "text_quality_scored",
    "dedup_embedding_cosine_pairs",
    "embedding_ivf_topk",
    # r5 rotation (VERDICT r4 ask #2): the last 3 never-driver-checked
    # queries move IN, plus the NEW pbf_ingest_stats (real .osm.pbf front
    # door, r4 ask #1). Rotated OUT to make room — all hash-green in
    # CORRECTNESS_r04 with an in-window family representative remaining:
    # stats_global_orders (agg family: having/bucket/grouping_sets stay),
    # window_lag_delta (window_running_user_value stays),
    # set_except_all_segments (set_except_nations stays),
    # math_funcs_suppliers (scalar_functions_suite + string_funcs stay).
    "array_funcs_parts",
    "dedup_cluster_stats",
    "pbf_ingest_stats",
    # NEW r5 operator (incremental node-diff apply) takes
    # distinct_parts_per_supplier's slot (r4-green; agg family keeps
    # having/bucket/grouping_sets in-window)
    "incremental_update_apply",
    "grouping_sets_nation_region",
    "anti_join_idle_customers",
    "window_running_user_value",
    "set_except_nations",
    # third-wave r6 swap: string_funcs_parts out (r5-green; the scalar
    # family keeps scalar_functions_suite/date_buckets/json_props) ->
    # osc_update_render_stats in — the continuous-E3 capstone earns its
    # driver row in the round it landed.
    "osc_update_render_stats",
    # sliding_window_user_counts rotates out (r5-green; tumbling/session/
    # stream-stream/stateful/ledger keep the streaming family in-window);
    # the NEW continuous-update pipeline query takes the slot
    "update_stream_apply",
    # (r7: date_buckets_orders and map_funcs_events rotated out here — see
    # the r7 note at the end of the list.)
    # r6 rotation (VERDICT r5 asks #1/#3/#4/#5): pbf_create_storage_stats —
    # the ONLY query never driver-checked in any round — plus the three NEW
    # operators (relation diff, E3 composed pipeline, compact/expire
    # lifecycle). Rotated OUT — all hash-green in CORRECTNESS_r05 with an
    # in-window family representative remaining: bucket_totalprice +
    # exists_discounted_orders (agg/join families keep having/grouping_sets/
    # anti_join), case_when_segments (scalar family keeps
    # scalar_functions_suite/string_funcs/date_buckets),
    # embedding_norms_by_label (embedding family keeps ivf/ann_join/
    # cosine_pairs/knn_cosine).
    "pbf_create_storage_stats",
    "relation_diff_apply",
    "pbf_create_tiles_stats",
    "icepick_compact_stats",
    # r7 rotation (VERDICT r6 ask #2): pyramid_table_stats and
    # vector_tiles_stats — the only 2 of 92 queries never driver-checked
    # (registered after the r6 window was pinned). Rotated OUT — both
    # r6-hash-green with in-window family representatives remaining:
    # date_buckets_orders + map_funcs_events (scalar/collection family
    # keeps scalar_functions_suite, json_props_stats, array_funcs_parts).
    "pyramid_table_stats",
    "vector_tiles_stats",
    # second r7 wave: the two operators NEW this round earn their driver
    # rows in the round they landed (r6 precedent). Rotated OUT — both
    # r6-hash-green with family representatives remaining in-window:
    # json_props_stats (scalar family keeps scalar_functions_suite +
    # array_funcs_parts + date handling via scalar suite),
    # having_big_customers (agg family keeps grouping_sets_nation_region).
    "geo_render_polygons",
    "vector_tile_pyramid_stats",
]
assert len(_WINDOW_FIRST) == 50, len(_WINDOW_FIRST)
assert set(_WINDOW_FIRST) <= set(QUERIES), sorted(set(_WINDOW_FIRST) - set(QUERIES))
QUERIES = {name: QUERIES[name] for name in _WINDOW_FIRST} | {
    name: fn for name, fn in QUERIES.items() if name not in set(_WINDOW_FIRST)
}
