"""Relational query surface over the TPC-H-ish tables (SURVEY.md §2.3).

The reference implements NO relational operators (SURVEY.md §2.2) — this
module is the query surface its converted tables exist to serve, expressed
entirely with Spark built-ins so Catalyst handles pushdown, pruning, join
planning, and AQE handles runtime re-planning.

Scale notes (100 TB design intent), applied throughout:
* Dimension tables (region/nation/customer/supplier/part) are broadcast
  (``F.broadcast``) — fact-side scans never shuffle for dimension joins.
* Aggregations are expressed as ``groupBy().agg()`` so Spark plans partial
  (map-side) aggregation before the exchange.
* Top-k per group uses window + filter (single shuffle by the partition key)
  rather than per-group sorts.
* Global ``orderBy`` + ``limit`` compiles to TakeOrderedAndProject — no full
  sort materialization.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.queries.base import query, table


# ---------------------------------------------------------------------------
# Flagship aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_quantity) AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_p,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_p
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00')
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty) AS BIGINT)                          AS sum_qty,
           SUM(price_c) / 100.0                              AS sum_base_price,
           SUM(price_c * (100 - disc_p)) / 10000.0           AS sum_disc_price,
           SUM(price_c * (100 - disc_p) * (100 + tax_p)) / 1000000.0 AS sum_charge,
           SUM(qty) * 1.0 / COUNT(*)                         AS avg_qty,
           SUM(price_c) * 1.0 / COUNT(*) / 100.0             AS avg_price,
           SUM(disc_p) * 1.0 / COUNT(*) / 100.0              AS avg_disc,
           COUNT(*)                                          AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Pricing summary report: scan -> filter (pushed to parquet) -> partial
    agg -> single shuffle on the 6-value group key. The canonical map-side
    combine aggregation; at 100 TB the shuffle carries only
    n_partitions x 6 rows."""
    l = table(spark, sf_dir, "lineitem")
    # Money columns are cent-quantized doubles; aggregate in EXACT integer
    # cents (order-independent, bit-identical across engines) and divide back
    # only at emission. int64 headroom: |price_c*(100-d)*(100+t)| < 2^44/row,
    # safe to ~500k rows/group at sf0.1 (use decimal(38) beyond).
    qty = F.round(F.col("l_quantity")).cast("bigint")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_p = F.round(F.col("l_discount") * 100).cast("bigint")
    tax_p = F.round(F.col("l_tax") * 100).cast("bigint")
    return (
        l.where(F.col("l_shipdate") <= "1999-01-01")
        .select("l_returnflag", "l_linestatus", qty.alias("qty"),
                price_c.alias("price_c"), disc_p.alias("disc_p"), tax_p.alias("tax_p"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sum_qty"),
            (F.sum("price_c") / 100.0).alias("sum_base_price"),
            (F.sum(F.col("price_c") * (100 - F.col("disc_p"))) / 10000.0).alias("sum_disc_price"),
            (F.sum(F.col("price_c") * (100 - F.col("disc_p")) * (100 + F.col("tax_p"))) / 1000000.0).alias("sum_charge"),
            (F.sum("qty") * 1.0 / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum("price_c") * 1.0 / F.count(F.lit(1)) / 100.0).alias("avg_price"),
            (F.sum("disc_p") * 1.0 / F.count(F.lit(1)) / 100.0).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """Shipping priority: broadcast the filtered customer dim into orders,
    then join lineitem on orderkey. orderBy+limit compiles to
    TakeOrderedAndProject (no global sort). Tie-break on orderkey keeps the
    LIMIT deterministic across engines."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-01-01")
    l = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1996-01-01")
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))) / 10000.0).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
    FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """Local supplier volume (TPC-H Q5 shape): the entire dimension chain
    region->nation->customer and supplier are broadcast; lineitem (the 100 TB
    fact) joins orders on its shuffle key once. Revenue where supplier and
    customer share a nation."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "1996-01-01")
    l = table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("n_nationkey")))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg((F.sum(F.round(l.l_extendedprice * 100).cast("bigint")
                    * (100 - F.round(l.l_discount * 100).cast("bigint"))) / 10000.0).alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation_name,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
           c.c_acctbal AS acctbal
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """Returned-item losers (TPC-H Q10 shape): returnflag filter pushed to the
    lineitem scan; customer/nation broadcast; top-20 via TakeOrdered."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg((F.sum(F.round(l.l_extendedprice * 100).cast("bigint")
                    * (100 - F.round(l.l_discount * 100).cast("bigint"))) / 10000.0).alias("revenue"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation_name"),
            "revenue",
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey AS orderkey, c.c_name AS name,
           o.o_totalprice AS totalprice,
           CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, c.c_name, o.o_totalprice
    HAVING SUM(l.l_quantity) > 120
    ORDER BY totalprice DESC, orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark, sf_dir):
    """Large-volume orders (TPC-H Q18 shape): group on the join key
    (orderkey), HAVING as post-agg filter.

    Scale shape: lineitem is aggregated to one row per orderkey and
    HAVING-filtered BEFORE the join (grouping by (orderkey, name, price) is
    equivalent because name/price are functionally dependent on orderkey) —
    the join input shrinks from every lineitem row to the few qualifying
    orders, and the shuffle carries (orderkey, sum) pairs, never lineitem."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    l = table(spark, sf_dir, "lineitem")
    lq = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("sum_qty"))
        .where(F.col("sum_qty") > 120)
    )
    return (
        lq.join(o, lq.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("c_name").alias("name"),
            F.col("o_totalprice").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Filters / predicates
# ---------------------------------------------------------------------------

@query(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_extendedprice AS extendedprice, l_returnflag AS returnflag
    FROM lineitem
    WHERE (l_quantity BETWEEN 10 AND 20)
      AND l_returnflag IN ('A', 'R')
      AND (l_discount > 0.08 OR l_tax < 0.02)
      AND l_shipdate IS NOT NULL
    """,
)
def filter_predicates(spark, sf_dir):
    """Conjunctive/disjunctive predicates, IN, BETWEEN, null checks — all
    pushed into the parquet scan (PushedFilters in .explain)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & ((F.col("l_discount") > 0.08) | (F.col("l_tax") < 0.02))
            & F.col("l_shipdate").isNotNull()
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_returnflag").alias("returnflag"),
        )
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------

@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey AS orderkey, c.c_name AS name, o.o_orderstatus AS status
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 300000
    """,
)
def join_inner(spark, sf_dir):
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    c = table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("c_name").alias("name"),
        F.col("o_orderstatus").alias("status"),
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey AS custkey, COUNT(o.o_orderkey) AS n_orders,
           COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0) / 100.0 AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    """Left join preserving customers with zero orders; COUNT(col) skips
    nulls in both engines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")), F.lit(0)) / 100.0).alias("total_spend"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n.n_name AS nation_name, s.s_name AS supplier_name
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_right_outer(spark, sf_dir):
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        F.col("n_name").alias("nation_name"),
        F.col("s_name").alias("supplier_name"),
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           COALESCE(cn.n_customers, 0) AS n_customers,
           COALESCE(sn.n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full")
        .select(
            F.col("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_left_semi(spark, sf_dir):
    """Semi join: existence check without duplication; at scale the big side
    streams against the broadcast filter set."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_name < r2.r_name
    """,
)
def join_cross(spark, sf_dir):
    r1 = table(spark, sf_dir, "region").select(F.col("r_name").alias("region_a"))
    r2 = table(spark, sf_dir, "region").select(F.col("r_name").alias("region_b"))
    return r1.crossJoin(r2).where(F.col("region_a") < F.col("region_b"))


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------

@query(
    "agg_global_stats",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) * 1.0 / COUNT(*) / 100.0 AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    """,
)
def agg_global_stats(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("sum_qty"),
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")) * 1.0
         / F.count(F.lit(1)) / 100.0).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@query(
    "agg_group_having",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) * 1.0 / COUNT(*) / 100.0 AS avg_price
    FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 50
    """,
)
def agg_group_having(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) * 1.0
             / F.count(F.lit(1)) / 100.0).alias("avg_price"),
        )
        .where(F.col("n_orders") > 50)
    )


@query(
    "agg_count_distinct_group",
    oracle="""
    SELECT l_returnflag AS returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct_group(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@query("agg_approx_count_distinct")  # no oracle: approximate by design (HLL++)
def agg_approx_count_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): the 100 TB-scale distinct-count
    path — one pass, fixed memory, no distinct shuffle. Not oracle-checked:
    DuckDB's approx_count_distinct uses a different sketch; the driver records
    the rows-only check."""
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(c.c_custkey) AS n_customers
    FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.cube(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit grouping sets via Spark SQL (the DataFrame API exposes only
    rollup/cube; GROUPING SETS is the general form)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@query(
    "window_row_number_latest",
    oracle="""
    SELECT custkey, orderkey, strftime(orderdate, '%Y-%m-%d') AS orderdate FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_orderdate AS orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def window_row_number_latest(spark, sf_dir):
    """Latest order per customer: one shuffle on the partition key; the
    orderkey tie-break makes row_number deterministic."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_partkey AS partkey, p_brand AS brand,
           p_retailprice AS retailprice,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_dense_rank
    FROM part
    """,
)
def window_rank_dense(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    w_price = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    w_size = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").alias("retailprice"),
        F.rank().over(w_price).alias("price_rank"),
        F.dense_rank().over(w_size).alias("size_dense_rank"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           o_totalprice AS totalprice,
           ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2) AS delta_prev,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta_prev"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).over(w) / 100.0).alias("running_spend"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT nation_name, orderkey, totalprice FROM (
      SELECT n.n_name AS nation_name, o.o_orderkey AS orderkey,
             o.o_totalprice AS totalprice,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-3 orders per nation: window + filter — one shuffle, no per-group
    sorts; deterministic via orderkey tie-break."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("n_name").alias("nation_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit
# ---------------------------------------------------------------------------

@query(
    "sort_multi_key_limit",
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderstatus AS status,
           o_totalprice AS totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi_key_limit(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .limit(100)
    )


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT custkey, delta FROM (
      SELECT o_custkey AS custkey,
             ROUND(o_totalprice - LAG(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
      FROM orders)
    ORDER BY delta DESC NULLS LAST, custkey
    LIMIT 50
    """,
)
def sort_nulls_ordering(spark, sf_dir):
    """NULLS LAST ordering over a column with genuine nulls (first order per
    customer has no lag)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta"),
        )
        .orderBy(F.col("delta").desc_nulls_last(), "custkey")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@query(
    "set_union_all",
    oracle="""
    SELECT c_name AS name, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind FROM supplier WHERE s_acctbal > 1000
    """,
)
def set_union_all(spark, sf_dir):
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_name").alias("name"), F.lit("customer").alias("kind"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 1000)
        .select(F.col("s_name").alias("name"), F.lit("supplier").alias("kind"))
    )
    return c.unionByName(s)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct semantics), matching the SQL oracle


@query(
    "set_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus AS status, o_orderpriority AS priority FROM orders
    """,
)
def set_distinct(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).distinct()


# ---------------------------------------------------------------------------
# Scalar function library
# ---------------------------------------------------------------------------

@query(
    "string_functions",
    oracle="""
    SELECT p_partkey AS partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_name) AS name_lower,
           substr(p_name, 1, 10) AS name_prefix,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
           trim('  padded  ') AS trimmed
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_padded"),
        F.trim(F.lit("  padded  ")).alias("trimmed"),
    )


@query(
    "conditional_functions",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def conditional_functions(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_label"),
        F.when(
            F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"), 1
        )
        .otherwise(0)
        .alias("is_urgent"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           ROUND(ABS(l_extendedprice - 30000), 2) AS abs_diff,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
           ROUND(POW(l_quantity, 2), 2) AS qty_sq,
           CAST(l_partkey % 7 AS BIGINT) AS partkey_mod
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def math_functions(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    return l.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_diff"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_partkey") % 7).cast("bigint").alias("partkey_mod"),
    )
