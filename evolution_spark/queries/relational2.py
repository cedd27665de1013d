"""Second batch of relational coverage: more TPC-H shapes (Q4/Q6/Q7/Q14/
Q16/Q19/Q22), null-safe comparison, pivot, window range frames,
first/last/nth window values, scalar subqueries, and array functions.

Same exact-arithmetic emission policy as relational.py: order-dependent money
aggregates run in integer cents; scalar chains emit raw doubles.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.queries.base import query, table

_CENTS = "CAST(ROUND({c} * 100) AS BIGINT)"


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority AS priority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """Order priority checking (TPC-H Q4 shape): EXISTS -> left-semi join on
    the fact key, then a tiny-key aggregation."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = table(spark, sf_dir, "lineitem")
    joined = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT SUM({_CENTS.format(c='l_extendedprice')}
               * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark, sf_dir):
    """Revenue forecast (TPC-H Q6 shape): pure scan-filter-aggregate — every
    predicate pushes into the parquet scan; the whole query is one narrow
    stage + a scalar reduce."""
    l = table(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_p = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(price_c * disc_p) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           SUM({_CENTS.format(c='l.l_extendedprice')}
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 10000.0 AS volume
    FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """Volume shipping (TPC-H Q7 shape): cross-nation trade volume; both
    nation dims broadcast, disjunctive nation-pair predicate applied after
    the dimension joins."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_p = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg((F.sum(price_c * (100 - disc_p)) / 10000.0).alias("volume"))
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN {_CENTS.format(c='l.l_extendedprice')}
                         * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                    ELSE 0 END) * 1.0
           / SUM({_CENTS.format(c='l.l_extendedprice')}
                 * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS promo_share,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """Promotion effect (TPC-H Q14 shape): conditional aggregation over a
    broadcast part join; the share is a ratio of two exact integers."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = table(spark, sf_dir, "part")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_p = F.round(F.col("l_discount") * 100).cast("bigint")
    rev = price_c * (100 - disc_p)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))) * 1.0
                / F.sum(rev)
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand AS brand, p.p_size AS size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY p.p_brand, p.p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """Parts/supplier relationship (TPC-H Q16 shape): negated predicate + IN
    list on the broadcast dim, distinct count on the fact side."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT SUM({_CENTS.format(c='l.l_extendedprice')}
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 45 AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """Discounted revenue (TPC-H Q19 shape): disjunction of conjunctive
    ranges spanning both join sides — exercises join-condition pushdown and
    OR-predicate handling."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_p = F.round(F.col("l_discount") * 100).cast("bigint")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 45) & F.col("l_quantity").between(20, 40))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            (F.sum(price_c * (100 - disc_p)) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH threshold AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) * 1.0 / COUNT(*) / 100.0 AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_customers,
           SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_customers(spark, sf_dir):
    """Idle wealthy customers (TPC-H Q22 shape): scalar subquery (global avg
    as a broadcast 1-row join — never a driver collect) + anti join. The
    threshold is a ratio of exact integers, so the > comparison can't flip
    between engines. "Idle" = no urgent orders (every customer has SOME order
    in this dataset, so a plain no-orders predicate would always be empty)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    threshold = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(cents) * 1.0 / F.count(F.lit(1)) / 100.0).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(cents) / 100.0).alias("total_bal"),
        )
    )


@query(
    "null_safe_comparison",
    oracle="""
    WITH lagged AS (
      SELECT o_custkey, o_orderkey, o_orderstatus,
             LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS prev_status
      FROM orders
    )
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus IS NOT DISTINCT FROM prev_status
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_same_as_prev,
           CAST(SUM(CASE WHEN prev_status IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_first
    FROM lagged GROUP BY o_custkey
    """,
)
def null_safe_comparison(spark, sf_dir):
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) over genuinely-null
    lag values."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    lagged = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
    )
    return lagged.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.when(F.col("o_orderstatus").eqNullSafe(F.col("prev_status")), 1).otherwise(0)
        ).alias("n_same_as_prev"),
        F.sum(F.when(F.col("prev_status").isNull(), 1).otherwise(0)).alias("n_first"),
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    """Pivot (explicit value list -> stable schema; Spark's inferred pivot
    would scan twice and produce data-dependent columns)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) / 100.0
             AS spend_30d
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over event time: trailing-30-day spend per customer.
    Spark expresses the interval range on the epoch-seconds ordering column;
    sums run in exact cents."""
    o = table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ; NTZ has no direct long cast — hop through
    # LTZ (identity under the UTC session timezone) to get epoch seconds.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        (F.sum(cents).over(w) / 100.0).alias("spend_30d"),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth(spark, sf_dir):
    """first/last/nth window values with explicit full-partition frames for
    last/nth (default frames stop at CURRENT ROW — a classic cross-engine
    semantics trap, made explicit here)."""
    o = table(spark, sf_dir, "orders")
    w_default = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_default.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.first("o_orderkey").over(w_default).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT l_orderkey AS orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
           CAST(len(list(l_linenumber)) AS BIGINT) AS n_lines,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags,
           list_contains(list(l_returnflag), 'R') AS has_return
    FROM lineitem GROUP BY l_orderkey
    """,
)
def array_functions(spark, sf_dir):
    """Array aggregation + manipulation: collect_list (sorted for
    determinism), collect_set, size, array_contains.

    Arrays are emitted as comma-joined strings: the driver canonicalizes
    results through a pandas lexsort, which cannot hash Python-list cells
    (r01 `array_functions` crash) — a deterministic string is both hashable
    and engine-comparable."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.array_join(F.array_sort(F.collect_list("l_linenumber")).cast("array<string>"), ",")
        .alias("linenumbers"),
        F.size(F.collect_list("l_linenumber")).cast("bigint").alias("n_lines"),
        F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias("flags"),
        F.array_contains(F.collect_list("l_returnflag"), "R").alias("has_return"),
    )


@query("approx_percentile_prices")  # no oracle: approximate sketch by design
def approx_percentile_prices(spark, sf_dir):
    """approx_percentile (t-digest-style sketch) — the one-pass fixed-memory
    quantile path for 100 TB; not oracle-checked (DuckDB's approx quantile
    uses a different sketch), driver records rows-only."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", 0.5, 10000).alias("p50"),
        F.approx_percentile("l_extendedprice", 0.95, 10000).alias("p95"),
    )
