"""Fourth batch of relational coverage: the remaining TPC-H query shapes
(Q2/Q8/Q9/Q11/Q12/Q13/Q15/Q17/Q20/Q21), completing all 22 TPC-H shapes.

The driver testdata omits some TPC-H columns (no ``partsupp`` table, no
``l_shipmode``/``l_commitdate``/``l_receiptdate``, no ``p_container``), so
each query keeps the *operator shape* of its TPC-H counterpart — correlated
aggregate subqueries, global-scalar HAVING, nested semi-joins, double
EXISTS/NOT EXISTS, two-level aggregation — re-targeted at the columns that
exist. The part↔supplier relation (TPC-H ``partsupp``) is derived as the
distinct ``(l_partkey, l_suppkey)`` pairs observed in ``lineitem``.

Same exact-arithmetic emission policy as relational.py: order-dependent money
aggregates run in integer cents (`CAST(ROUND(x*100) AS BIGINT)`) so Spark and
DuckDB sum bit-identically in any order; ``l_quantity`` is integral-valued in
the testdata, so its double sums/avgs are exact too.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.queries.base import query, table

_CENTS = "CAST(ROUND({c} * 100) AS BIGINT)"


def _cents(col):
    return F.round(col * 100).cast("bigint")


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH partsupp AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_name
    FROM part p
      JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM partsupp ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """Minimum-cost supplier (TPC-H Q2 shape): correlated MIN subquery over
    the part↔supplier relation, realized as a per-part window minimum — one
    shuffle on p_partkey instead of a rejoin of the aggregated subquery.
    Dimension joins (supplier/nation/region) broadcast."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    ps = l.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    # Suppliers in the region (the correlated subquery's domain), joined once.
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    cand = ps.join(F.broadcast(eu_supp), ps.ps_suppkey == eu_supp.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    best = cand.withColumn("min_bal", F.min("s_acctbal").over(w)).where(
        F.col("s_acctbal") == F.col("min_bal")
    )
    return best.join(F.broadcast(p), best.ps_partkey == p.p_partkey).select(
        "s_acctbal", "s_name", "nation", "p_partkey", "p_name"
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_c ELSE 0 END) AS BIGINT)
           * 1.0 / CAST(SUM(volume_c) AS BIGINT) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             {_CENTS.format(c='l.l_extendedprice')}
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS volume_c,
             sn.n_name AS supp_nation
      FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = cn.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """National market share (TPC-H Q8 shape): conditional aggregation ratio
    — NATION_3's share of ECONOMY-part volume sold into EUROPE per year.
    Volume stays in exact integer cents×100 until the final ratio; all five
    dimension joins broadcast, so the only shuffle is the year aggregation."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey"))
    vol = _cents(F.col("l_extendedprice")) * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == r.r_regionkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume_c"), "supp_nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume_c")).otherwise(F.lit(0)))
                * 1.0
                / F.sum("volume_c")
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           SUM({_CENTS.format(c='l.l_extendedprice')}
                 * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
               - {_CENTS.format(c='p.p_retailprice')}
                 * CAST(l.l_quantity AS BIGINT) * 100) / 10000.0 AS sum_profit
    FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """Product-type profit (TPC-H Q9 shape): profit per supplier-nation per
    year over parts named '%widget%'. TPC-H costs via ps_supplycost; with no
    partsupp table, cost = p_retailprice × quantity. Both profit terms are
    exact cents×100 integers, so the sum is order-independent."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    revenue = _cents(F.col("l_extendedprice")) * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    cost = _cents(F.col("p_retailprice")) * F.col("l_quantity").cast("bigint") * 100
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(revenue - cost) / 10000.0).alias("sum_profit"))
    )


@query(
    "q11_important_parts",
    oracle=f"""
    WITH value_by_part AS (
      SELECT l.l_partkey AS partkey,
             CAST(SUM({_CENTS.format(c='l.l_extendedprice')}) AS BIGINT) AS value_c
      FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT partkey, value_c / 100.0 AS part_value
    FROM value_by_part
    WHERE value_c > (SELECT CAST(SUM(value_c) AS BIGINT) FROM value_by_part) * 0.001
    """,
)
def q11_important_parts(spark, sf_dir):
    """Important stock identification (TPC-H Q11 shape): per-part value from
    NATION_7 suppliers, kept only when above a fraction of the global total —
    the global-scalar-HAVING shape. The scalar total is a single-row
    aggregate cross-joined (broadcast) onto the per-part aggregate; the
    per-part value stays an exact bigint in cents so the threshold compare is
    deterministic."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    filtered = l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    by_part = filtered.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("value_c")
    )
    total = by_part.agg(F.sum("value_c").alias("total_c"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .where(F.col("value_c") > F.col("total_c") * 0.001)
        .select("partkey", (F.col("value_c") / 100.0).alias("part_value"))
    )


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R' AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_lines(spark, sf_dir):
    """Shipping priority classes (TPC-H Q12 shape): conditional CASE-WHEN
    counting inside a fact-fact join. TPC-H buckets by l_shipmode with
    commit/receipt-date lag; with neither column, the late-line proxy is
    returned lines shipped after the order date, bucketed by line status."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
        LEFT OUTER JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark, sf_dir):
    """Customer order-count distribution (TPC-H Q13 shape): left outer join
    with an ON-clause filter (customers with zero qualifying orders count as
    0), then a second aggregation over the first's result — the classic
    two-level re-shuffle. TPC-H filters o_comment; with no comment column the
    qualifying-order predicate is priority <> 5-LOW."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_CENTS.format(c='l_extendedprice')}
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_c / 10000.0 AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_c = (SELECT MAX(total_c) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """Top supplier (TPC-H Q15 shape): revenue "view" per supplier over a
    quarter, then suppliers whose revenue equals the view's scalar MAX.
    Revenue is an exact cents×100 bigint so the MAX-equality matches
    identically in both engines; the scalar max is a broadcast cross join,
    not a re-sort."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = table(spark, sf_dir, "supplier")
    rev = F.sum(
        _cents(F.col("l_extendedprice"))
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(rev.alias("total_c"))
    max_rev = revenue.agg(F.max("total_c").alias("max_c"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_c") == F.col("max_c"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("total_c") / 10000.0).alias("total_revenue"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT SUM({_CENTS.format(c='l.l_extendedprice')}) / 700.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < 0.2 * (
        SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H Q17 shape): correlated per-part
    AVG subquery gating the fact rows, realized as a window average over
    l_partkey (one shuffle, no rejoin). l_quantity is integral so the
    average (exact sum / count) is bit-identical across engines."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    w = Window.partitionBy("l_partkey")
    with_avg = l.withColumn("avg_qty", F.avg("l_quantity").over(w))
    return (
        with_avg.join(F.broadcast(p), with_avg.l_partkey == p.p_partkey)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(_cents(F.col("l_extendedprice"))) / 700.0).alias("avg_yearly"))
    )


@query(
    "q20_part_promotion",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 50
      )
    """,
)
def q20_part_promotion(spark, sf_dir):
    """Part promotion candidates (TPC-H Q20 shape): nested IN-subqueries —
    suppliers in NATION_5 who moved >50 units of any 'small%' part. Both INs
    become left-semi joins; the part filter broadcasts into the lineitem
    aggregation so only qualifying (supp, part) groups shuffle."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    qualifying = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
      JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """Suppliers who kept orders waiting (TPC-H Q21 shape): EXISTS plus
    NOT EXISTS over self-joined lineitem — the sole supplier with a returned
    line in a multi-supplier finalized order. Both existential probes are
    computed from ONE aggregation of lineitem per order (any other supplier?
    any other supplier with 'R'?) broadcast-joined back, instead of two
    correlated self-joins of the fact table."""
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = table(spark, sf_dir, "lineitem")
    l1 = l.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    # Per (order, supplier): does another supplier appear in the order, and
    # does another supplier have a returned line? One shuffle on l_orderkey.
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    # Row-level (not per-order) counting, matching the SQL: each returned
    # line of a waiting supplier contributes one to numwait.
    waiting = (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS quantity_c,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS discount_c
      FROM lineitem WHERE l_orderkey < 1000
    ) UNPIVOT (val FOR metric IN (quantity_c, price_c, discount_c))
    """,
)
def unpivot_melt(spark, sf_dir):
    """Wide→long unpivot (``DataFrame.unpivot``, the inverse of pivot):
    three measure columns melt into (metric, val) rows. Narrow Expand node —
    output is 3× the rows but no shuffle; cents-quantized so values are
    integers in both engines."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    wide = l.select(
        "l_orderkey",
        "l_linenumber",
        _cents(F.col("l_quantity")).alias("quantity_c"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
        _cents(F.col("l_discount")).alias("discount_c"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity_c", "price_c", "discount_c"],
        "metric",
        "val",
    )
