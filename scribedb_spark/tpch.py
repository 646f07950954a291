"""TPC-H breadth queries q2-q22 (shapes adapted to the driver schema).

Round 1 shipped q1/q3/q5/q6/q10/q13/q18; this module completes the
TPC-H operator-shape sweep. The driver test data has no ``partsupp``
table and omits some columns (l_commitdate, l_shipmode, c_phone), so
each query keeps its TPC-H *operator shape* — correlated scalar
subquery, EXISTS / NOT EXISTS, IN / NOT IN subquery, conditional
aggregation, HAVING over a global-total subquery — re-targeted at the
available columns. Shapes are what matter for engine coverage; the
driver hash-compares every key against its DuckDB oracle at sf0.01.

Cross-engine exactness follows scribedb_spark.queries' module
docstring: money sums through DECIMAL(18,2) (scale <= 6 before any
DOUBLE cast), averages as SUM(decimal)::double / COUNT, YEAR() cast
to INT on both sides, unique tiebreakers in every ORDER BY ... LIMIT.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from scribedb_spark.queries import d2, register
from scribedb_spark.sources import table


def _vol():
    """extendedprice * (1-discount) as an exact decimal (scale 6)."""
    one = F.lit(1).cast("decimal(18,2)")
    return d2("l_extendedprice") * (one - d2("l_discount")).cast("decimal(8,4)")


SQL_VOL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))"
    " AS DECIMAL(8,4))"
)


# ---------------------------------------------------------------------------
# Q2 shape: correlated scalar MIN subquery
# ---------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
    FROM cost
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_size = 15 AND p_type = 'SMALL'
      AND supply_cost = (SELECT MIN(c2.supply_cost) FROM cost c2
                         WHERE c2.l_partkey = cost.l_partkey)
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: cheapest regional supplier per part via a
    correlated MIN subquery (no partsupp table in the test data, so
    "supply cost" = MIN lineitem extendedprice per part+supplier).

    Scale: the correlated subquery is decorrelated into a MIN window
    over partkey on the already-aggregated cost table — lineitem is
    scanned ONCE (a join back to a per-part MIN aggregate would plan
    the whole cost subtree twice), reduced by map-side partial MIN,
    then one narrow repartition by partkey for the window. Region-
    filtered supplier and size/type-filtered part are dims ->
    broadcast. (s_name, p_partkey) is a unique tiebreaker for the
    LIMIT.
    """
    li = table(spark, "lineitem", sf_dir)
    s = table(spark, "supplier", sf_dir)
    n = table(spark, "nation", sf_dir)
    r = table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    p = table(spark, "part", sf_dir).filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    eu_supp = (
        s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(eu_supp.select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(eu_supp), cost.l_suppkey == eu_supp.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS correlated semi-join
# ---------------------------------------------------------------------------

@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery (late-shipping
    lineitem) counted by order priority.

    Scale: EXISTS plans as a LEFT SEMI join shuffled on orderkey; the
    non-equi l_shipdate > o_orderdate rides along as a join residual.
    The quarter filter pushes to the orders scan first.
    """
    o = table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, "lineitem", sf_dir)
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
               "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 shape: bidirectional nation-pair volume
# ---------------------------------------------------------------------------

@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INT) AS l_year,
               {SQL_VOL} AS vol
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between two nations, both
    directions, by year.

    Scale: both nation dims broadcast; the pair predicate is applied
    after the broadcasts so lineitem shuffles only on its two join
    keys (orderkey for orders, map-side for the broadcast supplier/
    customer sides at real scale the customer join shuffles). Group
    key cardinality is 2 x years -> trivial final shuffle.
    """
    cutlo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cuthi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= cutlo) & (F.col("l_shipdate") < cuthi)
    )
    o = table(spark, "orders", sf_dir)
    s = table(spark, "supplier", sf_dir)
    c = table(spark, "customer", sf_dir)
    n = table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == F.col("nk1"))),
              li.l_suppkey == F.col("s_suppkey"))
        .join(c.join(F.broadcast(n2), c.c_nationkey == F.col("nk2")),
              o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape: market-share ratio of conditional over total volume
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               {SQL_VOL} AS vol,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region    ON r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of regional volume
    per year — a ratio of a conditional sum over a total sum.

    Scale: part/nation/region dims broadcast; customer joins after
    orders reduce lineitem. Both sums are exact decimals; the final
    double division is single-rounded, so the ratio is cross-engine
    deterministic.
    """
    li = table(spark, "lineitem", sf_dir)
    p = table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    o = table(spark, "orders", sf_dir)
    c = table(spark, "customer", sf_dir)
    s = table(spark, "supplier", sf_dir)
    n = table(spark, "nation", sf_dir)
    r = table(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nk1")
    )
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    vol = _vol()
    zero = F.lit(0).cast("decimal(18,6)")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("nk1"), "left_semi")
        .join(F.broadcast(s.join(F.broadcast(n2), s.s_nationkey == F.col("nk2"))),
              li.l_suppkey == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(zero))
            .cast("double")
            / F.sum(vol).cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 shape: profit = revenue minus cost, by nation and year
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(SUM({SQL_VOL}
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(0.1 AS DECIMAL(3,1))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit per supplier nation per year. No
    partsupp, so unit cost = 10% of p_retailprice.

    Scale: the p_name LIKE filter prunes part before its broadcast;
    profit terms stay exact decimals (scale 6 and 5) until the final
    per-group cast. Orders join shuffles on orderkey once.
    """
    li = table(spark, "lineitem", sf_dir)
    p = table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%"))
    s = table(spark, "supplier", sf_dir)
    o = table(spark, "orders", sf_dir)
    n = table(spark, "nation", sf_dir)
    cost = (
        d2("p_retailprice") * d2("l_quantity") * F.lit(0.1).cast("decimal(3,1)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
              li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(_vol() - cost).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: HAVING against a global-total scalar subquery
# ---------------------------------------------------------------------------

@register(
    "q11_important_stock",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                        JOIN nation ON n_nationkey = s_nationkey
                        JOIN region ON r_regionkey = n_regionkey
                        WHERE r_name = 'ASIA')
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.001
            FROM lineitem
            WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                JOIN nation ON n_nationkey = s_nationkey
                                JOIN region ON r_regionkey = n_regionkey
                                WHERE r_name = 'ASIA'))
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part value share vs a global-total scalar
    subquery (HAVING > fraction of total).

    Scale: the regional supplier set broadcasts into a semi-join; the
    per-part aggregate is ONE shuffle; the global total re-aggregates
    the per-part sums (tiny) instead of rescanning lineitem, and joins
    back as a broadcast single row. Both sides exact decimal -> the
    same double, so the > comparison is engine-identical.
    """
    li = table(spark, "lineitem", sf_dir)
    s = table(spark, "supplier", sf_dir)
    n = table(spark, "nation", sf_dir)
    r = table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    asia = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(asia), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(d2("l_extendedprice")).alias("value_dec"))
        # reused by the total AND the output: materialize once so the
        # lineitem scan + aggregate subtree isn't planned twice
        .localCheckpoint(eager=False)
    )
    total = per_part.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.withColumn("part_value", F.col("value_dec").cast("double"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# Q12 shape: two-bucket conditional aggregation over a join
# ---------------------------------------------------------------------------

@register(
    "q12_priority_class",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_class(spark, sf_dir):
    """TPC-H Q12 shape (no l_shipmode column: return flag classes,
    priority buckets): conditional counts over the orders join.

    Scale: the year filter prunes lineitem at the scan; one shuffle on
    orderkey, then a 3-group conditional aggregate with map-side
    partials.
    """
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo-share percentage (conditional / total)
# ---------------------------------------------------------------------------

@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_VOL}
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) * 100
             / CAST(SUM({SQL_VOL}) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: percentage of revenue from PROMO parts in one
    month.

    Scale: month filter prunes the lineitem scan; part broadcasts;
    single scalar aggregate from map-side partials — no data shuffle.
    """
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, "part", sf_dir)
    vol = _vol()
    zero = F.lit(0).cast("decimal(18,6)")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
            .cast("double")
            * F.lit(100)
            / F.sum(vol).cast("double")
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q15 shape: aggregate view + MAX scalar subquery
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({SQL_VOL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue view + MAX scalar subquery picking the
    top supplier(s).

    Scale: one shuffle builds per-supplier revenue; the MAX
    re-aggregates that small result and broadcasts one row back —
    lineitem is scanned once (the view is reused, not recomputed).
    Revenue doubles derive from identical exact decimals, so the
    equality comparison is engine-safe.
    """
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = table(spark, "supplier", sf_dir)
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol()).cast("double").alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 shape: NOT IN subquery + COUNT(DISTINCT)
# ---------------------------------------------------------------------------

@register(
    "q16_parts_supplier",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier(spark, sf_dir):
    """TPC-H Q16 shape: supplier diversity per part group, excluding a
    NOT IN supplier subquery (negative balance ~ complaints).

    Scale: NOT IN over a non-null key plans as a broadcast anti-join
    of the (tiny, filtered) supplier set; part filters broadcast; the
    COUNT(DISTINCT) is the only wide shuffle and Spark expands it to
    a two-stage distinct-then-count.
    """
    li = table(spark, "lineitem", sf_dir)
    p = table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    bad = table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated AVG subquery
# ---------------------------------------------------------------------------

@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                                           AS DOUBLE) / COUNT(*))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity (correlated AVG subquery), one brand.

    Scale: the correlated AVG only ever ranges over lineitems whose
    partkey survives the brand filter, so it decorrelates into an AVG
    window over partkey on the ALREADY part-filtered join — lineitem
    is scanned once (the classic aggregate-join-back rewrite plans the
    lineitem subtree twice), and the window repartition moves only the
    brand-filtered slice. The threshold is derived from an exact
    decimal sum, so both engines compare against the same double.
    """
    li = table(spark, "lineitem", sf_dir)
    p = table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#3")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn(
            "avg_qty",
            F.sum(d2("l_quantity")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
        )
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(d2("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: OR-of-ANDs join predicate
# ---------------------------------------------------------------------------

@register(
    "q19_discount_revenue",
    oracle=f"""
    SELECT CAST(SUM({SQL_VOL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discount_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-clause predicate across the
    join (brand x size x quantity windows).

    Scale: the partkey equi-join stays a hash join (part broadcasts);
    the OR-of-ANDs is a post-join filter, but each disjunct's
    single-table conjuncts (p_size, l_quantity bounds) are pushed as
    a derived OR filter to each scan by Catalyst.
    """
    li = table(spark, "lineitem", sf_dir)
    p = table(spark, "part", sf_dir)
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(c1 | c2 | c3).agg(F.sum(_vol()).cast("double").alias("revenue"))


# ---------------------------------------------------------------------------
# Q20 shape: nested IN subqueries with HAVING
# ---------------------------------------------------------------------------

@register(
    "q20_part_promotion",
    oracle="""
    SELECT s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(100 AS DECIMAL(18,2))
      )
    """,
)
def q20_part_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers qualified through a nested
    IN-subquery with HAVING (moved >100 units of red parts in 1997).

    Scale: the inner aggregate reduces lineitem to a qualifying
    supplier-key set FIRST (map-side partials), then semi-joins —
    the key set is data-dependent so its join strategy is left to
    AQE rather than force-broadcast.
    """
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, "part", sf_dir).filter(F.col("p_name").like("red%"))
    s = table(spark, "supplier", sf_dir)
    n = table(spark, "nation", sf_dir)
    r = table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(d2("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(100).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == F.col("n_nationkey"))
        .join(qualified, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", d2("s_acctbal").cast("double").alias("acctbal"))
    )


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS over sibling lineitems
# ---------------------------------------------------------------------------

@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier finalized order (late = shipped >30 days after the
    order date; no l_receiptdate in the test data).

    Scale: instead of executing EXISTS/NOT EXISTS per row, both
    correlated subqueries decorrelate into ONE per-order aggregate
    (distinct suppliers, distinct late suppliers, the late supplier
    key) — a single extra shuffle on orderkey, then a broadcast-size
    result joins back. Late flags are computed once and reused.
    """
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    s = table(spark, "supplier", sf_dir)
    flagged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            .cast("int"),
        )
        .select("l_orderkey", "l_suppkey", "late")
        # reused by the per-order aggregate AND the late-row filter:
        # materialize once so the lineitem-orders join runs once
        .localCheckpoint(eager=False)
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    return (
        flagged.filter(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 shape: substring bucketing + AVG scalar subquery + NOT EXISTS
# ---------------------------------------------------------------------------

@register(
    "q22_global_sales",
    oracle="""
    WITH potential AS (
        SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
        FROM customer
        WHERE SUBSTRING(c_name, 17, 2) IN ('10','11','12','13','14','15','16')
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM potential
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                              / COUNT(*)
                       FROM potential WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 50000)
    GROUP BY cntrycode
    """,
)
def q22_global_sales(spark, sf_dir):
    """TPC-H Q22 shape: customer-code buckets (name digits standing in
    for phone country codes), balance above the positive-balance
    average (scalar subquery), with no large orders (NOT EXISTS).

    Scale: the average over the bucket-filtered customers broadcasts
    as one row; NOT EXISTS plans as a left-anti join shuffled on
    custkey against the pre-filtered orders.
    """
    c = table(spark, "customer", sf_dir)
    code = F.substring("c_name", 17, 2)
    potential = (
        c.filter(code.isin("10", "11", "12", "13", "14", "15", "16"))
        .select(code.alias("cntrycode"), "c_acctbal", "c_custkey")
        # reused by the average AND the main query: materialize once
        .localCheckpoint(eager=False)
    )
    avg_bal = potential.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(d2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    big_orders = (
        table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 50000)
        .select("o_custkey")
    )
    return (
        potential.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big_orders, potential.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(d2("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
