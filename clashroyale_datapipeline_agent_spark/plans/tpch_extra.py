"""Relational-breadth queries II: the remaining adaptable TPC-H shapes.

Round 3 already anchored Q1/Q3/Q5/Q6/Q13/Q14/Q17/Q18/Q22 in
``plans/star_queries.py``; this module completes the sweep with the shapes
that exercise join/subquery machinery not yet covered by a named query:

- Q4  — EXISTS rewritten as a LEFT SEMI join with a *mixed* equi + range
        condition (late lineitems per order);
- Q7  — bi-directional nation-pair volume (two broadcast dim joins against
        the same dimension, disjunctive pair predicate, year rollup);
- Q8  — market-share ratio (conditional-sum / sum over an 8-way snowflake);
- Q9  — profit by supplier-nation × order-year over a LIKE-filtered part
        slice;
- Q10 — returned-item revenue ranking (fact→orders→customer→nation, top-k);
- Q12 — late-shipment priority classification (CASE-sum conditional agg);
- Q15 — top-revenue supplier via a broadcast 1-row MAX join (scalar
        subquery decorrelated, the TF-IDF ``N`` pattern);
- Q16 — supplier counts per part class with a NOT-IN anti join, over a
        DISTINCT (partkey, suppkey) surrogate for the absent partsupp
        table;
- Q19 — disjunctive OR-of-ANDs join predicate (Catalyst must still extract
        the partkey equi-join key);
- Q21 — waiting-supplier double-correlated subquery: one EXISTS (another
        supplier in the order) + one NOT EXISTS (no *other* late supplier),
        as semi + anti joins with inequality residuals;
- Q2  — min-cost-supplier argmax per part (window row_number over a
        dim-broadcast candidate set);
- Q11 — important part value: per-part aggregate kept only above a
        fraction of the slice total (HAVING vs broadcast 1-row scalar);
- Q20 — potential part promotion: two stacked IN-subqueries as nested
        semi joins over a per-(part, supplier) aggregate gate.

The fixture's ``lineitem`` has no commitdate/receiptdate and there is no
partsupp table (TESTDATA.md), so lateness is adapted to
``l_shipdate > o_orderdate + K days`` and partsupp to
``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` — the *plan shapes*
(semi/anti with residuals, scalar-max broadcast, disjunctive pushdown)
are the point, not the official spec numbers.

Cross-engine determinism follows the star_queries rules: ROUND(…, 2) on
double aggregates in both engines, BIGINT casts on counts, a unique total
order before every LIMIT, ``CAST(year(…) AS INTEGER)`` on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.plans.star_queries import _r2, _t, register


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS → LEFT SEMI with range residual
# ---------------------------------------------------------------------------

@register(
    "q4_priority_late_exists",
    """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: the correlated EXISTS becomes one LEFT SEMI join
    whose condition mixes the orderkey equi-key with the per-row range
    residual (shipdate > orderdate + 60d) — no distinct/aggregate
    pre-pass, and each qualifying order is counted once no matter how
    many late lineitems it has. Scale shape: the date window pushes into
    the orders scan; lineitem is pruned to (orderkey, shipdate)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between a nation pair, both directions
# ---------------------------------------------------------------------------

@register(
    "q7_bi_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_bi_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same 25-row nation dimension joins twice under
    different roles (supplier side / customer side) with a disjunctive
    pair predicate across the two aliases. Scale shape: both nation
    joins broadcast; the pair filter cannot be pushed below the joins
    (it spans both) but the 2-year shipdate range prunes the fact scan,
    and the final rollup groups on 3 low-cardinality keys."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = (
        _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_r2(F.sum("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE 0.0 END) / SUM(volume), 4) AS mkt_share,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional promo volume per
    order year — a conditional-sum / total-sum ratio over an 8-way
    snowflake (the largest join tree in the catalog). Scale shape: the
    region filter prunes the customer-side nation broadcast BEFORE the
    fact join; part is filtered to one type and broadcast; the ratio is
    a single partial/final aggregate per year (Q14's pattern)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.round(F.sum(national) / F.sum("volume"), 4).alias("mkt_share"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and order year
# ---------------------------------------------------------------------------

@register(
    "q9_profit_by_nation_year",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity
                     AS DECIMAL(18, 4))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit rollup over a LIKE-filtered part slice
    (the fixture has no ps_supplycost, so cost is adapted to
    0.1 × p_retailprice × quantity — same expression shape: a
    two-table arithmetic inside the aggregate). Scale shape: the LIKE
    filter keeps only ~13% of parts and broadcasts them, pruning
    lineitem at the first join; orders contributes only (orderkey,
    orderdate); the group keys are (25 nations × years). The profit term
    subtracts two same-magnitude sums (revenue − cost), which amplifies
    double summation-order noise past ROUND(…, 2) — so each row's profit
    is cast to DECIMAL(18,4) and summed exactly in BOTH engines (order-
    independent), with one final round/cast back to double."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("nation", F.year("o_orderdate").alias("o_year"), profit.alias("pf"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("pf"), 2).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue ranking
# ---------------------------------------------------------------------------

@register(
    "q10_returned_revenue_topk",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers who returned
    items in a quarter window. Scale shape: both predicates (returnflag
    on the fact scan, date range on orders) push down; nation broadcasts;
    the ranking is top-20 with a unique custkey tiebreak, planned as
    TakeOrderedAndProject — never a global sort."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _r2(F.sum(rev)).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — late-shipment priority classification
# ---------------------------------------------------------------------------

@register(
    "q12_late_priority_by_flag",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q12_late_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class conditional counts over late
    shipments (the fixture has no l_shipmode/commitdate, so the group
    key is the returnflag and lateness is shipdate vs orderdate + 90d —
    the CASE-sum pivot and the join-residual range predicate are the
    shape). Scale shape: the one-year shipdate window pushes into the
    fact scan; the lateness residual is evaluated on the join output;
    the aggregate is 3 groups × 2 conditional sums, partial+final."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q15 — top-revenue supplier via broadcast scalar MAX
# ---------------------------------------------------------------------------

@register(
    "q15_top_revenue_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top-supplier view + scalar MAX subquery,
    decorrelated into a global window MAX over the per-supplier revenue
    aggregate. A broadcast 1-row max join would be cleaner on paper, but
    Spark does not CSE the aggregate across the two branches — it would
    scan and shuffle lineitem TWICE. The empty-partitionBy window runs
    single-partition, which is safe here because its input is the
    post-aggregation supplier-cardinality table (dimension-bounded, the
    same justification as j5_share_of_total_window), not the fact table.
    Equality is on ROUND(…, 2) values in BOTH engines, which pins the
    float comparison cross-engine. Ties (several suppliers at the max)
    are all returned, per the spec."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "total_rev"
            )
        )
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn(
            "max_rev",
            F.max("total_rev").over(Window.partitionBy()),
        )
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts per part class, NOT-IN anti join
# ---------------------------------------------------------------------------

@register(
    "q16_supplier_counts_by_class",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'ECONOMY'
      AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 36)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 40
    """,
)
def q16_supplier_counts_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    class, excluding a blocklisted supplier set via NOT IN → LEFT ANTI.
    The fixture has no partsupp, so the part–supplier relation is the
    DISTINCT (l_partkey, l_suppkey) projection of lineitem — one
    map-side-combinable distinct over exactly the two join columns.
    Scale shape: part's class filter broadcast-prunes the pair set; the
    blocklist (LIKE-filtered supplier keys) is tiny and anti-joins
    broadcast; COUNT(DISTINCT) runs over the pruned pairs only."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blocked = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(blocked), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive OR-of-ANDs join predicate
# ---------------------------------------------------------------------------

@register(
    "q19_disjunctive_revenue",
    """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR-ed conjunct groups that each mix
    part-side and lineitem-side predicates. The plan test to care about:
    Catalyst must still extract the common partkey equi-key (a
    BroadcastHashJoin with the disjunction as residual — not a nested
    loop), and the single-side implications of the OR (brand ∈ {12,23,34},
    size ≤ 15, quantity ∈ [1,30]) are derivable pushdowns. The part side
    is pre-filtered to the brand/size union before broadcasting."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    # single-side implication of the disjunction — prunes the broadcast
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") <= smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = (
        arm("Brand#12", 5, 1, 11)
        | arm("Brand#23", 10, 10, 20)
        | arm("Brand#34", 15, 20, 30)
    )
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).filter(cond)
    return j.agg(
        _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q21 — waiting suppliers: EXISTS + NOT EXISTS with inequality residuals
# ---------------------------------------------------------------------------

@register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late t
    JOIN supplier s ON s.s_suppkey = t.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = t.l_orderkey AND l2.l_suppkey <> t.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = t.l_orderkey AND l3.l_suppkey <> t.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    finished multi-supplier order — the double-correlated subquery pair
    becomes one LEFT SEMI (another supplier exists in the order) and one
    LEFT ANTI (no OTHER supplier was late) join, each with an orderkey
    equi-key plus a suppkey-inequality residual. Scale shape: ``late``
    is derived once from the date-residual join and reused for both the
    probe side and the anti side; supplier broadcasts; final top-k is
    TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    t = late.join(
        others,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        other_late,
        (F.col("y_orderkey") == F.col("l_orderkey"))
        & (F.col("y_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        t.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q2 — best supplier per part (argmax via window over a candidate set)
# ---------------------------------------------------------------------------

@register(
    "q2_best_supplier_per_part",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
        SELECT p.p_partkey, s.s_suppkey, s.s_name,
               ROUND(s.s_acctbal, 2) AS s_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY p.p_partkey
                   ORDER BY s.s_acctbal DESC, s.s_suppkey ASC
               ) AS rn
        FROM ps
        JOIN part p     ON p.p_partkey = ps.l_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
          AND p.p_type = 'SMALL'
          AND p.p_size BETWEEN 10 AND 20
    )
    SELECT p_partkey, s_suppkey, s_name, s_acctbal
    FROM cand WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey ASC
    LIMIT 50
    """,
)
def q2_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated MIN-cost subquery, re-expressed as
    an argmax-per-part window (the fixture has no ps_supplycost, so
    "best" is highest account balance with a unique suppkey tiebreak —
    same decorrelation: candidates → rank within part → rank 1). Scale
    shape: region→nation→supplier prunes the supplier side BEFORE the
    pair join; part's class filter broadcasts; the window partitions by
    partkey with bounded (≤ suppliers-per-part) groups, and raw (not
    rounded) balances order the window so ranking is exact."""
    ps = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & F.col("p_size").between(10, 20)
    ).select("p_partkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    cand = (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        cand.filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            _r2(F.col("s_acctbal")).alias("s_acctbal"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock value: group agg + HAVING vs broadcast scalar fraction
# ---------------------------------------------------------------------------

@register(
    "q11_important_part_value",
    """
    WITH sl AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_7', 'NATION_8', 'NATION_9')
    ), pv AS (
        SELECT l_partkey,
               SUM(l_quantity) AS q,
               SUM(l_extendedprice * (1 - l_discount)) AS v
        FROM lineitem JOIN sl ON s_suppkey = l_suppkey
        GROUP BY l_partkey
    ), tot AS (
        SELECT SUM(q) AS tq FROM pv
    )
    SELECT l_partkey,
           CAST(q AS BIGINT) AS part_qty,
           ROUND(v, 2) AS part_value
    FROM pv, tot
    WHERE q > 0.001 * tq
    ORDER BY part_qty DESC, l_partkey ASC
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value over a nation-sliced supplier set,
    kept only where it exceeds a FRACTION of the slice total — the
    HAVING-against-scalar-subquery pattern. The fixture has no partsupp,
    so value is the lineitem quantity/revenue supplied by those
    suppliers; the *threshold compares exact integer-valued quantity
    sums* (not FP revenue) so the boundary can never flip between
    engines. Scale shape: supplier slice broadcasts into the fact scan,
    one (partkey) shuffle builds the per-part table, the grand total is
    a 1-row aggregate joined back as a broadcast (the TF-IDF ``N``
    pattern — no window-over-everything), and the relative threshold is
    scale-invariant: the same 0.1% cut works at any SF."""
    n = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_7", "NATION_8", "NATION_9"))
        .select("n_nationkey")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    pv = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"),
        )
    )
    tot = pv.agg(F.sum("q").alias("tq"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("q") > F.lit(0.001) * F.col("tq"))
        .select(
            "l_partkey",
            F.col("q").cast("bigint").alias("part_qty"),
            _r2(F.col("v")).alias("part_value"),
        )
        .orderBy(F.desc("part_qty"), F.asc("l_partkey"))
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested semi joins over a pair-level gate
# ---------------------------------------------------------------------------

@register(
    "q20_promotion_suppliers",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_4')
      AND s.s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'
          )
          GROUP BY l_partkey, l_suppkey
          HAVING SUM(l_quantity) >= 40
             AND SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                           AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
                          THEN l_quantity ELSE 0 END)
                 > 0.5 * SUM(l_quantity)
      )
    ORDER BY s.s_name ASC, s.s_suppkey ASC
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two nested IN-subqueries become two stacked
    semi joins — part LIKE-slice gates the fact scan, a per-(part,
    supplier) aggregate gate (the availqty-vs-half-of-shipped
    comparison, adapted to window-share-of-total since the fixture has
    no partsupp) produces the qualifying supplier set, which semi-joins
    up to the nation-filtered supplier dimension. All quantity sums are
    integer-valued doubles, so the 0.5× comparison is exact in both
    engines. Scale shape: the part slice broadcasts (LIKE pruned to one
    column), the pair aggregate is one (partkey, suppkey) shuffle with
    map-side combine, the distinct qualifying-supplier set is tiny and
    broadcasts into the supplier semi join; nation broadcasts."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_window = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    ok = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("qt"),
            F.sum(F.when(in_window, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qw"),
        )
        .filter((F.col("qt") >= 40) & (F.col("qw") > F.lit(0.5) * F.col("qt")))
        .select("l_suppkey")
        .distinct()
    )
    n = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_4"))
        .select("n_nationkey", "n_name")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(ok, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy(F.asc("s_name"), F.asc("s_suppkey"))
    )


@register(
    "lineitem_open_census_topk",
    """
    WITH iv AS (
        SELECT CAST(o.o_orderdate AS DATE) AS sd,
               CAST(l.l_shipdate AS DATE) AS ed
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
          AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
    ), deltas AS (
        SELECT d,
               CAST(SUM(starts) AS BIGINT) AS n_started,
               CAST(SUM(ships) AS BIGINT) AS n_shipped
        FROM (
            SELECT sd AS d, 1 AS starts, 0 AS ships FROM iv
            UNION ALL
            SELECT ed AS d, 0 AS starts, 1 AS ships FROM iv
        ) GROUP BY d
    ), census AS (
        SELECT d, n_started, n_shipped,
               CAST(SUM(n_started - n_shipped) OVER (
                   ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_open
        FROM deltas
    )
    SELECT d AS census_date, n_started, n_shipped, n_open
    FROM census
    ORDER BY n_open DESC, census_date ASC
    LIMIT 10
    """,
)
def lineitem_open_census_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval census via boundary prefix-sums: for every calendar day,
    how many order lines are OPEN (ordered but not yet shipped) — the
    top-10 backlog-peak days. A line is open on day d iff
    o_orderdate <= d and l_shipdate > d (inverted ship-before-order
    rows are excluded as data errors), so each interval contributes
    two boundary events (+1 at its start date, -1 at its ship date) and
    the running sum of per-day deltas IS the census — no day-by-interval
    range join anywhere.

    This is the scalable alternative to the range-join formulation
    (date spine x intervals): the event aggregate is map-side
    combinable over the fact table, and the cumulative window runs over
    the DATE DOMAIN (~2.5k rows for 7 years) rather than the data — an
    unpartitioned window bounded by the calendar, not the corpus. Same
    trick as concurrent-sessions / max-overlap census at any scale.
    Same-day order+ship counts as closed by end of day (n_open is the
    end-of-day census). All integer arithmetic; ties in the top-10
    break by date."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").isNotNull())
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    iv = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.to_date("o_orderdate").alias("sd"),
            F.to_date("l_shipdate").alias("ed"),
        )
        # inverted intervals (shipped before ordered — present in the
        # synthetic fixture) would push their -1 boundary ahead of the
        # +1 and corrupt the running census; they are data errors and
        # are excluded identically in both engines
        .filter(F.col("ed") >= F.col("sd"))
    )
    deltas = (
        iv.select(F.col("sd").alias("d"), F.lit(1).alias("starts"), F.lit(0).alias("ships"))
        .unionAll(
            iv.select(F.col("ed").alias("d"), F.lit(0), F.lit(1))
        )
        .groupBy("d")
        .agg(
            F.sum("starts").cast("bigint").alias("n_started"),
            F.sum("ships").cast("bigint").alias("n_shipped"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    census = deltas.select(
        "d",
        "n_started",
        "n_shipped",
        F.sum(F.col("n_started") - F.col("n_shipped"))
        .over(w)
        .cast("bigint")
        .alias("n_open"),
    )
    return (
        census.select(
            F.col("d").alias("census_date"), "n_started", "n_shipped", "n_open"
        )
        .orderBy(F.desc("n_open"), F.asc("census_date"))
        .limit(10)
    )


@register(
    "orders_brand_basket_lift_topk",
    """
    WITH b AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), n AS (
        SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM b
    ), freq AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY brand
    ), pairs AS (
        SELECT a.brand AS brand_a, c.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM b a JOIN b c ON a.okey = c.okey AND a.brand < c.brand
        GROUP BY a.brand, c.brand
    )
    SELECT p.brand_a, p.brand_b, p.n_both,
           fa.c AS n_a, fb.c AS n_b,
           ROUND(CAST(n.n_orders AS DOUBLE) * p.n_both / (fa.c * fb.c), 4)
               AS lift
    FROM pairs p
    JOIN freq fa ON fa.brand = p.brand_a
    JOIN freq fb ON fb.brand = p.brand_b
    CROSS JOIN n
    ORDER BY p.n_both DESC, p.brand_a ASC, p.brand_b ASC
    LIMIT 20
    """,
)
def orders_brand_basket_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift — the itemset-mining shape
    the registry lacked: top-20 part-BRAND pairs appearing in the same
    order, with lift = N·c_ab/(c_a·c_b) (>1 ⇔ the brands co-occur more
    than independence predicts). Brand grain keeps the pair vocabulary
    bounded (25 brands → ≤300 pair keys) where raw part pairs would be
    sparse noise.

    Scale shape: the dimension join broadcasts; the basket table is
    DISTINCT (order, brand) — ≤ brands-per-order rows per order; the
    pair generator self-joins ON THE ORDER KEY, so fan-out per order is
    C(brands_in_order, 2) ≤ C(7,2), bounded by order width, never by
    corpus size (the same bounded-bucket rule as every dedup pair join).
    Counts are exact BIGINTs; lift is one fixed-shape ratio rounded at
    output; top-20 ties break on the pair key."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    b = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds N, freq, and both join sides
    )
    n = b.agg(F.countDistinct("okey").cast("bigint").alias("n_orders"))
    freq = b.groupBy("brand").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.okey") == F.col("c.okey"))
            & (F.col("a.brand") < F.col("c.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("c.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    fa = freq.select(F.col("brand").alias("brand_a"), F.col("c").alias("n_a"))
    fb = freq.select(F.col("brand").alias("brand_b"), F.col("c").alias("n_b"))
    return (
        pairs.join(F.broadcast(fa), "brand_a")
        .join(F.broadcast(fb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_orders").cast("double")
                * F.col("n_both")
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), F.asc("brand_a"), F.asc("brand_b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# RFM segmentation (round-10 session 2: classic CRM analytics)
# ---------------------------------------------------------------------------

_RFM_SQL = """
    WITH ref AS (
        SELECT CAST(MAX(o_orderdate) AS DATE) AS refd FROM orders
    ), cust AS (
        SELECT o_custkey,
               date_diff('day', CAST(MAX(o_orderdate) AS DATE), r.refd)
                   AS recency,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS monet
        FROM orders, ref r
        GROUP BY o_custkey, r.refd
    ), b AS (
        SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rb,
               quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
               quantile_cont(monet, [0.2, 0.4, 0.6, 0.8]) AS mb
        FROM cust
    ), scored AS (
        SELECT monet,
               5 - (CASE WHEN CAST(recency AS DOUBLE) > rb[1] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(recency AS DOUBLE) > rb[2] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(recency AS DOUBLE) > rb[3] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(recency AS DOUBLE) > rb[4] THEN 1 ELSE 0 END)
                   AS r_score,
               1 + (CASE WHEN CAST(freq AS DOUBLE) > fb[1] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(freq AS DOUBLE) > fb[2] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(freq AS DOUBLE) > fb[3] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(freq AS DOUBLE) > fb[4] THEN 1 ELSE 0 END)
                   AS f_score,
               1 + (CASE WHEN CAST(monet AS DOUBLE) > mb[1] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(monet AS DOUBLE) > mb[2] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(monet AS DOUBLE) > mb[3] THEN 1 ELSE 0 END
                  + CASE WHEN CAST(monet AS DOUBLE) > mb[4] THEN 1 ELSE 0 END)
                   AS m_score
        FROM cust, b
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           -- exact integer round-half-up of mean cents: (2s+n)//(2n) —
           -- a ROUND(double, 2) here lands on half-cent boundaries
           -- whenever n divides the sum neatly (found by the oracle at
           -- sf0.001: row with n=2 split .635 across engines)
           CAST((2 * SUM(monet) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS avg_monetary_cents
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
"""


@register("customer_rfm_segments", _RFM_SQL)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic CRM/retention cube (recency of
    last order, order frequency, monetary total) with each axis scored
    1-5 by equi-depth quintiles: the workhorse customer-value
    segmentation every analytics stack ships. Determinism: recency is
    an integer day diff against the corpus max date (broadcast 1-row);
    monetary is exact cents (1e2-quantized at birth); quintile
    boundaries are interpolated percentiles broadcast from one
    aggregate and compared with the CASE-sum binning (the
    ``docs_quality_calibration_bins`` no-NTILE discipline — recency
    inverts so 5 = most recent). Output: the (r, f, m) segment census
    with average customer value in EXACT cents via the integer
    round-half-up identity (2s+n)//(2n) — a ROUND(double) here sits on
    half-cent boundaries whenever the segment count divides the sum
    (the FLOAT_ROUND_LEDGER hazard; the oracle caught a live n=2 case
    at sf0.001). Scale: one per-customer agg
    (hash-partitioned on custkey), a 12-scalar boundary broadcast, one
    rollup — no windows, no sorts beyond the output ORDER BY."""
    o = _t(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("refd"))
    cust = (
        o.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey", "refd")
        .agg(
            F.datediff(
                F.col("refd"), F.max(F.col("o_orderdate").cast("date"))
            ).alias("recency"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monet"),
        )
    )
    qs = "array(CAST(0.2 AS DOUBLE), CAST(0.4 AS DOUBLE), CAST(0.6 AS DOUBLE), CAST(0.8 AS DOUBLE))"
    b = cust.agg(
        F.expr(f"percentile(recency, {qs})").alias("rb"),
        F.expr(f"percentile(freq, {qs})").alias("fb"),
        F.expr(f"percentile(monet, {qs})").alias("mb"),
    )

    def bins(col: str, arr: str):
        return sum(
            F.when(
                F.col(col).cast("double") > F.element_at(arr, i + 1), 1
            ).otherwise(0)
            for i in range(4)
        )

    scored = cust.crossJoin(F.broadcast(b)).select(
        "monet",
        (5 - bins("recency", "rb")).alias("r_score"),
        (1 + bins("freq", "fb")).alias("f_score"),
        (1 + bins("monet", "mb")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("(2 * sum(monet) + count(1)) div (2 * count(1))")
            .cast("bigint")
            .alias("avg_monetary_cents"),
        )
        .select(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            F.col("m_score").cast("bigint").alias("m_score"),
            "n_customers",
            "avg_monetary_cents",
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve (round-10 session 2)
# ---------------------------------------------------------------------------

_LTV_SQL = """
    WITH om AS (
        SELECT o_custkey,
               year(o_orderdate) * 12 + month(o_orderdate) AS ym,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), first AS (
        SELECT o_custkey, MIN(ym) AS ym0 FROM om GROUP BY o_custkey
    ), cohorts AS (
        SELECT ym0, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM first GROUP BY ym0
    ), aged AS (
        SELECT f.ym0, om.ym - f.ym0 AS age, om.cents
        FROM om JOIN first f USING (o_custkey)
        WHERE f.ym0 < 1996 * 12 + 1
    ), rolled AS (
        SELECT ym0, age,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS rev_cents
        FROM aged GROUP BY ym0, age
    ), cum AS (
        SELECT ym0, age, n_orders, rev_cents,
               CAST(SUM(rev_cents) OVER (
                   PARTITION BY ym0 ORDER BY age
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_cents
        FROM rolled
    )
    SELECT CAST(c.ym0 // 12 AS BIGINT) AS cohort_year,
           CAST(c.ym0 % 12 AS BIGINT) AS cohort_month0,
           CAST(c.age AS BIGINT) AS age_months,
           c.n_orders, c.rev_cents,
           -- exact integer round-half-up of cumulative cents per cohort
           -- customer (the RFM money-rounding hazard, same fix)
           CAST((2 * c.cum_cents + h.cohort_size)
                // (2 * h.cohort_size) AS BIGINT) AS ltv_cents_per_customer
    FROM cum c JOIN cohorts h USING (ym0)
    ORDER BY cohort_year, cohort_month0, age_months
"""


@register("orders_cohort_ltv_curve", _LTV_SQL)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the growth-analytics table behind
    every retention dashboard: customers cohort by FIRST-order month,
    and each cohort's revenue accumulates over integer month age
    (year*12+month arithmetic — no ``months_between`` float semantics),
    yielding cumulative LTV per cohort customer. Restricted to the 1995
    first-year cohorts so the curve family is bounded (12 cohorts x
    corpus-lifetime ages). Determinism: revenue is exact cents; ages
    and cohort keys are pure integer arithmetic; the cumulation is an
    exact int window partitioned by cohort; per-customer LTV is the
    exact integer round-half-up (2s+n)//(2n) in cents (the RFM
    money-rounding hazard, same fix). Scale: first-order month is
    one per-customer agg; the age rollup is a hash agg; the cumulative
    window partitions by cohort month (bounded partitions — at most
    corpus-lifetime months of rows each)."""
    o = _t(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    first = om.groupBy("o_custkey").agg(F.min("ym").alias("ym0"))
    cohorts = first.groupBy("ym0").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    aged = (
        om.join(first, "o_custkey")
        .filter(F.col("ym0") < 1996 * 12 + 1)
        .select("ym0", (F.col("ym") - F.col("ym0")).alias("age"), "cents")
    )
    rolled = aged.groupBy("ym0", "age").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
    )
    w = (
        Window.partitionBy("ym0")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rolled.withColumn(
        "cum_cents", F.sum("rev_cents").over(w).cast("bigint")
    )
    return (
        cum.join(F.broadcast(cohorts), "ym0")
        .select(
            F.expr("ym0 div 12").cast("bigint").alias("cohort_year"),
            (F.col("ym0") % 12).cast("bigint").alias("cohort_month0"),
            F.col("age").cast("bigint").alias("age_months"),
            "n_orders",
            "rev_cents",
            F.expr("(2 * cum_cents + cohort_size) div (2 * cohort_size)")
            .cast("bigint")
            .alias("ltv_cents_per_customer"),
        )
        .orderBy("cohort_year", "cohort_month0", "age_months")
    )
