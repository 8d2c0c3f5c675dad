"""Extended TPC-H-style coverage (q2/q6/q7/q8/q9/q11/q13/q15/q16/q17/q19/
q20/q21/q22 shapes) adapted to the driver's reduced schema (no partsupp,
no commit/receipt dates, no containers — see TESTDATA.md).

Together with operators/relational.py this exercises every TPC-H query
archetype the engine side must plan well: pure scans (q6, q19), multi-way
fact joins with dimension broadcast (q7, q8, q9), left-join histograms
(q13), per-group argmin/argmax (q2, q15), distinct-count grouping (q16),
correlated scalar thresholds in exact integer form (q17, q22), and double
correlated EXISTS/NOT EXISTS (q21).

Determinism: every money/quantity aggregate goes through per-row
ROUND(x*scale)→BIGINT (order-insensitive integer sums, identical IEEE
multiply+round both engines — see operators/relational._cents); ratio
thresholds that TPC-H states as `x < 0.2 * AVG(...)` are cross-multiplied
into pure-integer comparisons so no engine-specific float division sits on
a decision boundary.

Scale notes (100 TB): all dimension joins (part, supplier, nation, region)
broadcast; lineitem⋈orders shuffles on orderkey; the q17/q15 pre-aggregates
reduce map-side before their joins; q21's two correlated predicates are one
shuffle each (semi + anti on l_orderkey), not per-row subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sqlmesh_spark.operators.relational import (
    REVENUE,
    _cents,
    _money_sum,
    _sql_money_sum,
)
from sqlmesh_spark.registry import register
from sqlmesh_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# q6 — forecasting revenue change: the purest pushdown scan
# --------------------------------------------------------------------------

Q6_ORACLE = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=Q6_ORACLE, tags=("relational", "tpch", "bench"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table scan where every predicate reaches the parquet reader
    (PushedFilters) — the query whose plan IS the scan."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --------------------------------------------------------------------------
# q7 — volume shipping between two nations
# --------------------------------------------------------------------------

Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       YEAR(l_shipdate) AS l_year,
       {_sql_money_sum(REVENUE, "revenue")}
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
"""


@register("q7_volume_shipping", oracle=Q7_ORACLE, tags=("relational", "tpch"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2")
    ) | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2.n_nationkey"))
        .filter(pair)
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_money_sum(rev, "revenue"))
    )


# --------------------------------------------------------------------------
# q8 — national market share
# --------------------------------------------------------------------------

Q8_ORACLE = """
SELECT YEAR(o_orderdate) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                  THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                  ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE),
         6) AS mkt_share
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY YEAR(o_orderdate)
"""


@register("q8_market_share", oracle=Q8_ORACLE, tags=("relational", "tpch", "bench"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-of-conditional-sums over an 8-way join; both sums accumulate
    exact cents so the final IEEE division matches the oracle's bitwise."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    national = F.when(F.col("n2.n_name") == "NATION_3", cents).otherwise(F.lit(0))
    # Region restriction pushed below the fact joins (guide §2.3): the
    # AMERICA nation keys semi-join customer first (~5× smaller), and
    # orders joins those customers BEFORE the big orderkey exchange —
    # the orders side of the fact join is pre-shrunk by both the date
    # filter and the region filter. Inner-join reordering only.
    am_keys = (
        n1.join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .select(F.col("n1.n_nationkey").alias("am_nationkey"))
    )
    c_am = c.join(
        F.broadcast(am_keys), c.c_nationkey == F.col("am_nationkey"), "left_semi"
    ).select("c_custkey")
    o_am = o.join(c_am, o.o_custkey == c_am.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o_am, l.l_orderkey == o_am.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum(cents).cast("double"), 6
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# q9 — product-type profit (cost proxied by 10% of retail price: no partsupp)
# --------------------------------------------------------------------------

Q9_ORACLE = """
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              - CAST(ROUND(p_retailprice * l_quantity * 10) AS BIGINT)) AS DOUBLE) / 100 AS profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, YEAR(o_orderdate)
"""


@register("q9_product_profit", oracle=Q9_ORACLE, tags=("relational", "tpch"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - _cents(
        F.col("p_retailprice") * F.col("l_quantity"), unit=10
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(amount).cast("double") / 100).alias("profit"))
    )


# --------------------------------------------------------------------------
# q13 — customer order-count distribution (LEFT JOIN histogram)
# --------------------------------------------------------------------------

Q13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=Q13_ORACLE, tags=("relational", "tpch"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation over an outer join: COUNT of a nullable column
    counts only matched rows, so no-order customers land in bucket 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q15 — top supplier by quarterly revenue (argmax via exact-cents equality)
# --------------------------------------------------------------------------

Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_cents AS DOUBLE) / 100 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
"""


@register("q15_top_supplier", oracle=Q15_ORACLE, tags=("relational", "tpch"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery argmax. The max compares exact int cents, so the
    `= MAX(...)` predicate is deterministic across engines (a double
    revenue here could straddle a ULP and drop/keep ties differently)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_cents"))
    )
    best = rev.withColumn("mx", F.max("total_cents").over(W.partitionBy())).filter(
        F.col("total_cents") == F.col("mx")
    )
    return (
        best.join(F.broadcast(s), best.supplier_no == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents").cast("double") / 100).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# q16 — supplier variety per part group (distinct-count grouping)
# --------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_part_supplier_variety", oracle=Q16_ORACLE, tags=("relational", "tpch"))
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q17 — small-quantity-order revenue (correlated AVG threshold, integerized)
# --------------------------------------------------------------------------

Q17_ORACLE = """
WITH agg AS (
  SELECT l_partkey AS a_partkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sum_qcents,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 700, 6) AS avg_yearly
FROM lineitem
JOIN agg ON l_partkey = a_partkey
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND 5 * CAST(ROUND(l_quantity * 100) AS BIGINT) * n < sum_qcents
"""


@register("q17_small_quantity_revenue", oracle=Q17_ORACLE, tags=("relational", "tpch"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H's `l_quantity < 0.2 * AVG(l_quantity)` cross-multiplied to
    `5 * qty_cents * n < sum_qcents`: pure int64 comparison, no float
    division on the decision boundary."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    agg = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(_cents("l_quantity")).alias("sum_qcents"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        l.join(agg, l.l_partkey == agg.a_partkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(5 * _cents("l_quantity") * F.col("n") < F.col("sum_qcents"))
        .agg(
            F.round(F.sum(_cents("l_extendedprice")).cast("double") / 700, 6).alias(
                "avg_yearly"
            )
        )
    )


# --------------------------------------------------------------------------
# q19 — discounted revenue over OR-of-ANDs ranges
# --------------------------------------------------------------------------

Q19_ORACLE = f"""
SELECT {_sql_money_sum(REVENUE, "revenue")}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity >= 10 AND l_quantity <= 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35 AND l_quantity >= 20 AND l_quantity <= 50)
"""


@register("q19_discounted_revenue", oracle=Q19_ORACLE, tags=("relational", "tpch"))
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-range predicate spanning both join sides — the
    planner must keep it post-join without exploding it."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")

    def band(brand: str, lo: int, hi: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(lo, hi)
            & (q >= qlo)
            & (q <= qhi)
        )

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(
            band("Brand#1", 1, 15, 1, 30)
            | band("Brand#2", 10, 25, 10, 40)
            | band("Brand#3", 20, 35, 20, 50)
        )
        .agg(_money_sum(rev, "revenue"))
    )


# --------------------------------------------------------------------------
# q21 — lone-fault supplier (double correlated EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------

Q21_ORACLE = """
SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("q21_lone_fault_supplier", oracle=Q21_ORACLE, tags=("relational", "tpch", "bench"))
def q21_lone_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21's signature construct: the same fact table correlated twice —
    once EXISTS (another supplier touched the order), once NOT EXISTS
    (no other supplier also faulted).

    Both correlations collapse into ONE per-order aggregation of lineitem
    (guide §2.3 "aggregate before you shuffle" / §2.4): per order collect
    the distinct supplier set and the distinct R-flagged supplier set.
    A supplier's R row qualifies iff |suppliers| ≥ 2 (EXISTS another
    supplier) and the R set is exactly {them} (NOT EXISTS another fault).
    Both set tests collapse to codegen'd MIN/MAX primitives —
    |distinct| ≥ 2 ⟺ min ≠ max, |distinct R| = 1 ⟺ r_min = r_max
    (non-NULL) — so lineitem is scanned and shuffled ONCE carrying four
    int64 partial aggregates (no collect_set object aggregation)
    instead of three passes through semi/anti join legs; the lone fault
    supplier IS r_min. COUNT(DISTINCT l1.l_orderkey) becomes a plain
    COUNT(*) — qualifying orders are unique rows by construction —
    removing the distinct-aggregate Expand. Results are identical to
    the EXISTS/NOT-EXISTS oracle."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    r_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = (
        l.select("l_orderkey", "l_suppkey", r_supp.alias("r_suppkey"))
        .groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("s_min"),
            F.max("l_suppkey").alias("s_max"),
            F.min("r_suppkey").alias("r_min"),
            F.max("r_suppkey").alias("r_max"),
        )
        .filter(
            F.col("r_min").isNotNull()
            & (F.col("r_min") == F.col("r_max"))
            & (F.col("s_min") != F.col("s_max"))
        )
        .select("l_orderkey", F.col("r_min").alias("fault_suppkey"))
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), per_order.fault_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q22 — global sales opportunity (above-average balance, no orders)
# --------------------------------------------------------------------------

Q22_ORACLE = """
WITH bal AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
stats AS (
  SELECT SUM(bal_cents) AS s, COUNT(*) AS n FROM bal WHERE bal_cents > 0
)
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(bal_cents) AS DOUBLE) / 100 AS totacctbal
FROM bal, stats
WHERE bal_cents * n > s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
"""


@register("q22_sales_opportunity", oracle=Q22_ORACLE, tags=("relational", "tpch"))
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`c_acctbal > AVG(positive balances)` cross-multiplied to integers
    (bal_cents * n > sum_cents) and the 1-row stats relation broadcast —
    q22's anti join + above-average filter without a float boundary.
    "Lapsed" = no order since 1999 (every synthetic customer has *some*
    order, so the classic no-orders-ever correlation would be empty)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_cents")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    stats = c.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_cents") * F.col("n") > F.col("s"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_cents").cast("double") / 100).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# q2 — min-per-group supplier selection (argmin over a derived catalog)
# --------------------------------------------------------------------------

Q2_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (
  SELECT p_partkey, p_name, s_name,
         CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal_cents,
         ROW_NUMBER() OVER (PARTITION BY p_partkey
                            ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT), s_suppkey) AS rn
  FROM part
  JOIN ps ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size = 15 AND p_type = 'STANDARD'
)
SELECT p_partkey, p_name, s_name, CAST(bal_cents AS DOUBLE) / 100 AS s_acctbal
FROM j WHERE rn = 1
"""


@register("q2_min_cost_supplier", oracle=Q2_ORACLE, tags=("relational", "tpch"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2's shape without partsupp: the part↔supplier catalog is derived
    (DISTINCT pairs from lineitem), then the correlated MIN subquery
    becomes a per-part argmin window with exact-cents ordering."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "s_suppkey",
            _cents("s_acctbal").alias("bal_cents"),
        )
    )
    w = W.partitionBy("p_partkey").orderBy("bal_cents", "s_suppkey")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            (F.col("bal_cents").cast("double") / 100).alias("s_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# q11 — important stock identification (no partsupp: per-part shipped value
# from lineitem⋈supplier restricted to one nation). Archetype: GROUP BY with
# HAVING against a *global* scalar aggregate of the same grouped relation.
# --------------------------------------------------------------------------

Q11_ORACLE = """
WITH v AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 2
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_cents AS DOUBLE) / 100 AS part_value
FROM v
WHERE value_cents * (SELECT COUNT(*) FROM v) * 10 > (SELECT SUM(value_cents) FROM v) * 11
"""


@register("q11_important_stock", oracle=Q11_ORACLE, tags=("relational", "tpch"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11's shape (tpch q11; reference delegates it to the engine like all
    model SQL — sqlmesh/core/renderer.py:517): grouped values filtered
    against a global threshold derived from the whole grouped relation.

    The threshold `value > 1.1 * AVG(value)` is cross-multiplied into pure
    int64 (`value_cents * n * 10 > total_cents * 11`) so no float division
    sits on the keep/drop boundary. Scale: the grouped relation is computed
    ONCE, and the global (count, sum) scalar — one row — broadcasts back
    onto it; at 100 TB this is one shuffle on l_partkey plus a scalar
    reduce, never a re-scan of lineitem.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 2)
    v = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    totals = v.agg(
        F.count(F.lit(1)).alias("n_parts"), F.sum("value_cents").alias("total_cents")
    )
    return (
        v.join(F.broadcast(totals))
        .filter(F.col("value_cents") * F.col("n_parts") * 10 > F.col("total_cents") * 11)
        .select(
            "l_partkey", (F.col("value_cents").cast("double") / 100).alias("part_value")
        )
    )


# --------------------------------------------------------------------------
# q20 — potential part promotion (no partsupp: the availqty>½·shipped test
# becomes pair-qty > 2× average pair-qty). Archetype: a nested semi-join
# chain — name-filtered parts → aggregated lineitem threshold → suppliers.
# --------------------------------------------------------------------------

Q20_ORACLE = """
WITH pairs AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty100
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
hot AS (
  SELECT DISTINCT l_suppkey FROM pairs
  WHERE qty100 * (SELECT COUNT(*) FROM pairs) > (SELECT SUM(qty100) FROM pairs) * 2
)
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM hot)
  AND s_nationkey = 1
"""


@register("q20_part_promotion", oracle=Q20_ORACLE, tags=("relational", "tpch"))
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20's nested-semi-join archetype: filtered part list feeds a grouped
    lineitem threshold, whose surviving supplier keys semi-join the supplier
    dimension (tpch q20's IN (... IN (...)) chain).

    Threshold integerized as `qty100 * n_pairs > total * 2` (pair ships
    more than 2× the average pair). Scale: part-name filter broadcasts into
    the lineitem scan, the pair aggregation is the only big shuffle, and
    the final IN becomes a broadcast LEFT SEMI join of a key set that is
    orders of magnitude smaller than supplier.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    pairs = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents("l_quantity")).alias("qty100"))
    )
    totals = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("qty100").alias("total100")
    )
    hot = (
        pairs.join(F.broadcast(totals))
        .filter(F.col("qty100") * F.col("n_pairs") > F.col("total100") * 2)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 1)
    return s.join(F.broadcast(hot), s.s_suppkey == hot.l_suppkey, "left_semi").select(
        "s_name", "s_acctbal"
    )
