"""Relational query surface — the constructs SQLMesh models/framework emit.

SQLMesh delegates all relational execution to the engine (SURVEY §2.B); here
the engine is Spark. These cases cover every construct the reference's
framework generates (equi joins of all shapes, group-by aggregates, window
dedup, unions, time-range predicates, date spines) plus TPC-H-style analyses
proving the engine side.

Scale notes (100 TB):
- Fact-fact joins (lineitem⋈orders) shuffle on the join key; dimension
  joins broadcast (region/nation always; AQE handles customer/supplier when
  post-filter size is under the threshold).
- Money aggregates use exact integer-cents arithmetic: per-row
  ROUND(x*100)→BIGINT is bit-identical across engines (same IEEE multiply,
  same half-away-from-zero round), and integer SUM is order-insensitive —
  so results are stable under AQE re-planning and partial-agg reordering.

Reference parity: construct inventory at sqlmesh/core/engine_adapter/
base.py:2037-2148 (joins/unions), sqlmesh/core/macros.py:1286-1292 (window
dedup), sqlmesh/utils/date.py:224-270 (time-range predicates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sqlmesh_spark.registry import register
from sqlmesh_spark.sources.tables import load_table


def _cents(expr, unit: int = 100) -> Column:
    """Exact per-row integer scaling: ROUND(x*unit) as BIGINT.

    The multiply is one IEEE op (identical in any engine), the round is
    half-away-from-zero (Spark HALF_UP == DuckDB round), so every engine
    derives the same int64 — making SUM order-insensitive and exact.
    """
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.round(c * unit).cast("bigint")


def _money_sum(expr, alias: str, unit: int = 100) -> Column:
    return (F.sum(_cents(expr, unit)).cast("double") / unit).alias(alias)


def _avg6(expr, alias: str, unit: int = 100) -> Column:
    """Average with exact integer sum, rounded to 6 places."""
    return F.round(
        F.sum(_cents(expr, unit)).cast("double") / (F.count(F.lit(1)) * unit), 6
    ).alias(alias)


# Oracle-side SQL for the same patterns (DuckDB dialect == ANSI here).
def _sql_money_sum(expr: str, alias: str, unit: int = 100) -> str:
    return f"CAST(SUM(CAST(ROUND(({expr}) * {unit}) AS BIGINT)) AS DOUBLE) / {unit} AS {alias}"


def _sql_avg6(expr: str, alias: str, unit: int = 100) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(ROUND(({expr}) * {unit}) AS BIGINT)) AS DOUBLE)"
        f" / ({unit} * COUNT(*)), 6) AS {alias}"
    )


REVENUE = "l_extendedprice * (1 - l_discount)"

# --------------------------------------------------------------------------
# Flagship: daily revenue (the minimum end-to-end slice of SURVEY §7)
# --------------------------------------------------------------------------

DAILY_REVENUE_ORACLE = f"""
SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       {_sql_money_sum(REVENUE, "revenue")},
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY strftime(o_orderdate, '%Y-%m-%d')
"""


@register("daily_revenue", oracle=DAILY_REVENUE_ORACLE, tags=("relational", "flagship", "bench"))
def daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregation pushdown: lineitem collapses to per-order revenue
    BEFORE the join (a rewrite Catalyst doesn't do for COUNT(DISTINCT)),
    so the join carries |orders| rows instead of |lineitem| and the
    date-level COUNT(DISTINCT l_orderkey) becomes a plain COUNT(*) — no
    expand. At 100 TB this cuts the shuffled join input ~40× and removes
    the distinct-aggregate's second exchange; ~2× faster at sf0.1."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_order = lineitem.groupBy("l_orderkey").agg(F.sum(_cents(rev)).alias("rev_cents"))
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(
            (F.sum("rev_cents").cast("double") / 100).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H-style engine coverage
# --------------------------------------------------------------------------

Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_money_sum("l_quantity", "sum_qty")},
       {_sql_money_sum("l_extendedprice", "sum_base_price")},
       {_sql_money_sum(REVENUE, "sum_disc_price")},
       {_sql_money_sum(REVENUE + " * (1 + l_tax)", "sum_charge")},
       {_sql_avg6("l_quantity", "avg_qty")},
       {_sql_avg6("l_extendedprice", "avg_price")},
       {_sql_avg6("l_discount", "avg_disc", unit=1000000)},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, tags=("relational", "bench"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = rev * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _money_sum("l_quantity", "sum_qty"),
        _money_sum("l_extendedprice", "sum_base_price"),
        _money_sum(rev, "sum_disc_price"),
        _money_sum(charge, "sum_charge"),
        _avg6("l_quantity", "avg_qty"),
        _avg6("l_extendedprice", "avg_price"),
        _avg6("l_discount", "avg_disc", unit=1_000_000),
        F.count(F.lit(1)).alias("count_order"),
    )


Q3_ORACLE = f"""
SELECT l_orderkey,
       {_sql_money_sum(REVENUE, "revenue")},
       strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=Q3_ORACLE, tags=("relational", "bench"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Pre-aggregate lineitem per order BEFORE the join: map-side partial
    # aggregation shrinks the shuffle to one row per order, the join is
    # then 1:1 on o_orderkey, and no post-join aggregation exists at all.
    # customer is the small side post-filter — broadcast it so the big
    # fact aggregation is the only shuffle.
    per_order = l.groupBy("l_orderkey").agg(F.sum(_cents(rev)).alias("rev_cents"))
    # The segment filter joins into orders BEFORE the orderkey exchange
    # (guide §2.3): the orders side of the fact join shuffles ~1/5 of the
    # rows instead of broadcasting customer after the shuffle.
    o_bldg = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        per_order.join(o_bldg, per_order.l_orderkey == o_bldg.o_orderkey)
        .select(
            "l_orderkey",
            (F.col("rev_cents").cast("double") / 100).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q5_ORACLE = f"""
SELECT n_name,
       {_sql_money_sum(REVENUE, "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=Q5_ORACLE, tags=("relational", "bench"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The region/nation restriction is pushed BELOW the fact joins
    (guide §2.3 "shuffle fewer bytes", §3.2 pre-filter before the
    exchange): nation⋈region(ASIA) broadcasts into customer and supplier
    first, shrinking both ~5× before any fact shuffle, and orders joins
    the filtered customers before the big orderkey exchange — so the
    lineitem⋈orders join output (and the downstream suppkey shuffle) is
    already restricted to ASIA customers. Inner-join/filter reordering
    only: results identical to the unordered oracle join graph."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia_n = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c_asia = c.join(F.broadcast(asia_n), c.c_nationkey == asia_n.n_nationkey).select(
        "c_custkey", "c_nationkey", "n_name"
    )
    s_asia = s.join(
        F.broadcast(asia_n.select("n_nationkey")),
        s.s_nationkey == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey", "s_nationkey")
    o_asia = o.join(c_asia, o.o_custkey == c_asia.c_custkey).select(
        "o_orderkey", "c_nationkey", "n_name"
    )
    return (
        l.join(o_asia, l.l_orderkey == o_asia.o_orderkey)
        .join(
            s_asia,
            (l.l_suppkey == s_asia.s_suppkey)
            & (F.col("c_nationkey") == s_asia.s_nationkey),
        )
        .groupBy("n_name")
        .agg(_money_sum(rev, "revenue"))
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {_sql_money_sum(REVENUE, "revenue")},
       CAST(ROUND(ANY_VALUE(c_acctbal) * 100) AS DOUBLE) / 100 AS c_acctbal,
       ANY_VALUE(n_name) AS n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=Q10_ORACLE, tags=("relational", "bench"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Pre-aggregate returned-item revenue per order first: the orders and
    # customer joins then carry one row per order, not one per lineitem —
    # at 100 TB the big fact shuffle happens once, at its smallest width.
    per_order = l.groupBy("l_orderkey").agg(F.sum(_cents(rev)).alias("rev_cents"))
    # Collapse to one row per CUSTOMER before touching the customer
    # dimension (guide §2.3 "aggregate before you shuffle"): the custkey
    # exchange then carries |customers-with-returns| pre-aggregated rows,
    # not every matched order, and the customer join happens at the
    # smallest possible cardinality. Integer-cents sums reassociate
    # exactly, so grouping per-order → per-customer is value-identical
    # to the oracle's flat GROUP BY c_custkey, c_name.
    per_cust = (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_cents").alias("rev_cents"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            (F.col("rev_cents").cast("double") / 100).alias("revenue"),
            (F.round(F.col("c_acctbal") * 100).cast("double") / 100).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Framework-generated construct coverage
# --------------------------------------------------------------------------

WINDOW_DEDUP_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM (
  SELECT event_id, user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


@register("window_dedup_latest", oracle=WINDOW_DEDUP_ORACLE, tags=("relational",))
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER()=1 dedup — the construct @deduplicate expands to
    (reference macros.py:1286-1292). Orders by exact epoch-nanos so
    nanosecond-precision engines agree on ties."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts_ns"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


TOPK_ORACLE = f"""
SELECT p_brand, p_partkey, revenue FROM (
  SELECT p_brand, p_partkey,
         {_sql_money_sum(REVENUE, "revenue")},
         ROW_NUMBER() OVER (
           PARTITION BY p_brand
           ORDER BY CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100 DESC,
                    p_partkey) AS rn
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
) t WHERE rn <= 3
"""


@register("topk_per_group", oracle=TOPK_ORACLE, tags=("relational", "bench"))
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per brand — window over aggregate.

    lineitem pre-aggregates to one row per partkey BEFORE the part join
    (guide §2.3): the join then carries |parts| rows instead of
    |lineitem|, and at scale (where part no longer broadcasts) the
    partkey shuffle moves pre-aggregated cents, not raw line items.
    p_brand is functionally dependent on p_partkey, so grouping by
    partkey alone is value-identical to the oracle's GROUP BY
    (p_brand, p_partkey)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = l.groupBy("l_partkey").agg(F.sum(_cents(rev)).alias("rev_cents"))
    agg = (
        per_part.join(p.select("p_partkey", "p_brand"), per_part.l_partkey == F.col("p_partkey"))
        .select(
            "p_brand",
            "p_partkey",
            (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        )
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue"), "p_partkey")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "revenue")
    )


RUNNING_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) OVER (
         PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS running_qty
FROM lineitem WHERE l_suppkey <= 10
"""


@register("window_running_total", oracle=RUNNING_ORACLE, tags=("relational",))
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(_cents("l_quantity")).over(w).cast("double") / 100).alias("running_qty"),
    )


SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_ns(ts) - epoch_ns(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                      > 1800000000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM flagged GROUP BY user_id
"""


@register("sessionization", oracle=SESSION_ORACLE, tags=("relational",))
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + flag + sum — the batch analog of
    session_window (streaming variant in sqlmesh_spark.streaming).
    Gap math runs on exact epoch-nanos."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    prev = F.lag("ts_ns").over(w)
    is_new = F.when(prev.isNull() | ((F.col("ts_ns") - prev) > 1_800_000_000_000), 1).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


UNION_ORACLE = """
SELECT kind, key_id FROM (
  SELECT 'customer' AS kind, c_custkey AS key_id FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT 'supplier' AS kind, s_suppkey AS key_id FROM supplier WHERE s_acctbal > 9000
) u
UNION
SELECT 'supplier' AS kind, s_suppkey AS key_id FROM supplier WHERE s_acctbal > 9500
"""


@register("union_all_distinct", oracle=UNION_ORACLE, tags=("relational",))
def union_all_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + UNION DISTINCT (reference base.py:2037-2044)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.lit("customer").alias("kind"), F.col("c_custkey").alias("key_id"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("key_id"))
    )
    s2 = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("key_id"))
    )
    return c.unionByName(s).unionByName(s2).distinct()


ANTI_SEMI_ORACLE = """
SELECT 'no_orders' AS segment,
       (SELECT COUNT(*) FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n
UNION ALL
SELECT 'with_orders' AS segment,
       (SELECT COUNT(*) FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n
"""


@register("semi_anti_join", oracle=ANTI_SEMI_ORACLE, tags=("relational",))
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS via left_semi / left_anti joins. Scalar aggs so
    an empty branch still yields its zero row."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    without = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("no_orders").alias("segment"), "n")
    )
    with_ = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("segment"), "n")
    )
    return without.unionByName(with_)


ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
       {_sql_money_sum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_agg", oracle=ROLLUP_ORACLE, tags=("relational",))
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).alias("gid"),
            _money_sum("l_quantity", "sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty")
    )


TIME_RANGE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-02-01 00:00:00'
"""


@register("time_range_filter", oracle=TIME_RANGE_ORACLE, tags=("relational",))
def time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open interval predicate [start, end) — the exact WHERE every
    incremental-by-time materialization injects (reference base.py:1609,
    utils/date.py:224-270). On a time-partitioned table this predicate is
    what partition pruning keys off."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-02-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


FULL_JOIN_ORACLE = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       c.n_customers, s.n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
ON c.c_nationkey = s.s_nationkey
"""


@register("full_outer_join", oracle=FULL_JOIN_ORACLE, tags=("relational",))
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native FULL OUTER JOIN — the reference emulates it as LEFT ∪ RIGHT
    for engines lacking it (base.py:2093-2148); Spark has it natively."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return joined.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=Q4_ORACLE, tags=("relational",))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left_semi join with an extra non-equi predicate."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-07-01") & (F.col("o_orderdate") < "1995-10-01")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("q12_shipmode_priority", oracle=Q12_ORACLE, tags=("relational",))
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation over a fact-fact join (Q12 shape)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


Q14_ORACLE = f"""
SELECT ROUND(
  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
               THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               ELSE 0 END) AS DOUBLE)
  / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE), 6
) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
"""


@register("q14_promo_effect", oracle=Q14_ORACLE, tags=("relational",))
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ratio aggregate (Q14 shape) with exact-cents accumulation."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type").like("PROMO%"), cents).otherwise(F.lit(0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(cents).cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


Q18_ORACLE = """
SELECT c_custkey, o_orderkey,
       CAST(ROUND(ANY_VALUE(o_totalprice) * 100) AS BIGINT) AS total_cents,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 20000
)
GROUP BY c_custkey, o_orderkey
"""


@register("q18_large_volume_customer", oracle=Q18_ORACLE, tags=("relational",))
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over a grouped HAVING (Q18 shape) → semi join on the
    pre-aggregated key set."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("qcents"))
        .filter(F.col("qcents") > 20000)
        .select("l_orderkey")
    )
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", F.col("o_orderkey"))
        .agg(
            F.round(F.any_value("o_totalprice") * 100).cast("bigint").alias("total_cents"),
            (F.round(F.sum(_cents("l_quantity"))).cast("double") / 100).alias("sum_qty"),
        )
    )


JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


@register("json_extraction", oracle=JSON_ORACLE, tags=("relational",))
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: get_json_object over the events.props JSON
    column (Spark) vs json_extract_string (DuckDB)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint"))
            .cast("bigint")
            .alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


PCTL_ORACLE = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders GROUP BY o_orderstatus
"""


@register("exact_percentiles", oracle=PCTL_ORACLE, tags=("relational",))
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles: Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition, so the
    doubles agree (approx_percentile would not — sketch-based)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
    )


SKETCH_ORACLE = """
SELECT 'o_custkey' AS col, COUNT(DISTINCT o_custkey) AS exact_distinct, TRUE AS within_5pct
FROM orders
UNION ALL
SELECT 'o_orderkey' AS col, COUNT(DISTINCT o_orderkey) AS exact_distinct, TRUE AS within_5pct
FROM orders
"""


@register("approx_distinct_sketch", oracle=SKETCH_ORACLE, tags=("relational",))
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality sketch vs exact distinct. Sketch values
    differ across engines, so the oracled claim is the useful one: the
    estimate lands within the configured 5% error bound (Spark's HLL++ is
    deterministic for fixed input, making the boolean reproducible). At
    100 TB the sketch is the only affordable distinct — one scan, no
    shuffle of distinct values, mergeable partial state."""
    o = load_table(spark, sf_dir, "orders")

    def one(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            F.countDistinct(col).alias("exact_distinct"),
            F.approx_count_distinct(col, rsd=0.02).alias("approx"),
        ).select(
            "col",
            "exact_distinct",
            (
                F.abs(F.col("approx") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("within_5pct"),
        )

    return one("o_custkey").unionByName(one("o_orderkey"))


TUMBLING_ORACLE = """
SELECT strftime(to_timestamp(epoch(ts) - epoch(ts) % 21600), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
"""


@register("window_tumbling_batch", oracle=TUMBLING_ORACLE, tags=("relational",))
def window_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windows via F.window in BATCH mode — the same
    operator Structured Streaming uses, so batch backfill and streaming
    serve identical window frames (reference has only cron intervals;
    SURVEY §2.G). Oracle = epoch-floor arithmetic."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "value_cents",
        )
    )


CASCADE_ORACLE = """
SELECT strftime(to_timestamp(epoch(ts) - epoch(ts) % 86400), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
"""


@register("rollup_cascade", oracle=CASCADE_ORACLE, tags=("relational",))
def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade: raw → hourly → daily, with the daily
    level computed FROM THE HOURLY ROLLUP (sum-of-sums / sum-of-counts),
    not from raw. The oracle aggregates raw directly, so the hash match
    proves the re-aggregation algebra — the property that lets a 100 TB
    pipeline serve day queries from |hours| rows instead of |events|, and
    lets incremental models maintain each level from the one below."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("value")).alias("value_cents"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "value_cents")
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour_start"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
       {_sql_money_sum("l_quantity", "sum_qty")},
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_agg", oracle=CUBE_ORACLE, tags=("relational",))
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions with GROUPING disambiguation of the NULL
    super-aggregate rows (the construct the reference leaves to engine SQL
    — SURVEY §2.B). Spark plans CUBE as one Expand + single exchange:
    4 grouping sets cost one shuffle of 4× the map output, with partial
    aggregation before it — no per-set re-scan at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).alias("gid"),
            _money_sum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(epoch_ns(ts)) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t2
  GROUP BY e.user_id
)
SELECT 1 AS step, 'view' AS event_type, (SELECT COUNT(*) FROM v) AS n_users
UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
"""


@register("funnel_steps", oracle=FUNNEL_ORACLE, tags=("relational", "events"))
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click after it → purchase after that):
    each stage is a min-timestamp aggregate semi-joined to the previous
    stage, on exact nanosecond epochs (ts_ns) so strict inequalities match
    a nanosecond-precision engine bit-for-bit.

    Scale: every stage shuffles on user_id and strictly shrinks (stage N
    input = matched users only), so cost is dominated by the first scan;
    no per-user event buffering, no window over the full event stream.
    """
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_ns") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_ns") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t3"))
    )
    rows = []
    for step, name, df in ((1, "view", v), (2, "click", c), (3, "purchase", p)):
        rows.append(
            df.agg(
                F.lit(step).alias("step"),
                F.lit(name).alias("event_type"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_date FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_date,
         date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT strftime(cohort_date, '%Y-%m-%d') AS cohort_ds, day_offset,
       COUNT(*) AS n_users
FROM activity
GROUP BY cohort_date, day_offset
"""


@register("cohort_retention", oracle=COHORT_ORACLE, tags=("relational", "events"))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen date, counted
    once per (cohort, day-offset) they were active — the standard
    product-analytics triangle.

    Scale: two shuffles on user_id (first-seen agg + the distinct), then a
    small matrix aggregate; the cohort date join is a self-join on the
    aggregation key so AQE plans it as a co-partitioned join without a
    third exchange.
    """
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_date"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_date")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_ds"), "day_offset"
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


WINDOW_SUITE_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
       LAG(l_linenumber) OVER w AS prev_line,
       LEAD(l_linenumber) OVER w AS next_line,
       NTILE(3) OVER w AS tercile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       FIRST_VALUE(l_linenumber) OVER w AS first_line,
       LAST_VALUE(l_linenumber) OVER (PARTITION BY l_orderkey
         ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT), l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_line
FROM lineitem
WHERE l_orderkey <= 500
WINDOW w AS (PARTITION BY l_orderkey
             ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT), l_linenumber)
"""


@register("window_functions_suite", oracle=WINDOW_SUITE_ORACLE, tags=("relational",))
def window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/navigation window-function surface (lag, lead,
    ntile, percent_rank, cume_dist, first/last_value with an explicit
    unbounded frame) over one totally-ordered per-order window — ordering
    keys are exact cents + line number so both engines sort identically.

    Scale: all nine functions share ONE window spec → one shuffle on
    l_orderkey and one sort per partition; Spark evaluates them in a
    single Window operator pass."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    price = _cents("l_extendedprice")
    w = W.partitionBy("l_orderkey").orderBy(price, "l_linenumber")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        price.alias("price_cents"),
        F.lag("l_linenumber").over(w).alias("prev_line"),
        F.lead("l_linenumber").over(w).alias("next_line"),
        F.ntile(3).over(w).alias("tercile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("l_linenumber").over(w).alias("first_line"),
        F.last("l_linenumber").over(w_full).alias("last_line"),
    )


UNPIVOT_ORACLE = """
SELECT p_partkey, 'retail' AS measure,
       CAST(ROUND(p_retailprice * 100) AS BIGINT) AS value_cents
FROM part WHERE p_size >= 40
UNION ALL
SELECT p_partkey, 'size_x100', CAST(p_size AS BIGINT) * 100
FROM part WHERE p_size >= 40
"""


@register("unpivot_stack", oracle=UNPIVOT_ORACLE, tags=("relational",))
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via STACK (the inverse of @PIVOT; reference
    delegates both to engine SQL). STACK is a generator projection — rows
    multiply inside the scan stage with no shuffle and no UNION re-scan,
    which is the difference between 1× and M× input reads at 100 TB."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'retail', CAST(ROUND(p_retailprice * 100) AS BIGINT),"
            " 'size_x100', CAST(p_size AS BIGINT) * 100) AS (measure, value_cents)"
        ),
    )


GROUPING_SETS_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
       {_sql_money_sum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("grouping_sets_agg", oracle=GROUPING_SETS_ORACLE, tags=("relational",))
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind ROLLUP/CUBE) with a
    set list neither ROLLUP nor CUBE produces: per-flag, per-status, and
    grand total — one Expand + one exchange, never three scans."""
    l = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty
FROM {{lineitem}}
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""".format(lineitem=_as_view(l, "gs_lineitem"))
    )


def _as_view(df: DataFrame, name: str) -> str:
    df.createOrReplaceTempView(name)
    return name


INTERSECT_EXCEPT_ORACLE = """
SELECT c_custkey AS custkey, 'both' AS src FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
) a
UNION ALL
SELECT c_custkey, 'building_only' FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey FROM orders
) b
"""


@register("intersect_except", oracle=INTERSECT_EXCEPT_ORACLE, tags=("relational",))
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (ANSI bag-to-set semantics both
    engines share). Spark plans both as aggregated semi/anti joins —
    one shuffle each on the compared column, no row-by-row comparison."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    any_order = o.select(F.col("o_custkey").alias("custkey"))
    both = building.intersect(urgent).withColumn("src", F.lit("both"))
    only = building.exceptAll(any_order).distinct().withColumn("src", F.lit("building_only"))
    return both.unionByName(only)


FUNC_GAUNTLET_ORACLE = """
SELECT o_orderkey,
       UPPER(o_orderpriority) AS up,
       LOWER(o_orderstatus) AS lo,
       SUBSTRING(o_orderpriority, 1, 3) AS sub3,
       LPAD(CAST(o_orderkey AS VARCHAR), 8, '0') AS padded,
       REPLACE(o_orderpriority, '-', '_') AS replaced,
       LENGTH(o_orderpriority) AS len,
       CONCAT(o_orderstatus, ':', o_orderpriority) AS joined,
       TRIM('  ' || o_orderstatus || ' ') AS trimmed,
       strftime(o_orderdate, '%Y-%m-%d') AS ds,
       CAST(YEAR(o_orderdate) AS INT) AS y,
       CAST(MONTH(o_orderdate) AS INT) AS m,
       CAST(DAYOFMONTH(o_orderdate) AS INT) AS d,
       strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS plus7,
       strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS coalesced,
       CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS size_class,
       CAST(ROUND(o_totalprice, 0) AS BIGINT) AS rounded,
       CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS floor_k,
       ABS(CAST(o_orderkey AS BIGINT) - 1000) AS abs_diff
FROM orders
WHERE o_orderkey <= 2000
"""


@register("functions_gauntlet", oracle=FUNC_GAUNTLET_ORACLE, tags=("relational", "functions"))
def functions_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function parity gauntlet — 21 string/date/numeric/conditional
    builtins in one projection, value-matched against DuckDB. This is the
    everyday surface model SQL leans on (SURVEY §2.B: arbitrary SELECTs
    delegated to the engine); all stay inside whole-stage codegen."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("up"),
        F.lower("o_orderstatus").alias("lo"),
        F.substring("o_orderpriority", 1, 3).alias("sub3"),
        F.lpad(F.col("o_orderkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("replaced"),
        F.length("o_orderpriority").alias("len"),
        F.concat(F.col("o_orderstatus"), F.lit(":"), F.col("o_orderpriority")).alias("joined"),
        F.trim(F.concat(F.lit("  "), F.col("o_orderstatus"), F.lit(" "))).alias("trimmed"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ds"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS"), "yyyy-MM-dd").alias("plus7"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("coalesced"),
        F.when(F.col("o_totalprice") > 100000, "big").otherwise("small").alias("size_class"),
        F.round("o_totalprice", 0).cast("bigint").alias("rounded"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("floor_k"),
        F.abs(F.col("o_orderkey").cast("bigint") - 1000).alias("abs_diff"),
    )


ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS ds, COUNT(*) AS n
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
),
moments AS (
  SELECT event_type,
         COUNT(*) AS k,
         SUM(n) AS s1,
         SUM(n * n) AS s2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.ds, d.n,
       ROUND((d.n * m.k - m.s1) /
             SQRT(GREATEST(CAST(m.k AS DOUBLE) * m.s2 - CAST(m.s1 AS DOUBLE) * m.s1, 1)), 4) AS z_num
FROM daily d JOIN moments m ON d.event_type = m.event_type
WHERE ABS((d.n * m.k - m.s1) /
          SQRT(GREATEST(CAST(m.k AS DOUBLE) * m.s2 - CAST(m.s1 AS DOUBLE) * m.s1, 1))) > 1.8
"""


@register("events_daily_anomalies", oracle=ANOMALY_ORACLE, tags=("relational", "events"))
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: per event type, days whose count deviates
    from the type's distribution. The z-statistic is built from EXACT
    integer moments (k, Σn, Σn² as int64) so the only floating-point ops
    are one subtraction, one sqrt, one divide — identical IEEE in any
    engine and order-insensitive under AQE, unlike a naive stddev of
    doubles whose result depends on summation order.

    Scale: daily counts shuffle once; per-type moments are a tiny second
    aggregate broadcast back onto the daily relation — the monitoring
    query pattern for a 100 TB event stream."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("ds")
    ).agg(F.count(F.lit(1)).alias("n"))
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    j = daily.join(F.broadcast(moments), "event_type")
    denom = F.sqrt(
        F.greatest(
            F.col("k").cast("double") * F.col("s2")
            - F.col("s1").cast("double") * F.col("s1"),
            F.lit(1.0),
        )
    )
    z_num = (F.col("n") * F.col("k") - F.col("s1")) / denom
    return (
        j.filter(F.abs(z_num) > 1.8)
        .select("event_type", "ds", "n", F.round(z_num, 4).alias("z_num"))
    )


HOPPING_ORACLE = """
SELECT strftime(to_timestamp(start_epoch), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM (
  SELECT value,
         (epoch(ts) - epoch(ts) % 10800) - CAST(h AS BIGINT) * 10800 AS start_epoch
  FROM events, unnest(generate_series(0, 3)) AS _h(h)
  WHERE (epoch(ts) - epoch(ts) % 10800) - CAST(h AS BIGINT) * 10800 + 43200 > epoch(ts)
) w
GROUP BY start_epoch
"""


@register("window_hopping_batch", oracle=HOPPING_ORACLE, tags=("relational",))
def window_hopping_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows — 12-hour frames every 3 hours — via
    F.window's slide parameter in BATCH mode, identical frames to the
    streaming operator. Each event lands in windowLen/slide = 4 frames;
    Spark plans this as an Expand (×4 map-side rows) + ONE exchange —
    never four passes over the input. Oracle = explicit hop arithmetic."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "12 hours", "3 hours"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "value_cents",
        )
    )


SESSION_WINDOW_ORACLE = """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
islands AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM ordered
)
SELECT user_id,
       strftime(make_timestamp(MIN(us)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       COUNT(*) AS n_events
FROM islands GROUP BY user_id, sid
"""


@register("window_session_batch", oracle=SESSION_WINDOW_ORACLE, tags=("relational",))
def window_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN session_window operator (gap-merged sessions, 30-min
    timeout) in batch mode — same frames the streaming variant emits, and
    value-identical to the manual lag+cumsum islands formulation the
    `sessionization` case uses (the oracle here IS that formulation on
    microsecond epochs, >= gap starts a new session per Spark semantics).

    Scale: one shuffle on user_id + per-partition sort; session merging is
    streaming-capable state logic, never a self-join."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


PCTL_SKETCH_ORACLE = """
WITH vals AS (
  SELECT o_orderstatus AS status, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
ranked AS (
  SELECT status, cents,
         ROW_NUMBER() OVER (PARTITION BY status ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY status) AS n
  FROM vals
),
qs AS (SELECT unnest([50, 90, 99]) AS q_pct)
SELECT r.status, q.q_pct, r.cents AS exact_cents, 1 AS within_tol
FROM ranked r JOIN qs q ON r.rn = (q.q_pct * r.n + 99) // 100
"""

PCTL_SKETCH_SPARK = """
WITH vals AS (
  SELECT o_orderstatus AS status, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
ranked AS (
  SELECT status, cents,
         ROW_NUMBER() OVER (PARTITION BY status ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY status) AS n
  FROM vals
),
qs AS (SELECT explode(array(50, 90, 99)) AS q_pct),
exact AS (
  SELECT r.status, q.q_pct, r.cents AS exact_cents, r.n,
         (q.q_pct * r.n + 99) DIV 100 AS k
  FROM ranked r JOIN qs q ON r.rn = (q.q_pct * r.n + 99) DIV 100
),
sk AS (
  SELECT status, percentile_approx(cents, array(0.5, 0.9, 0.99), 10000) AS ests
  FROM vals GROUP BY status
),
estx AS (
  SELECT status, CASE pos WHEN 0 THEN 50 WHEN 1 THEN 90 ELSE 99 END AS q_pct, est
  FROM sk LATERAL VIEW posexplode(ests) AS pos, est
),
rk AS (
  SELECT e.status, e.q_pct,
         COUNT(CASE WHEN v.cents < e.est THEN 1 END) + 1 AS rank_lo,
         COUNT(CASE WHEN v.cents <= e.est THEN 1 END) AS rank_hi
  FROM estx e JOIN vals v ON v.status = e.status
  GROUP BY e.status, e.q_pct
)
SELECT x.status, x.q_pct, x.exact_cents,
       CASE WHEN x.k + (x.n DIV 1000) + 1 >= r.rank_lo
             AND x.k - (x.n DIV 1000) - 1 <= r.rank_hi THEN 1 ELSE 0 END AS within_tol
FROM exact x JOIN rk r ON x.status = r.status AND x.q_pct = r.q_pct
"""


@register("sketch_percentile_disc", oracle=PCTL_SKETCH_ORACLE, tags=("relational", "sketch"))
def sketch_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch with a scale-proof contract: the EXACT discrete
    quantile (value at rank ceil(q·n/100), integer arithmetic — identical
    in any engine) is the oracle-hashed payload, and the GK sketch
    (percentile_approx, accuracy 1e4) must land within a 0.1% RANK window
    of it (10× the sketch's ε·n guarantee) — asserted via an oracle-hashed
    flag. An earlier formulation compared sketch values exactly; that
    holds only while accuracy ≥ |group| and broke at sf0.1 — rank
    tolerance is the contract that survives any scale factor.

    Scale (100 TB): the sketch side is the production path — fixed-size
    mergeable summaries, map-side partials, never a global sort. The
    rank-window referee (window + count join) exists for verification
    only; at scale you'd sample it or drop it entirely."""
    from sqlmesh_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(PCTL_SKETCH_SPARK)


UNION_EVOLVED_ORACLE = """
SELECT * FROM (
  SELECT n_nationkey AS id, n_name AS name, NULL::BIGINT AS region FROM nation
  UNION ALL BY NAME
  SELECT r_regionkey AS id, r_name AS name, r_regionkey AS region FROM region
) t
"""


@register("union_evolved_schemas", oracle=UNION_EVOLVED_ORACLE, tags=("relational",))
def union_evolved_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across evolved schemas: unionByName(allowMissingColumns=True)
    aligns by column NAME and NULL-fills absences — the engine primitive
    under @UNION's aligned-schema semantics (macros.py:1029) and the
    safe way to union a table's pre- and post-migration generations.
    Oracle: DuckDB's UNION ALL BY NAME."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    )
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("id"),
        F.col("r_name").alias("name"),
        F.col("r_regionkey").cast("bigint").alias("region"),
    )
    return n.unionByName(r, allowMissingColumns=True)


GAP_FILL_ORACLE = """
WITH obs AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         MAX(CAST(ROUND(value * 100) AS BIGINT)) AS max_cents
  FROM events WHERE event_id % 97 = 0
  GROUP BY event_type, CAST(ts AS DATE)
),
bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM obs),
days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds
),
spine AS (
  SELECT t.event_type, days.d
  FROM (SELECT DISTINCT event_type FROM obs) t CROSS JOIN days
),
joined AS (
  SELECT s.event_type, s.d, o.max_cents
  FROM spine s LEFT JOIN obs o ON o.event_type = s.event_type AND o.d = s.d
),
filled AS (
  SELECT event_type, d, max_cents,
         CASE WHEN max_cents IS NOT NULL THEN 1 ELSE 0 END AS is_observed,
         LAST_VALUE(max_cents IGNORE NULLS) OVER w AS filled_cents,
         LAST_VALUE(CASE WHEN max_cents IS NOT NULL THEN d END IGNORE NULLS)
           OVER w AS last_obs_d
  FROM joined
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, is_observed, filled_cents,
       CAST(date_diff('day', last_obs_d, d) AS BIGINT) AS gap_age
FROM filled
"""


@register("timeseries_gap_fill", oracle=GAP_FILL_ORACLE, tags=("relational",))
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: project a sparse per-(series, day) metric onto
    a dense generated date spine, then forward-fill missing days with the
    last observation (LAST IGNORE NULLS) and report each row's staleness
    (days since last observation). The standard resample→ffill primitive
    for sensor/metric tables; pairs with the @DATE_SPINE macro
    (reference macros.py:1298) which generates the calendar side.

    Scale (100 TB): the spine is |series|×|days| — tiny relative to the
    events it summarizes — and builds from one explode of a generated
    sequence; the fill is ONE window shuffle keyed on the series (state
    per series is O(1): last seen value/date). Observation sparsity is
    deterministic (event_id % 97) so the oracle sees identical gaps."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    # obs feeds THREE consumers (bounds, distinct series, join probe); it is
    # |series|×|observed days| — tiny — so cache it rather than re-running
    # the events scan+aggregate per consumer (3 scans → 1 at any scale).
    obs = (
        e.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.max(_cents("value")).alias("max_cents"))
        .cache()
    )
    bounds = obs.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    days = bounds.select(F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"))
    spine = obs.select("event_type").distinct().crossJoin(F.broadcast(days))
    joined = spine.join(obs, ["event_type", "d"], "left")
    w = W.partitionBy("event_type").orderBy("d")
    filled = joined.select(
        "event_type",
        "d",
        F.when(F.col("max_cents").isNotNull(), 1).otherwise(0).alias("is_observed"),
        F.last("max_cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.last(
            F.when(F.col("max_cents").isNotNull(), F.col("d")), ignorenulls=True
        ).over(w).alias("last_obs_d"),
    )
    return filled.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "is_observed",
        "filled_cents",
        F.datediff("d", "last_obs_d").cast("bigint").alias("gap_age"),
    )


ROLLING_RANGE_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_num,
         strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS day_cents,
         COUNT(*) AS n_events
  FROM events
  GROUP BY 1, 2, 3
)
SELECT event_type, day,
       CAST(SUM(day_cents) OVER w AS DOUBLE) / 100 AS rolling_7d_sum,
       CAST(SUM(n_events) OVER w AS BIGINT) AS rolling_7d_events
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("rolling_range_window", oracle=ROLLING_RANGE_ORACLE, tags=("relational", "bench"))
def rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day aggregate via a RANGE frame keyed on an integer day
    number — a VALUE-based frame (missing days still count toward the
    window span), unlike ROWS frames which slide over present rows only.
    The trailing-window primitive behind `lookback` semantics
    (reference model/kind.py:423) expressed as a window, not a self-join.

    Scale (100 TB): events pre-aggregate to one row per (series, day)
    map-side BEFORE the window, so the window shuffle carries |series|×|days|
    rows, not raw events; the range frame then streams with O(window) state.
    Integer-cents day sums keep every rolling total exact and
    order-insensitive."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_num"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(_cents("value")).alias("day_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = W.partitionBy("event_type").orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "event_type",
        "day",
        (F.sum("day_cents").over(w).cast("double") / 100).alias("rolling_7d_sum"),
        F.sum("n_events").over(w).cast("bigint").alias("rolling_7d_events"),
    )


def _recursive_hierarchy_sql(dialect: str) -> str:
    cast = "VARCHAR" if dialect == "duckdb" else "STRING"
    return f"""
WITH RECURSIVE edges AS (
  SELECT n_nationkey AS node,
         CASE WHEN n_nationkey >= 5 THEN n_nationkey - 5 END AS parent
  FROM nation
),
walk AS (
  SELECT node, node AS root, 0 AS depth, CAST(node AS {cast}) AS path
  FROM edges WHERE parent IS NULL
  UNION ALL
  SELECT e.node, w.root, w.depth + 1,
         w.path || '>' || CAST(e.node AS {cast})
  FROM edges e JOIN walk w ON e.parent = w.node
)
SELECT node, root, depth, path FROM walk
"""


@register(
    "recursive_cte_hierarchy",
    oracle=_recursive_hierarchy_sql("duckdb"),
    tags=("relational",),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE transitive closure over a derived parent hierarchy:
    each node's root ancestor, depth, and full path. Model SQL in the
    reference is arbitrary dialect SQL transpiled to the engine
    (renderer.py:517); recursive CTEs are the construct that historically
    did NOT transpile to Spark — native since Spark 4.0, so the engine now
    covers the hierarchy/bill-of-materials query class directly.

    Scale: each iteration is one self-join of the frontier against the
    edge table — Catalyst plans every step (broadcast here; shuffle-hash
    on bigger frontiers) and iteration count is the hierarchy DEPTH, not
    row count. Driver-side loops (the pre-4.0 workaround, see
    llm/cluster.py's bounded-doubling variant) are no longer needed for
    plain hierarchies."""
    from sqlmesh_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("nation",))
    return spark.sql(_recursive_hierarchy_sql("spark"))


HLL_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       1 AS within_tol
FROM events GROUP BY event_type
"""


@register("sketch_hll_distinct", oracle=HLL_ORACLE, tags=("relational", "sketch"))
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch vs exact: emits the exact
    per-group distinct AND a flag asserting the HLL estimate
    (approx_count_distinct, rsd=2%) lands within ±5% of it. The flag is
    value-hashed by the oracle, so estimator drift outside tolerance fails
    the gate — an approximation operator with a hard correctness contract.

    Scale: this is THE 100 TB cardinality pattern — HLL sketches are
    fixed-size (~1.5 KB at 2% rsd), merge associatively in partial aggs,
    and never hold the distinct set; exact COUNT(DISTINCT) by contrast
    shuffles every distinct (group, user) pair. The exact side here exists
    only to referee the estimate."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("est_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        F.when(
            (F.abs(F.col("est_users") - F.col("exact_users")) * 100)
            <= (F.col("exact_users") * 5),
            1,
        )
        .otherwise(0)
        .alias("within_tol"),
    )


FUZZY_MATCH_ORACLE = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


@register("fuzzy_match_levenshtein", oracle=FUZZY_MATCH_ORACLE, tags=("relational",))
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching: candidate pairs inside a blocking key
    (nation) scored by Levenshtein edit distance, keeping near-identical
    names — the record-linkage primitive behind entity resolution and
    near-dup title matching. Distance is an exact integer in both engines,
    so the oracle is value-level.

    Scale (100 TB): NEVER the raw cross join — the blocking key bounds the
    pair space to Σ|block|², which is the knob (tighter blocks, e.g.
    name-prefix + nation, shrink it quadratically). One shuffle on the
    blocking key co-locates each block; the quadratic scoring then runs
    partition-local with no further exchange. Skewed blocks split via the
    salted pattern in operators/skew.py."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_name")
    a = c.alias("a")
    b = c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    )
    return (
        pairs.withColumn("edit_dist", F.levenshtein(F.col("a.c_name"), F.col("b.c_name")))
        .filter(F.col("edit_dist") <= 2)
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            "edit_dist",
        )
    )


def _bit_ops_sql(dialect: str) -> str:
    d = dialect
    xor = "xor(n_nationkey, 21)" if d == "duckdb" else "n_nationkey ^ 21"
    shl = "CAST(n_nationkey AS BIGINT) << 3" if d == "duckdb" else "shiftleft(n_nationkey, 3)"
    shr = "CAST(n_nationkey AS BIGINT) >> 1" if d == "duckdb" else "shiftright(n_nationkey, 1)"
    b64 = "to_base64(n_name::BLOB)" if d == "duckdb" else "base64(CAST(n_name AS BINARY))"
    bcnt = "bit_count(CAST(n_nationkey AS BIGINT))"
    return f"""
WITH rows_out AS (
  SELECT n_regionkey, n_nationkey,
         CAST(n_nationkey & 12 AS BIGINT) AS band,
         CAST(n_nationkey | 5 AS BIGINT) AS bor,
         CAST({xor} AS BIGINT) AS bxor,
         CAST({shl} AS BIGINT) AS shl3,
         CAST({shr} AS BIGINT) AS shr1,
         CAST({bcnt} AS INT) AS popcount,
         hex(CAST(n_nationkey AS BIGINT)) AS hexed,
         {b64} AS name_b64
  FROM nation
),
aggs AS (
  SELECT n_regionkey,
         CAST(bit_and(n_nationkey) AS BIGINT) AS agg_and,
         CAST(bit_or(n_nationkey) AS BIGINT) AS agg_or,
         CAST(bit_xor(n_nationkey) AS BIGINT) AS agg_xor
  FROM nation GROUP BY n_regionkey
)
SELECT r.n_regionkey, r.n_nationkey, r.band, r.bor, r.bxor, r.shl3, r.shr1,
       r.popcount, r.hexed, r.name_b64, a.agg_and, a.agg_or, a.agg_xor
FROM rows_out r JOIN aggs a ON r.n_regionkey = a.n_regionkey
"""


@register("scalar_bit_ops", oracle=_bit_ops_sql("duckdb"), tags=("relational", "scalar"))
def scalar_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation parity gauntlet: AND/OR/XOR, shifts, popcount, hex,
    base64, plus the bitwise AGGREGATES (bit_and/bit_or/bit_xor) per
    group — the integer-domain scalar surface (flag packing, bitmap
    encodings, hash mixing) complementing the string/date/numeric
    gauntlet. All results are exact integers/strings in both engines.

    Scale: pure codegen projections plus one tiny grouped aggregate —
    bitwise aggs combine associatively map-side like any algebraic agg."""
    from sqlmesh_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("nation",))
    return spark.sql(_bit_ops_sql("spark"))


MAP_OPS_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_types,
       MAX(CASE WHEN event_type = 'click' THEN n END) AS clicks,
       MAX(CASE WHEN event_type = 'click' THEN n * 2 END) AS clicks_doubled,
       COALESCE(string_agg(CASE WHEN n >= 3 THEN event_type || '=' || n END,
                           ',' ORDER BY event_type), '') AS big_types
FROM c GROUP BY user_id
"""


@register("map_type_ops", oracle=MAP_OPS_ORACLE, tags=("relational",))
def map_type_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType operator surface: per-user event-type count maps built with
    map_from_entries, probed with element_at, rewritten with
    transform_values, pruned with map_filter, and serialized via
    map_entries — §1.2's MAP type exercised end-to-end, value-oracled by a
    map-free SQL equivalent (the serialization is key-sorted, so the map's
    content is hash-comparable across engines).

    Scale: the map is per-key state bounded by |event types| (tiny); all
    map functions are codegen-side projections after one grouped count.
    Maps replace wide pivoted schemas when the key set is open-ended —
    the layout that survives schema evolution at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    big = F.expr("map_filter(m, (k, v) -> v >= 3)")
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.element_at("m", F.lit("click")).alias("clicks"),
        F.element_at(
            F.expr("transform_values(m, (k, v) -> v * 2)"), F.lit("click")
        ).alias("clicks_doubled"),
        F.array_join(
            F.expr(
                "transform(map_entries(map_filter(m, (k, v) -> v >= 3)),"
                " e -> concat(e.key, '=', CAST(e.value AS STRING)))"
            ),
            ",",
        ).alias("big_types"),
    )


DECIMAL_AGG_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE)
         AS sum_disc_price,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


@register("decimal_exact_agg", oracle=DECIMAL_AGG_SQL, tags=("relational", "scalar"))
def decimal_exact_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType arithmetic end-to-end (§1.2 type mapping,
    spark.py:101): money doubles cast to DECIMAL(15,2), multiplied and
    summed in exact fixed-point (scale grows through the product — no
    rounding anywhere), cast to DOUBLE only at the boundary. The same SQL
    runs on both engines; sums are exact integers-in-decimal so the result
    is order-insensitive under AQE/partial-agg reordering — the
    DecimalType counterpart of the integer-cents discipline used
    elsewhere (operators/relational.py:_cents).

    Scale: decimal aggregation is algebraic (partial sums merge
    associatively); Spark keeps Decimal(38,s) in unsafe-row format inside
    codegen — slower than BIGINT cents but exact with zero app-level
    bookkeeping."""
    from sqlmesh_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(DECIMAL_AGG_SQL)
