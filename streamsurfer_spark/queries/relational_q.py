"""Relational core queries (SURVEY.md §2.3 B, Q-R1..Q-R19).

The reference library has no relational surface at all (SURVEY §2.2 —
/root/reference/main.go:1-312 contains no joins/aggregates/windows), so this
module is pure engine-side capability, built exclusively on Catalyst
primitives: parquet scans with pushdown, broadcast/sort-merge joins chosen by
AQE, hash aggregates with map-side partial aggregation, window functions,
set ops, and the scalar function packs.

Scale notes (100 TB):
- Dimension joins (region/nation/customer vs orders/lineitem) are broadcast
  candidates; we hint `broadcast()` for the tiny dims so the plan never
  shuffles the fact table for them.
- Aggregations group on low-cardinality keys → partial aggregation collapses
  almost everything map-side; no skew concern.
- Window queries partition by customer key — high cardinality, well spread.
- Everything is expressible without collect(); no driver-side loops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from streamsurfer_spark.functions.rounding import scaled_round

from streamsurfer_spark.queries import QuerySpec
from streamsurfer_spark.session import load_tables, table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


SCALE6 = 1_000_000


def _i6(col) -> "F.Column":
    """Money/measure values enter big sums as ×1e6 scaled int64.

    Double summation order drifts in the last ulp once groups reach ~1e5
    rows (0.01 flakes after round); integer addition is exact and
    associative, so aggregates are identical under any partitioning and on
    the oracle engine. Scaled-long sums run on the fast codegen path —
    decimal(28,6) sums were 3x slower (BigDecimal buffers). Headroom:
    values ≤1e6 × scale 1e6 × 1e6 rows/group ≈ 1e18 < int64 max; beyond
    that split the sum or drop to decimal.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * SCALE6).cast("bigint")


def _sum6(col, nd: int = 2) -> "F.Column":
    """Tie-proof sum read-back: scaled_round(sum(scaled)/1e6, nd).

    For product args (extendedprice*(1-discount): a 4-dp grid), the micro
    sum can land exactly on an nd-dp midpoint, which is the proven
    ROUND tie class — hence the integer-scale round (r7 conversion,
    twins via _duck_sum6 / the literal twin strings in lockstep).
    """
    return scaled_round(F.sum(_i6(col)) / SCALE6, nd)


def _duck_sum6(expr: str, nd: int = 2) -> str:
    scale = 10**nd
    return (
        f"(CAST(round((sum(CAST(round(({expr}) * 1000000) AS BIGINT)) / 1000000.0)"
        f" * {scale}) AS BIGINT) / {scale}.0)"
    )


# --- Q-R1: parquet scan + full-table checksum ------------------------------

def qr01_scan_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.sum("l_orderkey").alias("sum_okey"),
        F.sum("l_linenumber").alias("sum_lineno"),
        _sum6("l_quantity").alias("sum_qty"),
    )


QR01_SQL = """
SELECT count(*) AS n_rows,
       CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
       CAST(sum(l_linenumber) AS BIGINT) AS sum_lineno,
       CAST(round((sum(CAST(round((l_quantity) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS sum_qty
FROM lineitem
"""


# --- Q-R2: projection + filter + agg (TPC-H Q6 shape) -----------------------

def qr02_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Predicates are plain column comparisons → Catalyst pushes them into the
    # parquet scan (PushedFilters) and prunes to 4 columns (ReadSchema).
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _sum6(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


QR02_SQL = """
SELECT CAST(round((sum(CAST(round((l_extendedprice * l_discount) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --- Q-R3: inner equi-join ---------------------------------------------------

def qr03_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    # customer is ~1% the size of lineitem-side tables; broadcast it so the
    # orders scan never shuffles. At 100 TB, customer at full SF still fits
    # executor memory comfortably (TPC-H customer ≈ 1.5 GB at SF1000).
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            _sum6("o_totalprice").alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


QR03_SQL = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(round((sum(CAST(round((o_totalprice) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- Q-R4: multi-way join (TPC-H Q5 shape) ----------------------------------

def qr04_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    # Star-join: broadcast the whole dimension chain (region⋈nation⋈customer)
    # so the only shuffle is the final aggregation on n_name (25 keys →
    # collapses map-side). orders⋈lineitem is the one big join; at scale both
    # sides are bucketed/shuffled on orderkey.
    dims = (
        region.where(F.col("r_name") == "ASIA")
        .join(nation, F.col("r_regionkey") == F.col("n_regionkey"))
        .join(customer, F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            _sum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


QR04_SQL = """
SELECT n_name,
       CAST(round((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS revenue,
       count(*) AS n_items
FROM region
JOIN nation ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY n_name
"""


# --- Q-R5: left / semi / anti joins -----------------------------------------

def qr05_left_join_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_orders")
    )


QR05_LEFT_SQL = """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
ORDER BY n_orders
"""


def qr05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    sel = customer.where(F.col("c_acctbal") > 7000).join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    )
    return sel.agg(
        F.count("*").alias("n_cust"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


QR05_SEMI_SQL = """
SELECT count(*) AS n_cust,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(max(c_custkey) AS BIGINT) AS max_key
FROM customer
WHERE c_acctbal > 7000
  AND c_custkey IN (SELECT o_custkey FROM orders)
"""


def qr05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    sel = customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
    return sel.agg(
        F.count("*").alias("n_cust"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        _sum6("c_acctbal").alias("sum_bal"),
    )


QR05_ANTI_SQL = """
SELECT count(*) AS n_cust,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(max(c_custkey) AS BIGINT) AS max_key,
       CAST(round((sum(CAST(round((c_acctbal) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS sum_bal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- Q-R6: hash aggregate (TPC-H Q1 shape) ----------------------------------

def qr06_hash_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # scaled-int sums (see _i6): exact + associative; averages
            # derive from the exact sums (one correctly-rounded division)
            _sum6("l_quantity").alias("sum_qty"),
            _sum6("l_extendedprice").alias("sum_base_price"),
            _sum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            _sum6(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("sum_charge"),
            scaled_round(F.sum(_i6("l_quantity")) / F.lit(SCALE6) / F.count("*"), 2).alias("avg_qty"),
            scaled_round(F.sum(_i6("l_extendedprice")) / F.lit(SCALE6) / F.count("*"), 2).alias("avg_price"),
            scaled_round(F.sum(_i6("l_discount")) / F.lit(SCALE6) / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


QR06_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round((sum(CAST(round((l_quantity) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS sum_qty,
       CAST(round((sum(CAST(round((l_extendedprice) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(round((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS sum_disc_price,
       CAST(round((sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS sum_charge,
       CAST(round((sum(CAST(round((l_quantity) * 1000000) AS BIGINT)) / 1000000.0 / count(*)) * 100) AS BIGINT) / 100.0 AS avg_qty,
       CAST(round((sum(CAST(round((l_extendedprice) * 1000000) AS BIGINT)) / 1000000.0 / count(*)) * 100) AS BIGINT) / 100.0 AS avg_price,
       CAST(round((sum(CAST(round((l_discount) * 1000000) AS BIGINT)) / 1000000.0 / count(*)) * 10000) AS BIGINT) / 10000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q-R7: distinct / count-distinct ----------------------------------------

def qr07_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.countDistinct("o_custkey", "o_orderstatus").alias("n_cust_status"),
        F.count("*").alias("n_orders"),
    )


QR07_SQL = """
SELECT count(DISTINCT o_custkey) AS n_cust,
       count(DISTINCT o_orderpriority) AS n_prio,
       count(DISTINCT (o_custkey, o_orderstatus)) AS n_cust_status,
       count(*) AS n_orders
FROM orders
"""


# --- Q-R8: approximate count-distinct (exact-twin tolerance gate) ------------

def qr08_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch — the scale path for distinct counting.

    The sketch estimate itself is engine-specific (DuckDB cannot reproduce
    Spark's HLL++ register values), so the driver-hashable contract is the
    exact-twin form: compute the exact distinct count alongside the sketch
    in one aggregate and emit (exact count, rows, within-tolerance flag).
    All three columns are deterministic — rsd=0.02 puts the estimate well
    inside the 5% gate (>2 sigma margin) — so the oracle pins them, and a
    sketch regression flips ``within_tol`` to false and fails the hash.
    """
    orders = _t(spark, sf_dir, "orders")
    agg = orders.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_cust"),
        F.countDistinct("o_custkey").alias("exact_cust"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        "exact_cust",
        "n_orders",
        (
            F.abs(F.col("approx_cust") - F.col("exact_cust"))
            <= F.col("exact_cust") * F.lit(0.05)
        ).alias("within_tol"),
    )


QR08_SQL = """
SELECT count(DISTINCT o_custkey) AS exact_cust,
       count(*) AS n_orders,
       TRUE AS within_tol
FROM orders
"""


# --- Q-R9: rollup / grouping sets --------------------------------------------

def qr09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "o_orderstatus")
        .agg(
            _sum6("o_totalprice").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("order_year").asc_nulls_first(), F.col("o_orderstatus").asc_nulls_first())
    )


QR09_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       o_orderstatus,
       CAST(round((sum(CAST(round((o_totalprice) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP (order_year, o_orderstatus)
ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


# --- Q-R10: window ranking ----------------------------------------------------

def qr10_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy("o_custkey", "rn")
    )


QR10_SQL = """
SELECT o_custkey, rn, o_orderkey, price
FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


# --- Q-R11: window analytic with frame ---------------------------------------

def qr11_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
    ).orderBy("o_custkey", "o_orderkey")


QR11_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w_frame, 2) AS running_total,
       round(lag(o_totalprice, 1) OVER w_order, 2) AS prev_price,
       round(lead(o_totalprice, 1) OVER w_order, 2) AS next_price
FROM orders
WINDOW w_frame AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w_order AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


# --- Q-R12: sort / limit / top-k ---------------------------------------------

def qr12_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # orderBy().limit() compiles to TakeOrderedAndProject — a distributed
    # top-k (per-partition heap + driver merge), NOT a full sort. This is the
    # shape that survives 100 TB.
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


QR12_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


# --- Q-R13: set operations ----------------------------------------------------

def _segments(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    customer = _t(spark, sf_dir, "customer")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = customer.where(F.col("c_acctbal") > 7000).select("c_custkey")
    return building, rich


def _keyset_agg(df: DataFrame) -> DataFrame:
    return df.agg(
        F.count("*").alias("n_keys"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        F.sum("c_custkey").alias("sum_keys"),
    )


def qr13_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    building, rich = _segments(spark, sf_dir)
    return _keyset_agg(building.union(rich).distinct())


def qr13_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    building, rich = _segments(spark, sf_dir)
    return _keyset_agg(building.intersect(rich))


def qr13_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    building, rich = _segments(spark, sf_dir)
    return _keyset_agg(building.subtract(rich))


_QR13_TMPL = """
SELECT count(*) AS n_keys,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(max(c_custkey) AS BIGINT) AS max_key,
       CAST(sum(c_custkey) AS BIGINT) AS sum_keys
FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  {op}
  SELECT c_custkey FROM customer WHERE c_acctbal > 7000
)
"""

QR13_UNION_SQL = _QR13_TMPL.format(op="UNION")
QR13_INTERSECT_SQL = _QR13_TMPL.format(op="INTERSECT")
QR13_EXCEPT_SQL = _QR13_TMPL.format(op="EXCEPT")


# --- Q-R14: scalar string functions -------------------------------------------

def qr14_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # upper() uses the JVM's FULL Unicode case mapping ('ß' → 'SS');
    # DuckDB's ICU path maps simply ('ß' → 'ẞ') — a documented
    # engine-level divergence outside ASCII (FIXTURES.md §5)
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%bolt%").alias("is_bolt"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.length("p_name").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_tokens"),
        F.regexp_replace("p_name", r"\s+", "_").alias("snake_name"),
    ).orderBy("p_partkey")


QR14_SQL = r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 5) AS name_pre,
       p_brand || ':' || p_type AS brand_type,
       (p_name LIKE '%bolt%') AS is_bolt,
       regexp_extract(p_name, '(\w+)$', 1) AS last_word,
       CAST(length(p_name) AS INTEGER) AS name_len,
       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
       regexp_replace(p_name, '\s+', '_', 'g') AS snake_name
FROM part
ORDER BY p_partkey
"""


# --- Q-R15: scalar date functions ----------------------------------------------

def qr15_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("days_since"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
        F.dayofweek("o_orderdate").alias("dow"),
    ).orderBy("o_orderkey")


QR15_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
FROM orders
ORDER BY o_orderkey
"""


# --- Q-R16: math / decimal -------------------------------------------------------

def qr16_math_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Exercise exact decimal accumulation: widen double → decimal(12,2) at the
    # scan, sum in decimal (exact), render as double at the edge.
    dec = F.col("l_extendedprice").cast("decimal(12,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(dec).cast("double").alias("sum_dec_price"),
            scaled_round(F.avg(dec).cast("double"), 2).alias("avg_dec_price"),
            F.floor(F.max("l_quantity")).cast("long").alias("max_qty_floor"),
            scaled_round(F.abs(F.min(F.col("l_discount") - 0.05))).alias("min_disc_dev"),
            scaled_round(F.sqrt(F.sum("l_quantity"))).alias("sqrt_qty"),
        )
        .orderBy("l_returnflag")
    )


QR16_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_dec_price,
       CAST(round(CAST(avg(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 100) AS BIGINT) / 100.0 AS avg_dec_price,
       CAST(floor(max(l_quantity)) AS BIGINT) AS max_qty_floor,
       CAST(round(abs(min(l_discount - 0.05)) * 10000) AS BIGINT) / 10000.0 AS min_disc_dev,
       CAST(round(sqrt(sum(l_quantity)) * 10000) AS BIGINT) / 10000.0 AS sqrt_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- Q-R17: array functions -------------------------------------------------------

def qr17_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    # Higher-order functions run inside codegen — no Python boundary.
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        scaled_round(F.element_at("embedding", 1).cast("double")).alias("first_val"),
        scaled_round(
            F.expr(
                "aggregate(transform(embedding, x -> abs(cast(x as double))),"
                " cast(0.0 as double), (a, x) -> a + x)"
            )
        ).alias("l1_norm"),
        scaled_round(
            F.expr(
                "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
                " cast(0.0 as double), (a, x) -> a + x)"
            )
        ).alias("sq_norm"),
    ).orderBy("vec_id")


QR17_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS n_dims,
       CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT) / 10000.0 AS first_val,
       CAST(round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) * 10000) AS BIGINT) / 10000.0 AS l1_norm,
       CAST(round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) * 10000) AS BIGINT) / 10000.0 AS sq_norm
FROM embeddings
ORDER BY vec_id
"""


# --- Q-R18: subqueries (scalar / IN / EXISTS) --------------------------------------

def qr18_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    # the "above average balance" scalar subquery compares in EXACT
    # cross-multiplied cents (bal_cents * count > sum_cents, the qr41
    # recipe): a raw double avg() is partition-order-dependent on Spark
    # and sequential on DuckDB, so a boundary-cent customer could flip
    # between engines (r8 area review). c_acctbal is a stored 2-dp
    # column, so the cents cast is exact.
    return spark.sql(
        """
        SELECT count(*) AS n_above,
               CAST(min(c_custkey) AS BIGINT) AS min_key,
               CAST(max(c_custkey) AS BIGINT) AS max_key
        FROM customer
        WHERE CAST(round(c_acctbal * 100) AS BIGINT)
                * (SELECT count(c_acctbal) FROM customer)
              > (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) FROM customer)
          AND c_custkey IN (SELECT o_custkey FROM orders)
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c_custkey AND o.o_totalprice > 1000)
        """
    )


QR18_SQL = """
SELECT count(*) AS n_above,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(max(c_custkey) AS BIGINT) AS max_key
FROM customer
WHERE CAST(round(c_acctbal * 100) AS BIGINT)
                * (SELECT count(c_acctbal) FROM customer)
              > (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) FROM customer)
  AND c_custkey IN (SELECT o_custkey FROM orders)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c_custkey AND o.o_totalprice > 1000)
"""


# --- Q-R19: CASE / conditional -----------------------------------------------------

def qr19_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "mid")
        .otherwise("low")
    )
    status_adj = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING"))
    return (
        orders.select(bucket.alias("prio_bucket"), status_adj.alias("status_adj"), "o_totalprice")
        .groupBy("prio_bucket", "status_adj")
        .agg(F.count("*").alias("n_orders"), _sum6("o_totalprice").alias("sum_price"))
        .orderBy("prio_bucket", "status_adj")
    )


QR19_SQL = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
            ELSE 'low' END AS prio_bucket,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_adj,
       count(*) AS n_orders,
       CAST(round((sum(CAST(round((o_totalprice) * 1000000) AS BIGINT)) / 1000000.0) * 100) AS BIGINT) / 100.0 AS sum_price
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- Q-R20: pivot ------------------------------------------------------------

def qr20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # Values pinned explicitly: pivot without values runs a distinct-scan
    # job first — at 100 TB that's a full extra pass over the fact table.
    return (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
        .orderBy("o_year")
    )


QR20_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       count(*) FILTER (o_orderstatus = 'F') AS n_f,
       count(*) FILTER (o_orderstatus = 'O') AS n_o,
       count(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY 1
ORDER BY 1
"""


# --- Q-R21: exact percentiles ------------------------------------------------

def qr21_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # exact interpolated percentiles (both engines use the same continuous
    # quantile definition); the scale path swaps in approx_percentile —
    # a mergeable sketch that avoids the per-group sort
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            scaled_round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
            scaled_round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90"),
            scaled_round(F.expr("percentile(o_totalprice, 0.99)"), 2).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


QR21_SQL = """
SELECT o_orderstatus,
       CAST(round(quantile_cont(o_totalprice, 0.5) * 100) AS BIGINT) / 100.0 AS p50,
       CAST(round(quantile_cont(o_totalprice, 0.9) * 100) AS BIGINT) / 100.0 AS p90,
       CAST(round(quantile_cont(o_totalprice, 0.99) * 100) AS BIGINT) / 100.0 AS p99
FROM orders
GROUP BY 1 ORDER BY 1
"""


# --- Q-R22: histogram binning ------------------------------------------------

def qr22_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        orders.groupBy(bin_col.alias("price_bin"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy("price_bin")
    )


QR22_SQL = """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bin,
       count(*) AS n_orders
FROM orders
GROUP BY 1 ORDER BY 1
"""


# --- Q-R9b: cube + grouping id ----------------------------------------------

def qr09b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .cube("order_year", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
            "gid",
        )
    )


QR09B_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       o_orderstatus,
       count(*) AS n_orders,
       CAST(grouping(order_year) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (order_year, o_orderstatus)
ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST, gid
"""


# --- Q-R10b: analytic window pack (ntile / percent_rank / cume_dist) ---------

def qr10b_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        scaled_round(F.percent_rank().over(w)).alias("pct_rank"),
        scaled_round(F.cume_dist().over(w)).alias("cume"),
        F.first("c_custkey").over(w).alias("top_cust"),
    ).orderBy("c_custkey")


QR10B_SQL = """
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w AS quartile,
       CAST(round(percent_rank() OVER w * 10000) AS BIGINT) / 10000.0 AS pct_rank,
       CAST(round(cume_dist() OVER w * 10000) AS BIGINT) / 10000.0 AS cume,
       first_value(c_custkey) OVER w AS top_cust
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_custkey
"""


# --- Q-R23: edit-distance self-join (fuzzy matching) -------------------------

def qr23_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    # group-bounded self-join: only parts sharing (brand, size) are
    # compared, so the quadratic edit-distance work stays inside small
    # blocks — the blocking pattern every entity-resolution run uses
    a = part.select("p_brand", "p_size", F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = part.select("p_brand", "p_size", F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, ["p_brand", "p_size"])
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= 12)
        .select("key_a", "key_b", "edit_dist")
        .orderBy("key_a", "key_b")
    )


QR23_SQL = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 12
ORDER BY key_a, key_b
"""


# --- Q-R24: bit aggregates + array normalization -----------------------------

def qr24_bit_and_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    norm = F.array_join(F.array_sort(F.array_distinct(F.split("p_name", " "))), " ")
    return (
        part.groupBy("p_brand")
        .agg(
            F.expr("bit_or(p_size)").alias("size_bits_or"),
            F.expr("bit_and(p_size)").alias("size_bits_and"),
            F.expr("bit_xor(p_size)").alias("size_bits_xor"),
            F.count_distinct(norm).alias("n_norm_names"),
        )
        .orderBy("p_brand")
    )


QR24_SQL = """
SELECT p_brand,
       CAST(bit_or(p_size) AS INT) AS size_bits_or,
       CAST(bit_and(p_size) AS INT) AS size_bits_and,
       CAST(bit_xor(p_size) AS INT) AS size_bits_xor,
       count(DISTINCT array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ' '))
           AS n_norm_names
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


# --- Q-R25: full outer join --------------------------------------------------

def qr25_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers FULL OUTER 1996 order activity.

    Both inputs are aggregates/filters of bigger tables, so unmatched rows
    exist on BOTH sides (rich customers who did not order in 1996; 1996
    buyers below the balance cut). Keys coalesced, presence flagged.
    """
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rich = customer.where(F.col("c_acctbal") > 8000).select(
        "c_custkey", F.round("c_acctbal", 2).alias("acctbal")
    )
    active = (
        orders.where(F.year("o_orderdate") == 1996)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders_1996"), _sum6("o_totalprice").alias("rev_1996"))
    )
    joined = rich.join(active, rich["c_custkey"] == active["o_custkey"], "full")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_custkey").isNotNull().alias("is_rich"),
        F.col("o_custkey").isNotNull().alias("active_1996"),
        "acctbal",
        "n_orders_1996",
        "rev_1996",
    ).orderBy("custkey")


QR25_SQL = f"""
WITH rich AS (
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_acctbal > 8000
),
active AS (
    SELECT o_custkey, count(*) AS n_orders_1996,
           {_duck_sum6("o_totalprice")} AS rev_1996
    FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
)
SELECT coalesce(rich.c_custkey, active.o_custkey) AS custkey,
       rich.c_custkey IS NOT NULL AS is_rich,
       active.o_custkey IS NOT NULL AS active_1996,
       rich.acctbal, active.n_orders_1996, active.rev_1996
FROM rich FULL OUTER JOIN active ON rich.c_custkey = active.o_custkey
ORDER BY custkey
"""


# --- Q-R26: statistical aggregate pack ---------------------------------------

def qr26_stats_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/correlation/covariance/regression statistics from
    EXACT integer co-moments.

    The original formulation used the engines' built-in Welford
    aggregates with round-at-grain canonicalization, on the argument
    that double co-moment drift sits far below the rounding grain "at
    fixture magnitudes" — and the r9 deep TPC-H fuzz falsified exactly
    that clause (covar_samp 490275.375 rounding .38 on Spark / .37 on
    DuckDB at generated magnitudes) and additionally crashed Spark's
    ``corr`` with an ANSI DIVIDE_BY_ZERO on a zero-variance group. The
    robust form is the repo's standing discipline (qt11/ql57): quantize
    both columns to cents, aggregate n/Σx/Σy/Σx²/Σy²/Σxy as exact
    DECIMAL(38,0), and derive every statistic with the IDENTICAL double
    expression on both engines — one correctly-rounded decimal→double
    cast per co-moment, then the same divisions and sqrts in the same
    order, so results are bit-identical at ANY magnitude. Degenerate
    groups (n=1, zero variance) are NULL via try_divide, matching
    DuckDB's x/0 = NULL, instead of raising.

    Scale: one partial-aggregating groupBy (the six sums are all
    map-side combinable); the statistics are per-group scalar math.
    ANSI decimal overflow past ~10^38 co-moments fails LOUD, the
    embedding_corr precedent.
    """
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    q = li.select(
        "l_returnflag",
        F.expr(f"cast(cast(round(l_quantity * 100) as bigint) as {dec})").alias("x"),
        F.expr(f"cast(cast(round(l_extendedprice * 100) as bigint) as {dec})").alias("y"),
    )
    m = q.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    d = m.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        F.expr(f"cast(n as {dec}) * sxx - sx * sx").alias("nvarx"),
        F.expr(f"cast(n as {dec}) * syy - sy * sy").alias("nvary"),
        F.expr(f"cast(n as {dec}) * sxy - sx * sy").alias("ncov"),
    )
    nd = "cast(n as double)"
    return d.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        scaled_round(
            F.expr(f"sqrt(try_divide(cast(nvary as double), {nd} * ({nd} - 1.0) * 10000.0))"), 2
        ).alias("sd_price"),
        scaled_round(
            F.expr(f"sqrt(cast(nvary as double) / ({nd} * {nd} * 10000.0))"), 2
        ).alias("sdp_price"),
        scaled_round(
            F.expr(f"try_divide(cast(nvarx as double), {nd} * ({nd} - 1.0) * 10000.0)"), 2
        ).alias("var_qty"),
        scaled_round(
            F.expr(f"cast(nvarx as double) / ({nd} * {nd} * 10000.0)"), 2
        ).alias("varp_qty"),
        scaled_round(
            F.expr(
                "try_divide(cast(ncov as double), "
                "sqrt(cast(nvarx as double)) * sqrt(cast(nvary as double)))"
            )
        ).alias("corr_qty_price"),
        scaled_round(
            F.expr(f"try_divide(cast(ncov as double), {nd} * ({nd} - 1.0) * 10000.0)"), 2
        ).alias("cov_qty_price"),
        scaled_round(
            F.expr(f"cast(ncov as double) / ({nd} * {nd} * 10000.0)"), 2
        ).alias("covp_qty_price"),
        scaled_round(
            F.expr("try_divide(cast(ncov as double), cast(nvarx as double))")
        ).alias("slope"),
        scaled_round(
            F.expr(
                "try_divide(cast(sy as double) - "
                "try_divide(cast(ncov as double), cast(nvarx as double))"
                f" * cast(sx as double), {nd} * 100.0)"
            )
        ).alias("intercept"),
    ).orderBy("l_returnflag")


QR26_SQL = """
WITH q AS (
    SELECT l_returnflag,
           CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0)) AS x,
           CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0)) AS y
    FROM lineitem
),
m AS (
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS DECIMAL(38,0)) AS sx,
           CAST(sum(y) AS DECIMAL(38,0)) AS sy,
           CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
           CAST(sum(y * y) AS DECIMAL(38,0)) AS syy,
           CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy
    FROM q GROUP BY 1
),
d AS (
    SELECT l_returnflag, n, sx, sy,
           CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS nvarx,
           CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS nvary,
           CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS ncov
    FROM m
)
SELECT l_returnflag,
       n AS n_rows,
       CAST(round(sqrt(nvary::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0) * 10000.0)) * 100) AS BIGINT) / 100.0 AS sd_price,
       CAST(round(sqrt(nvary::DOUBLE / (n::DOUBLE * n::DOUBLE * 10000.0)) * 100) AS BIGINT) / 100.0 AS sdp_price,
       CAST(round((nvarx::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0) * 10000.0)) * 100) AS BIGINT) / 100.0 AS var_qty,
       CAST(round((nvarx::DOUBLE / (n::DOUBLE * n::DOUBLE * 10000.0)) * 100) AS BIGINT) / 100.0 AS varp_qty,
       CAST(round((ncov::DOUBLE / (sqrt(nvarx::DOUBLE) * sqrt(nvary::DOUBLE))) * 10000) AS BIGINT) / 10000.0 AS corr_qty_price,
       CAST(round((ncov::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0) * 10000.0)) * 100) AS BIGINT) / 100.0 AS cov_qty_price,
       CAST(round((ncov::DOUBLE / (n::DOUBLE * n::DOUBLE * 10000.0)) * 100) AS BIGINT) / 100.0 AS covp_qty_price,
       CAST(round((ncov::DOUBLE / nvarx::DOUBLE) * 10000) AS BIGINT) / 10000.0 AS slope,
       CAST(round(((sy::DOUBLE - (ncov::DOUBLE / nvarx::DOUBLE) * sx::DOUBLE) / (n::DOUBLE * 100.0)) * 10000) AS BIGINT) / 10000.0 AS intercept
FROM d
ORDER BY 1
"""


# --- Q-R27: ordered string aggregation ---------------------------------------

def qr27_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted listagg per group: nations of each region as one CSV string.

    Spark's collect_list is order-nondeterministic, so the canonical form
    is sort-then-join (array_sort ∘ collect_list) — semantically identical
    to DuckDB's ordered string_agg.
    """
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
        )
        .orderBy("r_name")
    )


QR27_SQL = """
SELECT r_name,
       count(*) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY 1 ORDER BY 1
"""


# --- Q-R28: filtered / conditional aggregation -------------------------------

def qr28_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year conditional aggregates: count_if / filtered sum / filtered avg.

    Spark expresses FILTER clauses as count_if + sum(when) + avg(when)
    (when without otherwise yields NULL, which avg ignores — exactly the
    FILTER semantics). All partial-aggregable, map-side combinable.
    """
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            scaled_round(
                F.sum(F.when(urgent, _i6("o_totalprice")).otherwise(F.lit(0).cast("bigint")))
                / SCALE6,
                2,
            ).alias("urgent_rev"),
            # exact mean (r9, the qr26 Welford-drift lesson): a raw
            # double avg() accumulates in engine-specific order — sum
            # exact cents, divide once, both engines term-for-term
            scaled_round(
                F.try_divide(
                    F.sum(
                        F.when(
                            F.col("o_orderstatus") == "O",
                            F.expr("cast(round(o_totalprice * 100) as bigint)"),
                        )
                    ).cast("double"),
                    F.count_if(F.col("o_orderstatus") == "O").cast("double")
                    * F.lit(100.0),
                ),
                2,
            ).alias("avg_open_price"),
            scaled_round(
                F.count_if(F.col("o_orderstatus") == "F") / F.count("*")
            ).alias("finished_share"),
        )
        .orderBy("o_year")
    )


QR28_SQL = """
SELECT year(o_orderdate) AS o_year,
       count(*) AS n_orders,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       CAST(round(coalesce(sum(CAST(round(o_totalprice * 1000000) AS BIGINT))
                FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')), 0)
             / 1000000.0 * 100) AS BIGINT) / 100.0 AS urgent_rev,
       CAST(round(
           (sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'O'))::DOUBLE
           / ((count(*) FILTER (WHERE o_orderstatus = 'O'))::DOUBLE * 100.0)
           * 100) AS BIGINT) / 100.0 AS avg_open_price,
       CAST(round((count(*) FILTER (WHERE o_orderstatus = 'F')) / (1.0 * count(*))
            * 10000) AS BIGINT) / 10000.0 AS finished_share
FROM orders
GROUP BY 1 ORDER BY 1
"""


# --- Q-R29: RANGE-frame window (trailing 30 days) ----------------------------

QR29_CUST_MOD = 50


def qr29_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day order totals per customer via a RANGE window frame.

    The frame is keyed on an integer day number (days since epoch), so
    RANGE 30 PRECEDING means calendar days, not row counts — same-day ties
    all fall inside the frame, making the result order-independent. The
    customer filter is applied BEFORE the window (partition-local frames
    make that semantics-preserving) so only sampled partitions sort.
    """
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_custkey") % QR29_CUST_MOD == 0
    )
    day_num = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num)
        .rangeBetween(-30, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            F.round(F.sum(_i6("o_totalprice")).over(w) / SCALE6, 2).alias("rev_30d"),
            F.count("*").over(w).alias("n_orders_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


QR29_SQL = f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       round(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)) OVER w / 1000000.0, 2)
           AS rev_30d,
       count(*) OVER w AS n_orders_30d
FROM orders
WHERE o_custkey % {QR29_CUST_MOD} = 0
WINDOW w AS (
    PARTITION BY o_custkey
    ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
)
ORDER BY o_custkey, o_orderkey
"""


# --- Q-R30: arg-extrema aggregates (max_by / min_by) -------------------------

def qr30_arg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment argmax/argmin rows without a window: max_by/min_by.

    One hash aggregate instead of window + filter — at scale this is a
    single shuffle with map-side partial extrema, no per-partition sort.
    The ordering key is a (value, id) struct so ties resolve by id
    lexicographically on both engines.
    """
    customer = _t(spark, sf_dir, "customer")
    top = F.max(F.struct(F.round("c_acctbal", 2).alias("bal"), F.col("c_custkey").alias("k")))
    bot = F.min(F.struct(F.round("c_acctbal", 2).alias("bal"), F.col("c_custkey").alias("k")))
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            top.getField("k").alias("richest_cust"),
            top.getField("bal").alias("richest_bal"),
            bot.getField("k").alias("poorest_cust"),
            bot.getField("bal").alias("poorest_bal"),
        )
        .orderBy("c_mktsegment")
    )


QR30_SQL = """
SELECT c_mktsegment,
       max(struct_pack(bal := round(c_acctbal, 2), k := c_custkey))['k'] AS richest_cust,
       max(struct_pack(bal := round(c_acctbal, 2), k := c_custkey))['bal'] AS richest_bal,
       min(struct_pack(bal := round(c_acctbal, 2), k := c_custkey))['k'] AS poorest_cust,
       min(struct_pack(bal := round(c_acctbal, 2), k := c_custkey))['bal'] AS poorest_bal
FROM customer
GROUP BY 1 ORDER BY 1
"""


# --- Q-R31: NULL-semantics pack ----------------------------------------------

def qr31_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / nvl2 / null-safe equality, aggregated.

    NULLs are manufactured with nullif (fixtures ship none), then pushed
    through the standard NULL-handling surface; count/avg NULL-skipping and
    the <=> (IS NOT DISTINCT FROM) three-valued-logic escape are pinned.
    """
    orders = _t(spark, sf_dir, "orders")
    # NULL for ~1/3 of rows: priority '1-URGENT' → NULL
    masked = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.count(masked).alias("n_nonnull"),  # count skips NULLs
            F.count_if(masked.isNull()).alias("n_null"),
            F.count_if(masked.eqNullSafe(F.lit(None).cast("string"))).alias("n_nullsafe_eq"),
            F.count_if(F.coalesce(masked, F.lit("1-URGENT")) == "1-URGENT").alias("n_coalesced"),
            F.count_if(F.nvl2(masked, F.lit("has"), F.lit("none")) == "none").alias("n_nvl2_none"),
        )
        .orderBy("o_year")
    )


QR31_SQL = """
SELECT year(o_orderdate) AS o_year,
       count(nullif(o_orderpriority, '1-URGENT')) AS n_nonnull,
       count(*) FILTER (WHERE nullif(o_orderpriority, '1-URGENT') IS NULL) AS n_null,
       count(*) FILTER (WHERE nullif(o_orderpriority, '1-URGENT') IS NOT DISTINCT FROM NULL)
           AS n_nullsafe_eq,
       count(*) FILTER (WHERE coalesce(nullif(o_orderpriority, '1-URGENT'), '1-URGENT') = '1-URGENT')
           AS n_coalesced,
       count(*) FILTER (
           WHERE (CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NOT NULL
                       THEN 'has' ELSE 'none' END) = 'none'
       ) AS n_nvl2_none
FROM orders
GROUP BY 1 ORDER BY 1
"""


# --- Q-R32: unpivot (inverse of Q-R20's pivot) -------------------------------

UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def qr32_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide measures → long (measure, value) rows, then re-aggregated.

    unpivot is a per-row expansion (no shuffle of its own); the only
    exchange is the downstream aggregate. Constant-width expansion (4×)
    keeps partition sizing predictable at any SF.
    """
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=UNPIVOT_MEASURES,
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(_sum6("val").alias("total"), F.count("*").alias("n_rows"))
        .orderBy("l_returnflag", "measure")
    )


QR32_SQL = f"""
SELECT l_returnflag, measure,
       {_duck_sum6("val")} AS total,
       count(*) AS n_rows
FROM (
    SELECT l_returnflag, measure, val
    FROM lineitem
    UNPIVOT (val FOR measure IN ({", ".join(UNPIVOT_MEASURES)}))
)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- Q-R33: positional explode (LATERAL VIEW posexplode) ---------------------

QR33_PART_MOD = 100


def qr33_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token + position per part name — ordinality-preserving expansion.

    posexplode keeps the array index, which plain explode (and DuckDB's
    bare unnest) loses; the oracle reconstructs it with a lateral
    generate_series over the array length.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") % QR33_PART_MOD == 0)
    return (
        part.select(
            "p_partkey",
            F.posexplode(F.split("p_name", " ")).alias("pos", "token"),
        )
        .orderBy("p_partkey", "pos")
    )


QR33_SQL = f"""
WITH t AS (
    SELECT p_partkey, string_split(p_name, ' ') AS toks
    FROM part WHERE p_partkey % {QR33_PART_MOD} = 0
)
SELECT p_partkey, g.i AS pos, toks[g.i + 1] AS token
FROM t, unnest(generate_series(0, len(toks) - 1)) AS g(i)
ORDER BY p_partkey, pos
"""


# --- Q-R34: timezone conversion pack -----------------------------------------

TZ_ZONES = ("America/Sao_Paulo", "Asia/Tokyo")


def qr34_timezone_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC event times rendered in IANA zones: local-hour histograms.

    Both engines resolve zone rules from the IANA tzdb (Spark via the JVM,
    DuckDB via ICU), so offsets — including any DST edge inside the fixture
    range — must agree exactly.
    """
    ev = _t(spark, sf_dir, "events")
    per_zone = [
        ev.select(
            F.lit(z).alias("tz"),
            F.hour(F.from_utc_timestamp("ts", z)).alias("local_hour"),
        )
        for z in TZ_ZONES
    ]
    both = per_zone[0].unionAll(per_zone[1])
    return (
        both.groupBy("tz", "local_hour")
        .agg(F.count("*").alias("n_events"))
        .orderBy("tz", "local_hour")
    )


QR34_SQL = f"""
WITH local AS (
    SELECT tz, hour((ts AT TIME ZONE 'UTC') AT TIME ZONE tz) AS local_hour
    FROM events, unnest(['{TZ_ZONES[0]}', '{TZ_ZONES[1]}']) AS z(tz)
)
SELECT tz, local_hour, count(*) AS n_events
FROM local GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- Q-R35: higher-order lambda pack (filter/exists/forall/slice/zip_with) --

def qr35_lambda_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row array lambdas beyond qr17's transform/aggregate.

    All five run inside whole-stage codegen — no explode, no shuffle, no
    Python. At 100 TB this is the difference between a map-only stage and
    a posexplode that multiplies the row count by the vector width (64×).
    zip_with pairs the vector with its reverse (a self-convolution probe);
    the oracle reconstructs it with an index walk since DuckDB has no
    zip_with.
    """
    emb = _t(spark, sf_dir, "embeddings")
    d = "transform(embedding, x -> cast(x as double))"
    return emb.select(
        "vec_id",
        F.expr(f"size(filter({d}, x -> x > 0))").alias("n_pos"),
        F.expr(f"exists({d}, x -> abs(x) > 2.0)").alias("has_big"),
        F.expr(f"forall({d}, x -> abs(x) < 100.0)").alias("all_bounded"),
        scaled_round(
            F.expr(f"aggregate(slice({d}, 1, 3), cast(0.0 as double), (a, x) -> a + x)")
        ).alias("head3_sum"),
        scaled_round(
            F.expr(
                f"aggregate(zip_with({d}, reverse({d}), (x, y) -> x * y),"
                " cast(0.0 as double), (a, x) -> a + x)"
            )
        ).alias("rev_dot"),
    ).orderBy("vec_id")


QR35_SQL = """
WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT vec_id,
       CAST(len(list_filter(e, x -> x > 0)) AS INTEGER) AS n_pos,
       len(list_filter(e, x -> abs(x) > 2.0)) > 0 AS has_big,
       len(list_filter(e, x -> abs(x) >= 100.0)) = 0 AS all_bounded,
       CAST(round(list_sum(e[1:3]) * 10000) AS BIGINT) / 10000.0 AS head3_sum,
       CAST(round(list_sum(list_transform(generate_series(1, len(e)),
                                     i -> e[i] * e[len(e) - i + 1])) * 10000) AS BIGINT)
           / 10000.0 AS rev_dot
FROM t
ORDER BY vec_id
"""


# --- Q-R36: lateral join (correlated top-k per outer row) --------------------

def qr36_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by balance per nation via LATERAL correlated subquery.

    The lateral form expresses per-row dependent computation declaratively;
    Catalyst decorrelates it into a ranked-window plan rather than N
    re-executions, so it scales with the outer row count, not outer × inner.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, t.c_name, round(t.c_acctbal, 2) AS bal
        FROM nation,
        LATERAL (
            SELECT c_name, c_acctbal
            FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
        ORDER BY n_name, bal DESC, c_name
        """
    )


QR36_SQL = """
SELECT n_name, t.c_name, round(t.c_acctbal, 2) AS bal
FROM nation,
LATERAL (
    SELECT c_name, c_acctbal
    FROM customer
    WHERE c_nationkey = n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 2
) t
ORDER BY n_name, bal DESC, c_name
"""


# --- Q-R37: skew-salted join equivalence -------------------------------------

QR37_N_SALT = 8


def qr37_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted lineitem ⋈ supplier, aggregated — must equal the plain join.

    Salting rewrites the physical key distribution (probe side scattered
    across QR37_N_SALT sub-keys, build side replicated to match) without
    touching join semantics; the oracle is simply the unsalted SQL join.
    This is the manual defense for the skew case AQE can't fix: a mid-size
    build side too large to broadcast, joined on keys where a handful of
    values dominate. Deterministic: the salt is xxhash64-derived, and it
    cancels out in the aggregate anyway.
    """
    from streamsurfer_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, on="l_suppkey", n_salt=QR37_N_SALT)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            _sum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("s_nationkey")
    )


QR37_SQL = f"""
SELECT s_nationkey,
       {_duck_sum6("l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1 ORDER BY 1
"""


# --- Q-R38: shipping priority (TPC-H Q3 shape) -----------------------------

def qr38_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-revenue top-10: the classic TPC-H Q3 3-way join + top-k.

    Scale: the segment filter lands on the customer dim BEFORE the join, so
    only ~1/5 of customers is broadcast; orders/lineitem carry pushed-down
    date predicates into the parquet scan. The top-10 is a TakeOrdered on
    the aggregated (much smaller) result, never a full sort of lineitem.
    """
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-07-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_sum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


QR38_SQL = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       {_duck_sum6("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_shipdate > TIMESTAMP '1997-07-01'
GROUP BY 1, o_orderdate, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q-R39: large-volume customers (TPC-H Q18 shape) -------------------------

QR39_MIN_QTY = 300


def qr39_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total line quantity exceeds a threshold, with customer.

    The HAVING-on-aggregate runs first as a groupBy on the fact table (maps
    collapse partially map-side), producing a tiny set of qualifying order
    keys; orders/customer then join against that — the big table is touched
    exactly once. l_quantity is integral in the fixture, so the sum is an
    exact long.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_i6("l_quantity")).alias("qty6"))
        .where(F.col("qty6") > QR39_MIN_QTY * SCALE6)
        .select("l_orderkey", F.round(F.col("qty6") / SCALE6, 2).alias("total_qty"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


QR39_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         round(sum(CAST(round(l_quantity * 1000000) AS BIGINT)) / 1000000.0, 2) AS total_qty
  FROM lineitem
  GROUP BY 1
  HAVING sum(CAST(round(l_quantity * 1000000) AS BIGINT)) > {QR39_MIN_QTY} * 1000000
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --- Q-R40: SCD2 effective-date intervals from an order-status feed ----------

def qr40_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse each customer's
    order-status history into versioned [valid_from, valid_to) intervals.

    Two window passes over ONE exchange (both windows partition by
    o_custkey, so Catalyst reuses the same hash partitioning + sort):
    lag() marks status-change rows, lead() closes each interval with the
    next change's start. The open interval gets a sentinel end. This is the
    standard merge-free SCD2 pattern for a 100 TB change feed — no
    driver-side state, one shuffle by the dimension key.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus")
        .withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .where(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        hist.withColumn("version", F.row_number().over(w2))
        .withColumn("next_from", F.lead("o_orderdate").over(w2))
        .select(
            "o_custkey",
            "version",
            F.col("o_orderstatus").alias("status"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
            F.coalesce(
                F.date_format("next_from", "yyyy-MM-dd"), F.lit("9999-12-31")
            ).alias("valid_to"),
        )
        .orderBy("o_custkey", "version")
    )


QR40_SQL = """
WITH hist AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
         lag(o_orderstatus) OVER w AS prev_status
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), changes AS (
  SELECT * FROM hist
  WHERE prev_status IS NULL OR prev_status <> o_orderstatus
)
SELECT o_custkey,
       row_number() OVER w2 AS version,
       o_orderstatus AS status,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       coalesce(strftime(lead(o_orderdate) OVER w2, '%Y-%m-%d'), '9999-12-31') AS valid_to
FROM changes
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, version
"""


# --- Q-R41: dormant high-balance customers (TPC-H Q22 shape) -----------------

def qr41_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no recent orders, by nation.

    Q22's shape: scalar aggregate subquery (the balance threshold) + a
    correlated NOT EXISTS (time-scoped — no orders since 1999) + group.
    The threshold comparison is done in exact scaled-int arithmetic
    (balance*1e6*count > sum6), so the cut is partitioning-independent —
    a raw double average would let boundary customers flip between engines.
    The 1-row aggregate is cross-joined (broadcast) rather than collected.
    """
    cust = _t(spark, sf_dir, "customer")
    thresh = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(_i6("c_acctbal")).alias("bal6_sum"),
        F.count("*").alias("bal_n"),
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .where(_i6("c_acctbal") * F.col("bal_n") > F.col("bal6_sum"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            _sum6("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


QR41_SQL = f"""
WITH thresh AS (
  SELECT sum(CAST(round(c_acctbal * 1000000) AS BIGINT)) AS bal6_sum,
         count(*) AS bal_n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       count(*) AS n_custs,
       {_duck_sum6("c_acctbal")} AS total_bal
FROM customer, thresh
WHERE CAST(round(c_acctbal * 1000000) AS BIGINT) * bal_n > bal6_sum
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY 1 ORDER BY 1
"""


# --- Q-R42: full-row upsert (MERGE without transactions) ---------------------

def qr42_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a corrections+inserts feed into the orders snapshot, then
    re-aggregate the merged state.

    The feed: every 'P' order gets its price bumped 10% and closed to 'F'
    (updates); every 'O' order spawns a key-shifted copy (inserts). The
    upsert is operators/merge.upsert — anti-join + union, so the snapshot
    side never shuffles when the feed broadcasts. Oracle mirrors with
    NOT EXISTS + UNION ALL.
    """
    from streamsurfer_spark.operators.merge import upsert

    orders = _t(spark, sf_dir, "orders")
    updates = orders.where(F.col("o_orderstatus") == "P").withColumns(
        {
            "o_orderstatus": F.lit("F"),
            "o_totalprice": F.col("o_totalprice") * 1.1,
        }
    )
    inserts = orders.where(F.col("o_orderstatus") == "O").withColumn(
        "o_orderkey", F.col("o_orderkey") + 100_000_000
    )
    source = updates.unionByName(inserts)
    merged = upsert(orders, source, keys="o_orderkey")
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _sum6("o_totalprice").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


QR42_SQL = f"""
WITH source AS (
  SELECT o_orderkey, o_custkey, 'F' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderstatus = 'P'
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderstatus = 'O'
), merged AS (
  SELECT * FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM source s
                    WHERE s.o_orderkey IS NOT DISTINCT FROM o.o_orderkey)
  UNION ALL
  SELECT * FROM source
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       {_duck_sum6("o_totalprice")} AS total_price
FROM merged GROUP BY 1 ORDER BY 1
"""


# --- Q-R43: CDC apply with latest-wins ---------------------------------------

def qr43_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a two-batch change log to the orders snapshot: batch 1 retags
    every open/pending order's priority (op=U), batch 2 deletes the pending
    ones (op=D). Latest-wins per key must leave 'P' orders deleted and 'O'
    orders retagged.

    operators/merge.apply_cdc collapses the log with ONE struct-keyed
    max_by aggregate (no window), then anti-join + union. Oracle mirrors
    with a row_number window.
    """
    from streamsurfer_spark.operators.merge import apply_cdc_snapshot

    orders = _t(spark, sf_dir, "orders")
    batch1 = (
        orders.where(F.col("o_orderstatus").isin("O", "P"))
        .withColumn("o_orderpriority", F.lit("1-CDC"))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(1))
    )
    batch2 = (
        orders.where(F.col("o_orderstatus") == "P")
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(2))
    )
    snapshot = apply_cdc_snapshot(
        orders, batch1.unionByName(batch2), keys="o_orderkey", order_by="seq"
    )
    return (
        snapshot.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _sum6("o_totalprice").alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


QR43_SQL = f"""
WITH changes AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         '1-CDC' AS o_orderpriority, 'U' AS op, 1 AS seq
  FROM orders WHERE o_orderstatus IN ('O', 'P')
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority, 'D' AS op, 2 AS seq
  FROM orders WHERE o_orderstatus = 'P'
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
    FROM changes
  ) WHERE rn = 1
), merged AS (
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM latest l
                    WHERE l.o_orderkey IS NOT DISTINCT FROM o.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority
  FROM latest WHERE op <> 'D'
)
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {_duck_sum6("o_totalprice")} AS total_price
FROM merged GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- Q-R44: one-pass table profile -------------------------------------------

def qr44_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of orders (rows, nulls, distincts, min/max) in a
    single scan — operators/profile.py. Numerics go through the fixed-width
    rendering so lexicographic min/max equals numeric min/max and the
    result is engine-portable.
    """
    from streamsurfer_spark.operators.profile import (
        profile,
        render_number,
        render_timestamp,
    )

    orders = _t(spark, sf_dir, "orders")
    return profile(
        orders,
        {
            "o_orderkey": render_number("o_orderkey", 0),
            "o_custkey": render_number("o_custkey", 0),
            "o_orderstatus": F.col("o_orderstatus"),
            "o_totalprice": render_number("o_totalprice", 2),
            "o_orderdate": render_timestamp("o_orderdate"),
            "o_orderpriority": F.col("o_orderpriority"),
        },
    ).orderBy("col_name")


def _duck_profile_leg(name: str, render: str) -> str:
    return f"""
SELECT '{name}' AS col_name, count(*) AS n_rows,
       count(*) - count(val) AS n_nulls,
       CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
       min(val) AS min_val, max(val) AS max_val
FROM (SELECT {render} AS val FROM orders)
"""


def _duck_render_number(col: str, nd: int) -> str:
    # PAD=19 + isfinite in lockstep with operators/profile.render_number
    return (
        f"CASE WHEN {col} IS NOT NULL AND isfinite({col}::DOUBLE) THEN "
        f"lpad(CAST(CAST(round({col} * {10**nd}) AS BIGINT) AS VARCHAR), 19, '0') END"
    )


QR44_SQL = (
    " UNION ALL ".join(
        [
            _duck_profile_leg("o_orderkey", _duck_render_number("o_orderkey", 0)),
            _duck_profile_leg("o_custkey", _duck_render_number("o_custkey", 0)),
            _duck_profile_leg("o_orderstatus", "o_orderstatus"),
            _duck_profile_leg("o_totalprice", _duck_render_number("o_totalprice", 2)),
            _duck_profile_leg("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"),
            _duck_profile_leg("o_orderpriority", "o_orderpriority"),
        ]
    )
    + " ORDER BY col_name"
)


# --- Q-R45: window value functions (first/last/nth) with explicit frames -----

def qr45_window_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over per-customer order history.

    The frame is the whole partition (UNBOUNDED..UNBOUNDED) — without it
    last_value degenerates to the running current row, the classic window
    trap; pinning it here is the regression test. One row per customer is
    then kept via row_number = 1 (all four windows share ONE partitioning
    and sort, so Catalyst plans a single exchange + sort).
    """
    w_frame = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_custkey",
            F.round(F.first_value("o_totalprice").over(w_frame), 2).alias("first_price"),
            F.round(F.last_value("o_totalprice").over(w_frame), 2).alias("last_price"),
            F.round(F.nth_value("o_totalprice", 2).over(w_frame), 2).alias("second_price"),
            F.count("*").over(w_frame).alias("n_orders"),
            F.row_number().over(w_seq).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("o_custkey")
    )


QR45_SQL = """
WITH w AS (
  SELECT o_custkey,
         round(first_value(o_totalprice) OVER f, 2) AS first_price,
         round(last_value(o_totalprice) OVER f, 2) AS last_price,
         round(nth_value(o_totalprice, 2) OVER f, 2) AS second_price,
         count(*) OVER f AS n_orders,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
  WINDOW f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey, first_price, last_price, second_price, n_orders
FROM w WHERE rn = 1 ORDER BY o_custkey
"""


# --- Q-R46: OR-of-ANDs predicate join (TPC-H Q19 shape) ----------------------

def qr46_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under a 3-arm OR-of-ANDs predicate spanning both
    join sides (TPC-H Q19's planner stress test).

    Per-side conjuncts (p_brand/p_size on part, l_quantity on lineitem)
    must still push into the scans even though the cross-side OR can only
    be applied post-join — Catalyst derives the per-side disjunctions
    (brand IN (...), quantity ranges) automatically. part broadcasts.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        joined.where(arm1 | arm2 | arm3)
        .groupBy("p_brand")
        .agg(
            _sum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


QR46_SQL = f"""
SELECT p_brand,
       {_duck_sum6("l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
GROUP BY 1 ORDER BY 1
"""


# --- Q-R47: conditional revenue share (TPC-H Q14 shape) ----------------------

def qr47_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo parts' share of 1997 revenue: conditional numerator over an
    unconditional denominator in ONE aggregate pass (no self-join). Both
    sums are exact scaled ints; only the final share divides as double.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev6 = _i6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev6).otherwise(F.lit(0))).alias("promo6"),
            F.sum(rev6).alias("total6"),
        )
        .select(
            scaled_round(F.lit(100.0) * F.col("promo6") / F.col("total6"), 2).alias("promo_share_pct"),
            scaled_round(F.col("promo6") / SCALE6, 2).alias("promo_revenue"),
            scaled_round(F.col("total6") / SCALE6, 2).alias("total_revenue"),
        )
    )


QR47_SQL = """
WITH s AS (
  SELECT sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(round((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)
                  ELSE 0 END) AS promo6,
         sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) AS total6
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
SELECT CAST(round(100.0 * promo6 / total6 * 100) AS BIGINT) / 100.0 AS promo_share_pct,
       CAST(round(promo6 / 1000000.0 * 100) AS BIGINT) / 100.0 AS promo_revenue,
       CAST(round(total6 / 1000000.0 * 100) AS BIGINT) / 100.0 AS total_revenue
FROM s
"""


# --- Q-R48: bi-nation shipping volume (TPC-H Q7 shape) -----------------------

QR48_N1, QR48_N2 = "NATION_1", "NATION_2"


def qr48_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations by year — the 6-table Q7 join.

    Join topology for 100 TB: lineitem⋈orders is the only big-big join
    (shuffle on orderkey); supplier, customer, and both nation legs are
    broadcasts, and the nation filters shrink supplier/customer BEFORE the
    fact tables are touched, so most lineitem rows die at the (broadcast)
    semi-ish supplier probe.
    """
    n1 = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(QR48_N1, QR48_N2))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n1.select(F.col("n_nationkey").alias("s_nationkey"),
                                  F.col("n_name").alias("supp_nation"))),
            "s_nationkey",
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(n1.select(F.col("n_nationkey").alias("c_nationkey"),
                                  F.col("n_name").alias("cust_nation"))),
            "c_nationkey",
        )
        .select("c_custkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_sum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


QR48_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {_duck_sum6("l_extendedprice * (1 - l_discount)")} AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{QR48_N1}', '{QR48_N2}')
  AND n2.n_name IN ('{QR48_N1}', '{QR48_N2}')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --- Q-R49: multiset set ops (EXCEPT ALL / INTERSECT ALL) --------------------

def _nation_bags(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two BAGS (with duplicates) of customer nation keys: one element per
    1997 / 1998 order — multiplicity is the whole point here."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    def bag(year: int) -> DataFrame:
        return (
            orders.where(F.year("o_orderdate") == year)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("c_nationkey")
        )

    return bag(1997), bag(1998)


def _bag_agg(df: DataFrame) -> DataFrame:
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("c_nationkey").alias("n_distinct"),
        F.sum("c_nationkey").alias("sum_keys"),
    )


def qr49_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: surviving multiplicity = max(0, count97 − count98) per
    key — qr13's distinct EXCEPT collapses that to membership. Spark plans
    exceptAll as a counted anti-semantics aggregate, not a join explosion."""
    b97, b98 = _nation_bags(spark, sf_dir)
    return _bag_agg(b97.exceptAll(b98))


def qr49_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiplicity = min(count97, count98) per key."""
    b97, b98 = _nation_bags(spark, sf_dir)
    return _bag_agg(b97.intersectAll(b98))


_QR49_TMPL = """
WITH b97 AS (
  SELECT c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = 1997
), b98 AS (
  SELECT c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = 1998
)
SELECT count(*) AS n_rows,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_distinct,
       CAST(sum(c_nationkey) AS BIGINT) AS sum_keys
FROM (SELECT c_nationkey FROM b97 {op} SELECT c_nationkey FROM b98)
"""

QR49_EXCEPT_ALL_SQL = _QR49_TMPL.format(op="EXCEPT ALL")
QR49_INTERSECT_ALL_SQL = _QR49_TMPL.format(op="INTERSECT ALL")


# --- Q-R50: declarative data-quality expectations ----------------------------

def qr50_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality report over orders: row predicates (one conditional-count
    aggregate over ONE scan), a uniqueness check (exact group-by), and a
    referential check against customer (broadcast anti-join) —
    operators/expectations.py. Mixes passing constraints with genuinely
    violated ones so the report carries real counts.
    """
    from streamsurfer_spark.operators.expectations import (
        ForeignKeyCheck,
        RowCheck,
        UniqueCheck,
        check,
    )

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    return check(
        orders,
        [
            RowCheck("rc_orderkey_not_null", F.col("o_orderkey").isNotNull()),
            RowCheck("rc_price_positive", F.col("o_totalprice") > 0),
            RowCheck(
                "rc_status_domain", F.col("o_orderstatus").isin("O", "F", "P")
            ),
            RowCheck(
                "rc_shipped_before_1999",
                F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"),
            ),
            RowCheck("rc_price_above_1000", F.col("o_totalprice") > 1000),
            UniqueCheck("uq_orderkey", ["o_orderkey"]),
            ForeignKeyCheck("fk_custkey", "o_custkey", cust, "c_custkey"),
        ],
    )


QR50_SQL = """
WITH rc AS (
  SELECT count(*) AS n,
         sum(CASE WHEN NOT (o_orderkey IS NOT NULL) THEN 1 ELSE 0 END) AS v_nn,
         sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS v_pos,
         sum(CASE WHEN NOT (o_orderstatus IN ('O', 'F', 'P')) THEN 1 ELSE 0 END) AS v_dom,
         sum(CASE WHEN NOT (o_orderdate < TIMESTAMP '1999-01-01') THEN 1 ELSE 0 END) AS v_date,
         sum(CASE WHEN NOT (o_totalprice > 1000) THEN 1 ELSE 0 END) AS v_1000
  FROM orders
),
uq AS (
  SELECT coalesce(sum(cnt - 1), 0) AS v FROM (
    SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey HAVING count(*) > 1
  )
),
fk AS (
  SELECT count(*) AS v FROM orders
  WHERE o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
)
SELECT * FROM (
  SELECT 'fk_custkey' AS check_name, CAST(v AS BIGINT) AS n_violations,
         CAST(NULL AS BIGINT) AS n_checked FROM fk
  UNION ALL
  SELECT 'rc_orderkey_not_null', CAST(v_nn AS BIGINT), CAST(n AS BIGINT) FROM rc
  UNION ALL
  SELECT 'rc_price_above_1000', CAST(v_1000 AS BIGINT), CAST(n AS BIGINT) FROM rc
  UNION ALL
  SELECT 'rc_price_positive', CAST(v_pos AS BIGINT), CAST(n AS BIGINT) FROM rc
  UNION ALL
  SELECT 'rc_shipped_before_1999', CAST(v_date AS BIGINT), CAST(n AS BIGINT) FROM rc
  UNION ALL
  SELECT 'rc_status_domain', CAST(v_dom AS BIGINT), CAST(n AS BIGINT) FROM rc
  UNION ALL
  SELECT 'uq_orderkey', CAST(v AS BIGINT), CAST(NULL AS BIGINT) FROM uq
)
ORDER BY check_name
"""


# --- Q-R51: explicit GROUPING SETS -------------------------------------------

def qr51_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed GROUPING SETS — (status, priority), (status), (priority), () —
    in one aggregate; rollup/cube (qr09/qr09b) are the regular lattices,
    this is the irregular one. Catalyst plans a single Expand + hash
    aggregate: one scan regardless of set count.
    """
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("qr51_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n_orders,
               round(sum(CAST(round(o_totalprice * 1000000) AS BIGINT))
                     / CAST(1000000 AS DOUBLE), 2) AS total_price
        FROM qr51_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


QR51_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n_orders,
       round(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)) / 1000000.0, 2)
         AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# --- Q-R52: VariantType semi-structured access (Spark 4) ---------------------

def qr52_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props parsed ONCE into Spark 4's VariantType, then path
    extraction + typed cast + aggregation — the open-schema path that
    replaces per-access get_json_object re-parsing (qv06). The variant
    binary encoding is the engine-side representation; results must still
    equal the oracle's plain-JSON extraction.

    try_* forms throughout (r8 area review): the envelope contract
    itself declares malformed props and non-integral k legal producer
    output (qv02/qv06 degrade to NULL by design), so the strict
    parse_json/variant_get would make qr52 the one query on this table
    that ABORTS on a payload its siblings accept. n_missing counts
    missing-or-untypeable identically on both engines. BOTH typed reads
    go through the STRING form then try_cast to int (the qv06 recipe):
    a direct numeric cast diverges on fractional k — Spark's variant
    int cast truncates 1.5 → 1 while DuckDB's JSON → INTEGER rounds
    1.5 → 2 (caught by the adversarial-fixture differential test) —
    whereas the string route makes '1.5' untypeable → NULL on both.
    The twin guards json_extract with json_valid (DuckDB's json_extract
    throws on malformed input).
    """
    ev = _t(spark, sf_dir, "events")
    v = ev.withColumn("pv", F.try_parse_json("props"))
    k = F.try_variant_get(F.col("pv"), "$.k", "string").try_cast("int")
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.count(F.when(k.isNull(), 1)).alias("n_missing"),
        )
        .orderBy("event_type")
    )


QR52_SQL = """
WITH kx AS (
  -- the regexp guard mirrors Spark's string->int try_cast, which nulls
  -- non-integral text; DuckDB's own VARCHAR->INTEGER cast ROUNDS '1.5'
  -- to 2, so TRY_CAST alone is not the symmetric form
  SELECT event_type,
         CASE WHEN regexp_matches(
                  CASE WHEN json_valid(props)
                       THEN json_extract_string(props, '$.k') END,
                  '^-?[0-9]+$')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
         END AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k,
       count(CASE WHEN k IS NULL THEN 1 END) AS n_missing
FROM kx GROUP BY 1 ORDER BY 1
"""


# --- Q-R53: small-quantity threshold (TPC-H Q17 shape) -----------------------

QR53_BRANDS = ("Brand#1", "Brand#2")


def qr53_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from orders below 20% of their part's average quantity.

    TPC-H Q17's correlated scalar subquery, decorrelated Spark-first: the
    per-part average is ONE aggregate over lineitem joined back by part key
    — never a per-row subquery execution. The 20%-of-average cut runs in
    cross-multiplied integer form (qty·5·cnt < Σqty), so no float average
    can flip a boundary row between engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand").isin(*QR53_BRANDS)).select(
        "p_partkey", "p_brand"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(_i6("l_quantity")).alias("q6_sum"), F.count("*").alias("q_cnt")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.pp_key)
        .where(_i6("l_quantity") * 5 * F.col("q_cnt") < F.col("q6_sum"))
        .groupBy("p_brand")
        .agg(
            _sum6("l_extendedprice").alias("total_price"),
            F.count("*").alias("n_items"),
            scaled_round(F.sum(_i6("l_extendedprice")) / (7.0 * SCALE6), 2).alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


QR53_SQL = f"""
WITH pp AS (
  SELECT l_partkey AS pp_key,
         sum(CAST(round(l_quantity * 1000000) AS BIGINT)) AS q6_sum,
         count(*) AS q_cnt
  FROM lineitem GROUP BY 1
)
SELECT p_brand,
       {_duck_sum6("l_extendedprice")} AS total_price,
       count(*) AS n_items,
       CAST(round(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) / (7.0 * 1000000)
             * 100) AS BIGINT) / 100.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pp ON l_partkey = pp_key
WHERE p_brand IN {QR53_BRANDS!r}
  AND CAST(round(l_quantity * 1000000) AS BIGINT) * 5 * q_cnt < q6_sum
GROUP BY 1 ORDER BY 1
"""


# --- Q-R54: top supplier by quarterly revenue (TPC-H Q15 shape) --------------

def qr54_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) achieving the maximum 1997Q1 revenue — Q15's
    view + scalar-subquery-equality, with the equality on EXACT scaled-int
    revenue (a double-equality against max() is engine-dependent at the
    ulp; integer equality is not). The 1-row max broadcasts; no second
    scan of lineitem.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_i6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev6")
    )
    top = rev.crossJoin(F.broadcast(rev.agg(F.max("rev6").alias("max6")))).where(
        F.col("rev6") == F.col("max6")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            scaled_round(F.col("rev6") / SCALE6, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


QR54_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) AS rev6
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name,
       CAST(round(rev6 / 1000000.0 * 100) AS BIGINT) / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev6 = (SELECT max(rev6) FROM rev)
ORDER BY s_suppkey
"""


# --- Q-R55: empty-result parity ----------------------------------------------

def qr55_empty_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A query whose predicate eliminates every row (orders before 1990 —
    the fixture starts in 1995). Empty results are a classic differential-
    testing blind spot: schema, types, and zero-row hashing must still
    agree, and the impossible predicate must push into the scan rather
    than surface an error.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), _sum6("o_totalprice").alias("total_price"))
        .orderBy("o_orderstatus")
    )


QR55_SQL = f"""
SELECT o_orderstatus, count(*) AS n_orders,
       {_duck_sum6("o_totalprice")} AS total_price
FROM orders
WHERE o_orderdate < TIMESTAMP '1990-01-01'
GROUP BY 1 ORDER BY 1
"""


# --- Q-R56: recursive CTE inventory drawdown (Spark 4 WITH RECURSIVE) --------

def qr56_inventory_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped inventory drawdown per supplier over monthly 1997 demand —
    a GENUINE recurrence (bal_t = max(0, bal_{t-1} − demand_t)): the clamp
    makes it inexpressible as a window running sum, so this exercises
    Spark 4's WITH RECURSIVE for real, not as syntax sugar.

    Scale notes: the recursion runs over the AGGREGATED (supplier, month)
    series — 12 iterations of a tiny self-join, after one real aggregate
    over lineitem. Opening stock is half the supplier's own annual demand
    (scale-invariant: stockouts happen at every SF). All integer math.
    """
    li = _t(spark, sf_dir, "lineitem")
    li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).groupBy("l_suppkey", F.month("l_shipdate").alias("m")).agg(
        F.sum(_i6("l_quantity")).alias("qty6")
    ).createOrReplaceTempView("qr56_demand")
    return spark.sql(
        """
        WITH RECURSIVE
        tot AS (
          SELECT l_suppkey, CAST(sum(qty6) AS BIGINT) AS q_tot
          FROM qr56_demand GROUP BY 1
        ),
        spine AS (
          SELECT l_suppkey, explode(sequence(1, 12)) AS m FROM tot
        ),
        dense AS (
          SELECT s.l_suppkey, s.m, COALESCE(d.qty6, CAST(0 AS BIGINT)) AS qty6
          FROM spine s LEFT JOIN qr56_demand d
            ON d.l_suppkey = s.l_suppkey AND d.m = s.m
        ),
        bal(l_suppkey, m, remaining_micro) AS (
          SELECT l_suppkey, 0, q_tot DIV 2 FROM tot
          UNION ALL
          SELECT d.l_suppkey, d.m, GREATEST(CAST(0 AS BIGINT), b.remaining_micro - d.qty6)
          FROM bal b JOIN dense d ON d.l_suppkey = b.l_suppkey AND d.m = b.m + 1
        )
        SELECT l_suppkey, m, remaining_micro,
               remaining_micro = 0 AS stockout
        FROM bal WHERE m > 0
        ORDER BY l_suppkey, m
        """
    )


QR56_SQL = """
WITH RECURSIVE demand AS (
  SELECT l_suppkey, CAST(month(l_shipdate) AS INT) AS m,
         sum(CAST(round(l_quantity * 1000000) AS BIGINT)) AS qty6
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
tot AS (
  SELECT l_suppkey, CAST(sum(qty6) AS BIGINT) AS q_tot FROM demand GROUP BY 1
),
spine AS (
  SELECT l_suppkey, CAST(unnest(range(1, 13)) AS INT) AS m FROM tot
),
dense AS (
  SELECT s.l_suppkey, s.m, COALESCE(d.qty6, 0) AS qty6
  FROM spine s LEFT JOIN demand d
    ON d.l_suppkey = s.l_suppkey AND d.m = s.m
),
bal(l_suppkey, m, remaining_micro) AS (
  SELECT l_suppkey, 0, q_tot // 2 FROM tot
  UNION ALL
  SELECT d.l_suppkey, d.m, GREATEST(0, b.remaining_micro - d.qty6)
  FROM bal b JOIN dense d ON d.l_suppkey = b.l_suppkey AND d.m = b.m + 1
)
SELECT l_suppkey, CAST(m AS INT) AS m, CAST(remaining_micro AS BIGINT) AS remaining_micro,
       remaining_micro = 0 AS stockout
FROM bal WHERE m > 0
ORDER BY l_suppkey, m
"""


# --- Q-R57: error-safe arithmetic (try_*) in SQL pipe syntax -----------------

def qr57_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: try_divide / try_cast / try_add return
    NULL where strict evaluation would raise (÷0, bad cast, int64
    overflow) — written in Spark 4's SQL pipe syntax. The oracle emulates
    each try_* with its CASE-guarded equivalent.
    """
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("qr57_orders")
    # the 2-dp sum_div read is EXACT integer half-up on the micro-sum
    # ((x + 5000) div 10000), not a float ROUND: d's micro-sums live on a
    # 5000-grain grid, so the fixture's own group sums land exactly on
    # .xx5 midpoints where Spark (shortest-repr half-up) and DuckDB
    # (exact-binary) round() diverge (r8 area review — the one ROUND-tie
    # site the r7 conversion missed).
    return spark.sql(
        """
        FROM qr57_orders
        |> SELECT o_orderstatus,
             try_divide(o_totalprice, o_custkey % 3) AS d,
             try_cast(o_orderpriority AS INT) AS bad_cast,
             try_add(9223372036854775807, o_orderkey) AS overflowed
        |> AGGREGATE
             count(*) AS n,
             count(d) AS n_div_ok,
             (sum(CAST(round(d * 1000000) AS BIGINT)) + 5000) div 10000
               / CAST(100 AS DOUBLE) AS sum_div,
             count(bad_cast) AS n_cast_ok,
             count(overflowed) AS n_add_ok
           GROUP BY o_orderstatus
        |> ORDER BY o_orderstatus
        """
    )


QR57_SQL = """
WITH t AS (
  SELECT o_orderstatus,
         CASE WHEN o_custkey % 3 = 0 THEN NULL
              ELSE o_totalprice / (o_custkey % 3) END AS d,
         TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
         CASE WHEN o_orderkey = 0 THEN CAST(9223372036854775807 AS BIGINT)
              ELSE CAST(NULL AS BIGINT) END AS overflowed
  FROM orders
)
SELECT o_orderstatus,
       count(*) AS n,
       count(d) AS n_div_ok,
       ((sum(CAST(round(d * 1000000) AS BIGINT)) + 5000) // 10000) / 100.0 AS sum_div,
       count(bad_cast) AS n_cast_ok,
       count(overflowed) AS n_add_ok
FROM t GROUP BY 1 ORDER BY 1
"""


# --- Q-R58: collation-aware grouping (Spark 4 collations) --------------------

def qr58_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via a UTF8_LCASE collated key (Spark 4
    collations) — the engine-native alternative to lower()-normalizing
    every reference to a column. The input is the part-name corpus plus
    two synthesized case variants per row; a collated groupBy must merge
    all three spellings. The collated key itself is representative-
    nondeterministic, so the output reports min(name) as the canonical
    spelling instead; the oracle normalizes with lower().
    """
    base = _t(spark, sf_dir, "part").select("p_name")
    first_up = F.concat(
        F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
    ).alias("p_name")
    variants = (
        base.unionAll(base.select(F.upper("p_name").alias("p_name")))
        .unionAll(base.select(first_up))
    )
    return (
        variants.groupBy(F.collate("p_name", "UTF8_LCASE").alias("k"))
        .agg(F.min("p_name").alias("canon"), F.count("*").alias("n_variants"))
        .select("canon", "n_variants")
        .orderBy("canon")
    )


QR58_SQL = """
WITH v AS (
  SELECT p_name FROM part
  UNION ALL SELECT upper(p_name) FROM part
  UNION ALL SELECT upper(substr(p_name, 1, 1)) || substr(p_name, 2) FROM part
)
SELECT min(p_name) AS canon, count(*) AS n_variants
FROM v GROUP BY lower(p_name)
ORDER BY canon
"""


# --- Q-R59..Q-R69: TPC-H completion pack -------------------------------------
#
# The remaining 11 TPC-H query shapes (Q2, Q4, Q8, Q9, Q10, Q11, Q12, Q13,
# Q16, Q20, Q21), adapted to this star schema (no partsupp table; no
# commit/receipt dates — lateness is expressed vs o_orderdate). Each keeps
# the original query's OPERATOR shape — correlated min, EXISTS semi-join,
# share-of-total division, scalar-subquery HAVING, CASE-pivot, outer-join
# histogram, NOT-IN distinct count, nested-aggregate IN, double-correlated
# EXISTS/NOT EXISTS — because those shapes, not the literal predicates, are
# what the optimizer and the 100 TB design have to survive.


def qr59_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier within a region.

    No partsupp table, so supply cost is the observed average unit price
    per (part, supplier) from lineitem — exact scaled-int sums divided
    once at the end, so the cost value is partitioning-independent.

    Scale: the correlated `cost = (SELECT min(cost) ...)` of Q2 is a
    per-part argmin — here a row_number window over (p_partkey), a
    high-cardinality key that spreads across the cluster (no single hot
    partition). supplier/nation/region and the size-filtered part side
    are broadcast; the only big shuffle is the (part, supplier) partial
    aggregate, which map-side-combines on a uniform composite key.
    """
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_i6("l_extendedprice")).alias("price6"),
        F.sum(_i6("l_quantity")).alias("qty6"),
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    return (
        cost.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("unit_cost", scaled_round(F.col("price6") / F.col("qty6")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
        .orderBy("p_partkey")
    )


QR59_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS price6,
         sum(CAST(round(l_quantity * 1000000) AS BIGINT)) AS qty6
  FROM lineitem GROUP BY 1, 2
),
supp AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_name, s_name, n_name,
       CAST(round(CAST(price6 AS BIGINT) / CAST(qty6 AS BIGINT) * 10000) AS BIGINT) / 10000.0 AS unit_cost
FROM cost
JOIN supp ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
WHERE p_size = 15
QUALIFY row_number() OVER (
  PARTITION BY p_partkey
  ORDER BY round(CAST(price6 AS BIGINT) / CAST(qty6 AS BIGINT), 4), s_suppkey
) = 1
ORDER BY p_partkey
"""


def qr60_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority count gated by a correlated EXISTS.

    An order counts when at least one of its lineitems shipped more than
    30 days after the order date (the schema has no commit/receipt dates).

    Scale: left-semi join — Spark never materializes the multi-match
    blowup, and the date predicate on orders is pushed to the scan. The
    semi join shuffles on l_orderkey (uniform); the final aggregate is 5
    groups, collapsed map-side.
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


QR60_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY 1 ORDER BY 1
"""


def qr61_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's part-type revenue
    by year.

    Share of PROMO-part revenue delivered by NATION_3 suppliers to
    AMERICA-region customers, per order year. Numerator and denominator
    are exact scaled-int sums; ONE double division at the end.

    Scale: all five dimension sides (customer→nation→region, supplier→
    nation, part) broadcast; the fact table shuffles once for the
    2-group-per-year aggregate, which collapses map-side. The share is
    a conditional sum, not a second pass.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nation = _t(spark, sf_dir, "nation")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("s_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nation")
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    rev6 = _i6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("s_nation") == "NATION_3", rev6).otherwise(F.lit(0))).alias(
                "nation6"
            ),
            F.sum(rev6).alias("total6"),
        )
        .select(
            "o_year",
            scaled_round(F.col("nation6") / F.col("total6")).alias("mkt_share"),
            scaled_round(F.col("total6") / SCALE6, 2).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


QR61_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)
                 ELSE 0 END) AS BIGINT)
             / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT)
             * 10000) AS BIGINT) / 10000.0 AS mkt_share,
       CAST(round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT)
             / 1000000.0 * 100) AS BIGINT) / 100.0 AS total_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


def qr62_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year.

    No partsupp.ps_supplycost, so cost is modeled as 60% of the part's
    retail price per unit: profit = extprice*(1-disc) - 0.6*retail*qty.
    All money terms go through the ×1e6 scaled-int path so the sum is
    exact under any partitioning.

    Scale: part (name-filtered) and supplier→nation broadcast; one fact
    shuffle into a (nation, year) aggregate that collapses map-side.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    profit6 = _i6(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - _i6(
        F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(scaled_round(F.sum(profit6) / SCALE6, 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


QR62_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(CAST(sum(
         CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)
         - CAST(round(0.6 * p_retailprice * l_quantity * 1000000) AS BIGINT)
       ) AS BIGINT) / 1000000.0 * 100) AS BIGINT) / 100.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def qr63_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.

    Scale: the quarter filter prunes orders at the scan; customer and
    nation broadcast against the filtered fact; the top-20 is
    TakeOrderedAndProject over the (already small) per-customer
    aggregate — never a global sort.
    """
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_sum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


QR63_SQL = f"""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
       {_duck_sum6("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, c_acctbal, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def qr64_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a threshold
    derived from a scalar aggregate over the whole table.

    Threshold is RELATIVE (1.6x the average per-part value), so the
    query is meaningful at every scale factor; the comparison
    `v6 * n * 10 > 16 * t6` is pure int64 — no float boundary flips.

    Scale: two aggregates over the same shuffled per-part frame (Spark
    reuses the exchange); the 1-row total broadcasts back. HAVING on a
    scalar subquery never materializes a join.
    """
    li = _t(spark, sf_dir, "lineitem")
    value = li.groupBy("l_partkey").agg(
        F.sum(_i6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("v6")
    )
    total = value.agg(F.sum("v6").alias("t6"), F.count("*").alias("n_parts"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("v6") * F.col("n_parts") * 10 > 16 * F.col("t6"))
        .select("l_partkey", scaled_round(F.col("v6") / SCALE6, 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


QR64_SQL = """
WITH v AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS v6
  FROM lineitem GROUP BY 1
),
t AS (SELECT CAST(sum(v6) AS BIGINT) AS t6, count(*) AS n_parts FROM v)
SELECT l_partkey, CAST(round(CAST(v6 AS BIGINT) / 1000000.0 * 100) AS BIGINT) / 100.0 AS part_value
FROM v, t
WHERE CAST(v6 AS BIGINT) * n_parts * 10 > 16 * t6
ORDER BY part_value DESC, l_partkey
"""


def qr65_shipping_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class counts pivoted over a lateness
    bucket (no shipmode column; the bucket is days from order to ship).

    Scale: single fact-fact join shuffles on orderkey; the CASE pivot
    collapses to 3 groups map-side. Date filter pushed to the lineitem
    scan.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (
        F.when(lag > 90, "3-LATE").when(lag > 30, "2-SLOW").otherwise("1-FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


QR65_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90 THEN '3-LATE'
            WHEN datediff('day', o_orderdate, l_shipdate) > 30 THEN '2-SLOW'
            ELSE '1-FAST' END AS ship_speed,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


def qr66_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts, keeping
    zero-order customers via a filtered LEFT join.

    The join-level filter (priority != '5-LOW') must live in the JOIN
    condition, not a WHERE — moving it to WHERE would silently drop the
    zero-order customers (the classic outer-join-filter bug this query
    exists to catch).

    Scale: two-level aggregate; the first groups on c_custkey (high
    cardinality, uniform), the second on the tiny count domain — both
    collapse map-side. Orders side prunes to 2 columns at the scan.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


QR66_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


def qr67_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    combo, with an excluded brand and a NOT-IN supplier blacklist.

    Supplier-part relationships come from observed lineitem pairs (no
    partsupp); the blacklist is suppliers with negative account balance
    (Q16's complaint filter).

    Scale: distinct (part, supplier) collapses the fact table first
    (map-side partial distinct); the blacklist is a broadcast anti-join;
    count(DISTINCT) runs as a two-phase expand aggregate on uniform keys.
    """
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#11")
        & F.col("p_size").isin(5, 15, 25, 35, 45)
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), pairs.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


QR67_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11'
  AND p_size IN (5, 15, 25, 35, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def qr68_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers selected by membership in a nested
    aggregate subquery (shipped PROMO volume above 1.2x the per-supplier
    average in 1998).

    The relative threshold keeps the query meaningful at every SF, and
    the comparison `q6 * n * 10 > 12 * t6` stays in exact int64.

    Scale: the inner aggregate shuffles the (part-filtered, date-pruned)
    fact once on l_suppkey; its 1-row total broadcasts back; the outer
    membership is a broadcast semi-join into the tiny supplier dim.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    promo = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    shipped = (
        li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_i6("l_quantity")).alias("q6"))
    )
    total = shipped.agg(F.sum("q6").alias("t6"), F.count("*").alias("n_supp"))
    heavy = (
        shipped.crossJoin(F.broadcast(total))
        .where(F.col("q6") * F.col("n_supp") * 10 > 12 * F.col("t6"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


QR68_SQL = """
WITH shipped AS (
  SELECT l_suppkey, sum(CAST(round(l_quantity * 1000000) AS BIGINT)) AS q6
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate < TIMESTAMP '1999-01-01'
  GROUP BY 1
),
t AS (SELECT CAST(sum(q6) AS BIGINT) AS t6, count(*) AS n_supp FROM shipped)
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM shipped, t
  WHERE CAST(q6 AS BIGINT) * n_supp * 10 > 12 * t6
)
ORDER BY s_suppkey
"""


def qr69_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finalized order (correlated EXISTS + NOT EXISTS on
    the same fact table).

    Late = shipped >60 days after the order date (no receipt/commit
    dates in this schema).

    Scale: the EXISTS is a left-semi and the NOT EXISTS a left-anti
    join, both on l_orderkey — uniform key, map-side-prunable; the
    distinct (orderkey, suppkey) frames collapse before joining. No
    window, no blowup; the count per supplier is a tiny final aggregate.
    """
    orders_f = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = pairs.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = (
        late.join(
            l2,
            (late.l_orderkey == l2.o2) & (late.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (late.l_orderkey == l3.o3) & (late.l_suppkey != l3.s3),
            "left_anti",
        )
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(10)
    )


QR69_SQL = """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
),
pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM pairs l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""


# --- qr70: schema evolution across parquet file generations ------------------


def qr70_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read one logical table across two parquet GENERATIONS: v1 files
    written before a column existed, v2 files carrying the new
    ``o_channel`` column — unified by ``mergeSchema=true`` so v1 rows
    surface NULL for the late-added column (the additive-evolution
    contract every long-lived lake table relies on).

    The generations are derived deterministically from the orders view
    (even keys = v1, odd keys = v2 with a key-hash channel) and written
    to a scratch dir at query time; the oracle replays the SEMANTICS
    from the same view, so the gate checks that the merged scan is
    byte-equivalent to never having split the schema at all.

    Scale: mergeSchema reconciles footers at planning time (driver-side,
    per-file metadata only — at 100 TB pair it with a fixed table schema
    or a catalog to avoid footer-sampling ALL files); the scan itself
    stays one pruned columnar read, NULL-filling v1 batches for free.
    """
    import os

    from streamsurfer_spark.scratch import scratch_dir

    orders = _t(spark, sf_dir, "orders")
    tmp = scratch_dir("qr70_generations_")
    v1 = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    v2 = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, "web")
        .when(F.col("o_orderkey") % 3 == 1, "store")
        .otherwise("partner")
        .alias("o_channel"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(tmp, "g=1"))
    v2.write.mode("overwrite").parquet(os.path.join(tmp, "g=2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(tmp)
    )
    return (
        merged.groupBy(F.coalesce(F.col("o_channel"), F.lit("pre-migration")).alias("channel"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)")).alias(
                "total_cents"
            ),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("channel")
    )


QR70_SQL = """
SELECT coalesce(CASE WHEN o_orderkey % 2 = 1 THEN
                  CASE WHEN o_orderkey % 3 = 0 THEN 'web'
                       WHEN o_orderkey % 3 = 1 THEN 'store'
                       ELSE 'partner' END
                END, 'pre-migration') AS channel,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY 1
ORDER BY 1
"""


# --- qr71: approx-quantile sketch with exact-twin rank-tolerance gate --------

QR71_ACC = 1000  # GK sketch accuracy: rank error <= n/ACC


def qr71_approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approx_percentile — the mergeable sketch that
    replaces per-group sorts at scale — gated by its exact twin, the qr08
    pattern for quantiles: the sketch VALUE is engine-specific, but any
    valid GK sketch guarantees rank error ≤ n/accuracy, so the hashable
    contract is (exact percentile, n, within-rank-tolerance flag). The
    rank INTERVAL of each approx value is measured exactly (two
    conditional sums against the broadcast probe values) and checked as
    pure integer arithmetic: with tol = 100·n div ACC + 100,
    100·(r_lt+1) − q·n ≤ tol AND q·n − 100·r_le ≤ tol. A sketch
    regression flips the flag and fails the hash.

    The audit is DUPLICATE-AWARE (r10 deep-fuzz find): a value v that
    appears m times occupies the whole rank interval
    [count(x < v) + 1, count(x ≤ v)], so the target rank q·n/100 is
    checked against that interval, not against the upper endpoint alone.
    The upper-endpoint form failed on ties — 3 copies of one price put
    count(≤) at rank 3 while the q50 target is 1.5, flipping the flag on
    a perfectly valid sketch. Fixture prices are near-unique, so eight
    rounds of gate evidence never produced a tie at a probe value; the
    cents-exact fuzz frames hit it immediately.

    Scale: the sketch aggregate is one map-side-mergeable pass (no
    per-group sort); the rank audit is a second scan against ≤ 3·groups
    broadcast rows (two conditional sums instead of one — same shape);
    exact percentiles (the twin) are the only per-group sort and exist
    purely as ground truth.
    """
    li = _t(spark, sf_dir, "lineitem")
    # exact twin uses DISCRETE percentiles (actual data values, no
    # interpolation) — bit-identical across engines, no rounding fragility
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr(
            f"approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), {QR71_ACC})"
        ).alias("av"),
        F.array(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)"),
        ).alias("ev"),
    )
    probes = agg.select(
        "l_returnflag",
        "n",
        F.explode(
            F.expr("arrays_zip(array(50L, 90L, 99L), av, ev)")
        ).alias("z"),
    ).select(
        "l_returnflag",
        "n",
        F.col("z.0").alias("qpct"),
        F.col("z.av").alias("approx_v"),
        F.col("z.ev").alias("exact_value"),
    )
    ranks = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(probes), "l_returnflag")
        .groupBy("l_returnflag", "qpct", "n", "exact_value")
        .agg(
            F.sum((F.col("l_extendedprice") <= F.col("approx_v")).cast("long")).alias(
                "r_le"
            ),
            F.sum((F.col("l_extendedprice") < F.col("approx_v")).cast("long")).alias(
                "r_lt"
            ),
        )
    )
    # target q·n must sit within tol of the approx value's rank interval
    # [r_lt + 1, r_le] (×100 to stay in integers): not more than tol
    # BELOW the interval start, not more than tol ABOVE the interval end.
    # The interval start is count(<v) + 1 — the FIRST rank the value
    # occupies — matching the docstring exactly (r10 ADVICE: the earlier
    # 100·r_lt form was one rank more lenient on the low side than
    # documented); the +100 in tol already absorbs the integer-division
    # floor, so no extra slack is needed or kept.
    tol = F.expr(f"(100 * n) div {QR71_ACC}") + F.lit(100)
    return ranks.select(
        "l_returnflag",
        "qpct",
        "n",
        "exact_value",
        (
            (F.lit(100) * (F.col("r_lt") + F.lit(1)) - F.col("qpct") * F.col("n") <= tol)
            & (F.col("qpct") * F.col("n") - F.lit(100) * F.col("r_le") <= tol)
        ).alias("within_tol"),
    ).orderBy("l_returnflag", "qpct")


QR71_SQL = """
WITH g AS (
    SELECT l_returnflag, count(*) AS n,
           quantile_disc(l_extendedprice, 0.5) AS e50,
           quantile_disc(l_extendedprice, 0.9) AS e90,
           quantile_disc(l_extendedprice, 0.99) AS e99
    FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(q.qpct AS BIGINT) AS qpct, n,
       CASE q.qpct WHEN 50 THEN e50 WHEN 90 THEN e90 ELSE e99 END AS exact_value,
       TRUE AS within_tol
FROM g CROSS JOIN (VALUES (50), (90), (99)) AS q(qpct)
ORDER BY l_returnflag, qpct
"""


# --- qr72: winsorized robust statistics per group ----------------------------


def qr72_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clamped) per-group statistics: values are
    clamped to the group's DISCRETE p05/p95 (actual data values — bit
    identical across engines, see qr71) and the robust mean is computed
    over exact integer cents. The standard defense before any mean-based
    monitoring at corpus scale, where a single corrupt row can drag a
    plain average arbitrarily.

    Shape: pass 1 computes the two cut points per group (the only
    per-group sort); the ≤ |groups| cut rows broadcast back to pass 2,
    which is one conditional-sum scan — no row-level sort or window.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
    )
    cuts = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.expr("cast(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) as bigint)").alias(
            "lo_cents"
        ),
        F.expr("cast(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) as bigint)").alias(
            "hi_cents"
        ),
    )
    clamped = F.greatest(F.col("lo_cents"), F.least(F.col("hi_cents"), F.col("cents")))
    return (
        li.join(F.broadcast(cuts), "l_returnflag")
        .groupBy("l_returnflag", "n_rows", "lo_cents", "hi_cents")
        .agg(
            F.sum(clamped).alias("win_sum_cents"),
            F.sum((F.col("cents") < F.col("lo_cents")).cast("long")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("cents") > F.col("hi_cents")).cast("long")).alias(
                "n_clipped_high"
            ),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "lo_cents",
            "hi_cents",
            "n_clipped_low",
            "n_clipped_high",
            scaled_round(F.col("win_sum_cents") / F.col("n_rows") / 100.0).alias(
                "win_mean"
            ),
        )
        .orderBy("l_returnflag")
    )


QR72_SQL = """
WITH li AS (
    SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
),
cuts AS (
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(quantile_disc(cents, 0.05) AS BIGINT) AS lo_cents,
           CAST(quantile_disc(cents, 0.95) AS BIGINT) AS hi_cents
    FROM li GROUP BY 1
)
SELECT li.l_returnflag, c.n_rows, c.lo_cents, c.hi_cents,
       CAST(sum(CASE WHEN li.cents < c.lo_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_low,
       CAST(sum(CASE WHEN li.cents > c.hi_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_high,
       CAST(round(CAST(sum(greatest(c.lo_cents, least(c.hi_cents, li.cents))) AS BIGINT)
             / c.n_rows / 100.0 * 10000) AS BIGINT) / 10000.0 AS win_mean
FROM li JOIN cuts c USING (l_returnflag)
GROUP BY 1, 2, 3, 4
ORDER BY 1
"""


# --- Q-R73: recursive CTE hierarchy rollup (Spark 4 WITH RECURSIVE) ----------

def qr73_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup over a synthetic decimal-digit hierarchy
    (parent(key) = key div 10, root 0) — the transitive-closure shape
    (org charts, category trees, bill-of-materials) expressed with
    Spark 4's native WITH RECURSIVE instead of a hand-rolled driver
    loop. Each customer contributes its exact-cents balance to every
    ancestor node; nodes with ≥ 5 descendants are reported.

    Scale shape (100 TB): the recursion depth is log10(max key) — ~10
    map-only iterations each a projection + union, never a join; the
    ancestor fan-out is depth ≤ 10 rows per customer. The rollup
    groupBy's hot key (node 0 holds EVERY customer) is an AGGREGATION
    hot key, absorbed by map-side partial aggregation — not a join hot
    key, so no salting is needed. Balance math is exact cents (stored
    2-dp column), never a float sum.
    """
    load_tables(spark, sf_dir)
    return spark.sql(QR73_SQL.replace(" // ", " div "))


# one string, two engines: DuckDB runs it verbatim (// integer div);
# Spark runs it with div substituted — the recursion, cents math, and
# HAVING threshold are otherwise identical ANSI SQL on both.
QR73_SQL = """
WITH RECURSIVE anc(custkey, node, depth) AS (
    SELECT c_custkey, c_custkey, 0 FROM customer
    UNION ALL
    SELECT custkey, node // 10, depth + 1 FROM anc WHERE node > 0
)
SELECT node,
       CAST(count(*) AS BIGINT) AS n_desc,
       CAST(max(depth) AS INT) AS max_depth,
       CAST(sum(bal_cents) AS BIGINT) AS bal_cents
FROM anc JOIN (
    SELECT c_custkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
) c ON c.c_custkey = anc.custkey
GROUP BY node
HAVING count(*) >= 5
ORDER BY node
"""


QUERIES: dict[str, QuerySpec] = {
    "qr01_scan_checksum": QuerySpec(qr01_scan_checksum, QR01_SQL, "Q-R1 parquet scan checksum"),
    "qr02_filter_agg": QuerySpec(qr02_filter_agg, QR02_SQL, "Q-R2 filter+project+agg (Q6 shape)"),
    "qr03_join_orders_customer": QuerySpec(qr03_join_orders_customer, QR03_SQL, "Q-R3 broadcast equi-join"),
    "qr04_multiway_join": QuerySpec(qr04_multiway_join, QR04_SQL, "Q-R4 star join (Q5 shape)"),
    "qr05_left_join_histogram": QuerySpec(qr05_left_join_histogram, QR05_LEFT_SQL, "Q-R5 left join"),
    "qr05_semi_join": QuerySpec(qr05_semi_join, QR05_SEMI_SQL, "Q-R5 left-semi join"),
    "qr05_anti_join": QuerySpec(qr05_anti_join, QR05_ANTI_SQL, "Q-R5 left-anti join"),
    "qr06_hash_agg_q1": QuerySpec(qr06_hash_agg_q1, QR06_SQL, "Q-R6 hash aggregate (Q1 shape)"),
    "qr07_count_distinct": QuerySpec(qr07_count_distinct, QR07_SQL, "Q-R7 count distinct"),
    "qr08_approx_count_distinct": QuerySpec(qr08_approx_count_distinct, QR08_SQL, "Q-R8 HLL++ approx distinct, exact-twin tolerance gate"),
    "qr09_rollup": QuerySpec(qr09_rollup, QR09_SQL, "Q-R9 rollup"),
    "qr10_window_rank": QuerySpec(qr10_window_rank, QR10_SQL, "Q-R10 window ranking"),
    "qr11_window_running": QuerySpec(qr11_window_running, QR11_SQL, "Q-R11 window frame analytics"),
    "qr12_topk": QuerySpec(qr12_topk, QR12_SQL, "Q-R12 distributed top-k"),
    "qr13_union": QuerySpec(qr13_union, QR13_UNION_SQL, "Q-R13 union distinct"),
    "qr13_intersect": QuerySpec(qr13_intersect, QR13_INTERSECT_SQL, "Q-R13 intersect"),
    "qr13_except": QuerySpec(qr13_except, QR13_EXCEPT_SQL, "Q-R13 except"),
    "qr14_string_fns": QuerySpec(qr14_string_fns, QR14_SQL, "Q-R14 string function pack"),
    "qr15_date_fns": QuerySpec(qr15_date_fns, QR15_SQL, "Q-R15 date function pack"),
    "qr16_math_decimal": QuerySpec(qr16_math_decimal, QR16_SQL, "Q-R16 math/decimal pack"),
    "qr17_array_fns": QuerySpec(qr17_array_fns, QR17_SQL, "Q-R17 array higher-order functions"),
    "qr18_subqueries": QuerySpec(qr18_subqueries, QR18_SQL, "Q-R18 scalar/IN/EXISTS subqueries"),
    "qr19_case_when": QuerySpec(qr19_case_when, QR19_SQL, "Q-R19 conditional expressions"),
    "qr20_pivot": QuerySpec(qr20_pivot, QR20_SQL, "Q-R20 pivot with pinned values"),
    "qr21_percentiles": QuerySpec(qr21_percentiles, QR21_SQL, "Q-R21 exact percentiles"),
    "qr22_histogram": QuerySpec(qr22_histogram, QR22_SQL, "Q-R22 histogram binning"),
    "qr09b_cube": QuerySpec(qr09b_cube, QR09B_SQL, "Q-R9 cube + grouping id"),
    "qr10b_window_analytics": QuerySpec(
        qr10b_window_analytics, QR10B_SQL, "Q-R10 ntile/percent_rank/cume_dist"
    ),
    "qr23_levenshtein_pairs": QuerySpec(
        qr23_levenshtein_pairs, QR23_SQL, "Q-R23 blocked edit-distance pairs"
    ),
    "qr24_bit_and_array_ops": QuerySpec(
        qr24_bit_and_array_ops, QR24_SQL, "Q-R24 bit aggregates + array normalize"
    ),
    "qr25_full_outer_join": QuerySpec(
        qr25_full_outer_join, QR25_SQL, "Q-R25 full outer join with two-sided misses"
    ),
    "qr26_stats_pack": QuerySpec(
        qr26_stats_pack, QR26_SQL, "Q-R26 stddev/var/corr/covar/regr aggregates"
    ),
    "qr27_string_agg": QuerySpec(
        qr27_string_agg, QR27_SQL, "Q-R27 ordered string aggregation (listagg)"
    ),
    "qr28_filtered_agg": QuerySpec(
        qr28_filtered_agg, QR28_SQL, "Q-R28 FILTER-clause conditional aggregates"
    ),
    "qr29_range_frame": QuerySpec(
        qr29_range_frame, QR29_SQL, "Q-R29 RANGE frame trailing-30-day window"
    ),
    "qr30_arg_extrema": QuerySpec(
        qr30_arg_extrema, QR30_SQL, "Q-R30 argmax/argmin via struct extrema"
    ),
    "qr31_null_semantics": QuerySpec(
        qr31_null_semantics, QR31_SQL, "Q-R31 coalesce/nullif/nvl2/null-safe equality"
    ),
    "qr32_unpivot": QuerySpec(qr32_unpivot, QR32_SQL, "Q-R32 unpivot wide→long + re-agg"),
    "qr33_posexplode": QuerySpec(
        qr33_posexplode, QR33_SQL, "Q-R33 positional explode with ordinality"
    ),
    "qr34_timezone_pack": QuerySpec(
        qr34_timezone_pack, QR34_SQL, "Q-R34 IANA timezone conversion local-hour histogram"
    ),
    "qr35_lambda_pack": QuerySpec(
        qr35_lambda_pack, QR35_SQL, "Q-R35 higher-order lambdas: filter/exists/forall/slice/zip_with"
    ),
    "qr36_lateral_topk": QuerySpec(
        qr36_lateral_topk, QR36_SQL, "Q-R36 LATERAL correlated top-k per outer row"
    ),
    "qr37_salted_join": QuerySpec(
        qr37_salted_join, QR37_SQL, "Q-R37 skew-salted join ≡ plain join"
    ),
    "qr38_shipping_priority": QuerySpec(
        qr38_shipping_priority, QR38_SQL, "Q-R38 TPC-H Q3 shape: 3-way join + top-10"
    ),
    "qr39_large_volume_customers": QuerySpec(
        qr39_large_volume_customers, QR39_SQL, "Q-R39 TPC-H Q18 shape: HAVING-filtered join-back"
    ),
    "qr40_scd2_intervals": QuerySpec(
        qr40_scd2_intervals, QR40_SQL, "Q-R40 SCD2 versioned intervals from a change feed"
    ),
    "qr41_dormant_customers": QuerySpec(
        qr41_dormant_customers, QR41_SQL, "Q-R41 TPC-H Q22 shape: scalar subquery + NOT EXISTS"
    ),
    "qr42_upsert_snapshot": QuerySpec(
        qr42_upsert_snapshot, QR42_SQL, "Q-R42 full-row upsert (anti-join + union MERGE)"
    ),
    "qr43_cdc_apply": QuerySpec(
        qr43_cdc_apply, QR43_SQL, "Q-R43 CDC apply: latest-wins collapse + upsert + delete"
    ),
    "qr44_profile_orders": QuerySpec(
        qr44_profile_orders, QR44_SQL, "Q-R44 one-pass per-column table profile"
    ),
    "qr45_window_value_fns": QuerySpec(
        qr45_window_value_fns, QR45_SQL, "Q-R45 first/last/nth_value with pinned frames"
    ),
    "qr46_disjunctive_join": QuerySpec(
        qr46_disjunctive_join, QR46_SQL, "Q-R46 TPC-H Q19 shape: OR-of-ANDs predicate join"
    ),
    "qr47_promo_share": QuerySpec(
        qr47_promo_share, QR47_SQL, "Q-R47 TPC-H Q14 shape: conditional revenue share"
    ),
    "qr48_nation_volume": QuerySpec(
        qr48_nation_volume, QR48_SQL, "Q-R48 TPC-H Q7 shape: 6-table bi-nation volume"
    ),
    "qr49_except_all": QuerySpec(
        qr49_except_all, QR49_EXCEPT_ALL_SQL, "Q-R49 multiset EXCEPT ALL"
    ),
    "qr49_intersect_all": QuerySpec(
        qr49_intersect_all, QR49_INTERSECT_ALL_SQL, "Q-R49 multiset INTERSECT ALL"
    ),
    "qr50_expectations_orders": QuerySpec(
        qr50_expectations_orders, QR50_SQL, "Q-R50 declarative data-quality expectations"
    ),
    "qr51_grouping_sets": QuerySpec(
        qr51_grouping_sets, QR51_SQL, "Q-R51 irregular GROUPING SETS lattice"
    ),
    "qr52_variant_props": QuerySpec(
        qr52_variant_props, QR52_SQL, "Q-R52 VariantType parse-once semi-structured access"
    ),
    "qr53_small_quantity_revenue": QuerySpec(
        qr53_small_quantity_revenue, QR53_SQL, "Q-R53 TPC-H Q17 shape: decorrelated threshold"
    ),
    "qr54_top_supplier": QuerySpec(
        qr54_top_supplier, QR54_SQL, "Q-R54 TPC-H Q15 shape: exact-int argmax equality"
    ),
    "qr55_empty_result": QuerySpec(
        qr55_empty_result, QR55_SQL, "Q-R55 empty-result schema/hash parity"
    ),
    "qr56_inventory_drawdown": QuerySpec(
        qr56_inventory_drawdown, QR56_SQL, "Q-R56 recursive CTE clamped inventory drawdown"
    ),
    "qr57_try_arithmetic": QuerySpec(
        qr57_try_arithmetic, QR57_SQL, "Q-R57 try_* error-safe arithmetic via SQL pipe syntax"
    ),
    "qr58_collated_grouping": QuerySpec(
        qr58_collated_grouping, QR58_SQL, "Q-R58 UTF8_LCASE collated grouping"
    ),
    "qr59_min_cost_supplier": QuerySpec(
        qr59_min_cost_supplier, QR59_SQL, "Q-R59 TPC-H Q2 shape: per-part argmin supplier in region"
    ),
    "qr60_priority_lateness": QuerySpec(
        qr60_priority_lateness, QR60_SQL, "Q-R60 TPC-H Q4 shape: correlated EXISTS priority count"
    ),
    "qr61_market_share": QuerySpec(
        qr61_market_share, QR61_SQL, "Q-R61 TPC-H Q8 shape: national market share by year"
    ),
    "qr62_product_profit": QuerySpec(
        qr62_product_profit, QR62_SQL, "Q-R62 TPC-H Q9 shape: profit by nation and year"
    ),
    "qr63_returned_items": QuerySpec(
        qr63_returned_items, QR63_SQL, "Q-R63 TPC-H Q10 shape: top-20 returned-item customers"
    ),
    "qr64_important_parts": QuerySpec(
        qr64_important_parts, QR64_SQL, "Q-R64 TPC-H Q11 shape: scalar-subquery HAVING threshold"
    ),
    "qr65_shipping_speed": QuerySpec(
        qr65_shipping_speed, QR65_SQL, "Q-R65 TPC-H Q12 shape: lateness-bucket CASE pivot"
    ),
    "qr66_customer_distribution": QuerySpec(
        qr66_customer_distribution, QR66_SQL, "Q-R66 TPC-H Q13 shape: outer-join order-count histogram"
    ),
    "qr67_supplier_part_counts": QuerySpec(
        qr67_supplier_part_counts, QR67_SQL, "Q-R67 TPC-H Q16 shape: NOT-IN distinct supplier counts"
    ),
    "qr68_promotable_suppliers": QuerySpec(
        qr68_promotable_suppliers, QR68_SQL, "Q-R68 TPC-H Q20 shape: nested-aggregate IN membership"
    ),
    "qr69_waiting_suppliers": QuerySpec(
        qr69_waiting_suppliers, QR69_SQL, "Q-R69 TPC-H Q21 shape: sole-late EXISTS/NOT-EXISTS"
    ),
    "qr70_schema_evolution": QuerySpec(
        qr70_schema_evolution,
        QR70_SQL,
        "mergeSchema read across parquet generations (late-added column)",
    ),
    "qr71_approx_quantile_gate": QuerySpec(
        qr71_approx_quantile_gate,
        QR71_SQL,
        "GK approx-percentile sketch vs exact twin (rank-tolerance gate)",
    ),
    "qr72_winsorized_stats": QuerySpec(
        qr72_winsorized_stats,
        QR72_SQL,
        "winsorized robust stats: discrete p05/p95 clamp, exact-int mean",
    ),
    "qr73_hierarchy_rollup": QuerySpec(
        qr73_hierarchy_rollup,
        QR73_SQL,
        "Spark 4 WITH RECURSIVE subtree rollup, exact-cents",
    ),
}
