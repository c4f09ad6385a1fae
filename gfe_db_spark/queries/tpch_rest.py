"""The seven TPC-H shapes whose verbatim form needs columns the synthetic
star schema lacks (partsupp / shipmode / comment), adapted to the columns
that do exist. What each query preserves is the SHAPE — the plan-level
structure the optimizer must handle — not the TPC-H literal:

- Q2  → per-group scalar-min correlated subquery joined back
- Q9  → profit expression over a 5-table join with a LIKE filter,
        grouped by (nation, year)
- Q11 → group HAVING sum > fraction × global scalar subquery
- Q12 → conditional counting (CASE in SUM) by class after a fact join
- Q16 → count(DISTINCT supplier) per attribute group with a NOT IN
        exclusion subquery
- Q20 → nested semi-join chain gated by a per-(part,supplier) HAVING
- Q21 → correlated EXISTS + NOT EXISTS self-joins on the fact table

Scale notes (100 TB design):
- Q21's double correlated EXISTS is decorrelated into ONE per-order
  aggregate (distinct suppliers, distinct late suppliers) reused for both
  the EXISTS and the NOT EXISTS — a single shuffle on l_orderkey instead
  of two self-joins of the fact table with itself;
- Q11/Q12/Q16's scalar subqueries are 1-row broadcast joins;
- Q2's per-group min is an aggregate join-back co-partitioned on the
  group key, not a window over the full table;
- Q20's HAVING aggregate shuffles on (l_partkey, l_suppkey) once; the
  name-filtered part dim is broadcast into the semi-join.

Determinism: decimal-routed double sums (`_dsum`), unique ORDER BY
tie-breaks, BIGINT casts on both engine and oracle sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfe_db_spark.queries import QuerySpec
from gfe_db_spark.sources.tables import table


def _dsum(col, scale: int = 8):
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def q2_min_price_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated per-group scalar-min subquery. For each part
    type, the part(s) achieving the type's minimum retail price."""
    part = table(spark, sf_dir, "part")
    min_rp = part.groupBy(F.col("p_type").alias("mt_type")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            min_rp,
            (part.p_type == min_rp.mt_type)
            & (part.p_retailprice == min_rp.min_price),
        )
        .select("p_type", "p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


Q2_SQL = """
SELECT p_type, p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                       WHERE p2.p_type = p.p_type)
ORDER BY p_type, p_partkey
"""


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit expression over lineitem⋈orders⋈supplier⋈nation⋈part
    with a LIKE filter on part name, grouped by (supplier nation, year).
    Cost term adapted to 10% of retail price × quantity (no partsupp)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity
                AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


def q11_important_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: group HAVING sum > fraction × global sum (scalar
    subquery). Nations holding more than 4% of total supplier balance."""
    supp = table(spark, sf_dir, "supplier")
    by_nation = supp.groupBy(F.col("s_nationkey").cast("long").alias("s_nationkey")).agg(
        _dsum("s_acctbal").alias("total_bal")
    )
    threshold = supp.agg((_dsum("s_acctbal") * F.lit(0.04)).alias("threshold"))
    return (
        by_nation.join(F.broadcast(threshold))
        .filter(F.col("total_bal") > F.col("threshold"))
        .select("s_nationkey", "total_bal")
        .orderBy(F.desc("total_bal"), "s_nationkey")
    )


Q11_SQL = """
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_bal
FROM supplier
GROUP BY s_nationkey
HAVING CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) >
       (SELECT CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) * 0.04
        FROM supplier)
ORDER BY total_bal DESC, s_nationkey
"""


def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counting (CASE inside SUM) after a fact join,
    grouped by line status (stand-in for ship mode)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q16_supplier_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: count(DISTINCT supplier) per part-attribute group, with a
    NOT IN exclusion subquery (suppliers in deficit stand in for the
    complaint list)."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_quantity_threshold_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-join chain — suppliers who shipped more than a
    threshold quantity of a name-matched part within a year window."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    supp = table(spark, sf_dir, "supplier")
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(_dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 50)
        .select("l_suppkey")
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
  HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) > 50
)
ORDER BY s_suppkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: correlated EXISTS + NOT EXISTS self-joins — the supplier
    that was the SOLE late shipper on a multi-supplier order ("late" =
    shipped >60 days after the order date).

    Decorrelated: ONE per-order aggregate (single scan of lineitem, single
    shuffle on l_orderkey) computes the distinct-supplier count and the
    distinct SET of late suppliers; the EXISTS becomes n_supp > 1 and the
    NOT EXISTS becomes size(late set) == 1, and the sole late supplier is
    read out of the set — no join back to the fact table at all. At 100 TB
    this replaces two fact×fact self-joins with one co-partitioned
    aggregate (the set is bounded by suppliers-per-order, a small number).
    """
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_supps"),
    )
    sole_late = (
        per_order.filter((F.col("n_supp") > 1) & (F.size("late_supps") == 1))
        .select(F.element_at("late_supps", 1).alias("l_suppkey"))
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1 JOIN orders o1 ON l1.l_orderkey = o1.o_orderkey
  WHERE l1.l_shipdate > o1.o_orderdate + INTERVAL 60 DAY
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
) w JOIN supplier ON w.l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


QUERIES: dict[str, QuerySpec] = {
    "q2_min_price_part": QuerySpec(q2_min_price_part, Q2_SQL, "per-group min join-back"),
    "q9_profit_by_nation_year": QuerySpec(
        q9_profit_by_nation_year, Q9_SQL, "5-way join profit by nation/year"
    ),
    "q11_important_balance": QuerySpec(
        q11_important_balance, Q11_SQL, "HAVING vs global scalar subquery"
    ),
    "q12_priority_class": QuerySpec(q12_priority_class, Q12_SQL, "conditional counting"),
    "q16_supplier_count_distribution": QuerySpec(
        q16_supplier_count_distribution, Q16_SQL, "distinct-count with NOT IN"
    ),
    "q20_quantity_threshold_suppliers": QuerySpec(
        q20_quantity_threshold_suppliers, Q20_SQL, "nested semi-join chain"
    ),
    "q21_waiting_suppliers": QuerySpec(
        q21_waiting_suppliers, Q21_SQL, "decorrelated EXISTS/NOT-EXISTS self-join"
    ),
}
