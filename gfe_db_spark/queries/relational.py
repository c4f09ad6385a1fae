"""Relational operator inventory (SURVEY.md §2.2-2.7) over the synthetic
star schema.

Every query name maps to the reference operator it re-expresses; citations
point at the reference implementation (gfe-db @ /root/reference) the way the
survey does. Spark side uses the DataFrame API (Catalyst-planned); oracle
side is ANSI SQL for DuckDB.

Determinism rules for oracle parity (driver hashes values):
- double aggregates are computed as exact decimal sums then cast to double,
  so summation order (which differs across engines/partitions) cannot change
  the result;
- top-k selections always carry a unique tie-break key;
- computed integer columns are cast to long/BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gfe_db_spark.queries import QuerySpec
from gfe_db_spark.sources.tables import table


def _dsum(col, scale: int = 8):
    """Order-insensitive exact sum of a double column: route through decimal.

    Per-row double→decimal conversion is deterministic; decimal addition is
    exact; final cast to double is round-to-nearest. Matches the SQL pattern
    CAST(CAST(SUM(CAST(x AS DECIMAL(30,s))) AS VARCHAR) AS DOUBLE).
    """
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Aggregation pipelines (reference §2.4 A1-A13)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the engine's headline scan→filter→agg→sort pipeline.

    Exercises A-family aggregation (ref load.cyp MERGE groups are the
    degenerate form) with 8 aggregates and pushdown-able date filter.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            (_dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum("l_extendedprice") / F.count(F.lit(1))).alias("avg_price"),
            (_dsum("l_discount") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → group → top-k with unique tie-break."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the region→nation dimension chain.

    The dims (region/nation) are broadcast (they're tiny at any scale);
    customer-nation == supplier-nation is the co-location predicate.
    """
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


def a1_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node dedup-upsert A1 (`load.cyp:2-9` MERGE = distinct-by-key):
    distinct projection, the batch-local half of MERGE semantics."""
    cust = table(spark, sf_dir, "customer")
    return (
        cust.select("c_nationkey", "c_mktsegment").distinct().orderBy("c_nationkey", "c_mktsegment")
    )


A1_SQL = """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer ORDER BY c_nationkey, c_mktsegment
"""


def a6_array_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Releases-array set-union A6 (`load.cyp:93-95`,
    apoc.coll.sort∘toSet): per customer the sorted distinct set of order
    priorities, rendered as CSV for a hash-stable column type."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


A6_SQL = """
SELECT o_custkey,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey ORDER BY o_custkey
"""


def a7_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-by-node-label A7 (`execute_validation_queries/app.py:44-49`):
    per-table row counts as a labeled union."""
    parts = []
    for name in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        parts.append(
            table(spark, sf_dir, name).agg(
                F.lit(name).alias("label"), F.count(F.lit(1)).alias("n")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("label")


A7_SQL = """
SELECT 'region' AS label, COUNT(*) AS n FROM region
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'customer', COUNT(*) FROM customer
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
ORDER BY label
"""


def a8_explode_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode+distinct+count+order A8
    (`execute_validation_queries/app.py:73-77`): per-customer distinct order
    years (the releases-array analog) exploded into a histogram."""
    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.collect_set(F.year("o_orderdate").cast("long")).alias("years")
    )
    return (
        per_cust.select(F.explode("years").alias("order_year"))
        .groupBy("order_year")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("order_year")
    )


A8_SQL = """
WITH per_cust AS (
  SELECT o_custkey, list_distinct(list(CAST(year(o_orderdate) AS BIGINT))) AS years
  FROM orders GROUP BY o_custkey
)
SELECT order_year, COUNT(*) AS n_customers
FROM per_cust, unnest(years) AS t(order_year)
GROUP BY order_year ORDER BY order_year
"""


def a12_bool_all_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean all-reduce A12 (`validate_build_output/app.py:135,146`):
    bool_and / bool_or aggregates per nation."""
    cust = table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_nationkey")
    )


A12_SQL = """
SELECT c_nationkey, bool_and(c_acctbal > 0) AS all_positive,
       bool_or(c_acctbal > 9000) AS any_rich, COUNT(*) AS n
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


def a13_monotonicity_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elementwise-diff check A13 / ST4 (`invoke_pipeline/app.py:266-281`
    np.diff): per-user max gap between consecutive events via window lag."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "gap_ms", F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.max("gap_ms").alias("max_gap_ms"),
            F.bool_and(F.coalesce(F.col("gap_ms"), F.lit(0)) < 86400000).alias("no_day_gap"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


A13_SQL = """
WITH gaps AS (
  SELECT user_id,
         epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
  FROM events
)
SELECT user_id, MAX(gap_ms) AS max_gap_ms,
       bool_and(COALESCE(gap_ms, 0) < 86400000) AS no_day_gap,
       COUNT(*) AS n_events
FROM gaps GROUP BY user_id ORDER BY user_id
"""


def a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count aggregate per group (A7/A9 family)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


A_COUNT_DISTINCT_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def a_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group + post-aggregation predicate (HAVING; validation-gate shape F8/A10)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


A_HAVING_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_spend
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15 ORDER BY o_custkey
"""


def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotal aggregation (ROLLUP) — beyond-reference
    coverage for the analytics surface."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), _dsum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


A_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over two dimensions (beyond-reference coverage)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


A_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def fk_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity validation as a query: orphan counts per
    foreign-key relationship (the Spark form of the reference's Neo4j
    constraint checks — SURVEY §7 replaces constraints with assertion
    queries). Each check is one anti-join keyed on the FK; dimension sides
    broadcast, so at 100 TB only the fact scans shuffle-free probe."""
    nation = table(spark, sf_dir, "nation").select("n_nationkey")
    checks = [
        (
            "supplier->nation",
            table(spark, sf_dir, "supplier").join(
                F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_anti"
            ),
        ),
        (
            "customer->nation",
            table(spark, sf_dir, "customer").join(
                F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"), "left_anti"
            ),
        ),
        (
            "lineitem->orders",
            table(spark, sf_dir, "lineitem").join(
                table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        (
            "orders->customer",
            table(spark, sf_dir, "orders").join(
                table(spark, sf_dir, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti",
            ),
        ),
    ]
    out = None
    for name, orphans in checks:
        one = orphans.agg(F.count(F.lit(1)).alias("n_orphans")).select(
            F.lit(name).alias("relationship"), "n_orphans"
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("relationship")


FK_INTEGRITY_SQL = """
SELECT relationship, n_orphans FROM (
  SELECT 'supplier->nation' AS relationship, CAST(COUNT(*) AS BIGINT) AS n_orphans
  FROM supplier WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
  UNION ALL
  SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT)
  FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
  UNION ALL
  SELECT 'lineitem->orders', CAST(COUNT(*) AS BIGINT)
  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  UNION ALL
  SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
) ORDER BY relationship
"""


def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube specialize:
    per-(status,priority), per-status, and grand-total rows in one
    aggregation pass (Spark 4 DataFrame.groupingSets)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("n"), _dsum("o_totalprice").alias("total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


A_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Filters / predicates (reference §2.2 F1-F10)
# ---------------------------------------------------------------------------


def f1_processability_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Processability filter F1 (`app.py:606-611`): keep row iff text
    non-null AND lang in allow-list AND length > threshold. Pushed to the
    parquet scan by Catalyst."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.col("text").isNotNull()
            & F.col("lang").isin("en", "de", "fr")
            & (F.col("n_chars") > 100)
        )
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


F1_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE text IS NOT NULL AND lang IN ('en','de','fr') AND n_chars > 100
ORDER BY doc_id
"""


def f2_skip_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-list filter F2 (`constants.py:7-11` skip_alleles): exclusion by
    literal membership (NOT IN)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(~F.col("event_type").isin("error", "signup"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


F2_SQL = """
SELECT event_type, COUNT(*) AS n FROM events
WHERE event_type NOT IN ('error','signup')
GROUP BY event_type ORDER BY event_type
"""


def f5_regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate F5 (`invoke_pipeline/app.py:174-185`
    `^\\d{2,3}0$`): rlike filter on a string column."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").rlike(r"^[12]-"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


F5_SQL = """
SELECT o_orderpriority, COUNT(*) AS n FROM orders
WHERE regexp_matches(o_orderpriority, '^[12]-')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def f6_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional property-set F6 (`load.cyp:66-83` FOREACH-CASE): pivot
    event_type into columns, exactly the ARD G/lg pivot pattern."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum(F.col("value").cast("decimal(30,8)")).cast("double"))
        .orderBy("user_id")
    )


F6_SQL = """
SELECT user_id,
       CAST(CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE) AS click,
       CAST(CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE) AS purchase,
       CAST(CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE) AS view
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Joins (reference §2.3 J1-J10)
# ---------------------------------------------------------------------------


def j1_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment lookup join J1 (`app.py:269-321` dict probe): broadcast
    hash join of the fact against a small dimension, left outer to keep
    probe-miss rows (ref emits no row on miss; we keep parity by filtering)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left")
        .filter(F.col("p_brand").isNotNull())
        .groupBy("p_brand")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


J1_SQL = """
SELECT p_brand,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
WHERE p_brand IS NOT NULL
GROUP BY p_brand ORDER BY p_brand
"""


def j2_dimension_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-build equi-join J2 (`load.cyp:85-99` MATCH-by-key ×3): chain
    customer→nation→region on their keys; dims broadcast."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum("c_acctbal").alias("total_balance"),
        )
        .orderBy("r_name", "n_name")
    )


J2_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


def j4_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi-join J4 (`load.cyp:124-138` MATCH on
    (locus,rank,term,accession)): join lineitem back to itself on the
    composite (l_orderkey, l_linenumber) identity — a multi-column key join."""
    li = table(spark, sf_dir, "lineitem")
    first_lines = li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        F.col("l_partkey").alias("first_partkey"),
        F.col("l_quantity").alias("first_qty"),
    )
    return (
        li.join(first_lines, "l_orderkey")
        .filter(F.col("l_linenumber") > 1)
        .groupBy("first_partkey")
        .agg(F.count(F.lit(1)).alias("n_follow_lines"))
        .filter(F.col("n_follow_lines") >= 5)
        .orderBy("first_partkey")
    )


J4_SQL = """
WITH first_lines AS (
  SELECT l_orderkey, l_partkey AS first_partkey, l_quantity AS first_qty
  FROM lineitem WHERE l_linenumber = 1
)
SELECT first_partkey, COUNT(*) AS n_follow_lines
FROM lineitem JOIN first_lines USING (l_orderkey)
WHERE l_linenumber > 1
GROUP BY first_partkey HAVING COUNT(*) >= 5 ORDER BY first_partkey
"""


def j6_cross_join_singleton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian singleton join J6 (`load.cyp:101-111` MATCH Submitter ×
    MATCH GFE): cross-join every group row with a 1-row global aggregate to
    compute revenue share."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    by_flag = li.groupBy("l_returnflag").agg(_dsum(rev).alias("revenue"))
    total = li.agg(_dsum(rev).alias("total_revenue"))
    return (
        by_flag.crossJoin(F.broadcast(total))
        .select(
            "l_returnflag",
            "revenue",
            # round(...,9): the decimal→double cast of an 18-digit total can
            # differ by 1 ulp across engines; 9 digits is far below that noise
            F.round(F.col("revenue") / F.col("total_revenue"), 9).alias("revenue_share"),
        )
        .orderBy("l_returnflag")
    )


J6_SQL = """
WITH by_flag AS (
  SELECT l_returnflag,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_returnflag
), total AS (
  SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem
)
SELECT l_returnflag, revenue, round(revenue / total_revenue, 9) AS revenue_share
FROM by_flag CROSS JOIN total ORDER BY l_returnflag
"""


def j7_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-difference anti-join J7 (`invoke_pipeline/app.py:258-265` state
    diff): customers with no orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


J7_SQL = """
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence semi-join (F9/J8-with-existence): customers having at
    least one URGENT order."""
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


J_SEMI_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def j_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer merge (the cross-release upsert shape, §1.3 note):
    nations by customer-count vs supplier-count, keeping either-side-only."""
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(sup, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


J_FULL_OUTER_SQL = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
USING (nationkey)
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# Windows / sorts / top-k (reference §2.5 W1-W6)
# ---------------------------------------------------------------------------


def w2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (W1 limit + W3 ordering generalized): 3 biggest
    orders per customer, row_number with unique tie-break."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


W2_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3 ORDER BY o_custkey, rn
"""


def w6_dense_rank_accession(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accession numbering W6 (`docs/source/reference.rst:79-84`,
    dictionary-encode first-seen): dense_rank over a deterministic ordering
    within a partition key — the same primitive the accession registry uses
    (plans/accession.py holds the stateful version)."""
    part = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        part.withColumn("price_rank", F.dense_rank().over(w).cast("long"))
        .select("p_partkey", "p_brand", "p_retailprice", "price_rank")
        .orderBy("p_brand", "price_rank", "p_partkey")
    )


W6_SQL = """
SELECT p_partkey, p_brand, p_retailprice,
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS BIGINT) AS price_rank
FROM part ORDER BY p_brand, price_rank, p_partkey
"""


def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over an ordered frame (W-family): cumulative event
    value per user. Decimal accumulation keeps it order-exact."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.withColumn(
            "running_value", F.sum(F.col("value").cast("decimal(30,8)")).over(w).cast("double")
        )
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    )


W_RUNNING_SQL = """
SELECT user_id, event_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_value
FROM events ORDER BY user_id, event_id
"""


def rolling_spend_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame (W-family beyond fixed ROWS frames): per
    customer, total spend over the trailing 7 days of each order. The
    frame key is an integer epoch-day, so the RANGE boundary is exact in
    every engine (no interval/timezone arithmetic in the frame), and the
    sum routes through decimal for order-insensitive exactness. One
    shuffle on the partition key; the frame scan is a single pass per
    partition (no self-join / no per-row re-aggregation)."""
    orders = table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = W.partitionBy("o_custkey").orderBy(day).rangeBetween(-7, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
        F.count(F.lit(1)).over(w).alias("n_orders_7d"),
    ).orderBy("o_orderkey")


ROLLING_SPEND_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS spend_7d,
       COUNT(*) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS n_orders_7d
FROM orders ORDER BY o_orderkey
"""


def w_relative_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions (percent_rank + cume_dist) per
    brand — the normalized-rank pair next to the ordinal ranks W5 covers.
    Both are exact rationals of (rank, n); rounding to 9 keeps the division
    representation-identical across engines."""
    part = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_partkey",
        "p_brand",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    ).orderBy("p_brand", "p_partkey")


W_RELATIVE_RANK_SQL = """
SELECT p_partkey, p_brand,
       round(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey), 9) AS pct_rank,
       round(cume_dist()    OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey), 9) AS cume
FROM part ORDER BY p_brand, p_partkey
"""


def w_lead_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead window (A13 primitive exposed directly): per-user previous
    and next event values."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
        )
        .orderBy("user_id", "event_id")
    )


W_LEAD_LAG_SQL = """
SELECT user_id, event_id, value,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
FROM events ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# Set operations (reference §2.6 SO1-SO4)
# ---------------------------------------------------------------------------


def so1_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference SO1 (`invoke_pipeline/app.py:263`): nations that have
    customers but no suppliers."""
    cust_nations = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    sup_nations = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.distinct().subtract(sup_nations.distinct()).orderBy("nationkey")


SO1_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey FROM supplier
ORDER BY nationkey
"""


def so_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (SO-family): nations present on both sides."""
    cust_nations = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    sup_nations = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.intersect(sup_nations).orderBy("nationkey")


SO_INTERSECT_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT DISTINCT s_nationkey FROM supplier
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# Scalar layer (reference §2.7 C1-C18)
# ---------------------------------------------------------------------------


def c_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function layer C2/C3/C6/C7/C8/C14 in one projection:
    split/element_at, upper, length, coalesce, regexp_replace, md5,
    substring, concat_ws."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.upper(F.element_at(F.split(F.col("text"), " "), 1)).alias("first_token_upper"),
            F.length("text").cast("long").alias("text_len"),
            F.coalesce("lang", F.lit("none")).alias("lang_filled"),
            F.regexp_replace(F.col("text"), "[aeiou]", "").alias("devoweled"),
            F.substring(F.md5(F.col("text")), 1, 8).alias("text_md5_8"),
            F.concat_ws("|", "source", "lang").alias("source_lang"),
        )
        .orderBy("doc_id")
    )


C_SCALAR_SQL = """
SELECT doc_id,
       upper(string_split(text, ' ')[1]) AS first_token_upper,
       CAST(length(text) AS BIGINT) AS text_len,
       COALESCE(lang, 'none') AS lang_filled,
       regexp_replace(text, '[aeiou]', '', 'g') AS devoweled,
       substring(md5(text), 1, 8) AS text_md5_8,
       concat_ws('|', source, lang) AS source_lang
FROM documents ORDER BY doc_id
"""


def c10_date_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar layer C9/C10 (`load.cyp:109`, `app.py:632`):
    date_trunc bucketing + formatted date strings."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"), _dsum("value").alias("total_value"))
        .orderBy("day", "hour_bucket")
    )


C10_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2 ORDER BY day, hour_bucket
"""


def c12_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parse C12/C13 (`app.py:415-420` literal-parse, `app.py:677`
    dumps): extract a typed field from the JSON props column."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .filter(F.col("k") > 90)
        .orderBy("event_id")
    )


C12_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
ORDER BY event_id
"""


def c5_version_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version formatting C5 (`app.py:550-555` '3540'→'3.54.0'): the 3- vs
    4-digit conditional reformat applied to synthesized release strings."""
    orders = table(spark, sf_dir, "orders")
    releases = orders.select(
        (F.floor(F.col("o_orderkey") % 60) * 10 + 3100).cast("string").alias("release")
    ).distinct()
    ver = F.when(
        F.length("release") == 3,
        F.concat_ws(
            ".",
            F.substring("release", 1, 1),
            F.substring("release", 2, 1),
            F.substring("release", 3, 1),
        ),
    ).otherwise(
        F.concat_ws(
            ".",
            F.substring("release", 1, 1),
            F.substring("release", 2, 2),
            F.substring("release", 4, 1),
        )
    )
    return releases.select("release", ver.alias("version")).orderBy("release")


C5_SQL = """
WITH releases AS (
  SELECT DISTINCT CAST((o_orderkey % 60) * 10 + 3100 AS VARCHAR) AS release FROM orders
)
SELECT release,
       CASE WHEN length(release) = 3
            THEN concat_ws('.', substring(release,1,1), substring(release,2,1), substring(release,3,1))
            ELSE concat_ws('.', substring(release,1,1), substring(release,2,2), substring(release,4,1))
       END AS version
FROM releases ORDER BY release
"""


def skew_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew toolkit's registered form: exact distinct-count per group
    via deterministic value-sharding (operators/skew.salted_count_distinct)
    — result-identical to a plain COUNT(DISTINCT) (the oracle), but the
    shuffle never sees one giant group: phase 1 dedups within (group,
    shard), phase 2 sums disjoint shard counts."""
    from gfe_db_spark.operators.skew import salted_count_distinct

    li = table(spark, sf_dir, "lineitem")
    return salted_count_distinct(li, "l_returnflag", "l_orderkey", salt=16).orderBy(
        "l_returnflag"
    )


SKEW_SALTED_COUNT_DISTINCT_SQL = """
SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew toolkit's salted JOIN registered: customer (25 hot nation
    keys over the whole table) joins nation through operators/skew.
    salted_join — the big side salted deterministically, the dim exploded
    salt-fold, so each hot key spreads over `salt` shuffle partitions.
    Result-identical to the plain join (the oracle)."""
    from gfe_db_spark.operators.skew import salted_join

    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    nation = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = salted_join(cust, nation, on="c_nationkey", salt=8)
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(30,8)")).cast("double").alias(
                "total_balance"
            ),
        )
        .orderBy("n_name")
    )


SKEW_SALTED_JOIN_SQL = """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def skew_stats_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-salting diagnostic registered: the heaviest order keys in
    lineitem with their share of total rows (operators/skew.skew_stats) —
    what a pipeline inspects before choosing a salt factor."""
    from gfe_db_spark.operators.skew import skew_stats

    li = table(spark, sf_dir, "lineitem")
    return skew_stats(li, "l_orderkey", top=10).withColumn(
        "share", F.round("share", 9)
    )


SKEW_STATS_SQL = """
SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
       round(COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM lineitem), 9) AS share
FROM lineitem GROUP BY l_orderkey
ORDER BY n DESC, l_orderkey
LIMIT 10
"""


def regression_moments_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped least-squares regression (price vs quantity) computed from
    exact decimal moments — the distributed form of `regr_slope` /
    `regr_intercept` / `corr` that stays deterministic at any parallelism.

    One keyed agg collects the five moments (Σx, Σy, Σx², Σy², Σxy)
    through `_dsum` (per-row double→decimal is deterministic, decimal
    addition exact), then slope/intercept/corr are pure per-group double
    arithmetic on those sums. The builtins (`F.regr_slope` etc.) stream
    float moments whose partition-merge order varies run to run; routing
    the moments through decimal makes the hash-checkable twin. One
    shuffle, map-side partials, no second pass.
    """
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("l_quantity").alias("sx"),
        _dsum("l_extendedprice").alias("sy"),
        _dsum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        _dsum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
        _dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return g.select(
        "l_returnflag",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 9).alias("intercept"),
        F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 9).alias("corr"),
    ).orderBy("l_returnflag")


REGRESSION_MOMENTS_SQL = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 9) AS slope,
       ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
             / CAST(n AS DOUBLE), 9) AS intercept,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
                * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS corr
FROM m ORDER BY l_returnflag
"""


def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE (most frequent value) of p_brand per p_size,
    deterministic tie-break toward the smaller value — the classic
    aggregate Spark lacks as a builtin, expressed as count-then-argmax.
    Two keyed aggs (both map-side combinable), no window over raw rows:
    min_by on the (-count, value) struct replaces the
    row_number-over-counts formulation, so the second agg's shuffle
    carries one row per (p_size, p_brand) pair, never per part row."""
    part = table(spark, sf_dir, "part")
    counts = part.groupBy("p_size", "p_brand").agg(F.count(F.lit(1)).alias("cnt"))
    # argmax by (cnt desc, value asc) == min_by over (-cnt, value)
    return (
        counts.groupBy("p_size")
        .agg(
            F.min_by(
                F.struct(F.col("p_brand").alias("v"), F.col("cnt").alias("c")),
                F.struct((-F.col("cnt")).alias("nc"), F.col("p_brand").alias("v")),
            ).alias("m")
        )
        .select(
            "p_size",
            F.col("m.v").alias("mode_value"),
            F.col("m.c").alias("mode_count"),
        )
        .orderBy("p_size")
    )


MODE_PER_GROUP_SQL = """
WITH c AS (
  SELECT p_size, p_brand, COUNT(*) AS cnt
  FROM part GROUP BY 1, 2
)
SELECT p_size, p_brand AS mode_value, cnt AS mode_count
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY p_size ORDER BY cnt DESC, p_brand
  ) AS rn FROM c
) WHERE rn = 1
ORDER BY p_size
"""


def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event_type and
    day-of-week over the events table: observed counts are one keyed agg;
    the row/column margins join back as broadcast dims; the statistic is
    a decimal-routed sum of (o-e)^2/e. One row out (statistic + degrees
    of freedom) — the A/B-test-shaped analytic a metrics pipeline runs."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type"), F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("event_type").agg(F.sum("o").alias("row_tot"))
    colsm = cells.groupBy("dow").agg(F.sum("o").alias("col_tot"))
    n = cells.agg(F.sum("o").alias("n_tot"))
    term = cells.join(F.broadcast(rows), "event_type").join(
        F.broadcast(colsm), "dow"
    ).crossJoin(F.broadcast(n))
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n_tot").cast("double")
    )
    contrib = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    return term.agg(
        F.round(F.sum(contrib.cast("decimal(38,18)")).cast("double"), 9).alias("chisq"),
        (
            (F.count_distinct(F.col("event_type")) - F.lit(1))
            * (F.count_distinct(F.col("dow")) - F.lit(1))
        ).alias("dof"),
    )


CHISQ_SQL = """
WITH cells AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow, COUNT(*) AS o
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, SUM(o) AS row_tot FROM cells GROUP BY 1
), c AS (
  SELECT dow, SUM(o) AS col_tot FROM cells GROUP BY 1
), n AS (
  SELECT SUM(o) AS n_tot FROM cells
)
SELECT round(CAST(CAST(SUM(CAST(
         (CAST(o AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
         * (CAST(o AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
         / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
       AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE), 9) AS chisq,
       CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof
FROM cells JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
"""


QUERIES: dict[str, QuerySpec] = {
    "mode_per_group": QuerySpec(
        mode_per_group,
        MODE_PER_GROUP_SQL,
        "exact MODE per group via count-then-argmax (no raw-row window)",
    ),
    "chisq_independence": QuerySpec(
        chisq_independence,
        CHISQ_SQL,
        "Pearson chi-square independence test, decimal-routed statistic",
    ),
    "regression_moments_by_flag": QuerySpec(
        regression_moments_by_flag,
        REGRESSION_MOMENTS_SQL,
        "grouped least-squares slope/intercept/corr from exact decimal moments",
    ),
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_SQL, "TPC-H Q1 headline agg"),
    "q3_shipping_priority": QuerySpec(q3_shipping_priority, Q3_SQL, "join+group+topk"),
    "q5_local_supplier_volume": QuerySpec(q5_local_supplier_volume, Q5_SQL, "6-way join"),
    "a1_dedup_distinct": QuerySpec(a1_dedup_distinct, A1_SQL, "MERGE dedup A1"),
    "a6_array_set_union": QuerySpec(a6_array_set_union, A6_SQL, "releases array A6"),
    "a7_label_counts": QuerySpec(a7_label_counts, A7_SQL, "label counts A7"),
    "a8_explode_distinct_count": QuerySpec(a8_explode_distinct_count, A8_SQL, "histogram A8"),
    "a12_bool_all_reduce": QuerySpec(a12_bool_all_reduce, A12_SQL, "bool_and/or A12"),
    "a13_monotonicity_guard": QuerySpec(a13_monotonicity_guard, A13_SQL, "lag-diff A13"),
    "a_count_distinct": QuerySpec(a_count_distinct, A_COUNT_DISTINCT_SQL, "exact distinct"),
    "a_having_filter": QuerySpec(a_having_filter, A_HAVING_SQL, "HAVING gate"),
    "a_rollup": QuerySpec(a_rollup, A_ROLLUP_SQL, "rollup subtotals"),
    "a_cube": QuerySpec(a_cube, A_CUBE_SQL, "cube aggregation"),
    "a_grouping_sets": QuerySpec(
        a_grouping_sets, A_GROUPING_SETS_SQL, "explicit grouping sets"
    ),
    "fk_integrity_check": QuerySpec(
        fk_integrity_check, FK_INTEGRITY_SQL, "anti-join referential integrity audit"
    ),
    "f1_processability_filter": QuerySpec(f1_processability_filter, F1_SQL, "filter F1"),
    "f2_skip_list_filter": QuerySpec(f2_skip_list_filter, F2_SQL, "skip-list F2"),
    "f5_regex_predicate": QuerySpec(f5_regex_predicate, F5_SQL, "regex F5"),
    "f6_conditional_pivot": QuerySpec(f6_conditional_pivot, F6_SQL, "pivot F6"),
    "j1_broadcast_lookup": QuerySpec(j1_broadcast_lookup, J1_SQL, "broadcast join J1"),
    "j2_dimension_chain": QuerySpec(j2_dimension_chain, J2_SQL, "key-chain join J2"),
    "j4_composite_key_join": QuerySpec(j4_composite_key_join, J4_SQL, "composite key J4"),
    "j6_cross_join_singleton": QuerySpec(j6_cross_join_singleton, J6_SQL, "cross join J6"),
    "j7_anti_join": QuerySpec(j7_anti_join, J7_SQL, "anti join J7"),
    "j_semi_join": QuerySpec(j_semi_join, J_SEMI_SQL, "semi join"),
    "j_full_outer_join": QuerySpec(j_full_outer_join, J_FULL_OUTER_SQL, "full outer merge"),
    "w2_topk_per_group": QuerySpec(w2_topk_per_group, W2_SQL, "top-k per group"),
    "w6_dense_rank_accession": QuerySpec(w6_dense_rank_accession, W6_SQL, "dense_rank W6"),
    "w_running_total": QuerySpec(w_running_total, W_RUNNING_SQL, "running frame"),
    "rolling_spend_7d": QuerySpec(
        rolling_spend_7d, ROLLING_SPEND_SQL, "time-range (RANGE) window frame"
    ),
    "w_lead_lag_delta": QuerySpec(w_lead_lag_delta, W_LEAD_LAG_SQL, "lag/lead"),
    "w_relative_rank": QuerySpec(
        w_relative_rank, W_RELATIVE_RANK_SQL, "percent_rank + cume_dist"
    ),
    "so1_except": QuerySpec(so1_except, SO1_SQL, "EXCEPT SO1"),
    "so_intersect": QuerySpec(so_intersect, SO_INTERSECT_SQL, "INTERSECT"),
    "c_scalar_suite": QuerySpec(c_scalar_suite, C_SCALAR_SQL, "scalar layer"),
    "c10_date_kit": QuerySpec(c10_date_kit, C10_SQL, "date/time scalars"),
    "c12_json_extraction": QuerySpec(c12_json_extraction, C12_SQL, "JSON extract"),
    "c5_version_format": QuerySpec(c5_version_format, C5_SQL, "version reformat C5"),
    "skew_salted_count_distinct": QuerySpec(
        skew_salted_count_distinct,
        SKEW_SALTED_COUNT_DISTINCT_SQL,
        "skew toolkit: sharded exact distinct count",
    ),
    "skew_salted_join": QuerySpec(
        skew_salted_join, SKEW_SALTED_JOIN_SQL, "skew toolkit: salted equi-join"
    ),
    "skew_stats_hot_keys": QuerySpec(
        skew_stats_hot_keys, SKEW_STATS_SQL, "skew toolkit: hot-key diagnostic"
    ),
}
