"""TPC-H-adapted query family (q73-q86, q90-q91, q99) — the classic benchmark shapes the
reference's relational surface (SURVEY §2B) does not yet exercise, adapted to
the driver's fixture schema (TESTDATA.md has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns, so Q2/Q9/Q16/Q20/Q21
substitute the ``lineitem`` part-supplier bridge and ``l_returnflag`` where the
original uses those).

Already covered elsewhere in plans/queries.py: Q1 (q01), Q4 (q69), Q13 (q71),
Q18 (q70), Q22 (q72).

Scale notes (100 TB design stance, applied per query below):
- nation/region (fixed 25/5 rows) are true dimensions → explicit
  ``F.broadcast``;
- part/supplier/customer slices grow linearly with scale factor → every
  hint on them is SIZE-GATED via ``broadcast_if_small`` (operators/
  hints.py): the hint fires at test/bench scale (plan audits pin the
  all-broadcast star shape) but past 256 MiB the join falls back to
  Catalyst's statistics-driven choice instead of OOMing the cluster;
- customer/orders joins are left unhinted so AQE picks broadcast at small SF
  but falls back to shuffle on a real cluster;
- aggregate-before-dimension-join wherever the group count is bounded by a
  dimension key (q78 aggregates 60k lineitem rows down to ≤|customer| groups
  BEFORE touching customer/nation);
- every money sum is pre-rounded to 2dp in BOTH engines so the driver's
  6dp float hash is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.hints import broadcast_if_small
from ..sources.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q73_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where customer and supplier share the
    nation, one region, one order year. Dims (supplier x nation x region)
    broadcast into lineitem; orders x customer reduced to (orderkey,
    c_nationkey) before the only real shuffle (on orderkey)."""
    l = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    sup = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    ocust = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        l.join(broadcast_if_small(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ocust, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


Q73_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q74_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; all four predicates reach the
    parquet scan (PushedFilters), zero joins, zero wide shuffles."""
    l = load_table(spark, sf, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q74_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24
"""


def q75_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between a nation pair by ship year.
    The OR-pair predicate decomposes into pushed-down isin() filters on each
    side (each endpoint must be one of the two nations) plus the exact pair
    check after the orderkey join."""
    pair = ("NATION_1", "NATION_2")
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    n = load_table(spark, sf, "nation")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(*pair))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(*pair))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    ocust = o.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    return (
        l.join(broadcast_if_small(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ocust, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


Q75_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def q76_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of ECONOMY-part revenue sold
    into one region, by order year. Ratio-of-conditional-sums in a single
    hash aggregate; part and supplier-nation dims broadcast into lineitem
    before the orderkey shuffle."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")

    cust_in_region = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    ords = o.join(cust_in_region, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    supp = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    vol = (
        l.join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast_if_small(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "supp_nation", _rev().alias("volume"))
    )
    return (
        vol.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


Q76_SQL = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume), 6)
         AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND c_nationkey = n2.n_nationkey
    AND n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
    AND s_nationkey = n1.n_nationkey AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


def q77_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 adapted: profit by supplier nation x order year for parts
    whose name contains 'red'. The fixture set has no partsupp, so supply
    cost substitutes p_retailprice * 0.1 * l_quantity (deterministic, both
    engines compute the identical expression)."""
    l = load_table(spark, sf, "lineitem")
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    supp = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "n_name"
    )
    amount = _rev() - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    return (
        l.join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast_if_small(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "n_name", amount.alias("amount"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


Q77_SQL = """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


def q78_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue of returned items in one
    quarter. Aggregates lineitem x orders down to per-customer revenue
    BEFORE joining the customer/nation dimensions (the post-agg row count is
    bounded by |customer|), then a deterministic tie-broken top-k."""
    l = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    per_cust = (
        l.join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )
    return (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q78_SQL = """
SELECT c_custkey, c_name, n_name, revenue
FROM (
  SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY o_custkey
) r, customer, nation
WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q79_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.
    Conditional-sum ratio in a single aggregate over lineitem x
    broadcast(part)."""
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01")) & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    p = load_table(spark, sf, "part").select("p_partkey", "p_type")
    return (
        l.join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
                / F.sum(_rev()),
                6,
            ).alias("promo_revenue")
        )
    )


Q79_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q80_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue. The scalar
    max is a 1-row broadcast cross join against the per-supplier aggregate
    (both computed from one shuffle of the filtered lineitem); revenue is
    pre-rounded on both sides so the equality join is exact."""
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    rev = l.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(broadcast_if_small(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q80_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q81_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders of one
    brand's parts were not taken. The correlated per-part avg subquery
    decorrelates to a per-part aggregate (bounded by the filtered part list,
    hence broadcast) joined back to the same brand-filtered slice."""
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    l = load_table(spark, sf, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    lp = l.join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
    lim = lp.groupBy(F.col("l_partkey").alias("lim_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        lp.join(broadcast_if_small(lim), F.col("l_partkey") == F.col("lim_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q81_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q82_discount_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19: OR-of-conjunctions join predicate (brand x size-range x
    quantity-range disjuncts). The disjunction lives in the join condition;
    Catalyst still pushes the derivable single-side conjuncts (brand-set,
    size bounds, quantity bounds) to both scans."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    cond = (F.col("l_partkey") == F.col("p_partkey")) & (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(16, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(31, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return l.join(broadcast_if_small(p), cond).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


Q82_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, part
WHERE l_partkey = p_partkey AND (
   (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 31 AND 50 AND l_quantity BETWEEN 20 AND 30))
"""


def q83_parts_supplier_count(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct suppliers per (brand, type, size) over the
    lineitem part-supplier bridge (no partsupp table), excluding negative-
    balance suppliers via NOT IN -> broadcast LEFT ANTI."""
    l = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = load_table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(broadcast_if_small(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q83_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey AND p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q84_potential_promo(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 adapted: suppliers who shipped more than 10% of a 'red'
    part's total 1996 volume (lineitem bridge replaces partsupp
    availability). The per-part total derives from the per-(part, supplier)
    aggregate — the expensive relation shuffles once; the part-level rollup
    is a second shuffle over already-reduced rows, then broadcast back."""
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    # ONE lineitem scan, ONE exchange: repartition by part key up front —
    # HashPartitioning(l_partkey) satisfies both the (part, supplier)
    # aggregate's clustering AND the part-level window, so the per-part
    # total is a window over the already-reduced rows instead of a second
    # scan+join+agg subtree (the naive two-aggregate formulation physically
    # duplicated the whole chain — caught by the plan audit).
    sp = (
        l.join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    cand = (
        sp.withColumn("tq", F.sum("sq").over(Window.partitionBy("l_partkey")))
        .filter(F.col("sq") > 0.1 * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return s.join(cand, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi").select(
        "s_suppkey", "s_name"
    )


Q84_SQL = """
WITH lp AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
), sp AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq FROM lp GROUP BY 1, 2
), tot AS (
  SELECT l_partkey, sum(sq) AS tq FROM sp GROUP BY 1
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT sp.l_suppkey FROM sp JOIN tot ON sp.l_partkey = tot.l_partkey
                    WHERE sq > 0.1 * tq)
"""


def q85_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 adapted: suppliers who were the SOLE supplier with returned
    ('R') items in a finished multi-supplier order (the fixture schema has no
    commit/receipt dates, so l_returnflag stands in for the late-delivery
    predicate). EXISTS -> LEFT SEMI with an orderkey-equi + suppkey-non-equi
    condition; NOT EXISTS -> LEFT ANTI with the same shape."""
    l = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    fo = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    l1 = l.filter(F.col("l_returnflag") == "R").join(
        fo, F.col("l_orderkey") == F.col("o_orderkey")
    )
    l2 = l.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")), "left_anti")
    )
    return (
        waiting.join(broadcast_if_small(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q85_SQL = """
SELECT s_suppkey, s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_suppkey, s_name
"""


def q86_min_acct_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 adapted: for each size-15 part, the minimum-balance European
    supplier that actually shipped it (lineitem DISTINCT bridge replaces
    partsupp; s_acctbal replaces ps_supplycost). The correlated MIN
    decorrelates to a per-part window min — ties keep every minimal supplier,
    matching the SQL '=' semantics exactly."""
    l = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf, "part").filter(F.col("p_size") == 15).select("p_partkey", "p_name")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    s = load_table(spark, sf, "supplier")
    sr = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        l.join(broadcast_if_small(sr), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )


Q86_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
FROM part, supplier s, nation, region, ps
WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE' AND p_size = 15
  AND s_acctbal = (SELECT min(s2.s_acctbal)
                   FROM supplier s2, nation n2, region r2, ps ps2
                   WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
                     AND s2.s_nationkey = n2.n_nationkey
                     AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
"""


def q90_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 adapted (fixtures lack o_shippriority → o_orderpriority):
    top-10 unshipped orders of one market segment by revenue. Both date
    predicates push to their scans; the BUILDING customer slice broadcasts
    into orders before the single orderkey shuffle; top-10 fuses into
    TakeOrderedAndProject (no global sort)."""
    cutoff = _ts("1996-03-15")
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(
            o.join(broadcast_if_small(c), F.col("o_custkey") == F.col("c_custkey")).select(
                "o_orderkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


Q90_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1996-03-15' AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q91_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp → shipped value per part from the
    lineitem bridge; one supplier nation's stock). The HAVING-vs-scalar-
    subquery decorrelates to a 1-row broadcast cross join; both the per-part
    aggregate and the grand total derive from ONE shuffle of the filtered
    fact (the total reuses the per-part rollup, not a second scan)."""
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    l = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    nat_sup = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey"
    )
    per_part = (
        l.join(broadcast_if_small(nat_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("value"))
    )
    total = per_part.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


Q91_SQL = """
WITH per_part AS (
  SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS value
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, value
FROM per_part
WHERE value > (SELECT sum(value) * 0.001 FROM per_part)
"""


def q99_shipmode_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority counts). The fixture schema
    has no ``l_shipmode``/``l_commitdate``/``l_receiptdate``, so the mode is
    derived deterministically from ``l_linenumber`` and the late-receipt
    predicate becomes "shipped ≥30 days after the order date" — same plan
    shape as the original: one fact-fact equi join with the conditional
    CASE-sum rollup, the 2-mode filter and the date window pushed to the
    lineitem scan, orders reduced to (orderkey, priority) before the join.
    With this, all 22 TPC-H query shapes are exercised on the fixture
    schema (COVERAGE §2B)."""
    mode = F.element_at(
        F.array(F.lit("TRUCK"), F.lit("MAIL"), F.lit("SHIP")),
        (F.col("l_linenumber") % 3 + 1).cast("int"),
    )
    l = (
        load_table(spark, sf, "lineitem")
        .withColumn("shipmode", mode)
        .filter(F.col("shipmode").isin("MAIL", "SHIP"))
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .select("l_orderkey", "l_shipdate", "shipmode")
    )
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 30))
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q99_SQL = """
SELECT shipmode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT l_orderkey, l_shipdate,
         ['TRUCK', 'MAIL', 'SHIP'][(l_linenumber % 3 + 1)] AS shipmode
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
) l
JOIN orders ON l_orderkey = o_orderkey
WHERE shipmode IN ('MAIL', 'SHIP')
  AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
GROUP BY shipmode
"""


TPCH_REGISTRY = {
    "q99_shipmode_priority": (q99_shipmode_priority, Q99_SQL),
    "q73_local_supplier_volume": (q73_local_supplier_volume, Q73_SQL),
    "q74_forecast_revenue": (q74_forecast_revenue, Q74_SQL),
    "q75_volume_shipping": (q75_volume_shipping, Q75_SQL),
    "q76_market_share": (q76_market_share, Q76_SQL),
    "q77_product_profit": (q77_product_profit, Q77_SQL),
    "q78_returned_items": (q78_returned_items, Q78_SQL),
    "q79_promo_effect": (q79_promo_effect, Q79_SQL),
    "q80_top_supplier": (q80_top_supplier, Q80_SQL),
    "q81_small_qty_revenue": (q81_small_qty_revenue, Q81_SQL),
    "q82_discount_revenue": (q82_discount_revenue, Q82_SQL),
    "q83_parts_supplier_count": (q83_parts_supplier_count, Q83_SQL),
    "q84_potential_promo": (q84_potential_promo, Q84_SQL),
    "q85_waiting_suppliers": (q85_waiting_suppliers, Q85_SQL),
    "q86_min_acct_supplier": (q86_min_acct_supplier, Q86_SQL),
    "q90_shipping_priority": (q90_shipping_priority, Q90_SQL),
    "q91_important_stock": (q91_important_stock, Q91_SQL),
}
