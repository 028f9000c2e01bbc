"""TPC-H-style headline queries over the driver's star schema.

The reference's published baseline classes (BASELINE.md) are simple COUNT /
filtered aggregation / complex join / window — these queries are the bench
workload for each class at sf0.1, and widen §2 coverage (multi-way joins,
expression aggregates, top-k with ORDER BY+LIMIT → TakeOrderedAndProject).

Scale stance: dims (region/nation/customer/part/supplier) broadcast; the
lineitem fact never shuffles for joins, only for its final aggregation —
partial aggregation runs map-side. Predicates are literal column
comparisons → pushed to the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import det_avg, det_avg_sql, det_sum, det_sum_sql
from ..sources.registry import load


# --- Q1-style pricing summary (A4/A5/A11 + det float aggs) ------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            det_sum("l_quantity", 2).alias("sum_qty"),
            det_sum("l_extendedprice", 2).alias("sum_base_price"),
            det_sum(disc_price, 2).alias("sum_disc_price"),
            det_sum(charge, 2).alias("sum_charge"),
            det_avg("l_quantity", 4).alias("avg_qty"),
            det_avg("l_extendedprice", 4).alias("avg_price"),
            det_avg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q3-style shipping priority (3-way join + top-k) ------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1996-01-01 00:00:00"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(det_sum(revenue, 2).alias("revenue"))
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- Q5-style regional supplier revenue (6-way join) ------------------------
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(det_sum(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


# --- Q6-style forecast revenue change (pure filtered agg) -------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            det_sum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- order-priority counts (A5 over orders⋈lineitem exists) -----------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-07-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-10-01 00:00:00")))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q7-style volume shipping (self-aliased dim joins + year extract) -------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between two nations per year. Covers the
    two-role-joins-of-one-dim pattern (nation as supplier nation AND
    customer nation) — both broadcast, zero fact shuffle before the agg."""
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.to_timestamp(F.lit("1995-01-01 00:00:00")),
            F.to_timestamp(F.lit("1996-12-31 00:00:00")),
        )
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(det_sum(revenue, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8-style market share (ratio of conditional sums per year) -------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of ASIA-market revenue per order year: the
    SUM(CASE)/SUM ratio shape (A5/A6 over a 6-way join)."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec_rev = revenue.cast("decimal(28,8)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"), "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                (
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_3", dec_rev).otherwise(
                            F.lit(0).cast("decimal(28,8)")
                        )
                    )
                    / F.sum(dec_rev)
                ).cast("double"),
                6,
            ).alias("mkt_share"),
            det_sum(revenue, 2).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


# --- Q10-style returned-item revenue (top 20, 4-way join) -------------------
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01 00:00:00")))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(det_sum(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q14-style promo revenue (LIKE + conditional ratio) ---------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-09-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-10-01 00:00:00")))
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,8)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type").like("PROMO%"), revenue).otherwise(
                            F.lit(0).cast("decimal(28,8)")
                        )
                    ).cast("double")
                    / F.sum(revenue).cast("double")
                ),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- Q17-style small-quantity revenue (correlated per-part avg) -------------
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems below half their part's average quantity. The correlated
    scalar subquery decorrelates into a per-part aggregate joined back —
    expressed that way directly so the plan is one pass over the brand's
    lineitems + a broadcast of the tiny per-part avg table."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    li = load(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    # per-part average via a window on the brand-filtered rows: ONE lineitem
    # scan (the agg+join-back decorrelation scans it twice — no cross-branch
    # exchange reuse), and the window shuffles only the brand's small subset
    wp = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(28,8)")).over(wp).cast("double")
        / F.count("l_quantity").over(wp)
    )
    return (
        brand_li.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            det_sum("l_extendedprice", 2).alias("total_extprice"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- Q18-style large-volume customers (HAVING subquery → semi join) ---------
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    # HAVING-subquery (SUM(qty) > 300 per order) via a window over
    # l_orderkey: ONE lineitem scan instead of the agg→semi-join-back
    # decorrelation's two, and the orderkey exchange is the same one the
    # orders join needs next — the partitioning is reused, not repeated
    big = li.withColumn(
        "_qty",
        F.sum(F.col("l_quantity").cast("decimal(28,8)"))
        .over(Window.partitionBy("l_orderkey"))
        .cast("double"),
    ).filter(F.col("_qty") > 300)
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(det_sum("l_quantity", 2).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --- Q19-style disjunctive predicate bands (OR-of-ANDs pushdown) ------------
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            det_sum(revenue, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- Q22-style inactive rich customers (anti join + scalar subquery) --------
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no 2001 orders: global scalar
    aggregate (one-row broadcast cross join) + left ANTI join against the
    filtered fact — both sides prune to almost nothing before the join."""
    cust = load(spark, sf_dir, "customer")
    orders_2001 = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2001-01-01 00:00:00")))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,8)")).cast("double")
            / F.count("c_acctbal")
        ).alias("_avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders_2001, cust.c_custkey == orders_2001.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("num_custs"),
            det_sum("c_acctbal", 2).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --- Q9-style nation/year revenue for a part family (LIKE on name) ----------
def q9_nation_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%r%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(det_sum(revenue, 2).alias("revenue"))
        .orderBy("n_name", F.desc("o_year"))
    )


# --- Q12-style priority counts by return flag (IN-list conditional sums) ----
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --- Q15-style top supplier (agg → global-max scalar join) -------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(det_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "total_revenue"
        ))
    )
    # Global max via an unpartitioned window over the per-supplier aggregate:
    # ONE scan+agg of the fact (a second `revenue.agg(max)` branch would
    # re-scan lineitem — Spark does not reuse the exchange across branches).
    # The window's single partition holds only |suppliers| rows.
    return (
        revenue.withColumn(
            "_max", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q16-style supplier counts per part attribute (NOT LIKE + IN-list) ------
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q2-style min-cost supplier (min-per-group join-back; no partsupp table
# in the driver schema, so "offers" derive from lineitem unit prices) --------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    # Min-per-part via a window over the per-(part,supplier) aggregate: one
    # fact scan, and the window repartitions only the small offers relation
    # by l_partkey (a groupBy+join-back would re-aggregate the fact — no
    # cross-branch exchange reuse in Spark).
    return (
        offers.withColumn(
            "best_price",
            F.min("unit_price").over(Window.partitionBy("l_partkey")),
        )
        .filter(F.col("unit_price") == F.col("best_price"))
        .drop("best_price")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round(F.col("unit_price").cast("decimal(28,8)"), 4)
            .cast("double")
            .alias("unit_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q11-style important parts (agg HAVING vs global-scalar threshold) ------
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    li = load(spark, sf_dir, "lineitem")
    value = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,8)"
    )
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("_val"))
    )
    # Global total via an unpartitioned window over the per-part aggregate
    # (one fact scan; the single window partition holds only |parts| rows).
    return (
        pv.withColumn("_tot", F.sum("_val").over(Window.partitionBy()))
        .filter(
            F.col("_val").cast("double") > F.col("_tot").cast("double") * 0.001
        )
        .select(
            "l_partkey",
            F.round(F.col("_val").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# --- Q13-style customer order-count distribution (left join w/ ON-filter +
# two-level aggregation) ------------------------------------------------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q20-style heavy shippers of a part family (nested semi-join chain) -----
def q20_heavy_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,8)")).alias("qty"))
        .filter(F.col("qty").cast("double") > 30.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --- Q21-style last shipper in multi-supplier orders (EXISTS + NOT EXISTS
# self-joins with a non-equi residual condition) ------------------------------
def q21_last_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    waiting = (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_regional_revenue": q5_regional_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_inactive_customers": q22_inactive_customers,
    "q9_nation_year_revenue": q9_nation_year_revenue,
    "q12_priority_by_returnflag": q12_priority_by_returnflag,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q13_customer_distribution": q13_customer_distribution,
    "q20_heavy_part_shippers": q20_heavy_part_shippers,
    "q21_last_shippers": q21_last_shippers,
}

ORACLE = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {det_sum_sql("l_quantity", 2)} AS sum_qty,
               {det_sum_sql("l_extendedprice", 2)} AS sum_base_price,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS sum_disc_price,
               {det_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)} AS sum_charge,
               {det_avg_sql("l_quantity", 4)} AS avg_qty,
               {det_avg_sql("l_extendedprice", 4)} AS avg_price,
               {det_avg_sql("l_discount", 4)} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
               o_orderpriority,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderpriority
    """,
    "q5_regional_revenue": f"""
        SELECT n_name, {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": f"""
        SELECT {det_sum_sql("l_extendedprice * l_discount", 2)} AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))
                          ELSE CAST(0 AS DECIMAL(28,8)) END)
                     / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8)))
                     AS DOUBLE), 6) AS mkt_share,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS total_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_year
    """,
    "q10_returned_revenue": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q14_promo_revenue": """
        SELECT ROUND(100.0
                 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))
                        ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE),
               6) AS promo_revenue_pct,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    "q17_small_quantity_revenue": f"""
        WITH brand_li AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#5'
        ),
        per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE)
                       / COUNT(l_quantity) AS avg_qty
            FROM brand_li GROUP BY l_partkey
        )
        SELECT {det_sum_sql("l_extendedprice", 2)} AS total_extprice,
               COUNT(*) AS n_rows
        FROM brand_li JOIN per_part USING (l_partkey)
        WHERE l_quantity < 0.5 * avg_qty
    """,
    "q18_large_volume_customers": f"""
        SELECT c_name, c_custkey, o_orderkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
               o_totalprice,
               {det_sum_sql("l_quantity", 2)} AS sum_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) > 300
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "q19_disjunctive_revenue": f"""
        SELECT {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_inactive_customers": f"""
        SELECT c_mktsegment, COUNT(*) AS num_custs,
               {det_sum_sql("c_acctbal", 2)} AS total_acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE)
                       / COUNT(c_acctbal)
            FROM customer WHERE c_acctbal > 0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        GROUP BY c_mktsegment
    """,
    "q9_nation_year_revenue": f"""
        SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%r%'
        GROUP BY n_name, o_year
    """,
    "q12_priority_by_returnflag": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey,
                   {det_sum_sql("l_extendedprice * (1 - l_discount)", 2)}
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "q16_part_supplier_counts": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        GROUP BY p_brand, p_type, p_size
    """,
    "q2_min_cost_supplier": """
        WITH offers AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_price
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), best AS (
            SELECT l_partkey, MIN(unit_price) AS best_price
            FROM offers GROUP BY l_partkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               CAST(ROUND(CAST(unit_price AS DECIMAL(28,8)), 4) AS DOUBLE)
                   AS unit_price
        FROM offers
        JOIN best ON offers.l_partkey = best.l_partkey
                 AND offers.unit_price = best.best_price
        JOIN part ON offers.l_partkey = p_partkey
        JOIN supplier ON offers.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_size = 15 AND p_type = 'STANDARD'
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q11_important_parts": """
        WITH pv AS (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(28,8))) AS _val
            FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier JOIN nation
                    ON s_nationkey = n_nationkey
                WHERE n_name IN ('NATION_3', 'NATION_7')
            )
            GROUP BY l_partkey
        )
        SELECT l_partkey, ROUND(CAST(_val AS DOUBLE), 2) AS part_value
        FROM pv
        WHERE CAST(_val AS DOUBLE) >
              CAST((SELECT SUM(_val) FROM pv) AS DOUBLE) * 0.001
    """,
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "q20_heavy_part_shippers": """
        SELECT s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
            )
            GROUP BY l_suppkey, l_partkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) > 30.0
        )
    """,
    "q21_last_shippers": """
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_orderkey IN (
                  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
          AND EXISTS (
                  SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                  SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
}
