"""Relational analytics over the star-schema tables (SURVEY.md §2.5):
the classic warehouse query shapes — multi-way dimension joins,
grouped aggregation, and windowed ranking — expressed as pure Catalyst
plans so every §2.5 checklist row (joins, aggs, windows, sorts/limits)
is exercised on actual relational data, not only the text corpus.

No reference analogue (the reference serves single-request rerank
pools); these are the engine's proof that the §2.5 operator set
composes into TPC-H-shaped analytics.

Engine-portable arithmetic: money expressions are computed per row in
IEEE double (identical in any engine), then CAST TO DECIMAL before
summing — decimal sums are exact integers, so aggregates don't depend
on partitioning/summation order and the DuckDB oracles match
bit-for-bit. (Plain double sums over 10^5+ rows differ across
summation trees at ~1e-11 relative — enough to flip a 6dp rounding.)

Scale shape (the same rules as the text side):
- fact table (lineitem) scans once per query; predicate pushdown
  reaches parquet (date/segment filters are plain comparisons);
- truly tiny dimensions (nation, region, a segment-filtered customer
  key set) are BROADCAST — no fact-side shuffle for those joins;
  corpus-scaling sides (orders, unfiltered customer) carry no hint so
  AQE picks broadcast vs co-partitioned shuffle join from runtime
  sizes;
- the only fact-sized shuffle is the groupBy on the aggregation key;
- windows run over aggregated rows (nations, orders kept by the
  candidate cut), never over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# revenue/charge have <= 4/6 true decimal places (2dp prices x 2dp
# rates); the per-row double is within 1e-9 of the true value, so the
# decimal cast reconstructs it exactly in both engines
_DEC4 = "decimal(18,4)"
_DEC6 = "decimal(22,6)"


def pricing_summary(lineitem: DataFrame, cutoff: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary of
    lineitems shipped on or before ``cutoff``.

    -> (l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, sum_charge, avg_qty, avg_price, avg_disc,
    count_order), averages rounded 6dp. One pushdown-able date filter,
    one combinable hash agg — the canonical map-side-combine plan."""
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    disc_price = (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(_DEC4)
    charge = (
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * (1.0 + F.col("l_tax"))
    ).cast(_DEC6)
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC4)).alias("_sq"),
        F.sum(F.col("l_extendedprice").cast(_DEC4)).alias("_sbp"),
        F.sum(disc_price).alias("_sdp"),
        F.sum(charge).alias("_sc"),
        F.sum(F.col("l_discount").cast(_DEC4)).alias("_sd"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sbp").cast("double").alias("sum_base_price"),
        F.col("_sdp").cast("double").alias("sum_disc_price"),
        F.col("_sc").cast("double").alias("sum_charge"),
        F.round(F.col("_sq").cast("double") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("_sbp").cast("double") / F.col("count_order"), 6).alias("avg_price"),
        F.round(F.col("_sd").cast("double") / F.col("count_order"), 6).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def top_unshipped_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: the ``k`` highest-revenue orders of a market
    segment that were placed before ``date`` but still have lineitems
    shipping after it.

    -> (o_orderkey, revenue, o_orderdate, o_orderpriority), revenue
    desc / orderdate asc / orderkey asc. The segment-filtered customer
    dimension BROADCASTS into orders; lineitem joins the qualifying
    orders on orderkey WITHOUT a broadcast hint (orders is fact-sized
    at 100 TB — AQE picks broadcast when the filtered side fits, a
    co-partitioned shuffle join otherwise); the only other fact-sized
    shuffle is the per-order revenue agg."""
    d = F.lit(date).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = (
        orders.filter(F.col("o_orderdate") < d)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    rev = (
        lineitem.filter(F.col("l_shipdate") > d)
        .join(ords.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(_DEC4)
            ).alias("_rev")
        )
    )
    return (
        rev.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(k)
    )


def nation_revenue_rank(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Windowed regional roll-up (the §2.5 window-function row on
    relational data): revenue per customer nation, ranked WITHIN its
    region, with each nation's share of the region total.

    -> (r_name, n_name, revenue, region_rank, region_share) ordered
    (r_name, region_rank). nation/region broadcast (always tiny);
    customer and orders join WITHOUT broadcast hints — both scale with
    the corpus, so those edges are AQE's call (co-partitioned shuffle
    joins on the key at 100 TB); the rank/share windows run over
    ~|nations| rows."""
    dims = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_name", "r_name")
    )
    rev = (
        lineitem.select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(_DEC4).alias("_rev"),
        )
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("_rev").alias("_nrev"))
    )
    wr = Window.partitionBy("r_name").orderBy(
        F.desc("_nrev"), F.asc("n_name")
    )
    wtot = Window.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        F.col("_nrev").cast("double").alias("revenue"),
        F.row_number().over(wr).alias("region_rank"),
        F.round(
            F.col("_nrev").cast("double")
            / F.sum("_nrev").over(wtot).cast("double"),
            6,
        ).alias("region_share"),
    ).orderBy("r_name", "region_rank")
