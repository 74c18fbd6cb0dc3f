"""Star-schema fact assembly.

Parity: the reference's fact build (``src/gold/facts/fact_adverse_events.py:20-312``)
is a 7-table join chain — inner equi-joins to establish the grain, left
equi-joins for optional attributes, three expression joins to the date
dimension (``to_date(col,'yyyyMMdd') == date_value``), then a wide projection
with coalesce defaults, decimal measure casts, decode ladders, a weighted
score, and a data-quality tier (J1-J7, P1-P7, §2.7).

Here the same operator chain is instantiated on the TPC-H-ish testdata
(FIXTURES.md §C): ``lineitem`` is the grain carrier (drug×reaction analog),
``orders``/``customer`` the report/demographics analogs, ``part``/``supplier``
optional attribute dims, ``nation``/``region`` the geography ladder, and the
generated date dimension joined by expression.

Scale design:
- The only large-×-large join is lineitem⋈orders — a shuffle hash/sort-merge
  join on the natural key; AQE handles skew. At 100 TB you would bucket both
  by orderkey to make it shuffle-free; the plan shape here already co-locates
  all subsequent joins on the same key.
- Truly small dimension sides (nation, region, part, supplier, date_dim) are
  broadcast — ``F.broadcast`` hints make that explicit rather than relying on
  size estimation. Customer is NOT hinted: at TPC-H proportions it is ~1/40
  of lineitem, so at 100 TB a forced broadcast would be multi-TB → OOM; AQE
  decides at runtime (broadcast at small SF, shuffle join at scale, already
  co-located on the orderkey partitioning from the previous join).
- Measures that feed exact aggregation are rounded-then-DECIMAL per row so
  downstream sums are order-independent (oracle-comparable at any parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.transforms import bucketize, decode_ladder
from .date_dim import build_date_dim

ORDER_PRIORITY_DECODE = {
    "1-URGENT": "Critical",
    "2-HIGH": "High",
    "3-MEDIUM": "Medium",
    "4-NOT SPECIFIED": "Unspecified",
    "5-LOW": "Low",
}

ORDER_STATUS_DECODE = {"O": "Open", "F": "Fulfilled", "P": "Partial"}

MKTSEGMENT_DECODE = {
    "AUTOMOBILE": "Automotive",
    "BUILDING": "Construction",
    "FURNITURE": "Home Goods",
    "HOUSEHOLD": "Consumer",
    "MACHINERY": "Industrial",
}

RETURN_FLAG_DECODE = {"R": "Returned", "A": "Accepted", "N": "None"}


def build_fact_sales(
    spark: SparkSession,
    sf_dir: str,
    with_date_dim: bool = True,
) -> DataFrame:
    """Assemble the wide sales fact (one row per lineitem)."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")

    # J1/J2 — inner equi-joins fixing the grain (large side stays partitioned
    # on orderkey through the chain).
    fact = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "inner"
    ).join(customer, orders.o_custkey == customer.c_custkey, "inner")

    # J3/J4 — left equi-joins for optional attribute dims (broadcast).
    fact = fact.join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey, "left"
    ).join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey, "left")

    # J5/J6 — geography ladder off the customer (broadcast snowflake).
    fact = fact.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left"
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")

    # J7 — expression join to the generated date dimension:
    # to_date(o_orderdate) == date_value (Catalyst normalizes to an equi-join).
    if with_date_dim:
        dd = build_date_dim(spark).select(
            "date_key",
            "date_value",
            F.col("year").alias("order_year"),
            F.col("quarter_name").alias("order_quarter"),
            F.col("is_weekend").alias("ordered_on_weekend"),
        )
        fact = fact.join(
            F.broadcast(dd), F.to_date(orders.o_orderdate) == dd.date_value, "left"
        )

    # Scaled-integer money math: the testdata's money columns are exact
    # 2-decimal values, so round(x*100)→BIGINT is exact and every derived
    # measure below is integer arithmetic divided back to double at the end —
    # order-independent and engine-identical (see analytics.py module doc).
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    tax_pct = F.round(F.col("l_tax") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    revenue = (price_c * (100 - disc_pct)).cast("double") / 10000.0
    charge = (price_c * (100 - disc_pct) * (100 + tax_pct)).cast("double") / 1000000.0
    discount_amt = (price_c * disc_pct).cast("double") / 10000.0
    # Weighted composite score (clinical_risk_score analog,
    # fact_adverse_events.py:288-295): deterministic integer arithmetic.
    sales_score = (
        disc_pct * 4 + tax_pct * 3 + F.least(qty * 2, F.lit(100)) * 3
    ).cast("double") / 100.0

    cols = [
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_partkey").alias("part_key"),
        F.col("l_suppkey").alias("supp_key"),
        F.col("o_custkey").alias("cust_key"),
        F.to_date("o_orderdate").alias("order_date"),
        F.to_date("l_shipdate").alias("ship_date"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_delay_days"),
        # Decimal casts of RAW 2dp doubles (measure-cast parity,
        # fact_adverse_events.py:204-222), round-tripped back to DOUBLE for
        # the driver-compared projection: Spark surfaces DECIMAL as
        # decimal.Decimal while DuckDB's client lands float64, so the hash
        # diverges on encoding even when values match. The round-trip is
        # exact for 2dp/4dp-valued sources.
        F.col("l_quantity").cast("decimal(8,2)").cast("double").alias("quantity"),
        F.col("l_extendedprice")
        .cast("decimal(18,2)")
        .cast("double")
        .alias("extended_price"),
        F.col("l_discount").cast("decimal(5,4)").cast("double").alias("discount_rate"),
        F.col("l_tax").cast("decimal(5,4)").cast("double").alias("tax_rate"),
        revenue.alias("revenue"),
        charge.alias("charge"),
        discount_amt.alias("discount_amount"),
        sales_score.alias("sales_score"),
        decode_ladder("l_returnflag", RETURN_FLAG_DECODE).alias("return_status"),
        F.col("l_linestatus").alias("line_status"),
        decode_ladder("o_orderstatus", ORDER_STATUS_DECODE).alias("order_status"),
        decode_ladder("o_orderpriority", ORDER_PRIORITY_DECODE).alias("priority_tier"),
        F.coalesce(F.col("c_name"), F.lit("UNKNOWN")).alias("customer_name"),
        decode_ladder("c_mktsegment", MKTSEGMENT_DECODE).alias("market_segment"),
        bucketize(
            "c_acctbal",
            [0.0, 1000.0, 5000.0],
            ["Delinquent", "Low", "Medium", "High"],
        ).alias("account_tier"),
        F.coalesce(F.col("p_name"), F.lit("UNKNOWN PART")).alias("part_name"),
        F.coalesce(F.col("p_brand"), F.lit("UNKNOWN")).alias("part_brand"),
        F.coalesce(F.col("s_name"), F.lit("UNKNOWN SUPPLIER")).alias("supplier_name"),
        F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("customer_nation"),
        F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("customer_region"),
        # Data-quality tier ladder (fact_adverse_events.py:268-281 analog).
        F.when(
            F.col("p_partkey").isNotNull() & F.col("s_suppkey").isNotNull(),
            F.lit("Complete"),
        )
        .when(F.col("p_partkey").isNotNull(), F.lit("Partial"))
        .otherwise(F.lit("Minimal"))
        .alias("data_quality_tier"),
    ]
    if with_date_dim:
        cols += [
            F.col("date_key").alias("order_date_key"),
            F.col("order_year"),
            F.col("order_quarter"),
            F.col("ordered_on_weekend"),
        ]
    return fact.select(*cols)


FACT_SALES_ORACLE_SQL = """
WITH date_dim AS (
  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2030-12-31',
                                     INTERVAL 1 DAY)) AS DATE) AS date_value
)
SELECT
  l.l_orderkey                                   AS order_key,
  l.l_linenumber                                 AS line_number,
  l.l_partkey                                    AS part_key,
  l.l_suppkey                                    AS supp_key,
  o.o_custkey                                    AS cust_key,
  CAST(o.o_orderdate AS DATE)                    AS order_date,
  CAST(l.l_shipdate AS DATE)                     AS ship_date,
  CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
       AS INTEGER)                               AS ship_delay_days,
  CAST(CAST(l.l_quantity AS DECIMAL(8,2)) AS DOUBLE)       AS quantity,
  CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS extended_price,
  CAST(CAST(l.l_discount AS DECIMAL(5,4)) AS DOUBLE)       AS discount_rate,
  CAST(CAST(l.l_tax AS DECIMAL(5,4)) AS DOUBLE)            AS tax_rate,
  CAST(CAST(round(l.l_extendedprice*100) AS BIGINT)
       * (100 - CAST(round(l.l_discount*100) AS BIGINT)) AS DOUBLE) / 10000.0
                                                 AS revenue,
  CAST(CAST(round(l.l_extendedprice*100) AS BIGINT)
       * (100 - CAST(round(l.l_discount*100) AS BIGINT))
       * (100 + CAST(round(l.l_tax*100) AS BIGINT)) AS DOUBLE) / 1000000.0
                                                 AS charge,
  CAST(CAST(round(l.l_extendedprice*100) AS BIGINT)
       * CAST(round(l.l_discount*100) AS BIGINT) AS DOUBLE) / 10000.0
                                                 AS discount_amount,
  CAST(CAST(round(l.l_discount*100) AS BIGINT) * 4
       + CAST(round(l.l_tax*100) AS BIGINT) * 3
       + least(CAST(round(l.l_quantity) AS BIGINT) * 2, 100) * 3 AS DOUBLE) / 100.0
                                                 AS sales_score,
  CASE l.l_returnflag WHEN 'R' THEN 'Returned' WHEN 'A' THEN 'Accepted'
       WHEN 'N' THEN 'None' ELSE 'Unknown' END   AS return_status,
  l.l_linestatus                                 AS line_status,
  CASE o.o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
       WHEN 'P' THEN 'Partial' ELSE 'Unknown' END AS order_status,
  CASE o.o_orderpriority WHEN '1-URGENT' THEN 'Critical' WHEN '2-HIGH' THEN 'High'
       WHEN '3-MEDIUM' THEN 'Medium' WHEN '4-NOT SPECIFIED' THEN 'Unspecified'
       WHEN '5-LOW' THEN 'Low' ELSE 'Unknown' END AS priority_tier,
  coalesce(c.c_name, 'UNKNOWN')                  AS customer_name,
  CASE c.c_mktsegment WHEN 'AUTOMOBILE' THEN 'Automotive'
       WHEN 'BUILDING' THEN 'Construction' WHEN 'FURNITURE' THEN 'Home Goods'
       WHEN 'HOUSEHOLD' THEN 'Consumer' WHEN 'MACHINERY' THEN 'Industrial'
       ELSE 'Unknown' END                        AS market_segment,
  CASE WHEN c.c_acctbal IS NULL THEN 'Unknown'
       WHEN c.c_acctbal < 0.0 THEN 'Delinquent'
       WHEN c.c_acctbal < 1000.0 THEN 'Low'
       WHEN c.c_acctbal < 5000.0 THEN 'Medium'
       ELSE 'High' END                           AS account_tier,
  coalesce(p.p_name, 'UNKNOWN PART')             AS part_name,
  coalesce(p.p_brand, 'UNKNOWN')                 AS part_brand,
  coalesce(s.s_name, 'UNKNOWN SUPPLIER')         AS supplier_name,
  coalesce(n.n_name, 'UNKNOWN')                  AS customer_nation,
  coalesce(r.r_name, 'UNKNOWN')                  AS customer_region,
  CASE WHEN p.p_partkey IS NOT NULL AND s.s_suppkey IS NOT NULL THEN 'Complete'
       WHEN p.p_partkey IS NOT NULL THEN 'Partial'
       ELSE 'Minimal' END                        AS data_quality_tier,
  CAST(year(dd.date_value)*10000 + month(dd.date_value)*100 + day(dd.date_value)
       AS INTEGER)                               AS order_date_key,
  CAST(year(dd.date_value) AS INTEGER)           AS order_year,
  'Q' || CAST(quarter(dd.date_value) AS VARCHAR) AS order_quarter,
  isodow(dd.date_value) >= 6                     AS ordered_on_weekend
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN part p     ON l.l_partkey = p.p_partkey
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
LEFT JOIN date_dim dd ON CAST(o.o_orderdate AS DATE) = dd.date_value
"""


def decode_ladders_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/§2.7 conditional showcase: decode + bucket orders×customer."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
    return joined.select(
        F.col("o_orderkey").alias("order_key"),
        decode_ladder("o_orderpriority", ORDER_PRIORITY_DECODE).alias("priority_tier"),
        decode_ladder("o_orderstatus", ORDER_STATUS_DECODE).alias("order_status"),
        decode_ladder("c_mktsegment", MKTSEGMENT_DECODE).alias("market_segment"),
        bucketize(
            "c_acctbal",
            [0.0, 1000.0, 5000.0],
            ["Delinquent", "Low", "Medium", "High"],
        ).alias("account_tier"),
        bucketize(
            "o_totalprice",
            [50000.0, 150000.0, 300000.0],
            ["Small", "Medium", "Large", "Jumbo"],
        ).alias("order_size_tier"),
    )
