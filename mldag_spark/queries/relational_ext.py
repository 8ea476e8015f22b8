"""Extended relational coverage: scalar-subquery / EXISTS patterns
(TPC-H q11/q15/q20/q21 shapes adapted to the test schema, which has no
``partsupp`` table or ship/commit/receipt-date triple), plus window
functions (ntile, percent_rank, cume_dist, first/last value), exact
percentiles, correlation statistics, unpivot, and grouping sets.

Scale notes:

- scalar subqueries (the q11/q15 HAVING/WHERE thresholds) become a
  1-row aggregate cross-joined (Spark auto-broadcasts a 1-row side;
  BroadcastNestedLoopJoin over one row is free) — never a driver-side
  ``.collect()`` round trip, so one job, no eager materialization.
- the q21 EXISTS/NOT-EXISTS pair is rewritten as a single per-order
  aggregate + join, which replaces two correlated semi/anti joins
  (each a full shuffle of lineitem) with ONE shuffle on l_orderkey.
- window queries partition by a real key (priority, nation) so work
  distributes; no global single-partition windows except over
  already-aggregated tiny frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from mldag_spark.queries import register
from mldag_spark.queries.tables import davg, dim, dsum, load


# ---------------------------------------------------------------------------
# q11 shape: aggregate + HAVING against a scalar subquery of the total
# ---------------------------------------------------------------------------
@register(
    "q11_part_value_concentration",
    oracle="""
    SELECT l_partkey,
           CAST(ROUND(SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6))), 2) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6))) >
           (SELECT SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6)))
                   * 0.0008
            FROM lineitem)
    """,
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose traded value exceeds 0.12% of total traded value.

    TPC-H q11 pattern (group HAVING > scalar subquery), adapted from
    partsupp to lineitem. The total is a 1-row aggregate broadcast into
    the filter — no collect, no second scan of the grouped result.
    """
    l = load(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    dvalue = value.cast("decimal(18,6)")
    per_part = l.groupBy("l_partkey").agg(F.sum(dvalue).alias("_val"))
    total = l.agg(
        (F.sum(dvalue) * F.lit("0.0008").cast("decimal(8,6)")).alias(
            "_threshold"
        )
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_val") > F.col("_threshold"))
        .select(
            "l_partkey",
            F.round("_val", 2).cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# q15 shape: aggregate view + WHERE = (SELECT MAX(...) FROM view)
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey,
               SUM(CAST((l_extendedprice * (1 - l_discount))
                        AS DECIMAL(18,6))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max revenue in 1997Q1 (TPC-H q15 pattern).

    The max-of-aggregate is an empty-frame window over the ~|suppliers|
    aggregated rows (tiny), not a re-scan of lineitem: one fact shuffle
    total. Ties (several suppliers at the max) are kept, like q15.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = l.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("_rev")
    )
    top = revenue.withColumn(
        "_max", F.max("_rev").over(Window.partitionBy())
    ).filter(F.col("_rev") == F.col("_max"))
    s = dim(spark, sf_dir, "supplier")
    return top.join(s, top.l_suppkey == s.s_suppkey).select(
        "s_suppkey",
        "s_name",
        F.round("_rev", 2).cast("double").alias("total_revenue"),
    )


# ---------------------------------------------------------------------------
# q20 shape: IN-subquery chain (semi join against an aggregated filter)
# ---------------------------------------------------------------------------
@register(
    "q20_heavy_small_part_suppliers",
    oracle="""
    WITH heavy AS (
        SELECT l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM heavy
        WHERE qty > (SELECT AVG(qty) * 1.1 FROM heavy)
    )
    """,
)
def q20_heavy_small_part_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Suppliers that moved 10%-above-average volume of 'small *' parts
    (q20 shape: nested IN subqueries → broadcast semi joins). The
    threshold is RELATIVE (1.1 × mean per-supplier quantity), so the
    query stays selective at every scale factor.

    part is broadcast into lineitem (semi), the aggregate runs
    map-side-partial on l_suppkey, the mean is a window over the tiny
    aggregated frame, and the surviving supplier key set (tiny)
    semi-joins supplier.
    """
    p = dim(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    l = load(spark, sf_dir, "lineitem")
    heavy = (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .withColumn("_avg", F.avg("_qty").over(Window.partitionBy()))
        .filter(F.col("_qty") > F.col("_avg") * 1.1)
    )
    s = load(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))


# ---------------------------------------------------------------------------
# q21 shape: EXISTS + NOT EXISTS over sibling lineitems of an order
# ---------------------------------------------------------------------------
@register(
    "q21_sole_late_supplier",
    oracle="""
    WITH lat AS (
        SELECT l_orderkey, l_suppkey,
               CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
    ),
    ord AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
        FROM lat GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(DISTINCT lat.l_orderkey) AS numwait
    FROM lat
    JOIN ord ON ord.l_orderkey = lat.l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE lat.late = 1 AND ord.n_supp >= 2 AND ord.n_late = 1
    GROUP BY s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper in multi-supplier
    finished orders ("late" = shipped > 90 days after order date, since
    the schema has no commit/receipt dates).

    TPC-H q21's correlated EXISTS (another supplier in the order) +
    NOT EXISTS (no OTHER late supplier) is algebraized into one
    per-order aggregate — n_supp ≥ 2 ∧ n_late = 1 ∧ this row late —
    replacing two extra correlated shuffles of lineitem with one
    groupBy(l_orderkey) that reuses the join shuffle's partitioning.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    lat = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            )
            .cast("int")
            .alias("late"),
        )
    )
    ord_stats = lat.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    s = dim(spark, sf_dir, "supplier")
    return (
        lat.filter(F.col("late") == 1)
        .join(ord_stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(s, lat.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# window: NTILE decile segmentation
# ---------------------------------------------------------------------------
@register(
    "window_ntile_price_deciles",
    oracle="""
    SELECT o_orderpriority, tile,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST((o_totalprice) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 2) AS avg_price
    FROM (
        SELECT o_orderpriority, o_totalprice,
               NTILE(10) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS tile
        FROM orders
    )
    GROUP BY o_orderpriority, tile
    """,
)
def window_ntile_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile segmentation of order value within each priority class
    (NTILE), aggregated per tile. The window partitions by priority so
    the sort distributes; (o_totalprice, o_orderkey) ordering makes
    tile assignment deterministic under ties.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        o.withColumn("tile", F.ntile(10).over(w))
        .groupBy("o_orderpriority", "tile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            davg("o_totalprice", 2).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# window: percent_rank / cume_dist / first_value / last_value
# ---------------------------------------------------------------------------
@register(
    "window_supplier_balance_ranks",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 4) AS cume,
           FIRST_VALUE(s_suppkey) OVER w   AS poorest_supp,
           LAST_VALUE(s_suppkey) OVER (
               PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS richest_supp
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def window_supplier_balance_ranks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """percent_rank + cume_dist + first/last_value over suppliers per
    nation. last_value uses an explicit unbounded frame (the default
    RANGE … CURRENT ROW frame would return the current row — a classic
    trap both engines share).
    """
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.first("s_suppkey").over(w).alias("poorest_supp"),
        F.last("s_suppkey").over(w_full).alias("richest_supp"),
    )


# ---------------------------------------------------------------------------
# aggregate: exact percentiles (linear interpolation)
# ---------------------------------------------------------------------------
@register(
    "agg_price_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25,
           ROUND(MEDIAN(l_extendedprice), 4)              AS p50,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS p75,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear-interpolated, matching QUANTILE_CONT).

    Exact percentile is a full-sort aggregate — right for audits at
    moderate group cardinality; the approx_percentile variant in
    ``agg_approx_distinct_counts``'s family is the 100 TB default.
    """
    l = load(spark, sf_dir, "lineitem")
    # r16 (guide §5): four separate percentile/median aggregates each
    # built and serialized their OWN value→count map buffer over the
    # same column (median IS percentile 0.5 — Catalyst rewrites it to
    # the same Percentile class). The array form computes all four
    # quantiles from ONE shared buffer with the same per-percentage
    # interpolation, so every value is bit-identical (probed at sf0.1;
    # oracle hash-gated). Measured: 5.2 → 1.85 s warm at sf0.1.
    ps = F.percentile(
        "l_extendedprice",
        F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.99)),
    )
    return (
        l.groupBy("l_returnflag")
        .agg(ps.alias("_ps"))
        .select(
            "l_returnflag",
            F.round(F.col("_ps")[0], 4).alias("p25"),
            F.round(F.col("_ps")[1], 4).alias("p50"),
            F.round(F.col("_ps")[2], 4).alias("p75"),
            F.round(F.col("_ps")[3], 4).alias("p99"),
        )
    )


# ---------------------------------------------------------------------------
# aggregate: correlation / covariance / dispersion statistics
# ---------------------------------------------------------------------------
@register(
    "agg_quantity_price_stats",
    oracle="""
    SELECT l_linestatus,
           ROUND(CORR(l_quantity, l_extendedprice), 4)       AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           ROUND(STDDEV_SAMP(l_discount), 6)                 AS disc_stddev,
           ROUND(VAR_POP(l_tax), 6)                          AS tax_var
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_quantity_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr/covar/stddev/variance) — all
    single-pass partial-aggregable moments, so they scale like SUM."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("disc_stddev"),
        F.round(F.var_pop("l_tax"), 6).alias("tax_var"),
    )


# ---------------------------------------------------------------------------
# reshape: unpivot (wide → long)
# ---------------------------------------------------------------------------
@register(
    "unpivot_revenue_components",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               CAST(ROUND(SUM(CAST((l_extendedprice) AS DECIMAL(18,6))), 2) AS DOUBLE)                AS gross,
               CAST(ROUND(SUM(CAST((l_extendedprice * l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)   AS discount_given,
               CAST(ROUND(SUM(CAST((l_extendedprice * l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE)        AS tax_collected
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, component, amount FROM (
        SELECT l_returnflag, 'gross' AS component, gross AS amount FROM wide
        UNION ALL
        SELECT l_returnflag, 'discount_given', discount_given FROM wide
        UNION ALL
        SELECT l_returnflag, 'tax_collected', tax_collected FROM wide
    )
    """,
)
def unpivot_revenue_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide aggregate → long (component, amount) rows via unpivot/melt —
    the inverse of ``agg_pivot_event_values``. Unpivot is a zero-shuffle
    row-expansion (Expand node), so it's free at any scale."""
    l = load(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        dsum("l_extendedprice", 2).alias("gross"),
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias(
            "discount_given"
        ),
        dsum(F.col("l_extendedprice") * F.col("l_tax"), 2).alias(
            "tax_collected"
        ),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["gross", "discount_given", "tax_collected"],
        "component",
        "amount",
    )


# ---------------------------------------------------------------------------
# aggregate: GROUPING SETS (beyond rollup/cube)
# ---------------------------------------------------------------------------
@register(
    "agg_grouping_sets_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets_flag_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Explicit GROUPING SETS — the per-flag and per-status marginals
    plus the grand total, WITHOUT the (flag, status) cross cells that
    rollup/cube would add. One Expand + one shuffle."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# full-outer join (completes the join-flavor matrix: inner/left/right/
# semi/anti/cross are covered elsewhere — SURVEY.md §2.3 "joins (all
# flavors)")
# ---------------------------------------------------------------------------
@register(
    "join_full_outer_daily_activity",
    oracle="""
    SELECT COALESCE(o.d, s.d) AS d,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(s.n_ship, 0)   AS n_ship
    FROM (SELECT o_orderdate AS d, COUNT(*) AS n_orders
          FROM orders GROUP BY 1) o
    FULL OUTER JOIN
         (SELECT l_shipdate AS d, COUNT(*) AS n_ship
          FROM lineitem GROUP BY 1) s
      ON o.d = s.d
    """,
)
def join_full_outer_daily_activity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily order-placement vs shipment calendars, FULL OUTER joined
    so days present on only one side survive with a zero count.

    Both sides aggregate BEFORE the join (map-side partial → one
    shuffle each), so the full-outer join — which Spark can only
    execute as a shuffle join, never broadcast — runs over two
    date-cardinality inputs, not the raw facts. That ordering is what
    keeps this plan viable at 100 TB: ~2.5k distinct days regardless
    of fact-table size."""
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    s = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_ship"))
    )
    return (
        o.withColumnRenamed("d", "d_o")
        .join(s.withColumnRenamed("d", "d_s"), F.col("d_o") == F.col("d_s"), "full")
        .select(
            F.coalesce("d_o", "d_s").alias("d"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ship", F.lit(0)).alias("n_ship"),
        )
    )


# ---------------------------------------------------------------------------
# RANGE-frame window: trailing 30-day moving average (value-range
# frame, vs the rowsBetween running frames used elsewhere)
# ---------------------------------------------------------------------------
@register(
    "window_range_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS sum_30d,
           COUNT(*) OVER w AS n_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer trailing-30-day spend via a rangeBetween frame
    over epoch seconds.

    RANGE frames (unlike ROWS) include ORDER-BY peers symmetrically,
    so ties on the sort key are deterministic — required for the
    value-hash gate. The windowed aggregate runs over DECIMAL, not
    DOUBLE: sliding-frame sums are order-of-evaluation-dependent in
    the last float bit (Spark recomputes, DuckDB uses segment trees),
    and decimal arithmetic is exact on both engines. Partitioning is
    by customer, so the window never concentrates on one task. The
    sort key is an epoch computed from the NTZ timestamp's own fields
    (unix_date + time-of-day), independent of
    ``spark.sql.session.timeZone`` — unlike unix_timestamp, whose
    NTZ→instant conversion shifts by 3600 s across DST transitions and
    can flip inclusion of exactly-30-day-old rows vs DuckDB's epoch()."""
    o = load(spark, sf_dir, "orders")
    epoch = (
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long") * 86400
        + F.hour("o_orderdate") * 3600
        + F.minute("o_orderdate") * 60
        + F.second("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_30d"),
        F.count(F.lit(1)).over(w).alias("n_30d"),
    )


# ---------------------------------------------------------------------------
@register(
    "join_right_customer_ordercounts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_right_customer_ordercounts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RIGHT OUTER join flavor: preserve every customer, count their
    orders (0 for order-less customers via COUNT of a nullable key).
    Spark plans this as the mirrored left-outer; with the customer
    side small it broadcasts and the fact side never shuffles."""
    o = load(spark, sf_dir, "orders")
    c = dim(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
@register(
    "agg_price_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-division bucketing — a pure
    projection before the aggregate, so the shuffle carries one row
    per bucket per partition (map-side partial), independent of data
    volume. min/max are order-independent, no decimal guard needed."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000)
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# aggregate: re-aggregable HLL sketches (partial sketches unioned up a
# hierarchy — the layout for incremental/rollup distinct counting)
# ---------------------------------------------------------------------------
@register(
    "agg_hll_partitioned_union",
    # The sketch estimate is engine-specific; the gate checks the
    # oracle-able invariant: exact counts plus a boolean asserting the
    # unioned estimate landed within 5% (default lgConfigK=12 HLL has
    # ~1.6% standard error).
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts_exact,
           TRUE AS union_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_hll_partitioned_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregable distinct counting: build an HLL sketch per
    (returnflag, linestatus) cell, union the binary sketches up to the
    returnflag level, estimate there.

    This is the 100 TB pattern approx_count_distinct can't express:
    partial sketches persist per partition/day and re-aggregate to any
    rollup level without rescanning raw data — mergeability is the
    whole point of the sketch. The gate asserts the union's estimate
    stays within 5% of exact."""
    l = load(spark, sf_dir, "lineitem")
    cells = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    unioned = cells.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts_exact")
    )
    return exact.join(unioned, "l_returnflag").select(
        "l_returnflag",
        "n_parts_exact",
        (
            F.abs(F.col("est") - F.col("n_parts_exact"))
            / F.col("n_parts_exact")
            <= 0.05
        ).alias("union_within_5pct"),
    )


# ---------------------------------------------------------------------------
# aggregate: approximate percentile with a rank-band invariant
# ---------------------------------------------------------------------------
@register(
    "agg_approx_percentile_invariant",
    oracle="""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_extendedprice), 4) AS p50_exact,
           TRUE AS approx_in_rank_band
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile_invariant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """approx_percentile (Greenwald-Khanna, accuracy=10000 → rank
    error <= n/10000) gated by its own contract: the sketch's median
    must lie between the exact 0.49 and 0.51 quantiles. The exact
    median hash-matches the oracle; the band check verifies the
    sketch — no dependence on the engine-specific estimate value."""
    l = load(spark, sf_dir, "lineitem")
    # r16 (guide §5), same fix as agg_price_percentiles: the three
    # exact quantiles (0.5 and the 0.49/0.51 band edges) now share ONE
    # Percentile buffer via the array form instead of building three;
    # identical interpolation per percentage, values probed
    # bit-identical at sf0.1. Measured: 3.05 → 1.41 s warm.
    q3 = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.49), F.lit(0.51))
    )
    return (
        l.groupBy("l_returnflag")
        .agg(
            q3.alias("_q"),
            F.percentile_approx(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("_ap"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("_q")[0], 4).alias("p50_exact"),
            F.col("_ap")
            .between(F.col("_q")[1], F.col("_q")[2])
            .alias("approx_in_rank_band"),
        )
    )


@register(
    "dq_lineitem_expectations",
    oracle="""
    WITH agg AS (
        SELECT
            CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
            CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_quantity,
            CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS discount_out_of_range,
            CAST(SUM(CASE WHEN l_shipdate < DATE '1992-01-01'
                          OR l_shipdate > DATE '1998-12-31' THEN 1 ELSE 0 END) AS BIGINT) AS shipdate_out_of_range,
            CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_price,
            CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
    )
    SELECT rule, violations, n_rows,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
    FROM (
        SELECT 'null_orderkey' AS rule, null_orderkey AS violations, n_rows FROM agg
        UNION ALL SELECT 'nonpositive_quantity', nonpositive_quantity, n_rows FROM agg
        UNION ALL SELECT 'discount_out_of_range', discount_out_of_range, n_rows FROM agg
        UNION ALL SELECT 'shipdate_out_of_range', shipdate_out_of_range, n_rows FROM agg
        UNION ALL SELECT 'negative_price', negative_price, n_rows FROM agg
    )
    ORDER BY rule
    """,
)
def dq_lineitem_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over lineitem: declarative
    rules (null keys, non-positive quantities, out-of-range discounts
    and ship dates, negative prices) evaluated as ONE map-side
    conditional-sum pass — a single scan and a 1-row shuffle no matter
    how many rules are declared — then unpivoted to (rule, violations,
    passed) rows, the contract layout a pipeline's quality gate
    consumes. Adding a rule adds a codegen'd sum expression, not a
    scan."""
    li = load(spark, sf_dir, "lineitem")
    rules = {
        "null_orderkey": F.col("l_orderkey").isNull(),
        "nonpositive_quantity": F.col("l_quantity") <= 0,
        "discount_out_of_range": (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1),
        "shipdate_out_of_range": (F.col("l_shipdate") < F.lit("1992-01-01"))
        | (F.col("l_shipdate") > F.lit("1998-12-31")),
        "negative_price": F.col("l_extendedprice") < 0,
    }
    agg = li.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in rules.items()
        ],
        F.count(F.lit(1)).alias("n_rows"),
    )
    stack = ", ".join(f"'{name}', {name}" for name in rules)
    return (
        agg.select(
            F.expr(
                f"stack({len(rules)}, {stack}) AS (rule, violations)"
            ),
            "n_rows",
        )
        .select(
            "rule",
            "violations",
            "n_rows",
            F.when(F.col("violations") == 0, 1).otherwise(0)
            .cast("int")
            .alias("passed"),
        )
        .orderBy("rule")
    )


@register(
    "dq_orphan_audit",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'events.user_id->customer',
           CAST(COUNT(*) AS BIGINT)
    FROM events e WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def dq_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for the
    five FK relationships of the star schema (orders→customer,
    lineitem→orders/part/supplier, events→customer) — the multi-table
    companion to the single-table ``dq_lineitem_expectations`` suite.

    Plan: each FK check is a LEFT ANTI join counting the survivors.
    The dimension-keyed checks anti-join against broadcast dimension
    key columns (customer/part/supplier projected to their single key
    column before the hint — at 100 TB you broadcast keys, not
    tables); the fact→fact check (lineitem→orders) stays a shuffled
    join keyed on orderkey. Five independent 1-row aggregates union
    into the report, so the audit parallelizes across checks and no
    check rescans another's tables."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    part = load(spark, sf_dir, "part").select("p_partkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")

    def orphans(fact, fk_col, dim, dim_key, name, broadcast_dim=True):
        d = F.broadcast(dim) if broadcast_dim else dim
        return (
            fact.select(F.col(fk_col))
            .join(d, fact[fk_col] == dim[dim_key], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    checks = [
        orphans(o, "o_custkey", cust, "c_custkey",
                "orders.o_custkey->customer"),
        orphans(li, "l_orderkey", o.select("o_orderkey"), "o_orderkey",
                "lineitem.l_orderkey->orders", broadcast_dim=False),
        orphans(li, "l_partkey", part, "p_partkey",
                "lineitem.l_partkey->part"),
        orphans(li, "l_suppkey", supp, "s_suppkey",
                "lineitem.l_suppkey->supplier"),
        orphans(ev, "user_id", cust, "c_custkey",
                "events.user_id->customer"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_PROFILE_ORACLE = """
    WITH agg AS (
        SELECT
            COUNT(*) AS n_rows,
%s
        FROM lineitem
    )
    SELECT col, n_rows, n_null, n_distinct, min_val, max_val, avg_val
    FROM (
%s
    )
""" % (
    ",\n".join(
        f"""            CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {c}_null,
            CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}_distinct,
            ROUND(MIN(CAST({c} AS DOUBLE)), 4) AS {c}_min,
            ROUND(MAX(CAST({c} AS DOUBLE)), 4) AS {c}_max,
            ROUND(AVG(CAST({c} AS DOUBLE)), 4) AS {c}_avg"""
        for c in _PROFILE_COLS
    ),
    "\n        UNION ALL ".join(
        f"SELECT '{c}' AS col, n_rows, {c}_null AS n_null, "
        f"{c}_distinct AS n_distinct, {c}_min AS min_val, "
        f"{c}_max AS max_val, {c}_avg AS avg_val FROM agg"
        for c in _PROFILE_COLS
    ),
)


@register("dq_column_profile", oracle=_PROFILE_ORACLE)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of lineitem's numeric measures — the
    audit a pipeline runs before trusting a new table drop: null
    count, exact distinct cardinality, min/max/avg. ONE scan: every
    metric is an aggregate expression in a single pass (Spark plans
    the multi-column exact COUNT(DISTINCT) via Expand — one shuffle
    whose width is |columns|, not a scan per column), then a stack()
    unpivot to the (col, metrics...) contract rows. At 100 TB swap
    the exact distincts for approx_count_distinct and drop the
    oracle-exactness — the plan shape is unchanged; the exact form
    is kept here because DuckDB can mirror it bit-for-bit."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{c}_null"),
            F.count_distinct(F.col(c)).alias(f"{c}_distinct"),
            F.round(F.min(F.col(c).cast("double")), 4).alias(f"{c}_min"),
            F.round(F.max(F.col(c).cast("double")), 4).alias(f"{c}_max"),
            F.round(F.avg(F.col(c).cast("double")), 4).alias(f"{c}_avg"),
        ]
    agg = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}_null, {c}_distinct, {c}_min, {c}_max, {c}_avg"
        for c in _PROFILE_COLS
    )
    return agg.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(col, n_null, n_distinct, min_val, max_val, avg_val)"
        ),
        "n_rows",
    ).select(
        "col", "n_rows", "n_null", "n_distinct", "min_val", "max_val", "avg_val"
    )


# ---------------------------------------------------------------------------
# Record linkage: blocked fuzzy matching (entity resolution)
# ---------------------------------------------------------------------------
@register(
    "link_fuzzy_part_names",
    oracle="""
    WITH names AS (
        SELECT p_name,
               COUNT(*) AS n_parts,
               string_split(p_name, ' ')[1] AS w1,
               string_split(p_name, ' ')[2] AS w2
        FROM part GROUP BY p_name
    ), blocked AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        FROM names a JOIN names b
          ON a.w1 = b.w1 AND a.p_name < b.p_name
        UNION
        SELECT a.p_name, b.p_name, a.n_parts, b.n_parts
        FROM names a JOIN names b
          ON a.w2 = b.w2 AND a.p_name < b.p_name
    )
    SELECT name_a, name_b,
           levenshtein(name_a, name_b) AS edit_dist,
           n_parts_a, n_parts_b
    FROM blocked
    WHERE levenshtein(name_a, name_b) <= 3
    """,
)
def link_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via multi-pass blocking + edit-distance
    verification: near-identical part names (Levenshtein <= 3) found
    WITHOUT an all-pairs comparison.

    The canonical record-linkage plan (Fellegi-Sunter blocking; the
    same shape Dedupe/Splink run on Spark): candidate pairs are
    generated only WITHIN blocks — here two passes, one keyed on the
    name's first token and one on its second — then verified with the
    expensive string metric. Each pass is an equi-join on the block
    key (shuffle-partitionable, skew-saltable like any other join);
    the N² comparison never happens. Multi-pass blocking is the
    standard recall repair for single-key blocking: a pair disagreeing
    in one token still shares the other pass's block. UNION (set)
    dedups pairs caught by both passes.

    ``F.levenshtein`` and DuckDB ``levenshtein`` compute the same
    classic edit distance, so the verification is oracle-exact. At
    100 TB the names table is the DISTINCT key set (already
    aggregated, orders of magnitude smaller than the fact table);
    per-block fan-out is bounded by block cardinality — the operative
    scale knob is block-key choice, not corpus size."""
    p = load(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("w1", F.split("p_name", " ").getItem(0))
        .withColumn("w2", F.split("p_name", " ").getItem(1))
    )

    def _pass(key: str) -> DataFrame:
        a = names.alias("a")
        b = names.alias("b")
        return a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        ).select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )

    blocked = _pass("w1").union(_pass("w2")).distinct()
    dist = F.levenshtein("name_a", "name_b")
    return (
        blocked.withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") <= 3)
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
    )
