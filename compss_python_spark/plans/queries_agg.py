"""Declared queries: aggregation surface (SURVEY.md §2.4) + scalar-function
coverage (§2.11 map-expression dialect) + window/sessionization extensions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from compss_python_spark.operators import aggregation
from compss_python_spark.plans.registry import query, table


@query(
    "tpch_q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
             AS sum_base_price,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) / 10000.0
             AS sum_disc_price,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
               * (100 + CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT))) / 1000000.0
             AS sum_charge,
           SUM(CAST(l_quantity AS BIGINT)) / COUNT(*) AS avg_qty,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*)
             AS avg_price,
           SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*)
             AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter → 8-agg hash aggregate (partial/final).

    Money sums are EXACT, not rounded: every monetary input is a true 2-dp
    value (verified: |x*100 − round(x*100)| < 1e-9 across all fixtures), so
    price/discount/tax convert losslessly to integer cents and the three
    sums accumulate as integers in 1e-2/1e-4/1e-6 units — summation-order
    invariant at ANY scale factor.  The round-9 alternative (round the
    double sum at 2 dp) was magnitude-fragile: a 4×10¹² sum leaves the
    2-dp digit inside double-summation ulp, and ROUND itself is
    engine-divergent on inexact doubles.  Here the only float ops are the
    final divisions — each a single IEEE op on identical exact integers in
    both engines, hence bit-identical unrounded.  Averages derive from the
    same exact sums (sum/scale/count, same op order in both engines).
    The cents conversion is FLOOR(x*100 + 0.5), not ROUND(x*100, 0):
    bit-identical here (the value is within 1e-9 of an integer, so the
    +0.5 shift can never cross the next integer and no rounding-mode
    question arises), and 2.4× cheaper on the Spark side — Catalyst
    ROUND on double routes through BigDecimal while FLOOR is one FP
    instruction inside whole-stage codegen (measured at sfgen100:
    cents agg 1.40 s → 0.58 s, within noise of the plain double sum).
    Sums accumulate as DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB SUM(BIGINT)): no int64 overflow even at
    10¹¹-row scale where the charge numerator passes 2⁶³."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
    price_c = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
    disc_c = F.floor(F.col("l_discount") * 100 + F.lit(0.5))
    tax_c = F.floor(F.col("l_tax") * 100 + F.lit(0.5))
    dec = "decimal(38,0)"
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("_qty"),
        F.sum(price_c.cast(dec)).alias("_base_c"),
        F.sum((price_c * (100 - disc_c)).cast(dec)).alias("_disc_n"),
        F.sum((price_c * (100 - disc_c) * (100 + tax_c)).cast(dec)).alias("_charge_n"),
        F.sum(disc_c.cast(dec)).alias("_disc_c"),
        F.count("*").alias("count_order"),
    )
    n = F.col("count_order")
    return g.select(
        "l_returnflag", "l_linestatus",
        F.col("_qty").alias("sum_qty"),
        (F.col("_base_c").cast("double") / 100.0).alias("sum_base_price"),
        (F.col("_disc_n").cast("double") / 10000.0).alias("sum_disc_price"),
        (F.col("_charge_n").cast("double") / 1000000.0).alias("sum_charge"),
        (F.col("_qty") / n).alias("avg_qty"),
        (F.col("_base_c").cast("double") / 100.0 / n).alias("avg_price"),
        (F.col("_disc_c").cast("double") / 100.0 / n).alias("avg_disc"),
        "count_order",
    )


@query(
    "groupby_agg_dict",
    sql="""
    SELECT user_id,
           COUNT(value) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             / COUNT(value) AS mean_v,
           ROUND(MIN(value), 2) AS min_v,
           ROUND(MAX(value), 2) AS max_v,
           COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
)
def groupby_agg_dict(spark, sf_dir):
    """The reference's GroupedDDF.agg({col: funcs}) dict API.

    total/mean derive from the exact integer-cents sum (events.value is
    2-dp by construction) with NO post-rounding: a double SUM/AVG rounded
    to 2/4 dp sat on rounding boundaries at sf0.1 and flipped with
    summation order — and ROUND itself is engine-divergent on inexact
    doubles (Spark half-ups the shortest decimal string, DuckDB rounds the
    binary value).  Identical integer sums + identical division order give
    bit-identical doubles in both engines."""
    ev = table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    out = aggregation.agg(
        ev,
        ["user_id"],
        {
            "value": [("count", "n"), ("min", "min_v"), ("max", "max_v")],
            "cents": [("sum", "_cents")],
            "event_type": [("count_distinct", "n_types")],
        },
    )
    return out.select(
        "user_id", "n",
        (F.col("_cents") / 100.0).alias("total"),
        (F.col("_cents") / 100.0 / F.col("n")).alias("mean_v"),
        F.round("min_v", 2).alias("min_v"),
        F.round("max_v", 2).alias("max_v"),
        "n_types",
    )


@query(
    "groupby_count_sugar",
    sql="""SELECT user_id, event_type, COUNT(*) AS "count" FROM events
           GROUP BY user_id, event_type""",
)
def groupby_count_sugar(spark, sf_dir):
    from compss_python_spark.ddf import DDF
    return DDF(table(spark, sf_dir, "events")).group_by(["user_id", "event_type"]).count().df


@query(
    "agg_first_last_ordered",
    sql="""
    SELECT o_custkey,
           ROUND(MIN_BY(o_totalprice, o_orderkey), 2) AS first_price,
           ROUND(MAX_BY(o_totalprice, o_orderkey), 2) AS last_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_first_last_ordered(spark, sf_dir):
    """Deterministic first/last under explicit in-group order (SURVEY §2.4 trap)."""
    out = aggregation.agg(
        table(spark, sf_dir, "orders"),
        ["o_custkey"],
        {"o_totalprice": [("first", "first_price"), ("last", "last_price")]},
        order_within_group="o_orderkey",
    )
    return out.select(
        "o_custkey",
        F.round("first_price", 2).alias("first_price"),
        F.round("last_price", 2).alias("last_price"),
    )


@query(
    "agg_list_ordered",
    sql="""
    SELECT l_orderkey,
           STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
    FROM lineitem GROUP BY l_orderkey
    """,
)
def agg_list_ordered(spark, sf_dir):
    """collect_list with deterministic in-group order, serialized for hashing."""
    out = aggregation.agg(
        table(spark, sf_dir, "lineitem"),
        ["l_orderkey"],
        {"l_linenumber": [("list", "lines_arr")]},
        order_within_group="l_linenumber",
    )
    return out.select(
        "l_orderkey",
        F.array_join(F.transform("lines_arr", lambda v: v.cast("string")), ",").alias("lines"),
    )


@query(
    "agg_set_sorted",
    sql="""
    SELECT user_id,
           STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types
    FROM events GROUP BY user_id
    """,
)
def agg_set_sorted(spark, sf_dir):
    out = aggregation.agg(
        table(spark, sf_dir, "events"),
        ["user_id"],
        {"event_type": [("set", "types_arr")]},
    )
    return out.select("user_id", F.array_join("types_arr", ",").alias("types"))


@query(
    "distinct_subset",
    sql="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_subset(spark, sf_dir):
    return aggregation.distinct(table(spark, sf_dir, "lineitem"), ["l_returnflag", "l_linestatus"])


@query("count_rows_total", sql="SELECT COUNT(*) AS n FROM lineitem")
def count_rows_total(spark, sf_dir):
    return table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@query(
    "approx_count_distinct",
    sql=None,
)
def approx_count_distinct_q(spark, sf_dir):
    """HLL++ approximate distinct — engine extension; approximate by design
    → rows-only check (exactness asserted in tests within rsd).  Oracled
    sibling: `stats_hyperloglog` reproduces a from-first-principles HLL —
    registers and estimate — exactly in SQL."""
    return table(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts")
    )


@query(
    "cube_two_dims",
    sql="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_two_dims(spark, sf_dir):
    """Engine extension (reference lacks cube/rollup — SURVEY §2.4 note)."""
    return aggregation.cube(
        table(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "rollup_two_dims",
    sql="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_two_dims(spark, sf_dir):
    return aggregation.rollup(
        table(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "pivot_status",
    sql="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark, sf_dir):
    out = aggregation.pivot(
        table(spark, sf_dir, "lineitem"),
        "l_returnflag", "l_linestatus", ["O", "F"],
        F.sum("l_quantity"),
    )
    return out.select("l_returnflag", F.round("O", 2).alias("O"), F.round("F", 2).alias("F"))


# --- scalar-function coverage (reference map/select_expression dialect) ----


@query(
    "string_functions",
    sql="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           LOWER(p_type) AS type_l,
           SUBSTRING(p_name, 1, 5) AS name5,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, '#', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_us,
           TRIM(p_name) AS name_t
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.trim("p_name").alias("name_t"),
    )


@query(
    "date_functions",
    sql="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAY(o_orderdate) AS dom,
           CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
    FROM orders
    """,
)
def date_functions(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
    )


@query(
    "math_functions",
    # Float outputs are scaled to integer BIGINTs (the repo's integer-cents
    # pattern) so the cross-engine comparison never depends on low-order
    # double bits: ROUND(double, n) is representation-sensitive between
    # Spark and DuckDB (round-2 driver red row), while ROUND(x * 10^n) to
    # an integer only diverges if a value sits within one ulp of a .5
    # boundary.  4-dp scaling keeps that window ~1e6× wider than the ulp.
    sql="""
    SELECT o_orderkey,
           CAST(ROUND(ABS(o_totalprice - 250000) * 100) AS BIGINT) AS dist_mid_cents,
           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k,
           CAST(CEIL(o_totalprice / 1000) AS BIGINT) AS price_k_up,
           CAST(ROUND(SQRT(o_totalprice) * 1e4) AS BIGINT) AS price_sqrt_e4,
           CAST(ROUND(LN(o_totalprice) * 1e4) AS BIGINT) AS price_ln_e4,
           MOD(o_orderkey, 7) AS key_mod
    FROM orders
    """,
)
def math_functions(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.abs(F.col("o_totalprice") - 250000) * 100).cast("bigint").alias("dist_mid_cents"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_k"),
        F.ceil(F.col("o_totalprice") / 1000).alias("price_k_up"),
        F.round(F.sqrt("o_totalprice") * 1e4).cast("bigint").alias("price_sqrt_e4"),
        F.round(F.log("o_totalprice") * 1e4).cast("bigint").alias("price_ln_e4"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@query(
    "json_functions",
    sql="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def json_functions(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


# --- window-function extensions (no window aggs in reference — §2.4 note) --


@query(
    "window_running_sum",
    sql="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running
    FROM events
    """,
    headline=True,
)
def window_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running")
    )


@query(
    "window_lag_lead",
    sql="""
    SELECT event_id, user_id,
           ROUND(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_v,
           ROUND(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_v
    FROM events
    """,
)
def window_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id",
        F.round(F.lag("value").over(w), 2).alias("prev_v"),
        F.round(F.lead("value").over(w), 2).alias("next_v"),
    )


@query(
    "tumbling_window_agg",
    sql="""
    SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 300) * 300) AS TIMESTAMP) AS w_start,
           event_type,
           COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT))::BIGINT AS total_cents
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_agg(spark, sf_dir):
    """5-minute tumbling window — F.window in batch mode; identical semantics
    drive the Structured Streaming variant (streaming module).  Window
    totals are integer cents (value is 2-dp): tens of thousands of window
    groups each summing thousands of doubles make an order-flip somewhere
    in the output near-certain at gen SFs (round-12 hardening)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("total_cents"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_cents")
    )


@query(
    "session_window_agg",
    sql="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events),
    sess AS (
      SELECT user_id, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked)
    SELECT user_id, COUNT(DISTINCT sess_id) AS n_sessions, COUNT(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def session_window_agg(spark, sf_dir):
    """Sessionization (30-min gap) via F.session_window in batch mode."""
    ev = table(spark, sf_dir, "events")
    sessions = ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id").agg(
        F.count("*").alias("n")
    )
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("n").alias("n_events")
    )


@query(
    "interval_join_events",
    sql="""
    SELECT l.event_id, l.user_id, l.ts,
           r.event_id AS event_id_r, r.ts AS ts_r
    FROM events l JOIN events r ON l.user_id = r.user_id
    WHERE l.event_type = 'view' AND r.event_type = 'click'
      AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
    """,
)
def interval_join_events(spark, sf_dir):
    """View→click attribution: interval join (right.ts within 10 minutes
    after left.ts) on user_id — the batch twin of
    `streaming.stream_stream_interval_join`, which runs the same plan with
    watermarks bounding the join state."""
    from compss_python_spark.streaming.windows import stream_stream_interval_join

    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return stream_stream_interval_join(views, clicks, within="10 minutes")


@query(
    "hypertable_rollup_time",
    headline=True,
    sql="""
    WITH b AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS h, DATE_TRUNC('day', ts) AS d,
             DATE_TRUNC('month', ts) AS m, value
      FROM events
    )
    SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
                WHEN GROUPING(d) = 0 THEN 'day' ELSE 'month' END AS grain,
           event_type, COALESCE(h, d, m) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total
    FROM b
    GROUP BY GROUPING SETS ((event_type, h, d, m), (event_type, d, m), (event_type, m))
    """,
)
def hypertable_rollup_time(spark, sf_dir):
    """Hypertable-style hierarchical rollup: hour/day/month aggregates of
    events in ONE scan + ONE shuffle via GROUPING SETS (the batch form of a
    continuous aggregate); oracle uses DuckDB GROUPING SETS."""
    from compss_python_spark.operators.aggregation import hypertable_rollup

    ev = table(spark, sf_dir, "events")
    out = hypertable_rollup(
        ev,
        "ts",
        ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    return out.select(
        "grain",
        "event_type",
        F.coalesce("_hour", "_day", "_month").alias("bucket"),
        "n",
        "total",
    )


# --- TPC-H-derived join/agg shapes (classic OLAP coverage) ----------------


@query(
    "tpch_q3_unshipped_orders",
    sql="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1997-03-15'
      AND l_shipdate  > DATE '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_unshipped_orders(spark, sf_dir):
    """TPC-H Q3 shape (o_orderpriority standing in for o_shippriority, which
    the synthetic schema lacks): selective dim filter -> fact join -> top-10.

    Scale shape: customer filtered on mktsegment then BROADCAST (it is the
    small side); lineitem⋈orders is the single big shuffle on orderkey; the
    final ORDER BY..LIMIT compiles to TakeOrderedAndProject (no global sort).
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-03-15"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-03-15"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q6_forecast_revenue",
    sql="""
    SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 10000, 0) AS BIGINT))::BIGINT
             AS revenue_cents4,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan->filter->global agg, zero shuffles beyond the
    single-row final combine.  All three predicates reach the parquet scan
    as PushedFilters; only 4 columns are read (ReadSchema pruning).

    Revenue accumulates as integer 1e-4-dollar units: price and discount
    are both 2-dp, so price*discount*1e4 is an integer recovered EXACTLY by
    a 0-dp round (no per-item loss) — the old ROUND(SUM(double), 4) was a
    single global ~1e10-magnitude double sum whose summation-order error
    exceeds the 4-dp round unit from sfgen100 up (round-12 hardening, same
    class as the sfgen100 q5 digest flip)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000, 0).cast(
                "long"
            )
        ).alias("revenue_cents4"),
        F.count("*").alias("n_items"),
    )


@query(
    "tpch_q18_large_volume_customer",
    sql="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def tpch_q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: agg-driven semi-join (orders whose lineitems sum >150).

    Scale shape: the HAVING subquery is a partial/final hash agg on
    l_orderkey (same key as the subsequent join, so AQE reuses the exchange
    partitioning); the qualifying-keys set is small and joined LEFT SEMI;
    customer is broadcast.  TakeOrderedAndProject caps the result motion.
    """
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 150)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "tpch_q4_order_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (l_shipdate > o_orderdate standing in for the
    commit/receipt-date pair the synthetic schema lacks): EXISTS as a
    LEFT SEMI join with a non-equi residual.

    Scale shape: one shuffle on orderkey; the semi join never materializes
    matched lineitems (early-out per order), and the date filter reaches the
    orders scan as a PushedFilter.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    exists = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return exists.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "tpch_q5_local_supplier_volume",
    sql="""
    SELECT n_name,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))::BIGINT
             AS revenue_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: 6-way join with the customer-nation = supplier-nation
    equality (the classic join-ordering stressor).

    Revenue accumulates as integer CENTS (the q1/q10 convention): the old
    ROUND(SUM(double), 2) rode a per-nation ~1e12-magnitude double sum
    whose summation-order error (~1e-2 at that magnitude) dwarfs the 2-dp
    round unit — it digest-flipped at sfgen100 (round-12 sweep catch).

    Scale shape: region⋈nation⋈supplier collapses to one broadcast chain
    (dims); lineitem⋈orders is the single big shuffle on orderkey; customer
    is broadcast and the c_nationkey = s_nationkey condition rides the
    customer join as an equi-conjunct — no extra exchange for it.
    """
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    sn = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == cust.c_custkey)
            & (F.col("s_nationkey") == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(_net_cents().alias("revenue_cents"))
    )


@query(
    "tpch_q10_returned_items",
    sql="""
    SELECT c_custkey, c_name,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))::BIGINT
             AS revenue_cents,
           n_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, acctbal
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10: returned-item revenue ranking per customer.

    Revenue accumulates as integer CENTS (per-item round then BIGINT sum),
    so the aggregate is summation-order-exact — a plain 2-dp double sum sat
    on a .005 boundary here and flipped between engines.

    Scale shape: returnflag + date filters pushed to the scans; the fact
    shuffle is lineitem⋈orders on orderkey; customer(+nation) is broadcast;
    TakeOrderedAndProject caps result motion at 20 rows.
    """
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy(
            "c_custkey", "c_name", "n_name", F.round("c_acctbal", 2).alias("acctbal")
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("long")
            ).alias("revenue_cents")
        )
        .select("c_custkey", "c_name", "revenue_cents", "n_name", "acctbal")
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14_promo_effect",
    sql="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'
    """,
)
def tpch_q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 (p_type = 'PROMO' standing in for the PROMO%% prefix
    class): conditional-aggregate ratio over a part-dim join.

    Scale shape: the month filter prunes the lineitem scan; part is
    broadcast; one partial/final aggregate, no shuffle of fact rows beyond
    the single-row combine.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-02-01"))
    )
    part = table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0))
                / F.sum(net),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q19_disjunctive_pred",
    sql="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
       OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def tpch_q19_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19 shape (brand/size/quantity standing in for the
    brand/container/quantity triples): OR-of-ANDs across both join sides.

    Scale shape: Catalyst factors the common l_quantity bounds and part-side
    disjuncts out of the OR where possible; part is broadcast so the
    residual disjunction evaluates stream-side with zero extra exchanges.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#4") & sz.between(1, 15) & q.between(1, 20))
        | ((br == "Brand#2") & sz.between(10, 30) & q.between(10, 35))
        | ((br == "Brand#19") & sz.between(20, 50) & q.between(20, 50))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "date_spine_gapfill",
    sql="""
    WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev),
    spine AS (
      -- generate_series takes only constant bounds in DuckDB: enumerate a
      -- fixed day-offset range and keep offsets inside [lo, hi].
      SELECT CAST((SELECT lo FROM b) + g.i * INTERVAL 1 DAY AS DATE) AS day
      FROM generate_series(0, 100000) AS g(i)
      WHERE g.i <= (SELECT DATEDIFF('day', lo, hi) FROM b)
    ),
    types AS (SELECT DISTINCT event_type FROM ev),
    daily AS (SELECT day, event_type, COUNT(*)::BIGINT AS n FROM ev GROUP BY 1, 2)
    SELECT STRFTIME(s.day, '%Y-%m-%d') AS day, t.event_type,
           COALESCE(d.n, 0)::BIGINT AS n
    FROM spine s CROSS JOIN types t
    LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
    """,
)
def date_spine_gapfill(spark, sf_dir):
    """Zero-filled daily counts per event type over a generated date spine —
    the gap-filling shape time-series rollups need (days with no events
    appear with n = 0).

    Scale shape: the spine comes from a 1-row min/max aggregate exploded
    with `sequence` (days × types is tiny and broadcast); the data-bearing
    work is one partial/final hash aggregate of the events scan.
    """
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy("day", "event_type").agg(F.count("*").alias("n"))
    return (
        spine.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


@query(
    "sliding_window_agg",
    sql="""
    SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 300) * 300 - g.k * 300) AS TIMESTAMP)
             AS w_start,
           event_type, COUNT(*) AS n
    FROM events CROSS JOIN generate_series(0, 1) AS g(k)
    GROUP BY 1, 2
    """,
)
def sliding_window_agg(spark, sf_dir):
    """10-minute window sliding by 5 minutes — each event lands in exactly
    two windows (duration/slide = 2), which the oracle enumerates
    explicitly.  Batch twin of `streaming.sliding_window_counts`; the same
    expression runs under Structured Streaming with a watermark."""
    from compss_python_spark.streaming.windows import sliding_window_counts

    return sliding_window_counts(table(spark, sf_dir, "events"))


_CENTS = "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))::BIGINT"


def _net_cents():
    return F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
            "long"
        )
    )


@query(
    "tpch_q7_volume_shipping",
    sql=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,
           {_CENTS} AS revenue_cents
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume between two nations by ship year —
    disjunctive nation-pair predicate spanning BOTH sides of the fact join.

    Scale shape: both nation dims broadcast; the disjunction runs after the
    (broadcast) nation lookups so the only fact shuffle is
    lineitem⋈orders on orderkey; integer-cents revenue (order-exact sum).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_net_cents().alias("revenue_cents"))
    )


@query(
    "tpch_q8_market_share",
    sql="""
    WITH x AS (
      SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS vol_cents,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_cents ELSE 0 END)::DOUBLE
                 / SUM(vol_cents), 6) AS mkt_share
    FROM x GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8: one nation's share of PROMO-part revenue sold into a
    region, per order year — conditional-sum ratio after a 7-table join
    (every dim broadcast; cents ints make numerator/denominator exact)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    x = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("vol_cents"), "supp_nation")
    )
    return x.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol_cents")).otherwise(0)).cast("double")
            / F.sum("vol_cents"),
            6,
        ).alias("mkt_share")
    )


@query(
    "tpch_q9_product_profit",
    sql="""
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
           SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
                           - 0.6 * p_retailprice * l_quantity) * 100, 0) AS BIGINT))::BIGINT
             AS profit_cents
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (synthetic 0.6·retailprice·qty standing in for
    ps_supplycost — the testdata has no partsupp table): profit by supplier
    nation × year over a LIKE-filtered part class."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100,
        0,
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("profit_cents"))
    )


@query(
    "tpch_q13_customer_distribution",
    sql="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*)::BIGINT AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: order-count histogram over customers INCLUDING the
    zero-order tail (left-outer join + count of the nullable side — the
    classic outer-join-then-double-aggregate shape)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    sql=f"""
    WITH rev AS (
      SELECT l_suppkey, {_CENTS} AS total_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_cents
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — scalar
    max over a derived revenue view joined back (ties all surface; cents
    ints make the max well-defined across engines)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(_net_cents().alias("total_cents"))
    mx = rev.agg(F.max("total_cents").alias("_mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_cents") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_cents")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    sql="""
    WITH avgq AS (
      SELECT l_partkey AS pk, AVG(l_quantity) AS aq FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 7.0, 0
           ) AS BIGINT) AS avg_yearly_cents
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON pk = l_partkey
    WHERE p_brand = 'Brand#4' AND l_quantity < 0.5 * aq
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders — per-part average
    threshold (aggregate → rejoin on the SAME key: co-partitioned, AQE
    turns the threshold side into a broadcast at this cardinality).

    The yearly average is derived from an EXACT integer-cents sum, then one
    engine-identical /7.0 + 0-dp round (both inputs bit-equal, and 0-dp
    ROUND of a double < 2^52 agrees between Spark's HALF_UP and DuckDB's
    floor(d+0.5) on every input) — the old ROUND(SUM(double)/7, 2) was a
    global ~1e11 double sum, order-flipped past gen100 (round-12
    hardening).  The l_quantity < 0.5*aq threshold is itself exact: AVG of
    an integer-valued column is an exact-integer sum over a count."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    avgq = li.groupBy(F.col("l_partkey").alias("pk")).agg(F.avg("l_quantity").alias("aq"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avgq, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 7.0,
                0,
            )
            .cast("long")
            .alias("avg_yearly_cents")
        )
    )


@query(
    "tpch_q21_waiting_supplier",
    sql="""
    WITH f_orders AS (
      SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ),
    lines AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN f_orders ON o_orderkey = l_orderkey
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM lines GROUP BY l_orderkey
    ),
    waiters AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lines l JOIN per_order p ON p.l_orderkey = l.l_orderkey
      WHERE l.late AND p.n_supp >= 2 AND p.n_late = 1
    )
    SELECT s_name, COUNT(*)::BIGINT AS numwait
    FROM waiters JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (ship > orderdate+90d standing in for the missing
    receipt/commit dates): suppliers who were the ONLY late shipper on a
    multi-supplier finished order.  The exists / not-exists pair is
    expressed as per-order distinct counts (n_supp ≥ 2, n_late = 1) — one
    aggregation instead of two correlated self-joins."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    waiters = (
        lines.filter("late")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    return (
        waiters.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    sql="""
    WITH avg_bal AS (
      SELECT ROUND(AVG(c_acctbal), 4) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c_custkey % 10 AS seg, COUNT(*)::BIGINT AS numcust,
           SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT))::BIGINT AS totacctbal_cents
    FROM customer
    WHERE c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= DATE '2001-01-01')
    GROUP BY seg
    """,
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (custkey%10 segment standing in for the missing
    phone country code; 'no orders' tightened to 'no 2001 orders' — the
    testdata gives every customer SOME order): lapsed rich customers —
    scalar-subquery threshold (rounded to 4 dp so the cross-engine
    comparison is on a deterministic boundary) + anti-join, by segment."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    )
    ab = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("seg"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).alias("totacctbal_cents"),
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    sql="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT))
               AS unit_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    pc AS (
      SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, unit_cents
      FROM part
      JOIN cost ON l_partkey = p_partkey
      JOIN eu ON s_suppkey = l_suppkey
      WHERE p_size = 25 AND p_type = 'STANDARD'
    ),
    mn AS (SELECT p_partkey AS mk, MIN(unit_cents) AS min_cents FROM pc GROUP BY p_partkey)
    SELECT p_partkey, p_brand, s_suppkey, s_name,
           CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
           unit_cents
    FROM pc JOIN mn ON mk = p_partkey AND unit_cents = min_cents
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (lineitem unit price standing in for the absent
    partsupp.supplycost): for each STANDARD size-25 part, the EUROPE
    supplier(s) offering the minimum observed unit cost.  The correlated
    min-subquery is a per-part aggregate joined back on the SAME key
    (co-partitioned; ties all surface, integer cents keep the min exact
    cross-engine); region/nation/supplier dims broadcast."""
    li = table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0).cast("long")
        ).alias("unit_cents")
    )
    eu = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "STANDARD")
    )
    pc = (
        cost.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "unit_cents")
    )
    mn = pc.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("unit_cents").alias("min_cents")
    )
    return (
        pc.join(
            mn,
            (F.col("mk") == F.col("p_partkey"))
            & (F.col("unit_cents") == F.col("min_cents")),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal") * 100, 0).cast("long").alias("acctbal_cents"),
            "unit_cents",
        )
    )


@query(
    "tpch_q11_important_stock",
    sql="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS value_cents
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey = 3
      GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(value_cents) AS t, COUNT(*) AS np FROM val)
    SELECT l_partkey AS partkey, CAST(value_cents AS BIGINT) AS value_cents
    FROM val, tot
    WHERE value_cents * np > 2 * t
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (lineitem value standing in for partsupp stock
    value): parts whose NATION_3-supplied value exceeds 2× the mean part
    share.  Global threshold = one-row aggregate broadcast back (no second
    scan); all-integer math so the cut is exact cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    val = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * F.round(F.col("l_quantity"), 0).cast("long")
            ).alias("value_cents")
        )
    )
    tot = val.agg(F.sum("value_cents").alias("t"), F.count("*").alias("np"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("np") > 2 * F.col("t"))
        .select(F.col("l_partkey").alias("partkey"), "value_cents")
    )


@query(
    "tpch_q12_late_lines_by_priority",
    sql="""
    SELECT l_returnflag AS flag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def tpch_q12_late_lines_by_priority(spark, sf_dir):
    """TPC-H Q12 shape (returnflag standing in for the absent shipmode;
    ship > order+60d for the absent receipt/commit dates): late lines per
    class split by order priority — join + two conditional counts, one
    partial/final agg."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    sql="""
    WITH links AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part
    JOIN links ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape (distinct lineitem links standing in for partsupp;
    negative balance standing in for the complaints filter): supplier count
    per surviving (brand, type, size) — anti-join the excluded suppliers,
    distinct-count agg (Spark plans it as a two-level partial agg)."""
    li = table(spark, sf_dir, "lineitem")
    links = li.select("l_partkey", "l_suppkey").distinct()
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        links.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_part_promotion",
    sql="""
    WITH h1 AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS q1
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
      GROUP BY l_partkey, l_suppkey
    ),
    yr AS (
      SELECT l_partkey AS yk, SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS qt
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM h1
    JOIN yr ON yk = l_partkey
    JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_2'
    WHERE 2 * q1 > qt
    """,
)
def tpch_q20_part_promotion(spark, sf_dir):
    """TPC-H Q20 shape (H1 shipped volume standing in for partsupp
    availqty): NATION_2 suppliers who moved more than half a part's annual
    ECONOMY volume in the first half of 1996 — two same-key aggregates
    joined (co-partitioned on l_partkey), dims broadcast, integer
    quantities so the half-volume cut is exact."""
    li = table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity"), 0).cast("long")
    h1 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-07-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(q).alias("q1"))
    )
    yr = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy(F.col("l_partkey").alias("yk"))
        .agg(F.sum(q).alias("qt"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        h1.join(yr, F.col("yk") == F.col("l_partkey"))
        .filter(2 * F.col("q1") > F.col("qt"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "window_ntile_percent_rank",
    sql="""
    SELECT event_id, user_id,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_ntile_percent_rank(spark, sf_dir):
    """Ranking-window family (ntile/percent_rank/cume_dist) under a total
    order (ts, event_id tiebreak) — per-key partitions, no global window,
    so the sort is partition-local after one hash exchange.  pr/cd are
    UNROUNDED: each is one IEEE division of exact integers, so the
    doubles match bit-for-bit cross-engine, whereas 6-dp rounding
    diverged at the sfgen10 density (k/3200 terminates at 7 decimals —
    exact ties that Spark HALF_UP and DuckDB half-even round apart)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "agg_exact_percentiles",
    sql="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75
    FROM events GROUP BY event_type
    """,
)
def agg_exact_percentiles(spark, sf_dir):
    """Exact linear-interpolation percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`).  Scale note: exact percentile materializes
    the group's values on one reducer — right for bounded-cardinality
    groups like these; unbounded groups should use approx_percentile
    (t-digest, mergeable map-side) instead, cf. `describe_column`."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 4).alias("p75"),
    )


@query(
    "grouping_sets_mixed",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_mixed(spark, sf_dir):
    """Explicit GROUPING SETS (finer than rollup/cube: an arbitrary subset
    of grouping combinations in ONE pass — Spark expands sets inside a
    single Expand+HashAggregate, no per-set rescan) with GROUPING() ids to
    disambiguate NULL-as-total from NULL-as-value."""
    li = table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.sum(qty).alias("sum_qty"),
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("int")
        .alias("gid"),
    )


@query(
    "array_map_functions",
    sql="""
    WITH t AS (
      SELECT o_orderkey,
             string_split(o_orderpriority, '-') AS parts,
             [o_orderkey % 7, o_orderkey % 11, o_orderkey % 13] AS nums
      FROM orders
    )
    SELECT o_orderkey,
           CAST(len(parts) AS INT) AS n_parts,
           array_to_string(list_sort(parts), '|') AS sorted_parts,
           CAST(list_sum(list_transform(nums, x -> x * x)) AS BIGINT) AS sum_sq,
           CAST(list_max(nums) AS BIGINT) AS mx,
           CAST(len(list_filter(nums, x -> x % 2 = 0)) AS INT) AS n_even
    FROM t
    """,
)
def array_map_functions(spark, sf_dir):
    """Higher-order array functions (transform/filter/aggregate/sort) —
    all per-row JVM expressions, zero shuffle, the building blocks the
    MinHash/embedding paths compose."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    t = o.select(
        "o_orderkey",
        F.split("o_orderpriority", "-").alias("parts"),
        F.array(k % 7, k % 11, k % 13).alias("nums"),
    )
    return t.select(
        "o_orderkey",
        F.size("parts").alias("n_parts"),
        F.array_join(F.array_sort("parts"), "|").alias("sorted_parts"),
        F.aggregate(
            F.transform("nums", lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_sq"),
        F.array_max("nums").alias("mx"),
        F.size(F.filter("nums", lambda x: x % 2 == 0)).alias("n_even"),
    )


@query(
    "regexp_functions",
    sql=r"""
    SELECT doc_id,
           regexp_extract(text, '[0-9]+') AS first_num,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_nums,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+ed\b')) AS INT) AS n_ed_words,
           regexp_replace(text, '[aeiou]', '', 'g')[1:20] AS devoweled20
    FROM documents
    """,
)
def regexp_functions(spark, sf_dir):
    """Regex workhorse functions (extract / extract_all / count-via-len /
    global replace) on free text — Java and RE2 agree on this conservative
    pattern subset (no lookaround, no backrefs), which is exactly the
    subset a portable pipeline should stick to."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "[0-9]+", 0).alias("first_num"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"))).alias("n_nums"),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+ed\b"))).alias("n_ed_words"),
        F.substring(F.regexp_replace("text", "[aeiou]", ""), 1, 20).alias("devoweled20"),
    )


@query(
    "null_semantics",
    sql="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS p
      FROM orders
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(v) AS n_nonnull,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           SUM(CAST(FLOOR(COALESCE(v, 0) * 100 + 0.5) AS BIGINT)) / 100.0
             AS sum_coalesced,
           CAST(SUM(CASE WHEN p IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_p_null_safe,
           CAST(COUNT(NULLIF(p, '1-URGENT')) AS BIGINT) AS n_not_urgent
    FROM t
    """,
)
def null_semantics(spark, sf_dir):
    """NULL semantics end-to-end: aggregate null-skipping (COUNT(col) vs
    COUNT(*)), COALESCE, null-safe equality (<=> / IS NOT DISTINCT FROM),
    NULLIF — the exact behaviors that silently diverge between engines if
    not pinned down.

    sum_coalesced follows the q1 EXACT money-sum convention (integer
    cents via FLOOR(x*100+0.5), ONE final IEEE division): it sums
    o_totalprice over ~2/3 of ALL orders into ONE group — at sfgen100
    that is 2.5×10¹² where 2-dp rounding sits inside double-summation
    ulp (the gen100 digest sweep caught Spark/DuckDB 0.01 apart).  This
    site escaped the round-10 ROUND(money-sum) grep because the sum goes
    through the derived COALESCE column, not o_totalprice directly."""
    o = table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("v"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("p"),
    )
    return t.agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
        (
            F.sum(F.floor(F.coalesce(F.col("v"), F.lit(0.0)) * 100 + F.lit(0.5)))
            / F.lit(100.0)
        ).alias("sum_coalesced"),
        F.sum(F.col("p").eqNullSafe(F.lit(None)).cast("long")).alias("n_p_null_safe"),
        F.count(F.nullif(F.col("p"), F.lit("1-URGENT"))).alias("n_not_urgent"),
    )


@query(
    "unpivot_measures",
    sql="""
    WITH m AS (
      SELECT o_orderpriority,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
             COUNT(*) AS n_orders,
             COUNT(DISTINCT o_custkey) AS n_custs
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, metric, CAST(value AS BIGINT) AS value
    FROM m UNPIVOT (value FOR metric IN (price_cents, n_orders, n_custs))
    """,
)
def unpivot_measures(spark, sf_dir):
    """Wide→long reshaping (unpivot/melt, the inverse of pivot): per-priority
    measures unpivot to (priority, metric, value) rows — a pure Expand
    node, no shuffle beyond the source aggregate."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("price_cents"),
        F.count("*").alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_custs"),
    )
    return m.unpivot(
        ["o_orderpriority"],
        ["price_cents", "n_orders", "n_custs"],
        "metric",
        "value",
    )


@query(
    "agg_bitwise_boolean",
    sql="""
    SELECT o_orderpriority,
           CAST(BIT_AND(o_orderkey % 4096) AS BIGINT) AS key_and,
           CAST(BIT_OR(o_orderkey % 4096) AS BIGINT) AS key_or,
           CAST(BIT_XOR(o_orderkey % 4096) AS BIGINT) AS key_xor,
           BOOL_AND(o_totalprice > 1000) AS all_big,
           BOOL_OR(o_orderstatus = 'F') AS any_finished,
           CAST(COUNT_IF(o_totalprice > 100000) AS BIGINT) AS n_large
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bitwise_boolean(spark, sf_dir):
    """Bitwise (AND/OR/XOR) and boolean (every/any/count_if) aggregates —
    all partial/final combinable, hence map-side combined at any scale."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 4096
    return o.groupBy("o_orderpriority").agg(
        F.bit_and(k).alias("key_and"),
        F.bit_or(k).alias("key_or"),
        F.bit_xor(k).alias("key_xor"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
    )


@query(
    "ansi_safe_functions",
    sql="""
    SELECT o_orderkey,
           ROUND(o_totalprice / NULLIF(o_orderkey % 7, 0), 4) AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER) AS lead_digit
    FROM orders
    """,
)
def ansi_safe_functions(spark, sf_dir):
    """ANSI-mode error-safe functions: try_divide (NULL on zero denominator
    instead of DIVIDE_BY_ZERO), try_cast (NULL on malformed input instead
    of CAST_INVALID_INPUT).  Spark 4 runs ANSI-on by default — every
    pipeline ingesting dirty data needs these, and the engine must make
    them behave identically to NULLIF/TRY_CAST SQL semantics."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 7), 4).alias("safe_div"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("lead_digit"),
    )


@query(
    "string_distance_functions",
    sql="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_type) AS INT) AS lev,
           reverse(p_brand) AS brand_rev,
           repeat(SUBSTRING(p_brand, 1, 2), 3) AS b2x3,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           rpad(p_brand, 12, '.') AS brand_pad,
           translate(p_type, 'AEIOU', 'aeiou') AS type_lowvowel
    FROM part
    """,
)
def string_distance_functions(spark, sf_dir):
    """Edit-distance + padding/translate string kernels (fuzzy matching and
    normalization primitives for entity resolution) — all JVM codegen'd
    expressions, zero shuffle."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("lev"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_brand", 1, 2), 3).alias("b2x3"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_lowvowel"),
    )


@query(
    "timeseries_resample_ffill",
    sql="""
    WITH agg AS (
      SELECT user_id, date_trunc('day', ts) AS bucket, SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
               FROM agg GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
      FROM bounds
    ),
    j AS (
      SELECT s.user_id, s.bucket, a.v
      FROM spine s LEFT JOIN agg a
        ON a.user_id = s.user_id AND a.bucket = s.bucket
    )
    SELECT user_id, bucket,
           ROUND(v, 4) AS v,
           ROUND(last_value(v IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY bucket
                       ROWS UNBOUNDED PRECEDING), 4) AS v_ffill,
           (v IS NULL) AS is_gap
    FROM j
    """,
)
def timeseries_resample_ffill(spark, sf_dir):
    """Gap-filled daily resample of per-user event value (TimescaleDB
    time_bucket_gapfill shape): bucket aggregate -> per-series spine via
    sequence explode -> forward-fill window partitioned by series.  The
    oracle mirrors spine generation and the IGNORE NULLS carry-forward."""
    from compss_python_spark.operators.timeseries import resample_ffill

    out = resample_ffill(
        table(spark, sf_dir, "events"), "user_id", "ts", "value", "day", "sum"
    )
    return out.select(
        "user_id", "bucket", F.round("v", 4).alias("v"),
        F.round("v_ffill", 4).alias("v_ffill"), "is_gap",
    )


@query(
    "timeseries_rolling_zscore",
    sql="""
    WITH r AS (
      SELECT user_id, event_id, value AS v,
             (value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w AS z
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ROUND(v, 4) AS v, ROUND(z, 4) AS z
    FROM r WHERE ABS(ROUND(z, 4)) > 2.5
    """,
)
def timeseries_rolling_zscore(spark, sf_dir):
    """Rolling-window anomaly detection: each event scored against the
    mean/stddev of its 20 PRECEDING events per user (self-excluded frame),
    anomalies = |z| > 2.5.  One series-partitioned ordered window with an
    event_id tiebreak for a deterministic frame."""
    from compss_python_spark.operators.timeseries import rolling_zscore

    out = rolling_zscore(
        table(spark, sf_dir, "events"), "user_id", "ts", "value",
        window_rows=20, tiebreak_col="event_id",
    )
    return (
        out.withColumn("z", F.round("z", 4))
        .filter(F.abs(F.col("z")) > 2.5)
        .select("user_id", "event_id", F.round("v", 4).alias("v"), "z")
    )


@query(
    "timeseries_resample_interpolate",
    sql="""
    WITH agg AS (
      SELECT user_id, date_trunc('day', ts) AS bucket, SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
               FROM agg GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
      FROM bounds
    ),
    j AS (
      SELECT s.user_id, s.bucket, a.v
      FROM spine s LEFT JOIN agg a
        ON a.user_id = s.user_id AND a.bucket = s.bucket
    ),
    wins AS (
      SELECT user_id, bucket, v,
             epoch(bucket) AS t,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN epoch(bucket) END
                        IGNORE NULLS) OVER wp AS pt,
             first_value(v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN epoch(bucket) END
                         IGNORE NULLS) OVER wn AS nt
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket, ROUND(v, 4) AS v,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END, 4)
             AS v_interp,
           (v IS NULL) AS is_gap
    FROM wins
    """,
)
def timeseries_resample_interpolate(spark, sf_dir):
    """Daily resample with LINEAR interpolation across gaps (sensor
    semantics) — same spine as the ffill variant, interpolating on the
    epoch-seconds axis with IGNORE NULLS neighbor windows."""
    from compss_python_spark.operators.timeseries import resample_interpolate

    out = resample_interpolate(
        table(spark, sf_dir, "events"), "user_id", "ts", "value", "day", "sum"
    )
    return out.select(
        "user_id", "bucket", F.round("v", 4).alias("v"),
        F.round("v_interp", 4).alias("v_interp"), "is_gap",
    )


@query(
    "events_transition_matrix",
    sql="""
    WITH l AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_state,
             event_type AS to_state
      FROM events),
    pr AS (SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
           FROM l WHERE from_state IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_state, SUM(n) AS tot FROM pr GROUP BY 1)
    SELECT pr.from_state, pr.to_state, pr.n,
           ROUND(pr.n / t.tot, 6) AS prob
    FROM pr JOIN t USING (from_state)
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transitions over the event stream (clickstream /
    user-journey analysis): one lag window keyed on the user, a
    map-combined pair count, and a broadcast |states|-row normalizer."""
    from compss_python_spark.operators.aggregation import transition_matrix

    ev = table(spark, sf_dir, "events")
    out = transition_matrix(ev, "user_id", "event_type", "ts", "event_id")
    return out.select("from_state", "to_state", "n", F.col("p").alias("prob"))


@query(
    "rfm_segmentation",
    sql="""
    WITH per AS (
      SELECT o_custkey, MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS spend
      FROM orders GROUP BY 1),
    s AS (
      SELECT *,
             NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
             NTILE(4) OVER (ORDER BY n_orders, o_custkey) AS f_score,
             NTILE(4) OVER (ORDER BY spend, o_custkey) AS m_score
      FROM per)
    SELECT o_custkey, last_order, n_orders, spend,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm
    FROM s
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation with EXACT SQL NTILE semantics but no
    single-partition window: ordinal ranks come from the distributed
    range-partitioned prefix-sum (ntile_distributed), and the oracle's
    plain NTILE(4) windows must agree band-for-band."""
    from compss_python_spark.operators.aggregation import rfm_segmentation

    orders = table(spark, sf_dir, "orders")
    out = rfm_segmentation(orders)
    return out.select(
        "o_custkey", "last_order", "n_orders", "spend",
        "r_score", "f_score", "m_score", "rfm",
    )


@query(
    "events_covisitation",
    sql="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS item,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, item,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM g),
    si AS (SELECT DISTINCT user_id, session_no, item FROM s
           WHERE item IS NOT NULL),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b
      FROM si a JOIN si b
        ON a.user_id = b.user_id AND a.session_no = b.session_no
       AND a.item < b.item)
    SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
)
def events_covisitation(spark, sf_dir):
    """Item co-visitation counts (the classic co-occurrence recommender
    signal): JSON item ids, 30-min sessionization, distinct (session,
    item), ordered-pair self-join keyed on the session, one count.  The
    self-join keys on (user, session) — bounded fan-out per session."""
    from compss_python_spark.streaming.windows import sessionize

    ev = table(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", 1800.0, tiebreak="event_id")
    si = (
        sess.select(
            "user_id",
            "session_no",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    a = si.select("user_id", "session_no", F.col("item").alias("item_a"))
    b = si.select("user_id", "session_no", F.col("item").alias("item_b"))
    pairs = a.join(b, ["user_id", "session_no"]).filter(
        F.col("item_a") < F.col("item_b")
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .filter(F.col("n_sessions") >= 2)
    )


@query(
    "timeseries_ewma",
    headline=True,
    sql="""
    WITH base AS (
      SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    j AS (
      SELECT a.user_id, a.ts, a.event_id,
             POWER(0.7, a.rn - b.rn) AS w, b.v
      FROM base a JOIN base b
        ON a.user_id = b.user_id
       AND b.rn <= a.rn AND b.rn > a.rn - 20)
    SELECT user_id, ts, event_id,
           ROUND(SUM(w * v) / SUM(w), 6) AS ewma
    FROM j GROUP BY 1, 2, 3
    """,
)
def timeseries_ewma(spark, sf_dir):
    """Bounded-lookback EWMA (α=0.3, 20 observations) per user over the
    event value series — exact closed-form weights via a BANDED equi-join
    (bucket = rn div L, b-side duplicated into 2 buckets → fan-out ≤ 2L;
    a bare per-entity self-join would be O(n²) per entity).  The oracle's
    naive band join produces the identical result."""
    from compss_python_spark.operators.timeseries import ewma_bounded

    ev = table(spark, sf_dir, "events")
    return ewma_bounded(ev, "user_id", "ts", "value", "event_id", 0.3, 20)


@query(
    "events_last_touch_attribution",
    sql="""
    WITH g AS (
      SELECT user_id, event_id, ts, event_type, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM g),
    a AS (
      SELECT *,
             LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id, session_no ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM s)
    SELECT COALESCE(touch, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT))::BIGINT AS attributed_cents
    FROM a WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def events_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credits the most recent
    preceding view/click in ITS session ('direct' when none).  One
    sessionize window + ONE last_value(ignorenulls, preceding-exclusive)
    window over the same (user → ts) sort — no self-join; the marketing
    analytics workhorse."""
    from pyspark.sql import Window

    from compss_python_spark.streaming.windows import sessionize

    ev = table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", 1800.0, tiebreak="event_id")
    w = (
        Window.partitionBy("user_id", "session_no")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin("view", "click"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    a = s.withColumn("touch", touch)
    return (
        a.filter("event_type = 'purchase'")
        .groupBy(F.coalesce("touch", F.lit("direct")).alias("channel"))
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            # integer cents (value is 2-dp): the per-channel sum spans
            # millions of purchases at gen SFs — a ROUND(SUM(double), 2)
            # there is summation-order-dependent (round-12 hardening)
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "attributed_cents"
            ),
        )
    )


@query(
    "window_time_range_sum",
    sql="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
             AS trailing_hour_value
    FROM events
    """,
)
def window_time_range_sum(spark, sf_dir):
    """TIME-based window frame (RANGE BETWEEN 3600 PRECEDING on the epoch
    axis, floored to whole seconds on BOTH engines — unix_timestamp
    truncates, so the oracle floors too; fractional epochs would disagree
    exactly at frame boundaries): trailing-hour value sum per user — the
    frame every rate-limit /
    rolling-revenue monitor needs; unlike ROWS frames it is tie-safe and
    gap-aware by construction (peer rows share a frame, sparse periods
    shrink it)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("trailing_hour_value"),
    )


@query(
    "timeseries_mad_outliers",
    sql="""
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1),
    mad AS (
      SELECT e.user_id, quantile_cont(ABS(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (user_id) GROUP BY 1)
    SELECT e.event_id, e.user_id,
           ROUND(m.med, 4) AS med, ROUND(d.mad, 4) AS mad,
           ABS(e.value - m.med) > 3.0 * 1.4826 * d.mad AS is_outlier
    FROM events e
    JOIN med m USING (user_id)
    JOIN mad d USING (user_id)
    """,
)
def timeseries_mad_outliers(spark, sf_dir):
    """Robust per-user outlier flags via MAD (median absolute deviation,
    normal-consistency 1.4826): immune to the outliers themselves, unlike
    z-scores.  Two exact per-entity percentile aggregates, no windows."""
    from compss_python_spark.operators.timeseries import mad_outliers

    ev = table(spark, sf_dir, "events")
    out = mad_outliers(ev, "user_id", "value")
    return out.select(
        "event_id",
        "user_id",
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        "is_outlier",
    )
