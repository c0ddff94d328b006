"""Declared queries: scans, projections, filters, casts, missing-data,
joins, sorts, set ops (SURVEY.md §2.1–2.3, §2.5, §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from compss_python_spark.operators import etl, joins, setops
from compss_python_spark.operators import sort as sort_ops
from compss_python_spark.operators.layout import zorder_sql
from compss_python_spark.plans.registry import query, table


# --- flagship -------------------------------------------------------------


@query(
    "flagship_revenue_by_nation",
    sql="""
    SELECT n_name,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) / 10000.0
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
      AND r_name IN ('AMERICA', 'ASIA')
    GROUP BY n_name
    """,
    headline=True,
)
def flagship_revenue_by_nation(spark, sf_dir):
    """Star join: fact ⋈ 4 dims, date filter, agg, per SURVEY.md §7 step 1.

    Scale shape: lineitem/orders shuffle once on orderkey (the only big⋈big
    join); customer/nation/region are broadcast — no shuffle of the fact side
    for them.  Filters reach the parquet scan (PushedFilters).

    Revenue follows the q1 EXACT money-sum convention (integer 1e-4-dollar
    units summed as BIGINT, ONE final IEEE division) instead of rounding
    the double sum: the sfgen100 oracle sample caught the 4-dp round
    flipping on a 3.7×10¹⁰ sum (summation-order ulp reaches the 4th
    decimal at that magnitude — the same class as the round-9 q1 fix).
    Cents via FLOOR(x*100+0.5) — identical to ROUND on true-2-dp inputs
    and 2.4× cheaper (one FP op in codegen vs BigDecimal; see q1).
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                    * (100 - F.floor(F.col("l_discount") * 100 + F.lit(0.5)))
                )
                / F.lit(10000.0)
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- §2.2 projections / filters ------------------------------------------


@query(
    "select_project",
    sql="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def select_project(spark, sf_dir):
    return etl.select(table(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber", "l_quantity"])


@query(
    "select_expression",
    sql="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
)
def select_expression(spark, sf_dir):
    return etl.select_expression(
        table(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_linenumber",
        "round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge",
    )


@query(
    "filter_pandas_query",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
    """,
)
def filter_pandas_query(spark, sf_dir):
    """Reference-dialect predicate string goes through the translator."""
    df = etl.filter_rows(
        table(spark, sf_dir, "lineitem"),
        "(l_returnflag == 'R') and (l_quantity > 30)",
    )
    return etl.select(df, ["l_orderkey", "l_linenumber", "l_quantity"])


@query(
    "map_column",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS bucket
    FROM orders
    """,
)
def map_column(spark, sf_dir):
    df = etl.map_column(
        table(spark, sf_dir, "orders"),
        "bucket",
        "CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END",
    )
    return df.select("o_orderkey", "bucket")


@query(
    "cast_types",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
           CAST(l_orderkey AS VARCHAR) AS key_str
    FROM lineitem
    """,
)
def cast_types(spark, sf_dir):
    # date output re-cast to string: pandas renders Spark DATE as
    # datetime.date but DuckDB DATE as midnight Timestamp — string form is
    # engine-invariant.
    df = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("qty_int"),
        F.col("l_shipdate").alias("ship_date"),
        F.col("l_orderkey").alias("key_str"),
    )
    out = etl.cast(df, ["qty_int", "ship_date", "key_str"], ["integer", "date", "string"])
    return out.withColumn("ship_date", F.col("ship_date").cast("string"))


@query(
    "rename_drop",
    sql="SELECT o_orderkey AS okey, o_totalprice AS price FROM orders",
)
def rename_drop(spark, sf_dir):
    df = table(spark, sf_dir, "orders")
    df = etl.rename(df, {"o_orderkey": "okey", "o_totalprice": "price"})
    return etl.drop_columns(df, ["o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority"])


@query(
    "replace_values",
    sql="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FINISHED'
                ELSE o_orderstatus END AS status
    FROM orders
    """,
)
def replace_values(spark, sf_dir):
    df = table(spark, sf_dir, "orders").withColumnRenamed("o_orderstatus", "status")
    df = etl.replace_values(df, {"O": "OPEN", "F": "FINISHED"}, subset=["status"])
    return df.select("o_orderkey", "status")


# --- clean_missing (nulls manufactured via NULLIF — testdata has none) ----


@query(
    "clean_missing_drop_row",
    sql="""
    SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc
    FROM lineitem WHERE NULLIF(l_discount, 0.0) IS NOT NULL
    """,
)
def clean_missing_drop_row(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.expr("nullif(l_discount, 0.0d)").alias("disc")
    )
    return etl.clean_missing_remove_row(df, subset=["disc"])


@query(
    "clean_missing_fill_value",
    sql="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), 9.9) AS disc
    FROM lineitem
    """,
)
def clean_missing_fill_value(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.expr("nullif(l_discount, 0.0d)").alias("disc")
    )
    return etl.clean_missing_fill_value(df, 9.9, subset=["disc"])


@query(
    "clean_missing_fill_mean",
    sql="""
    WITH t AS (SELECT NULLIF(l_discount, 0.0) AS disc FROM lineitem),
    s AS (SELECT COUNT(*) AS n, COUNT(disc) AS c,
                 SUM(CAST(FLOOR(disc * 100 + 0.5) AS BIGINT)) AS sc
          FROM t)
    SELECT n, CAST(0 AS BIGINT) AS nulls_after,
           ROUND(sc / 100.0 + (n - c) * (sc / (100.0 * c)), 2) AS total,
           TRUE AS fill_uniform, TRUE AS fill_is_mean
    FROM s
    """,
)
def clean_missing_fill_mean(spark, sf_dir):
    """Fill-with-mean, digest-robust at any SF.  The original checked
    aggregate ROUND(SUM(filled), 2) rode a 600 M-row double sum whose
    summation-order noise (~1e-4 at this magnitude) flipped the 2-dp
    round at sfgen1000 — one decade above where the gen100 sweep had
    proven it (the same class as the r10 money-sum flips; caught by the
    r11 gen1000 sweep).  The filled column mixes exact 2-dp values with
    the full-precision mean, so integer-cents summation can't represent
    it directly; instead the checked total is the CLOSED FORM of
    SUM(COALESCE(disc, AVG(disc))) = S/100 + (n−c)·(S/(100·c)) computed
    from three exact map-combined integers (S = cents sum, c = non-null
    count, n = rows) — the same IEEE scalar ops on both engines, so the
    result is bit-identical before rounding.

    The OPERATOR output is verified directly (not just via the closed
    form): `nulls_after` proves the fill covered every row, and the
    MIN/MAX of the filled column over the ORIGINALLY-NULL rows must be
    one single value (`fill_uniform`) equal to the closed-form mean
    within 1e-6 (`fill_is_mean`) — a fill with 0, the median, or any
    other stat is ≥1e-3 away on this fixture, while Spark's own AVG
    differs from the exact closed form by summation-order noise only
    (≪1e-9), so the boolean never flips with SF.  No large double sum
    rides the digest."""
    df = table(spark, sf_dir, "lineitem").select(
        F.expr("nullif(l_discount, 0.0d)").alias("disc")
    )
    flagged = df.withColumn("was_null", F.col("disc").isNull())
    filled = etl.clean_missing_fill_stat(flagged, ["disc"], "mean")
    checks = filled.agg(
        F.sum(F.col("disc").isNull().cast("bigint")).alias("nulls_after"),
        F.min(F.when(F.col("was_null"), F.col("disc"))).alias("_fmin"),
        F.max(F.when(F.col("was_null"), F.col("disc"))).alias("_fmax"),
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("disc").alias("c"),
        F.sum(F.floor(F.col("disc") * 100 + F.lit(0.5)).cast("bigint")).alias("sc"),
    )
    mean_closed = F.col("sc") / (100.0 * F.col("c"))
    return checks.crossJoin(stats).select(
        "n",
        "nulls_after",
        F.round(
            F.col("sc") / 100.0
            + (F.col("n") - F.col("c")) * (F.col("sc") / (100.0 * F.col("c"))),
            2,
        ).alias("total"),
        (F.col("_fmin") == F.col("_fmax")).alias("fill_uniform"),
        (F.abs(F.col("_fmin") - mean_closed) < F.lit(1e-6)).alias("fill_is_mean"),
    )


@query(
    "clean_missing_fill_median",
    sql="""
    WITH t AS (SELECT NULLIF(l_quantity, 1.0) AS q FROM lineitem)
    SELECT ROUND(SUM(COALESCE(q, (SELECT MEDIAN(q) FROM t))), 2) AS total,
           COUNT(*) AS n
    FROM t
    """,
)
def clean_missing_fill_median(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select(F.expr("nullif(l_quantity, 1.0d)").alias("q"))
    filled = etl.clean_missing_fill_stat(df, ["q"], "median")
    return filled.agg(F.round(F.sum("q"), 2).alias("total"), F.count("*").alias("n"))


@query(
    "clean_missing_fill_mode",
    sql="""
    WITH t AS (SELECT NULLIF(l_quantity, 1.0) AS q FROM lineitem),
         m AS (SELECT q FROM t WHERE q IS NOT NULL
               GROUP BY q ORDER BY COUNT(*) DESC, q ASC LIMIT 1)
    SELECT ROUND(SUM(COALESCE(t.q, (SELECT q FROM m))), 2) AS total, COUNT(*) AS n
    FROM t
    """,
)
def clean_missing_fill_mode(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select(F.expr("nullif(l_quantity, 1.0d)").alias("q"))
    filled = etl.clean_missing_fill_stat(df, ["q"], "mode")
    return filled.agg(F.round(F.sum("q"), 2).alias("total"), F.count("*").alias("n"))


@query(
    "clean_missing_drop_column",
    sql="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    """,
)
def clean_missing_drop_column(spark, sf_dir):
    """REMOVE_COLUMN mode: 'disc' contains nulls → dropped; key cols survive."""
    df = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.expr("nullif(l_discount, 0.0d)").alias("disc")
    )
    return etl.clean_missing_remove_column(df, subset=["l_orderkey", "l_linenumber", "disc"])


# --- positional ops -------------------------------------------------------


@query(
    "add_column_positional",
    sql="""
    WITH a AS (SELECT o_orderkey, o_custkey,
                      ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS _idx
               FROM orders),
         b AS (SELECT o_totalprice AS price,
                      ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS _idx
               FROM orders)
    SELECT a.o_orderkey, a.o_custkey, b.price
    FROM a JOIN b USING (_idx)
    """,
)
def add_column_positional(spark, sf_dir):
    """Positional column concat: i-th order by key gets i-th price by rank."""
    orders = table(spark, sf_dir, "orders")
    left = orders.select("o_orderkey", "o_custkey")
    right = orders.select("o_totalprice", "o_orderkey").withColumnRenamed("o_totalprice", "price")
    zipped = etl.add_column(left, right, ["o_orderkey"], ["price", "o_orderkey"])
    return zipped.select("o_orderkey_l", "o_custkey", "price").withColumnRenamed("o_orderkey_l", "o_orderkey")


@query(
    "take_ordered",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    headline=True,
)
def take_ordered(spark, sf_dir):
    """sort+take fuses to TakeOrderedAndProject — no global sort."""
    df = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return etl.take(df, 100, order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")])


@query("sample_exact_n", sql=None)
def sample_exact_n(spark, sf_dir):
    """Exact-n random sample — engine-specific randomness → rows-only check."""
    return etl.sample(table(spark, sf_dir, "orders"), n=100, seed=42)


@query(
    "sample_hash_n",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR))
    LIMIT 100
    """,
)
def sample_hash_n(spark, sf_dir):
    """Deterministic exact-n sample (smallest md5(key)) — engine-independent,
    so fully oracle-checked, unlike the seeded-RNG variant."""
    df = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return etl.sample_hash_n(df, 100, "o_orderkey")


@query("split_randomly", sql=None)
def split_randomly(spark, sf_dir):
    """Random 70/30 split; returns the 70% side — rows-only check."""
    a, _b = etl.split(table(spark, sf_dir, "orders"), 0.7, seed=42)
    return a


# --- §2.3 joins -----------------------------------------------------------


@query(
    "join_inner_multikey",
    sql="""
    WITH agg AS (SELECT l_orderkey, l_returnflag,
                        ROUND(SUM(l_quantity), 2) AS qty
                 FROM lineitem GROUP BY l_orderkey, l_returnflag)
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, agg.qty
    FROM lineitem l JOIN agg
      ON l.l_orderkey = agg.l_orderkey AND l.l_returnflag = agg.l_returnflag
    """,
)
def join_inner_multikey(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_orderkey", "l_returnflag").agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    out = joins.join(
        li.select("l_orderkey", "l_linenumber", "l_returnflag"),
        agg,
        ["l_orderkey", "l_returnflag"],
    )
    return out.select("l_orderkey", "l_linenumber", "l_returnflag", "qty")


@query(
    "join_left_outer",
    sql="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    out = joins.join(cust, orders, "c_custkey", "o_custkey", mode="left")
    return out.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


@query(
    "join_right_outer",
    sql="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_right_outer(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    out = joins.join(orders, cust, "o_custkey", "c_custkey", mode="right")
    return out.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


@query(
    "cross_join_dims",
    sql="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def cross_join_dims(spark, sf_dir):
    out = joins.cross_join(
        table(spark, sf_dir, "region").select("r_name"),
        table(spark, sf_dir, "nation").select("n_name"),
    )
    return out


@query(
    "semi_join_exists",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def semi_join_exists(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter("o_totalprice > 400000").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return joins.semi_join(cust, big, "c_custkey").select("c_custkey", "c_name")


@query(
    "anti_join_not_exists",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_not_exists(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return joins.anti_join(cust, orders, "c_custkey").select("c_custkey", "c_name")


@query(
    "broadcast_dim_join",
    sql="""
    SELECT p_brand,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))::BIGINT AS total_cents,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
    headline=True,
)
def broadcast_dim_join(spark, sf_dir):
    """Explicit broadcast of the filtered dim — fact side never shuffles.

    Brand totals are integer cents: 25 brand groups each sum millions of
    2-dp prices at gen SFs (~1e12 per group at gen1000), where a
    ROUND(SUM(double), 2) is summation-order-dependent (round-12
    hardening, same class as the sfgen100 q5 digest flip)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter("p_size <= 20")
    out = joins.join(li, part, "l_partkey", "p_partkey", broadcast_right=True)
    return out.groupBy("p_brand").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "total_cents"
        ),
        F.count("*").alias("n"),
    )


@query(
    "skew_salted_join",
    headline=True,
    sql="""
    WITH s AS (
      SELECT CASE WHEN event_id % 10 < 7 THEN 0
                  ELSE event_id % 997 END AS k,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    d AS (SELECT r.range AS k, (r.range * 37) % 100 AS w FROM range(0, 997) r)
    SELECT s.k, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(s.cents * d.w) AS BIGINT) AS weighted_cents
    FROM s JOIN d ON s.k = d.k
    GROUP BY 1
    """,
)
def skew_salted_join(spark, sf_dir):
    """Skew-stress fixture for `salted_join`: 70% of events collapse onto
    ONE join key (k=0), the adversarial shape where a plain shuffle join
    lands 70% of the fact table in a single reducer task and the stage
    runs at straggler speed.  The salt spreads k=0 over 16 (key, salt)
    reducers; the right side (a 997-key weight dim) replicates 16× and is
    SHUFFLE_HASH-pinned so the plan under test is the skew-spreading
    shuffle, not an AQE broadcast (see salted_join).  Salting is
    semantics-invisible, so the oracle is simply the UNSALTED join —
    exact-integer cents arithmetic keeps the 70k-row hot-key sum
    order-independent across engines.  Complements AQE's runtime skew
    split (spark.sql.adaptive.skewJoin), which only engages past
    ~256 MB partitions — known-ahead skew at any size salts here."""
    events = table(spark, sf_dir, "events")
    skewed = events.select(
        F.when(F.col("event_id") % 10 < 7, F.lit(0))
        .otherwise(F.col("event_id") % 997)
        .cast("long")
        .alias("k"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    dim = spark.range(0, 997).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 100).alias("w")
    )
    return (
        joins.salted_join(skewed, dim, on="k", salt_buckets=16)
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("cents") * F.col("w")).alias("weighted_cents"),
        )
    )


@query(
    "skew_aqe_join",
    headline=True,
    sql="""
    WITH s AS (
      SELECT CASE WHEN event_id % 10 < 7 THEN 0
                  ELSE event_id % 997 END AS k,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    d AS (SELECT r.range AS k, (r.range * 37) % 100 AS w FROM range(0, 997) r)
    SELECT s.k, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(s.cents * d.w) AS BIGINT) AS weighted_cents
    FROM s JOIN d ON s.k = d.k
    GROUP BY 1
    """,
)
def skew_aqe_join(spark, sf_dir):
    """The RUNTIME half of the skew toolkit — same 70%-hot-key fixture as
    `skew_salted_join`, handled by AQE's OptimizeSkewedJoin instead of an
    ahead-of-time salt: a PLAIN join whose oversized reduce partition is
    split into per-map-output chunks after the shuffle sizes are known
    (the executed plan reads `SortMergeJoin(skew=true)` over an
    `AQEShuffleRead skewed` — asserted in tests/test_plans.py).

    Contract vs the salted sibling: no salt column, no 16× right-side
    replication, no skew knowledge in the query — but `force=True`
    because the downstream groupBy("k") would otherwise make AQE decline
    the split (it breaks the join output's reusable hash partitioning;
    the extra shuffle is the right trade at 70%-in-one-key), and
    `scan_split_bytes` narrows the scan so a small fixture has the many
    map outputs a 100 TB scan has for free.  Thresholds are fixture-
    sized (the production defaults are 256 MB partitions); semantics are
    conf-independent, so the oracle is simply the unsalted join.  The
    join materializes INSIDE the scope (session conf is global) to a
    scratch parquet and the returned frame reads that back.
    """
    import os

    events = table(spark, sf_dir, "events")
    skewed = events.select(
        F.when(F.col("event_id") % 10 < 7, F.lit(0))
        .otherwise(F.col("event_id") % 997)
        .cast("long")
        .alias("k"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    dim = spark.range(0, 997, 1, 8).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 100).alias("w")
    )
    out = (
        skewed.join(dim, "k")
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("cents") * F.col("w")).alias("weighted_cents"),
        )
    )
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp", "io",
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    scratch = os.path.join(root, f"aqe_skew_{tag}")
    with joins.aqe_skew_scope(
        spark,
        partition_factor=1.2,
        partition_threshold="1kb",
        advisory_size="512b",
        scan_split_bytes="64kb",
        force=True,
    ):
        out.write.mode("overwrite").parquet(scratch)
    return spark.read.parquet(scratch)


# --- §2.5 sort / top-k ----------------------------------------------------


@query(
    "sort_with_rank",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC) - 1 AS _idx
    FROM orders
    """,
)
def sort_with_rank(spark, sf_dir):
    """Global multi-column sort, verified via an explicit rank column."""
    df = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    df = sort_ops.sort(df, ["o_orderstatus", "o_totalprice", "o_orderkey"], [True, False, True])
    return etl.with_row_index(
        df,
        [F.col("o_orderstatus").asc(), F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
    )


@query(
    "topk_per_group",
    sql="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
    headline=True,
)
def topk_per_group(spark, sf_dir):
    df = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return sort_ops.top_k_per_group(
        df, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=3
    )


# --- §2.6 set ops ---------------------------------------------------------


@query(
    "union_positional",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000
    """,
)
def union_positional(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    a = orders.filter("o_orderstatus = 'O'").select("o_orderkey", "o_totalprice")
    b = orders.filter("o_totalprice > 300000").select("o_orderkey", "o_totalprice")
    return setops.union(a, b)


@query(
    "union_by_name",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    """,
)
def union_by_name(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    a = orders.filter("o_orderstatus = 'F'").select("o_orderkey", "o_totalprice")
    b = orders.filter("o_orderstatus = 'O'").select("o_totalprice", "o_orderkey")  # reordered
    return setops.union_by_name(a, b)


@query(
    "intersect_distinct",
    sql="""
    SELECT user_id, event_type FROM events WHERE value >= 40
    INTERSECT
    SELECT user_id, event_type FROM events WHERE value < 70
    """,
)
def intersect_distinct(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    a = ev.filter("value >= 40").select("user_id", "event_type")
    b = ev.filter("value < 70").select("user_id", "event_type")
    return setops.intersect(a, b)


@query(
    "intersect_all_bag",
    sql="""
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 35
    """,
)
def intersect_all_bag(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    a = li.filter("l_quantity > 25").select("l_returnflag", "l_linestatus")
    b = li.filter("l_quantity < 35").select("l_returnflag", "l_linestatus")
    return setops.intersect_all(a, b)


@query(
    "subtract_distinct",
    sql="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def subtract_distinct(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    a = ev.filter("event_type = 'click'").select("user_id")
    b = ev.filter("event_type = 'error'").select("user_id")
    return setops.subtract(a, b)


@query(
    "except_all_bag",
    sql="""
    SELECT user_id FROM events WHERE value > 20
    EXCEPT ALL
    SELECT user_id FROM events WHERE value > 60
    """,
)
def except_all_bag(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    a = ev.filter("value > 20").select("user_id")
    b = ev.filter("value > 60").select("user_id")
    return setops.except_all(a, b)


@query(
    "asof_join_events",
    headline=True,
    sql="""
    WITH err AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'error'
    ),
    pur AS (
      SELECT user_id, ts, MAX(value) AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts, e.value, p.pval AS prev_purchase
    FROM err e ASOF LEFT JOIN pur p
      ON e.user_id = p.user_id AND p.ts <= e.ts
    """,
)
def asof_join_events(spark, sf_dir):
    """As-of join (engine extension — Spark lacks it, DuckDB's native ASOF
    JOIN is the oracle): each error event picks up the latest prior purchase
    value of the same user via the union + last(ignorenulls) window
    formulation (one shuffle on user_id, no range self-join)."""
    ev = table(spark, sf_dir, "events")
    err = ev.filter("event_type = 'error'").select("event_id", "user_id", "ts", "value")
    pur = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    out = joins.asof_join(err, pur, on="ts", by=["user_id"], value_cols=["pval"])
    return out.select(
        "event_id", "user_id", "ts", "value", F.col("pval").alias("prev_purchase")
    )


@query(
    "asof_join_forward",
    sql="""
    WITH err AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'error'
    ),
    pur AS (
      SELECT user_id, ts, MAX(value) AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts, e.value, p.pval AS next_purchase
    FROM err e ASOF LEFT JOIN pur p
      ON e.user_id = p.user_id AND p.ts >= e.ts
    """,
)
def asof_join_forward(spark, sf_dir):
    """Forward as-of join (direction="forward"): each error event picks up
    the EARLIEST purchase at or after it — the same one-shuffle union +
    carry window scanned in reverse time order; DuckDB's native forward
    ASOF (p.ts >= e.ts) is the oracle."""
    ev = table(spark, sf_dir, "events")
    err = ev.filter("event_type = 'error'").select("event_id", "user_id", "ts", "value")
    pur = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    out = joins.asof_join(
        err, pur, on="ts", by=["user_id"], value_cols=["pval"], direction="forward"
    )
    return out.select(
        "event_id", "user_id", "ts", "value", F.col("pval").alias("next_purchase")
    )


@query(
    "range_join_incidents",
    sql="""
    WITH hourly AS (
      SELECT DATE_TRUNC('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1 HAVING COUNT(*) >= 20
    ),
    windows AS (
      SELECT EPOCH(h) AS w_start, EPOCH(h) + 3600 AS w_end FROM hourly
    ),
    err AS (
      SELECT event_id, EPOCH(ts) AS t FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, CAST(w.w_start AS BIGINT) AS w_start
    FROM err e JOIN windows w ON e.t >= w.w_start AND e.t < w.w_end
    """,
)
def range_join_incidents(spark, sf_dir):
    """Bucketed range join (engine extension): error events falling inside
    busy-hour incident windows; oracle is DuckDB's plain inequality join."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .filter("n >= 20")
    )
    windows = hourly.select(
        F.unix_timestamp("h").cast("double").alias("w_start"),
        (F.unix_timestamp("h") + 3600).cast("double").alias("w_end"),
    )
    err = ev.filter("event_type = 'error'").select(
        "event_id", F.unix_timestamp("ts").cast("double").alias("t")
    )
    out = joins.range_join(err, windows, "t", "w_start", "w_end", bucket_width=3600.0)
    return out.select("event_id", F.col("w_start").cast("long").alias("w_start"))


@query(
    "asof_join_tolerance",
    sql="""
    WITH err AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ),
    pur AS (
      SELECT user_id, ts, MAX(value) AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN p.ts IS NOT NULL AND EPOCH(e.ts) - EPOCH(p.ts) <= 3600
                THEN p.pval END AS prev_purchase_1h
    FROM err e ASOF LEFT JOIN pur p
      ON e.user_id = p.user_id AND p.ts <= e.ts
    """,
)
def asof_join_tolerance(spark, sf_dir):
    """Bounded-gap as-of join (pandas merge_asof tolerance semantics):
    matches farther than 1 hour back are nulled — the matched timestamp
    rides the same carry window, so the bound costs no extra join."""
    ev = table(spark, sf_dir, "events")
    err = ev.filter("event_type = 'error'").select("event_id", "user_id", "ts")
    pur = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    out = joins.asof_join(
        err, pur, on="ts", by=["user_id"], value_cols=["pval"], tolerance=3600.0
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("pval").alias("prev_purchase_1h")
    )


@query(
    "sessionize_events",
    sql="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_no
    FROM g
    """,
)
def sessionize_events(spark, sf_dir):
    """Per-event session ids (30-min inactivity gap): the attribution/
    funnel building block — one window exchange, no self-join; the
    session_window AGGREGATE twin is `session_window_agg`."""
    from compss_python_spark.streaming.windows import sessionize

    ev = table(spark, sf_dir, "events")
    out = sessionize(ev, "user_id", "ts", 1800.0, tiebreak="event_id")
    return out.select("user_id", "event_id", "session_no")


@query(
    "funnel_view_click_purchase",
    sql="""
    WITH a AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    b AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN a ON a.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts >= a.t_view
      GROUP BY e.user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_buy
      FROM events e JOIN b ON b.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= b.t_click
      GROUP BY e.user_id
    )
    SELECT COUNT(DISTINCT a.user_id) AS n_view,
           COUNT(DISTINCT b.user_id) AS n_view_click,
           COUNT(DISTINCT c.user_id) AS n_view_click_buy
    FROM a LEFT JOIN b ON b.user_id = a.user_id
    LEFT JOIN c ON c.user_id = a.user_id
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered-funnel analysis (view → click → purchase, each step at or
    after the previous one's FIRST occurrence — ties count, `>=` in both
    engines): per-step user counts.
    Scale shape: each step is a per-user MIN aggregate joined to the
    previous step on the SAME key — co-partitioned joins of shrinking
    per-user tables, fact table scanned once per step with the event-type
    filter pushed down."""
    ev = table(spark, sf_dir, "events")

    def step(prev, etype, tcol):
        src = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            src = src.join(prev, "user_id").filter(F.col("ts") >= F.col(prev.columns[1]))
        return src.groupBy("user_id").agg(F.min("ts").alias(tcol))

    a = step(None, "view", "t_view")
    b = step(a, "click", "t_click")
    c = step(b, "purchase", "t_buy")
    return (
        a.join(b.select(F.col("user_id").alias("ub")), a.user_id == F.col("ub"), "left")
        .join(c.select(F.col("user_id").alias("uc")), a.user_id == F.col("uc"), "left")
        .agg(
            F.count_distinct("user_id").alias("n_view"),
            F.count_distinct("ub").alias("n_view_click"),
            F.count_distinct("uc").alias("n_view_click_buy"),
        )
    )


@query(
    "cohort_retention_weekly",
    sql="""
    WITH first AS (
      SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events
    )
    SELECT CAST(first.cohort AS TIMESTAMP) AS cohort,
           CAST((EPOCH(act.wk) - EPOCH(first.cohort)) / 604800 AS INT) AS week_no,
           COUNT(*) AS n_active
    FROM first JOIN act ON act.user_id = first.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly(spark, sf_dir):
    """Weekly cohort retention (the product-analytics staple): users
    bucketed by first-activity week, counted in each later active week.
    Scale shape: two per-user aggregates co-partitioned on user_id; the
    cohort join is same-key (no extra exchange under AQE); Monday-start
    ISO weeks in both engines."""
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    act = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    week_no = (
        (F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800
    ).cast("int")
    return (
        first.join(act, "user_id")
        .groupBy("cohort", week_no.alias("week_no"))
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "layout_zorder_value",
    sql="""
    SELECT o_orderkey,
           CAST(
    """
    + zorder_sql(["(o_custkey % 1024)", "(o_orderkey % 1024)"], 10)
    + """
           AS BIGINT) AS z
    FROM orders
    """,
)
def layout_zorder_value(spark, sf_dir):
    """Morton Z-values over two bucketed order dimensions (10 bits each):
    the clustering key behind multi-dimensional layout optimization
    (write_zordered range-partitions + sorts on it so min/max stats prune
    scans on EITHER dimension).  Pure unrolled shift/mask JVM expression;
    the oracle recomputes every interleaved bit in SQL."""
    from compss_python_spark.operators.layout import zorder_value

    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        zorder_value(
            [F.col("o_custkey") % 1024, F.col("o_orderkey") % 1024], 10
        ).alias("z"),
    )


@query(
    "cdc_apply_changelog",
    headline=True,
    sql="""
    WITH snap AS (
      SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
             'I' AS op, CAST(-1 AS BIGINT) AS seq
      FROM customer),
    chg AS (
      SELECT o_custkey AS c_custkey,
             'CDC_' || o_orderkey AS c_name,
             ROUND(o_totalprice, 2) AS c_acctbal,
             CASE WHEN o_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
             o_orderkey AS seq
      FROM orders),
    u AS (SELECT * FROM snap UNION ALL SELECT * FROM chg),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                       ORDER BY seq DESC) AS rn
          FROM u)
    SELECT c_custkey, c_name, c_acctbal FROM r WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_changelog(spark, sf_dir):
    """MERGE / upsert semantics: apply a CDC batch (I/U/D + sequence
    number) to a snapshot via ONE last-writer-wins window keyed on the
    business key (map-side pruned), tombstones dropped.  The changelog is
    derived deterministically from orders (op by custkey mod, seq =
    orderkey) so the oracle replays the identical merge."""
    from compss_python_spark.operators.cdc import apply_changelog

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    changes = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.concat(F.lit("CDC_"), F.col("o_orderkey")).alias("c_name"),
        F.round("o_totalprice", 2).alias("c_acctbal"),
        F.when(F.col("o_custkey") % 10 == 0, "D").otherwise("U").alias("op"),
        F.col("o_orderkey").alias("seq"),
    )
    return apply_changelog(cust, changes, ["c_custkey"], "seq")


@query(
    "cdc_scd2_intervals",
    sql="""
    WITH l AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    h AS (
      SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
                     THEN 1 ELSE 0 END AS head
      FROM l),
    r AS (
      SELECT *, SUM(head) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM h),
    a AS (
      SELECT user_id, run, MIN(event_type) AS event_type,
             MIN(ts) AS valid_from
      FROM r GROUP BY 1, 2)
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run)
             AS valid_to
    FROM a
    """,
)
def cdc_scd2_intervals(spark, sf_dir):
    """SCD2 dimension build from an event stream: runs of equal
    event_type per user become validity intervals [valid_from, valid_to),
    open-ended for the current run.  Two windows over one
    (user → ts, event_id) sort — a single exchange, no self-join."""
    from compss_python_spark.operators.cdc import scd2_intervals

    ev = table(spark, sf_dir, "events")
    return scd2_intervals(ev, "user_id", "event_type", "ts", "event_id")


@query(
    "join_full_outer",
    sql="""
    WITH big_cust AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
    urgent AS (SELECT o_custkey, o_orderkey FROM orders
               WHERE o_orderpriority = '1-URGENT')
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END AS only_orders,
           CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END AS only_cust,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM big_cust FULL OUTER JOIN urgent ON c_custkey = o_custkey
    GROUP BY 1, 2, 3
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join with dangling rows on BOTH sides (high-balance
    customers vs urgent orders): unmatched customers and unmatched order
    owners each survive exactly once — the mode the reference's merge
    exposes as 'outer'."""
    cust = table(spark, sf_dir, "customer").filter("c_acctbal > 5000").select(
        "c_custkey"
    )
    urgent = table(spark, sf_dir, "orders").filter(
        "o_orderpriority = '1-URGENT'"
    ).select("o_custkey", "o_orderkey")
    out = joins.join(cust, urgent, "c_custkey", "o_custkey", mode="outer")
    return out.groupBy(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias("only_orders"),
        F.when(F.col("o_custkey").isNull(), 1).otherwise(0).alias("only_cust"),
    ).agg(F.count("o_orderkey").alias("n_orders"))


@query(
    "cdc_temporal_join",
    sql="""
    WITH src AS (SELECT * FROM events WHERE event_type <> 'purchase'),
    l AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM src),
    h AS (SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
                         THEN 1 ELSE 0 END AS head FROM l),
    r AS (SELECT *, SUM(head) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM h),
    a AS (SELECT user_id, run, MIN(event_type) AS state,
                 MIN(ts) AS valid_from FROM r GROUP BY 1, 2),
    dim AS (SELECT user_id, state, valid_from,
                   LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run)
                     AS valid_to
            FROM a),
    purch AS (SELECT user_id, event_id, ts, value FROM events
              WHERE event_type = 'purchase')
    SELECT d.state AS prevailing_state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           SUM(CAST(ROUND(p.value * 100, 0) AS BIGINT))::BIGINT AS total_cents
    FROM purch p
    LEFT JOIN dim d
      ON d.user_id = p.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    GROUP BY 1
    """,
)
def cdc_temporal_join(spark, sf_dir):
    """Point-in-time (SCD2 temporal) join: purchases enriched with the
    dimension version valid at event time — intervals partition the
    timeline, so the join is fact-sized with no fan-out.  The SCD2
    dimension is built from the NON-purchase event runs, so each purchase
    lands in the run of whatever the user was doing around it (NULL state
    = purchase before any other activity)."""
    from compss_python_spark.operators.cdc import scd2_intervals, temporal_join

    ev = table(spark, sf_dir, "events")
    dim = scd2_intervals(
        ev.filter("event_type <> 'purchase'"),
        "user_id", "event_type", "ts", "event_id",
    ).select(
        "user_id", F.col("event_type").alias("state"), "valid_from", "valid_to"
    )
    purch = ev.filter("event_type = 'purchase'").select(
        "user_id", "event_id", "ts", "value"
    )
    j = temporal_join(purch, dim, "user_id", "ts")
    return j.groupBy(F.col("state").alias("prevailing_state")).agg(
        F.count("*").cast("long").alias("n_purchases"),
        # integer cents: a handful of state groups each sum millions of
        # 2-dp purchase values at gen SFs (round-12 hardening)
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("total_cents"),
    )


@query(
    "clean_winsorize",
    sql="""
    WITH b AS (
      SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
             quantile_cont(l_extendedprice, 0.99) AS hi
      FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           ROUND(LEAST(GREATEST(l_extendedprice, lo), hi), 4)
             AS l_extendedprice_w
    FROM lineitem CROSS JOIN b
    """,
)
def clean_winsorize(spark, sf_dir):
    """Winsorization: prices clipped to the exact [p1, p99] quantiles —
    one all-column quantile aggregate broadcast back, zero extra shuffle.
    Type-7 interpolation on both engines (the quantiles_exact
    convention)."""
    li = table(spark, sf_dir, "lineitem")
    out = etl.winsorize(li, ["l_extendedprice"], 0.01, 0.99, round_dp=4)
    return out.select("l_orderkey", "l_linenumber", "l_extendedprice_w")


@query(
    "cdc_snapshot_diff",
    sql="""
    WITH old AS (
      SELECT c_custkey, c_name, c_acctbal, c_nationkey FROM customer
      WHERE c_custkey % 97 <> 0),
    new AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal,
             c_nationkey
      FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, c_name, c_acctbal, c_nationkey
      FROM customer WHERE c_custkey % 101 = 0),
    j AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             o.c_custkey IS NOT NULL AS in_old,
             n.c_custkey IS NOT NULL AS in_new,
             CASE WHEN o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
                  THEN CONCAT_WS(',',
                    CASE WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                         THEN 'c_acctbal' END,
                    CASE WHEN o.c_name IS DISTINCT FROM n.c_name
                         THEN 'c_name' END,
                    CASE WHEN o.c_nationkey IS DISTINCT FROM n.c_nationkey
                         THEN 'c_nationkey' END)
                  ELSE '' END AS changed_columns
      FROM old o FULL OUTER JOIN new n USING (c_custkey))
    SELECT c_custkey,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                WHEN changed_columns <> '' THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           changed_columns
    FROM j
    """,
)
def cdc_snapshot_diff(spark, sf_dir):
    """Snapshot regression diff: two deterministic variants of customer
    (every 97th key dropped from old, every 11th acctbal bumped, every
    101st re-keyed as an insert) -> per-key added/removed/changed/
    unchanged verdicts with the changed-column list.  ONE full-outer
    join on the key; every column comparison is a narrow NULL-safe
    equality -- the minimal-shuffle table-diff gate of a snapshot
    pipeline."""
    from compss_python_spark.operators.cdc import snapshot_diff

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    old = cust.filter(F.col("c_custkey") % 97 != 0)
    new = cust.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 11 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 101 == 0).withColumn(
            "c_custkey", F.col("c_custkey") + 10_000_000
        )
    )
    d = snapshot_diff(old, new, ["c_custkey"])
    return d.select(
        "c_custkey",
        "change_type",
        F.array_join("changed_columns", ",").alias("changed_columns"),
    )
