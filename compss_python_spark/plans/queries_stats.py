"""Declared queries: descriptive statistics (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from compss_python_spark.functions import statistics
from compss_python_spark.plans.registry import query, table


@query(
    "stats_corr_cov",
    sql="""
    SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_qp,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS covp_qp
    FROM lineitem
    """,
)
def stats_corr_cov(spark, sf_dir):
    """Pearson correlation + covariance [ref:
    ddf_library/functions/statistics/{correlation,covariance}.py]."""
    return table(spark, sf_dir, "lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("covp_qp"),
    )


@query(
    "crosstab_long",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def crosstab_long(spark, sf_dir):
    """Contingency table in long form [ref:
    ddf_library/functions/statistics/cross_tab.py]."""
    return statistics.cross_tab_long(table(spark, sf_dir, "lineitem"), "l_returnflag", "l_linestatus")


@query(
    "describe_column",
    sql="""
    SELECT COUNT(l_extendedprice) AS n,
           ROUND(AVG(l_extendedprice), 2) AS mean,
           ROUND(STDDEV(l_extendedprice), 2) AS std,
           ROUND(MIN(l_extendedprice), 2) AS min_v,
           ROUND(MAX(l_extendedprice), 2) AS max_v
    FROM lineitem
    """,
)
def describe_column(spark, sf_dir):
    """describe() as typed columns [ref:
    ddf_library/functions/statistics/describe.py]."""
    out = statistics.describe_long(table(spark, sf_dir, "lineitem"), "l_extendedprice")
    return out.select(
        "n",
        F.round("mean", 2).alias("mean"),
        F.round("std", 2).alias("std"),
        F.round("min_v", 2).alias("min_v"),
        F.round("max_v", 2).alias("max_v"),
    )


@query(
    "freq_items_exact",
    sql="""
    SELECT event_type, COUNT(*) AS n FROM events
    GROUP BY event_type HAVING COUNT(*) >= 100
    """,
)
def freq_items_exact(spark, sf_dir):
    """Exact frequent-items [ref:
    ddf_library/functions/statistics/freq_items.py] — support as min count."""
    return statistics.freq_items_exact(table(spark, sf_dir, "events"), "event_type", 100)


@query(
    "ks_test_uniform",
    sql="""
    WITH v AS (SELECT (l_partkey % 1000) / 1000.0 AS v FROM lineitem),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM v),
    r AS (SELECT LEAST(1.0, GREATEST(0.0, v)) AS cdf,
                 ROW_NUMBER() OVER (ORDER BY v) AS i FROM v),
    d AS (SELECT MAX(GREATEST(ABS(cdf - (i - 1) / (SELECT n FROM n)),
                              ABS(i / (SELECT n FROM n) - cdf))) AS d FROM r),
    t AS (SELECT d, d * (SQRT(n) + 0.12 + 0.11 / SQRT(n)) AS t FROM d, n),
    p AS (SELECT d,
                 LEAST(1.0, GREATEST(0.0,
                   2 * SUM((CASE WHEN k % 2 = 1 THEN 1 ELSE -1 END)
                           * EXP(-2 * (k * t) * (k * t))))) AS p
          FROM t, generate_series(1, 100) AS g(k) GROUP BY d, t)
    SELECT ROUND(d, 6) AS d_stat, ROUND(p, 6) AS p_value FROM p
    """,
)
def ks_test_uniform(spark, sf_dir):
    """One-sample KS vs Uniform(0,1) on (l_partkey % 1000)/1000 — the uniform
    CDF is the identity, so both the D statistic AND the asymptotic
    Kolmogorov p-value (100-term alternating series, Stephens correction)
    are reproduced exactly in the DuckDB oracle."""
    vals = table(spark, sf_dir, "lineitem").select(
        ((F.col("l_partkey") % 1000) / 1000.0).alias("u")
    )
    d, p = statistics.ks_one_sample_uniform(vals, "u")
    return spark.createDataFrame(
        [(round(d, 6), round(p, 6))], "d_stat double, p_value double"
    )


@query("ks_test_normal", sql=None)
def ks_test_normal(spark, sf_dir):
    """One-sample KS vs fitted normal [ref:
    ddf_library/functions/statistics/kolmogorov_smirnov.py] — double-exact
    erf is not available in DuckDB → rows-only; exactness asserted in tests
    against a pure-Python ECDF implementation.  `ks_test_normal_poly` is
    the hash-oracled sibling (identical pipeline, portable erf)."""
    d, p = statistics.ks_one_sample_normal(table(spark, sf_dir, "lineitem"), "l_extendedprice")
    return spark.createDataFrame(
        [(round(d, 6), round(p, 6))], "d_stat double, p_value double"
    )


@query(
    "ks_test_normal_poly",
    sql="""
    WITH s AS (SELECT AVG(l_extendedprice) AS m, STDDEV(l_extendedprice) AS sd
               FROM lineitem),
    xs AS (SELECT l_extendedprice AS val,
                  (l_extendedprice - (SELECT m FROM s))
                  / ((SELECT sd FROM s) * SQRT(2.0)) AS x
           FROM lineitem),
    ts AS (SELECT val, x, 1.0 / (1.0 + 0.3275911 * ABS(x)) AS t FROM xs),
    e AS (SELECT val,
                 0.5 * (1.0
                   + (CASE WHEN x < 0 THEN -1.0 WHEN x > 0 THEN 1.0 ELSE 0.0 END)
                   * (1.0 - (((((1.061405429 * t - 1.453152027) * t
                                + 1.421413741) * t - 0.284496736) * t
                              + 0.254829592) * t) * EXP(-x * x))) AS cdf
          FROM ts),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM e),
    r AS (SELECT cdf, ROW_NUMBER() OVER (ORDER BY val) AS i FROM e),
    d AS (SELECT MAX(GREATEST(ABS(cdf - (i - 1) / (SELECT n FROM n)),
                              ABS(i / (SELECT n FROM n) - cdf))) AS d FROM r),
    t2 AS (SELECT d, d * (SQRT(n) + 0.12 + 0.11 / SQRT(n)) AS t FROM d, n),
    p AS (SELECT d,
                 LEAST(1.0, GREATEST(0.0,
                   2 * SUM((CASE WHEN k % 2 = 1 THEN 1 ELSE -1 END)
                           * EXP(-2 * (k * t) * (k * t))))) AS p
          FROM t2, generate_series(1, 100) AS g(k) GROUP BY d, t)
    SELECT ROUND(d, 6) AS d_stat, ROUND(p, 6) AS p_value FROM p
    """,
)
def ks_test_normal_poly(spark, sf_dir):
    """One-sample KS vs fitted normal with the A&S 7.1.26 polynomial erf as
    a pure JVM expression (whole-stage codegen, no Arrow hop).  The oracle
    recomputes the IDENTICAL polynomial, ECDF, Stephens correction and
    100-term Kolmogorov series in SQL — full hash parity for the normal KS
    family (the 'exact'-erf twin stays rows-only only because DuckDB lacks
    double-precision erf)."""
    d, p = statistics.ks_one_sample_normal(
        table(spark, sf_dir, "lineitem"), "l_extendedprice", erf_impl="poly"
    )
    return spark.createDataFrame(
        [(round(d, 6), round(p, 6))], "d_stat double, p_value double"
    )


@query(
    "quantiles_exact",
    sql="""
    SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS q50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS q90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS q99
    FROM lineitem
    """,
)
def quantiles_exact(spark, sf_dir):
    """Exact interpolated quantiles (median/p90/p99) — Spark `percentile`
    and DuckDB `quantile_cont` share the type-7 linear-interpolation
    definition, so the values hash-match exactly.

    SCALE BOUNDARY (measured): Spark's exact `percentile` is an
    object-hash aggregate that materializes the full value multiset per
    group — at sfgen100 (60 M rows, one group) the 32 g driver JVM OOMs
    in AggregationIterator.  That is inherent to EXACT global quantiles,
    not a plan defect; past ~10⁷ values per group use
    `quantiles_histogram` / `quantiles_histogram_by_group` (fixed-bin
    histogram + interpolation, error ≤ one bin width, ONE map-combined
    agg) — the committed scale path.  Gate-checked at sf0.01 and sfgen10;
    excluded from the gen100 gate for this reason."""
    from compss_python_spark.functions.statistics import quantiles_exact as q

    return q(table(spark, sf_dir, "lineitem"), "l_extendedprice", [0.5, 0.9, 0.99])


@query(
    "quantiles_exact_scaled",
    sql="""
    SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS q50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS q90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS q99
    FROM lineitem
    """,
)
def quantiles_exact_scaled(spark, sf_dir):
    """The SAME exact type-7 quantiles as `quantiles_exact` (identical
    oracle), computed by histogram-guided rank SELECTION instead of
    Spark's multiset-buffering `percentile` aggregate — closing the
    measured gen100 boundary: `percentile` OOMs a 32 g JVM at one
    60 M-value group, while selection needs ~log_bins(n)+1 one-scan
    passes with O(bins) driver memory and a final bounded TakeOrdered
    per bracketing order statistic (functions/statistics.py:
    quantiles_exact_selection).  Eager by design: the selection loop IS
    the query; the returned 1-row frame carries the computed scalars."""
    from compss_python_spark.functions.statistics import quantiles_exact_selection

    return quantiles_exact_selection(
        table(spark, sf_dir, "lineitem"), "l_extendedprice", [0.5, 0.9, 0.99]
    )


@query(
    "stratified_sample_hash",
    sql="""
    SELECT event_id, event_type FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY MD5(CAST(event_id AS VARCHAR))) <= 20
    """,
)
def stratified_sample_hash(spark, sf_dir):
    """Deterministic stratified sampling: 20 rows per event_type by
    smallest md5(event_id) — engine-portable (md5 hex ordering), unlike
    seeded sampleBy.  WindowGroupLimit keeps the shuffle at ≤ n·strata rows
    per map partition."""
    from compss_python_spark.operators.etl import stratified_sample_hash as s

    out = s(table(spark, sf_dir, "events"), "event_type", 20, "event_id")
    return out.select("event_id", "event_type")


@query(
    "histogram_fixed_width",
    sql="""
    SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def histogram_fixed_width(spark, sf_dir):
    """Fixed-width histogram of events.value (width 25) — one hash
    aggregate with map-side combine."""
    from compss_python_spark.functions.statistics import histogram_fixed_width as h

    return h(table(spark, sf_dir, "events"), "value", 25.0)


@query(
    "agg_moments",
    sql="""
    SELECT event_type,
           ROUND(VAR_SAMP(value), 4) AS var_s,
           ROUND(STDDEV_SAMP(value), 4) AS std_s,
           ROUND(VAR_POP(value), 4) AS var_p,
           ROUND(SKEWNESS(value) * (COUNT(*) - 2)
                 / SQRT(COUNT(*) * (COUNT(*) - 1.0)), 4) AS skew,
           ROUND(kurtosis_pop(value), 4) AS kurt
    FROM events GROUP BY event_type
    """,
)
def agg_moments(spark, sf_dir):
    """Higher statistical moments per group (sample/population variance,
    skewness, excess kurtosis) — single-pass partial/final aggregates in
    both engines.  Spark reports POPULATION skewness/kurtosis; DuckDB's
    SKEWNESS is sample-adjusted (the oracle undoes the (n-2)/√(n(n-1))
    correction) and kurtosis_pop is the population form directly."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.var_samp("value"), 4).alias("var_s"),
        F.round(F.stddev_samp("value"), 4).alias("std_s"),
        F.round(F.var_pop("value"), 4).alias("var_p"),
        F.round(F.skewness("value"), 4).alias("skew"),
        F.round(F.kurtosis("value"), 4).alias("kurt"),
    )


@query(
    "agg_regression_family",
    sql="""
    SELECT event_type,
           ROUND(REGR_SLOPE(value, EPOCH(ts) / 86400), 6) AS slope,
           ROUND(REGR_INTERCEPT(value, EPOCH(ts) / 86400), 4) AS intercept,
           ROUND(REGR_R2(value, EPOCH(ts) / 86400), 8) AS r2,
           CAST(REGR_COUNT(value, EPOCH(ts) / 86400) AS BIGINT) AS n,
           ROUND(REGR_AVGX(value, EPOCH(ts) / 86400), 4) AS avg_x,
           ROUND(REGR_AVGY(value, EPOCH(ts) / 86400), 4) AS avg_y
    FROM events GROUP BY event_type
    """,
)
def agg_regression_family(spark, sf_dir):
    """SQL:2003 linear-regression aggregates (slope/intercept/R²/avgs) per
    group — one-pass partial/final aggregation in both engines, the
    declarative cousin of ml_simple_linreg's closed form."""
    ev = table(spark, sf_dir, "events")
    # x in DAYS, not seconds: against epoch-second x the slope magnitude is
    # ~5e-7 — the same order as its own 6-dp rounding quantum, so the
    # rounded value is boundary-noise (caught at sfgen10: engines agree to
    # ~12 significant digits but the fixed-dp round flipped).  Day-scaled x
    # puts slope at ~0.05 with ~5 significant digits of headroom; r2 is
    # dimensionless ~1e-6 here, so it rounds at 8 dp.
    x = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86400e6)
    y = F.col("value")
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 8).alias("r2"),
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


@query(
    "stats_chi_square",
    sql="""
    WITH obs AS (
      SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS o
      FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL
      GROUP BY lang, source
    ),
    m AS (
      SELECT o,
             SUM(o) OVER (PARTITION BY lang) AS rt,
             SUM(o) OVER (PARTITION BY source) AS ct,
             SUM(o) OVER () AS n,
             COUNT(DISTINCT lang) OVER () AS r,
             COUNT(DISTINCT source) OVER () AS c
      FROM obs
    )
    SELECT ROUND(SUM(POWER(o - rt * ct / n, 2) / (rt * ct / n)), 6) AS chi2,
           CAST((MIN(r) - 1) * (MIN(c) - 1) AS BIGINT) AS dof,
           CAST(MIN(n) AS BIGINT) AS n
    FROM m
    """,
)
def stats_chi_square(spark, sf_dir):
    """Pearson chi-square independence test: is document language
    independent of source?  One contingency-table aggregate; margins and
    the statistic are arithmetic on the (tiny) table."""
    return statistics.chi_square_independence(
        table(spark, sf_dir, "documents"), "lang", "source"
    )


@query(
    "stats_welch_ttest",
    sql="""
    WITH g AS (
      SELECT lang, CAST(COUNT(n_chars) AS DOUBLE) AS n,
             AVG(n_chars) AS m, VAR_SAMP(n_chars) AS v
      FROM documents WHERE lang IN ('en', 'fr') GROUP BY lang
    ),
    a AS (SELECT n AS na, m AS ma, v AS va FROM g WHERE lang = 'en'),
    b AS (SELECT n AS nb, m AS mb, v AS vb FROM g WHERE lang = 'fr')
    SELECT ROUND((ma - mb) / SQRT(va / na + vb / nb), 6) AS t_stat,
           ROUND(POWER(va / na + vb / nb, 2)
                 / (POWER(va / na, 2) / (na - 1)
                    + POWER(vb / nb, 2) / (nb - 1)), 6) AS dof,
           ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM a, b
    """,
)
def stats_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t test: do English and French documents
    differ in length?  One per-group moment aggregate + closed-form
    statistic (Welch–Satterthwaite dof)."""
    return statistics.welch_t_test(
        table(spark, sf_dir, "documents"), "n_chars", "lang", "en", "fr"
    )


@query(
    "stats_spearman",
    sql="""
    WITH r AS (
      SELECT RANK() OVER (ORDER BY l_quantity)
               + (COUNT(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS ra,
             RANK() OVER (ORDER BY l_extendedprice)
               + (COUNT(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS rb
      FROM lineitem
    )
    SELECT ROUND(CORR(ra, rb), 6) AS spearman, CAST(COUNT(*) AS BIGINT) AS n
    FROM r
    """,
)
def stats_spearman(spark, sf_dir):
    """Spearman rank correlation with exact tie midranks.  Ranks come from
    the distributed prefix-sum (`global_avg_ranks`: range-partitioned
    distinct table + per-partition offsets), never a single-partition
    window; the oracle's global RANK() window is the semantic twin."""
    return statistics.spearman_correlation(
        table(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


@query(
    "stats_mann_whitney",
    sql="""
    WITH d AS (SELECT lang, n_chars FROM documents WHERE lang IN ('en', 'fr')),
    r AS (
      SELECT lang,
             RANK() OVER (ORDER BY n_chars)
               + (COUNT(*) OVER (PARTITION BY n_chars) - 1) / 2.0 AS rk
      FROM d
    ),
    g AS (SELECT lang, SUM(rk) AS rsum, CAST(COUNT(*) AS DOUBLE) AS n
          FROM r GROUP BY lang),
    a AS (SELECT rsum AS ra, n AS na FROM g WHERE lang = 'en'),
    b AS (SELECT rsum AS rb, n AS nb FROM g WHERE lang = 'fr')
    SELECT ROUND(ra - na * (na + 1) / 2.0, 4) AS u_a,
           ROUND(rb - nb * (nb + 1) / 2.0, 4) AS u_b,
           ROUND(ra, 4) AS r_a,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM a, b
    """,
)
def stats_mann_whitney(spark, sf_dir):
    """Mann–Whitney U (rank-sum) between English and French document
    lengths, tie-corrected midranks via the same distributed ranking."""
    return statistics.mann_whitney_u(
        table(spark, sf_dir, "documents"), "n_chars", "lang", "en", "fr"
    )


@query(
    "stats_count_min_sketch",
    sql="""
    WITH cells AS (
      SELECT e.user_id, j.j AS j,
             (CAST('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 1, 12) AS BIGINT)
              + j.j * CAST('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 13, 12) AS BIGINT)
             ) % 64 AS pos
      FROM events e, generate_series(0, 2) j(j)
    ),
    sketch AS (SELECT j, pos, COUNT(*) AS cnt FROM cells GROUP BY j, pos),
    keys AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
    qc AS (
      SELECT k.user_id, j.j AS j,
             (CAST('0x' || substr(md5(CAST(k.user_id AS VARCHAR)), 1, 12) AS BIGINT)
              + j.j * CAST('0x' || substr(md5(CAST(k.user_id AS VARCHAR)), 13, 12) AS BIGINT)
             ) % 64 AS pos
      FROM keys k, generate_series(0, 2) j(j)
    ),
    est AS (
      SELECT qc.user_id, MIN(COALESCE(s.cnt, 0)) AS est_count
      FROM qc LEFT JOIN sketch s ON s.j = qc.j AND s.pos = qc.pos
      GROUP BY qc.user_id
    ),
    exact AS (SELECT user_id, COUNT(*) AS exact_count
              FROM events WHERE user_id < 20 GROUP BY user_id)
    SELECT est.user_id, CAST(est.est_count AS BIGINT) AS est_count,
           CAST(exact.exact_count AS BIGINT) AS exact_count
    FROM est JOIN exact USING (user_id)
    """,
)
def stats_count_min_sketch(spark, sf_dir):
    """Count-Min sketch per-user event frequencies (width 64 forces
    collisions) next to exact counts: the md5 double-hash family makes the
    whole sketch — including every collision-induced overestimate —
    bit-reproducible in SQL.  CMS >= exact always; the sketch itself is
    <= depth*width rows whatever the input size."""
    from compss_python_spark.functions import sketches

    ev = table(spark, sf_dir, "events")
    sk = sketches.cms_build(ev, "user_id", width=64, depth=3)
    keys = ev.filter("user_id < 20").select("user_id").distinct()
    est = sketches.cms_estimate(sk, keys, "user_id", width=64, depth=3)
    exact = (
        ev.filter("user_id < 20")
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_count"))
    )
    return est.join(exact, "user_id")


@query(
    "stats_hyperloglog",
    sql="""
    WITH h AS (
      SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS hv
      FROM events
    ),
    reg AS (
      SELECT CAST(hv % 64 AS INT) AS idx,
             MAX(CASE WHEN hv // 64 > 0 THEN 42 - length(bin(hv // 64)) + 1
                      ELSE 43 END) AS rho_max
      FROM h GROUP BY 1
    ),
    agg AS (SELECT SUM(POWER(2.0, -rho_max)) AS s, COUNT(*) AS used FROM reg)
    SELECT ROUND(CASE WHEN (0.709 * 64 * 64 / (s + (64 - used))) <= 2.5 * 64
                       AND (64 - used) > 0
                      THEN 64.0 * LN(64.0 / (64 - used))
                      ELSE 0.709 * 64 * 64 / (s + (64 - used)) END, 4) AS est,
           CAST(used AS BIGINT) AS n_registers_used,
           CAST(64 - used AS BIGINT) AS n_zero_registers,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) AS exact_distinct
    FROM agg
    """,
)
def stats_hyperloglog(spark, sf_dir):
    """Deterministic HyperLogLog (md5 hash family, string-length rho — no
    float log2) next to the exact distinct count: the oracle reproduces
    every register and the estimate itself, proving the sketch machinery
    rather than just its error bound.  Production cardinality estimates
    use Spark's approx_count_distinct (engine-internal HLL++ → the
    rows-only `approx_count_distinct` query); this is its oracled
    from-first-principles sibling."""
    from compss_python_spark.functions import sketches

    ev = table(spark, sf_dir, "events")
    est = sketches.hll_estimate(sketches.hll_build(ev, "user_id", b=6), b=6)
    exact = ev.agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    return est.crossJoin(exact)


@query(
    "stats_hll_per_group",
    sql="""
    WITH h AS (
      SELECT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS hv
      FROM events
    ),
    reg AS (
      SELECT event_type, CAST(hv % 64 AS INT) AS idx,
             MAX(CASE WHEN hv // 64 > 0 THEN 42 - length(bin(hv // 64)) + 1
                      ELSE 43 END) AS rho_max
      FROM h GROUP BY 1, 2
    ),
    agg AS (SELECT event_type, SUM(POWER(2.0, -rho_max)) AS s, COUNT(*) AS used
            FROM reg GROUP BY 1),
    est AS (
      SELECT event_type,
             ROUND(CASE WHEN (0.709 * 64 * 64 / (s + (64 - used))) <= 2.5 * 64
                         AND (64 - used) > 0
                        THEN 64.0 * LN(64.0 / (64 - used))
                        ELSE 0.709 * 64 * 64 / (s + (64 - used)) END, 4) AS est,
             CAST(used AS BIGINT) AS n_registers_used,
             CAST(64 - used AS BIGINT) AS n_zero_registers
      FROM agg
    ),
    exact AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
              FROM events GROUP BY 1)
    SELECT est.event_type, est.est, est.n_registers_used, est.n_zero_registers,
           CAST(exact.exact_distinct AS BIGINT) AS exact_distinct
    FROM est JOIN exact USING (event_type)
    """,
)
def stats_hll_per_group(spark, sf_dir):
    """Per-group HLL: distinct users per event type from ONE pass of
    register building (groupBy(event_type, idx)) — the groupBy-sketch shape
    that replaces count_distinct's per-group sort/dedup at 100 TB.  Exact
    distinct alongside for calibration; oracle reproduces every register."""
    from compss_python_spark.functions import sketches

    ev = table(spark, sf_dir, "events")
    reg = sketches.hll_build(ev, "user_id", b=6, group_cols=["event_type"])
    est = sketches.hll_estimate(reg, b=6, group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


@query(
    "profile_orders",
    sql="""
    SELECT 'o_orderkey' AS col_name, COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    """,
)
def profile_orders(spark, sf_dir):
    """Data-profiling report (null rate / distinct count / min / max per
    column, long format) over orders — ONE aggregate pass for all
    columns.  Float columns are excluded from this query's min/max
    surface (double→string formatting is not engine-portable); the
    operator itself profiles any type."""
    from compss_python_spark.functions.statistics import profile_columns

    orders = table(spark, sf_dir, "orders")
    return profile_columns(
        orders, ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"]
    )


@query(
    "stats_key_skew",
    sql="""
    WITH c AS (SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM lineitem GROUP BY 1),
    t AS (SELECT SUM(cnt) AS t FROM c),
    topn AS (SELECT key, cnt, ROUND(cnt / t.t, 6) AS share
             FROM c CROSS JOIN t ORDER BY cnt DESC, key LIMIT 10)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS INT)
             AS key_rank, key, cnt, share
    FROM topn
    """,
)
def stats_key_skew(spark, sf_dir):
    """Pre-join skew diagnostic over lineitem's supplier key: top-10
    heaviest keys with row share.  One map-combined count; top-N is
    TakeOrdered; the rank window orders 10 rows."""
    from compss_python_spark.functions.statistics import key_skew_report

    return key_skew_report(table(spark, sf_dir, "lineitem"), "l_suppkey")


@query(
    "stats_psi_drift",
    sql="""
    WITH f AS (
      SELECT CAST((value >= 25) AS INT) + CAST((value >= 50) AS INT)
             + CAST((value >= 100) AS INT) + CAST((value >= 200) AS INT)
             + CAST((value >= 300) AS INT) AS bin,
             event_type AS s
      FROM events
      WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
    agg AS (
      SELECT bin,
             SUM(CASE WHEN s = 'view' THEN 1 ELSE 0 END) AS r,
             SUM(CASE WHEN s = 'purchase' THEN 1 ELSE 0 END) AS c
      FROM f GROUP BY 1),
    shares AS (
      SELECT bin,
             GREATEST(r / CAST(SUM(r) OVER () AS DOUBLE), 1e-6) AS pr,
             GREATEST(c / CAST(SUM(c) OVER () AS DOUBLE), 1e-6) AS pc
      FROM agg)
    SELECT bin,
           ROUND(pr, 6) AS ref_share,
           ROUND(pc, 6) AS cmp_share,
           ROUND((pc - pr) * LN(pc / pr), 6) AS psi_contrib,
           ROUND(SUM((pc - pr) * LN(pc / pr)) OVER (), 6) AS psi_total
    FROM shares
    """,
)
def stats_psi_drift(spark, sf_dir):
    """Population Stability Index of event value, purchase slice vs view
    slice, over fixed breakpoints (25/50/100/200/300) — the standard
    model/feature drift monitor.  One scan of the two slices, bin id is a
    narrow indicator sum, both slices reduce in the SAME map-combined
    groupBy(bin); everything after runs on <= 6 rows."""
    from compss_python_spark.functions.statistics import psi_drift

    return psi_drift(
        table(spark, sf_dir, "events"), "value", "event_type",
        "view", "purchase", breaks=[25.0, 50.0, 100.0, 200.0, 300.0],
    )


@query(
    "quality_expectations",
    sql="""
    WITH m AS (
      SELECT
        ROUND(AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS m0,
        ROUND(COUNT(DISTINCT o_orderkey) / CAST(COUNT(*) AS DOUBLE), 6) AS m1,
        ROUND(AVG(CASE WHEN o_totalprice BETWEEN 0 AND 1000000
                  THEN 1.0 ELSE 0.0 END), 6) AS m2,
        ROUND(AVG(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
                  THEN 1.0 ELSE 0.0 END), 6) AS m3,
        ROUND(AVG(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                  THEN 1.0 ELSE 0.0 END), 6) AS m4,
        ROUND(AVG(CASE WHEN o_totalprice >= 0 THEN 1.0 ELSE 0.0 END), 6)
          AS m5
      FROM orders)
    SELECT "check", "column", metric, threshold,
           COALESCE(metric >= threshold, FALSE) AS passed
    FROM (
      SELECT 'completeness' AS "check", 'o_custkey' AS "column",
             m0 AS metric, 1.0 AS threshold FROM m
      UNION ALL SELECT 'uniqueness', 'o_orderkey', m1, 1.0 FROM m
      UNION ALL SELECT 'in_range', 'o_totalprice', m2, 1.0 FROM m
      UNION ALL SELECT 'in_set', 'o_orderstatus', m3, 1.0 FROM m
      UNION ALL SELECT 'matches_regex', 'o_orderpriority', m4, 0.99 FROM m
      UNION ALL SELECT 'non_negative', 'o_totalprice', m5, 1.0 FROM m)
    ORDER BY "check", "column"
    """,
)
def quality_expectations(spark, sf_dir):
    """Deequ-style declarative data-quality suite over orders: six checks
    (completeness, uniqueness, range, set membership, regex conformance,
    non-negativity) evaluated in ONE map-combined aggregate pass — the
    batch-gate report a 100 TB ingestion pipeline runs per delivery.  The
    long-format report is an explode of the 1-row wide aggregate."""
    from compss_python_spark.functions import quality as Q

    orders = table(spark, sf_dir, "orders")
    return Q.expectations_report(orders, [
        Q.completeness("o_custkey", 1.0),
        Q.uniqueness("o_orderkey", 1.0),
        Q.in_range("o_totalprice", 0, 1_000_000, 1.0),
        Q.in_set("o_orderstatus", ["F", "O", "P"], 1.0),
        Q.matches_regex("o_orderpriority", "^[1-5]-", 0.99),
        Q.non_negative("o_totalprice", 1.0),
    ])


@query(
    "quantiles_histogram",
    headline=True,
    sql="""
    WITH b AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
             COUNT(l_extendedprice) AS n
      FROM lineitem),
    h AS (
      SELECT LEAST(CAST(FLOOR((l_extendedprice - b.lo)
                               / ((b.hi - b.lo) / 1000.0)) AS INT), 999) AS bucket,
             COUNT(*) AS c
      FROM lineitem, b
      WHERE l_extendedprice IS NOT NULL
      GROUP BY 1),
    cum AS (
      SELECT bucket, c,
             COALESCE(SUM(c) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM h),
    q(p) AS (VALUES (0.25), (0.5), (0.75), (0.95), (0.99)),
    hit AS (
      SELECT q.p, cum.bucket, cum.c, cum.cb,
             ROW_NUMBER() OVER (PARTITION BY q.p ORDER BY cum.bucket) AS rn
      FROM q JOIN cum ON cum.cb + cum.c >= q.p * (SELECT n FROM b))
    SELECT p,
           ROUND((SELECT lo FROM b) + ((SELECT hi FROM b) - (SELECT lo FROM b)) / 1000.0
                 * (bucket + (p * (SELECT n FROM b) - cb) / c), 6) AS quantile
    FROM hit WHERE rn = 1
    """,
)
def quantiles_histogram(spark, sf_dir):
    """Bounded-memory histogram quantiles (1000 bins, linear interpolation,
    error ≤ one bin width) — the oracle re-derives bounds, histogram,
    cumulative walk and interpolation, so the hash match proves the whole
    approximate-percentile machinery; `quantiles_exact` is the exact-sort
    sibling these approximate."""
    from compss_python_spark.functions.statistics import histogram_quantiles

    return histogram_quantiles(
        table(spark, sf_dir, "lineitem"), "l_extendedprice",
        [0.25, 0.5, 0.75, 0.95, 0.99], bins=1000,
    )


@query(
    "quantiles_histogram_by_group",
    sql="""
    WITH d AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
      WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
        AND event_type IS NOT NULL),
    b AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM d),
    h AS (
      SELECT g,
             LEAST(CAST(FLOOR((v - b.lo) / ((b.hi - b.lo) / 200.0)) AS INT), 199)
               AS bucket,
             COUNT(*) AS c
      FROM d, b GROUP BY 1, 2),
    cum AS (
      SELECT g, bucket, c,
             COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
             SUM(c) OVER (PARTITION BY g) AS n
      FROM h),
    q(p) AS (VALUES (0.5), (0.95)),
    hit AS (
      SELECT cum.g, q.p, bucket, c, cb, n,
             ROW_NUMBER() OVER (PARTITION BY cum.g, q.p ORDER BY bucket) AS rn
      FROM cum JOIN q ON cb + c >= q.p * n)
    SELECT g AS event_type, p,
           ROUND((SELECT lo FROM b) + ((SELECT hi FROM b) - (SELECT lo FROM b)) / 200.0
                 * (bucket + (p * n - cb) / c), 4) AS quantile
    FROM hit WHERE rn = 1
    """,
)
def quantiles_histogram_by_group(spark, sf_dir):
    """Per-group approximate quantiles (p50/p95 of event value per event
    type) on shared fixed bins — the "p95 per tenant" shape whose per-group
    window is bounded by the bin count, never a per-group sort.  The oracle
    re-derives grid, per-group histogram, cumulative walk and
    interpolation."""
    from compss_python_spark.functions.statistics import grouped_histogram_quantiles

    # 4 dp in ONE rounding step (round_dp=4 — double rounding via a 6-dp
    # intermediate diverges from the oracle's single ROUND on half-way
    # values): the repo's quantile convention, cf. quantiles_exact.
    return grouped_histogram_quantiles(
        table(spark, sf_dir, "events"), "value", "event_type",
        [0.5, 0.95], bins=200, round_dp=4,
    )
