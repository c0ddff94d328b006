"""Digest-mode gate: cross-engine fingerprint parity + sensitivity.

The `--digest` mode of tools/check_correctness.py lets each engine
fingerprint its own output (md5-sum over canonically serialized rows)
so a 60 M-row row-preserving result verifies at sfgen100 without a
collect.  These tests prove the two properties the mode rests on:

1. PARITY — for every output type class the engines serialize a cell to
   the same bytes (doubles via the EXACT mantissa/exponent form of
   `_exact_double_cell` — full 64-bit resolution at every magnitude,
   incl. NaN/Inf/subnormals, with -0.0 normalized to '0'; timestamps
   via epoch micros, dates via epoch days, booleans as 0/1, NULLs via
   the \\x1e sentinel), so identical data → identical digest.
2. SENSITIVITY — a single-ULP change in one double cell, a dropped row,
   or a swapped column value flips the digest, while a row-order
   permutation does NOT (the sum is the multiset fingerprint).

The round-10 upgrade from DECIMAL(38,6) quantization to exact
mantissa/exponent exists because the old form was magnitude-fragile:
above ~1e10 one ulp exceeds 1e-6 and Spark (shortest-repr BigDecimal)
vs DuckDB (exact binary expansion) round the sub-ulp 6th decimal
differently — bit-identical 3.7e10 revenue sums digested differently.
`test_digest_double_parity_bit_identical_inputs` pins that class with
parquet-fed (bit-identical) inputs, which a literal-SQL fixture cannot
do: DuckDB parses bare decimal literals via DECIMAL and can lose the
last ulp vs Python/Java strtod.
"""

import datetime as dt

import duckdb
import pytest

from tools.check_correctness import _duck_digest_sql, _spark_digest_sql


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def spark_digest(spark, df):
    df.createOrReplaceTempView("digest_test_q")
    n, hs = spark.sql(_spark_digest_sql(df, "digest_test_q")).collect()[0]
    return int(n), str(hs)


def duck_digest(duck, sql, spark_floating=frozenset()):
    dsql, cols, _ = _duck_digest_sql(duck, sql, spark_floating)
    row = duck.execute(dsql).df().iloc[0]
    return int(row["n"]), str(row["hs"])


def test_digest_parity_all_type_classes(spark, duck):
    sdf = spark.sql(
        """
        SELECT * FROM VALUES
          (1L, 0.5D, 'alpha', TIMESTAMP'2024-03-05 12:34:56.789',
           DATE'1998-09-02', true,  CAST(1.50 AS DECIMAL(12,2))),
          (2L, -0.0D, NULL, TIMESTAMP'1970-01-01 00:00:00',
           DATE'1970-01-01', false, CAST(-7.25 AS DECIMAL(12,2))),
          (3L, double('nan'), 'beta', NULL, NULL, NULL, NULL),
          (4L, double('inf'), 'gamma', TIMESTAMP'2030-12-31 23:59:59',
           DATE'2030-12-31', true, CAST(0 AS DECIMAL(12,2)))
        AS t(k, x, s, ts, d, b, m)
        """
    )
    oracle = """
        SELECT * FROM (VALUES
          (1::BIGINT, 0.5::DOUBLE, 'alpha',
           TIMESTAMP '2024-03-05 12:34:56.789', DATE '1998-09-02', true,
           1.50::DECIMAL(12,2)),
          (2::BIGINT, -0.0::DOUBLE, NULL,
           TIMESTAMP '1970-01-01 00:00:00', DATE '1970-01-01', false,
           (-7.25)::DECIMAL(12,2)),
          (3::BIGINT, 'nan'::DOUBLE, 'beta', NULL, NULL, NULL, NULL),
          (4::BIGINT, 'infinity'::DOUBLE, 'gamma',
           TIMESTAMP '2030-12-31 23:59:59', DATE '2030-12-31', true,
           0::DECIMAL(12,2))
        ) AS t(k, x, s, ts, d, b, m)
    """
    assert spark_digest(spark, sdf) == duck_digest(duck, oracle)


def test_digest_integer_sum_classes_align(spark, duck):
    # Spark SUM(bigint) -> bigint '42'; DuckDB SUM(int) -> HUGEINT '42'.
    sdf = spark.sql("SELECT SUM(id) AS total FROM range(10)")
    assert spark_digest(spark, sdf) == duck_digest(
        duck, "SELECT SUM(r) AS total FROM range(10) t(r)"
    )


def test_digest_order_insensitive(duck):
    a = duck_digest(duck, "SELECT * FROM (VALUES (1, 'x'), (2, 'y')) t(k, v)")
    b = duck_digest(duck, "SELECT * FROM (VALUES (2, 'y'), (1, 'x')) t(k, v)")
    assert a == b


def test_digest_double_parity_bit_identical_inputs(spark, duck, tmp_path):
    """Bit-identical doubles at EVERY magnitude digest identically, and a
    one-ulp perturbation flips the digest (the DECIMAL(38,6) form failed
    the first property above ~1e10 and the second below ~1e-7)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [
        36598259532.6491,  # the sfgen100 flagship class: ulp > 1e-6
        1e15 + 0.5, 2.0**53 - 1, 0.1, 1 / 3, math.pi, 1e300, -1e300,
        2.0**-1022, 5e-324, 1e-310,  # min normal + subnormals
        math.nextafter(1.0, 2.0), 1.0, 4.0, -0.0, 0.0,
        1.7976931348623157e308, 6.62607015e-34,
        None,  # NULL double: DuckDB CONCAT skips NULL args — must sentinel
    ]
    p = str(tmp_path / "doubles.parquet")
    pq.write_table(pa.table({"x": pa.array(vals, type=pa.float64())}), p)
    sdf = spark.read.parquet(p)
    base = duck_digest(duck, f"SELECT x FROM read_parquet('{p}')")
    assert spark_digest(spark, sdf) == base
    # one-ulp perturbation of the 3.7e10-class cell flips the digest
    vals2 = list(vals)
    vals2[0] = math.nextafter(vals2[0], math.inf)
    p2 = str(tmp_path / "doubles2.parquet")
    pq.write_table(pa.table({"x": pa.array(vals2, type=pa.float64())}), p2)
    assert duck_digest(duck, f"SELECT x FROM read_parquet('{p2}')") != base


def test_digest_floating_decimal_bridge(spark, duck):
    """A Spark DOUBLE column whose oracle twin is a bare literal (DECIMAL
    in DuckDB) or an integer expression must digest identically: the gate
    bridges any column EITHER side types as floating to the exact-double
    form on BOTH sides (pre-bridge, `0.25` digested as '0.250000' against
    Spark's mantissa/exponent string — quantiles_histogram at sfgen100)."""
    sdf = spark.sql(
        "SELECT CAST(0.25 AS DOUBLE) AS p, CAST(1 AS DOUBLE) AS r, "
        "CAST(0.99 AS DOUBLE) AS t"
    )
    oracle = "SELECT 0.25 AS p, 1 AS r, 0.99 AS t"  # DECIMAL/INTEGER/DECIMAL
    assert spark_digest(spark, sdf) == duck_digest(
        duck, oracle, spark_floating={"p", "r", "t"}
    )


@pytest.mark.parametrize(
    "perturbed",
    [
        # 6th-decimal flip on one double cell
        "SELECT * FROM (VALUES (1, 0.500002::DOUBLE), (2, 1.5::DOUBLE)) t(k, x)",
        # dropped row
        "SELECT * FROM (VALUES (1, 0.5::DOUBLE)) t(k, x)",
        # value moved between rows (same multiset per column, different rows)
        "SELECT * FROM (VALUES (2, 0.5::DOUBLE), (1, 1.5::DOUBLE)) t(k, x)",
        # NULL swapped in for a value
        "SELECT * FROM (VALUES (1, NULL::DOUBLE), (2, 1.5::DOUBLE)) t(k, x)",
    ],
)
def test_digest_sensitivity(duck, perturbed):
    base = "SELECT * FROM (VALUES (1, 0.5::DOUBLE), (2, 1.5::DOUBLE)) t(k, x)"
    assert duck_digest(duck, base) != duck_digest(duck, perturbed)
