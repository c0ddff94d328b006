"""Digest-mode gate: cross-engine fingerprint parity + sensitivity.

The `--digest` mode of tools/check_correctness.py lets each engine
fingerprint its own output (md5-sum over canonically serialized rows)
so a 60 M-row row-preserving result verifies at sfgen100 without a
collect.  These tests prove the two properties the mode rests on:

1. PARITY — for every output type class the engines serialize a cell to
   the same bytes (doubles via DECIMAL(38,6) incl. NaN/Inf/-0.0,
   timestamps via epoch micros, dates via epoch days, booleans as 0/1,
   NULLs via the \\x1e sentinel), so identical data → identical digest.
2. SENSITIVITY — a single-cell change at the 6th decimal place, a
   dropped row, or a swapped column value flips the digest, while a
   row-order permutation does NOT (the sum is the multiset fingerprint).
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


def duck_digest(duck, sql):
    dsql, cols = _duck_digest_sql(duck, sql)
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
