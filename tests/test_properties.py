"""Property-based tests (hypothesis): operator semantics vs pandas ground
truth on arbitrary generated frames — catches edge cases (empty frames,
single rows, duplicate keys, extreme values, NaN-free ints) that
fixture-based tests miss."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from compss_python_spark.operators import aggregation, etl, setops
from compss_python_spark.operators import sort as sort_ops

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=3),          # key (forces duplicates)
        st.integers(min_value=-(10**9), max_value=10**9),  # value
    ),
    min_size=0,
    max_size=40,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v"]).astype("int64")
    return spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame([], "k long, v long")


@given(rows=ROWS)
@SETTINGS
def test_groupby_sum_matches_pandas(spark, rows):
    df = _df(spark, rows)
    got = {
        r["k"]: r["s"]
        for r in aggregation.agg(df, ["k"], {"v": [("sum", "s")]}).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    want = pdf.groupby("k")["v"].sum().to_dict() if len(pdf) else {}
    assert got == want


@given(rows=ROWS)
@SETTINGS
def test_sort_is_total_and_stable_under_key(spark, rows):
    df = _df(spark, rows)
    got = [(r["k"], r["v"]) for r in sort_ops.sort(df, ["k", "v"], [True, True]).collect()]
    assert got == sorted([(k, v) for k, v in rows])


@given(rows=ROWS)
@SETTINGS
def test_distinct_matches_set(spark, rows):
    df = _df(spark, rows)
    got = {(r["k"], r["v"]) for r in aggregation.distinct(df).collect()}
    assert got == set(rows)


@given(rows=ROWS, rows2=ROWS)
@SETTINGS
def test_except_all_bag_semantics(spark, rows, rows2):
    from collections import Counter

    a, b = _df(spark, rows), _df(spark, rows2)
    got = Counter((r["k"], r["v"]) for r in setops.except_all(a, b).collect())
    want = Counter(rows) - Counter(rows2)
    assert got == want


@given(rows=ROWS, frac_n=st.integers(min_value=0, max_value=10))
@SETTINGS
def test_take_bounded(spark, rows, frac_n):
    df = _df(spark, rows)
    out = etl.take(df, frac_n, order_by=["k", "v"]).collect()
    assert len(out) == min(frac_n, len(rows))
    got = [(r["k"], r["v"]) for r in out]
    assert got == sorted(rows)[:frac_n]
