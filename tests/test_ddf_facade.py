"""Fluent DDF/Context facade: the reference-parity public API end-to-end.

A user of the reference switches `COMPSsContext()` → `Context()` and keeps
their method chains; these tests exercise those chains as a user would.
"""

from __future__ import annotations

import pandas as pd
import pytest

from compss_python_spark.ddf import DDF, Context


@pytest.fixture(scope="module")
def cc(spark):
    return Context(spark)


@pytest.fixture(scope="module")
def orders(cc, sf_dir):
    return cc.read.parquet(f"{sf_dir}/orders.parquet").cache()


def test_read_filter_select_sort_take(orders):
    out = (
        orders.filter("o_orderstatus == 'F' and o_totalprice > 1000")
        .select(["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice"], ascending=[False])
        .take(5)
        .to_df()
    )
    assert len(out) == 5
    assert list(out.columns) == ["o_orderkey", "o_totalprice"]
    assert out["o_totalprice"].is_monotonic_decreasing


def test_groupby_sugar(orders):
    g = orders.group_by(["o_orderstatus"])
    counts = g.count().to_df().set_index("o_orderstatus")["count"]
    sums = g.sum(["o_totalprice"]).to_df().set_index("o_orderstatus")["sum_o_totalprice"]
    pdf = orders.to_df()
    expect = pdf.groupby("o_orderstatus")["o_totalprice"].agg(["count", "sum"])
    assert counts.to_dict() == expect["count"].to_dict()
    for k, v in expect["sum"].items():
        assert sums[k] == pytest.approx(v)


def test_agg_dict_with_ordered_list(orders):
    out = (
        orders.group_by(["o_orderstatus"])
        .agg({"o_totalprice": [("max", "max_price"), ("count", "n")]})
        .to_df()
    )
    assert set(out.columns) == {"o_orderstatus", "max_price", "n"}


def test_map_cast_rename_drop(cc):
    src = cc.parallelize(pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    out = (
        src.map("a * 10", "a10")
        .cast(["a10"], ["string"])
        .with_column_renamed("b", "label")
        .drop(["a"])
        .to_df()
    )
    assert sorted(out.columns) == ["a10", "label"]
    assert out["a10"].tolist() == ["10", "20", "30"]


def test_clean_missing_modes(cc):
    src = cc.parallelize(
        pd.DataFrame({"k": [1, 2, 3, 4], "v": [1.0, None, 3.0, None]})
    )
    assert src.clean_missing(["v"], mode="REMOVE_ROW").count_rows() == 2
    filled = src.clean_missing(["v"], mode="MEAN").to_df().sort_values("k")
    assert filled["v"].tolist() == [1.0, 2.0, 3.0, 2.0]


def test_add_column_positional(cc):
    left = cc.parallelize(pd.DataFrame({"id": [3, 1, 2], "a": ["c", "a", "b"]}))
    right = cc.parallelize(pd.DataFrame({"id2": [30, 10, 20], "b": ["C", "A", "B"]}))
    out = left.add_column(right, order_by1=["id"], order_by2=["id2"]).to_df()
    out = out.sort_values("id")
    assert out["b"].tolist() == ["A", "B", "C"]  # aligned by sorted position


def test_join_union_setops(cc):
    d1 = cc.parallelize(pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    d2 = cc.parallelize(pd.DataFrame({"k": [2, 3, 4], "w": ["B", "C", "D"]}))
    joined = d1.join(d2, ["k"]).to_df()
    assert sorted(joined["k"].tolist()) == [2, 3]
    u = d1.select(["k"]).union(d2.select(["k"])).count_rows()
    assert u == 6
    inter = d1.select(["k"]).intersect(d2.select(["k"])).to_df()
    assert sorted(inter["k"].tolist()) == [2, 3]
    sub = d1.select(["k"]).subtract(d2.select(["k"])).to_df()
    assert sub["k"].tolist() == [1]


def test_sample_split_schema(orders):
    n = orders.count_rows()
    s = orders.sample(n=50)
    assert s.count_rows() == 50
    a, b = orders.split(0.25)
    assert a.count_rows() + b.count_rows() == n
    assert "o_orderkey" in [f.name for f in orders.schema()]
    assert orders.num_of_partitions() >= 1


def test_statistics_methods(orders):
    corr = orders.correlation("o_orderkey", "o_totalprice")
    assert -1.0 <= corr <= 1.0
    cov = orders.covariance("o_orderkey", "o_totalprice")
    assert isinstance(cov, float)
    desc = orders.describe(["o_totalprice"]).to_df()
    assert not desc.empty


def test_save_roundtrip(cc, orders, tmp_path):
    path = str(tmp_path / "orders_out")
    orders.select(["o_orderkey", "o_totalprice"]).save.parquet(path)
    back = cc.read.parquet(path)
    assert back.count_rows() == orders.count_rows()


def test_map_with_python_lambda(cc):
    """Reference-style ddf.map(lambda row: ..., alias) parity."""
    src = cc.parallelize(pd.DataFrame({"a": [1, 2, 3], "b": [10.0, 20.0, 30.0]}))
    out = (
        src.map(lambda row: row["a"] * row["b"] + 1, "score", return_type="double")
        .sort(["a"])
        .to_df()
    )
    assert out["score"].tolist() == [11.0, 41.0, 91.0]


def test_llm_extension_chains(cc, sf_dir):
    docs = cc.read.parquet(f"{sf_dir}/documents.parquet")
    # quality → filter → dedup → per-lang counts, fluent end-to-end
    curated = (
        docs.quality_score()
        .filter("quality >= 0.5")
        .dedup_exact_by_hash("text", "doc_id")
        .group_by(["lang"])
        .count()
    )
    rows = curated.df.collect()
    assert rows and all(r["count"] > 0 for r in rows)

    lang = docs.language_id().df.select("doc_id", "lang_pred").collect()
    assert len(lang) == docs.count_rows()

    emb = cc.read.parquet(f"{sf_dir}/embeddings.parquet")
    topk = emb.similarity_topk(DDF(emb.df.filter("vec_id < 3")), k=2)
    got = topk.df.groupBy("query_id").count().collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert all(r["count"] == 2 for r in got)


def test_stratified_sample_facade(cc, spark, sf_dir):
    # events.ts is parquet TIMESTAMP(NANOS) — read as raw nanos (the ts
    # column is unused here; plans/registry.table() is the full-fidelity path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = cc.read.parquet(f"{sf_dir}/events.parquet")
    out = ev.sample_stratified("event_type", 5, "event_id").df
    counts = out.groupBy("event_type").count().collect()
    assert all(r["count"] <= 5 for r in counts)
    # deterministic: same call → same rows
    a = sorted(r["event_id"] for r in out.collect())
    b = sorted(
        r["event_id"]
        for r in ev.sample_stratified("event_type", 5, "event_id").df.collect()
    )
    assert a == b


def test_facade_llm_pipeline_wrappers(spark):
    from compss_python_spark.ddf import DDF

    docs = DDF(spark.createDataFrame(
        [(1, "a b a b e f"), (2, "x y z w one@x.co")], "doc_id long, text string"
    ))
    rep = rows_by(docs.repetition_stats(), "doc_id")
    assert abs(rep[1]["dup_token_frac"] - 2 / 6) < 1e-6
    assert rows_by(docs.pii_stats(), "doc_id")[2]["n_email"] == 1
    red = rows_by(docs.pii_redact(), "doc_id")
    assert red[2]["redacted"].endswith("[EMAIL]")
    bench = DDF(spark.createDataFrame([(9, "x y z w q")], "doc_id long, text string"))
    dec = rows_by(docs.decontaminate(bench, n=4), "doc_id")
    assert dec[2]["contaminated"] and not dec[1]["contaminated"]
    edges = DDF(spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"))
    cc = {r["node"]: r["component"] for r in edges.connected_components().df.collect()}
    assert cc == {1: 1, 2: 1, 3: 1}


def rows_by(ddf, key):
    return {r[key]: r for r in ddf.df.collect()}


def test_facade_pagerank_and_triangles(spark):
    import pandas as pd

    from compss_python_spark.ddf import DDF

    edges = DDF(spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3, 1], "dst": [2, 3, 1, 3]})
    ))
    ranks = {r["node"]: r["rank"] for r in edges.pagerank().df.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert edges.triangle_count().df.first()["n_triangles"] == 1


def test_facade_spans_and_unpivot(spark):
    import pandas as pd

    from compss_python_spark.ddf import DDF

    docs = DDF(spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["shared passage one two three four five end",
                 "intro shared passage one two three four five"],
    })))
    spans = {r["doc_id"]: r["n_covered"] for r in docs.duplicate_spans(n=5).df.collect()}
    assert spans[1] > 0 and spans[2] > 0

    wide = DDF(spark.createDataFrame(pd.DataFrame({"g": ["x"], "a": [1], "b": [2]})))
    long = wide.unpivot(["g"], ["a", "b"]).df.collect()
    assert {(r["g"], r["metric"], r["value"]) for r in long} == {("x", "a", 1), ("x", "b", 2)}
