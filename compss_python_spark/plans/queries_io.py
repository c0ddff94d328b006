"""Declared queries: source/sink round-trips (SURVEY.md §2.1 #2/#3/#5).

Each query writes a table out through the engine's save path (csv / json),
reads it back through the corresponding source, and aggregates — the oracle
aggregates the ORIGINAL parquet directly, so any encode/decode drift (type
widening, quoting, null handling) breaks the hash match.

Scratch space lives under the repo (``.tmp/io/``), unique per scale factor,
overwritten per run.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from compss_python_spark.plans.registry import query, table

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".tmp", "io")


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(_SCRATCH, f"{name}_{tag}")


@query(
    "io_csv_roundtrip",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           STRFTIME(MIN(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS first_date
    FROM orders GROUP BY o_orderstatus
    """,
)
def io_csv_roundtrip(spark, sf_dir):
    """orders → save.csv → read.csv (explicit schema) → aggregate.  Doubles
    survive the text round-trip exactly (Spark writes round-trippable
    17-significant-digit representations)."""
    from compss_python_spark.sources.io import read_csv, write_csv

    path = _scratch(sf_dir, "csv_orders")
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
    write_csv(src, path, mode="overwrite")
    back = read_csv(
        spark,
        path,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate date",
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
    )


@query(
    "io_json_roundtrip",
    sql="""
    SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc
    FROM documents GROUP BY lang
    """,
)
def io_json_roundtrip(spark, sf_dir):
    """documents → save.json → read.json (explicit schema) → aggregate.
    Free-text content exercises JSON string escaping end-to-end."""
    from compss_python_spark.sources.io import read_json, write_json

    path = _scratch(sf_dir, "json_documents")
    write_json(table(spark, sf_dir, "documents"), path, mode="overwrite")
    back = read_json(
        spark,
        path,
        schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
    )
