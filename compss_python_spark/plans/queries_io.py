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
           SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
             AS total,
           STRFTIME(MIN(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS first_date
    FROM orders GROUP BY o_orderstatus
    """,
)
def io_csv_roundtrip(spark, sf_dir):
    """orders → save.csv → read.csv (explicit schema) → aggregate.  Doubles
    survive the text round-trip exactly (Spark writes round-trippable
    17-significant-digit representations).

    total follows the q1 EXACT money-sum convention (FLOOR(x*100+0.5)
    integer cents, ONE final IEEE division): only 3 status groups span
    15 M orders at sfgen100, so the per-group sum reaches 1.9×10¹² where
    the 2-dp round sits inside double-summation ulp — the round-10 money
    audit called this site group-bounded, and the gen100 digest sweep
    proved that wrong (the 'O' group flipped …519.91 vs …519.92)."""
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
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))) / F.lit(100.0)
        ).alias("total"),
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


@query(
    "parallelize_literal",
    sql="""
    SELECT g AS grp, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS total
    FROM (VALUES ('a', 1), ('a', 2), ('b', 3), ('b', 4), ('c', 5)) AS t(g, v)
    GROUP BY g
    """,
)
def parallelize_literal(spark, sf_dir):
    """parallelize (#1): a local pandas frame becomes a distributed DDF;
    the aggregate of the fixed literal data is the oracle (VALUES twin)."""
    import pandas as pd

    from compss_python_spark.ddf import Context

    cc = Context(spark=spark)
    ddf = cc.parallelize(
        pd.DataFrame({"g": ["a", "a", "b", "b", "c"], "v": [1, 2, 3, 4, 5]}),
        nfrag=3,
    )
    return ddf.df.groupBy(F.col("g").alias("grp")).agg(
        F.count("*").alias("n"), F.sum("v").alias("total")
    )


@query(
    "import_compss_data_union",
    sql="""
    SELECT CAST(SUM(v) AS BIGINT) AS total, COUNT(*) AS n,
           MIN(v) AS min_v, MAX(v) AS max_v
    FROM (VALUES (1), (2), (3), (10), (20), (30)) AS t(v)
    """,
)
def import_compss_data_union(spark, sf_dir):
    """import_compss_data (#7): a list of local pandas fragments unions into
    one distributed frame — fragment boundaries must not affect results."""
    import pandas as pd

    from compss_python_spark.ddf import Context

    cc = Context(spark=spark)
    ddf = cc.import_compss_data(
        [pd.DataFrame({"v": [1, 2, 3]}), pd.DataFrame({"v": [10, 20, 30]})]
    )
    return ddf.df.agg(
        F.sum("v").alias("total"),
        F.count("*").alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


@query(
    "partitioning_invariance",
    sql="""
    SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders
    """,
)
def partitioning_invariance(spark, sf_dir):
    """repartition/hash_partition/range_partition/balancer (#29–32) chained:
    results must be invariant to physical partitioning — the oracle is the
    plain aggregate.  (Partition COUNTS are asserted in the facade tests;
    this proves no row is lost/duplicated through the partitioners.)"""
    from compss_python_spark.operators.etl import (
        balancer,
        hash_partition,
        range_partition,
        repartition,
    )

    df = table(spark, sf_dir, "orders")
    df = repartition(df, 16)
    df = hash_partition(df, ["o_custkey"], 8)
    df = range_partition(df, ["o_orderkey"], 8)
    df = balancer(df)
    return df.agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


def _write_fixture_shapefile(shp: str, dbf: str) -> None:
    """Deterministic two-polygon .shp/.dbf fixture (pure-format writer, same
    public ESRI/dBASE layouts the reader parses)."""
    import struct as _s

    rings = [
        [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
        [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0)],
    ]
    records = b""
    for i, ring in enumerate(rings):
        xs, ys = [p[0] for p in ring], [p[1] for p in ring]
        payload = _s.pack("<i", 5)
        payload += _s.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        payload += _s.pack("<ii", 1, len(ring))
        payload += _s.pack("<i", 0)
        for x, y in ring:
            payload += _s.pack("<dd", x, y)
        records += _s.pack(">ii", i + 1, len(payload) // 2) + payload
    header = _s.pack(">i", 9994) + b"\x00" * 20
    header += _s.pack(">i", (100 + len(records)) // 2)
    header += _s.pack("<ii", 1000, 5)
    header += _s.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    with open(shp, "wb") as f:
        f.write(header + records)

    names, rows = ["NAME", "AREA"], [["low", 100.0], ["high", 100.0]]
    flen = 16
    fields = b""
    for n, ftype in [("NAME", b"C"), ("AREA", b"N")]:
        fields += n.encode().ljust(11, b"\x00") + ftype + b"\x00" * 4 + bytes([flen]) + b"\x00" * 15
    header_len = 32 + len(fields) + 1
    record_len = 1 + flen * len(names)
    head = _s.pack("<BBBBIHH", 3, 24, 1, 1, len(rows), header_len, record_len)
    head += b"\x00" * 20 + fields + b"\x0d"
    recs = b""
    for row in rows:
        recs += b" " + b"".join(str(v).encode().ljust(flen)[:flen] for v in row)
    with open(dbf, "wb") as f:
        f.write(head + recs + b"\x1a")


@query(
    "shapefile_roundtrip_attrs",
    sql="""
    SELECT * FROM (VALUES
      (0, 'low',  100.0, 4, 0.0,  10.0),
      (1, 'high', 100.0, 4, 20.0, 30.0)
    ) AS t(geom_id, name, area, n_points, min_x, max_x)
    """,
)
def shapefile_roundtrip_attrs(spark, sf_dir):
    """read.shapefile (#4): write a deterministic two-polygon .shp/.dbf pair,
    read it back through the public reader, and project geometry + dbf
    attributes (typed from the field descriptors: N → double).  The oracle
    is the expected parse as a VALUES literal."""
    import os as _os

    from compss_python_spark.geo import read_shapefile

    d = _scratch(sf_dir, "shapefile")
    _os.makedirs(d, exist_ok=True)
    shp, dbf = _os.path.join(d, "fx.shp"), _os.path.join(d, "fx.dbf")
    _write_fixture_shapefile(shp, dbf)
    df = read_shapefile(spark, shp, dbf)
    xs = F.transform("points", lambda p: p.x)
    return df.select(
        F.col("geom_id").cast("int").alias("geom_id"),
        F.col("NAME").alias("name"),
        F.col("AREA").alias("area"),
        F.size("points").alias("n_points"),
        F.array_min(xs).alias("min_x"),
        F.array_max(xs).alias("max_x"),
    )


@query(
    "io_partitioned_pruning",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def io_partitioned_pruning(spark, sf_dir):
    """orders → hive-partitioned parquet (partitionBy o_orderstatus) →
    filtered read-back.  The o_orderstatus predicate becomes a PARTITION
    filter (directory pruning, no data read outside 'F'/ — asserted in
    tests/test_plans.py::test_partitioned_write_prunes); the oracle
    aggregates the original parquet with the same predicate."""
    from compss_python_spark.sources.io import read_parquet, write_parquet

    path = _scratch(sf_dir, "part_orders")
    write_parquet(
        table(spark, sf_dir, "orders"), path, partition_by=["o_orderstatus"]
    )
    back = read_parquet(spark, path).filter(F.col("o_orderstatus") == "F")
    # Integer-cents sum (the repo's TPC-H oracle pattern): a double SUM
    # rounded post-hoc can differ across engines near a half-cent boundary.
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("total_cents"),
    )


@query(
    "io_orc_roundtrip",
    sql="""
    SELECT l_returnflag, COUNT(*) AS n,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))::BIGINT AS price_cents,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def io_orc_roundtrip(spark, sf_dir):
    """lineitem → ORC (Spark's second native columnar format: pushdown and
    pruning apply as with parquet) → read-back → aggregate.  The oracle
    aggregates the ORIGINAL parquet, so a hash match proves the ORC writer/
    reader preserve every value exactly."""
    from compss_python_spark.sources.io import read_orc, write_orc

    path = _scratch(sf_dir, "orc_lineitem")
    write_orc(
        table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_extendedprice", "l_quantity"
        ),
        path,
    )
    back = read_orc(spark, path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("price_cents"),
        F.sum(F.round(F.col("l_quantity"), 0).cast("bigint")).alias("qty"),
    )


@query(
    "io_schema_merge",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS newcol_cents,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_legacy
    FROM orders GROUP BY o_orderpriority
    """,
)
def io_schema_merge(spark, sf_dir):
    """Schema evolution on read: two parquet batches — a legacy batch
    without `price_cents` and a new batch with it — land in one directory;
    `mergeSchema` unions the schemas and nulls the missing column for
    legacy rows.  The 100 TB reality: layouts drift across years of
    batches; the oracle recomputes both generations from the original
    table, so the hash proves null-fill and column alignment exactly."""
    from compss_python_spark.sources.io import write_parquet

    o = table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "evolving_orders")
    legacy = o.filter(F.col("o_orderkey") % 2 != 0).select(
        "o_orderkey", "o_orderpriority"
    )
    newer = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
    )
    write_parquet(legacy, os.path.join(path, "batch=legacy"), mode="overwrite")
    write_parquet(newer, os.path.join(path, "batch=v2"), mode="overwrite")
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("price_cents").alias("newcol_cents"),
        F.sum(F.col("price_cents").isNull().cast("long")).alias("n_legacy"),
    )


@query(
    "io_compaction",
    sql="""
    SELECT COUNT(*) AS n, CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    """,
)
def io_compaction(spark, sf_dir):
    """Small-file compaction: lineitem deliberately splattered into 64 tiny
    files, compacted back to size-matched files, read and aggregated.  The
    oracle is the plain aggregate of the original table — a hash match
    proves compaction preserves every row exactly (file-count behavior is
    asserted in tests/test_operators.py)."""
    from compss_python_spark.sources.io import compact_parquet

    frag = _scratch(sf_dir, "fragmented_lineitem")
    compacted = _scratch(sf_dir, "compacted_lineitem")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    compact_parquet(spark, frag, compacted, target_file_bytes=32 * 1024 * 1024)
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count("*").alias("n"),
        F.sum("l_orderkey").alias("key_sum"),
        F.sum(F.round(F.col("l_quantity"), 0).cast("bigint")).alias("qty"),
    )


@query(
    "io_text_roundtrip",
    sql="""
    SELECT doc_id, md5(text) AS text_md5 FROM documents
    """,
)
def io_text_roundtrip(spark, sf_dir):
    """documents → tab-separated lines → spark.read.text → parse back →
    per-doc md5.  Proves the line-oriented text source/sink round-trips
    content exactly (the oracle fingerprints the ORIGINAL table).  Tab is
    safe: the corpus is whitespace-normalized single-line text."""
    from compss_python_spark.sources.io import read_text, write_text

    path = _scratch(sf_dir, "text_documents")
    src = table(spark, sf_dir, "documents").select(
        F.concat_ws("\t", F.col("doc_id"), F.col("text")).alias("value")
    )
    write_text(src, path)
    back = read_text(spark, path)
    split_at = F.instr(F.col("value"), "\t")
    return back.select(
        F.substring(F.col("value"), 1, split_at - 1).cast("bigint").alias("doc_id"),
        F.md5(
            F.encode(F.expr("substring(value, instr(value, '\t') + 1)"), "UTF-8")
        ).alias("text_md5"),
    )


@query(
    "io_json_corrupt_records",
    sql="""
    SELECT CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_valid,
           CAST(SUM(CASE WHEN doc_id % 5 <> 0 THEN doc_id ELSE 0 END)
                AS BIGINT) AS id_sum_valid
    FROM documents
    """,
)
def io_json_corrupt_records(spark, sf_dir):
    """PERMISSIVE-mode corrupt-record accounting: JSON lines with every
    5th record deliberately truncated mid-object → read with an explicit
    schema + _corrupt_record column → the malformed rows land in the
    dead-letter column with NULL data fields instead of failing the job
    (the contract batch ingestion relies on).  The oracle recomputes the
    expected split from the source table."""
    from compss_python_spark.sources.io import read_text, write_text

    path = _scratch(sf_dir, "json_corrupt")
    src = table(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit('{"doc_id": '), F.col("doc_id"), F.lit(', "lang": "tr')),
        )
        .otherwise(
            F.concat(
                F.lit('{"doc_id": '), F.col("doc_id"),
                F.lit(', "lang": "'), F.col("lang"), F.lit('"}'),
            )
        )
        .alias("value")
    )
    write_text(src, path)
    back = spark.read.schema(
        "doc_id bigint, lang string, _corrupt_record string"
    ).option("mode", "PERMISSIVE").json(path)
    return back.agg(
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("doc_id")).otherwise(0))
        .cast("long")
        .alias("id_sum_valid"),
    )


@query(
    "io_binary_files_roundtrip",
    sql="""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 25 AS w, 8 + doc_id % 17 AS h, doc_id % 64 AS s
      FROM documents WHERE doc_id % 29 = 0)
    SELECT doc_id AS media_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(h*w*(w-1)//2 + w*h*(h-1) + (0 + s)*w*h AS BIGINT) AS sum_r,
           CAST(h*w*(w-1)//2 + w*h*(h-1) + (3 + s)*w*h AS BIGINT) AS sum_g,
           CAST(h*w*(w-1)//2 + w*h*(h-1) + (6 + s)*w*h AS BIGINT) AS sum_b
    FROM p
    """,
)
def io_binary_files_roundtrip(spark, sf_dir):
    """Raw-object ingestion end-to-end: bounded real PNGs (doc_id % 29
    subset) are exported one-file-per-object via write_binary_files, read
    back through Spark's built-in ``binaryFile`` source (pathGlobFilter
    pushed into the listing), ids re-parsed from file names, and the
    CONTENT column decoded by the real PNG decoder down to exact
    per-channel pixel sums.  The oracle computes the closed-form sums the
    fixture plants, so a hash match proves export, file listing, binary
    read and decode byte-for-byte."""
    from compss_python_spark.llm import multimodal
    from compss_python_spark.sources.io import read_binary_files, write_binary_files

    path = _scratch(sf_dir, "binary_png")
    media = multimodal.synthesize_pixel_media(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 0)
    )
    write_binary_files(media, path, suffix=".png").count()
    back = read_binary_files(spark, path, glob="*.png")
    parsed = back.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.png$", 1)
        .cast("long")
        .alias("media_id"),
        F.col("content").alias("payload"),
    )
    return multimodal.png_pixel_stats(parsed)


@query(
    "io_partition_fingerprints",
    sql="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           BIT_XOR(CAST('0x' || substr(md5(
             CONCAT_WS(chr(31),
               COALESCE(CAST(doc_id AS VARCHAR), chr(31)),
               COALESCE(text, chr(31)),
               COALESCE(lang, chr(31)))), 1, 12) AS BIGINT)) AS fingerprint
    FROM documents GROUP BY source
    """,
)
def io_partition_fingerprints(spark, sf_dir):
    """Per-partition content fingerprints (documents by source): xor of a
    48-bit md5 row hash — order-independent, mergeable, ONE map-combined
    aggregate, the change-detection primitive for incremental pipelines.
    The oracle recomputes every row hash and the xor fold."""
    from compss_python_spark.functions.statistics import partition_fingerprints

    return partition_fingerprints(
        table(spark, sf_dir, "documents"), "source", ["doc_id", "text", "lang"]
    )
