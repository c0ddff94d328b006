"""True larger-SF dataset generator — DISTINCT content, not self-replication.

`scale_probe.py` grows data by unioning key-offset copies of sf0.1, which
is the right adversarial fixture for dedup (every doc gains N exact
copies) but the WRONG fixture for a second bench scale factor: identical
texts compress absurdly well in parquet, LSH bucket sizes grow with copy
multiplicity instead of corpus size, and every distinct-aggregation
cardinality stays frozen at sf0.1 levels.  This tool generates an
sf1-class dataset (default 10x the sf0.1 row counts) whose every row is
DISTINCT, schema-identical to the driver's testdata, entirely JVM-side
(spark.range + xxhash64-derived uniforms — zero Python UDFs, zero
rand(): same seed → byte-identical data), so `bench.py` and
`check_correctness.py` run against it unchanged:

    python tools/gen_sf.py 10           # writes .scratch/sfgen10
    SPARK_GRAFT_SF_DIR=.scratch/sfgen10 python bench.py

region/nation copy from sf0.1 (fixed dimension content, like TPC-H);
part/supplier/customer/orders/lineitem scale with the multiplier holding
FK ranges consistent (o_custkey ∈ [0, n_customer) etc., ~4 lineitems per
order); documents synthesize Zipf-skewed texts from the corpus vocab;
embeddings are centered uniform components (so sign-random-projection
cells stay balanced); events keep the 30-day window (density grows with
SF, matching how a real ingest month grows).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from compss_python_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sf0.1 base row counts; the multiplier scales these
BASE = {
    "part": 20_000,
    "supplier": 1_000,
    "customer": 15_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

VOCAB = (
    "spark batch part line column order small sort vector scan fast query "
    "agg slow value filter customer string join hash table index merge "
    "shuffle stream window group limit cache disk read write"
).split()  # 32 words, Zipf-skewed by generation below

P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
P_ADJ = ["large", "hot", "blue", "red", "small", "green", "dark", "light"]
P_NOUN = ["ring", "bolt", "screw", "nut", "washer", "pin", "rod", "cap"]
SEGMENTS = ["HOUSEHOLD", "BUILDING", "AUTOMOBILE", "MACHINERY", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "en", "en", "es", "de", "fr", "zh"]  # en-weighted
STATUSES = ["O", "O", "O", "F", "F", "P"]


def u(salt: int, *cols):
    """Deterministic uniform [0, 1) from xxhash64 — pure JVM, seedable."""
    h = F.xxhash64(F.lit(salt), *cols)
    return F.pmod(h, F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def pick(lst, salt: int, *cols):
    arr = F.array(*[F.lit(x) for x in lst])
    return F.element_at(arr, (u(salt, *cols) * len(lst)).cast("int") + 1)


def ts_between(lo: str, hi: str, salt: int, *cols):
    import datetime as dt

    # Bounds pinned to UTC: a naive fromisoformat().timestamp() resolves
    # in the HOST timezone, so "same seed → byte-identical data" would
    # only hold across hosts sharing TZ/DST rules.
    def _utc(s: str) -> int:
        return int(
            dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp()
        )

    lo_s = _utc(lo)
    hi_s = _utc(hi)
    return F.timestamp_seconds(
        F.lit(lo_s) + (u(salt, *cols) * (hi_s - lo_s)).cast("long")
    ).cast("timestamp_ntz")  # driver testdata stores TIMESTAMP_NTZ


def build_tables(spark, mult: int):
    """The generated fact tables as lazy DataFrames, keyed by name —
    exposed separately from main() so tests can assert schema parity with
    the driver's testdata without writing anything."""
    n = {t: c * mult for t, c in BASE.items()}

    def rng(count, key):
        return spark.range(count).select(F.col("id").alias(key))

    part = rng(n["part"], "p_partkey").select(
        "p_partkey",
        F.concat_ws(
            " ",
            pick(P_ADJ, 11, F.col("p_partkey")),
            pick(P_NOUN, 12, F.col("p_partkey")),
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"), ((u(13, F.col("p_partkey")) * 25).cast("int") + 1)
        ).alias("p_brand"),
        pick(P_TYPES, 14, F.col("p_partkey")).alias("p_type"),
        ((u(15, F.col("p_partkey")) * 50).cast("int") + 1).alias("p_size"),
        F.round(900.0 + u(16, F.col("p_partkey")) * 99.9, 2).alias("p_retailprice"),
    )

    supplier = rng(n["supplier"], "s_suppkey").select(
        "s_suppkey",
        F.format_string("Supplier#%09d", F.col("s_suppkey")).alias("s_name"),
        (u(21, F.col("s_suppkey")) * 25).cast("int").alias("s_nationkey"),
        F.round(-999.0 + u(22, F.col("s_suppkey")) * 10998.0, 2).alias("s_acctbal"),
    )

    customer = rng(n["customer"], "c_custkey").select(
        "c_custkey",
        F.format_string("Customer#%09d", F.col("c_custkey")).alias("c_name"),
        (u(31, F.col("c_custkey")) * 25).cast("int").alias("c_nationkey"),
        F.round(-999.0 + u(32, F.col("c_custkey")) * 10998.0, 2).alias("c_acctbal"),
        pick(SEGMENTS, 33, F.col("c_custkey")).alias("c_mktsegment"),
    )

    orders = rng(n["orders"], "o_orderkey").select(
        "o_orderkey",
        (u(41, F.col("o_orderkey")) * n["customer"]).cast("long").alias("o_custkey"),
        pick(STATUSES, 42, F.col("o_orderkey")).alias("o_orderstatus"),
        F.round(1_000.0 + u(43, F.col("o_orderkey")) * 499_000.0, 2).alias(
            "o_totalprice"
        ),
        ts_between("1995-01-01", "2001-08-01", 44, F.col("o_orderkey")).alias(
            "o_orderdate"
        ),
        pick(PRIORITIES, 45, F.col("o_orderkey")).alias("o_orderpriority"),
    )

    # ~4 lineitems per order, dense l_orderkey coverage, FK ranges valid
    li_id = spark.range(n["lineitem"]).select(F.col("id").alias("_i"))
    lineitem = li_id.select(
        (F.col("_i") / 4).cast("long").alias("l_orderkey"),
        (u(51, F.col("_i")) * n["part"]).cast("long").alias("l_partkey"),
        (u(52, F.col("_i")) * n["supplier"]).cast("long").alias("l_suppkey"),
        (F.pmod(F.col("_i"), F.lit(4)).cast("int") + 1).alias("l_linenumber"),
        ((u(53, F.col("_i")) * 50).cast("int") + 1).cast("double").alias("l_quantity"),
        F.round(900.0 + u(54, F.col("_i")) * 104_100.0, 2).alias("l_extendedprice"),
        ((u(55, F.col("_i")) * 11).cast("int") / 100.0).alias("l_discount"),
        ((u(56, F.col("_i")) * 9).cast("int") / 100.0).alias("l_tax"),
        pick(["A", "N", "N", "R"], 57, F.col("_i")).alias("l_returnflag"),
        pick(["O", "O", "F"], 58, F.col("_i")).alias("l_linestatus"),
        ts_between("1995-01-02", "2001-11-04", 59, F.col("_i")).alias("l_shipdate"),
    )

    events = rng(n["events"], "event_id").select(
        "event_id",
        ts_between("2024-01-01", "2024-01-31", 61, F.col("event_id")).alias("ts"),
        (u(62, F.col("event_id")) * max(n["events"] // 2000, 50))
        .cast("long")
        .alias("user_id"),
        pick(EVENT_TYPES, 63, F.col("event_id")).alias("event_type"),
        F.round(u(64, F.col("event_id")) * 560.0, 2).alias("value"),
        F.concat(
            F.lit('{"k": '), (u(65, F.col("event_id")) * 100).cast("int"), F.lit("}")
        ).alias("props"),
    )

    # Zipf-skewed word index: floor(V * u^2) piles mass on low indices —
    # keeps keyword/PMI/BM25 statistics non-degenerate at any SF.
    docs = rng(n["documents"], "doc_id")
    word = lambda i: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in VOCAB]),
        (F.pow(u(71, F.col("doc_id"), i), 2.0) * len(VOCAB)).cast("int") + 1,
    )
    n_words = (8 + u(72, F.col("doc_id")) * 72).cast("int")
    documents = docs.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(1), n_words), lambda i: word(i)), " "
        ).alias("text"),
        pick(LANGS, 73, F.col("doc_id")).alias("lang"),
        F.concat(F.lit("src"), (u(74, F.col("doc_id")) * 20).cast("int")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))

    embeddings = rng(n["embeddings"], "vec_id").select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: ((u(81, F.col("vec_id"), d) - 0.5) * 0.7).cast("float"),
        ).alias("embedding"),
        (u(82, F.col("vec_id")) * 10).cast("int").alias("label"),
    )

    return {
        "part": part,
        "supplier": supplier,
        "customer": customer,
        "orders": orders,
        "lineitem": lineitem,
        "events": events,
        "documents": documents,
        "embeddings": embeddings,
    }


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = os.path.join(REPO, ".scratch", f"sfgen{mult}")
    spark = get_spark("gen_sf")
    t0 = time.perf_counter()

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    for name, df in build_tables(spark, mult).items():
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"# {name}: {BASE[name] * mult} rows", file=sys.stderr)
    print(f"# wrote {dst} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()
