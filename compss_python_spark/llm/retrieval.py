"""Sparse-retrieval scoring over the document corpus (BM25).

Extension surface beyond the reference (SURVEY.md §2.12): keyword
retrieval is the standard first-stage ranker of a training-data search /
curation stack (find near-benchmark docs, build eval slices, audit what a
filter kept).  Robertson/Spärck Jones BM25 with the Lucene non-negative
idf variant: idf = ln(1 + (N − df + ½)/(df + ½)).

Scale shape: ONE corpus scan builds the (doc, term, tf) table; document
length and the corpus aggregate (N, avgdl) are aggregates OF that table
(never a second scan, never a driver collect); the query set is broadcast
(query workloads are ≤ thousands of terms — dim-sized by construction), so
the corpus-sized side shuffles only on (query, doc) for the final score
aggregate, and the per-query top-k window is map-side pruned
(WindowGroupLimit).  At 100 TB nothing here materializes more than the
posting lists of the QUERY terms — the broadcast semi-join prunes every
other term before any wide operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from compss_python_spark.llm.text import tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``queries`` is a (query_id, term) table — one row per query term
    (repeat a term to weight it).  Returns (query_id, doc_id, score, rank)
    with rank 1..k per query, deterministic tie-break on doc id.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias(term_col))
        .filter(F.col(term_col) != "")
        .groupBy(id_col, term_col)
        .agg(F.count("*").alias("tf"))
    )
    # Document length (non-empty tokens) and the corpus constants are
    # aggregates of the vocab-sized tf table — no second corpus scan.
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    consts = dl.agg(
        F.count("*").alias("_n"), F.avg("dl").alias("_avgdl")
    )
    qterms = queries.select(term_col).distinct()
    # Prune to query-term posting lists BEFORE any term-keyed aggregate:
    # df counts only need the terms the queries mention.
    qtf = tf.join(F.broadcast(qterms), term_col)
    dfreq = qtf.groupBy(term_col).agg(F.count("*").alias("df"))
    scored = (
        qtf.join(F.broadcast(queries.select(query_id_col, term_col)), term_col)
        .join(F.broadcast(dfreq), term_col)
        .join(dl, id_col)
        .crossJoin(F.broadcast(consts))
        .select(
            query_id_col,
            id_col,
            (
                F.log(
                    1.0
                    + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )
