"""Sparse-retrieval scoring over the document corpus (BM25).

Extension surface beyond the reference (SURVEY.md §2.12): keyword
retrieval is the standard first-stage ranker of a training-data search /
curation stack (find near-benchmark docs, build eval slices, audit what a
filter kept).  Robertson/Spärck Jones BM25 with the Lucene non-negative
idf variant: idf = ln(1 + (N − df + ½)/(df + ½)).

Scale shape: TWO corpus scans, zero corpus-sized shuffles — document
length is a narrow array-size expression (no explode), the corpus
constants (N, avgdl) are a 1-row aggregate of it, and the token explode
is filtered by the BROADCAST query-term set before the (doc, term)
aggregate, so only the query terms' posting lists ever reach a wide
operator (query workloads are ≤ thousands of terms — dim-sized by
construction).  The per-query top-k window is map-side pruned
(WindowGroupLimit).  Verified in the physical plan: the only exchanges
are keyed on pruned postings / (query, doc).
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
    # Document length is a NARROW expression (size of the non-empty token
    # array) — no explode, no shuffle; token-less docs are excluded from
    # the corpus constants (they can never score).  One corpus scan.
    dl = docs.select(
        F.col(id_col),
        F.size(
            F.filter(tokens(text_col), lambda t: t != F.lit(""))
        ).alias("dl"),
    ).filter(F.col("dl") > 0)
    consts = dl.agg(
        F.count("*").alias("_n"), F.avg("dl").alias("_avgdl")
    )
    qterms = queries.select(term_col).distinct()
    # The ONLY term-keyed work happens on query-term posting lists: the
    # explode is filtered by the broadcast query-term set BEFORE the
    # (doc, term) aggregate, so the second corpus scan shuffles nothing
    # but the postings the queries mention.
    # Pinned eagerly: qtf feeds BOTH the df counts and the score join —
    # without the checkpoint each consumer re-runs the corpus explode.
    # Size is bounded by the query terms' posting lists, not the corpus.
    qtf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias(term_col))
        .join(F.broadcast(qterms), term_col)
        .groupBy(id_col, term_col)
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
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
