"""Sequence packing: assign documents to fixed-token-budget training
sequences — the step between a curated corpus and an LLM dataloader.

Exact greedy packing is inherently sequential (each document's sequence
depends on the running fill), so a fully-global greedy pass cannot be
parallelized without giving up either exactness or scalability.  The
standard industrial compromise — used here — is SHARD-LOCAL packing:
documents are deterministically sharded (``shard = id mod n_shards``),
each shard packs its own documents in id order with an exact greedy scan,
and sequence ids are globalized as ``shard * SEQ_SPAN + local_seq``.
Sharding costs at most one partially-filled sequence per shard (bounded,
amortizes to nothing at corpus scale) and makes the whole operation ONE
groupBy(shard) + an Arrow-batched per-shard scan — no global order, no
driver state.

Determinism contract: same inputs → same packing, independent of
partitioning (the per-shard scan sorts by id).  The greedy rule is the
textbook one: a document that would overflow the budget starts a new
sequence; a document LARGER than the budget gets a sequence of its own and
is flagged ``truncated`` (the loader decides whether to split or drop).
Everything is integer arithmetic, so a SQL oracle reproduces the exact
assignment with a per-shard recursive scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEQ_SPAN = 1_000_000_000  # local sequence ids per shard in the global id


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Assign each document to a training sequence of at most ``budget``
    tokens.  Returns (id_col, shard, seq_id, n_tokens, truncated) with
    seq_id = shard·SEQ_SPAN + local greedy index.

    Plan shape: one narrow projection (shard key + token count), ONE
    shuffle on shard, and an applyInPandas greedy scan per shard whose
    loop state is two integers.  SIZING CONTRACT: applyInPandas
    materializes one whole shard (id + count, ~16 B/row) per task, so
    pick ``n_shards`` ≈ corpus_rows / 10M to keep a shard's Arrow batch
    in the low hundreds of MB — at 100 TB / ~100 B docs that is ~10k
    shards, each an independent sequential scan; the only cross-shard
    waste is ≤ one partial sequence per shard.  The default suits tests
    and small corpora, not a cluster run.
    """
    if budget <= 0:
        raise ValueError("pack_sequences: budget must be positive")
    base = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        seqs, truncs = [], []
        seq, acc = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if acc > 0 and acc + t > budget:
                seq += 1
                acc = 0
            seqs.append(shard * SEQ_SPAN + seq)
            truncs.append(t > budget)
            acc += t
        pdf["seq_id"] = pd.Series(seqs, dtype="int64")
        pdf["truncated"] = pd.Series(truncs, dtype="bool")
        return pdf[[id_col, "shard", "seq_id", "n_tokens", "truncated"]]

    schema = (
        f"{id_col} long, shard long, seq_id long, n_tokens long, truncated boolean"
    )
    return base.groupBy("shard").applyInPandas(pack, schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Roll packed sequences up to loader-facing efficiency stats: one row
    (n_sequences, n_docs, total_tokens, fill_rate, n_truncated_docs).
    fill_rate = total non-truncated tokens / (n_sequences · budget) — the
    fraction of the token budget actually carrying data.  One map-combined
    aggregate pair."""
    per_seq = packed.groupBy("seq_id").agg(
        F.sum(F.least(F.col("n_tokens"), F.lit(budget))).alias("fill"),
        F.count("*").alias("docs"),
        F.sum(F.col("truncated").cast("long")).alias("truncs"),
    )
    return per_seq.agg(
        F.count("*").alias("n_sequences"),
        F.sum("docs").cast("long").alias("n_docs"),
        F.sum("fill").cast("long").alias("total_tokens"),
        F.round(F.sum("fill") / (F.count("*") * budget), 6).alias("fill_rate"),
        F.sum("truncs").cast("long").alias("n_truncated_docs"),
    )
