"""Declared queries: LLM-data-pipeline operators (SURVEY.md §2.12) —
dedup, text analysis, similarity search, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from compss_python_spark.llm import bloom, dedup, multimodal, similarity, text
from compss_python_spark.plans.registry import query, table


@query(
    "dedup_exact_hash",
    sql="""
    SELECT MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    headline=True,
)
def dedup_exact_hash(spark, sf_dir):
    """Exact-dedup key table: md5 of normalized text → min-id survivor."""
    docs = text.fingerprint(table(spark, sf_dir, "documents"), "text", "fp")
    return docs.groupBy("fp").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


@query(
    "dedup_exact_survivors",
    sql="""
    SELECT lang, source, MIN(doc_id) AS doc_id
    FROM documents GROUP BY lang, source
    """,
)
def dedup_exact_survivors(spark, sf_dir):
    """exact_dedup keeps the deterministic min-id row per key."""
    out = dedup.exact_dedup(table(spark, sf_dir, "documents"), ["lang", "source"], "doc_id")
    return out.select("lang", "source", "doc_id")


@query(
    "text_token_stats",
    sql="""
    SELECT doc_id,
           LENGTH(text) AS n_chars_calc,
           LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_tokens,
           LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
           LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS n_digit
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    out = text.char_stats(table(spark, sf_dir, "documents"))
    return out.select("doc_id", "n_chars_calc", "n_tokens", "n_alpha", "n_digit")


@query(
    "text_quality_score",
    headline=True,
    sql="""
    WITH s AS (
      SELECT doc_id,
             LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_tok,
             LENGTH(REGEXP_REPLACE(text, '\\s', '', 'g')) AS non_space,
             LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS alpha
      FROM documents)
    SELECT doc_id,
           ROUND((LEAST(n_tok / 20.0, 1.0)
                  + CASE WHEN non_space / GREATEST(n_tok, 1) BETWEEN 3 AND 12
                         THEN 1.0 ELSE 0.0 END
                  + alpha / GREATEST(non_space, 1)) / 3.0, 6) AS quality
    FROM s
    """,
)
def text_quality_score(spark, sf_dir):
    out = text.quality_score(table(spark, sf_dir, "documents"))
    return out.select("doc_id", "quality")


@query(
    "text_bpe_token_count",
    sql=r"""
    SELECT doc_id,
           LEN(regexp_extract_all(text, '[A-Za-z]{1,6}|[0-9]{1,3}|[^A-Za-z0-9\s]'))
             AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-ish token counting (deterministic regex proxy for subword
    tokenizers: ≤6-char letter runs, ≤3-digit runs, single symbols) — the
    budget/quota metric an LLM-data pipeline computes per document.  Pure
    JVM regexp_extract_all, zero shuffle; the oracle re-runs the identical
    pattern under RE2."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.bpe_ish_token_count("text").alias("n_bpe_tokens")
    )


@query(
    "text_lang_distribution",
    sql="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE n_chars > 150 GROUP BY lang
    """,
)
def text_lang_distribution(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter("n_chars > 150")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


def _lang_id_oracle_sql() -> str:
    """Re-derive the marker-argmax heuristic in DuckDB SQL from the same
    _LANG_MARKERS dict (single source of truth); tie-break = (max hits,
    lexicographically smallest code), encoded as list_sort on (-hits, lang)."""
    from compss_python_spark.llm.text import _LANG_MARKERS

    def arr(ws):
        return "[" + ",".join(f"'{w}'" for w in ws) + "]"

    structs = ",".join(
        f"{{'nh': -len(list_intersect(t, {arr(ws)})), 'lg': '{lang}'}}"
        for lang, ws in sorted(_LANG_MARKERS.items())
    )
    return rf"""
    WITH tok AS (
      SELECT doc_id, lang,
             list_transform(string_split_regex(trim(text), '\s+'), x -> lower(x)) AS t
      FROM documents
    )
    SELECT doc_id, lang, list_sort([{structs}])[1].lg AS lang_pred
    FROM tok
    """


@query("text_language_id", sql=_lang_id_oracle_sql())
def text_language_id(spark, sf_dir):
    """Heuristic language ID (marker-word argmax); oracle re-derives the
    same heuristic in SQL; accuracy vs ground-truth lang asserted in tests."""
    out = text.language_id(table(spark, sf_dir, "documents"))
    return out.select("doc_id", "lang", "lang_pred")


@query("dedup_minhash_lsh", sql=None, headline=True)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs — hash-function-specific → rows-only;
    tests verify estimated vs exact Jaccard on planted near-dups."""
    return dedup.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), threshold=0.35, num_hashes=64, bands=16
    )


@query("dedup_simhash", sql=None)
def dedup_simhash(spark, sf_dir):
    """Production SimHash near-dup pairs (xxhash64 → rows-only; the
    md5-portable signature twin `dedup_simhash_md5` is the oracled
    sibling).  max_bucket=1000 is the production cap: the sfgen100 corpus
    (topically-correlated Zipf texts) concentrates SimHash band keys into
    degenerate buckets whose uncapped k²/2 pair expansion ran past the
    600 s gate cap; capped, the same fixture completes in seconds with
    the drop contract documented at llm/dedup.py:simhash_pairs."""
    return dedup.simhash_pairs(
        table(spark, sf_dir, "documents"), max_hamming=8, max_bucket=1000
    )


@query(
    "dedup_minhash_md5",
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok
    )
    SELECT doc_id, g.j AS seed,
           MIN(CAST('0x' || substr(md5(u.sg || '#' || g.j), 1, 12) AS BIGINT)) AS mh
    FROM sh, UNNEST(sh.s) AS u(sg), generate_series(0, 15) AS g(j)
    GROUP BY doc_id, g.j
    """,
)
def dedup_minhash_md5(spark, sf_dir):
    """MinHash signatures (16 seeds, long form) with the engine-portable
    48-bit md5 hash of 'shingle#seed' — exact signature parity with the
    DuckDB re-derivation.  The production path (`dedup_minhash_lsh`) keeps
    xxhash64 (≫ faster; DuckDB lacks it → rows-only)."""
    docs = table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", dedup.shingles("text", 3).alias("_sh"))
    return (
        sh.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("seed"), "_sh")
        .select(
            "doc_id",
            "seed",
            F.array_min(
                F.transform(
                    "_sh",
                    lambda s: F.conv(
                        F.substring(
                            F.md5(F.encode(F.concat(s, F.lit("#"), F.col("seed").cast("string")), "UTF-8")),
                            1, 12,
                        ),
                        16, 10,
                    ).cast("long"),
                )
            ).alias("mh"),
        )
    )


@query(
    "dedup_simhash_md5",
    headline=True,
    sql=r"""
    WITH tok AS (
      SELECT doc_id, t.tok
      FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(tok)
    ),
    h AS (
      SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) AS h FROM tok
    ),
    bitsum AS (
      SELECT doc_id, g.j,
             SUM(CASE WHEN (h >> g.j) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
      FROM h CROSS JOIN generate_series(0, 47) AS g(j)
      GROUP BY doc_id, g.j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bitsum GROUP BY doc_id
    """,
)
def dedup_simhash_md5(spark, sf_dir):
    """SimHash signatures with the engine-portable 48-bit md5 token hash —
    the whole computation (tokenize → hash → per-bit majority → bit pack)
    hash-matches the DuckDB re-derivation exactly.  The production variant
    (`dedup_simhash`) uses xxhash64, which DuckDB lacks → rows-only."""
    out = dedup.simhashes(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        bits=48, token_hash=dedup.md5_hash48,
    )
    return out.select(F.col("_id").alias("doc_id"), F.col("_sh").alias("simhash"))


@query(
    "dedup_ngram_jaccard",
    oracle_cost="superlinear",  # token-blocked all-pairs: 26 min at sfgen10
    sql=r"""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
      FROM tok
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT * FROM pairs WHERE jaccard >= 0.3
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard within language blocks (bounded self-join);
    oracle rebuilds the same shingle sets with DuckDB list lambdas."""
    return dedup.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), threshold=0.3, block_col="lang"
    )


@query(
    "embedding_near_dup",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_DOT_PRODUCT(a.e, b.e)
                 / (SQRT(LIST_DOT_PRODUCT(a.e, a.e)) * SQRT(LIST_DOT_PRODUCT(b.e, b.e))), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE ROUND(LIST_DOT_PRODUCT(a.e, b.e)
                / (SQRT(LIST_DOT_PRODUCT(a.e, a.e)) * SQRT(LIST_DOT_PRODUCT(b.e, b.e))), 6) >= 0.35
    """,
)
def embedding_near_dup(spark, sf_dir):
    """Exact all-pairs variant (bounded input → allow_full_scan); threshold
    0.35 yields a few hundred pairs at sf0.01 (the corpus has no planted
    duplicates, so higher cutoffs degenerate to empty results)."""
    return dedup.embedding_near_dup_pairs(
        table(spark, sf_dir, "embeddings"), min_cosine=0.35, allow_full_scan=True
    )


@query(
    "dedup_semantic_md5",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cents AS (
      SELECT j.j AS cell,
             list_transform(range(0, 64),
               d -> CAST('0x' || substr(md5(concat('23:', j.j, ':', d)), 1, 12) AS BIGINT)
                    / 140737488355328.0 - 1.0) AS c
      FROM generate_series(0, 7) j(j)
    ),
    cd AS (SELECT v.vec_id, cents.cell,
                  list_sum(list_transform(range(1, 65),
                    i -> (v.e[i] - cents.c[i]) * (v.e[i] - cents.c[i]))) AS d2
           FROM v, cents),
    ca AS (SELECT vec_id, cell FROM cd
           QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN v va ON va.vec_id = a.vec_id
      JOIN v vb ON vb.vec_id = b.vec_id
      WHERE ROUND(LIST_DOT_PRODUCT(va.e, vb.e)
                  / (SQRT(LIST_DOT_PRODUCT(va.e, va.e))
                     * SQRT(LIST_DOT_PRODUCT(vb.e, vb.e))), 6) >= 0.35
    )
    SELECT ca.vec_id, ca.cell,
           ca.vec_id IN (SELECT vec_id FROM dups) AS is_semantic_dup
    FROM ca
    """,
)
def dedup_semantic_md5(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): coarse-quantizer clusters bound the
    quadratic cosine comparison to within-cluster pairs — the scalable
    shape of embedding dedup (`embedding_near_dup` is the exact all-pairs
    baseline this approximates).  Fixed md5-derived centroids make the
    FULL path — argmin cell assignment, within-cell pairs, min-id dup
    verdict — hash-checkable; production passes centroids=None for a
    sample-trained quantizer (same contract as `similarity_topk_ivf`)."""
    return dedup.semantic_dedup(
        table(spark, sf_dir, "embeddings"),
        centroids=similarity.md5_planes(64, 8, table_id=23),
        min_cosine=0.35,
    )


@query(
    "dedup_semantic_scaled",
    headline=True,
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    bb AS (SELECT GREATEST(1, CAST(CEIL(LOG2(COUNT(*) / 64.0)) AS INT)) AS b
           FROM v),
    planes AS (
      SELECT i.i AS pl,
             list_transform(range(0, 64),
               d -> CAST('0x' || substr(md5(concat('29:', i.i, ':', d)), 1, 12)
                         AS BIGINT) / 140737488355328.0 - 1.0) AS h
      FROM range(0, 32) i(i), bb WHERE i.i < bb.b),
    ca AS (
      SELECT v.vec_id,
             CAST(SUM(CASE WHEN list_dot_product(v.e, p.h) > 0
                           THEN 1 << p.pl ELSE 0 END) AS INT) AS cell
      FROM v, planes p GROUP BY 1),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN v va ON va.vec_id = a.vec_id
      JOIN v vb ON vb.vec_id = b.vec_id
      WHERE ROUND(LIST_DOT_PRODUCT(va.e, vb.e)
                  / (SQRT(LIST_DOT_PRODUCT(va.e, va.e))
                     * SQRT(LIST_DOT_PRODUCT(vb.e, vb.e))), 6) >= 0.35
    )
    SELECT ca.vec_id, ca.cell,
           ca.vec_id IN (SELECT vec_id FROM dups) AS is_semantic_dup
    FROM ca
    """,
)
def dedup_semantic_scaled(spark, sf_dir):
    """SemDeDup with the PRODUCTION k∝n quantizer — the scale-honest
    headline for the semantic-dedup family.  `dedup_semantic_md5` pins
    k=8 cells for oracle brevity, which makes its pair stage quadratic in
    corpus size (round-8: 56% of the entire ×10 bench); here the SRP cell
    count is 2^ceil(log2(n/64)) — derived from the corpus row count with
    an oracle-matching formula — so expected cell size stays ~64 rows and
    the whole operator is ~linear per decade.  Everything (plane
    components, bucket bits, verdicts) hash-checks against the SQL twin,
    which re-derives b from COUNT(*)."""
    return dedup.semantic_dedup_srp(
        table(spark, sf_dir, "embeddings"),
        min_cosine=0.35,
        rows_per_cell=64,
        table_id=29,
        dim=64,
    )


@query(
    "embedding_near_dup_scaled",
    headline=True,
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    bb AS (SELECT GREATEST(1, CAST(CEIL(LOG2(COUNT(*) / 64.0)) AS INT)) AS b
           FROM v),
    planes AS (
      SELECT i.i AS pl,
             list_transform(range(0, 64),
               d -> CAST('0x' || substr(md5(concat('31:', i.i, ':', d)), 1, 12)
                         AS BIGINT) / 140737488355328.0 - 1.0) AS h
      FROM range(0, 32) i(i), bb WHERE i.i < bb.b),
    ca AS (
      SELECT v.vec_id,
             CAST(SUM(CASE WHEN list_dot_product(v.e, p.h) > 0
                           THEN 1 << p.pl ELSE 0 END) AS INT) AS cell
      FROM v, planes p GROUP BY 1)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_DOT_PRODUCT(va.e, vb.e)
                 / (SQRT(LIST_DOT_PRODUCT(va.e, va.e))
                    * SQRT(LIST_DOT_PRODUCT(vb.e, vb.e))), 6) AS cosine
    FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
    JOIN v va ON va.vec_id = a.vec_id
    JOIN v vb ON vb.vec_id = b.vec_id
    WHERE ROUND(LIST_DOT_PRODUCT(va.e, vb.e)
                / (SQRT(LIST_DOT_PRODUCT(va.e, va.e))
                   * SQRT(LIST_DOT_PRODUCT(vb.e, vb.e))), 6) >= 0.35
    """,
)
def embedding_near_dup_scaled(spark, sf_dir):
    """Embedding near-dup pairs under a k∝n SRP blocking — the oracled
    scale sibling of the fixed-8-bucket `embedding_near_dup_lsh` (which
    stays rows-only/recall-tested) and of the exact all-pairs
    `embedding_near_dup`.  Bucket count 2^ceil(log2(n/64)) grows with the
    corpus so the within-bucket self-join stays O(n·64) instead of
    O(n²/8); single deterministic md5 table keeps every candidate pair
    SQL-derivable (the multi-table OR-amplified variant trades that
    determinism for recall — both shapes ship)."""
    import math

    emb = table(spark, sf_dir, "embeddings")
    # eager sizing count, same documented contract as semantic_dedup_srp
    n = emb.count()
    b = max(1, math.ceil(math.log2(max(n, 1) / 64.0)))
    planes = similarity.md5_planes(64, b, table_id=31)

    def block_fn(v):
        return similarity.hyperplane_lsh_bucket(v, "_v", planes=planes, alias="_blk")

    return dedup.embedding_near_dup_pairs(
        emb, min_cosine=0.35, block_fn=block_fn
    )


@query(
    "similarity_topk_exact",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         scored AS (
           SELECT q.query_id, v.vec_id AS neighbor_id,
                  ROUND(LIST_DOT_PRODUCT(qe, e)
                        / (SQRT(LIST_DOT_PRODUCT(qe, qe)) * SQRT(LIST_DOT_PRODUCT(e, e))), 6) AS cosine
           FROM q JOIN v ON v.vec_id <> q.query_id),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS rn
           FROM scored)
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= 5
    """,
    headline=True,
)
def similarity_topk_exact(spark, sf_dir):
    """Brute-force cosine top-5 for 10 query vectors over the corpus."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, emb.filter("vec_id < 10"), k=5)


@query(
    "similarity_hard_negatives",
    sql="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, label AS query_label, e AS qe
               FROM v WHERE vec_id < 20),
         scored AS (
           SELECT q.query_id, v.vec_id AS neighbor_id,
                  q.query_label, v.label AS neighbor_label,
                  ROUND(LIST_DOT_PRODUCT(qe, e)
                        / (SQRT(LIST_DOT_PRODUCT(qe, qe)) * SQRT(LIST_DOT_PRODUCT(e, e))), 6) AS cosine
           FROM q JOIN v ON v.vec_id <> q.query_id AND v.label <> q.query_label),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS rn
           FROM scored)
    SELECT query_id, neighbor_id, query_label, neighbor_label, cosine, rn
    FROM ranked WHERE rn <= 5
    """,
)
def similarity_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining: per query vector the 5 most
    cosine-similar corpus vectors carrying a DIFFERENT label — broadcast
    query set, corpus never shuffles (same plan as similarity_topk_exact
    plus the label-mismatch predicate in the join condition)."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.hard_negatives(emb, emb.filter("vec_id < 20"), k=5)


@query("similarity_topk_lsh", sql=None)
def similarity_topk_lsh(spark, sf_dir):
    """LSH-bucketed ANN — approximate by design → rows-only; recall vs
    brute force asserted in tests."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, emb.filter("vec_id < 10"), k=5, num_planes=4)


@query(
    "similarity_topk_lsh_md5",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         planes AS (
           SELECT t.t AS tbl, p.p AS pl,
                  list_transform(range(0, 64),
                    d -> CAST('0x' || substr(md5(concat(t.t, ':', p.p, ':', d)), 1, 12) AS BIGINT)
                         / 140737488355328.0 - 1.0) AS h
           FROM generate_series(0, 3) t(t), generate_series(0, 3) p(p)
         ),
         cb AS (
           SELECT v.vec_id, pl.tbl,
                  CAST(SUM(CASE WHEN list_dot_product(v.e, pl.h) > 0
                           THEN 1 << pl.pl ELSE 0 END) AS BIGINT) AS bkt
           FROM v, planes pl GROUP BY v.vec_id, pl.tbl
         ),
         qb AS (
           SELECT q.query_id, pl.tbl,
                  CAST(SUM(CASE WHEN list_dot_product(q.qe, pl.h) > 0
                           THEN 1 << pl.pl ELSE 0 END) AS BIGINT) AS bkt
           FROM q, planes pl GROUP BY q.query_id, pl.tbl
         ),
         cand AS (
           SELECT DISTINCT qb.query_id, cb.vec_id AS neighbor_id
           FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bkt = cb.bkt
           WHERE cb.vec_id <> qb.query_id
         ),
         scored AS (
           SELECT c.query_id, c.neighbor_id,
                  ROUND(LIST_DOT_PRODUCT(q.qe, v.e)
                        / (SQRT(LIST_DOT_PRODUCT(q.qe, q.qe))
                           * SQRT(LIST_DOT_PRODUCT(v.e, v.e))), 6) AS cosine
           FROM cand c JOIN q ON q.query_id = c.query_id
                       JOIN v ON v.vec_id = c.neighbor_id
         ),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS rn
           FROM scored)
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= 5
    """,
)
def similarity_topk_lsh_md5(spark, sf_dir):
    """LSH ANN with md5-derived hyperplanes (engine-portable pseudo-random
    floats, same trick as `dedup_minhash_md5`): DuckDB recomputes the exact
    buckets, candidate set, and re-rank — full hash parity for the entire
    LSH machinery.  Production (`similarity_topk_lsh`) keeps Gaussian
    planes → rows-only."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(
        emb, emb.filter("vec_id < 10"), k=5, num_planes=4, num_tables=4,
        plane_source="md5",
    )


@query(
    "similarity_topk_lsh_multiprobe_md5",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         planes AS (
           SELECT p.p AS pl,
                  list_transform(range(0, 64),
                    d -> CAST('0x' || substr(md5(concat(0, ':', p.p, ':', d)), 1, 12) AS BIGINT)
                         / 140737488355328.0 - 1.0) AS h
           FROM generate_series(0, 5) p(p)
         ),
         cb AS (
           SELECT v.vec_id,
                  CAST(SUM(CASE WHEN list_dot_product(v.e, pl.h) > 0
                           THEN 1 << pl.pl ELSE 0 END) AS BIGINT) AS bkt
           FROM v, planes pl GROUP BY v.vec_id
         ),
         qb AS (SELECT q.query_id, cb.bkt FROM q JOIN cb ON cb.vec_id = q.query_id),
         probes AS (
           SELECT qb.query_id,
                  unnest(list_prepend(qb.bkt,
                    list_transform(range(0, 6),
                      p -> xor(qb.bkt, CAST(1 << p AS BIGINT))))) AS pbkt
           FROM qb
         ),
         cand AS (
           SELECT DISTINCT pr.query_id, cb.vec_id AS neighbor_id
           FROM probes pr JOIN cb ON cb.bkt = pr.pbkt
           WHERE cb.vec_id <> pr.query_id
         ),
         scored AS (
           SELECT c.query_id, c.neighbor_id,
                  ROUND(LIST_DOT_PRODUCT(q.qe, v.e)
                        / (SQRT(LIST_DOT_PRODUCT(q.qe, q.qe))
                           * SQRT(LIST_DOT_PRODUCT(v.e, v.e))), 6) AS cosine
           FROM cand c JOIN q ON q.query_id = c.query_id
                       JOIN v ON v.vec_id = c.neighbor_id
         ),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS rn
           FROM scored)
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= 5
    """,
)
def similarity_topk_lsh_multiprobe_md5(spark, sf_dir):
    """Multi-probe LSH ANN (Lv et al., VLDB'07) with md5-derived
    hyperplanes: ONE hash table — the corpus is bucketed, shuffled and
    stored ONCE — and each query probes its home bucket plus every
    Hamming-distance-1 bucket (one sign bit flipped), recovering the
    recall that `similarity_topk_lsh_md5` buys with 4× corpus
    amplification.  At 100 TB the corpus side dominates; moving the
    amplification to the bounded query side is the scale win.  DuckDB
    recomputes buckets, the probe sequence, the candidate set and the
    re-rank — full hash parity."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_multiprobe_topk(
        emb, emb.filter("vec_id < 10"), k=5, num_planes=6, plane_source="md5",
    )


@query("similarity_topk_ivf", sql=None, headline=True)
def similarity_topk_ivf(spark, sf_dir):
    """IVF ANN (KMeans coarse quantizer, nprobe=3 of 16 cells) — centroid
    init is engine-specific → rows-only; recall asserted in tests.
    `similarity_topk_ivf_md5` is the hash-oracled sibling (fixed
    md5-derived centroids prove the assignment/probe/re-rank machinery)."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, emb.filter("vec_id < 10"), k=5)


@query(
    "similarity_topk_ivf_md5",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         cents AS (
           SELECT j.j AS cell,
                  list_transform(range(0, 64),
                    d -> CAST('0x' || substr(md5(concat('9:', j.j, ':', d)), 1, 12) AS BIGINT)
                         / 140737488355328.0 - 1.0) AS c
           FROM generate_series(0, 7) j(j)
         ),
         cd AS (
           SELECT v.vec_id, cents.cell,
                  list_sum(list_transform(range(1, 65),
                    i -> (v.e[i] - cents.c[i]) * (v.e[i] - cents.c[i]))) AS d2
           FROM v, cents
         ),
         ca AS (SELECT vec_id, cell FROM cd
                QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
         qd AS (
           SELECT q.query_id, cents.cell,
                  list_sum(list_transform(range(1, 65),
                    i -> (q.qe[i] - cents.c[i]) * (q.qe[i] - cents.c[i]))) AS d2
           FROM q, cents
         ),
         qa AS (SELECT query_id, cell FROM qd
                QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, cell) <= 2),
         cand AS (SELECT DISTINCT qa.query_id, ca.vec_id AS neighbor_id
                  FROM qa JOIN ca ON qa.cell = ca.cell
                  WHERE ca.vec_id <> qa.query_id),
         scored AS (
           SELECT c.query_id, c.neighbor_id,
                  ROUND(LIST_DOT_PRODUCT(q.qe, v.e)
                        / (SQRT(LIST_DOT_PRODUCT(q.qe, q.qe))
                           * SQRT(LIST_DOT_PRODUCT(v.e, v.e))), 6) AS cosine
           FROM cand c JOIN q ON q.query_id = c.query_id
                       JOIN v ON v.vec_id = c.neighbor_id
         ),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS rn
           FROM scored)
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= 5
    """,
)
def similarity_topk_ivf_md5(spark, sf_dir):
    """IVF ANN with FIXED md5-derived centroids (same engine-portable
    pseudo-random trick as `similarity_topk_lsh_md5`): DuckDB recomputes
    the exact cell assignment (argmin d2, cell tie-break), the nprobe=2
    probed cells per query, and the in-cell cosine re-rank — full hash
    parity for the entire IVF search path.  Production
    (`similarity_topk_ivf`) keeps the sample-trained quantizer for cell
    balance → rows-only."""
    emb = table(spark, sf_dir, "embeddings")
    cents = similarity.md5_planes(64, 8, table_id=9)
    return similarity.ivf_topk(
        emb, emb.filter("vec_id < 10"), k=5, n_cells=8, nprobe=2, centroids=cents
    )


@query(
    "similarity_topk_ivfpq_md5",
    headline=True,
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
    cents AS (
      SELECT j.j AS cell,
             list_transform(range(0, 64),
               d -> CAST('0x' || substr(md5(concat('21:', j.j, ':', d)), 1, 12) AS BIGINT)
                    / 140737488355328.0 - 1.0) AS c
      FROM generate_series(0, 7) j(j)
    ),
    cbs AS (
      SELECT m.m AS m, c.c AS code,
             list_transform(range(0, 16),
               d -> CAST('0x' || substr(md5(concat(100 + m.m, ':', c.c, ':', d)), 1, 12) AS BIGINT)
                    / 140737488355328.0 - 1.0) AS cv
      FROM generate_series(0, 3) m(m), generate_series(0, 15) c(c)
    ),
    cd AS (SELECT v.vec_id, cents.cell,
                  list_sum(list_transform(range(1, 65),
                    i -> (v.e[i] - cents.c[i]) * (v.e[i] - cents.c[i]))) AS d2
           FROM v, cents),
    ca AS (SELECT vec_id, cell FROM cd
           QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
    vsd AS (SELECT v.vec_id, cbs.m, cbs.code,
                   list_sum(list_transform(range(1, 17),
                     i -> (v.e[cbs.m*16 + i] - cbs.cv[i]) * (v.e[cbs.m*16 + i] - cbs.cv[i]))) AS d2
            FROM v, cbs),
    vc AS (SELECT vec_id, m, code FROM vsd
           QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, code) = 1),
    qd AS (SELECT q.query_id, cents.cell,
                  list_sum(list_transform(range(1, 65),
                    i -> (q.qe[i] - cents.c[i]) * (q.qe[i] - cents.c[i]))) AS d2
           FROM q, cents),
    qa AS (SELECT query_id, cell FROM qd
           QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, cell) <= 2),
    qsd AS (SELECT q.query_id, cbs.m, cbs.code,
                   list_sum(list_transform(range(1, 17),
                     i -> (q.qe[cbs.m*16 + i] - cbs.cv[i]) * (q.qe[cbs.m*16 + i] - cbs.cv[i]))) AS d2
            FROM q, cbs),
    cand AS (SELECT qa.query_id, ca.vec_id AS neighbor_id
             FROM qa JOIN ca ON qa.cell = ca.cell WHERE ca.vec_id <> qa.query_id),
    adc AS (
      SELECT c.query_id, c.neighbor_id,
             list_sum(list(qsd.d2 ORDER BY qsd.m)) AS adc_d2
      FROM cand c
      JOIN vc ON vc.vec_id = c.neighbor_id
      JOIN qsd ON qsd.query_id = c.query_id AND qsd.m = vc.m AND qsd.code = vc.code
      GROUP BY c.query_id, c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adc_d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_d2, neighbor_id) AS rn
      FROM adc
    )
    SELECT t.query_id, t.neighbor_id, ROUND(t.adc_d2, 6) AS adc_d2,
           ROUND(LIST_DOT_PRODUCT(q.qe, v.e)
                 / (SQRT(LIST_DOT_PRODUCT(q.qe, q.qe))
                    * SQRT(LIST_DOT_PRODUCT(v.e, v.e))), 6) AS cosine,
           t.rn
    FROM ranked t
    JOIN q ON q.query_id = t.query_id
    JOIN v ON v.vec_id = t.neighbor_id
    WHERE t.rn <= 5
    """,
)
def similarity_topk_ivfpq_md5(spark, sf_dir):
    """IVF-PQ ANN (FAISS IVFPQ shape): coarse md5 cells bound the scan,
    4-byte product-quantization codes + asymmetric-distance table lookups
    replace dim-wide dot products, exact cosine refine on the winners.
    Fixed md5-derived centroids AND codebooks mean DuckDB recomputes cell
    assignment, every PQ code, the ADC sums (identical summation order)
    and the final ranking — full hash parity for the complete IVF-PQ
    search path.  Production trains both quantizers on bounded samples
    (`train_pq_codebooks_sample`); recall covered in tests."""
    emb = table(spark, sf_dir, "embeddings")
    cents = similarity.md5_planes(64, 8, table_id=21)
    books = similarity.pq_codebooks_md5(64, 4, 16, base_table_id=100)
    return similarity.ivfpq_topk(
        emb, emb.filter("vec_id < 10"), k=5, n_cells=8, nprobe=2,
        m_sub=4, ksub=16, centroids=cents, codebooks=books,
    )


@query(
    "multimodal_bytes",
    sql="""
    SELECT doc_id AS media_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes
    FROM documents
    """,
)
def multimodal_bytes(spark, sf_dir):
    """Binary-column plumbing: payload byte length via the media table."""
    media = multimodal.synthesize_media(table(spark, sf_dir, "documents"))
    return media.select("media_id", F.length("payload").alias("n_bytes"))


@query(
    "multimodal_probe_headers",
    headline=True,
    sql="""
    SELECT doc_id AS media_id,
           (['png','jpeg','wav'])[CAST(doc_id % 3 + 1 AS INT)] AS format,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN CAST(16 + doc_id % 241 AS INT) END AS width,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN CAST(16 + doc_id % 181 AS INT) END AS height,
           CAST(CASE WHEN doc_id % 3 IN (0, 1) THEN 3
                     ELSE 1 + doc_id % 2 END AS INT) AS channels,
           CASE WHEN doc_id % 3 = 2
                THEN CAST(8000 + 4000 * (doc_id % 8) AS INT) END AS sample_rate
    FROM documents
    """,
)
def multimodal_probe_headers(spark, sf_dir):
    """REAL header decode, end-to-end: deterministic PNG/JPEG/WAV container
    bytes are built from doc_id (llm/multimodal.py synthesize_real_media),
    then parsed back by the byte-level header parsers (PNG IHDR, JPEG SOFn
    marker walk, WAV fmt chunk — no codec libraries).  The oracle recomputes
    the generation formula, so a hash match proves the parsers recover
    exactly what was encoded."""
    media = multimodal.synthesize_real_media(table(spark, sf_dir, "documents"))
    probed = multimodal.probe_media(media)
    return probed.select(
        "media_id", "format", "width", "height", "channels", "sample_rate"
    )


@query(
    "multimodal_features",
    sql="""
    SELECT doc_id AS media_id,
           (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           CASE
             WHEN text IS NULL OR OCTET_LENGTH(ENCODE(text)) = 0 THEN 0.0
             ELSE ROUND((CASE WHEN unicode(text) < 128 THEN unicode(text)
                              WHEN unicode(text) < 2048 THEN 192 + unicode(text) // 64
                              WHEN unicode(text) < 65536 THEN 224 + unicode(text) // 4096
                              ELSE 240 + unicode(text) // 262144 END) / 255.0, 6)
           END AS f0
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """mapInPandas featurizer over binary payloads (decode stubbed —
    deterministic fake; schema/batch plumbing is the real product).

    Oracled end-to-end: f0 is the first payload byte / 255, which the SQL
    twin re-derives as the UTF-8 lead byte of the first code point."""
    media = multimodal.synthesize_media(table(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


@query(
    "multimodal_png_pixel_stats",
    headline=True,
    sql="""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 25 AS w, 8 + doc_id % 17 AS h, doc_id % 64 AS s
      FROM documents)
    SELECT doc_id AS media_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(h*w*(w-1)//2 + w*h*(h-1) + (0 + s)*w*h AS BIGINT) AS sum_r,
           CAST(h*w*(w-1)//2 + w*h*(h-1) + (3 + s)*w*h AS BIGINT) AS sum_g,
           CAST(h*w*(w-1)//2 + w*h*(h-1) + (6 + s)*w*h AS BIGINT) AS sum_b
    FROM p
    """,
)
def multimodal_png_pixel_stats(spark, sf_dir):
    """REAL PNG pixel decode, end-to-end: spec-compliant PNGs (zlib IDAT,
    row filters cycling 0..4, real CRCs) are built from doc_id with pixel
    value x + 2y + 3c + seed (always < 256), then decoded back by
    decode_png_pixels (inflate + inverse Sub/Up/Average/Paeth) and reduced
    to exact integer per-channel sums.  The oracle computes the closed-form
    sums Σ(x+2y+3c+s) = h·w(w−1)/2 + w·h(h−1) + (3c+s)·wh, so a hash match
    proves the decoder reconstructs every pixel of every image exactly."""
    media = multimodal.synthesize_pixel_media(table(spark, sf_dir, "documents"))
    return multimodal.png_pixel_stats(media)


@query(
    "multimodal_wav_frame_features",
    sql="""
    WITH w AS (
      SELECT doc_id, 1 + doc_id % 2 AS ch, 32 + doc_id % 97 AS ns
      FROM documents WHERE doc_id % 3 = 2
    ),
    s AS (
      SELECT doc_id, i.i AS s,
             ((doc_id * 31 + (i.i * ch) * 7919) % 65536) - 32768 AS v
      FROM w, UNNEST(range(0, ns)) i(i)
    ),
    l AS (
      SELECT doc_id, s, v, s // 16 AS frame_idx,
             LAG(v) OVER (PARTITION BY doc_id ORDER BY s) AS pv,
             LAG(s // 16) OVER (PARTITION BY doc_id ORDER BY s) AS pf
      FROM s
    )
    SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(COUNT(*) AS INT) AS n_samples,
           CAST(SUM(v * v) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN pf = frame_idx AND ((v < 0) != (pv < 0))
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM l GROUP BY 1, 2
    """,
)
def multimodal_wav_frame_features(spark, sf_dir):
    """REAL audio frame features end-to-end: the synthesized PCM WAVs
    decode to channel 0, split into 16-sample frames, and reduce to
    exact-integer energy and zero-crossing counts per frame — the
    VAD/energy-gating stage of an audio curation pipeline.  The oracle
    recomputes every frame from the waveform's closed form (channel-0
    sample s lives at interleaved index s·ch), so a hash match proves
    decode, de-interleave, framing and both features."""
    media = multimodal.synthesize_real_media(table(spark, sf_dir, "documents"))
    wavs = media.filter(F.col("media_id") % 3 == 2)
    return multimodal.wav_frame_features(wavs, frame_size=16)


@query(
    "multimodal_video_frame_stats",
    sql="""
    WITH g AS (SELECT doc_id, 1 + doc_id % 4 AS nf FROM documents),
    fr AS (
      SELECT doc_id, f.i AS frame_idx
      FROM g, UNNEST(range(0, nf)) f(i) WHERE f.i % 2 = 0
    ),
    blocks AS (
      SELECT doc_id, frame_idx,
             2 * ((doc_id * 7 + frame_idx * 11 + bx.i * 13 + by.i * 29) % 128)
               AS v
      FROM fr, UNNEST(range(0, 2)) bx(i), UNNEST(range(0, 2)) by(i)
    )
    SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           CAST(SUM(64 * v) AS BIGINT) AS sum_pix,
           CAST(SUM(64 * v * v) AS BIGINT) AS sumsq_pix
    FROM blocks GROUP BY 1, 2
    """,
)
def multimodal_video_frame_stats(spark, sf_dir):
    """REAL video frame sampling end-to-end: genuine MJPEG AVI containers
    (RIFF hdrl/movi structure, one '00dc' JPEG chunk per frame) are built
    from doc_id, every 2nd frame is extracted by the container walk and
    entropy-decoded by llm.jpeg, and per-frame exact pixel sums are
    compared against the closed-form generation formula — proving the AVI
    chunk walk, the frame sampling stride AND the per-frame JPEG decode.
    Sampled-only decode: skipped frames are never entropy-decoded."""
    media = multimodal.synthesize_video_media(table(spark, sf_dir, "documents"))
    return multimodal.frame_sample(media, every_n=2)


@query(
    "multimodal_resize_pixel_stats",
    sql="""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 25 AS w, 8 + doc_id % 17 AS h,
             doc_id % 64 AS s
      FROM documents
    ),
    sx AS (
      SELECT doc_id, SUM((x.i * w) // 16) AS sxs
      FROM p, UNNEST(range(0, 16)) x(i) GROUP BY doc_id
    ),
    sy AS (
      SELECT doc_id, SUM((y.i * h) // 12) AS sys
      FROM p, UNNEST(range(0, 12)) y(i) GROUP BY doc_id
    )
    SELECT p.doc_id AS media_id, CAST(16 AS INT) AS width,
           CAST(12 AS INT) AS height,
           CAST(12 * sxs + 32 * sys + 192 * (0 + s) AS BIGINT) AS sum_r,
           CAST(12 * sxs + 32 * sys + 192 * (3 + s) AS BIGINT) AS sum_g,
           CAST(12 * sxs + 32 * sys + 192 * (6 + s) AS BIGINT) AS sum_b
    FROM p JOIN sx USING (doc_id) JOIN sy USING (doc_id)
    """,
)
def multimodal_resize_pixel_stats(spark, sf_dir):
    """REAL image resize end-to-end: spec-compliant PNGs (pixel value
    x + 2y + 3c + s) are decoded, nearest-neighbor-resampled to 16×12
    with the integer index map src = floor(dst·src_dim/dst_dim),
    re-encoded as PNG, decoded AGAIN by the pixel-stats reducer, and the
    per-channel sums compared against the closed form
    Σ val(sx(x'), sy(y'), c) — proving decode → resample → re-encode →
    decode reproduces every pixel of every image exactly."""
    media = multimodal.synthesize_pixel_media(table(spark, sf_dir, "documents"))
    resized = multimodal.resize_images(media, 16, 12)
    return multimodal.png_pixel_stats(resized)


@query(
    "multimodal_jpeg_pixel_stats",
    headline=True,
    sql="""
    WITH g AS (
      SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
      FROM documents
    ),
    blocks AS (
      SELECT doc_id, wb, hb,
             2 * ((doc_id * 7 + bx.i * 13 + by.i * 29) % 128) AS v
      FROM g, UNNEST(range(0, wb)) bx(i), UNNEST(range(0, hb)) by(i)
    )
    SELECT doc_id AS media_id,
           CAST(wb * 8 AS INT) AS width, CAST(hb * 8 AS INT) AS height,
           CAST(SUM(64 * v) AS BIGINT) AS sum_pix,
           CAST(SUM(64 * v * v) AS BIGINT) AS sumsq_pix
    FROM blocks GROUP BY 1, 2, 3
    """,
)
def multimodal_jpeg_pixel_stats(spark, sf_dir):
    """REAL baseline JPEG decode, end-to-end: genuine entropy-coded JPEGs
    (Annex K Huffman/quant tables, DC prediction chains, byte stuffing)
    are built from doc_id with constant 8×8 blocks of EVEN value
    2·((id·7 + 13bx + 29by) mod 128) — chosen so every quantize/round
    lands on an x.5 pre-floor value and decode returns the generation
    formula EXACTLY — then decoded back by llm.jpeg (marker walk → Huffman
    → dequant → IDCT → clamp) and reduced to exact integer pixel sums.
    A hash match proves the full decoder on every block of every image.
    The AC-coefficient and color paths are unit-tested against an
    independent reference reconstruction (tests/test_multimodal.py)."""
    media = multimodal.synthesize_jpeg_media(table(spark, sf_dir, "documents"))
    return multimodal.jpeg_pixel_stats(media)


@query(
    "pipeline_corpus_curation",
    headline=True,
    sql=r"""
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS n_tok,
             LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS non_space,
             LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS alpha,
             MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    q AS (
      SELECT *, ROUND((LEAST(n_tok / 20.0, 1.0)
                 + CASE WHEN non_space / GREATEST(n_tok, 1) BETWEEN 3 AND 12
                        THEN 1.0 ELSE 0.0 END
                 + alpha / GREATEST(non_space, 1)) / 3.0, 6) AS quality
      FROM s
    ),
    f AS (SELECT * FROM q WHERE quality >= 0.5 AND n_chars BETWEEN 50 AND 5000),
    surv AS (SELECT * FROM f QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp))
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(quality), 6) AS avg_quality
    FROM surv GROUP BY lang
    """,
)
def pipeline_corpus_curation(spark, sf_dir):
    """End-to-end training-corpus curation pipeline — the LLM-data flagship:
    quality scoring → length/quality filter → exact near-copy removal →
    per-language corpus stats, all composed from the public operator layer.

    Scale shape: quality features are narrow JVM string expressions fused
    into the scan stage; the dedup groupBy shuffles only (32-byte md5, id)
    pairs for rows that SURVIVE the filters (filter-before-dedup ordering);
    the final per-language rollup is a partial/final hash aggregate.  One
    data-bearing shuffle end-to-end at any scale.
    """
    from compss_python_spark.llm.dedup import exact_dedup_by_hash
    from compss_python_spark.llm.text import quality_score
    from compss_python_spark.width import ensure_min_partitions

    # The scoring stage is regex/tokenize-dense: widen a one-split local
    # scan so it uses every core (no-op when the scan is already wide).
    docs = quality_score(ensure_min_partitions(table(spark, sf_dir, "documents")))
    kept = docs.filter(
        (F.col("quality") >= 0.5) & F.col("n_chars").between(50, 5000)
    )
    surv = exact_dedup_by_hash(kept, "text", "doc_id")
    return surv.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


@query(
    "wordcount_top_terms",
    sql=r"""
    WITH tok AS (
      SELECT doc_id, t.term
      FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(term)
    ),
    tf AS (
      SELECT term, COUNT(*)::BIGINT AS n_occurrences,
             COUNT(DISTINCT doc_id)::BIGINT AS n_docs
      FROM tok GROUP BY term
    )
    SELECT term, n_occurrences, n_docs,
           ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term) AS rank
    FROM tf
    QUALIFY rank <= 30
    """,
)
def wordcount_top_terms(spark, sf_dir):
    """Corpus term-frequency top-30 (the explode → double-agg shape every
    vocabulary/BPE build starts from): per-term occurrence + document
    frequency, ranked under a total order.

    Scale shape: explode is narrow; ONE hash aggregate computes both counts
    (count_distinct rewritten to a two-level partial agg by Spark);
    TakeOrderedAndProject caps result motion at 30 rows.
    """
    from compss_python_spark.llm.text import tokens

    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = tok.groupBy("term").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("term"))
    return (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 30)
        .select("term", "n_occurrences", "n_docs", "rank")
    )


@query("embedding_near_dup_lsh", sql=None)
def embedding_near_dup_lsh(spark, sf_dir):
    """Embedding near-dup via multi-table hyperplane-LSH blocking — the
    SCALE path of `embedding_near_dup_pairs` (the oracled sibling runs the
    exact all-pairs variant): candidates share a sign-random-projection
    bucket in ANY of 3 tables (OR-amplification for recall), so the
    self-join is bounded by bucket size instead of O(n²); the trailing
    distinct() dedups pairs that meet in several tables.  Bucket membership
    is hash-family-specific → rows-only; pair-subset-of-exact and recall
    are asserted in tests."""
    from compss_python_spark.llm.similarity import hyperplane_lsh_bucket

    def block_fn(v):
        for t in range(3):
            v = hyperplane_lsh_bucket(v, "_v", num_planes=3, seed=42 + 1000 * t,
                                      alias=f"_b{t}")
        return v.select(
            "_id",
            "_v",
            F.explode(
                F.array(
                    *[
                        F.concat_ws(":", F.lit(t), F.col(f"_b{t}").cast("string"))
                        for t in range(3)
                    ]
                )
            ).alias("_blk"),
        )

    return dedup.embedding_near_dup_pairs(
        table(spark, sf_dir, "embeddings"), min_cosine=0.35, block_fn=block_fn
    )


@query(
    "text_repetition_stats",
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             ROUND(1 - len(list_distinct(t)) / GREATEST(len(t), 1)::DOUBLE, 6)
               AS dup_token_frac,
             CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                  ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             END AS g
      FROM tok
    ),
    gcnt AS (
      SELECT doc_id, dup_token_frac, u.gram, COUNT(*) AS c
      FROM grams, UNNEST(g) AS u(gram)
      GROUP BY doc_id, dup_token_frac, u.gram
    )
    SELECT doc_id, dup_token_frac,
           ROUND(1 - COUNT(*) / SUM(c)::DOUBLE, 6) AS dup_ngram_frac,
           ROUND(MAX(c) / SUM(c)::DOUBLE, 6) AS top_ngram_frac
    FROM gcnt GROUP BY doc_id, dup_token_frac
    """,
)
def text_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals (dup-token / dup-bigram / top-bigram
    fractions) — exact parity with a DuckDB re-derivation of the same
    tokenize → gram → frequency pipeline."""
    return text.repetition_stats(table(spark, sf_dir, "documents"))


def _pii_injected_spark(docs):
    """Deterministically splice PII into ~3/7 of docs (the corpus itself has
    none) so detect/redact parity is exercised on real matches."""
    did = F.col("doc_id")
    return docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(did % 7 == 0, F.concat(F.lit(" contact user"), did, F.lit("@example.com now")))
            .when(did % 7 == 3, F.concat(F.lit(" call +4915100"), did))
            .when(did % 7 == 5, F.concat(F.lit(" host 10.0."), did % 256, F.lit(".7 up")))
            .otherwise(F.lit("")),
        ),
    )


_PII_INJECT_SQL = """
      SELECT doc_id, text ||
        CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com now'
             WHEN doc_id % 7 = 3 THEN ' call +4915100' || doc_id
             WHEN doc_id % 7 = 5 THEN ' host 10.0.' || (doc_id % 256) || '.7 up'
             ELSE '' END AS text
      FROM documents
"""


@query(
    "text_pii_redact",
    sql=rf"""
    WITH inj AS ({_PII_INJECT_SQL})
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_email,
           len(regexp_extract_all(text, '\+[0-9]{{7,15}}')) AS n_phone,
           len(regexp_extract_all(text, '([0-9]{{1,3}}\.){{3}}[0-9]{{1,3}}')) AS n_ipv4,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
                 '\+[0-9]{{7,15}}', '[PHONE]', 'g'),
                 '([0-9]{{1,3}}\.){{3}}[0-9]{{1,3}}', '[IPV4]', 'g')) AS red_md5
    FROM inj
    """,
)
def text_pii_redact(spark, sf_dir):
    """PII detection + redaction over deterministically-injected emails /
    phone numbers / IPv4s; counts and the md5 of the redacted text both
    hash-match the DuckDB regexp re-derivation (patterns are written to the
    Java-regex ∩ RE2 common dialect)."""
    out = text.pii_redact(text.pii_stats(_pii_injected_spark(table(spark, sf_dir, "documents"))))
    return out.select(
        "doc_id", "n_email", "n_phone", "n_ipv4", F.md5("redacted").alias("red_md5")
    )


@query(
    "decontaminate_corpus",
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(t) - 3),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
             END AS gs
      FROM tok
    ),
    bg AS (SELECT DISTINCT u.gram FROM g, UNNEST(gs) AS u(gram) WHERE doc_id % 37 = 0),
    cg AS (SELECT doc_id, u.gram FROM g, UNNEST(gs) AS u(gram) WHERE doc_id % 37 != 0),
    hits AS (
      SELECT doc_id, COUNT(DISTINCT gram) AS n_hits
      FROM cg JOIN bg USING (gram) GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_hits, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 37 != 0
    """,
)
def decontaminate_corpus(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing any 5-gram with the
    held-out 'benchmark' slice (doc_id % 37 = 0).  use_hash=False keeps the
    join key an exact string so DuckDB reproduces it verbatim; production
    defaults to xxhash64 keys (same hits, 8-byte shuffle keys)."""
    docs = table(spark, sf_dir, "documents")
    out = dedup.decontaminate(
        docs.filter(F.col("doc_id") % 37 != 0),
        docs.filter(F.col("doc_id") % 37 == 0),
        n=5,
        use_hash=False,
    )
    return out.select("doc_id", "n_hits", "contaminated")


def _mh_index_path(sf_dir) -> str:
    """Scratch location of the persisted MinHash-LSH index for ``sf_dir``.
    The version tag invalidates prebuilt indexes when the signature
    algorithm changes (bump it with any hash-family / banding edit); the
    DATA fingerprint (size+mtime of the documents parquet) invalidates
    them when the fixture at the same path is regenerated — without it a
    stale index silently fails the oracle (which re-derives from current
    documents) and the probe row goes red for a fixture problem, not a
    code bug."""
    import hashlib
    import os

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp", "io",
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    docs = os.path.join(sf_dir, "documents.parquet")
    stats = []
    for p in sorted(
        [docs] + ([os.path.join(docs, f) for f in os.listdir(docs)]
                  if os.path.isdir(docs) else [])
    ):
        try:
            st = os.stat(p)
            stats.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            pass
    fp = hashlib.md5(";".join(stats).encode()).hexdigest()[:10]
    return os.path.join(root, f"mh_index_v1_{tag}_{fp}")


def _ensure_mh_index(spark, sf_dir) -> str:
    """Build + persist the index shard (doc_id % 5 ≠ 0) only when absent,
    so the PROBE query's steady-state cost measures the probe — the
    operator's reason to exist is that increments do NOT pay ingest.  The
    BUILD query (`dedup_minhash_index_build`) times ingest separately and
    refreshes the same path whenever it runs."""
    import os

    path = _mh_index_path(sf_dir)
    if not (os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS"))):
        docs = table(spark, sf_dir, "documents")
        dedup.minhash_index(docs.filter(F.col("doc_id") % 5 != 0)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


@query(
    "dedup_minhash_index_build",
    headline=True,
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents WHERE doc_id % 5 <> 0
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok
    ),
    mh AS (
      SELECT doc_id, g.j AS seed,
             MIN(CAST('0x' || substr(md5(u.sg || '#' || g.j), 1, 12) AS BIGINT)) AS mh
      FROM sh, UNNEST(sh.s) AS u(sg), generate_series(0, 15) AS g(j)
      GROUP BY doc_id, g.j
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id)
    SELECT doc_id, CAST(b.b AS BIGINT) AS band,
           array_to_string(list_slice(sig, b.b * 4 + 1, b.b * 4 + 4), ',') AS bkey,
           array_to_string(sig, ',') AS sig_csv
    FROM sig, generate_series(0, 3) AS b(b)
    """,
)
def dedup_minhash_index_build(spark, sf_dir):
    """INGEST half of the incremental MinHash-LSH dedup pipeline: compute
    posting rows (doc_id, band, bkey, sig) for the historical shard
    (doc_id % 5 ≠ 0) and persist them as the parquet index the probe
    reads.  Registered separately from `dedup_minhash_index_probe` so the
    bench charges ingest and probe to different rows — round 7's combined
    query re-ingested per execution, and the headline number measured
    ingest while claiming to measure the probe.  The timed body includes
    the write AND a read-back (what an ingest actually costs); the oracle
    re-derives every posting row, full signature included (as CSV — the
    compare stringifies cells, and engine array renderings differ)."""
    docs = table(spark, sf_dir, "documents")
    path = _mh_index_path(sf_dir)
    dedup.minhash_index(docs.filter(F.col("doc_id") % 5 != 0)).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path).select(
        "doc_id",
        F.col("band").cast("long").alias("band"),
        "bkey",
        F.array_join(
            F.transform("sig", lambda x: x.cast("string")), ","
        ).alias("sig_csv"),
    )


@query(
    "dedup_minhash_index_probe",
    headline=True,
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok
    ),
    mh AS (
      SELECT doc_id, g.j AS seed,
             MIN(CAST('0x' || substr(md5(u.sg || '#' || g.j), 1, 12) AS BIGINT)) AS mh
      FROM sh, UNNEST(sh.s) AS u(sg), generate_series(0, 15) AS g(j)
      GROUP BY doc_id, g.j
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b.b AS band,
             array_to_string(list_slice(sig, b.b * 4 + 1, b.b * 4 + 4), ',') AS bkey
      FROM sig, generate_series(0, 3) AS b(b)
    ),
    idx AS (SELECT * FROM banded WHERE doc_id % 5 <> 0),
    bsz AS (SELECT band, bkey, COUNT(*) AS n FROM idx GROUP BY band, bkey),
    newb AS (SELECT * FROM banded WHERE doc_id % 5 = 0),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS index_id
      FROM newb n
      JOIN idx i ON n.band = i.band AND n.bkey = i.bkey AND n.doc_id <> i.doc_id
      JOIN bsz ON bsz.band = i.band AND bsz.bkey = i.bkey AND bsz.n <= 1000
    ),
    agree AS (
      SELECT c.new_id, c.index_id,
             SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS na
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.new_id
      JOIN mh mb ON mb.doc_id = c.index_id AND mb.seed = ma.seed
      GROUP BY 1, 2
    )
    SELECT new_id, index_id, ROUND(na / 16.0, 6) AS est_jaccard
    FROM agree WHERE ROUND(na / 16.0, 6) >= 0.3
    """,
)
def dedup_minhash_index_probe(spark, sf_dir):
    """PROBE half of incremental dedup against a PERSISTED LSH index: the
    new shard (doc_id % 5 = 0) probes the parquet posting table the BUILD
    query ingested (doc_id % 5 ≠ 0) — the operational shape at 100 TB,
    where historical data must not be re-shuffled (or re-ingested) per
    increment.  The index is built lazily only if absent, so steady-state
    timings measure the probe alone (round-7 verdict: the combined query's
    headline number was dominated by ingest).  md5 hash family → the
    oracle re-derives signatures, band keys, the bucket-capped probe join
    and every agreement fraction."""
    docs = table(spark, sf_dir, "documents")
    index = spark.read.parquet(_ensure_mh_index(spark, sf_dir))
    return dedup.minhash_index_probe(
        index, docs.filter(F.col("doc_id") % 5 == 0), threshold=0.3
    )


@query("dedup_lsh_cc_survivors", sql=None, headline=True)
def dedup_lsh_cc_survivors(spark, sf_dir):
    """End-to-end near-dup dedup: exact-duplicate collapse → MinHash-LSH
    pairs over representatives → connected components → min-id survivor
    per component (collapse_exact preserves connectivity exactly while
    cutting the quadratic exact-copy pair blow-up the 100× probe caught:
    167 s all-pairs vs single-digit collapsed under a 100-copy storm).
    The LSH stage is xxhash-family-specific → rows-only; the CC stage has
    exact driver parity via `graph_connected_components`, the survivor
    rule via `dedup_exact_survivors`, and the full pipeline an oracled
    md5 twin (`dedup_lsh_cc_survivors_md5`)."""
    from compss_python_spark.graph.components import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5, collapse_exact=True)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return (
        comp.groupBy("component")
        .agg(F.min("node").alias("survivor"), F.count("*").alias("n_members"))
        .select("component", "survivor", "n_members")
    )


@query(
    "dedup_lsh_cc_survivors_md5",
    sql=r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok
    ),
    mh AS (
      SELECT doc_id, g.j AS seed,
             MIN(CAST('0x' || substr(md5(u.sg || '#' || g.j), 1, 12) AS BIGINT)) AS mh
      FROM sh, UNNEST(sh.s) AS u(sg), generate_series(0, 15) AS g(j)
      GROUP BY doc_id, g.j
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b.b AS band,
             array_to_string(list_slice(sig, b.b * 4 + 1, b.b * 4 + 4), ',') AS bkey
      FROM sig, generate_series(0, 3) AS b(b)
    ),
    bsz AS (SELECT band, bkey, COUNT(*) AS n FROM banded GROUP BY band, bkey),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      JOIN bsz ON bsz.band = a.band AND bsz.bkey = a.bkey AND bsz.n <= 1000
    ),
    agree AS (
      SELECT c.id_a, c.id_b, SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS na
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.id_a
      JOIN mh mb ON mb.doc_id = c.id_b AND mb.seed = ma.seed
      GROUP BY c.id_a, c.id_b
    ),
    e0 AS (SELECT id_a, id_b FROM agree WHERE ROUND(na / 16.0, 6) >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM e0
              UNION SELECT id_b, id_a FROM e0),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT component, MIN(node) AS survivor, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM comp GROUP BY component
    """,
)
def dedup_lsh_cc_survivors_md5(spark, sf_dir):
    """END-TO-END oracled near-dup pipeline: engine-portable md5 MinHash
    signatures (the `dedup_minhash_md5` formula) → comma-joined band keys
    (4 bands × 4 rows) → capped buckets → candidate pairs → 16-slot
    agreement ≥ 0.5 → connected components → min-id survivor per
    component.  The DuckDB twin re-derives every stage — signatures,
    buckets, pairs, agreements, the transitive closure, survivors — so the
    whole pipeline is hash-verified, not just its stages in isolation.
    The production path (`dedup_lsh_cc_survivors`) keeps xxhash64."""
    from compss_python_spark.graph.components import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs_md5(
        docs, num_hashes=16, bands=4, threshold=0.5
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return (
        comp.groupBy("component")
        .agg(F.min("node").alias("survivor"), F.count("*").alias("n_members"))
        .select("component", "survivor", "n_members")
    )


_CURATION_FULL_SQL = r"""
    WITH inj AS (
      SELECT doc_id, lang, n_chars, text ||
        CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com now'
             WHEN doc_id % 7 = 3 THEN ' call +4915100' || doc_id
             WHEN doc_id % 7 = 5 THEN ' host 10.0.' || (doc_id % 256) || '.7 up'
             ELSE '' END AS text
      FROM documents
    ),
    s AS (
      SELECT *, string_split_regex(trim(text), '\s+') AS t,
             LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS non_space,
             LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS alpha
      FROM inj
    ),
    q AS (
      SELECT doc_id, lang, n_chars, text, t,
             ROUND((LEAST(len(t) / 20.0, 1.0)
                    + CASE WHEN non_space / GREATEST(len(t), 1) BETWEEN 3 AND 12
                           THEN 1.0 ELSE 0.0 END
                    + alpha / GREATEST(non_space, 1)) / 3.0, 6) AS quality,
             ROUND(1 - len(list_distinct(t)) / GREATEST(len(t), 1)::DOUBLE, 6)
               AS dup_token_frac
      FROM s
    ),
    kept AS (
      SELECT * FROM q
      WHERE quality >= 0.5 AND dup_token_frac <= 0.95 AND n_chars BETWEEN 50 AND 5000
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(t) - 3),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
             END AS gs
      FROM kept
    ),
    bg AS (SELECT DISTINCT u.gram FROM g, UNNEST(gs) AS u(gram) WHERE doc_id % 37 = 0),
    hits AS (
      SELECT g.doc_id FROM g, UNNEST(gs) AS u(gram) JOIN bg USING (gram)
      WHERE g.doc_id % 37 != 0 GROUP BY g.doc_id
    ),
    clean AS (
      SELECT k.* FROM kept k LEFT JOIN hits h ON k.doc_id = h.doc_id
      WHERE k.doc_id % 37 != 0 AND h.doc_id IS NULL
    ),
    red AS (
      SELECT *, regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\+[0-9]{7,15}', '[PHONE]', 'g'),
               '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IPV4]', 'g') AS redacted
      FROM clean
    ),
    fp AS (
      SELECT *, MD5(LOWER(REGEXP_REPLACE(TRIM(redacted), '\s+', ' ', 'g'))) AS _fp
      FROM red
    ),
    surv AS (SELECT * FROM fp QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY _fp))
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(quality), 6) AS avg_quality,
           CAST(SUM(CASE WHEN redacted <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted
    FROM surv GROUP BY lang
"""


@query("pipeline_curation_full", sql=_CURATION_FULL_SQL, headline=True)
def pipeline_curation_full(spark, sf_dir):
    """The complete training-corpus curation pipeline, every stage from the
    public operator layer: PII-splice (synthetic — the corpus ships clean)
    → quality + repetition scoring → filters → benchmark decontamination
    (5-gram overlap vs the doc_id%37 held-out slice) → PII redaction →
    exact dedup on the redacted fingerprint → per-language rollup.

    Scale shape: scoring/redaction are narrow JVM expressions fused into
    the scan; decontamination broadcasts the benchmark gram set; the dedup
    groupBy ships (md5, id) pairs only for docs surviving the filters; one
    partial/final hash agg closes.  The data-bearing shuffles are the
    per-doc gram-hit count and the dedup groupBy — both on filtered data.
    """
    from compss_python_spark.llm.text import tokens
    from compss_python_spark.width import ensure_min_partitions

    # Widen the one-split local scan before the tokenize/regex-dense
    # scoring + redaction stages (no-op when the scan is already wide).
    docs = _pii_injected_spark(ensure_min_partitions(table(spark, sf_dir, "documents")))
    docs = text.quality_score(docs)
    toks = tokens("text")
    docs = docs.withColumn(
        "dup_token_frac",
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)),
            6,
        ),
    )
    kept = docs.filter(
        (F.col("quality") >= 0.5)
        & (F.col("dup_token_frac") <= 0.95)
        & F.col("n_chars").between(50, 5000)
    )
    clean = dedup.decontaminate(
        kept.filter(F.col("doc_id") % 37 != 0),
        kept.filter(F.col("doc_id") % 37 == 0),
        n=5,
        use_hash=False,
    ).filter(~F.col("contaminated"))
    red = text.pii_redact(clean, "text")
    surv = dedup.exact_dedup_by_hash(red, "redacted", "doc_id")
    return surv.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.sum((F.col("redacted") != F.col("text")).cast("long")).alias("n_redacted"),
    )


@query(
    "dedup_bloom_membership",
    sql="""
    WITH ref AS (SELECT md5(text) AS rk FROM documents WHERE doc_id % 7 = 0),
    rh AS (
      SELECT CAST('0x' || substr(md5(rk), 1, 12) AS BIGINT) AS h1,
             CAST('0x' || substr(md5(rk), 13, 12) AS BIGINT) AS h2
      FROM ref
    ),
    pos AS (
      SELECT DISTINCT (h1 + j * h2) % 512 AS p
      FROM rh, generate_series(0, 2) s(j)
    ),
    cand AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(md5(text)), 1, 12) AS BIGINT) AS h1,
             CAST('0x' || substr(md5(md5(text)), 13, 12) AS BIGINT) AS h2
      FROM documents
    ),
    memb AS (
      SELECT doc_id,
             BOOL_AND(((h1 + j * h2) % 512) IN (SELECT p FROM pos)) AS bloom_member
      FROM cand, generate_series(0, 2) s(j)
      GROUP BY doc_id
    )
    SELECT doc_id, bloom_member, (doc_id % 7 = 0) AS is_reference FROM memb
    """,
)
def dedup_bloom_membership(spark, sf_dir):
    """Bloom-filter membership against a reference fingerprint set
    (incremental crawl dedup / decontamination at bitmap — not raw-key —
    broadcast cost).  Engine-portable md5 double-hashing means DuckDB
    reproduces the bitmap and every verdict exactly, INCLUDING the false
    positives the deliberately-tight m=512 induces; reference docs are
    members by construction (no false negatives)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("key")
    )
    ref = docs.filter(F.col("doc_id") % 7 == 0)
    bf = bloom.bloom_build(ref, "key", m=512, k=3, method="sparse")
    out = bloom.bloom_contains(docs, "key", bf)
    return out.select(
        "doc_id", "bloom_member", (F.col("doc_id") % 7 == 0).alias("is_reference")
    )


@query(
    "join_bloom_runtime_filter",
    sql="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) / 10000.0
             AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def join_bloom_runtime_filter(spark, sf_dir):
    """Bloom runtime-filter join: the filtered orders side builds a bitmap,
    lineitem is pruned BEFORE its shuffle, then the exact join runs.  The
    oracle is the PLAIN join — pruning is invisible in the result (no false
    negatives; false positives die in the join), which is exactly the
    point: a 100 TB fact table sheds its non-matching majority for the cost
    of one broadcast bitmap instead of shuffling it all into the join.
    Revenue follows the EXACT integer-cents convention (q1/flagship): 3
    returnflag groups over ~20% of lineitem put the sum at ~10¹¹ by
    sfgen100, where a 4-dp round sits inside summation-order ulp (the
    gen100 money audit measured 3/3 rows flipping)."""
    li = table(spark, sf_dir, "lineitem").withColumn(
        "_jk", F.col("l_orderkey").cast("string")
    )
    od = (
        table(spark, sf_dir, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .select(F.col("o_orderkey").cast("string").alias("_jk"))
    )
    j = bloom.bloom_prejoin(li, od, "_jk")  # m auto-sized from the key count
    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        (
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                * (100 - F.floor(F.col("l_discount") * 100 + F.lit(0.5)))
            )
            / F.lit(10000.0)
        ).alias("revenue"),
    )


@query(
    "llm_leakage_safe_split",
    sql=r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok
    ),
    mh AS (
      SELECT doc_id, g.j AS seed,
             MIN(CAST('0x' || substr(md5(u.sg || '#' || g.j), 1, 12) AS BIGINT)) AS mh
      FROM sh, UNNEST(sh.s) AS u(sg), generate_series(0, 15) AS g(j)
      GROUP BY doc_id, g.j
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b.b AS band,
             array_to_string(list_slice(sig, b.b * 4 + 1, b.b * 4 + 4), ',') AS bkey
      FROM sig, generate_series(0, 3) AS b(b)
    ),
    bsz AS (SELECT band, bkey, COUNT(*) AS n FROM banded GROUP BY band, bkey),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      JOIN bsz ON bsz.band = a.band AND bsz.bkey = a.bkey AND bsz.n <= 1000
    ),
    agree AS (
      SELECT c.id_a, c.id_b, SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS na
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.id_a
      JOIN mh mb ON mb.doc_id = c.id_b AND mb.seed = ma.seed
      GROUP BY c.id_a, c.id_b
    ),
    e0 AS (SELECT id_a, id_b FROM agree WHERE ROUND(na / 16.0, 6) >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM e0
              UNION SELECT id_b, id_a FROM e0),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    keyed AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 12)
                          AS BIGINT) / 281474976710656.0 < 0.2
                THEN 'test' ELSE 'train' END AS split
    FROM keyed
    """,
)
def llm_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/test split: near-dup CLUSTERS (md5 MinHash-LSH
    pairs → connected components; singletons = the doc itself) are
    assigned whole to test or train by a deterministic md5 threshold — a
    near-duplicate of a test document can never leak into train.  The
    oracle re-derives signatures, pairs, the closure, cluster keys and
    every split verdict."""
    out = dedup.leakage_safe_split(
        table(spark, sf_dir, "documents"), test_fraction=0.2, use_md5=True
    )
    return out.select("doc_id", "cluster_id", "split")


@query(
    "dedup_bloom_membership_sharded",
    sql="""
    WITH ref AS (SELECT md5(text) AS rk FROM documents WHERE doc_id % 7 = 0),
    rh AS (
      SELECT CAST('0x' || substr(md5(rk), 1, 12) AS BIGINT) AS h1,
             CAST('0x' || substr(md5(rk), 13, 12) AS BIGINT) AS h2
      FROM ref
    ),
    pos AS (
      SELECT DISTINCT h1 % 4 AS shard, (h1 + j * h2) % 256 AS p
      FROM rh, generate_series(0, 2) s(j)
    ),
    cand AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(md5(text)), 1, 12) AS BIGINT) AS h1,
             CAST('0x' || substr(md5(md5(text)), 13, 12) AS BIGINT) AS h2
      FROM documents
    ),
    memb AS (
      SELECT c.doc_id, BOOL_AND(p.p IS NOT NULL) AS bloom_member
      FROM cand c
      CROSS JOIN generate_series(0, 2) s(j)
      LEFT JOIN pos p
        ON p.shard = c.h1 % 4 AND p.p = (c.h1 + s.j * c.h2) % 256
      GROUP BY c.doc_id
    )
    SELECT doc_id, bloom_member, (doc_id % 7 = 0) AS is_reference FROM memb
    """,
)
def dedup_bloom_membership_sharded(spark, sf_dir):
    """Sharded Bloom membership — the escape hatch for reference sets whose
    bitmap exceeds the single-broadcast budget: shard = h1 mod 4 routes each
    key to its own independent 256-bit filter (4 shards here, deliberately
    tiny so false positives occur and get verified).  The oracle re-derives
    shard routing, per-shard bitmaps, and every verdict including the false
    positives; reference docs are members by construction."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("key")
    )
    ref = docs.filter(F.col("doc_id") % 7 == 0)
    sbf = bloom.bloom_build_sharded(ref, "key", m_total=1024, k=3, n_shards=4)
    out = bloom.bloom_contains_sharded(docs, "key", sbf)
    return out.select(
        "doc_id", "bloom_member", (F.col("doc_id") % 7 == 0).alias("is_reference")
    )


@query(
    "dedup_duplicate_lines",
    headline=True,
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    chunk AS (
      SELECT doc_id, i, array_to_string(t[(i*8+1):(i*8+8)], ' ') AS line
      FROM tok, UNNEST(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS u(i)
    ),
    lines AS (
      SELECT doc_id, CAST(-1 AS BIGINT) AS pos,
             'subscribe to our newsletter today' AS line
      FROM tok WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, i AS pos, line FROM chunk
      UNION ALL
      SELECT doc_id, CAST(1000000 AS BIGINT) AS pos,
             'all rights reserved worldwide' AS line
      FROM tok WHERE doc_id % 4 = 0
    ),
    dup AS (
      SELECT trim(line) AS k FROM lines WHERE trim(line) <> ''
      GROUP BY trim(line) HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marked AS (
      SELECT l.doc_id, l.pos, l.line, (d.k IS NOT NULL) AS isdup
      FROM lines l LEFT JOIN dup d ON trim(l.line) = d.k
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
           md5(COALESCE(string_agg(CASE WHEN NOT isdup THEN line END,
                                   chr(10) ORDER BY pos), '')) AS clean_fp
    FROM marked GROUP BY doc_id
    """,
)
def dedup_duplicate_lines(spark, sf_dir):
    """Cross-document duplicate-LINE removal (CCNet / Dolma boilerplate
    stripping).  The corpus has no newlines, so the query first builds a
    deterministic multi-line fixture both engines can reproduce: the text
    re-chunked into 8-word lines, plus a shared newsletter header on
    doc_id % 3 == 0 and a legal footer on doc_id % 4 == 0.  duplicate_lines
    must drop the injected boilerplate (and any 8-word chunk that collides
    across docs) and reassemble the rest in order; clean_fp proves the
    reassembled text byte-for-byte."""
    # tokens projected into a bound column FIRST — slicing the split
    # expression inside the transform lambda re-evaluates it per chunk
    # (the quadratic trap llm.text.ngrams documents)
    docs = table(spark, sf_dir, "documents").withColumn(
        "_t", F.split(F.trim(F.col("text")), r"\s+")
    )
    t = F.col("_t")
    nchunks = F.ceil(F.size(t) / F.lit(8.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.concat_ws(" ", F.slice(t, i * 8 + 1, 8)),
    )
    empty = F.array().cast("array<string>")
    header = F.when(
        F.col("doc_id") % 3 == 0, F.array(F.lit("subscribe to our newsletter today"))
    ).otherwise(empty)
    footer = F.when(
        F.col("doc_id") % 4 == 0, F.array(F.lit("all rights reserved worldwide"))
    ).otherwise(empty)
    fix = docs.select(
        "doc_id", F.concat_ws("\n", F.concat(header, chunks, footer)).alias("text2")
    )
    out = dedup.duplicate_lines(fix, text_col="text2", min_docs=2, use_hash=False)
    return out.select(
        "doc_id", "n_lines", "n_dup_lines", F.md5("clean_text").alias("clean_fp")
    )


@query(
    "dedup_duplicate_spans",
    headline=True,
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    g AS (
      SELECT doc_id, i, md5(array_to_string(t[i:i+4], ' ')) AS gk
      FROM tok, UNNEST(range(1, len(t) - 3)) AS u(i)
      WHERE len(t) >= 5
    ),
    dup AS (SELECT gk FROM g GROUP BY gk HAVING COUNT(DISTINCT doc_id) >= 2),
    hit AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gk)),
    cov AS (SELECT DISTINCT doc_id, p FROM hit, UNNEST(range(i, i + 5)) AS v(p)),
    agg AS (SELECT doc_id, COUNT(DISTINCT i) AS n_dup_grams FROM hit GROUP BY doc_id),
    covn AS (SELECT doc_id, COUNT(*) AS n_covered FROM cov GROUP BY doc_id),
    pos AS (
      SELECT tok.doc_id, r.p, t[CAST(r.p AS INT)] AS w
      FROM tok, UNNEST(range(1, len(t) + 1)) AS r(p)
    ),
    clean AS (
      SELECT pos.doc_id,
             md5(COALESCE(string_agg(w, ' ' ORDER BY pos.p), '')) AS clean_fp
      FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
      WHERE cov.p IS NULL
      GROUP BY pos.doc_id
    )
    SELECT tok.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(agg.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(COALESCE(covn.n_covered, 0) AS BIGINT) AS n_covered,
           COALESCE(clean.clean_fp, md5('')) AS clean_fp
    FROM tok
    LEFT JOIN agg ON agg.doc_id = tok.doc_id
    LEFT JOIN covn ON covn.doc_id = tok.doc_id
    LEFT JOIN clean ON clean.doc_id = tok.doc_id
    """,
)
def dedup_duplicate_spans(spark, sf_dir):
    """Cross-document duplicate-SPAN removal (C4 / Lee et al. style): token
    positions covered by any 5-gram shared across ≥2 docs, plus the md5 of
    the text with those positions cut.  md5 gram keys for exact DuckDB
    parity; the xxhash64 fast path (`use_hash=True`) is the 8-byte-key
    production default."""
    return dedup.duplicate_spans(
        table(spark, sf_dir, "documents"), n=5, min_docs=2, use_hash=False
    )


@query(
    "pipeline_span_dedup_curation",
    sql=r"""
    WITH s AS (
      SELECT doc_id, lang, n_chars, text,
             string_split_regex(trim(text), '\s+') AS t,
             LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS non_space,
             LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS alpha
      FROM documents
    ),
    q AS (
      SELECT *, ROUND((LEAST(len(t) / 20.0, 1.0)
                 + CASE WHEN non_space / GREATEST(len(t), 1) BETWEEN 3 AND 12
                        THEN 1.0 ELSE 0.0 END
                 + alpha / GREATEST(non_space, 1)) / 3.0, 6) AS quality
      FROM s
    ),
    kept AS (SELECT * FROM q WHERE quality >= 0.5 AND n_chars BETWEEN 50 AND 5000),
    g AS (
      SELECT doc_id, i, md5(array_to_string(t[i:i+4], ' ')) AS gk
      FROM kept, UNNEST(range(1, len(t) - 3)) AS u(i)
      WHERE len(t) >= 5
    ),
    dup AS (SELECT gk FROM g GROUP BY gk HAVING COUNT(DISTINCT doc_id) >= 2),
    hit AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gk)),
    cov AS (SELECT DISTINCT doc_id, p FROM hit, UNNEST(range(i, i + 5)) AS v(p)),
    covn AS (SELECT doc_id, COUNT(*) AS n_covered FROM cov GROUP BY doc_id)
    SELECT kept.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN COALESCE(covn.n_covered, 0) * 2 > len(kept.t)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN COALESCE(covn.n_covered, 0) * 2 <= len(kept.t)
                         THEN len(kept.t) - COALESCE(covn.n_covered, 0)
                         ELSE 0 END) AS BIGINT) AS kept_tokens,
           CAST(SUM(COALESCE(covn.n_covered, 0)) AS BIGINT) AS total_covered
    FROM kept LEFT JOIN covn ON covn.doc_id = kept.doc_id
    GROUP BY kept.lang
    """,
)
def pipeline_span_dedup_curation(spark, sf_dir):
    """Second end-to-end curation flagship: quality/length filter →
    cross-document duplicate-SPAN analysis among the SURVIVORS (dup grams
    are counted post-filter, the filter-before-dedup ordering that keeps
    the gram shuffle small) → per-language rollup with the majority-covered
    docs dropped and covered tokens subtracted from the rest.  Every stage
    from the public operator layer; full SQL twin."""
    from compss_python_spark.llm.dedup import duplicate_spans
    from compss_python_spark.llm.text import quality_score
    from compss_python_spark.width import ensure_min_partitions

    docs = quality_score(ensure_min_partitions(table(spark, sf_dir, "documents")))
    kept = docs.filter(
        (F.col("quality") >= 0.5) & F.col("n_chars").between(50, 5000)
    )
    spans = duplicate_spans(kept, use_hash=False).select(
        "doc_id", "n_tokens", "n_covered"
    )
    joined = kept.select("doc_id", "lang").join(spans, "doc_id")
    dropped = F.col("n_covered") * 2 > F.col("n_tokens")
    return joined.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(dropped.cast("long")).alias("n_dropped"),
        F.sum(
            F.when(~dropped, F.col("n_tokens") - F.col("n_covered")).otherwise(0)
        ).alias("kept_tokens"),
        F.sum("n_covered").alias("total_covered"),
    )


@query(
    "dedup_set_similarity_join",
    oracle_cost="superlinear",  # brute-force all-pairs: spilled >70 GB at sfgen10
    sql=r"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(ni / (sa.sz + sb.sz - ni), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ni / (sa.sz + sb.sz - ni) >= 0.95
    """,
)
def dedup_set_similarity_join(spark, sf_dir):
    """Exact all-pairs token-set Jaccard >= 0.95 via PREFIX FILTERING
    (PPJoin family): candidates must share a token in their
    rarest-(global-frequency)-first prefix, so the join keys on rare
    tokens instead of an O(n^2) cartesian or a lossy block.  The oracle is
    the BRUTE-FORCE all-pairs computation — a hash match proves the prefix
    filter loses zero recall."""
    return dedup.set_similarity_join(
        table(spark, sf_dir, "documents"), threshold=0.95
    )


@query(
    "dedup_fuzzy_name_pairs",
    sql="""
    WITH names AS (SELECT DISTINCT p_name AS s FROM part)
    SELECT a.s AS s_a, b.s AS s_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS distance
    FROM names a JOIN names b
      ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 2
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def dedup_fuzzy_name_pairs(spark, sf_dir):
    """Fuzzy entity resolution: distinct part-name pairs within edit
    distance 2 via q-gram candidate filtering + exact levenshtein verify.
    The oracle is BRUTE FORCE over all name pairs — a hash match proves
    the q=2 shared-gram filter (complete for len >= (k+1)q) loses no
    pair."""
    out = dedup.fuzzy_string_pairs(
        table(spark, sf_dir, "part").select(F.col("p_name")), "p_name",
        max_distance=2, q=2,
    )
    return out.select("s_a", "s_b", F.col("distance").cast("long").alias("distance"))


@query(
    "dedup_fuzzy_short_strings",
    sql="""
    WITH names AS (
      SELECT DISTINCT s FROM (
        SELECT n_name AS s FROM nation
        UNION ALL SELECT substr(n_name, 2) FROM nation
        UNION ALL SELECT substr(n_name, 1, 4) FROM nation
      )
    )
    SELECT a.s AS s_a, b.s AS s_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS distance
    FROM names a JOIN names b
      ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 2
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def dedup_fuzzy_short_strings(spark, sf_dir):
    """Fuzzy pairs over a deliberately SHORT/mixed-length corpus (nation
    names plus their 1-char-dropped and 4-char-truncated variants — many
    below the (k+1)·q shared-gram bound): exercises the deletion-
    neighborhood short-string path end-to-end, including short x long
    pairs across the length boundary.  Oracle is brute force over all
    pairs, so a hash match proves the routed two-path plan loses
    nothing."""
    n = table(spark, sf_dir, "nation").select(F.col("n_name").alias("s"))
    corpus = (
        n.unionByName(n.select(F.expr("substr(s, 2)").alias("s")))
        .unionByName(n.select(F.expr("substr(s, 1, 4)").alias("s")))
    )
    out = dedup.fuzzy_string_pairs(corpus, "s", max_distance=2, q=2)
    return out.select("s_a", "s_b", F.col("distance").cast("long").alias("distance"))


@query(
    "multimodal_wav_sample_stats",
    sql="""
    WITH w AS (
      SELECT doc_id, 1 + doc_id % 2 AS channels, 32 + doc_id % 97 AS n_samples
      FROM documents WHERE doc_id % 3 = 2
    ),
    s AS (
      SELECT w.doc_id, w.channels, w.n_samples,
             ((w.doc_id * 31 + j.j * 7919) % 65536) - 32768 AS v
      FROM w, UNNEST(range(0, w.n_samples * w.channels)) AS j(j)
    )
    SELECT doc_id AS media_id, CAST(channels AS INT) AS channels,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_pcm,
           CAST(SUM(v * v) AS BIGINT) AS sumsq_pcm,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak
    FROM s GROUP BY 1, 2, 3
    """,
)
def multimodal_wav_sample_stats(spark, sf_dir):
    """REAL audio decode end-to-end: deterministic int16 PCM waveforms are
    packed into real RIFF/WAVE containers (value_j = ((id*31 + j*7919) mod
    65536) - 32768), then decoded back by the byte-level PCM reader and
    reduced to exact-integer sample stats.  The oracle recomputes the
    waveform from the closed form, so a hash match proves container
    walking, fmt parsing and sample decode byte-for-byte — the audio
    counterpart of multimodal_png_pixel_stats.  (PCM needs no codec;
    entropy-coded JPEG remains the one documented stub.)"""
    media = multimodal.synthesize_real_media(table(spark, sf_dir, "documents"))
    wavs = media.filter(F.col("media_id") % 3 == 2)
    return multimodal.wav_sample_stats(wavs)


@query(
    "text_corpus_drift_kl",
    sql=r"""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
      FROM documents
    ),
    st AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    stot AS (SELECT source, SUM(c) AS ts FROM st GROUP BY 1),
    ct AS (SELECT t, SUM(c) AS cc FROM st GROUP BY 1),
    ctot AS (SELECT SUM(cc) AS tc FROM ct)
    SELECT st.source,
           ROUND(SUM((st.c / stot.ts)
                     * LN((st.c / stot.ts) / (ct.cc / ctot.tc))), 4) AS kl,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(MIN(stot.ts) AS BIGINT) AS n_occurrences
    FROM st
    JOIN stot USING (source)
    JOIN ct USING (t)
    CROSS JOIN ctot
    GROUP BY st.source
    """,
)
def text_corpus_drift_kl(spark, sf_dir):
    """Corpus drift monitor: KL(P_source || P_corpus) over token unigram
    distributions, per source — the distribution-shift alarm a production
    corpus pipeline runs per ingest batch.  No smoothing needed: every
    source token exists in the corpus by construction.  Two map-combined
    aggregates + arithmetic; sums are rounded(4) against cross-engine
    accumulation-order ulp."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    st = tok.groupBy("source", "t").agg(F.count("*").alias("c"))
    stot = st.groupBy("source").agg(F.sum("c").alias("ts"))
    ct = st.groupBy("t").agg(F.sum("c").alias("cc"))
    ctot = ct.agg(F.sum("cc").alias("tc"))
    p = F.col("c") / F.col("ts")
    q = F.col("cc") / F.col("tc")
    return (
        st.join(stot, "source")
        .join(ct, "t")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source")
        .agg(
            F.round(F.sum(p * F.log(p / q)), 4).alias("kl"),
            F.count("*").alias("n_tokens"),
            F.min("ts").cast("long").alias("n_occurrences"),
        )
    )


@query(
    "llm_pack_sequences",
    headline=True,
    sql=r"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, doc_id % 8 AS shard,
             len(string_split_regex(trim(text), '\s+')) AS t
      FROM documents
    ),
    ord AS (
      SELECT doc_id, shard, t,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM docs
    ),
    pack(shard, rn, doc_id, t, seq, acc) AS (
      SELECT shard, rn, doc_id, t, 0, t FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.t,
             CASE WHEN p.acc > 0 AND p.acc + o.t > 256
                  THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.acc > 0 AND p.acc + o.t > 256
                  THEN o.t ELSE p.acc + o.t END
      FROM pack p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(shard * 1000000000 + seq AS BIGINT) AS seq_id,
           CAST(t AS BIGINT) AS n_tokens, t > 256 AS truncated
    FROM pack
    """,
)
def llm_pack_sequences(spark, sf_dir):
    """Sequence packing for LLM training: shard-local exact greedy
    assignment of documents into 256-token sequences (8 shards, id order).
    The oracle re-runs the greedy scan as a per-shard recursive CTE, so a
    hash match proves every sequence assignment, overflow boundary and
    truncation flag.  One shuffle (groupBy shard) + an Arrow-batched
    integer scan per shard — no global order, no driver state."""
    from compss_python_spark.llm.packing import pack_sequences
    from compss_python_spark.llm.text import tokens

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    return pack_sequences(docs, budget=256, n_shards=8)


@query(
    "llm_packing_stats",
    sql=r"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, doc_id % 8 AS shard,
             len(string_split_regex(trim(text), '\s+')) AS t
      FROM documents
    ),
    ord AS (
      SELECT doc_id, shard, t,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM docs
    ),
    pack(shard, rn, doc_id, t, seq, acc) AS (
      SELECT shard, rn, doc_id, t, 0, t FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.t,
             CASE WHEN p.acc > 0 AND p.acc + o.t > 256
                  THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.acc > 0 AND p.acc + o.t > 256
                  THEN o.t ELSE p.acc + o.t END
      FROM pack p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1
    ),
    per_seq AS (
      SELECT shard * 1000000000 + seq AS seq_id,
             SUM(LEAST(t, 256)) AS fill, COUNT(*) AS docs,
             SUM(CASE WHEN t > 256 THEN 1 ELSE 0 END) AS truncs
      FROM pack GROUP BY 1
    )
    SELECT COUNT(*) AS n_sequences, CAST(SUM(docs) AS BIGINT) AS n_docs,
           CAST(SUM(fill) AS BIGINT) AS total_tokens,
           ROUND(SUM(fill) / (COUNT(*) * 256.0), 6) AS fill_rate,
           CAST(SUM(truncs) AS BIGINT) AS n_truncated_docs
    FROM per_seq
    """,
)
def llm_packing_stats(spark, sf_dir):
    """Loader-facing packing efficiency: fill rate of the 256-token
    sequences produced by `llm_pack_sequences` (budget utilization is THE
    cost metric of a packed dataset — wasted budget is wasted compute).
    One map-combined aggregate pair over the packed table."""
    from compss_python_spark.llm.packing import pack_sequences, packing_stats
    from compss_python_spark.llm.text import tokens

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    return packing_stats(pack_sequences(docs, budget=256, n_shards=8), budget=256)


@query(
    "llm_stratified_rebalance",
    sql="""
    WITH counts AS (
      SELECT lang AS s, CAST(COUNT(*) AS BIGINT) AS c FROM documents
      WHERE lang IN ('en', 'de', 'fr') GROUP BY lang
    ),
    tmax AS (
      SELECT MIN(c / CAST(CASE s WHEN 'en' THEN 0.5 ELSE 0.25 END AS DOUBLE))
             AS t
      FROM counts
    ),
    rates AS (
      SELECT s,
             CAST(CASE s WHEN 'en' THEN 0.5 ELSE 0.25 END AS DOUBLE)
               * tmax.t / c AS rate
      FROM counts, tmax
    )
    SELECT d.doc_id, d.lang, ROUND(r.rate, 6) AS keep_rate
    FROM documents d JOIN rates r ON r.s = d.lang
    WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12) AS BIGINT)
          / 281474976710656.0 < r.rate
    """,
)
def llm_stratified_rebalance(spark, sf_dir):
    """Deterministic corpus rebalancing to a target language mix
    (en 50% / de 25% / fr 25%): keep rates derived from the largest
    feasible total, membership by md5-hash threshold — reproducible across
    runs and engines, so the oracle recomputes every surviving row (other
    languages drop by contract).  One tiny count aggregate + a narrow
    filter; the corpus never shuffles."""
    from compss_python_spark.llm.sampling import stratified_rebalance

    docs = table(spark, sf_dir, "documents")
    out = stratified_rebalance(
        docs, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}, "doc_id"
    )
    return out.select("doc_id", "lang", "keep_rate")


@query(
    "llm_chunk_documents",
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    c AS (
      SELECT doc_id, t,
             GREATEST(1, (len(t) - 8 + 23) // 24) AS nc
      FROM tok
    )
    SELECT doc_id, CAST(ci.i AS INT) AS chunk_idx,
           array_to_string(list_slice(t, ci.i * 24 + 1, ci.i * 24 + 32), ' ')
             AS chunk_text,
           CAST(len(list_slice(t, ci.i * 24 + 1, ci.i * 24 + 32)) AS INT)
             AS n_tokens
    FROM c, UNNEST(range(0, nc)) ci(i)
    """,
)
def llm_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (32-token chunks, 8-token
    overlap) — the pre-embedding / pre-RAG split.  Entirely narrow JVM
    expressions (tokenize → sequence explode → array slice); the oracle
    reproduces every chunk id, every chunk text and the ceil-div chunk
    count exactly."""
    from compss_python_spark.llm.text import chunk_documents

    return chunk_documents(
        table(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@query(
    "embedding_mean_pool",
    sql="""
    WITH ex AS (
      SELECT vec_id % 50 AS grp, d.i - 1 AS dim_idx,
             CAST(embedding[d.i] AS DOUBLE) AS v
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) d(i)
    ),
    m AS (SELECT grp, dim_idx, AVG(v) AS mv FROM ex GROUP BY grp, dim_idx),
    nrm AS (SELECT grp, SQRT(SUM(mv * mv)) AS nn FROM m GROUP BY grp)
    SELECT m.grp, CAST(dim_idx AS INT) AS dim_idx,
           ROUND(CASE WHEN nn = 0 THEN mv ELSE mv / nn END, 5) + 0.0 AS v
    FROM m JOIN nrm USING (grp)
    """,
)
def embedding_mean_pool(spark, sf_dir):
    """Chunk→document embedding pooling: element-wise mean per group
    (posexplode + ONE map-combined groupBy keyed on (group, dim) — no
    UDF, no per-group collect) followed by L2 normalization of the pooled
    vector.  Long-form output (group, dim_idx, value) keeps the oracle
    comparison array-free.  Both sides add +0.0 AFTER the round: a
    near-zero pooled mean whose summation-order sign differs between
    engines rounds to ±0.0, and the canon stringifies the signed zeros
    apart (caught at sfgen10 density, 1/3200 rows); IEEE −0.0 + 0.0 = +0.0
    normalizes the sign without touching any other value."""
    from compss_python_spark.llm.similarity import l2_normalize, mean_pool

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "grp", F.col("vec_id") % 50
    )
    pooled = mean_pool(emb, ["grp"], "embedding")
    normed = pooled.select("grp", l2_normalize(F.col("pooled")).alias("nv"))
    return normed.select(
        "grp", F.posexplode("nv").alias("dim_idx", "_v")
    ).select("grp", "dim_idx", (F.round("_v", 5) + F.lit(0.0)).alias("v"))


@query(
    "text_lm_cross_entropy",
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    pairs AS (
      SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
      FROM tok, UNNEST(range(1, len(t))) i(i)
      WHERE len(t) >= 2
    ),
    uni AS (
      SELECT u.w AS w1, COUNT(*) AS c1
      FROM tok, UNNEST(t) u(w) GROUP BY 1
    ),
    v AS (SELECT COUNT(*) AS v FROM uni),
    bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2)
    SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(-AVG(LN((c2 + 0.1) / (c1 + 0.1 * v.v))), 5) AS cross_entropy
    FROM pairs p
    JOIN bi USING (w1, w2)
    JOIN uni USING (w1)
    CROSS JOIN v
    GROUP BY p.doc_id
    """,
)
def text_lm_cross_entropy(spark, sf_dir):
    """CCNet-style LM quality signal: add-0.1-smoothed bigram LM trained
    on the corpus, each document scored by per-token cross-entropy.  Two
    count aggregates train the LM; the doc pair stream joins them and one
    per-doc aggregate closes.  The oracle retrains the identical LM and
    reproduces every score to 5 dp."""
    from compss_python_spark.llm.text import bigram_lm_score

    return bigram_lm_score(table(spark, sf_dir, "documents"))


@query(
    "text_kn_cross_entropy",
    sql=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    pairs AS (
      SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
      FROM tok, UNNEST(range(1, len(t))) i(i)
      WHERE len(t) >= 2
    ),
    bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2),
    heads AS (SELECT w1, SUM(c2) AS ch, COUNT(*) AS n1_fwd FROM bi GROUP BY 1),
    cont AS (SELECT w2, COUNT(*) AS n1_bwd FROM bi GROUP BY 1),
    tt AS (SELECT COUNT(*) AS t FROM bi)
    SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(-AVG(LN(
             GREATEST(c2 - 0.75, 0.0) / ch
             + 0.75 * n1_fwd / ch * n1_bwd / tt.t
           )), 5) AS cross_entropy
    FROM pairs p
    JOIN bi USING (w1, w2)
    JOIN heads USING (w1)
    JOIN cont USING (w2)
    CROSS JOIN tt
    GROUP BY p.doc_id
    """,
)
def text_kn_cross_entropy(spark, sf_dir):
    """Interpolated Kneser–Ney bigram LM (D = 0.75) self-scoring the
    corpus — the continuation-count smoothing used by every serious n-gram
    LM, alongside the add-α sibling `text_lm_cross_entropy`.  The oracle
    retrains the identical model (bigram counts, head totals, forward /
    backward continuation counts, type total) and reproduces every score
    to 5 dp."""
    from compss_python_spark.llm.text import kneser_ney_lm_score

    return kneser_ney_lm_score(table(spark, sf_dir, "documents"))


@query(
    "text_skipgram_pmi",
    sql=r"""
    WITH tok AS (
      SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
    p0 AS (
      SELECT LEAST(t[i.i], t[i.i + d.d]) AS w1,
             GREATEST(t[i.i], t[i.i + d.d]) AS w2
      FROM tok, generate_series(1, 2) AS d(d),
           UNNEST(range(1, len(t) - d.d + 1)) AS i(i)
      WHERE t[i.i] <> t[i.i + d.d]),
    pairs AS (SELECT w1, w2, COUNT(*) AS c_pair FROM p0 GROUP BY 1, 2),
    marg AS (
      SELECT w, SUM(c_pair) AS c_w FROM (
        SELECT w1 AS w, c_pair FROM pairs
        UNION ALL SELECT w2, c_pair FROM pairs) GROUP BY w),
    tot AS (SELECT SUM(c_pair) AS t FROM pairs),
    scored AS (
      SELECT p.w1, p.w2, CAST(p.c_pair AS BIGINT) AS c_pair,
             ROUND(LN(p.c_pair * tot.t / (a.c_w * b.c_w)), 6) AS pmi
      FROM pairs p
      JOIN marg a ON a.w = p.w1
      JOIN marg b ON b.w = p.w2
      CROSS JOIN tot
      WHERE p.c_pair >= 5),
    topn AS (SELECT * FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 50)
    SELECT w1, w2, c_pair, pmi,
           CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS pmi_rank
    FROM topn
    """,
)
def text_skipgram_pmi(spark, sf_dir):
    """Skip-gram co-occurrence PMI (±2-token window, unordered pairs) —
    the word2vec/GloVe co-occurrence statistic beyond adjacency.  Pair
    generation is a bounded ×window narrow explode (zip_with over shifted
    slices); ONE pair-count aggregate feeds marginals and total.  The
    oracle regenerates every (offset, position) pair and the PMI
    arithmetic."""
    from compss_python_spark.llm.text import skipgram_cooccurrence

    return skipgram_cooccurrence(
        table(spark, sf_dir, "documents"), window=2, min_count=5, top=50
    )


@query(
    "text_normalize",
    sql="""
    WITH messy AS (
      SELECT doc_id,
             '“' || chr(160) || text || '​”' || chr(9) || ' '
               || chr(10) || ' ' || chr(7) || '–ok—' AS m
      FROM documents),
    norm AS (
      SELECT doc_id,
             LOWER(TRIM(REGEXP_REPLACE(
               TRANSLATE(
                 REGEXP_REPLACE(
                   REGEXP_REPLACE(m, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]', '', 'g'),
                   '[​‌‍⁠﻿]', '', 'g'),
                 '‘’‚“”„–—' || chr(160),
                 '''''' || ',' || '\"\"\"' || '-- '),
               '\\s+', ' ', 'g'))) AS t
      FROM messy)
    SELECT doc_id, md5(t) AS norm_fp, CAST(LENGTH(t) AS BIGINT) AS n_chars_norm
    FROM norm
    """,
)
def text_normalize(spark, sf_dir):
    """Canonical text normalization proven byte-for-byte: each document is
    wrapped in a deterministic mess (smart quotes, NBSP, zero-width space,
    control chars, em/en dashes, trailing whitespace runs) that both
    engines synthesize identically, then normalize_text's rule chain —
    strip control, drop zero-width, ASCII-fold typographic punctuation,
    collapse whitespace, lowercase — must reduce it to the same md5.
    Zero shuffle: the whole operator is one chained JVM expression."""
    from compss_python_spark.llm.text import normalize_text

    messy = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("“ "),
            F.col("text"),
            F.lit("​”\t \n \x07–ok—"),
        ).alias("m"),
    )
    out = normalize_text(messy, text_col="m", output_col="t")
    return out.select(
        "doc_id",
        F.md5(F.encode(F.col("t"), "UTF-8")).alias("norm_fp"),
        F.length("t").cast("long").alias("n_chars_norm"),
    )


_HTML_PREFIX = (
    '<html><head><style>p{margin:0}</style>'
    '<script>var x = "<p>hidden</p>";</script></head>'
    "<body><h1>Title</h1>\n<p>"
)
_HTML_SUFFIX = (
    "</p>\n<!-- footer comment --><br/>"
    "<div>tail&nbsp;&amp;&lt;end&gt;</div></body></html>"
)


@query(
    "text_html_extract",
    sql="""
    WITH esc AS (
      SELECT doc_id,
             replace(replace(replace(text, '&', '&amp;'),
                     '<', '&lt;'), '>', '&gt;') AS t
      FROM documents),
    h AS (
      SELECT doc_id,
             '<html><head><style>p{margin:0}</style>'
               || '<script>var x = "<p>hidden</p>";</script></head>'
               || '<body><h1>Title</h1>' || chr(10) || '<p>'
               || replace(t, chr(10), '</p>' || chr(10) || '<p>')
               || '</p>' || chr(10) || '<!-- footer comment --><br/>'
               || '<div>tail&nbsp;&amp;&lt;end&gt;</div></body></html>' AS html
      FROM esc),
    x AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(html,
                             '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                           '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                         '(?s)<!--.*?-->', ' ', 'g'),
                       '(?i)<br[^>]*>', chr(10), 'g'),
                     '(?i)</(p|div|h[1-6]|li|tr|table|blockquote|ul|ol)>',
                     chr(10), 'g'),
                   '<[^>]+>', ' ', 'g'),
                 '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                 '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
               '[ \\t\\x0B\\f\\r]+', ' ', 'g'),
               ' ?\\n[ \\n]*', chr(10), 'g')) AS ext
      FROM h)
    SELECT doc_id, md5(ext) AS text_md5,
           CAST(LENGTH(ext) AS BIGINT) AS n_chars
    FROM x
    """,
)
def text_html_extract(spark, sf_dir):
    """HTML boilerplate extraction proven byte-for-byte: each document is
    wrapped in a deterministic HTML shell (script/style elements whose
    CONTENT must vanish, a comment, <br>, block tags, double-encoded
    entities) that both engines synthesize identically; html_to_text's
    RE2-compatible tag/entity/whitespace chain must then reduce it to the
    same md5.  Zero shuffle — one chained JVM regexp expression, linear in
    bytes, the Spark-expression analogue of the trafilatura/resiliparse
    step in CCNet/Dolma-style crawl pipelines."""
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    html = F.concat(
        F.lit(_HTML_PREFIX),
        F.replace(esc, F.lit("\n"), F.lit("</p>\n<p>")),
        F.lit(_HTML_SUFFIX),
    )
    ext = text.html_to_text(html)
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.encode(ext, "UTF-8")).alias("text_md5"),
        F.length(ext).cast("long").alias("n_chars"),
    )


@query(
    "text_url_canonicalize",
    sql="""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://Src-' || source || '.Example.COM:443/Docs/'
               || CAST(doc_id % 7 AS VARCHAR) || '/../'
               || CAST(doc_id AS VARCHAR)
               || '/./view?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
               || '&ref=rss&page=' || CAST(doc_id % 3 AS VARCHAR)
               || '#sec-' || CAST(doc_id AS VARCHAR) AS url
      FROM documents),
    parts AS (
      SELECT doc_id, url,
             split_part(url, '#', 1) AS u
      FROM raw),
    sa AS (
      SELECT doc_id, u,
             lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS auth0,
             regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '') AS rest
      FROM parts),
    sb AS (
      SELECT doc_id, scheme, rest,
             CASE WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
                  ELSE auth0 END AS auth,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 split_part(rest, '?', 1),
                 '/\\./', '/', 'g'), '/\\./', '/', 'g'), '/\\.$', '/'),
                 '/[^/]+/\\.\\./', '/', 'g'), '/[^/]+/\\.\\./', '/', 'g'),
                 '/[^/]+/\\.\\./', '/', 'g'), '/[^/]+/\\.\\./', '/', 'g'),
                 '/[^/]+/\\.\\.$', '/') AS path0,
             CASE WHEN instr(rest, '?') > 0
                  THEN substring(rest, instr(rest, '?') + 1) ELSE '' END AS qs
      FROM sa),
    sc AS (
      SELECT doc_id, scheme, auth,
             CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
             list_filter(string_split(qs, '&'),
               p -> len(p) > 0 AND NOT regexp_matches(p,
                 '^(utm_[^=&#]*|gclid|fbclid|msclkid|ref|referrer)(=|$)')) AS params,
             instr(rest, '?') > 0 AS had_q
      FROM sb)
    SELECT doc_id,
           scheme || '://' || auth || path ||
             CASE WHEN had_q AND len(params) > 0
                  THEN '?' || array_to_string(params, '&') ELSE '' END
             AS canonical_url
    FROM sc
    """,
)
def text_url_canonicalize(spark, sf_dir):
    """URL canonicalization proven byte-for-byte: a deterministic messy URL
    per document (mixed-case scheme/host, default port, '..' and '.' dot
    segments, utm/ref tracking params interleaved with real ones, a
    fragment) that both engines synthesize identically; canonicalize_url's
    RE2-compatible chain must reduce it to the same canonical string.
    Zero shuffle — one chained JVM expression, the crawl-dedup key step."""
    d = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("HTTPS://Src-"),
        F.col("source"),
        F.lit(".Example.COM:443/Docs/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("/../"),
        d,
        F.lit("/./view?utm_source=feed&id="),
        d,
        F.lit("&ref=rss&page="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("#sec-"),
        d,
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id", text.canonicalize_url(url).alias("canonical_url")
    )


@query(
    "pipeline_crawl_ingest",
    sql="""
    WITH raw AS (
      SELECT doc_id, text,
             'HTTP://Mirror.Example.COM:80/item/'
               || CAST(doc_id % 97 AS VARCHAR)
               || '/./index?utm_medium=crawl&v=1#top' AS url
      FROM documents),
    canon AS (
      SELECT doc_id, text,
             'http://mirror.example.com/item/'
               || CAST(doc_id % 97 AS VARCHAR)
               || '/index?v=1' AS canonical_url
      FROM raw),
    surv AS (
      SELECT canonical_url, MIN(doc_id) AS keep_id
      FROM canon GROUP BY canonical_url),
    kept AS (
      SELECT s.canonical_url, s.keep_id, c.text
      FROM surv s JOIN canon c ON c.doc_id = s.keep_id),
    ext AS (
      SELECT keep_id,
             trim(regexp_replace(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   '<html><body><p>'
                     || replace(replace(replace(replace(text, '&', '&amp;'),
                          '<', '&lt;'), '>', '&gt;'), chr(10),
                          '</p>' || chr(10) || '<p>')
                     || '</p></body></html>',
                   '(?i)</(p|div|h[1-6]|li|tr|table|blockquote|ul|ol)>',
                   chr(10), 'g'),
                 '<[^>]+>', ' ', 'g'),
               '[ \\t\\x0B\\f\\r]+', ' ', 'g'),
               ' ?\\n[ \\n]*', chr(10), 'g')) AS t
      FROM kept),
    dec AS (
      SELECT keep_id,
             replace(replace(replace(replace(replace(replace(t,
               '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t
      FROM ext)
    SELECT COUNT(*) AS n_pages,
           CAST(SUM(len(string_split_regex(trim(t), '\\s+'))) AS BIGINT)
             AS total_tokens,
           CAST(SUM(LENGTH(t)) AS BIGINT) AS total_chars
    FROM dec
    """,
)
def pipeline_crawl_ingest(spark, sf_dir):
    """Crawl-ingestion composite: messy per-doc URL (doc_id%97 item
    slots → ~5 docs collide per canonical URL at sf0.01) → canonicalize_url → URL-keyed
    exact dedup (min-doc_id survivor per canonical URL) → survivors'
    synthetic HTML unwrapped by html_to_text → corpus totals.  The oracle
    PRE-COMPUTES the canonical URL in closed form (the per-step chain is
    already byte-proven by text_url_canonicalize) and replays the
    extraction chain — composition-level parity on top of the unit
    oracles.  Scale shape: one groupBy(canonical_url) shuffle for the
    dedup; everything else is chained JVM expressions."""
    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("HTTP://Mirror.Example.COM:80/item/"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("/./index?utm_medium=crawl&v=1#top"),
    )
    canon = docs.select(
        "doc_id", "text", text.canonicalize_url(url).alias("canonical_url")
    )
    surv = canon.groupBy("canonical_url").agg(F.min("doc_id").alias("keep_id"))
    kept = surv.join(
        canon.select(F.col("doc_id").alias("keep_id"), "text"), "keep_id"
    )
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    html = F.concat(
        F.lit("<html><body><p>"),
        F.replace(esc, F.lit("\n"), F.lit("</p>\n<p>")),
        F.lit("</p></body></html>"),
    )
    ext = text.html_to_text(html)
    return kept.select(ext.alias("t")).agg(
        F.count("*").alias("n_pages"),
        F.sum(F.size(F.split(F.trim(F.col("t")), r"\s+"))).cast("long").alias("total_tokens"),
        F.sum(F.length("t")).cast("long").alias("total_chars"),
    )


@query(
    "text_line_quality_filter",
    sql="""
    WITH messy AS (
      SELECT doc_id,
             text || chr(10) || '====' || chr(10) || '* * * * *'
                  || chr(10) || 'OK' || chr(10)
                  || 'this line stays here fine' AS m
      FROM documents),
    filt AS (
      SELECT doc_id,
             array_to_string(
               list_filter(string_split(m, chr(10)),
                 ln -> len(string_split_regex(trim(ln), '\\s+')) >= 3
                       AND len(regexp_replace(ln, '[\\p{L}\\p{N}\\s]', '', 'g')) * 100
                           <= 50 * len(ln)),
               chr(10)) AS t
      FROM messy)
    SELECT doc_id, md5(t) AS kept_md5,
           CAST(LENGTH(t) AS BIGINT) AS n_chars,
           CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines
    FROM filt
    """,
)
def text_line_quality_filter(spark, sf_dir):
    """Line-level boilerplate filtering proven byte-for-byte: each document
    gains four deterministic junk lines (separator run, punctuation burst,
    a one-word line, one prose line that must SURVIVE); the
    token-count + integer punct-ratio filter must reduce both engines to
    the same reassembled md5.  Zero shuffle — one HOF filter expression."""
    messy = F.concat(
        F.col("text"),
        F.lit("\n====\n* * * * *\nOK\nthis line stays here fine"),
    )
    kept = text.filter_boilerplate_lines(messy)
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.encode(kept, "UTF-8")).alias("kept_md5"),
        F.length(kept).cast("long").alias("n_chars"),
        F.size(F.split(kept, "\n")).cast("long").alias("n_lines"),
    )


@query(
    "text_gopher_rules",
    sql=r"""
    WITH s AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks,
             LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS non_space,
             string_split(text, chr(10)) AS lines,
             text
      FROM documents),
    r AS (
      SELECT doc_id,
             len(toks) AS n_words,
             GREATEST(len(toks), 1) AS n_words1,
             non_space,
             len(regexp_extract_all(text, '#|\.\.\.'))
               + len(regexp_extract_all(text, '…')) AS n_symbols,
             len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
               AS alpha_words,
             GREATEST(len(lines), 1) AS n_lines1,
             len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
               AS bullet_lines,
             len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$')))
               AS ellipsis_lines,
             len(list_intersect(
                 list_transform(toks, w -> lower(w)),
                 ['the','be','to','of','and','that','have','with']))
               AS stop_distinct
      FROM s)
    SELECT doc_id,
           n_words >= 50 AND n_words <= 100000            AS r_word_count,
           non_space / n_words1 >= 3.0
             AND non_space / n_words1 <= 10.0             AS r_mean_word_len,
           n_symbols / n_words1 <= 0.1                    AS r_symbol_ratio,
           alpha_words / n_words1 >= 0.80                 AS r_alpha_words,
           bullet_lines / n_lines1 <= 0.90                AS r_bullets,
           ellipsis_lines / n_lines1 <= 0.30              AS r_ellipsis,
           stop_distinct >= 1                             AS r_stopwords,
           (n_words >= 50 AND n_words <= 100000)
             AND (non_space / n_words1 >= 3.0 AND non_space / n_words1 <= 10.0)
             AND (n_symbols / n_words1 <= 0.1)
             AND (alpha_words / n_words1 >= 0.80)
             AND (bullet_lines / n_lines1 <= 0.90)
             AND (ellipsis_lines / n_lines1 <= 0.30)
             AND (stop_distinct >= 1)                     AS gopher_keep
    FROM r
    """,
)
def text_gopher_rules(spark, sf_dir):
    """Gopher document-quality rules (Rae et al. 2021 §A1.1): per-doc
    boolean verdicts for the seven classic filters plus the combined keep
    flag.  All rules are narrow JVM expressions (zero shuffle); the oracle
    re-derives every rule in DuckDB list/regex functions.  stop_hits=1
    because the synthetic corpus vocabulary contains only one Gopher
    stopword family."""
    from compss_python_spark.llm.text import gopher_rules

    out = gopher_rules(table(spark, sf_dir, "documents"), stop_hits=1)
    return out.select(
        "doc_id",
        "r_word_count",
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_alpha_words",
        "r_bullets",
        "r_ellipsis",
        "r_stopwords",
        "gopher_keep",
    )


@query(
    "text_zipf_slope",
    sql=r"""
    WITH freq AS (
      SELECT u.term, COUNT(*) AS cnt
      FROM (SELECT string_split_regex(trim(text), '\s+') AS t FROM documents) d,
           UNNEST(d.t) u(term)
      WHERE u.term <> ''
      GROUP BY 1),
    top AS (SELECT term, cnt FROM freq ORDER BY cnt DESC, term LIMIT 100),
    rk AS (
      SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) AS x,
             LN(CAST(cnt AS DOUBLE)) AS y
      FROM top)
    SELECT ROUND(REGR_SLOPE(y, x), 6) AS slope,
           ROUND(REGR_INTERCEPT(y, x), 6) AS intercept,
           ROUND(POWER(CORR(y, x), 2), 6) AS r2,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM rk
    """,
)
def text_zipf_slope(spark, sf_dir):
    """Corpus-health Zipf fit: OLS of ln(count) on ln(rank) over the top-100
    terms.  Natural corpora fit slope ≈ −1; templated/deduplicated corpora
    drift.  One map-combined token count is the only full-corpus work; the
    regression runs on ≤ 100 rows."""
    from compss_python_spark.llm.text import zipf_fit

    return zipf_fit(table(spark, sf_dir, "documents"))


def _bpe_oracle_ctes(num_merges: int) -> str:
    """Unrolled-training CTE chain shared by both BPE oracles: wf (word
    frequencies), s0 (char states), then per round r: p{r} (weighted
    adjacent-pair counts), m{r} (deterministic argmax), s{r+1} (literal
    '(a)(b)'→'(ab)' state replace).  The same unrolling trick that oracles
    ml_logreg_gd — the SQL retrains the identical tokenizer."""
    parts = [
        r"""wf AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
            FROM documents)
      WHERE w <> '' AND w NOT LIKE '%(%' AND w NOT LIKE '%)%'
      GROUP BY w),
    s0 AS (SELECT word,
                  '(' || array_to_string(regexp_extract_all(word, '.'), ')(')
                      || ')(</w>)' AS state,
                  freq
           FROM wf)"""
    ]
    for r in range(num_merges):
        parts.append(
            f"""p{r} AS (
      SELECT syms[i.i] AS lhs, syms[i.i + 1] AS rhs,
             CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM (SELECT string_split(substring(state, 2, length(state) - 2),
                                ')(') AS syms,
                   freq
            FROM s{r}),
           UNNEST(range(1, len(syms))) i(i)
      GROUP BY 1, 2),
    m{r} AS (SELECT lhs, rhs, pair_count FROM p{r}
             ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    s{r + 1} AS (SELECT word,
                      replace(state, '(' || m.lhs || ')(' || m.rhs || ')',
                              '(' || m.lhs || m.rhs || ')') AS state,
                      freq
               FROM s{r}, m{r} m)"""
        )
    return ",\n    ".join(parts)


_BPE_MERGES = 6


def _bpe_train_oracle() -> str:
    rows = "\n     UNION ALL ".join(
        f"SELECT {r} AS merge_rank, lhs, rhs, pair_count FROM m{r}"
        for r in range(_BPE_MERGES)
    )
    return f"WITH {_bpe_oracle_ctes(_BPE_MERGES)}\n    {rows}"


def _bpe_subtokens_oracle() -> str:
    return f"""
    WITH {_bpe_oracle_ctes(_BPE_MERGES)},
    vocab AS (
      SELECT word,
             len(string_split(substring(state, 2, length(state) - 2),
                              ')(')) AS n_sub
      FROM s{_BPE_MERGES}),
    doc AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      FROM documents)
    SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS n_subtokens
    FROM doc JOIN vocab USING (word)
    GROUP BY doc_id
    """


@query("text_bpe_train_merges", sql=_bpe_train_oracle(), headline=True)
def text_bpe_train_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (Sennrich et al. 2016), the
    scalable shape: ONE corpus scan builds the vocabulary-sized word-freq
    table; each of the 6 merge rounds is a pair-count aggregate + 1-row
    argmax over that small table only.  The oracle unrolls all 6 rounds in
    SQL and retrains the identical tokenizer — every merge and its count
    is hash-checked."""
    from compss_python_spark.llm.bpe import bpe_train

    return bpe_train(table(spark, sf_dir, "documents"), num_merges=_BPE_MERGES)


@query("text_bpe_subtoken_count", sql=_bpe_subtokens_oracle())
def text_bpe_subtoken_count(spark, sf_dir):
    """Per-document token budget under the corpus-trained 6-merge BPE:
    segmentation is applied to the VOCABULARY (small, broadcast), and the
    corpus token stream joins that map — the 100 TB shape, since the
    expensive side never recomputes segmentation per occurrence."""
    from compss_python_spark.llm.bpe import bpe_doc_subtoken_counts, bpe_train

    docs = table(spark, sf_dir, "documents")
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(docs, num_merges=_BPE_MERGES).collect()
    ]
    return bpe_doc_subtoken_counts(docs, merges)


@query(
    "embedding_int8_quantize",
    headline=True,
    sql="""
    WITH scales AS (
      SELECT i.i AS pos, MAX(ABS(CAST(embedding[i.i] AS DOUBLE))) AS s
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) i(i)
      GROUP BY 1),
    sarr AS (SELECT list(s ORDER BY pos) AS scales FROM scales),
    q AS (
      SELECT vec_id,
             CAST(embedding[i.i] AS DOUBLE) AS v,
             scales[i.i] AS s,
             CASE WHEN scales[i.i] = 0 THEN 0.0
                  ELSE GREATEST(-127.0, LEAST(127.0,
                       ROUND(CAST(embedding[i.i] AS DOUBLE)
                             / scales[i.i] * 127.0))) END AS q
      FROM embeddings CROSS JOIN sarr,
           UNNEST(range(1, len(embedding) + 1)) i(i))
    SELECT vec_id,
           CAST(SUM(CAST(ABS(q) AS BIGINT)) AS BIGINT) AS sum_abs_q,
           CAST(SUM(CAST(q * q AS BIGINT)) AS BIGINT) AS sum_sq_q,
           CAST(SUM(CASE WHEN ABS(q) = 127.0 THEN 1 ELSE 0 END) AS INT) AS n_sat,
           ROUND(MAX(ABS(v - q * s / 127.0)), 12) AS max_abs_err
    FROM q GROUP BY vec_id
    """,
)
def embedding_int8_quantize(spark, sf_dir):
    """Symmetric per-dimension int8 quantization of the embedding corpus
    with reconstruction-error stats.  Scale pass = one narrow posexplode +
    map-combined per-dim max reassembled into ONE broadcast row (no driver
    collect); quantization is a zero-shuffle zip_with.  Outputs are
    order-independent (integer sums + max error) so the oracle is
    hash-exact."""
    from compss_python_spark.llm.similarity import int8_quantize_stats

    return int8_quantize_stats(table(spark, sf_dir, "embeddings"))


@query(
    "llm_domain_cap",
    sql="""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
      FROM documents)
    SELECT doc_id, source, CAST(pick_rank AS INT) AS pick_rank
    FROM ranked WHERE pick_rank <= 10
    """,
)
def llm_domain_cap(spark, sf_dir):
    """Max-N-docs-per-domain crawl rule: deterministic md5-draw top-10 per
    source.  WindowGroupLimit prunes the rank filter map-side, bounding a
    mega-domain's shuffle contribution to cap×partitions."""
    from compss_python_spark.llm.sampling import domain_cap

    docs = table(spark, sf_dir, "documents")
    return domain_cap(docs, "source", "doc_id", cap=10).select(
        "doc_id", "source", "pick_rank"
    )


@query(
    "llm_weighted_sample",
    sql="""
    WITH pr AS (
      SELECT doc_id, n_chars,
             POWER(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                        AS BIGINT) / 281474976710656.0,
                   1.0 / n_chars) AS p
      FROM documents)
    SELECT doc_id, n_chars,
           CAST(ROW_NUMBER() OVER (ORDER BY p DESC, doc_id) AS INT)
             AS sample_rank
    FROM pr ORDER BY p DESC, doc_id LIMIT 100
    """,
)
def llm_weighted_sample(spark, sf_dir):
    """Derandomized Efraimidis–Spirakis weighted sampling without
    replacement: top-100 documents by priority u^(1/n_chars), u =
    md5-uniform(doc_id) — longer documents proportionally likelier.
    TakeOrdered top-k (per-partition heaps), rank window only on the 100
    survivors."""
    from compss_python_spark.llm.sampling import weighted_sample

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, "doc_id", "n_chars", k=100)


@query(
    "llm_dsir_select",
    headline=True,
    sql=r"""
    WITH tok AS (
      SELECT doc_id, lang, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t
      FROM documents WHERE text IS NOT NULL),
    g AS (
      SELECT doc_id, lang, unnest(list_concat(
               t,
               CASE WHEN LEN(t) < 2 THEN [ARRAY_TO_STRING(t, ' ')]
                    ELSE list_transform(range(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
               END)) AS gram
      FROM tok),
    gb AS (SELECT doc_id, lang,
                  CAST('0x' || substr(md5(gram), 1, 12) AS BIGINT) % 512 AS b
           FROM g),
    tb AS (SELECT b, COUNT(*) AS tc FROM gb WHERE lang = 'en' GROUP BY b),
    rb AS (SELECT b, COUNT(*) AS rc FROM gb GROUP BY b),
    llr AS (
      SELECT rb.b,
             LN((COALESCE(tb.tc, 0) + 1.0)
                / ((SELECT COALESCE(SUM(tc), 0) FROM tb) + 512.0))
             - LN((rb.rc + 1.0) / ((SELECT SUM(rc) FROM rb) + 512.0)) AS w
      FROM rb LEFT JOIN tb ON rb.b = tb.b),
    dc AS (SELECT doc_id, b, COUNT(*) AS n FROM gb GROUP BY doc_id, b),
    dw AS (
      SELECT dc.doc_id, ROUND(SUM(dc.n * llr.w), 6) AS log_weight
      FROM dc JOIN llr ON dc.b = llr.b GROUP BY dc.doc_id),
    topk AS (SELECT doc_id, log_weight FROM dw
             ORDER BY log_weight DESC, doc_id LIMIT 100)
    SELECT doc_id, log_weight,
           CAST(ROW_NUMBER() OVER (ORDER BY log_weight DESC, doc_id) AS INT)
             AS rank
    FROM topk
    """,
)
def llm_dsir_select(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): top-100 raw documents whose
    hashed unigram+bigram bucket profile is most English-target-like
    (target = lang='en' slice, raw = whole corpus).  The md5 bucket hash
    and the add-1-smoothed bucket models are recomputed verbatim in SQL —
    hash parity covers the feature hash, both bucket models, the per-doc
    log-likelihood-ratio sum, and the deterministic top-k."""
    from compss_python_spark.llm.sampling import dsir_select

    docs = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return dsir_select(
        docs, docs.filter(F.col("lang") == "en"), k=100, num_buckets=512
    )


@query(
    "text_top_keywords",
    sql=r"""
    WITH tf AS (
      SELECT doc_id, u.term, COUNT(*) AS tf
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents) d, UNNEST(d.t) u(term)
      WHERE u.term <> ''
      GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term,
             ROUND(tf * (LN((n_docs + 1) / (df + 1.0)) + 1.0), 6) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, term) AS INT) AS kw_rank
      FROM scored)
    SELECT doc_id, term, score, kw_rank FROM ranked WHERE kw_rank <= 3
    """,
)
def text_top_keywords(spark, sf_dir):
    """Per-document TF-IDF keyword extraction (top-3 terms, smoothed idf,
    deterministic tie-break).  Corpus size is a broadcast 1-row aggregate;
    the per-doc top-k window is map-side pruned (WindowGroupLimit)."""
    from compss_python_spark.llm.text import top_keywords

    return top_keywords(table(spark, sf_dir, "documents"), k=3)


@query(
    "text_bigram_pmi",
    sql=r"""
    WITH tok AS (
      SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
    ps AS (
      SELECT t[i.i] AS w1, t[i.i + 1] AS w2
      FROM tok, UNNEST(range(1, len(t))) i(i)
      WHERE len(t) >= 2),
    pairs AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
              FROM ps GROUP BY 1, 2),
    lm AS (SELECT w1, SUM(c_ab) AS c_a FROM pairs GROUP BY 1),
    rm AS (SELECT w2, SUM(c_ab) AS c_b FROM pairs GROUP BY 1),
    tot AS (SELECT SUM(c_ab) AS t FROM pairs),
    scored AS (
      SELECT w1, w2, c_ab,
             ROUND(LN(c_ab * tot.t / (c_a * c_b)), 6) AS pmi
      FROM pairs JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot
      WHERE c_ab >= 5),
    topn AS (SELECT * FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 50)
    SELECT w1, w2, c_ab, pmi,
           CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS INT)
             AS pmi_rank
    FROM topn
    """,
)
def text_bigram_pmi(spark, sf_dir):
    """Collocation mining: PMI of adjacent token pairs (min count 5,
    top-50).  One corpus scan builds the pair table; marginals and the
    total are aggregates OF that vocabulary-sized table; top-N is
    TakeOrdered."""
    from compss_python_spark.llm.text import bigram_pmi

    return bigram_pmi(table(spark, sf_dir, "documents"))


@query(
    "text_source_similarity",
    sql=r"""
    WITH vocab AS (
      SELECT DISTINCT source AS g, u.term
      FROM (SELECT source, string_split_regex(trim(text), '\s+') AS t
            FROM documents) d, UNNEST(d.t) u(term)
      WHERE u.term <> ''),
    sizes AS (SELECT g, COUNT(*) AS n FROM vocab GROUP BY 1),
    inter AS (
      SELECT a.g AS src_a, b.g AS src_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM vocab a JOIN vocab b ON a.term = b.term AND a.g < b.g
      GROUP BY 1, 2)
    SELECT src_a, src_b, n_common,
           ROUND(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = src_a
    JOIN sizes sb ON sb.g = src_b
    """,
)
def text_source_similarity(spark, sf_dir):
    """Pairwise vocabulary Jaccard between sources (corpus-slice
    comparison): distinct (source, term) projection, term-keyed
    intersection join (fan-out bounded by slice count), broadcast size
    lookups."""
    from compss_python_spark.llm.text import source_vocabulary_jaccard

    return source_vocabulary_jaccard(table(spark, sf_dir, "documents"))


@query(
    "llm_quality_buckets",
    sql=r"""
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS n_tok,
             LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS non_space,
             LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS alpha
      FROM documents),
    q AS (
      SELECT doc_id, lang, n_chars,
             ROUND((LEAST(n_tok / 20.0, 1.0)
                    + CASE WHEN non_space / GREATEST(n_tok, 1) BETWEEN 3 AND 12
                           THEN 1.0 ELSE 0.0 END
                    + alpha / GREATEST(non_space, 1)) / 3.0, 6) AS quality
      FROM s),
    b AS (
      SELECT *, NTILE(10) OVER (ORDER BY quality, doc_id) AS bucket FROM q)
    SELECT bucket, COUNT(*) AS n_docs,
           ROUND(MIN(quality), 6) AS q_min,
           ROUND(MAX(quality), 6) AS q_max,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY bucket
    """,
)
def llm_quality_buckets(spark, sf_dir):
    """Curriculum/mixing buckets: quality-score deciles over the corpus
    (exact NTILE semantics via the distributed range-partitioned prefix
    sum — no single-partition window) with per-bucket size and char
    budget.  The standard input to quality-weighted training mixes."""
    from compss_python_spark.llm.text import quality_score
    from compss_python_spark.operators.aggregation import ntile_distributed

    docs = quality_score(table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_chars", "quality"
    )
    b = ntile_distributed(docs, ["quality", "doc_id"], 10, "bucket")
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.round(F.min("quality"), 6).alias("q_min"),
        F.round(F.max("quality"), 6).alias("q_max"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "dedup_survivors_best_quality",
    sql=r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok
    ),
    mh AS (
      SELECT doc_id, g.j AS seed,
             MIN(CAST('0x' || substr(md5(u.sg || '#' || g.j), 1, 12) AS BIGINT)) AS mh
      FROM sh, UNNEST(sh.s) AS u(sg), generate_series(0, 15) AS g(j)
      GROUP BY doc_id, g.j
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b.b AS band,
             array_to_string(list_slice(sig, b.b * 4 + 1, b.b * 4 + 4), ',') AS bkey
      FROM sig, generate_series(0, 3) AS b(b)
    ),
    bsz AS (SELECT band, bkey, COUNT(*) AS n FROM banded GROUP BY band, bkey),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      JOIN bsz ON bsz.band = a.band AND bsz.bkey = a.bkey AND bsz.n <= 1000
    ),
    agree AS (
      SELECT c.id_a, c.id_b, SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS na
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.id_a
      JOIN mh mb ON mb.doc_id = c.id_b AND mb.seed = ma.seed
      GROUP BY c.id_a, c.id_b
    ),
    e0 AS (SELECT id_a, id_b FROM agree WHERE ROUND(na / 16.0, 6) >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM e0
              UNION SELECT id_b, id_a FROM e0),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    qs AS (
      SELECT doc_id,
             ROUND((LEAST(len(t) / 20.0, 1.0)
                    + CASE WHEN non_space / GREATEST(len(t), 1) BETWEEN 3 AND 12
                           THEN 1.0 ELSE 0.0 END
                    + alpha / GREATEST(non_space, 1)) / 3.0, 6) AS quality
      FROM (SELECT doc_id, t,
                   LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS non_space,
                   LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS alpha
            FROM tok JOIN documents USING (doc_id))
    )
    SELECT component,
           FIRST(node ORDER BY quality DESC, node) AS survivor,
           FIRST(quality ORDER BY quality DESC, node) AS survivor_quality,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM comp JOIN qs ON qs.doc_id = comp.node
    GROUP BY component
    """,
)
def dedup_survivors_best_quality(spark, sf_dir):
    """Quality-aware near-dup survivor selection: the md5-oracled
    LSH→CC pipeline, but each cluster keeps its HIGHEST-quality member
    (tie → min id) instead of min-id — what production corpus dedup
    actually ships.  The argmax is a map-combinable max(struct(quality,
    -node)) — no per-component sort window; the oracle re-derives the
    entire pipeline plus the quality formula."""
    from compss_python_spark.graph.components import connected_components
    from compss_python_spark.llm.text import quality_score

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs_md5(
        docs, num_hashes=16, bands=4, threshold=0.5
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    q = quality_score(docs).select(F.col("doc_id").alias("node"), "quality")
    j = comp.join(q, "node")
    best = F.max(F.struct(F.col("quality"), (-F.col("node")).alias("_nn")))
    return (
        j.groupBy("component")
        .agg(best.alias("_b"), F.count("*").alias("n_members"))
        .select(
            "component",
            (-F.col("_b._nn")).alias("survivor"),
            F.col("_b.quality").alias("survivor_quality"),
            "n_members",
        )
    )


@query(
    "multimodal_wav_decimate",
    sql="""
    WITH w AS (
      SELECT doc_id, 1 + doc_id % 2 AS ch, 32 + doc_id % 97 AS n
      FROM documents WHERE doc_id % 3 = 2
    ),
    s AS (
      SELECT w.doc_id,
             ((w.doc_id * 31 + (k.k * 4 * w.ch) * 7919) % 65536) - 32768 AS v
      FROM w, UNNEST(range(0, (w.n + 3) // 4)) AS k(k)
    )
    SELECT doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST(SUM(v) AS BIGINT) AS sum_pcm,
           CAST(SUM(v * v) AS BIGINT) AS sumsq_pcm,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak
    FROM s GROUP BY 1
    """,
)
def multimodal_wav_decimate(spark, sf_dir):
    """Audio decimation (every 4th channel-0 frame) over REAL decoded
    RIFF/WAVE payloads, exact-integer stats.  The oracle regenerates the
    decimated stream from the synthesis closed form (decimated frame k =
    interleaved sample k·4·ch), so a hash match proves container walk +
    PCM decode + stride selection byte-for-byte."""
    media = multimodal.synthesize_real_media(table(spark, sf_dir, "documents"))
    wavs = media.filter(F.col("media_id") % 3 == 2)
    return multimodal.wav_decimate_stats(wavs, factor=4)


@query(
    "embedding_random_projection",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    planes AS (
      SELECT p.p AS pl,
             list_transform(range(0, 64),
               d -> CAST('0x' || substr(md5(concat(7, ':', p.p, ':', d)), 1, 12)
                         AS BIGINT) / 140737488355328.0 - 1.0) AS h
      FROM generate_series(0, 7) p(p)),
    pr AS (
      SELECT v.vec_id, pl.pl,
             CAST(ROUND(ROUND(list_dot_product(v.e, pl.h) / SQRT(8.0), 5)
                        * 100000) AS BIGINT) AS x
      FROM v, planes pl)
    SELECT vec_id,
           string_agg(CAST(x AS VARCHAR), ',' ORDER BY pl) AS proj_csv
    FROM pr GROUP BY vec_id
    """,
)
def embedding_random_projection(spark, sf_dir):
    """Johnson–Lindenstrauss projection 64→8 dims with md5-portable
    hyperplanes (scaled 1/√8): zero-shuffle literal-plane dot products;
    the oracle recomputes every plane component and projection
    bit-for-bit.  The projection is serialized as a CSV of 1e5-scaled
    integers (the repo's sig_csv convention): the driver's canonicalizer
    sorts raw cells and cannot hash Python lists, and integer text is the
    only float encoding stable across Spark and DuckDB formatting."""
    from compss_python_spark.llm.similarity import random_projection

    proj = random_projection(table(spark, sf_dir, "embeddings"), out_dim=8)
    return proj.select(
        "vec_id",
        F.array_join(
            F.transform(
                "proj",
                lambda x: F.round(x * F.lit(100000.0), 0).cast("long").cast("string"),
            ),
            ",",
        ).alias("proj_csv"),
    )


@query(
    "text_bm25_topk",
    sql=r"""
    WITH q(query_id, term) AS (
      VALUES (1, 'hash'), (1, 'join'),
             (2, 'vector'), (2, 'scan'), (2, 'batch')),
    tf AS (
      SELECT doc_id, u.term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents) d, UNNEST(d.t) u(term)
      WHERE u.term <> ''
      GROUP BY 1, 2),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
    consts AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
      WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             ROUND(SUM(
               LN(1.0 + (consts.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / consts.avgdl))
             ), 6) AS score
      FROM tf JOIN q USING (term) JOIN dfreq USING (term)
              JOIN dl USING (doc_id) CROSS JOIN consts
      GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, doc_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM scored)
    SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 5
    """,
)
def text_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval: top-5 documents for two literal keyword
    queries (k1=1.2, b=0.75, Lucene non-negative idf).  One corpus scan
    builds the (doc, term, tf) table; doc length / N / avgdl are
    aggregates OF that table; the query set broadcasts, so only the query
    terms' posting lists reach the score aggregate; per-query top-k is a
    WindowGroupLimit."""
    from compss_python_spark.llm.retrieval import bm25_topk

    queries = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "vector"), (2, "scan"), (2, "batch")],
        "query_id int, term string",
    )
    return bm25_topk(table(spark, sf_dir, "documents"), queries, k=5)


@query(
    "er_supplier_entities",
    oracle_cost="superlinear",  # recursive-CTE transitive closure over ER pairs: capped at 600s at sfgen10
    sql="""
    WITH RECURSIVE names AS (SELECT DISTINCT s_name FROM supplier),
    base AS (
      SELECT a.s_name AS src, b.s_name AS dst
      FROM names a JOIN names b ON a.s_name < b.s_name
      WHERE levenshtein(a.s_name, b.s_name) <= 1
    ),
    edges AS (SELECT src, dst FROM base UNION SELECT dst, src FROM base),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT n.s_name AS name,
           COALESCE(c.component, n.s_name) AS entity_id
    FROM names n LEFT JOIN comp c ON c.node = n.s_name
    """,
)
def er_supplier_entities(spark, sf_dir):
    """Record-linkage entity resolution: fuzzy name match (Levenshtein
    <= 1 via ED-Join q-gram prefix candidates — never the all-pairs
    product) -> connected components over the match graph -> min-name
    entity id per cluster; singletons keep their own name.  The
    brute-force + recursive-closure oracle proves BOTH zero candidate
    recall loss and the component labels.  The classic MDM dedup shape:
    at 100 TB the only corpus-sized shuffle is the distinct-name dedup."""
    from compss_python_spark.graph.components import connected_components
    from compss_python_spark.llm.dedup import fuzzy_string_pairs

    sup = table(spark, sf_dir, "supplier")
    pairs = fuzzy_string_pairs(sup, "s_name", max_distance=1, q=2)
    comp = connected_components(pairs, "s_a", "s_b")
    names = sup.select(F.col("s_name").alias("name")).distinct()
    return names.join(
        comp, names.name == comp.node, "left"
    ).select("name", F.coalesce("component", "name").alias("entity_id"))


@query(
    "llm_mixture_allocation",
    sql=r"""
    WITH av AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
               AS available
      FROM documents WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
    t AS (
      SELECT source, available,
             CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 2.0
                         WHEN 'src2' THEN 4.0 END AS weight
      FROM av),
    t2 AS (SELECT *, available / weight AS r FROM t),
    t3 AS (
      SELECT *,
             SUM(available) OVER (ORDER BY r, source
               ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(weight) OVER (ORDER BY r, source
               ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(available) OVER () AS ta,
             SUM(weight) OVER () AS tw
      FROM t2),
    t4 AS (
      SELECT *, CASE WHEN tw - cw > 0
                     THEN (LEAST(6000.0, ta) - ca) / (tw - cw) END AS lam_i
      FROM t3),
    t5 AS (
      SELECT *, CASE WHEN lam_i IS NOT NULL THEN r <= lam_i
                     ELSE 6000.0 >= ta END AS sat
      FROM t4),
    t6 AS (
      SELECT *, COALESCE(MAX(CASE WHEN sat THEN lam_i END) OVER (),
                         LEAST(6000.0, ta) / tw) AS lam
      FROM t5)
    SELECT source, available, weight,
           ROUND(LEAST(available, lam * weight), 6) AS allocation,
           sat AS saturated
    FROM t6
    """,
)
def llm_mixture_allocation(spark, sf_dir):
    """Water-filling training-mix allocation: 6000 tokens across three
    sources at weights 1/2/4, capped by availability, surplus
    redistributed weight-proportionally (closed form, no iteration).  ONE
    map-combined token aggregate reduces the corpus; every window runs on
    the source-cardinality table."""
    from compss_python_spark.llm.sampling import mixture_allocation
    from compss_python_spark.llm.text import token_count

    docs = table(spark, sf_dir, "documents")
    return mixture_allocation(
        docs, "source", token_count("text"),
        {"src0": 1.0, "src1": 2.0, "src2": 4.0}, budget=6000.0,
    )


@query(
    "multimodal_image_ahash",
    sql="""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 25 AS w, 8 + doc_id % 17 AS h,
             doc_id % 64 AS s
      FROM documents),
    g AS (
      SELECT doc_id, w, h,
             j.j * 8 + i.i AS b,
             ((i.i * w) // 8) + 2 * ((j.j * h) // 8) + 3 + s AS samp
      FROM p, UNNEST(range(0, 8)) i(i), UNNEST(range(0, 8)) j(j)),
    m AS (SELECT doc_id, AVG(CAST(samp AS DOUBLE)) AS mu FROM g GROUP BY 1),
    bits AS (
      SELECT g.doc_id, g.w, g.h, g.b,
             CASE WHEN g.samp >= m.mu THEN 1 ELSE 0 END AS bit
      FROM g JOIN m USING (doc_id))
    SELECT doc_id AS media_id,
           CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
           CAST(SUM(CASE WHEN b >= 32
                         THEN bit * (CAST(1 AS BIGINT) << (b - 32))
                         ELSE 0 END) AS BIGINT) AS hash_hi,
           CAST(SUM(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << b)
                         ELSE 0 END) AS BIGINT) AS hash_lo
    FROM bits GROUP BY doc_id
    """,
)
def multimodal_image_ahash(spark, sf_dir):
    """Perceptual average-hash over REAL decoded PNG pixels: decode ->
    grayscale -> 8x8 nearest-neighbor downsample -> mean threshold -> 64
    bits.  The oracle recomputes every bit from the synthesized images'
    closed pixel form (gray(x,y) = x + 2y + 3 + seed), so a hash match
    proves decode, downsample indexing, the mean and the bit packing.
    Split into unsigned 32-bit halves for engine-portable integers."""
    media = multimodal.synthesize_pixel_media(table(spark, sf_dir, "documents"))
    ah = multimodal.image_ahash(media)
    return ah.select(
        "media_id",
        "width",
        "height",
        F.shiftrightunsigned("ahash", 32).alias("hash_hi"),
        F.col("ahash").bitwiseAND(F.lit((1 << 32) - 1)).alias("hash_lo"),
    )


@query(
    "multimodal_ahash_pair_stats",
    sql="""
    WITH p AS (
      SELECT doc_id, 8 + doc_id % 25 AS w, 8 + doc_id % 17 AS h,
             doc_id % 64 AS s
      FROM documents),
    g AS (
      SELECT doc_id, j.j * 8 + i.i AS b,
             ((i.i * w) // 8) + 2 * ((j.j * h) // 8) + 3 + s AS samp
      FROM p, UNNEST(range(0, 8)) i(i), UNNEST(range(0, 8)) j(j)),
    m AS (SELECT doc_id, AVG(CAST(samp AS DOUBLE)) AS mu FROM g GROUP BY 1),
    hh AS (
      SELECT g.doc_id,
             SUM(CASE WHEN b >= 32
                      THEN (CASE WHEN samp >= mu THEN 1 ELSE 0 END)
                           * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS hi,
             SUM(CASE WHEN b < 32
                      THEN (CASE WHEN samp >= mu THEN 1 ELSE 0 END)
                           * (CAST(1 AS BIGINT) << b) ELSE 0 END) AS lo
      FROM g JOIN m USING (doc_id) GROUP BY g.doc_id),
    pairs AS (
      SELECT bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
               AS hamming
      FROM hh a JOIN hh b ON a.doc_id < b.doc_id)
    SELECT CAST(hamming AS INT) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs WHERE hamming <= 6 GROUP BY 1
    """,
)
def multimodal_ahash_pair_stats(spark, sf_dir):
    """Image near-duplicate histogram: banded aHash candidates (8 bands
    of 8 bits — pigeonhole-lossless for hamming <= 6) verified by
    bit_count(xor), reduced to (hamming, n_pairs).  The oracle brute-
    forces ALL pairs from the closed-form hashes, so a match proves the
    banding lost no pair.  ONE bucket shuffle, never the image-pair
    product."""
    media = multimodal.synthesize_pixel_media(table(spark, sf_dir, "documents"))
    ah = multimodal.image_ahash(media)
    return multimodal.ahash_pair_stats(ah, max_hamming=6, bands=8)


@query(
    "multimodal_wav_fingerprint",
    sql="""
    WITH w AS (
      SELECT doc_id, 1 + doc_id % 2 AS ch, 32 + doc_id % 97 AS ns
      FROM documents WHERE doc_id % 3 = 2
    ),
    s AS (
      SELECT doc_id, i.i AS s,
             ((doc_id * 31 + (i.i * ch) * 7919) % 65536) - 32768 AS v
      FROM w, UNNEST(range(0, ns)) i(i)
    ),
    e AS (
      SELECT doc_id, s // 16 AS frame_idx, SUM(v * v) AS energy
      FROM s GROUP BY 1, 2
    ),
    l AS (
      SELECT doc_id, frame_idx, energy,
             LAG(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pe
      FROM e
    )
    SELECT doc_id AS media_id,
           CAST(MAX(frame_idx) + 1 AS INT) AS n_frames,
           CAST(COALESCE(SUM(CASE WHEN pe IS NOT NULL AND energy > pe
                    THEN CAST(1 AS BIGINT) << (frame_idx - 1)
                    ELSE 0 END), 0) AS BIGINT) AS fingerprint
    FROM l GROUP BY doc_id
    """,
)
def multimodal_wav_fingerprint(spark, sf_dir):
    """Energy-delta audio fingerprint over REAL decoded PCM: frame
    energies (one Arrow decode pass) -> lag window -> sign-of-delta bits
    packed into a 64-bit key.  The oracle recomputes every frame energy
    and bit from the waveform's closed form, so a match proves decode,
    framing, the delta rule and the packing."""
    media = multimodal.synthesize_real_media(table(spark, sf_dir, "documents"))
    wav = media.filter(F.col("media_id") % 3 == 2)
    return multimodal.wav_fingerprint(wav)
