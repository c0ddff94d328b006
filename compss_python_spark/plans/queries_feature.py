"""Declared queries: ML feature-engineering operators (SURVEY.md §2.8
#45–55) plus the four estimators VERDICT r1 flagged as test-only
(DBSCAN #57, GaussianNB #58, LinearSVC #61, AssociationRules #64).

Each query drives the public operator layer end-to-end and carries a DuckDB
oracle that re-derives the same transform from first principles (the
pattern established by `ml_tfidf_norm_exact`), so silent semantic drift —
indexing order, scaling denominator, rule confidence — is caught by the
driver, not just by unit tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from compss_python_spark.plans.registry import query, table


# --- tokenization ----------------------------------------------------------


@query(
    "ml_tokenizer",
    sql=r"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    SELECT doc_id, len(toks) AS n_tokens, array_to_string(toks, '|') AS tok_str
    FROM t
    """,
)
def ml_tokenizer(spark, sf_dir):
    """Tokenizer (#45): lowercase + whitespace split.  The corpus has
    single-space-separated text (no doubled/leading/trailing whitespace), so
    the oracle's split-on-space is exactly Spark's split-on-\\s."""
    from compss_python_spark.ml.feature import tokenizer

    out = tokenizer(table(spark, sf_dir, "documents"), "text", "tokens")
    return out.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.array_join("tokens", "|").alias("tok_str"),
    )


_STOPS = ["the", "a", "of", "and", "to", "in"]


@query(
    "ml_stopwords_ngram",
    sql=rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> length(x) >= 1) AS toks
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             list_filter(toks, x -> x NOT IN ({", ".join(f"'{w}'" for w in _STOPS)})) AS kept
      FROM t
    )
    SELECT doc_id, len(kept) AS n_kept,
           CASE WHEN len(kept) < 2 THEN ''
                ELSE array_to_string(list_transform(range(1, len(kept)),
                                     i -> kept[i] || ' ' || kept[i+1]), '|') END AS bigrams
    FROM f
    """,
)
def ml_stopwords_ngram(spark, sf_dir):
    """RegexTokenizer (#45) → RemoveStopWords (#46, custom list) → NGram
    (#47, n=2).  Oracle rebuilds the same pipeline with DuckDB list lambdas
    (NGram emits [] for <2 tokens → '' after join)."""
    from compss_python_spark.ml.feature import ngram, regex_tokenizer, remove_stop_words

    docs = regex_tokenizer(
        table(spark, sf_dir, "documents"), "text", "tokens", pattern=r"\s+"
    )
    kept = remove_stop_words(docs, "tokens", "kept", stop_words=_STOPS)
    out = ngram(kept, "kept", n=2, output_col="bigrams")
    return out.select(
        "doc_id",
        F.size("kept").alias("n_kept"),
        F.array_join("bigrams", "|").alias("bigrams"),
    )


@query(
    "ml_count_vectorizer",
    sql=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> length(x) >= 1) AS toks
      FROM documents
    )
    SELECT doc_id,
           len(list_filter(toks, x -> x = 'data'))::BIGINT AS n_data,
           len(list_filter(toks, x -> x = 'spark'))::BIGINT AS n_spark,
           len(list_distinct(toks))::BIGINT AS n_distinct,
           len(toks)::BIGINT AS n_total
    FROM t
    """,
)
def ml_count_vectorizer(spark, sf_dir):
    """CountVectorizer (#48): full-vocab fit; per-doc counts of two fixed
    terms read back through the fitted vocabulary's index (validates the
    term→index→count path), plus L0/L1 of the tf vector (distinct/total
    token counts)."""
    from compss_python_spark.ml.feature import count_vectorizer, regex_tokenizer

    docs = regex_tokenizer(
        table(spark, sf_dir, "documents"), "text", "tokens", pattern=r"\s+"
    )
    out, model = count_vectorizer(docs, "tokens", "tf")
    vocab = {t: i for i, t in enumerate(model.vocabulary)}
    tf = F.col("tf")

    def term_count(term: str):
        if term not in vocab:
            return F.lit(0).cast("long")
        return F.element_at(tf, vocab[term] + 1).cast("long")

    return out.select(
        "doc_id",
        term_count("data").alias("n_data"),
        term_count("spark").alias("n_spark"),
        F.size(F.filter(tf, lambda v: v > 0)).cast("long").alias("n_distinct"),
        F.aggregate(tf, F.lit(0.0), lambda a, v: a + v).cast("long").alias("n_total"),
    )


# --- categorical encodings -------------------------------------------------


@query(
    "ml_string_indexer",
    sql="""
    WITH r AS (
      SELECT lang, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, lang ASC) - 1 AS idx
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, CAST(r.idx AS INT) AS lang_idx, d.lang AS lang_back
    FROM documents d JOIN r USING (lang)
    """,
)
def ml_string_indexer(spark, sf_dir):
    """StringIndexer (#50, frequencyDesc with alphabetic tie-break) +
    IndexToString round-trip (lang_back == lang)."""
    from compss_python_spark.ml.feature import index_to_string, string_indexer

    out, model = string_indexer(table(spark, sf_dir, "documents"), "lang", "lang_idx")
    out = index_to_string(out, "lang_idx", list(model.labels), "lang_back")
    return out.select(
        "doc_id", "lang", F.col("lang_idx").cast("int").alias("lang_idx"), "lang_back"
    )


@query(
    "ml_onehot",
    sql="""
    WITH r AS (
      SELECT lang, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, lang ASC) - 1 AS idx
      FROM documents GROUP BY lang
    ),
    n AS (SELECT COUNT(*) AS n_langs FROM r)
    SELECT d.doc_id, CAST((SELECT n_langs FROM n) AS INT) AS oh_size,
           CAST(r.idx AS INT) AS hot_idx
    FROM documents d JOIN r USING (lang)
    """,
)
def ml_onehot(spark, sf_dir):
    """OneHotEncoder (#52, dropLast=False) over the StringIndexer output:
    vector length = #categories, the hot position = the category index."""
    from compss_python_spark.ml.feature import one_hot_encode, string_indexer

    idx, _m = string_indexer(table(spark, sf_dir, "documents"), "lang", "lang_idx")
    out, _ohm = one_hot_encode(idx, "lang_idx", "oh")
    return out.select(
        "doc_id",
        F.size("oh").cast("int").alias("oh_size"),
        (F.array_position(F.col("oh"), 1.0) - 1).cast("int").alias("hot_idx"),
    )


@query(
    "ml_binarizer",
    sql="""
    SELECT doc_id, CAST(CASE WHEN n_chars > 200 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS bin
    FROM documents
    """,
)
def ml_binarizer(spark, sf_dir):
    """Binarizer (#51): threshold at 200 chars."""
    from compss_python_spark.ml.feature import binarizer

    out = binarizer(table(spark, sf_dir, "documents"), "n_chars", threshold=200.0, output_col="bin")
    return out.select("doc_id", "bin")


# --- scalers ---------------------------------------------------------------

_DIM = 64


def _scaler_sql(scaled_expr: str) -> str:
    """Shared oracle skeleton: per-dim stats via generate_series, then the
    per-row (first-dim value, L1 over dims) pair from ``scaled_expr``."""
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    stats AS (
      SELECT g.j,
             MIN(e[g.j]) AS mn, MAX(e[g.j]) AS mx,
             AVG(e[g.j]) AS mu, STDDEV_SAMP(e[g.j]) AS sd,
             MAX(ABS(e[g.j])) AS mxabs
      FROM v CROSS JOIN generate_series(1, {_DIM}) AS g(j)
      GROUP BY g.j
    ),
    scaled AS (
      SELECT v.vec_id, s.j, {scaled_expr} AS sc
      FROM v CROSS JOIN stats s
    )
    SELECT vec_id,
           ROUND(MAX(CASE WHEN j = 1 THEN sc END), 6) AS s0,
           ROUND(SUM(sc), 4) AS s_l1
    FROM scaled GROUP BY vec_id
    """


def _scaled_pair(out):
    sc = F.col("scaled")
    return out.select(
        "vec_id",
        F.round(F.element_at(sc, 1), 6).alias("s0"),
        F.round(F.aggregate(sc, F.lit(0.0), lambda a, x: a + x), 4).alias("s_l1"),
    )


@query("ml_minmax_scaler", sql=_scaler_sql("(v.e[s.j] - s.mn) / (s.mx - s.mn)"))
def ml_minmax_scaler(spark, sf_dir):
    """MinMaxScaler (#53): (x − min)/(max − min) per feature, default [0,1]."""
    from compss_python_spark.ml.feature import min_max_scaler

    out, _m = min_max_scaler(table(spark, sf_dir, "embeddings"), "embedding", "scaled")
    return _scaled_pair(out)


@query("ml_maxabs_scaler", sql=_scaler_sql("v.e[s.j] / s.mxabs"))
def ml_maxabs_scaler(spark, sf_dir):
    """MaxAbsScaler (#53): x / max|x| per feature."""
    from compss_python_spark.ml.feature import max_abs_scaler

    out, _m = max_abs_scaler(table(spark, sf_dir, "embeddings"), "embedding", "scaled")
    return _scaled_pair(out)


@query("ml_standard_scaler", sql=_scaler_sql("(v.e[s.j] - s.mu) / s.sd"))
def ml_standard_scaler(spark, sf_dir):
    """StandardScaler (#53, withMean, withStd): z-score with the SAMPLE
    standard deviation (Spark's documented convention — the oracle's
    STDDEV_SAMP pins it)."""
    from compss_python_spark.ml.feature import standard_scaler

    out, _m = standard_scaler(table(spark, sf_dir, "embeddings"), "embedding", "scaled")
    return _scaled_pair(out)


@query(
    "ml_poly_expansion",
    sql="""
    WITH v AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    )
    SELECT vec_id, ROUND(x, 6) + 0.0 AS p1, ROUND(x*x, 6) + 0.0 AS p2,
           ROUND(y, 6) + 0.0 AS p3,
           ROUND(x*y, 6) + 0.0 AS p4, ROUND(y*y, 6) + 0.0 AS p5
    FROM v
    """,
)
def ml_poly_expansion(spark, sf_dir):
    """PolynomialExpansion (#55, degree 2) on the first two embedding dims:
    expansion order for (x, y) is [x, x², y, xy, y²].  Both sides add +0.0
    AFTER the round: a cross-term x*y with a tiny negative factor rounds to
    −0.0 in one engine and +0.0 in the other (caught at sfgen10 density,
    1/20000 rows on p4); IEEE −0.0 + 0.0 = +0.0 normalizes the sign."""
    from compss_python_spark.ml.feature import polynomial_expansion

    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice(F.col("embedding").cast("array<double>"), 1, 2).alias("xy")
    )
    out = polynomial_expansion(base, "xy", degree=2, output_col="poly")
    p = F.col("poly")
    return out.select(
        "vec_id",
        *[
            (F.round(F.element_at(p, i + 1), 6) + F.lit(0.0)).alias(f"p{i + 1}")
            for i in range(5)
        ],
    )


@query("ml_pca_project", sql=None)
def ml_pca_project(spark, sf_dir):
    """PCA (#54, k=3) projection — eigenvector sign/rotation is
    engine-internal → rows-only; variance ordering asserted in tests."""
    from compss_python_spark.ml.feature import pca

    out, _m = pca(table(spark, sf_dir, "embeddings"), "embedding", k=3, output_col="pc")
    return out.select("vec_id", F.round(F.element_at("pc", 1), 6).alias("pc1"))


@query(
    "ml_pca_project_2d",
    sql="""
    WITH v AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x1,
                      CAST(embedding[2] AS DOUBLE) AS x2 FROM embeddings),
    c AS (SELECT var_samp(x1) AS a, covar_samp(x1, x2) AS b, var_samp(x2) AS cc FROM v),
    eig AS (
      SELECT a, b, (a + cc + SQRT((a - cc)*(a - cc) + 4*b*b)) / 2 AS l1 FROM c
    ),
    w AS (
      SELECT b / SQRT(b*b + (l1-a)*(l1-a)) AS w1,
             (l1-a) / SQRT(b*b + (l1-a)*(l1-a)) AS w2 FROM eig
    ),
    wn AS (SELECT CASE WHEN w1 < 0 THEN -w1 ELSE w1 END AS w1,
                  CASE WHEN w1 < 0 THEN -w2 ELSE w2 END AS w2 FROM w)
    SELECT vec_id, ROUND(x1*w1 + x2*w2, 6) AS pc1 FROM v, wn
    """,
)
def ml_pca_project_2d(spark, sf_dir):
    """PCA (#54) EXACT oracle: on 2 features the covariance eigenproblem
    has a closed form DuckDB can compute (λ₁ = (a+c+√((a−c)²+4b²))/2,
    w ∝ (b, λ₁−a)), and the engine's eigenvector sign — the one genuinely
    arbitrary quantity — is normalized away on BOTH sides (first loading
    made positive; Spark reads the fitted sign from model.pc and flips the
    projection column by that literal).  Proves fit+transform end-to-end;
    the 64-dim sibling `ml_pca_project` stays rows-only (no closed form)."""
    from compss_python_spark.ml.feature import pca

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice(F.col("embedding").cast("array<double>"), 1, 2).alias("xy")
    )
    out, model = pca(emb, "xy", k=1, output_col="pc")
    sign = 1.0 if model.pc.toArray()[0, 0] > 0 else -1.0
    return out.select(
        "vec_id", F.round(F.element_at("pc", 1) * F.lit(sign), 6).alias("pc1")
    )


# --- estimators flagged test-only in VERDICT r1 ----------------------------


@query(
    "ml_gaussian_nb",
    sql=f"""
    WITH tr AS (
      SELECT label AS y, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id % 2 = 0
    ),
    stats AS (
      SELECT y, ANY_VALUE(cnt) AS cnt, list(mu ORDER BY j) AS mus, list(va ORDER BY j) AS vars
      FROM (
        SELECT y, g.j, AVG(v[g.j]) AS mu, VAR_POP(v[g.j]) AS va,
               COUNT(*) AS cnt
        FROM tr CROSS JOIN generate_series(1, {_DIM}) AS g(j)
        GROUP BY y, g.j) GROUP BY y
    ),
    te AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id % 2 = 1
    ),
    scored AS (
      SELECT te.vec_id, te.label, s.y,
             LN(s.cnt) + list_sum(list_transform(range(1, {_DIM + 1}),
               j -> -0.5 * LN(2 * PI() * (s.vars[j] + 1e-9))
                    - (te.v[j] - s.mus[j]) * (te.v[j] - s.mus[j]) / (2 * (s.vars[j] + 1e-9)))) AS ll
      FROM te CROSS JOIN stats s
    )
    SELECT vec_id, CAST(label AS INT) AS label, CAST(y AS INT) AS prediction
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ll DESC, y ASC) AS rn
          FROM scored)
    WHERE rn = 1
    """,
)
def ml_gaussian_nb(spark, sf_dir):
    """Gaussian Naive Bayes (#58) — `gaussian_nb_exact` (per-class
    mean/var_pop + count prior, argmax log-likelihood, ties toward the
    smaller label), exactly re-derived by the oracle.  Train = even ids,
    test = odd."""
    from compss_python_spark.ml.classification import gaussian_nb_exact

    emb = table(spark, sf_dir, "embeddings")
    return gaussian_nb_exact(emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1"))


@query("ml_linear_svc_confusion", sql=None)
def ml_linear_svc_confusion(spark, sf_dir):
    """LinearSVC (#61, binary label>=5) — OWLQN optimizer state is
    engine-internal → rows-only confusion matrix; accuracy floor asserted
    in tests."""
    from compss_python_spark.ml.classification import linear_svc
    from compss_python_spark.ml.evaluation import confusion_matrix

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "bin", (F.col("label") >= 5).cast("int")
    )
    pred, _m = linear_svc(
        emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1"), label_col="bin"
    )
    return confusion_matrix(
        pred.withColumn("prediction", F.col("prediction").cast("int")),
        label_col="bin",
    )


@query(
    "ml_assoc_rules",
    sql="""
    WITH RECURSIVE
    baskets AS (
      SELECT l_orderkey,
             list_sort(list_distinct(list(CAST(l_partkey % 50 AS VARCHAR)))) AS items
      FROM lineitem GROUP BY l_orderkey
    ),
    nb AS (SELECT CEIL(0.0075 * COUNT(*)) AS minc FROM baskets),
    item1 AS (
      SELECT item, COUNT(*)::BIGINT AS freq
      FROM baskets, UNNEST(items) AS t(item)
      GROUP BY item HAVING COUNT(*) >= (SELECT minc FROM nb)
    ),
    fis(itemset, freq) AS (
      SELECT [item] AS itemset, freq FROM item1
      UNION ALL
      SELECT cand.itemset, cand.freq FROM (
        SELECT list_append(f.itemset, i.item) AS itemset, COUNT(*)::BIGINT AS freq
        FROM fis f
        JOIN item1 i ON i.item > f.itemset[-1]
        JOIN baskets b ON list_has_all(b.items, list_append(f.itemset, i.item))
        GROUP BY 1 HAVING COUNT(*) >= (SELECT minc FROM nb)
      ) cand
    ),
    rules AS (
      SELECT list_sort(list_filter(f.itemset, x -> x <> u.item)) AS ant,
             u.item AS cons, f.freq AS fu
      FROM fis f, UNNEST(f.itemset) AS u(item)
      WHERE len(f.itemset) >= 2
    )
    SELECT array_to_string(r.ant, ',') AS antecedent, r.cons AS consequent,
           ROUND(CAST(r.fu AS DOUBLE) / a.freq, 6) AS confidence
    FROM rules r JOIN fis a ON a.itemset = r.ant
    WHERE CAST(r.fu AS DOUBLE) / a.freq >= 0.08
    """,
)
def ml_assoc_rules(spark, sf_dir):
    """AssociationRules (#64) from FPGrowth on the same baskets as
    `ml_fpgrowth`: confidence = support(A∪{c}) / support(A), single-item
    consequents — re-derived by extending the Apriori recursive-CTE oracle
    with the rule-generation step."""
    from compss_python_spark.ml.fpm import fp_growth

    baskets = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 50).cast("string").alias("item"))
        .groupBy("l_orderkey")
        .agg(F.array_distinct(F.collect_list("item")).alias("items"))
    )
    _itemsets, rules, _model = fp_growth(baskets, min_support=0.0075, min_confidence=0.08)
    return rules


_DB_EPS, _DB_MINPTS = 0.02, 4

_DBSCAN_BASE_SQL = f"""
    WITH RECURSIVE
    pts AS (
      SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    ),
    nb AS (
      SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
      ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_DB_EPS * _DB_EPS}
    ),
    deg AS (SELECT ia AS id, COUNT(*) AS c FROM nb GROUP BY ia),
    core AS (SELECT id FROM deg WHERE c >= {_DB_MINPTS})
"""


@query(
    "ml_dbscan_core_sizes",
    oracle_cost="superlinear",  # all-pairs eps-neighborhood oracle: capped at 600s at sfgen10
    sql=_DBSCAN_BASE_SQL
    + """,
    ce AS (
      SELECT n.ia, n.ib FROM nb n
      JOIN core x ON n.ia = x.id JOIN core y ON n.ib = y.id
    ),
    comp(id, lbl) AS (
      SELECT id, id FROM core
      UNION
      SELECT ce.ia, comp.lbl FROM comp JOIN ce ON ce.ib = comp.id
      WHERE comp.lbl < ce.ia
    ),
    roots AS (SELECT id, MIN(lbl) AS root FROM comp GROUP BY id),
    sizes AS (SELECT root, COUNT(*) AS sz FROM roots GROUP BY root)
    SELECT sz AS core_size, COUNT(*) AS n_clusters FROM sizes GROUP BY sz
    """,
)
def ml_dbscan_core_sizes(spark, sf_dir):
    """DBSCAN (#57) on the first two embedding dims (eps=0.02, min_pts=4):
    the multiset of per-cluster CORE-point counts.  Core points and their
    eps-reachability components are implementation-independent (unlike
    border assignment, which is tie-broken), so this is an exact oracle:
    connected components of the core graph via a min-label-propagation
    recursive CTE."""
    from compss_python_spark.ml.clustering import dbscan

    pts = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("point_id"),
        F.element_at(F.col("embedding").cast("array<double>"), 1).alias("x"),
        F.element_at(F.col("embedding").cast("array<double>"), 2).alias("y"),
    )
    out = dbscan(pts, ["x", "y"], eps=_DB_EPS, min_pts=_DB_MINPTS, include_core=True)
    sizes = out.filter("is_core").groupBy("cluster").agg(F.count("*").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("core_size")).agg(
        F.count("*").alias("n_clusters")
    )


@query(
    "ml_dbscan_point_classes",
    sql=_DBSCAN_BASE_SQL
    + """,
    border AS (
      SELECT DISTINCT n.ia AS id FROM nb n
      JOIN core c ON n.ib = c.id
      ANTI JOIN core x ON n.ia = x.id
    )
    SELECT (SELECT COUNT(*) FROM core) AS n_core,
           (SELECT COUNT(*) FROM border) AS n_border,
           (SELECT COUNT(*) FROM pts)
             - (SELECT COUNT(*) FROM core) - (SELECT COUNT(*) FROM border) AS n_noise
    """,
)
def ml_dbscan_point_classes(spark, sf_dir):
    """DBSCAN point taxonomy (same run): core / border (non-core in a
    cluster) / noise counts — all implementation-independent."""
    from compss_python_spark.ml.clustering import dbscan

    pts = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("point_id"),
        F.element_at(F.col("embedding").cast("array<double>"), 1).alias("x"),
        F.element_at(F.col("embedding").cast("array<double>"), 2).alias("y"),
    )
    out = dbscan(pts, ["x", "y"], eps=_DB_EPS, min_pts=_DB_MINPTS, include_core=True)
    return out.agg(
        F.sum(F.col("is_core").cast("bigint")).alias("n_core"),
        F.sum(((~F.col("is_core")) & (F.col("cluster") >= 0)).cast("bigint")).alias(
            "n_border"
        ),
        F.sum((F.col("cluster") == -1).cast("bigint")).alias("n_noise"),
    )


@query(
    "ml_robust_scaler",
    sql="""
    WITH s AS (
      SELECT quantile_cont(n_chars, 0.25) AS lo,
             quantile_cont(n_chars, 0.5) AS med,
             quantile_cont(n_chars, 0.75) AS hi
      FROM documents
    )
    SELECT doc_id, ROUND((n_chars - med) / (hi - lo), 6) AS scaled
    FROM documents, s
    """,
)
def ml_robust_scaler(spark, sf_dir):
    """RobustScaler (median/IQR standardization) on document lengths —
    exact type-7 percentiles, one stats aggregate broadcast back."""
    from compss_python_spark.ml.feature import robust_scaler_scalar

    out = robust_scaler_scalar(table(spark, sf_dir, "documents"), "n_chars")
    return out.select("doc_id", F.round("scaled", 6).alias("scaled"))


@query(
    "ml_quantile_discretizer",
    sql="""
    WITH s AS (
      SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.50) AS q2,
             quantile_cont(l_extendedprice, 0.75) AS q3
      FROM lineitem
    ),
    b AS (
      SELECT CASE WHEN l_extendedprice < q1 THEN 0
                  WHEN l_extendedprice < q2 THEN 1
                  WHEN l_extendedprice < q3 THEN 2
                  ELSE 3 END AS bucket,
             l_extendedprice AS v
      FROM lineitem, s
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(v), 2) AS lo, ROUND(MAX(v), 2) AS hi
    FROM b GROUP BY bucket
    """,
)
def ml_quantile_discretizer(spark, sf_dir):
    """Equal-frequency binning into quartiles: exact split fit (one
    bounded collect of 3 points) + narrow bucketize expression; the bucket
    histogram with per-bucket ranges proves split placement AND boundary
    semantics (split value belongs to the upper bucket)."""
    from compss_python_spark.ml.feature import quantile_discretizer

    out = quantile_discretizer(
        table(spark, sf_dir, "lineitem"), "l_extendedprice", 4
    )
    return out.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


@query(
    "ml_feature_hashing_md5",
    sql=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(t), 1, 12) AS BIGINT) % 64 AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok GROUP BY 1, 2
    """,
)
def ml_feature_hashing_md5(spark, sf_dir):
    """Feature hashing (the hashing trick) into 64 buckets with the
    portable md5 hash: per-(doc, bucket) term counts, exactly
    SQL-recomputable — the oracled sibling of the xxhash64 hashing-TF
    production path (`ml_tfidf_norm`, rows-only).  One narrow bucket
    expression + one map-combined aggregate."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.encode(F.col("t"), "UTF-8")), 1, 12), 16, 10)
        .cast("long") % 64
    ).cast("int")
    return tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("cnt")
    )


@query(
    "ml_hash_folds",
    sql="""
    SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
                % 5 AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM documents GROUP BY 1
    """,
)
def ml_hash_folds(spark, sf_dir):
    """Deterministic cross-validation folds: fold = md5(id) % 5 — stable
    across runs, engines and cluster sizes (unlike randomSplit), so train /
    eval splits are reproducible and joinable.  Per-fold counts prove the
    assignment."""
    docs = table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 12),
            16, 10,
        ).cast("long") % 5
    ).cast("int")
    return docs.groupBy(fold.alias("fold")).agg(
        F.count("*").alias("n"), F.min("doc_id").alias("min_id")
    )


@query(
    "ml_target_encoding",
    sql="""
    WITH per AS (
      SELECT o_orderpriority, SUM(o_totalprice) AS s, COUNT(*) AS n
      FROM orders GROUP BY 1),
    g AS (SELECT AVG(o_totalprice) AS mu FROM orders),
    enc AS (
      SELECT o_orderpriority,
             ROUND((s + 20.0 * mu) / (n + 20.0), 4) AS enc
      FROM per CROSS JOIN g)
    SELECT o.o_orderkey, o.o_orderpriority, e.enc
    FROM orders o JOIN enc e USING (o_orderpriority)
    """,
)
def ml_target_encoding(spark, sf_dir):
    """m-estimate mean target encoding of order priority against order
    value: per-category + global aggregates broadcast back — zero fact
    shuffles (the high-cardinality-categorical featurizer)."""
    from compss_python_spark.ml.feature import target_encode

    orders = table(spark, sf_dir, "orders")
    out = target_encode(orders, "o_orderpriority", "o_totalprice")
    return out.select("o_orderkey", "o_orderpriority", "enc")


@query(
    "embedding_outliers",
    sql="""
    WITH ex AS (
      SELECT vec_id, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)),
    cent AS (SELECT i, AVG(val) AS m FROM ex GROUP BY i),
    d AS (
      SELECT ex.vec_id,
             SQRT(SUM((ex.val - cent.m) * (ex.val - cent.m))) AS dist
      FROM ex JOIN cent USING (i) GROUP BY ex.vec_id),
    mom AS (
      SELECT AVG(dist) AS mu,
             SQRT(AVG(dist * dist) - AVG(dist) * AVG(dist)) AS sd
      FROM d)
    SELECT vec_id,
           ROUND(dist, 6) AS dist,
           ROUND((dist - mu) / sd, 6) AS z,
           (dist - mu) / sd > 3.0 AS is_outlier
    FROM d CROSS JOIN mom
    """,
)
def embedding_outliers(spark, sf_dir):
    """Corrupt-embedding screen: per-vector distance to the corpus
    centroid, z-scored (threshold 3).  Centroid = one dim-keyed
    map-combined aggregate broadcast back as a 1-row array; distance is a
    zero-shuffle zip_with expression; moments use the explicit
    E[d^2]-E[d]^2 form for engine parity."""
    from compss_python_spark.llm.similarity import embedding_outliers

    return embedding_outliers(table(spark, sf_dir, "embeddings"))
