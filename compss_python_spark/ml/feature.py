"""Feature-engineering operators (SURVEY.md §2.8 #45–55).

Reference [ref: ddf_library/functions/ml/feature.py] implements these with
per-fragment pandas; here each is the corresponding ``pyspark.ml.feature``
transformer (JVM, distributed fit where needed) with an ``array<...>``
boundary type: inputs/outputs are plain array columns (the reference's
"Python list cell" equivalent), converted to/from ``VectorUDT`` internally
via pyspark.ml.functions.{array_to_vector, vector_to_array}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml import feature as MF
from pyspark.ml.functions import array_to_vector, vector_to_array


def tokenizer(df: DataFrame, input_col: str, output_col: str = "tokens") -> DataFrame:
    """[ref: ml/feature.py Tokenizer] — lowercase whitespace split."""
    return MF.Tokenizer(inputCol=input_col, outputCol=output_col).transform(df)


def regex_tokenizer(df: DataFrame, input_col: str, output_col: str = "tokens",
                    pattern: str = r"\W+", min_token_length: int = 1) -> DataFrame:
    """[ref: ml/feature.py RegexTokenizer]"""
    tk = MF.RegexTokenizer(
        inputCol=input_col, outputCol=output_col, pattern=pattern,
        minTokenLength=min_token_length,
    )
    return tk.transform(df)


def remove_stop_words(df: DataFrame, input_col: str, output_col: str = "filtered",
                      stop_words: list[str] | None = None, case_sensitive: bool = False) -> DataFrame:
    """[ref: ml/feature.py RemoveStopWords] — custom or default list."""
    remover = MF.StopWordsRemover(
        inputCol=input_col, outputCol=output_col, caseSensitive=case_sensitive
    )
    if stop_words is not None:
        remover.setStopWords(list(stop_words))
    return remover.transform(df)


def ngram(df: DataFrame, input_col: str, n: int = 2, output_col: str = "ngrams") -> DataFrame:
    """[ref: ml/feature.py NGram]"""
    return MF.NGram(n=n, inputCol=input_col, outputCol=output_col).transform(df)


def count_vectorizer(df: DataFrame, input_col: str, output_col: str = "tf",
                     vocab_size: int = 1 << 18, min_df: float = 1.0):
    """[ref: ml/feature.py CountVectorizer] — returns (transformed df, model).
    Output is array<double> (vector_to_array at the boundary)."""
    model = MF.CountVectorizer(
        inputCol=input_col, outputCol="_vec", vocabSize=vocab_size, minDF=min_df
    ).fit(df)
    out = model.transform(df).withColumn(output_col, vector_to_array("_vec")).drop("_vec")
    return out, model


def tfidf(df: DataFrame, input_col: str, output_col: str = "tfidf",
          num_features: int = 1 << 18, use_hashing: bool = True):
    """[ref: ml/feature.py TfidfVectorizer] — HashingTF (stateless, the
    100 TB path: no vocabulary broadcast) or CountVectorizer + IDF."""
    if use_hashing:
        tf_df = MF.HashingTF(
            inputCol=input_col, outputCol="_tf", numFeatures=num_features
        ).transform(df)
    else:
        tf_df = MF.CountVectorizer(inputCol=input_col, outputCol="_tf").fit(df).transform(df)
    idf_model = MF.IDF(inputCol="_tf", outputCol="_idf").fit(tf_df)
    out = (
        idf_model.transform(tf_df)
        .withColumn(output_col, vector_to_array("_idf"))
        .drop("_tf", "_idf")
    )
    return out, idf_model


def string_indexer(df: DataFrame, input_col: str, output_col: str = "label_idx"):
    """[ref: ml/feature.py StringIndexer] — frequency-desc, tie lexicographic."""
    model = MF.StringIndexer(
        inputCol=input_col, outputCol=output_col, stringOrderType="frequencyDesc"
    ).fit(df)
    return model.transform(df), model


def index_to_string(df: DataFrame, input_col: str, labels: list[str], output_col: str = "label_str") -> DataFrame:
    """[ref: ml/feature.py IndexToString]"""
    return MF.IndexToString(inputCol=input_col, outputCol=output_col, labels=labels).transform(df)


def binarizer(df: DataFrame, input_col: str, threshold: float, output_col: str = "bin") -> DataFrame:
    """[ref: ml/feature.py Binarizer] — expressed as a plain plan predicate
    (no vector round-trip needed for the scalar case)."""
    return df.withColumn(output_col, (F.col(input_col) > threshold).cast("double"))


def one_hot_encode(df: DataFrame, input_col: str, output_col: str = "onehot"):
    """[ref: ml/feature.py OneHotEncoder]"""
    model = MF.OneHotEncoder(inputCols=[input_col], outputCols=["_oh"], dropLast=False).fit(df)
    out = model.transform(df).withColumn(output_col, vector_to_array("_oh")).drop("_oh")
    return out, model


def _scale(df: DataFrame, scaler, input_col: str, output_col: str):
    vec = df.withColumn("_v", array_to_vector(F.col(input_col).cast("array<double>")))
    model = scaler.fit(vec)
    return (
        model.transform(vec).withColumn(output_col, vector_to_array("_s")).drop("_v", "_s"),
        model,
    )


def min_max_scaler(df: DataFrame, input_col: str, output_col: str = "scaled"):
    """[ref: ml/feature.py MinMaxScaler]"""
    return _scale(df, MF.MinMaxScaler(inputCol="_v", outputCol="_s"), input_col, output_col)


def max_abs_scaler(df: DataFrame, input_col: str, output_col: str = "scaled"):
    """[ref: ml/feature.py MaxAbsScaler]"""
    return _scale(df, MF.MaxAbsScaler(inputCol="_v", outputCol="_s"), input_col, output_col)


def standard_scaler(df: DataFrame, input_col: str, output_col: str = "scaled",
                    with_mean: bool = True, with_std: bool = True):
    """[ref: ml/feature.py StandardScaler]"""
    return _scale(
        df,
        MF.StandardScaler(inputCol="_v", outputCol="_s", withMean=with_mean, withStd=with_std),
        input_col, output_col,
    )


def robust_scaler_scalar(
    df: DataFrame,
    input_col: str,
    output_col: str = "scaled",
    lower: float = 0.25,
    upper: float = 0.75,
) -> DataFrame:
    """RobustScaler on a scalar column: (x - median) / IQR — outlier-proof
    standardization.  EXACT interpolated percentiles (type-7: Spark
    `percentile` == DuckDB `quantile_cont`), computed in ONE aggregate whose
    1-row result joins back as a broadcast (the standard fit-then-transform
    shape; no driver round-trip, no second scan)."""
    stats = df.agg(
        F.expr(
            f"percentile({input_col}, array({lower}d, 0.5d, {upper}d))"
        ).alias("_q")
    ).select(
        F.col("_q")[0].alias("_lo"), F.col("_q")[1].alias("_med"), F.col("_q")[2].alias("_hi")
    )
    out = df.crossJoin(F.broadcast(stats))
    return out.withColumn(
        output_col,
        (F.col(input_col) - F.col("_med")) / (F.col("_hi") - F.col("_lo")),
    ).drop("_lo", "_med", "_hi")


def bucketizer_scalar(
    df: DataFrame, input_col: str, splits, output_col: str = "bucket"
) -> DataFrame:
    """Bucketizer on a scalar column: bucket i covers [splits[i],
    splits[i+1]) with the final upper edge inclusive; values outside
    [splits[0], splits[-1]] map to NULL.  Pure JVM expression (an
    `aggregate` over the split-array literal) — narrow, codegen'd, no UDF.
    Use ``float('-inf')`` / ``float('inf')`` endpoints to make the edge
    buckets unbounded (what :func:`quantile_discretizer` does)."""
    splits = [float(v) for v in splits]
    if sorted(splits) != splits or len(splits) < 2:
        raise ValueError("bucketizer_scalar: splits must be ascending, length >= 2")
    arr = F.array(*[F.lit(v) for v in splits])
    x = F.col(input_col)
    n_ge = F.aggregate(
        arr, F.lit(0), lambda acc, sp: acc + F.when(x >= sp, 1).otherwise(0)
    )
    bucket = F.when(
        x.isNull() | (x < splits[0]) | (x > splits[-1]), F.lit(None)
    ).otherwise(F.least(n_ge - 1, F.lit(len(splits) - 2)))
    return df.withColumn(output_col, bucket.cast("long"))


def quantile_discretizer(
    df: DataFrame,
    input_col: str,
    num_buckets: int,
    output_col: str = "bucket",
    relative_error: float = 0.0,
) -> DataFrame:
    """QuantileDiscretizer: bin a column into ``num_buckets`` equal-frequency
    buckets.  ``relative_error=0`` computes EXACT interpolated split points
    (oracle-parity); a positive value uses `percentile_approx` (t-digest,
    bounded memory — the 100 TB default, where split points are estimates
    anyway).  The fit collects ONE row of split points (bounded by
    num_buckets); the transform is the narrow :func:`bucketizer_scalar`
    expression with open endpoints, so out-of-range future values land in
    the edge buckets like Spark ML's handleInvalid='keep' edges."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    parr = "array(" + ", ".join(f"{p!r}d" for p in probs) + ")"
    fn = "percentile" if relative_error == 0.0 else "percentile_approx"
    extra = "" if relative_error == 0.0 else f", {max(1, int(1 / relative_error))}"
    row = df.agg(F.expr(f"{fn}({input_col}, {parr}{extra})").alias("_q")).first()
    internal = sorted(set(float(v) for v in row["_q"]))
    return bucketizer_scalar(
        df, input_col, [float("-inf")] + internal + [float("inf")], output_col
    )


def pca(df: DataFrame, input_col: str, k: int, output_col: str = "pca"):
    """[ref: ml/feature.py PCA]"""
    vec = df.withColumn("_v", array_to_vector(F.col(input_col).cast("array<double>")))
    model = MF.PCA(k=k, inputCol="_v", outputCol="_p").fit(vec)
    out = model.transform(vec).withColumn(output_col, vector_to_array("_p")).drop("_v", "_p")
    return out, model


def polynomial_expansion(df: DataFrame, input_col: str, degree: int = 2,
                         output_col: str = "poly"):
    """[ref: ml/feature.py PolynomialExpansion]"""
    vec = df.withColumn("_v", array_to_vector(F.col(input_col).cast("array<double>")))
    out = (
        MF.PolynomialExpansion(degree=degree, inputCol="_v", outputCol="_p")
        .transform(vec)
        .withColumn(output_col, vector_to_array("_p"))
        .drop("_v", "_p")
    )
    return out


def target_encode(
    df,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    output_col: str = "enc",
    round_dp: int = 4,
):
    """Mean target encoding with m-estimate smoothing — the standard
    high-cardinality-categorical featurizer: enc(c) = (Σ_c target + m·μ) /
    (n_c + m), shrinking rare categories toward the global mean μ.

    Plan: one map-combined per-category aggregate + one 1-row global
    aggregate, both broadcast back onto the fact — zero fact shuffles.
    (Leave-one-out and CV-fold variants compose with ml_hash_folds.)"""
    from pyspark.sql import functions as F

    per = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("_s"), F.count(target_col).alias("_n")
    )
    glob = df.agg(F.avg(target_col).alias("_mu"))
    enc = per.crossJoin(F.broadcast(glob)).select(
        cat_col,
        F.round(
            (F.col("_s") + smoothing * F.col("_mu"))
            / (F.col("_n") + F.lit(smoothing)),
            round_dp,
        ).alias(output_col),
    )
    return df.join(F.broadcast(enc), cat_col)
