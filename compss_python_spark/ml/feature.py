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
