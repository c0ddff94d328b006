"""Regression (SURVEY.md §2.8 #62).

[ref: ddf_library/functions/ml/regression.py] — the reference has a
closed-form simple linear regression and an SGD multivariate one; both map
to pyspark.ml.regression.LinearRegression (WLS/L-BFGS).  The closed-form
1-D path is also provided as a pure aggregate (no ML fit) for parity with
the reference's `simple` mode and for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml.functions import array_to_vector
from pyspark.ml.regression import LinearRegression as MLLinearRegression


def simple_linear_regression(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Closed-form 1-D OLS: slope = cov(x,y)/var(x), intercept = ȳ − b·x̄.

    One aggregate — expressible in SQL (regr_slope/regr_intercept) for the
    oracle.
    """
    return df.agg(
        (F.covar_pop(x_col, y_col) / F.var_pop(x_col)).alias("slope"),
        (F.avg(y_col) - (F.covar_pop(x_col, y_col) / F.var_pop(x_col)) * F.avg(x_col)).alias(
            "intercept"
        ),
    )


def linear_regression(train: DataFrame, test: DataFrame, features_col: str = "embedding",
                      label_col: str = "label", max_iter: int = 50,
                      prediction_col: str = "prediction"):
    """Multivariate LinearRegression [ref: ml/regression.py]."""
    def vec(d):
        return d.withColumn("_v", array_to_vector(F.col(features_col).cast("array<double>")))
    model = MLLinearRegression(
        featuresCol="_v", labelCol=label_col, maxIter=max_iter,
        predictionCol=prediction_col,
    ).fit(vec(train))
    return model.transform(vec(test)).drop("_v"), model
