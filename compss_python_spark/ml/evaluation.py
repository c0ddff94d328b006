"""Evaluation metrics (SURVEY.md §2.8 #65–67).

[ref: ddf_library/functions/ml/evaluation.py] — classification metrics
computed as plain aggregates over (label, prediction) so they are
oracle-expressible; regression metrics likewise.  The confusion matrix is a
groupBy(label, prediction).count() — the same construction the reference
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(df: DataFrame, label_col: str = "label",
                     prediction_col: str = "prediction") -> DataFrame:
    return df.groupBy(label_col, prediction_col).agg(F.count("*").alias("n"))


def multiclass_metrics(df: DataFrame, label_col: str = "label",
                       prediction_col: str = "prediction") -> DataFrame:
    """Per-class precision/recall/F1 + support, as one aggregate pass."""
    lab = F.col(label_col)
    pred = F.col(prediction_col)
    tp = df.filter(lab == pred).groupBy(lab.alias("cls")).agg(F.count("*").alias("tp"))
    actual = df.groupBy(lab.alias("cls")).agg(F.count("*").alias("support"))
    predicted = df.groupBy(pred.alias("cls")).agg(F.count("*").alias("pred_n"))
    out = (
        actual.join(predicted, "cls", "full_outer")
        .join(tp, "cls", "left")
        .na.fill({"tp": 0, "support": 0, "pred_n": 0})
        .select(
            "cls",
            "support",
            F.round(F.col("tp") / F.greatest(F.col("pred_n"), F.lit(1)), 6).alias("precision"),
            F.round(F.col("tp") / F.greatest(F.col("support"), F.lit(1)), 6).alias("recall"),
            F.round(
                2 * F.col("tp") / F.greatest(F.col("pred_n") + F.col("support"), F.lit(1)), 6
            ).alias("f1"),
        )
    )
    return out


def accuracy(df: DataFrame, label_col: str = "label", prediction_col: str = "prediction") -> float:
    row = df.agg(
        (F.sum((F.col(label_col) == F.col(prediction_col)).cast("int")) / F.count("*")).alias("acc")
    ).first()
    return row["acc"]


def regression_metrics(df: DataFrame, label_col: str = "label",
                       prediction_col: str = "prediction") -> DataFrame:
    """MSE/RMSE/MAE/R² as one aggregate (oracle-expressible)."""
    err = F.col(prediction_col) - F.col(label_col)
    # Σ(y−ȳ)² = n·var_pop(y) ⇒ R² = 1 − avg(err²)/var_pop(y) — single pass,
    # no nested aggregate.
    return df.agg(
        F.round(F.avg(err * err), 6).alias("mse"),
        F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
        F.round(F.avg(F.abs(err)), 6).alias("mae"),
        F.round(F.lit(1.0) - F.avg(err * err) / F.var_pop(label_col), 6).alias("r2"),
    )
