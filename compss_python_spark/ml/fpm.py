"""Frequent pattern mining (SURVEY.md §2.8 #63–64).

[ref: ddf_library/functions/ml/fpm.py] — FPGrowth + AssociationRules map to
pyspark.ml.fpm.FPGrowth (parallel FP-growth, Li et al., PFP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml.fpm import FPGrowth


def fp_growth(df: DataFrame, items_col: str = "items", min_support: float = 0.1,
              min_confidence: float = 0.6):
    """Returns (freq_itemsets_df, assoc_rules_df, model).

    freq itemsets sorted-serialized for deterministic comparison.
    """
    model = FPGrowth(
        itemsCol=items_col, minSupport=min_support, minConfidence=min_confidence
    ).fit(df)
    itemsets = model.freqItemsets.select(
        F.array_join(F.sort_array("items"), ",").alias("itemset"),
        F.col("freq"),
    )
    rules = model.associationRules.select(
        F.array_join(F.sort_array("antecedent"), ",").alias("antecedent"),
        F.array_join(F.sort_array("consequent"), ",").alias("consequent"),
        F.round("confidence", 6).alias("confidence"),
    )
    return itemsets, rules, model
