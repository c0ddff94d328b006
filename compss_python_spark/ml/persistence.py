"""Model persistence — the reference's ``ModelDDF.save_model/load_model``
surface [ref: ddf_library/bases/ddf_model.py].

spark.ml models/pipelines already serialize to a directory (metadata JSON +
parquet coefficient tables — cluster-readable, format-stable); these
wrappers just normalize the call and centralize the load-class lookup so a
facade user doesn't need to know the MLWritable class of each estimator.
"""

from __future__ import annotations


def save_model(model, path: str, overwrite: bool = True) -> None:
    """Persist any spark.ml model (MLWritable) to ``path``."""
    writer = model.write()
    if overwrite:
        writer = writer.overwrite()
    writer.save(path)


def load_model(model_class, path: str):
    """Load a model saved by :func:`save_model`.

    ``model_class`` is the spark.ml model class (e.g.
    ``pyspark.ml.clustering.KMeansModel``) — Spark requires the concrete
    class for deserialization.
    """
    return model_class.load(path)
