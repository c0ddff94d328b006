"""Multimodal plumbing tests: schema, determinism, batch shapes."""

from pyspark.sql import types as T

from compss_python_spark.llm import multimodal as mm


def _media(spark, sf_dir, n=50):
    from compss_python_spark.plans.registry import table

    return mm.synthesize_media(table(spark, sf_dir, "documents").limit(n))


def test_media_schema(spark, sf_dir):
    media = _media(spark, sf_dir)
    assert isinstance(media.schema["payload"].dataType, T.BinaryType)
    assert isinstance(media.schema["meta"].dataType, T.StructType)
    assert {r["media_type"] for r in media.select("media_type").distinct().collect()} <= {
        "image", "audio", "video",
    }


def test_feature_extraction_contract(spark, sf_dir):
    feats = mm.extract_features(_media(spark, sf_dir))
    row = feats.first()
    assert len(row["feature"]) == 16
    assert row["n_bytes"] > 0
    assert all(0.0 <= x <= 1.0 for x in row["feature"])


def test_feature_extraction_deterministic(spark, sf_dir):
    a = mm.extract_features(_media(spark, sf_dir)).collect()
    b = mm.extract_features(_media(spark, sf_dir).repartition(7)).collect()
    am = {r["media_id"]: list(r["feature"]) for r in a}
    bm = {r["media_id"]: list(r["feature"]) for r in b}
    assert am == bm, "features must not depend on partitioning"


def test_resize_and_frame_sample(spark, sf_dir):
    media = _media(spark, sf_dir)
    resized = mm.resize_stub(media, 32, 32)
    assert resized.first()["meta"]["width"] == 32
    frames = mm.frame_sample_stub(media, every_n=1)
    assert frames.filter("frame_idx >= 0").count() == frames.count()
