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


def test_header_parsers_roundtrip_pure():
    """Byte-level parsers recover exactly what the builders encoded."""
    assert mm.parse_media_header(mm._build_png(800, 600)) == ("png", 800, 600, 3, None)
    assert mm.parse_media_header(mm._build_jpeg(1920, 1080)) == ("jpeg", 1920, 1080, 3, None)
    assert mm.parse_media_header(mm._build_wav(44100, 2)) == ("wav", None, None, 2, 44100)
    assert mm.parse_media_header(b"\x00garbage") == (None, None, None, None, None)
    assert mm.parse_media_header(None) == (None, None, None, None, None)
    # JPEG parser must skip leading segments (APP0 walk, not fixed offset)
    j = mm._build_jpeg(33, 44)
    assert mm.parse_media_header(j[:2] + b"\xff\xfe\x00\x04ab" + j[2:])[1:3] == (33, 44)


def test_probe_media_spark_and_jvm_png_path(spark, sf_dir):
    from pyspark.sql import functions as F

    from compss_python_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").limit(60)
    media = mm.synthesize_real_media(docs)
    probed = {r["media_id"]: r for r in mm.probe_media(media).collect()}
    for mid, r in probed.items():
        kind = mid % 3
        if kind in (0, 1):
            assert r["format"] == ("png" if kind == 0 else "jpeg")
            assert r["width"] == 16 + mid % 241
            assert r["height"] == 16 + mid % 181
            assert r["channels"] == 3
        else:
            assert r["format"] == "wav"
            assert r["sample_rate"] == 8000 + 4000 * (mid % 8)
            assert r["channels"] == 1 + mid % 2

    # zero-UDF JVM expression path agrees with the Python parser on PNGs
    w, h = mm.png_dims_expr("payload")
    jvm = {
        r["media_id"]: (r["width"], r["height"])
        for r in media.select("media_id", w, h).collect()
        if r["media_id"] % 3 == 0
    }
    for mid, (jw, jh) in jvm.items():
        assert (jw, jh) == (probed[mid]["width"], probed[mid]["height"])


def test_wav_chunk_walk_and_jpeg_fill_bytes():
    """Regression: fmt chunk found behind a JUNK chunk; JPEG fill bytes
    (0xFF padding) skipped; parser stops at SOS."""
    junk = b"JUNK" + (6).to_bytes(4, "little") + b"\x00" * 6
    wav = mm._build_wav(22050, 2)
    bwf = wav[:12] + junk + wav[12:]
    assert mm.parse_media_header(bwf) == ("wav", None, None, 2, 22050)

    j = mm._build_jpeg(55, 66)
    padded = j[:2] + b"\xff\xff\xff" + j[2:]
    assert mm.parse_media_header(padded)[1:3] == (55, 66)
    # SOS before any SOF -> no dimensions, but no crash/overshoot
    sos_first = b"\xff\xd8" + b"\xff\xda" + (4).to_bytes(2, "big") + b"\x00\x00"
    assert mm.parse_media_header(sos_first) == ("jpeg", None, None, None, None)


def test_probe_media_partition_invariant(spark, sf_dir):
    from compss_python_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").limit(90)
    media = mm.synthesize_real_media(docs)
    a = {r["media_id"]: tuple(r) for r in mm.probe_media(media).collect()}
    b = {
        r["media_id"]: tuple(r)
        for r in mm.probe_media(media.repartition(7)).collect()
    }
    assert a == b, "header probing must not depend on partitioning"
