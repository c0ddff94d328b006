"""Multimodal plumbing tests: schema, determinism, batch shapes."""

import pytest
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


def test_png_codec_roundtrip_pure():
    """encode_png/decode_png_pixels invert each other for every filter type
    and supported color type, on random pixel data."""
    import numpy as np

    rng = np.random.default_rng(7)
    for shape in [(7, 5, 3), (16, 16, 1), (9, 11, 4), (1, 1, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for filters in [None, 0, 1, 2, 3, 4]:
            dec = mm.decode_png_pixels(mm.encode_png(arr, filters=filters))
            assert dec is not None and np.array_equal(dec, arr), (shape, filters)
    gray2d = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    assert np.array_equal(mm.decode_png_pixels(mm.encode_png(gray2d)), gray2d[:, :, None])


def test_png_decode_rejects_garbage():
    import numpy as np

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    png = mm.encode_png(arr)
    assert mm.decode_png_pixels(None) is None
    assert mm.decode_png_pixels(b"not a png") is None
    assert mm.decode_png_pixels(png[:20]) is None  # truncated mid-IHDR
    # corrupt the zlib stream inside IDAT
    corrupt = bytearray(png)
    corrupt[len(png) // 2] ^= 0xFF
    assert mm.decode_png_pixels(bytes(corrupt)) is None or True  # must not raise
    # header probe still agrees with pixel decode dims
    assert mm.parse_media_header(png)[:3] == ("png", 4, 4)


def test_png_pixel_stats_matches_closed_form(spark, sf_dir):
    """Spark pixel-stats path == the generation formula's closed-form sums."""
    from compss_python_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").limit(40)
    media = mm.synthesize_pixel_media(docs)
    for r in mm.png_pixel_stats(media).collect():
        i = r["media_id"]
        w, h, s = 8 + i % 25, 8 + i % 17, i % 64
        assert (r["width"], r["height"]) == (w, h)
        for c, col in enumerate(["sum_r", "sum_g", "sum_b"]):
            assert r[col] == h * w * (w - 1) // 2 + w * h * (h - 1) + (3 * c + s) * w * h


def test_extract_features_real_png_path(spark, sf_dir):
    """extract_features emits TRUE per-channel mean/std for PNG payloads."""
    import numpy as np
    from pyspark.sql import functions as F

    from compss_python_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").limit(12)
    media = mm.synthesize_pixel_media(docs).withColumn("media_type", F.lit("image"))
    feats = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    for mid, f in feats.items():
        i = mid
        w, h, s = 8 + i % 25, 8 + i % 17, i % 64
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        arr = (x + 2 * y + 3 * c + s).astype(np.float64)
        for cc in range(3):
            assert abs(f[2 * cc] - arr[:, :, cc].mean() / 255.0) < 1e-6
            assert abs(f[2 * cc + 1] - arr[:, :, cc].std() / 255.0) < 1e-6


def test_wav_sample_stats_roundtrip(spark):
    """Synthesized PCM decodes back to the exact generation formula."""
    import pandas as pd

    from compss_python_spark.llm import multimodal as mm

    payloads = [(i, mm._build_wav(16000, 1 + i % 2, n_samples=8, seed=i))
                for i in (2, 5, 8)]
    df = spark.createDataFrame(
        pd.DataFrame(payloads, columns=["media_id", "payload"])
    )
    out = {r["media_id"]: r for r in mm.wav_sample_stats(df).collect()}
    for i, _ in payloads:
        ch = 1 + i % 2
        vals = [((i * 31 + j * 7919) % 65536) - 32768 for j in range(8 * ch)]
        assert out[i]["channels"] == ch and out[i]["n_samples"] == 8
        assert out[i]["sum_pcm"] == sum(vals)
        assert out[i]["sumsq_pcm"] == sum(v * v for v in vals)
        assert out[i]["peak"] == max(abs(v) for v in vals)
    # non-WAV payloads are skipped, not fatal
    bad = spark.createDataFrame(
        pd.DataFrame([(1, b"not a wav")], columns=["media_id", "payload"])
    )
    assert mm.wav_sample_stats(bad).count() == 0
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav_samples(b"junk")
    # string (uuid-style) media ids pass through with their input type
    sdf = spark.createDataFrame(
        pd.DataFrame([("uuid-7", mm._build_wav(16000, 1, n_samples=4, seed=7))],
                     columns=["media_id", "payload"])
    )
    srow = mm.wav_sample_stats(sdf).first()
    assert srow["media_id"] == "uuid-7" and srow["n_samples"] == 4


def test_jpeg_constant_blocks_exact():
    """Even-valued constant 8x8 blocks roundtrip EXACTLY through the real
    entropy codec (the closed form the SQL oracle uses)."""
    import numpy as np

    from compss_python_spark.llm import jpeg

    rng = np.random.default_rng(7)
    for _ in range(6):
        bw, bh = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        vals = 2 * rng.integers(0, 128, size=(bh, bw))
        arr = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
        dec = jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(arr))
        assert dec.shape == arr.shape and (dec == arr).all()


def test_jpeg_random_gray_matches_reference_idct():
    """Arbitrary grayscale content (full AC path, ZRL/EOB, DC chains,
    byte stuffing): decode equals an INDEPENDENT dequant+IDCT
    reconstruction bit-for-bit — proving Huffman/zigzag/dequant plumbing
    carries every coefficient."""
    import numpy as np

    from compss_python_spark.llm import jpeg

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(16, 24)).astype(np.uint8)
    dec = jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(arr))
    M, Q = jpeg._M, jpeg.QUANT_LUMA
    exp = np.zeros_like(arr)
    for by in range(2):
        for bx in range(3):
            blk = arr[by*8:by*8+8, bx*8:bx*8+8].astype(float)
            qz = np.floor((M @ (blk - 128.0) @ M.T) / Q + 0.5)
            rec = M.T @ (qz * Q) @ M + 128.0
            exp[by*8:by*8+8, bx*8:bx*8+8] = np.clip(np.floor(rec + 0.5), 0, 255)
    assert (dec == exp).all()
    # lossy but sane vs the original
    assert np.abs(dec.astype(int) - arr.astype(int)).mean() < 40


def test_jpeg_color_and_guards():
    import numpy as np
    import pytest as _pt

    from compss_python_spark.llm import jpeg
    from compss_python_spark.llm import multimodal as mm

    rng = np.random.default_rng(3)
    arr3 = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    dec3 = jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(arr3))
    assert dec3.shape == arr3.shape
    assert np.abs(dec3.astype(int) - arr3.astype(int)).mean() < 30  # 4:4:4 lossy
    assert jpeg.decode_jpeg_pixels(b"not a jpeg") is None
    assert jpeg.decode_jpeg_pixels(None) is None
    with _pt.raises(ValueError, match="missing SOF or SOS"):
        jpeg.decode_jpeg_pixels(mm._build_jpeg(16, 16))  # header-only stub
    with _pt.raises(ValueError, match="multiples of 8"):
        jpeg.encode_jpeg(np.zeros((10, 8), dtype=np.uint8))


def test_jpeg_chroma_subsampling_roundtrip():
    """4:2:0 and 4:2:2 — the dominant real-world baseline formats — decode
    through the general MCU walk with nearest-neighbor chroma upsampling;
    constant-chroma content survives nearly losslessly and smooth gradients
    stay within quantization error."""
    import numpy as np

    from compss_python_spark.llm import jpeg

    yy, xx = np.mgrid[0:32, 0:32]
    smooth = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy * 2 + xx * 5) % 256, (xx * 4) % 256],
        axis=2,
    ).astype(np.uint8)
    for sub in ("420", "422"):
        dec = jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(smooth, subsampling=sub))
        assert dec.shape == smooth.shape
        assert np.abs(dec.astype(int) - smooth.astype(int)).mean() < 10

    flat = np.full((32, 32, 3), 200, dtype=np.uint8)
    flat[:, :, 1] = 100
    d = jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(flat, subsampling="420"))
    # Bound = half a chroma DC quantization step through the inverse color
    # transform, NOT an exact-roundtrip claim: a flat patch's only loss is
    # DC quantization, and whether a coefficient lands one notch up or
    # down sits on a float rounding boundary that libm differences flip
    # (observed: the same encode moved max|err| 2 -> 3 across host
    # images with identical numpy).  Engine-vs-oracle parity is separately
    # digest-checked (multimodal_jpeg_pixel_stats), so this test only
    # guards against gross codec breakage.
    assert np.abs(d.astype(int) - flat.astype(int)).max() <= 5
    import pytest as _pt

    with _pt.raises(ValueError, match="MCU size"):
        jpeg.encode_jpeg(np.zeros((24, 24, 3), dtype=np.uint8), subsampling="420")


def test_jpeg_pixel_stats_spark(spark, sf_dir):
    """Spark-side JPEG decode pipeline: synthesized fixtures decode to the
    generation formula through mapInPandas."""
    import numpy as np

    from compss_python_spark.llm import multimodal as mm
    from compss_python_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").limit(9)
    media = mm.synthesize_jpeg_media(docs)
    out = {r["media_id"]: r for r in mm.jpeg_pixel_stats(media).collect()}
    for r in docs.select("doc_id").collect():
        i = r["doc_id"]
        wb, hb = 1 + i % 3, 1 + i % 2
        bx = np.arange(wb)[None, :]
        by = np.arange(hb)[:, None]
        v = 2 * ((i * 7 + bx * 13 + by * 29) % 128)
        row = out[i]
        assert (row["width"], row["height"]) == (8 * wb, 8 * hb)
        assert row["sum_pix"] == 64 * int(v.sum())
        assert row["sumsq_pix"] == 64 * int((v * v).sum())


def test_resize_images_real_and_passthrough(spark, sf_dir):
    """Real nearest-neighbor resize: decoded output pixels equal the
    integer index-map gather of the source; JPEG inputs re-encode to PNG;
    non-decodable payloads pass through flagged."""
    import numpy as np
    import pandas as pd

    from compss_python_spark.llm import jpeg

    rng = np.random.default_rng(9)
    src_png = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    vals = 2 * rng.integers(0, 128, size=(2, 2))
    src_jpg = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
    df = spark.createDataFrame(pd.DataFrame({
        "media_id": [1, 2, 3],
        "payload": [mm.encode_png(src_png), jpeg.encode_jpeg(src_jpg),
                    b"not an image"],
    }))
    out = {r["media_id"]: r for r in mm.resize_images(df, 10, 7).collect()}
    dec1 = mm.decode_png_pixels(bytes(out[1]["payload"]))
    assert out[1]["resized"] and dec1.shape == (7, 10, 3)
    assert np.array_equal(dec1, mm.resize_pixels(src_png, 10, 7))
    dec2 = mm.decode_png_pixels(bytes(out[2]["payload"]))
    assert out[2]["resized"] and dec2.shape == (7, 10, 1)
    assert np.array_equal(
        dec2[:, :, 0], mm.resize_pixels(src_jpg[:, :, None], 10, 7)[:, :, 0]
    )
    assert not out[3]["resized"] and bytes(out[3]["payload"]) == b"not an image"


def test_avi_container_roundtrip_and_probe():
    """MJPEG AVI: frames come back in order byte-identical; avih header
    parses (total frames in the channels slot of the fixed probe schema);
    garbage and WAV payloads yield no frames."""
    import numpy as np

    from compss_python_spark.llm import jpeg

    frames = []
    for f in range(3):
        vals = 2 * np.full((2, 2), 10 + 7 * f)
        frames.append(jpeg.encode_jpeg(
            np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)))
    avi = mm._build_avi_mjpeg(frames, 16, 16, fps=5)
    assert mm.decode_avi_frames(avi) == frames
    assert mm.parse_media_header(avi) == ("avi", 16, 16, 3, None)
    assert mm.decode_avi_frames(b"garbage") == []
    assert mm.decode_avi_frames(mm._build_wav(8000, 1)) == []
    # odd-sized frame payloads stay word-aligned in the container
    odd = frames[0] + b"\x00"  # force odd length
    avi2 = mm._build_avi_mjpeg([odd, frames[1]], 16, 16)
    assert mm.decode_avi_frames(avi2) == [odd, frames[1]]


def test_frame_sample_real_decode(spark, sf_dir):
    """frame_sample extracts every 2nd frame and decodes it to the exact
    generation formula; sampled indices follow the stride."""
    import numpy as np

    from compss_python_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").limit(12)
    media = mm.synthesize_video_media(docs)
    rows = mm.frame_sample(media, every_n=2).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
    for r in docs.select("doc_id").collect():
        i = r["doc_id"]
        nf = 1 + i % 4
        expect_idx = list(range(0, nf, 2))
        got = sorted(by_doc[i], key=lambda x: x["frame_idx"])
        assert [g["frame_idx"] for g in got] == expect_idx
        for g in got:
            f = g["frame_idx"]
            bx = np.arange(2)[None, :]
            by = np.arange(2)[:, None]
            v = 2 * ((i * 7 + f * 11 + bx * 13 + by * 29) % 128)
            assert g["sum_pix"] == 64 * int(v.sum())
            assert g["sumsq_pix"] == 64 * int((v * v).sum())


def test_wav_frame_features_exact(spark):
    """Frame energy and zero crossings equal a direct numpy computation on
    the generated waveform, including the partial last frame and channel-0
    de-interleave of stereo payloads."""
    import numpy as np
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(
        [(i, mm._build_wav(8000, 1 + i % 2, n_samples=37, seed=i))
         for i in (2, 5)], columns=["media_id", "payload"]))
    rows = mm.wav_frame_features(df, frame_size=16).collect()
    by = {}
    for r in rows:
        by[(r["media_id"], r["frame_idx"])] = r
    for i in (2, 5):
        ch = 1 + i % 2
        j = np.arange(37 * ch, dtype=np.int64)
        vals = ((i * 31 + j * 7919) % 65536) - 32768
        c0 = vals[::ch]
        neg = c0 < 0
        for fi in range(3):  # 16, 16, 5
            fr = c0[fi * 16 : (fi + 1) * 16]
            r = by[(i, fi)]
            assert r["n_samples"] == len(fr)
            assert r["energy"] == int((fr.astype(np.int64) ** 2).sum())
            lo = fi * 16
            zc = int((neg[lo + 1 : lo + len(fr)] != neg[lo : lo + len(fr) - 1]).sum())
            assert r["zero_crossings"] == zc


def test_wav_decimate_matches_full_decode(spark, sf_dir):
    from compss_python_spark.llm import multimodal
    from compss_python_spark.plans.registry import table
    from pyspark.sql import functions as F

    media = multimodal.synthesize_real_media(
        table(spark, sf_dir, "documents")
    ).filter(F.col("media_id") % 3 == 2).limit(20)
    full = {
        r["media_id"]: r
        for r in multimodal.wav_frame_features(media, frame_size=1).collect()
        if r["frame_idx"] == 0
    }
    dec = {r["media_id"]: r for r in multimodal.wav_decimate_stats(media, 1).collect()}
    # factor=1 decimation == channel-0 passthrough; spot-check energy of
    # frame 0 equals the first decimated sample's square
    for mid, r in dec.items():
        assert r["n_out"] >= 1
        f0 = full[mid]["energy"]
        assert f0 <= r["sumsq_pcm"]
    import pytest as _pt
    with _pt.raises(ValueError, match="factor"):
        multimodal.wav_decimate_stats(media, 0)


def test_image_ahash_brightness_invariance_and_near_dup(spark):
    """aHash is invariant to a constant brightness shift (all cells AND
    the mean move together) and to upscaling (NN downsample hits the
    same relative positions on a 2x pixel-doubled image); a structurally
    different image lands far away; banded pair stats find the near pair."""
    import numpy as np

    from compss_python_spark.llm import multimodal as M

    def png_of(arr):
        return M.encode_png(arr.astype(np.uint8))

    x = np.arange(16)[None, :, None]
    y = np.arange(16)[:, None, None]
    c = np.zeros((1, 1, 3), dtype=int)
    grad = (x + 2 * y + c).astype(np.uint8)
    bright = (x + 2 * y + c + 40).astype(np.uint8)
    big = np.repeat(np.repeat(grad, 2, axis=0), 2, axis=1)  # 32x32 upscale
    inv = (255 - (x + 2 * y + c)).astype(np.uint8)  # reversed gradient
    rows = [(1, png_of(grad)), (2, png_of(bright)), (3, png_of(big)), (4, png_of(inv))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    h = {r["media_id"]: r["ahash"] for r in M.image_ahash(media).collect()}
    assert h[1] == h[2] == h[3]
    assert bin((h[1] ^ h[4]) & ((1 << 64) - 1)).count("1") > 32  # complement-ish
    stats = {r["hamming"]: r["n_pairs"]
             for r in M.ahash_pair_stats(M.image_ahash(media), max_hamming=6).collect()}
    assert stats.get(0) == 3  # the three invariant copies pair up
