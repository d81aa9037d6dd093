"""media_codecs: pure numpy/stdlib PNG/BMP/PPM/WAV codecs + the real
multimodal decode pipeline built on them."""

import numpy as np
import pytest

from geomesa_spark.functions import media_codecs as mc


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


class TestPng:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("shape", [(5, 7), (8, 3, 3), (4, 4, 4), (1, 1, 3)])
    def test_round_trip(self, rng, filter_type, shape):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = mc.decode_png(mc.encode_png(img, filter_type=filter_type))
        want = img.reshape(img.shape[0], img.shape[1], -1)
        assert np.array_equal(dec, want)

    def test_header_only(self, rng):
        img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        assert mc.png_header(mc.encode_png(img)) == (5, 6, 3)
        assert mc.image_header(mc.encode_png(img)) == (5, 6)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            mc.decode_png(b"not a png at all")

    def test_gray_channel_count(self, rng):
        img = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
        dec = mc.decode_png(mc.encode_png(img))
        assert dec.shape == (4, 6, 1)

    @pytest.mark.parametrize(
        "fts",
        [
            [0, 2, 2, 1, 2, 0, 2, 2],  # mixed 0/1/2: segmented-cumsum path
            [2, 2, 0, 1, 2, 2, 2, 2],  # run starts with filter 2 (prev=0)
            [0, 4, 2, 3, 1, 4, 3, 0],  # 3/4 interleaved: general path
        ],
    )
    def test_mixed_filter_rows_decode(self, rng, fts):
        """encode_png writes ONE filter for all rows, so the per-row-mixed
        decode paths (round-4 vectorization) need a hand-built stream."""
        import struct
        import zlib

        h, w, c = len(fts), 6, 3
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        flat = img.reshape(h, w * c)
        parts = []
        prev = np.zeros(w * c, dtype=np.uint8)
        for r, ft in enumerate(fts):
            parts.append(bytes([ft]))
            parts.append(mc._filter_row(ft, flat[r], prev, c).tobytes())
            prev = flat[r]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            mc.PNG_SIG
            + mc._chunk(b"IHDR", ihdr)
            + mc._chunk(b"IDAT", zlib.compress(b"".join(parts)))
            + mc._chunk(b"IEND", b"")
        )
        assert np.array_equal(mc.decode_png(data), img)


class TestBmpPpm:
    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5])
    def test_bmp_row_padding(self, rng, w):
        img = rng.integers(0, 256, size=(3, w, 3), dtype=np.uint8)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)

    def test_ppm_round_trip(self, rng):
        img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)

    def test_ppm_comment_header(self, rng):
        img = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
        data = mc.encode_ppm(img)
        data = b"P6\n# a comment\n2 2\n255\n" + data.split(b"255\n", 1)[1]
        assert np.array_equal(mc.decode_ppm(data), img)


class TestWav:
    def test_mono(self, rng):
        x = rng.normal(0, 8000, 1000).astype(np.int16)
        a, r = mc.decode_wav(mc.encode_wav(x, 8000))
        assert np.array_equal(a, x) and r == 8000

    def test_stereo(self, rng):
        x = rng.normal(0, 8000, (500, 2)).astype(np.int16)
        a, r = mc.decode_wav(mc.encode_wav(x, 44100))
        assert np.array_equal(a, x) and r == 44100


class TestSniffDispatch:
    def test_sniff(self, rng):
        img = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
        assert mc.sniff(mc.encode_png(img)) == "png"
        assert mc.sniff(mc.encode_bmp(img)) == "bmp"
        assert mc.sniff(mc.encode_ppm(img)) == "ppm"
        assert mc.sniff(mc.encode_wav(np.zeros(4, np.int16))) == "wav"
        assert mc.sniff(b"\xff\xd8\xff\xe0") == "jpeg"
        assert mc.sniff(b"??") is None

    def test_jpeg_is_the_declared_seam(self):
        with pytest.raises(NotImplementedError):
            mc.decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


class TestPixelOps:
    def test_resize_constant(self):
        const = np.full((10, 12, 3), 77, np.uint8)
        assert np.array_equal(
            mc.resize_bilinear(const, 5, 4), np.full((4, 5, 3), 77, np.uint8)
        )

    def test_resize_identity(self, rng):
        img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        assert np.array_equal(mc.resize_bilinear(img, 5, 6), img)

    def test_resize_2x_means(self):
        # checkerboard downscaled 2x: every target pixel straddles the
        # pattern, so values pull toward the mid-gray mean
        img = np.zeros((8, 8), np.uint8)
        img[::2, 1::2] = 255
        img[1::2, ::2] = 255
        small = mc.resize_bilinear(img, 4, 4).astype(np.float64)
        assert abs(small.mean() - 127.5) < 5

    def test_features_deterministic(self, rng):
        img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
        a, b = mc.image_features(img, 16), mc.image_features(img, 16)
        assert a.shape == (16,) and a.dtype == np.float32
        assert np.array_equal(a, b) and np.all(np.isfinite(a))

    def test_features_discriminate(self):
        dark = np.zeros((8, 8, 3), np.uint8)
        light = np.full((8, 8, 3), 250, np.uint8)
        fa, fb = mc.image_features(dark, 8), mc.image_features(light, 8)
        assert not np.array_equal(fa, fb)

    def test_audio_features(self, rng):
        x = (np.sin(np.linspace(0, 50, 2000)) * 10000).astype(np.int16)
        f = mc.audio_features(x, 16000, 8)
        assert f.shape == (8,) and np.all(np.isfinite(f))
        silent = mc.audio_features(np.zeros(100, np.int16), 16000, 8)
        assert silent[0] == 0.0


class TestSynth:
    def test_deterministic_and_decodable(self):
        fmts = set()
        for ref in [f"img_{i:03d}.png" for i in range(12)]:
            b = mc.synth_media_bytes(ref)
            assert b == mc.synth_media_bytes(ref)
            img = mc.decode_image(b)
            assert img.ndim == 3 and img.shape[2] == 3
            assert 16 <= img.shape[0] < 80 and 16 <= img.shape[1] < 80
            fmts.add(mc.sniff(b))
        assert fmts == {"png", "bmp", "ppm"}  # rotation covers every decoder


class TestSparkPipeline:
    def test_media_features_real_decode(self, spark, sf_dir):
        from geomesa_spark.operators import multimodal
        from geomesa_spark.sources import corpus

        docs = corpus.load_documents_spans(spark, sf_dir)
        feats = multimodal.media_features(docs.limit(50), feature_dim=8)
        pdf = feats.toPandas()
        assert len(pdf) > 0
        # real decode: dims equal the procedurally synthesized image's
        for _, r in pdf.head(10).iterrows():
            img = mc.decode_image(mc.synth_media_bytes(r["media_ref"]))
            assert (r["height"], r["width"]) == img.shape[:2]
            assert r["kind"] in ("png", "bmp", "ppm")
            want = mc.image_features(img, 8)
            assert np.allclose(np.array(r["feature"], dtype=np.float32), want)

    def test_media_features_bytes_col(self, spark, sf_dir):
        """Rows carrying their own binary payloads decode those payloads."""
        import pyspark.sql.functions as F

        from geomesa_spark.operators import multimodal
        from geomesa_spark.sources import corpus

        docs = corpus.load_documents_spans(spark, sf_dir).limit(20)
        img = np.full((9, 11, 3), 42, np.uint8)
        payload = mc.encode_png(img)
        docs = docs.withColumn("payload", F.lit(bytearray(payload)))
        pdf = multimodal.media_features(docs, feature_dim=8, bytes_col="payload").toPandas()
        assert len(pdf) > 0
        assert (pdf["width"] == 11).all() and (pdf["height"] == 9).all()
        assert (pdf["kind"] == "png").all()

    def test_resize_media_round_trip(self, spark, sf_dir):
        from geomesa_spark.operators import multimodal
        from geomesa_spark.sources import corpus

        docs = corpus.load_documents_spans(spark, sf_dir)
        out = multimodal.resize_media(docs.limit(20), 16, 12).toPandas()
        assert len(out) > 0
        for _, r in out.head(5).iterrows():
            img = mc.decode_png(bytes(r["png"]))
            assert img.shape == (12, 16, 3)
