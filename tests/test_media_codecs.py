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

    def test_non_baseline_jpeg_is_the_declared_seam(self, rng):
        """Progressive (SOF2) stays behind the PIL seam; baseline decodes
        offline (round-5 verdict item 5)."""
        img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        data = bytearray(mc.encode_jpeg(img))
        i = bytes(data).find(b"\xff\xc0")
        data[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
        with pytest.raises(NotImplementedError):
            mc.decode_image(bytes(data))


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


class TestJpeg:
    """Baseline JPEG codec (functions/jpeg.py, ITU-T T.81) — round-5
    verdict item 5: synthetic round-trips, every decoder branch (sampling
    factors, restart intervals, grayscale), header parse, dispatch."""

    def _grad(self, h, w, seed=3):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack(
            [xx * 255 / max(w - 1, 1), yy * 255 / max(h - 1, 1),
             (xx + yy) * 255 / max(w + h - 2, 1)], axis=2)
        return np.clip(base + rng.integers(0, 32, (h, w, 3)), 0, 255).astype(np.uint8)

    def test_roundtrip_error_bounded_and_quality_monotone(self):
        from geomesa_spark.functions import jpeg

        img = self._grad(45, 61)
        errs = []
        for q in (50, 75, 92):
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
            assert out.shape == img.shape and out.dtype == np.uint8
            errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
        assert errs[-1] < errs[0] < 12.0  # lossy but close; higher q → closer

    def test_flat_image_roundtrips_exactly(self):
        from geomesa_spark.functions import jpeg

        for v in (0, 128, 200):
            img = np.full((24, 17, 3), v, np.uint8)
            assert (jpeg.decode_jpeg(jpeg.encode_jpeg(img, 75)) == img).all()
        gray = np.full((9, 9, 1), 77, np.uint8)
        assert (jpeg.decode_jpeg(jpeg.encode_jpeg(gray, 75)) == gray).all()

    def test_grayscale_and_odd_dims(self):
        from geomesa_spark.functions import jpeg

        img = self._grad(33, 20)[:, :, :1]
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85))
        assert out.shape == (33, 20, 1)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 8.0
        tiny = jpeg.decode_jpeg(jpeg.encode_jpeg(self._grad(1, 1), 75))
        assert tiny.shape == (1, 1, 3)

    def test_subsampling_modes_decode(self):
        from geomesa_spark.functions import jpeg

        img = self._grad(45, 61)
        for sub in ("444", "422", "420"):
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 80, subsampling=sub))
            assert out.shape == img.shape
            assert np.abs(out.astype(int) - img.astype(int)).mean() < 12.0, sub

    def test_restart_intervals_bit_exact(self):
        """The SAME quantized image must reconstruct identically whether
        the scan uses restart markers or not (DRI/RSTn path)."""
        from geomesa_spark.functions import jpeg

        img = self._grad(45, 61)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 80))
        for ri in (1, 2, 5):
            got = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 80, restart_interval=ri))
            assert (got == base).all(), ri

    def test_header_and_dispatch(self):
        from geomesa_spark.functions import jpeg

        img = self._grad(29, 51)
        data = jpeg.encode_jpeg(img, 75)
        assert mc.sniff(data) == "jpeg"
        assert jpeg.jpeg_header(data) == (51, 29)
        assert mc.image_header(data) == (51, 29)
        assert mc.decode_image(data).shape == (29, 51, 3)

    def test_huffman_tables_roundtrip_canonical(self):
        """Every Annex-K symbol decodes back through the 16-bit LUT at its
        own code length (canonical Huffman self-consistency)."""
        from geomesa_spark.functions import jpeg

        for bits, vals in (jpeg.HUFF_DC_LUMA, jpeg.HUFF_AC_LUMA,
                           jpeg.HUFF_DC_CHROMA, jpeg.HUFF_AC_CHROMA):
            codes = jpeg._huff_codes(bits, vals)
            lut = jpeg._huff_lut(bits, vals)
            for sym, (code, ln) in codes.items():
                packed = lut[code << (16 - ln)]
                assert packed == (sym << 8) | ln


class TestSynth:
    def test_deterministic_and_decodable(self):
        fmts = set()
        for ref in [f"img_{i:03d}.png" for i in range(48)]:
            b = mc.synth_media_bytes(ref)
            assert b == mc.synth_media_bytes(ref)
            img = mc.decode_image(b)
            assert img.ndim == 3 and img.shape[2] == 3
            assert 16 <= img.shape[0] < 80 and 16 <= img.shape[1] < 80
            fmts.add(mc.sniff(b))
        # rotation covers every decoder incl. the round-5 jpeg slice
        assert fmts == {"png", "bmp", "ppm", "jpeg"}


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
            assert r["kind"] in ("png", "bmp", "ppm", "jpeg")
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
