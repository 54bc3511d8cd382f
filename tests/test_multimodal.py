"""Multimodal stage plumbing (decode stubbed, pipeline shape real)."""

import numpy as np
import pyarrow as pa
import pytest

from georay.multimodal import (
    DECODED_SCHEMA,
    FrameSampleStage,
    ImageDecodeStage,
    ResizeStage,
    synth_media_batch,
)


def media(n=8):
    ids = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    return synth_media_batch(ids)


class TestDecode:
    def test_fake_decode_schema_and_determinism(self):
        b = media()
        out1 = ImageDecodeStage(fake=True)(b)
        out2 = ImageDecodeStage(fake=True)(b)
        assert out1.schema.names == DECODED_SCHEMA.names
        assert out1.equals(out2)

    def test_real_decode_rejects_compressed_formats(self):
        b = pa.table(
            {"media_id": pa.array([1], pa.int64()),
             "mime": pa.array(["image/jpeg"]),
             "payload": pa.array([b"\xff\xd8\xff\xe0 jpeg bytes"], pa.binary())}
        )
        with pytest.raises(ValueError, match="undecodable image payload"):
            ImageDecodeStage(fake=False)(b)

    def test_feature_dim(self):
        out = ImageDecodeStage(fake=True, feature_dim=16)(media(2))
        assert len(out.column("feature").to_pylist()[0]) == 16


class TestResize:
    def test_caps_max_side_preserving_aspect(self):
        decoded = ImageDecodeStage(fake=True)(media(16))
        out = ResizeStage(max_side=128)(decoded)
        w = np.asarray(out.column("width").to_pylist())
        h = np.asarray(out.column("height").to_pylist())
        assert (np.maximum(w, h) <= 128).all()


class TestFrameSample:
    def test_flat_map_layout(self):
        out = FrameSampleStage(n_frames=3)(media(4))
        assert out.num_rows == 12
        assert out.column("frame_idx").to_pylist()[:3] == [0, 1, 2]
        # frames are distinct per index
        p = out.column("frame_payload").to_pylist()
        assert p[0] != p[1]


class TestPipelineIntegration:
    def test_ray_actor_pool_stage(self, ray_session):
        import ray.data

        ds = ray.data.range(32).map_batches(
            lambda b: synth_media_batch(pa.table({"doc_id": pa.array(b["id"], pa.int64())})),
            batch_format="numpy",
        )
        decoded = ds.map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs={"fake": True},
            batch_format="pyarrow",
            batch_size=8,  # media rows are big: small batches (SURVEY §4)
            concurrency=2,
        )
        out = decoded.to_pandas()
        assert len(out) == 32
        assert set(DECODED_SCHEMA.names) == set(out.columns)


def _gradient_img(w=40, h=20):
    """Deterministic RGB test image: x-gradient red, y-gradient green."""
    x = np.tile(np.arange(w, dtype=np.uint8) * (255 // max(1, w - 1)), (h, 1))
    y = np.tile((np.arange(h, dtype=np.uint8) * (255 // max(1, h - 1)))[:, None], (1, w))
    return np.stack([x, y, np.full((h, w), 7, np.uint8)], axis=2)


def _bmp_bytes(img):
    """Minimal 24-bit bottom-up BMP writer (test fixture only)."""
    import struct

    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    bgr = img[..., ::-1]
    for r in range(h - 1, -1, -1):
        rows.append(bgr[r].tobytes() + b"\x00" * (stride - w * 3))
    raster = b"".join(rows)
    return (
        b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
        + raster
    )


class TestRealCodecs:
    """fake=False is REAL for uncompressed formats: pure-numpy PPM/PGM/BMP
    image decode, PCM-16 WAV audio, concatenated-PPM frame sampling."""

    def test_ppm_decode_real(self):
        from georay.codecs import encode_ppm

        img = _gradient_img()
        b = pa.table(
            {"media_id": pa.array([7], pa.int64()),
             "mime": pa.array(["image/x-portable-pixmap"]),
             "payload": pa.array([encode_ppm(img)], pa.binary())}
        )
        out = ImageDecodeStage(fake=False)(b)
        assert out.column("width").to_pylist() == [40]
        assert out.column("height").to_pylist() == [20]
        assert out.column("n_channels").to_pylist() == [3]
        expected_luma = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).mean() / 255.0
        assert out.column("mean_luma").to_pylist()[0] == pytest.approx(expected_luma)
        feat = out.column("feature").to_pylist()[0]
        assert len(feat) == 8
        # x-gradient: strip means must increase left to right
        assert feat == sorted(feat)

    def test_bmp_decode_matches_ppm(self):
        from georay.codecs import encode_ppm

        img = _gradient_img(17, 9)  # odd width exercises BMP row padding
        mk = lambda p: pa.table(
            {"media_id": pa.array([1], pa.int64()),
             "mime": pa.array(["x"]),
             "payload": pa.array([p], pa.binary())}
        )
        stage = ImageDecodeStage(fake=False)
        out_ppm = stage(mk(encode_ppm(img)))
        out_bmp = stage(mk(_bmp_bytes(img)))
        assert out_ppm.equals(out_bmp)

    def test_pgm_grayscale(self):
        from georay.codecs import encode_ppm

        gray = np.full((10, 10), 128, np.uint8)
        b = pa.table(
            {"media_id": pa.array([1], pa.int64()),
             "mime": pa.array(["image/x-portable-graymap"]),
             "payload": pa.array([encode_ppm(gray)], pa.binary())}
        )
        out = ImageDecodeStage(fake=False)(b)
        assert out.column("n_channels").to_pylist() == [1]
        assert out.column("mean_luma").to_pylist()[0] == pytest.approx(128 / 255)

    def test_ppm_comment_header(self):
        from georay.codecs import decode_pnm

        raw = b"P5\n# a comment\n2 2\n255\n\x01\x02\x03\x04"
        assert decode_pnm(raw).tolist() == [[1, 2], [3, 4]]

    def test_truncated_raster_raises(self):
        from georay.codecs import decode_pnm

        with pytest.raises(ValueError, match="truncated"):
            decode_pnm(b"P6\n4 4\n255\n\x00\x00")

    def test_resize_real_reencodes_payload(self):
        from georay.codecs import decode_pnm, encode_ppm

        img = _gradient_img(200, 100)
        b = pa.table(
            {"media_id": pa.array([3], pa.int64()),
             "mime": pa.array(["image/x-portable-pixmap"]),
             "payload": pa.array([encode_ppm(img)], pa.binary())}
        )
        out = ResizeStage(max_side=50, fake=False)(b)
        assert out.column("width").to_pylist() == [50]
        assert out.column("height").to_pylist() == [25]
        resized = decode_pnm(out.column("payload").to_pylist()[0])
        assert resized.shape == (25, 50, 3)
        # nearest-neighbour of a gradient keeps corner values
        assert resized[0, 0, 0] == img[0, 0, 0]

    def test_frame_sample_real_ppm_stream(self):
        from georay.codecs import decode_pnm, encode_ppm

        frames = [np.full((4, 4, 3), v, np.uint8) for v in (10, 20, 30, 40, 50, 60)]
        stream = b"".join(encode_ppm(f) for f in frames)
        b = pa.table(
            {"media_id": pa.array([9], pa.int64()),
             "mime": pa.array(["video/x-ppm-stream"]),
             "payload": pa.array([stream], pa.binary())}
        )
        out = FrameSampleStage(n_frames=3, fake=False)(b)
        assert out.column("frame_idx").to_pylist() == [0, 2, 4]
        sampled = [decode_pnm(p)[0, 0, 0] for p in out.column("frame_payload").to_pylist()]
        assert sampled == [10, 30, 50]

    def test_audio_wav_band_energies(self):
        from georay.codecs import encode_wav
        from georay.multimodal import AudioFeatureStage

        rate = 8000
        t = np.arange(rate * 3) / rate  # 3 s
        tone = 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        b = pa.table(
            {"media_id": pa.array([5], pa.int64()),
             "mime": pa.array(["audio/wav"]),
             "payload": pa.array([encode_wav(rate, tone)], pa.binary())}
        )
        out = AudioFeatureStage(fake=False, n_mels=8, hop_ms=1000)(b)
        assert out.num_rows == 3  # one frame per second
        feats = np.asarray(out.column("feature").to_pylist())
        assert feats.shape == (3, 8)
        # 440 Hz at 8 kHz lands in the lowest of 8 linear bands (0-500 Hz)
        assert (feats.argmax(axis=1) == 0).all()

    def test_real_decode_actor_pool_e2e(self, ray_session):
        """The verdict's done bar: a real fixture payload decoded through
        the actual Ray actor-pool stage with fake=False."""
        import ray.data

        from georay.codecs import encode_ppm

        tables = [
            pa.table(
                {"media_id": pa.array([i], pa.int64()),
                 "mime": pa.array(["image/x-portable-pixmap"]),
                 "payload": pa.array([encode_ppm(_gradient_img(16 + i, 8 + i))], pa.binary())}
            )
            for i in range(8)
        ]
        ds = ray.data.from_arrow(pa.concat_tables(tables))
        out = ds.map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs={"fake": False},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        ).to_pandas()
        assert sorted(out.width) == [16 + i for i in range(8)]
        assert (out.n_channels == 3).all()


class TestOptionalCompressedDecoder:
    def test_hook_resolves_or_none(self):
        from georay.codecs import optional_image_decoder

        dec = optional_image_decoder()
        assert dec is None or callable(dec)
        try:
            import PIL  # noqa: F401
            has_lib = True
        except ImportError:
            try:
                import imageio  # noqa: F401
                has_lib = True
            except ImportError:
                has_lib = False
        assert (dec is not None) == has_lib

    def test_injected_decoder_used_for_unknown_magic(self):
        from georay.multimodal import ImageDecodeStage

        stage = ImageDecodeStage(fake=False, feature_dim=4)
        stage._ext = lambda buf: np.full((4, 6, 3), 128, np.uint8)
        w, h, ch, lm, feat = stage._decode_real(b"\x89PNG\r\n\x1a\nxxxx")
        assert (w, h, ch) == (6, 4, 3)
        assert abs(lm - 128 / 255) < 1e-9
        assert len(feat) == 4

    def test_injected_decoder_bad_dtype_raises(self):
        import pytest

        from georay.multimodal import ImageDecodeStage

        stage = ImageDecodeStage(fake=False)
        stage._ext = lambda buf: np.zeros((4, 6), np.float32)
        with pytest.raises(ValueError, match="external decoder"):
            stage._decode_real(b"\x89PNGxxxx")

    def test_no_decoder_raises_with_install_hint(self):
        import pytest

        from georay.multimodal import ImageDecodeStage

        stage = ImageDecodeStage(fake=False)
        stage._ext = None
        with pytest.raises(ValueError, match="pillow or"):
            stage._decode_real(b"\x89PNGxxxx")
