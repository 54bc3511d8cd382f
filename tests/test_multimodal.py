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

    def test_real_decode_is_explicitly_stubbed(self):
        with pytest.raises(NotImplementedError):
            ImageDecodeStage(fake=False)

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
