"""Every stage must pass empty blocks through cleanly — at scale, blocks
routinely become empty after filters, and one crashing kernel kills the
whole streaming job."""

import pyarrow as pa

from georay.extract import extract_all_geo_batch, extract_geo_batch
from georay.stages.aggregate import cell_partial_agg, merge_cell_partials
from georay.stages.geo import Reproject, cellize, filter_has_geo


def no_geo_pages():
    return pa.table(
        {
            "url": ["a", "b"],
            "warc_ts": pa.array([0, 1], pa.timestamp("us")),
            "html": [b"<html>x</html>", b"<html>y</html>"],
            "text": ["x", "y"],
            "lang": ["en", "en"],
            "doc_id": pa.array([1, 2], pa.int64()),
        }
    )


class TestEmptyBlocks:
    def test_kernel_chain_on_all_filtered_batch(self):
        b = filter_has_geo(extract_geo_batch(no_geo_pages(), keep_text=False))
        assert b.num_rows == 0
        b = cellize(Reproject(4326)(b), 7)
        assert b.num_rows == 0
        p = cell_partial_agg(b.append_column("dummy", pa.array([], pa.int64())).drop_columns(["dummy"]))
        assert p.num_rows == 0
        assert merge_cell_partials(p).num_rows == 0

    def test_extract_all_on_no_geo(self):
        assert extract_all_geo_batch(no_geo_pages()).num_rows == 0

    def test_e2e_pipeline_all_no_geo(self, ray_session):
        import ray
        import ray.data

        from georay.pipelines.polygons import polygon_payload
        from georay.stages.join import make_spatial_join_fn

        payload = ray.put(polygon_payload())
        ds = ray.data.from_arrow(no_geo_pages())
        out = (
            ds.map_batches(lambda t: extract_geo_batch(t, keep_text=False), batch_format="pyarrow")
            .map_batches(filter_has_geo, batch_format="pyarrow")
            .map_batches(Reproject(4326), batch_format="pyarrow")
            .map_batches(lambda t: cellize(t, 7), batch_format="pyarrow")
            .map_batches(
                make_spatial_join_fn(payload, "INTERSECTS", keep_cols=("doc_id", "cell")),
                batch_format="pyarrow",
            )
        )
        assert out.count() == 0


class TestEmptyAnnAndLsh:
    def test_brute_force_knn_empty_batch(self):
        import numpy as np

        from georay.ann import BruteForceKNN

        actor = BruteForceKNN(
            {"query_id": np.array([0]), "vectors": np.ones((1, 4))}, k=3
        )
        empty = pa.table(
            {"vec_id": pa.array([], pa.int64()), "embedding": pa.array([], pa.list_(pa.float32()))}
        )
        out = actor(empty)
        assert out.num_rows == 0

    def test_lsh_keys_empty_batch(self, ray_session):
        import numpy as np
        import ray
        import ray.data

        from georay.dedup import embed_lsh_pairs

        empty = pa.table(
            {"vec_id": pa.array([], pa.int64()), "embedding": pa.array([], pa.list_(pa.float32()))}
        )
        ref = ray.put({"ids": np.array([], dtype=np.int64), "vectors": np.empty((0, 4))})
        out = embed_lsh_pairs(ray.data.from_arrow(empty), ref, threshold=0.5)
        assert out.count() == 0
