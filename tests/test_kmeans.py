"""Distributed Lloyd's k-means (georay.ann.kmeans_assign)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from georay.ann import CENTROID_SCALE, DIST_SCALE, kmeans_assign


def _emb_table(vecs, ids=None):
    ids = ids if ids is not None else list(range(len(vecs)))
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )


def _numpy_lloyd(vecs32: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Reference replay with the engine's exact quantization rules."""
    X = vecs32.astype(np.float64)
    order = np.argsort(ids)
    C = X[order[:k]].copy()
    assign = None
    for it in range(iters):
        diff = X[:, None, :] - C[None, :, :]
        qd = np.floor(diff * diff * DIST_SCALE + 0.5).astype(np.int64).sum(axis=2)
        assign = np.argmin(qd, axis=1)
        if it == iters - 1:
            break
        q = np.floor(X * CENTROID_SCALE + 0.5).astype(np.int64)
        for c in range(k):
            m = assign == c
            if m.any():
                C[c] = q[m].sum(axis=0).astype(np.float64) / (
                    CENTROID_SCALE * float(m.sum())
                )
    return assign


class TestKMeans:
    def test_matches_numpy_replay_multiblock(self, ray_session):
        rng = np.random.default_rng(11)
        # three well-separated blobs + noise, float32 like the testdata
        centers = np.array([[0, 0], [10, 0], [0, 10]], np.float64)
        vecs = np.concatenate(
            [rng.normal(c, 0.5, size=(60, 2)) for c in centers]
        ).astype(np.float32)
        ids = rng.permutation(len(vecs)).astype(np.int64)
        ds = ray.data.from_arrow(_emb_table(vecs, ids)).repartition(5)
        out = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_assign(ds, k=3, iters=2).take_all()
        }
        expect = _numpy_lloyd(vecs, ids, k=3, iters=2)
        for i in range(len(vecs)):
            assert out[ids[i]] == expect[i]

    def test_clusters_recover_blobs(self, ray_session):
        rng = np.random.default_rng(3)
        a = rng.normal([0, 0, 0], 0.1, size=(40, 3))
        b = rng.normal([5, 5, 5], 0.1, size=(40, 3))
        vecs = np.concatenate([a, b]).astype(np.float32)
        ds = ray.data.from_arrow(_emb_table(vecs))
        rows = kmeans_assign(ds, k=2, iters=3).take_all()
        lab = np.array([r["cluster"] for r in sorted(rows, key=lambda r: r["vec_id"])])
        assert len(set(lab[:40])) == 1 and len(set(lab[40:])) == 1
        assert lab[0] != lab[40]

    def test_empty_input_raises(self, ray_session):
        ds = ray.data.from_arrow(_emb_table(np.empty((0, 2), np.float32)))
        with pytest.raises(ValueError, match="empty"):
            kmeans_assign(ds, k=2)

    def test_single_iter_uses_seed_centroids(self, ray_session):
        vecs = np.array([[0.0, 0.0], [4.0, 4.0], [0.1, 0.1], [3.9, 3.9]], np.float32)
        ds = ray.data.from_arrow(_emb_table(vecs))
        rows = sorted(
            kmeans_assign(ds, k=2, iters=1).take_all(), key=lambda r: r["vec_id"]
        )
        assert [r["cluster"] for r in rows] == [0, 1, 0, 1]
