"""User-extension registry (SURVEY §2.10: the reference extends via
CurveSegmentType/SurfacePatchType enum variants + class->kind map entries,
unknown kinds raise — CurveCoordinateListFactory.java:50-62,106-107)."""

import numpy as np
import pytest

from georay import registry
from georay.geom.curves import curve_coordinate_list, surface_exterior_boundary


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    for name in ("Bezierish", "Spiral", "Hexagon"):
        registry.unregister(name)


class TestSegmentExtension:
    def test_custom_segment_kind(self):
        def bezierish(seg, epsg, latlon):
            c = np.asarray(seg["coords"], dtype=np.float64)
            mid = (c[0] + c[-1]) / 2.0
            return np.vstack([c[0], mid, c[-1]])

        registry.register_segment_type("Bezierish", bezierish, min_positions=2)
        curve = {
            "kind": "Curve",
            "epsg": 4326,
            "segments": [{"type": "Bezierish", "coords": [[0.0, 0.0], [2.0, 2.0]]}],
        }
        out = curve_coordinate_list(curve)
        np.testing.assert_allclose(out, [[0, 0], [1, 1], [2, 2]])

    def test_unknown_still_raises(self):
        with pytest.raises(ValueError):
            curve_coordinate_list(
                {"kind": "Curve", "epsg": 4326,
                 "segments": [{"type": "Clothoid", "coords": [[0, 0], [1, 1]]}]}
            )

    def test_min_positions_enforced_for_extension(self):
        registry.register_segment_type(
            "Bezierish", lambda seg, e, l: np.asarray(seg["coords"], float), min_positions=4
        )
        with pytest.raises(ValueError):
            curve_coordinate_list(
                {"kind": "Curve", "epsg": 4326,
                 "segments": [{"type": "Bezierish", "coords": [[0, 0], [1, 1]]}]}
            )


class TestCurveKindExtension:
    def test_custom_container(self):
        def spiral(geom, epsg, latlon):
            t = np.linspace(0, 1, geom["n"])
            return np.column_stack([t, t * t])

        registry.register_curve_kind("Spiral", spiral)
        out = curve_coordinate_list({"kind": "Spiral", "epsg": 4326, "n": 5})
        assert out.shape == (5, 2)

    def test_bad_return_shape_rejected(self):
        registry.register_curve_kind("Spiral", lambda g, e, l: np.zeros(3))
        with pytest.raises(ValueError):
            curve_coordinate_list({"kind": "Spiral", "epsg": 4326})


class TestPatchExtension:
    def test_custom_patch_kind(self):
        def hexagon(patch, epsg):
            ang = np.linspace(0, 2 * np.pi, 7)
            c = np.asarray(patch["center"], float)
            return np.column_stack([c[0] + np.cos(ang), c[1] + np.sin(ang)])

        registry.register_patch_kind("Hexagon", hexagon)
        surf = {
            "kind": "Surface",
            "epsg": 4326,
            "patches": [{"patch": "Hexagon", "center": [10.0, 20.0]}],
        }
        out = surface_exterior_boundary(surf)
        assert len(out) == 7
        np.testing.assert_allclose(out[0], out[-1])


class TestWorkerPropagation:
    def test_registered_kernel_runs_inside_ray_stage(self, ray_session):
        """Regression (ADVICE r2): the registry is driver-process module
        state; Ray workers import georay fresh, so a kernel registered on
        the driver must be replayed into the worker via with_registry —
        without it the distributed stage raises unknown-kind ValueError."""
        import pyarrow as pa
        import ray.data

        def spiral(geom, epsg, latlon):
            t = np.linspace(0.0, 1.0, int(geom["n"]))
            return np.column_stack([t, t * t])

        registry.register_curve_kind("Spiral", spiral)

        def batch_fn(b: pa.Table) -> pa.Table:
            ns = b.column("n").to_pylist()
            counts = [
                len(curve_coordinate_list({"kind": "Spiral", "epsg": 4326, "n": n}))
                for n in ns
            ]
            return pa.table({"n": b.column("n"), "n_coords": pa.array(counts, pa.int64())})

        ds = ray.data.from_arrow(pa.table({"n": pa.array([3, 5], pa.int64())}))
        out = (
            ds.map_batches(registry.with_registry(batch_fn), batch_format="pyarrow")
            .to_pandas()
            .sort_values("n")
        )
        assert out.n_coords.tolist() == [3, 5]

    def test_with_registry_is_passthrough_when_empty(self):
        fn = lambda b: b
        assert registry.with_registry(fn) is fn

    def test_snapshot_restore_roundtrip_includes_min_positions(self):
        from georay.geom import curves

        registry.register_segment_type(
            "Bezierish", lambda seg, e, l: np.asarray(seg["coords"], float), min_positions=4
        )
        snap = registry.snapshot()
        registry.unregister("Bezierish")
        assert "Bezierish" not in curves.MIN_SEGMENT_POSITIONS
        registry.restore(snap)
        assert curves.MIN_SEGMENT_POSITIONS["Bezierish"] == 4
        assert "Bezierish" in registry.SEGMENT_KERNELS


class TestBuiltinShadowRejected:
    def test_segment_builtin_rejected(self):
        with pytest.raises(ValueError):
            registry.register_segment_type("LineString", lambda s, e, l: None)

    def test_curve_kind_builtin_rejected(self):
        with pytest.raises(ValueError):
            registry.register_curve_kind("Curve", lambda g, e, l: None)

    def test_patch_builtin_rejected(self):
        with pytest.raises(ValueError):
            registry.register_patch_kind("Polygon", lambda p, e: None)

    def test_min_positions_validates_input_not_output(self):
        # a densifying kernel returning many samples must not mask a
        # too-short INPUT segment
        registry.register_segment_type(
            "Bezierish",
            lambda seg, e, l: np.column_stack([np.linspace(0, 1, 50), np.zeros(50)]),
            min_positions=4,
        )
        with pytest.raises(ValueError):
            curve_coordinate_list(
                {"kind": "Curve", "epsg": 4326,
                 "segments": [{"type": "Bezierish", "coords": [[0, 0], [1, 1]]}]}
            )
