"""Ring dedup + right-handed transform fixtures (VerifyGeodesyUtils.java:112-209)."""

import numpy as np

from georay.geom.curves import curve_coordinate_list
from georay.geom.rings import remove_consecutive_duplicates, transform_ring_to_right_handed

# gml/Polygon-InteriorLinearRing.xml exterior (EPSG:4326, lat lon)
EXTERIOR_RING = np.array(
    [
        [49.1947, -123.1839],
        [49.2210, -122.7710],
        [49.2740, -122.9086],
        [49.3269, -122.9487],
        [49.3304, -123.2646],
        [49.1947, -123.1839],
    ]
)

# gml/Surface-PolygonPatch-3.xml exterior ring: tripartite curve
TRIPARTITE = {
    "kind": "Ring",
    "members": [
        {
            "kind": "Curve",
            "segments": [
                {"type": "GeodesicString", "coords": [[55.233333, -36.166667], [55.231164, -36.894373]]},
                {
                    "type": "ArcByCenterPoint",
                    "center": [55.233333, -36.166667],
                    "radius": 25.0,
                    "radius_uom": "NM",
                    "start_angle": 270.0,
                    "end_angle": 497.0,
                },
                {"type": "GeodesicString", "coords": [[54.928164, -35.674116], [55.233333, -36.166667]]},
            ],
        }
    ],
}


class TestRemoveConsecutiveDuplicates:
    def test_1ppm_duplicate_removed(self):
        # VerifyGeodesyUtils.removeConsecutiveDuplicates_1ppm
        coords = np.array(
            [[55.233333, -36.166667], [55.231164, -36.894373], [55.23116339, -36.89437371]]
        )
        assert len(remove_consecutive_duplicates(coords, 1)) == 2

    def test_no_duplicates_in_ring(self):
        coords = np.array(
            [
                [55.233333, -36.166667],
                [55.231164, -36.894373],
                [54.928164, -35.674116],
                [55.233333, -36.166667],
            ]
        )
        assert len(remove_consecutive_duplicates(coords, 1)) == 4

    def test_next_to_last_removed_preserves_closure(self):
        # VerifyGeodesyUtils.removeNextToLastDuplicate
        coords = np.array(
            [
                [557434.43, 4889943.44],
                [557416.84, 4889939.73],
                [557404.80, 4889951.77],
                [557402.02, 4889961.03],
                [557400.17, 4889969.36],
                [557400.17, 4889977.33],
                [557434.86, 4889943.52],
                [557434.43, 4889943.44],
            ]
        )
        out = remove_consecutive_duplicates(coords, 1)
        assert len(out) == 7
        assert np.array_equal(out[0], out[-1])

    def test_run_of_duplicates(self):
        coords = np.array([[1.0, 1.0], [1.0, 1.0], [1.0, 1.0], [2.0, 2.0]])
        assert len(remove_consecutive_duplicates(coords, 1)) == 2


class TestTransformRingToRightHanded:
    def test_linear_ring_axis_swap(self):
        # VerifyGeodesyUtils.transformRingToRightHandedCS_LinearRing: 6 coords,
        # first x == -123.1839 (the longitude)
        out = transform_ring_to_right_handed(EXTERIOR_RING, 4326)
        assert len(out) == 6
        assert out[0, 0] == np.float64(-123.1839)

    def test_linear_ring_keep_all(self):
        out = transform_ring_to_right_handed(EXTERIOR_RING, 4326, keep_all_coords=True)
        assert len(out) == 6
        assert out[0, 0] == np.float64(-123.1839)

    def test_tripartite_curve_7_vs_9(self):
        # VerifyGeodesyUtils.transformRingToRightHandedCS(KeepAllCoords)_TripartiteCurve:
        # 9 raw coords (2 + 5 arc + 2); 1ppm dedup collapses the segment
        # junctions -> 7; first x == -36.1667 (longitude, 1e-4 tolerance)
        raw = curve_coordinate_list(TRIPARTITE, 4326)
        assert len(raw) == 9
        kept = transform_ring_to_right_handed(raw, 4326, keep_all_coords=True)
        assert len(kept) == 9
        assert abs(kept[0, 0] - -36.1667) < 1e-4
        deduped = transform_ring_to_right_handed(raw, 4326)
        assert len(deduped) == 7
        assert abs(deduped[0, 0] - -36.1667) < 1e-4


class TestZeroOrdinateJavaSemantics:
    def test_zero_ordinate_duplicates_kept(self):
        # Java: 0/0 -> NaN, NaN <= tol is false -> NOT a duplicate
        # (code-review finding: points with a 0 ordinate are never removed)
        coords = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]])
        assert len(remove_consecutive_duplicates(coords, 1)) == 3

    def test_zero_x_nonzero_y(self):
        coords = np.array([[0.0, 5.0], [0.0, 5.0], [1.0, 1.0]])
        assert len(remove_consecutive_duplicates(coords, 1)) == 3
