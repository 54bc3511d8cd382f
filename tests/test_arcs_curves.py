"""Arc densification + curve/surface factories (VerifyGmlUtils.java,
VerifyCurveCoordinateListFactory.java, VerifySurfaceCoordinateListFactory.java)."""

import numpy as np
import pytest

from georay.geom.arcs import TOTAL_ARC_POINTS, infer_points_on_arc
from georay.geom.curves import (
    curve_coordinate_list,
    extract_pos_list,
    geometry_coordinate_list,
    surface_exterior_boundary,
    surface_interior_boundaries,
)
from georay.uom import length_in_meters

YVR = (49.194722, -123.183889)  # lat-first (EPSG:4326 authority order)


class TestArcDensification:
    def test_arc_by_center_point(self):
        # Curve-ArcByCenterPoint.xml: radius 10 NM, start 90, end 360;
        # end of arc 10 NM north of center (VerifyGmlUtils.java:154-166)
        coords = infer_points_on_arc(*YVR, 10.0, "NM", 90.0, 360.0, epsg=4326)
        assert len(coords) == TOTAL_ARC_POINTS == 5
        end = coords[-1]
        assert end[0] == pytest.approx(49.19472 + 0.16653, abs=1.5e-4)  # latitude (x!)
        assert end[1] == pytest.approx(-123.18389, abs=1.5e-4)

    def test_circle_by_center_point(self):
        # Curve-CircleByCenterPoint.xml: radius 5 km circle; first point
        # north of center (VerifyGmlUtils.java:170-181)
        coords = infer_points_on_arc(*YVR, 5000.0, "m", epsg=4326)
        assert len(coords) == 5
        first = coords[0]
        assert first[0] == pytest.approx(49.19472 + 0.04496, abs=1.5e-4)
        assert first[1] == pytest.approx(-123.18389, abs=1.5e-4)
        # circle: first and last coincide (start 0 -> end 360)
        np.testing.assert_allclose(coords[0], coords[-1], atol=1e-9)

    def test_end_angle_zero_becomes_360(self):
        a = infer_points_on_arc(*YVR, 5000.0, "m", 0.0, 0.0, epsg=4326)
        b = infer_points_on_arc(*YVR, 5000.0, "m", 0.0, 360.0, epsg=4326)
        np.testing.assert_allclose(a, b)


class TestUom:
    def test_nautical_miles(self):
        # VerifyGmlUtils.convert100NauticalMiles
        assert length_in_meters(100.0, "M") == pytest.approx(185200, abs=1)
        assert length_in_meters(1.0, "NM") == 1852.0
        assert length_in_meters(1.0, "[nmi_i]") == 1852.0

    def test_km(self):
        assert length_in_meters(12.0, "km") == pytest.approx(12000, abs=0.5)

    def test_miles_and_uri_fragment(self):
        assert length_in_meters(1.0, "mi") == pytest.approx(1609.34)
        assert length_in_meters(2.0, "http://example.com/uom#km") == 2000.0

    def test_unknown_uom_raises(self):
        with pytest.raises(ValueError):
            length_in_meters(1.0, "furlong")


class TestCurveFactories:
    def test_curve_with_two_linestring_segments(self):
        # Curve-LineString.xml: 3 + 2 positions -> 5 coords, first
        # (49.274247, -123.140714) (VerifyCurveCoordinateListFactory.java:82-84)
        curve = {
            "kind": "Curve",
            "epsg": 4326,
            "segments": [
                {
                    "type": "LineString",
                    "coords": [[49.274247, -123.140714], [49.276956, -123.132265], [49.281191, -123.125993]],
                },
                {"type": "LineString", "coords": [[49.281191, -123.125993], [49.274977, -123.116355]]},
            ],
        }
        out = curve_coordinate_list(curve)
        assert len(out) == 5
        np.testing.assert_allclose(out[0], [49.274247, -123.140714])

    def test_composite_curve_8_points(self):
        # CompositeCurve.xml: LineString 5 pos + Arc 3 control points = 8
        # (member curves inherit the composite srsName, C-06)
        comp = {
            "kind": "CompositeCurve",
            "epsg": 4326,
            "members": [
                {
                    "kind": "LineString",
                    "coords": [
                        [49.702558, -123.0],
                        [49.649961, -123.0],
                        [49.540074, -123.183889],
                        [49.540074, -123.183889],
                        [49.361246, -123.183889],
                    ],
                },
                {
                    "kind": "Curve",
                    "segments": [
                        {
                            "type": "Arc",
                            "coords": [
                                [49.361246, -123.183889],
                                [49.040829, -123.086952],
                                [49.194442, -122.929795],
                            ],
                        }
                    ],
                },
            ],
        }
        assert len(curve_coordinate_list(comp)) == 8

    def test_orientable_curve_reversed(self):
        # OrientableCurve.xml: orientation '-' reverses base coords (C-07)
        base = {
            "kind": "Curve",
            "epsg": 4326,
            "segments": [
                {
                    "type": "LineString",
                    "coords": [[49.702558, -123.0], [49.649961, -123.0], [49.540074, -123.183889]],
                },
                {"type": "LineString", "coords": [[49.540074, -123.183889], [49.361246, -123.183889]]},
            ],
        }
        oc = {"kind": "OrientableCurve", "orientation": "-", "base": base}
        out = curve_coordinate_list(oc)
        assert len(out) == 5
        np.testing.assert_allclose(out[0], [49.361246, -123.183889])
        np.testing.assert_allclose(out[-1], [49.702558, -123.0])

    def test_tripartite_curve_9_points(self):
        # Curve-tripartite.xml (VerifyCurveCoordinateListFactory.java:95)
        curve = {
            "kind": "Curve",
            "epsg": 4326,
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
        assert len(curve_coordinate_list(curve)) == 9

    def test_missing_crs_raises(self):
        with pytest.raises(ValueError):
            curve_coordinate_list(
                {"kind": "Curve", "segments": [{"type": "LineString", "coords": [[0, 0], [1, 1]]}]}
            )

    def test_unknown_segment_raises(self):
        with pytest.raises(ValueError):
            curve_coordinate_list(
                {"kind": "Curve", "epsg": 4326, "segments": [{"type": "Clothoid", "coords": [[0, 0]]}]}
            )

    def test_extract_pos_list_drops_third_dim(self):
        out = extract_pos_list([1, 2, 99, 3, 4, 99], 3)
        np.testing.assert_allclose(out, [[1, 2], [3, 4]])


class TestSurfaceFactories:
    TWO_PATCHES = {
        "kind": "Surface",
        "epsg": 32610,
        "patches": [
            {
                "patch": "Polygon",
                "exterior": {
                    "kind": "Curve",
                    "segments": [
                        {
                            "type": "LineString",
                            "coords": [
                                [486602, 5449119],
                                [516675, 5452049],
                                [503729, 5463799],
                                [480775, 5464220],
                                [486602, 5449119],
                            ],
                        }
                    ],
                },
            },
            {
                "patch": "Polygon",
                "exterior": {
                    "kind": "Curve",
                    "segments": [
                        {
                            "type": "LineString",
                            "coords": [
                                [516675, 5452049],
                                [532639, 5473874],
                                [503729, 5463799],
                                [516675, 5452049],
                            ],
                        }
                    ],
                },
            },
        ],
    }

    def test_two_patch_union_6_points(self):
        # Surface-PolygonPatch-2.xml: union of adjacent patches -> 6 coords
        # (VerifySurfaceCoordinateListFactory.java:102)
        out = surface_exterior_boundary(self.TWO_PATCHES)
        assert len(out) == 6
        assert np.array_equal(out[0], out[-1])

    def test_polygon_exterior_and_interior(self):
        poly = {
            "kind": "Polygon",
            "epsg": 4326,
            "exterior": {"kind": "LinearRing", "coords": [[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]]},
            "interiors": [
                {"kind": "LinearRing", "coords": [[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]]}
            ],
        }
        assert len(surface_exterior_boundary(poly)) == 5
        ints = surface_interior_boundaries(poly)
        assert len(ints) == 1 and len(ints[0]) == 5

    def test_rectangle_patch_has_no_interiors(self):
        surf = {
            "kind": "Surface",
            "epsg": 4326,
            "patches": [
                {
                    "patch": "Rectangle",
                    "exterior": {"kind": "LinearRing", "coords": [[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]},
                    "interiors": [{"kind": "LinearRing", "coords": [[0, 0], [0, 1], [1, 1], [0, 0]]}],
                }
            ],
        }
        assert surface_interior_boundaries(surf) == []

    def test_multi_geometry_dispatch(self):
        multi = {
            "kind": "MultiPoint",
            "epsg": 4326,
            "members": [{"kind": "Point", "coords": [1, 2]}, {"kind": "Point", "coords": [3, 4]}],
        }
        out = geometry_coordinate_list(multi)
        np.testing.assert_allclose(out, [[1, 2], [3, 4]])


class TestPatchUnionGuards:
    def test_figure_eight_unions_through_touch_vertex(self):
        # two triangles sharing exactly one vertex: r2 raised on the
        # non-simple boundary; the overlay fold now traces the connected
        # union as one closed walk revisiting the touch vertex (JTS
        # unions this complex, SurfaceCoordinateListFactory.java:196)
        from georay.geom.curves import merge_patch_rings
        from georay.geom.union import _signed_area

        r1 = np.array([[0, 0], [2, 0], [1, 1], [0, 0]], dtype=float)
        r2 = np.array([[1, 1], [0, 2], [2, 2], [1, 1]], dtype=float)
        out = merge_patch_rings([r1, r2])
        assert _signed_area(out) == pytest.approx(2.0)  # 1 + 1, additive
        assert (np.all(out[:-1] == [1.0, 1.0], axis=1)).sum() == 2
