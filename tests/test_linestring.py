"""Curve-operand predicates, replicating VerifyTopologicalRelationships
fixture cases that use LineString / MultiCurve operands."""

import numpy as np
import pytest

from georay.crs.geodesy import orthodromic_distance
from georay.crs.projections import transformer
from georay.geom.linestring import LineString, segment_segment_distance, segments_intersect
from georay.geom.polygon import Polygon

# gml/LineString.xml (EPSG:4326 lat,lon -> lon,lat)
LINESTRING_1 = LineString([[-121.5, 50.0], [-121.0, 50.5], [-120.7, 50.5]])

# gml/Polygon.xml exterior is far away near (6.93, 52.27); reuse from test_polygon
from tests.test_polygon import POLY, RING  # noqa: E402

# gml/Curve-LineString.xml coords (two LineString segments, EPSG:4326)
CURVE_LINESTRING = LineString(
    [
        [-123.140714, 49.274247],
        [-123.132265, 49.276956],
        [-123.125993, 49.281191],
        [-123.116355, 49.274977],
    ]
)

# gml/MultiCurve.xml members (harmonized to lon/lat 4326)
_m2_lon, _m2_lat = transformer(32632, 4326).transform(
    np.array([354404.0, 366851.0]), np.array([5455320.0, 5467981.0])
)
MULTICURVE = [
    LineString(
        [
            [8.007574, 50.840027],
            [7.707762, 50.792438],
            [7.510267, 50.778161],
            [7.277080, 50.787679],
            [7.042483, 50.806177],
        ]
    ),
    LineString(np.column_stack([_m2_lon, _m2_lat])),  # River-2.2 (UTM32N source)
    LineString([[-123.2125, 49.1778], [-122.9111, 49.2069]]),  # River-2.3
]

# gml/LineString-2.xml in EPSG:32632 -> 4326
_l2_lon, _l2_lat = transformer(32632, 4326).transform(
    np.array([430019.0, 420991.0]), np.array([5626603.0, 5639460.0])
)
LINESTRING_2 = LineString(np.column_stack([_l2_lon, _l2_lat]))

# gml/Polygon-32610.xml + gml/LineString-3.xml (both EPSG:32610)
POLYGON_32610 = Polygon(
    np.array(
        [
            [486602.0, 5449119.0],
            [516675.0, 5452049.0],
            [503729.0, 5463799.0],
            [480775.0, 5464220.0],
            [486602.0, 5449119.0],
        ]
    ),
    epsg=32610,
)
LINESTRING_3 = LineString([[516675.0, 5447049.0], [518675.0, 5445049.0]], epsg=32610)


class TestSegmentKernels:
    def test_crossing(self):
        hit = segments_intersect(
            np.array([[0.0, 0.0]]), np.array([[2.0, 2.0]]), np.array([[0.0, 2.0]]), np.array([[2.0, 0.0]])
        )
        assert hit[0, 0]

    def test_parallel_disjoint(self):
        hit = segments_intersect(
            np.array([[0.0, 0.0]]), np.array([[1.0, 0.0]]), np.array([[0.0, 1.0]]), np.array([[1.0, 1.0]])
        )
        assert not hit[0, 0]

    def test_collinear_overlap_and_touch(self):
        hit = segments_intersect(
            np.array([[0.0, 0.0], [0.0, 0.0]]),
            np.array([[2.0, 0.0], [1.0, 1.0]]),
            np.array([[1.0, 0.0], [1.0, 1.0]]),
            np.array([[3.0, 0.0], [2.0, 2.0]]),
        )
        assert hit[0, 0]  # collinear overlap
        assert hit[1, 1]  # endpoint touch

    def test_distance_zero_iff_intersecting(self):
        d = segment_segment_distance(
            np.array([[0.0, 0.0], [0.0, 0.0]]),
            np.array([[2.0, 2.0], [1.0, 0.0]]),
            np.array([[0.0, 2.0], [0.0, 1.0]]),
            np.array([[2.0, 0.0], [1.0, 1.0]]),
        )
        assert d[0, 0] == 0.0
        assert d[1, 1] == pytest.approx(1.0)


class TestFixtureCases:
    def test_curve_does_not_intersect_polygon(self):
        # VerifyTopologicalRelationships.curveDoesNotIntersectPolygon:
        # LineString.xml (near -121, 50) vs Polygon.xml (near 6.93, 52.27)
        assert not LINESTRING_1.intersects_polygon(POLY)

    def test_disjoint_curves(self):
        # disjointCurves: Curve-LineString.xml vs LineString.xml
        assert not CURVE_LINESTRING.intersects_line(LINESTRING_1)

    def test_multicurve_intersects_utm_linestring(self):
        # multiCurveWithCrsIntersectsUTMLineString: some member of
        # MultiCurve.xml intersects LineString-2.xml after harmonization
        assert any(m.intersects_line(LINESTRING_2) for m in MULTICURVE)

    def test_polygon_and_line_within_5km(self):
        # polygonAndLineWithin5km: Polygon-32610 vs LineString-3, DWithin
        # 5 km — planar nearest points then orthodromic distance (P-04)
        dist_planar, lp, pp = LINESTRING_3.min_distance_to_polygon(POLYGON_32610)
        assert dist_planar > 0  # line sits south of the polygon
        lon1, lat1 = transformer(32610, 4326).transform(lp[0], lp[1])
        lon2, lat2 = transformer(32610, 4326).transform(pp[0], pp[1])
        d = orthodromic_distance(lat1, lon1, lat2, lon2)
        assert d < 5000.0

    def test_line_crossing_polygon_intersects(self):
        line = LineString([[6.925, 52.270], [6.935, 52.270]])  # slices through POLY
        assert line.intersects_polygon(POLY)

    def test_line_fully_inside_polygon_intersects(self):
        line = LineString([[6.930, 52.270], [6.931, 52.2705]])
        assert line.intersects_polygon(POLY)

    def test_ring_as_linestring_vs_self(self):
        ring_line = LineString(RING)
        assert ring_line.intersects_line(ring_line)


class TestCrossingLineNearestPair:
    def test_crossing_line_distance_zero_with_coincident_pair(self):
        # all vertices outside but the line slices the square: the P-04
        # two-step must see a coincident pair (orthodromic distance 0)
        square = Polygon(np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float))
        line = LineString([[-5.0, 5.0], [15.0, 5.0]])
        d, lp, pp = line.min_distance_to_polygon(square)
        assert d == 0.0
        np.testing.assert_allclose(lp, pp)
        assert 0.0 <= lp[0] <= 10.0  # the pair sits on the boundary crossing
