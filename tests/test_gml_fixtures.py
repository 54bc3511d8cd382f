"""Conformance against the reference's OWN fixture XML files.

Parses /root/reference/src/test/resources/** with georay.gmlio (read-only)
and replays the reference's JUnit assertions — the exact expected values
from Verify*.java — through the georay kernels.  This is the strongest
parity evidence: same inputs, same expected outputs, different engine.
"""

import numpy as np
import pytest

from georay.crs.geodesy import orthodromic_distance
from georay.geom.curves import (
    geometry_coordinate_list,
    surface_exterior_boundary,
    surface_interior_boundaries,
)
from georay.geom.envelope import antipodal_envelope
from georay.geom.hull import convex_hull
from georay.geom.polygon import Polygon
from georay.geom.rings import transform_ring_to_right_handed
from georay.gmlio import (
    is_spatially_related,
    parse_envelope_file,
    parse_gml_file,
    prepare_geometry,
)
from georay.uom import length_in_meters

FIX = "/root/reference/src/test/resources"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(FIX), reason="reference fixture corpus not present"
)


def gml(name):
    return parse_gml_file(f"{FIX}/gml/{name}")


class TestCurveCoordinateCounts:
    """VerifyCurveCoordinateListFactory.java:43-108 expected counts."""

    def test_arc_by_center_point_5(self):
        assert len(geometry_coordinate_list(gml("Curve-ArcByCenterPoint.xml"))) == 5

    def test_arc_3_control_points(self):
        assert len(geometry_coordinate_list(gml("Curve-Arc.xml"))) == 3

    def test_composite_curve_8(self):
        assert len(geometry_coordinate_list(gml("CompositeCurve.xml"))) == 8

    def test_curve_linestring_5_and_first_coord(self):
        coords = geometry_coordinate_list(gml("Curve-LineString.xml"))
        assert len(coords) == 5
        np.testing.assert_allclose(coords[0], [49.274247, -123.140714])

    def test_tripartite_9(self):
        assert len(geometry_coordinate_list(gml("Curve-tripartite.xml"))) == 9

    def test_polygon_exterior_42(self):
        assert len(surface_exterior_boundary(gml("Polygon.xml"))) == 42


class TestSurfaceCoordinateCounts:
    """VerifySurfaceCoordinateListFactory.java:46-128 expected counts."""

    def test_polygon_interior_9(self):
        ints = surface_interior_boundaries(gml("Polygon.xml"))
        assert len(ints) == 1 and len(ints[0]) == 9

    def test_surface_patch1_ext_42_int_9(self):
        s = gml("Surface-PolygonPatch-1.xml")
        assert len(surface_exterior_boundary(s)) == 42
        ints = surface_interior_boundaries(s)
        assert len(ints[0]) == 9

    def test_surface_two_patches_union_6(self):
        assert len(surface_exterior_boundary(gml("Surface-PolygonPatch-2.xml"))) == 6

    def test_surface_tripartite_9(self):
        assert len(surface_exterior_boundary(gml("Surface-PolygonPatch-3.xml"))) == 9

    def test_aixm_surface_ext_10(self):
        assert len(surface_exterior_boundary(gml("AIXMSurface.xml"))) == 10

    def test_aixm_surface2_interior_4(self):
        ints = surface_interior_boundaries(gml("AIXMSurface-2.xml"))
        assert len(ints) >= 1 and len(ints[0]) == 4


class TestRightHandedTransforms:
    """VerifyGeodesyUtils.java:112-165 from the actual fixture files."""

    def test_polygon_interior_linear_ring_6_coords(self):
        poly = gml("Polygon-InteriorLinearRing.xml")
        ring = geometry_coordinate_list(poly["exterior"], poly["epsg"])
        out = transform_ring_to_right_handed(ring, poly["epsg"])
        assert len(out) == 6
        assert out[0, 0] == pytest.approx(-123.1839, abs=1e-4)

    def test_surface_patch3_7_vs_9(self):
        surf = gml("Surface-PolygonPatch-3.xml")
        ring = geometry_coordinate_list(surf["patches"][0]["exterior"], surf["epsg"])
        keep_all = transform_ring_to_right_handed(ring, surf["epsg"], keep_all_coords=True)
        deduped = transform_ring_to_right_handed(ring, surf["epsg"])
        assert len(keep_all) == 9
        assert len(deduped) == 7
        assert deduped[0, 0] == pytest.approx(-36.1667, abs=1e-4)


class TestTopologicalRelationshipsE2E:
    """VerifyTopologicalRelationships.java — whole EP-1 path from XML."""

    def test_point_utm32n_intersects_polygon(self):
        assert is_spatially_related("INTERSECTS", gml("Point-UTM32N.xml"), gml("Polygon.xml"))

    def test_curve_does_not_intersect_polygon(self):
        assert not is_spatially_related("INTERSECTS", gml("LineString.xml"), gml("Polygon.xml"))

    def test_point_intersects_multisurface(self):
        assert is_spatially_related("INTERSECTS", gml("MultiSurface.xml"), gml("Point.xml"))

    def test_point_http_srsname_intersects_multisurface(self):
        assert is_spatially_related(
            "INTERSECTS", gml("MultiSurface.xml"), gml("Point-srsName-http.xml")
        )

    def test_multicurve_intersects_utm_linestring(self):
        assert is_spatially_related("INTERSECTS", gml("MultiCurve.xml"), gml("LineString-2.xml"))

    def test_disjoint_curves(self):
        assert is_spatially_related("DISJOINT", gml("Curve-LineString.xml"), gml("LineString.xml"))

    def test_polygon_contains_point2(self):
        assert is_spatially_related("CONTAINS", gml("Polygon.xml"), gml("Point-2.xml"))

    def test_point2_within_polygon(self):
        assert is_spatially_related("WITHIN", gml("Point-2.xml"), gml("Polygon.xml"))

    def test_points_within_8km_projected(self):
        # pointsWithin8km_PROJCS: Atkinson/Jericho in EPSG:32610, 8 km uom
        _, p1 = prepare_geometry(gml("Point-Atkinson-32610.xml"))
        _, p2 = prepare_geometry(gml("Point-Jericho-32610.xml"))
        d = orthodromic_distance(p1[1], p1[0], p2[1], p2[0])
        assert d < length_in_meters(8.0, "km")

    def test_points_not_within_3nmi_geographic(self):
        _, p1 = prepare_geometry(gml("Point-Atkinson-4326.xml"))
        _, p2 = prepare_geometry(gml("Point-Jericho-4326.xml"))
        d = orthodromic_distance(p1[1], p1[0], p2[1], p2[0])
        assert d > length_in_meters(3.0, "[nmi_i]")

    def test_polygon_and_line_within_5km(self):
        _, poly = prepare_geometry(gml("Polygon-32610.xml"))
        _, line = prepare_geometry(gml("LineString-3.xml"))
        _, lp, pp = line.min_distance_to_polygon(poly)
        d = orthodromic_distance(lp[1], lp[0], pp[1], pp[0])
        assert d < length_in_meters(5.0, "km")


class TestGmlUtilsFromFiles:
    def test_convex_hull_contains_center(self):
        # computeConvexHullForCurveWithArcSegment: hull of the arc curve
        # contains the YVR center point (coords lat-first in 4326)
        coords = geometry_coordinate_list(gml("Curve-ArcByCenterPoint.xml"))
        hull = convex_hull(coords)
        hp = Polygon(hull)
        assert hp.relate_points([49.194722], [-123.183889], "INTERSECTS")[0]

    def test_arc_endpoint_10nm_north(self):
        coords = geometry_coordinate_list(gml("Curve-ArcByCenterPoint.xml"))
        assert coords[-1][0] == pytest.approx(49.19472 + 0.16653, abs=1.5e-4)
        assert coords[-1][1] == pytest.approx(-123.18389, abs=1.5e-4)

    def test_circle_first_point_north(self):
        coords = geometry_coordinate_list(gml("Curve-CircleByCenterPoint.xml"))
        assert coords[0][0] == pytest.approx(49.19472 + 0.04496, abs=1.5e-4)


class TestEnvelopesFromFiles:
    def test_bbox_4326_antipodal(self):
        # VerifyExtents.antipodalEnvelopeFrom4326
        env = parse_envelope_file(f"{FIX}/envelopes/BoundingBox-4326.xml")
        ap = antipodal_envelope(env)
        assert ap.lower_corner() == pytest.approx((-33.5, 62.4), abs=0.01)

    def test_envelope_utm_antipodal(self):
        env = parse_envelope_file(f"{FIX}/envelopes/Envelope-UTM.xml")
        ap = antipodal_envelope(env)
        assert ap.lower_corner() == pytest.approx((-49.22, 57.20), abs=0.01)

    def test_wgs84_bounding_box_default_geographic(self):
        env = parse_envelope_file(f"{FIX}/envelopes/WGS84BoundingBox.xml")
        assert env.crs84


class TestTemporalFromFiles:
    """T-01 parsing over the reference's gml/temporal fixtures."""

    def test_time_instant_with_offset(self):
        from georay.gmlio import parse_temporal_file

        b, e = parse_temporal_file(f"{FIX}/gml/temporal/TimeInstant-Offset.xml")
        assert b == e
        # 2016-06-30T12:51:29-07:00 == 19:51:29Z
        assert b == 1467316289_000000

    def test_time_period_utc(self):
        from georay.gmlio import parse_temporal_file
        from georay.temporal import relative_position, DURING

        b, e = parse_temporal_file(f"{FIX}/gml/temporal/TimePeriod-UTC.xml")
        assert b < e
        # the offset instant falls DURING the period (cross-fixture check)
        i, _ = parse_temporal_file(f"{FIX}/gml/temporal/TimeInstant-Offset.xml")
        assert relative_position(i, i, b, e) == DURING

    def test_date_only_rejected(self):
        # GmlUtils.java:480-483: non-instant temporal values rejected
        from georay.gmlio import parse_temporal_file

        with pytest.raises(ValueError):
            parse_temporal_file(f"{FIX}/gml/temporal/TimeInstant-Date.xml")
