"""Conformance-vector surface: every pytest-only operator family exposed
to the driver's DuckDB gate as one query.

Each CASE runs an engine operator on a reference fixture and emits
(case_id, value_num, value_str); the oracle is a literal VALUES table of
the EXPECTED results lifted from the reference's JUnit suites
(VerifyGeodesyUtils.java, VerifyGmlUtils.java, VerifyExtents.java,
VerifyCurveCoordinateListFactory.java, VerifySurfaceCoordinateListFactory.java,
time/VerifyTemporalUtils.java, time/VerifyTemporalComparator.java) —
cited per case.  Exact expectations (counts, strings, integer-exact
floats, IEEE-identical arithmetic) are emitted as values; JUnit
delta-tolerance assertions are emitted as the 1.0/0.0 outcome of the
same |actual - expected| <= delta comparison the JUnit test performs.

The expected column is the single source of truth for both sides: the
driver compares the engine-computed values against these literals, so a
regression in any operator flips the corresponding row.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

Value = float | str


def _tol(actual: float, expected: float, delta: float) -> float:
    return 1.0 if abs(float(actual) - expected) <= delta else 0.0


# ---------------------------------------------------------------------------
# fixtures (reference test resources, reconstructed minimally)
# ---------------------------------------------------------------------------

YVR = (49.194722, -123.183889)  # VerifyGeodesyUtils.java:79-109
ATKINSON = (49.3304, -123.2646)  # Point-Atkinson-4326.xml
JERICHO = (49.2756, -123.2015)  # Point-Jericho-4326.xml

# gml/Polygon-InteriorLinearRing.xml exterior (lat-first authority order)
EXTERIOR_RING = [
    [49.1947, -123.1839],
    [49.2210, -122.7710],
    [49.2740, -122.9086],
    [49.3269, -122.9487],
    [49.3304, -123.2646],
    [49.1947, -123.1839],
]

# gml/Surface-PolygonPatch-3.xml tripartite ring (VerifyGeodesyUtils.java:135-165)
TRIPARTITE = {
    "kind": "Ring",
    "members": [
        {
            "kind": "Curve",
            "segments": [
                {"type": "GeodesicString",
                 "coords": [[55.233333, -36.166667], [55.231164, -36.894373]]},
                {"type": "ArcByCenterPoint", "center": [55.233333, -36.166667],
                 "radius": 25.0, "radius_uom": "NM",
                 "start_angle": 270.0, "end_angle": 497.0},
                {"type": "GeodesicString",
                 "coords": [[54.928164, -35.674116], [55.233333, -36.166667]]},
            ],
        }
    ],
}

# VerifyGeodesyUtils.removeNextToLastDuplicate (closure rule, lines 195-209)
CLOSURE_RING = [
    [557434.43, 4889943.44],
    [557416.84, 4889939.73],
    [557404.80, 4889951.77],
    [557402.02, 4889961.03],
    [557400.17, 4889969.36],
    [557400.17, 4889977.33],
    [557434.86, 4889943.52],
    [557434.43, 4889943.44],
]

# Curve-LineString.xml (VerifyCurveCoordinateListFactory.java:82-84)
CURVE_TWO_LINESTRINGS = {
    "kind": "Curve",
    "epsg": 4326,
    "segments": [
        {"type": "LineString",
         "coords": [[49.274247, -123.140714], [49.276956, -123.132265],
                    [49.281191, -123.125993]]},
        {"type": "LineString",
         "coords": [[49.281191, -123.125993], [49.274977, -123.116355]]},
    ],
}

# CompositeCurve.xml: LineString 5 pos + Arc 3 control points (C-06)
COMPOSITE_CURVE = {
    "kind": "CompositeCurve",
    "epsg": 4326,
    "members": [
        {"kind": "LineString",
         "coords": [[49.702558, -123.0], [49.649961, -123.0],
                    [49.540074, -123.183889], [49.540074, -123.183889],
                    [49.361246, -123.183889]]},
        {"kind": "Curve",
         "segments": [{"type": "Arc",
                       "coords": [[49.361246, -123.183889], [49.040829, -123.086952],
                                  [49.194442, -122.929795]]}]},
    ],
}

ORIENTABLE_BASE = {
    "kind": "Curve",
    "epsg": 4326,
    "segments": [
        {"type": "LineString",
         "coords": [[49.702558, -123.0], [49.649961, -123.0], [49.540074, -123.183889]]},
        {"type": "LineString",
         "coords": [[49.540074, -123.183889], [49.361246, -123.183889]]},
    ],
}

# Surface-PolygonPatch-2.xml two adjacent patches -> union boundary of 6
# coords (VerifySurfaceCoordinateListFactory.java:95-103)
TWO_PATCHES = {
    "kind": "Surface",
    "epsg": 32610,
    "patches": [
        {"patch": "Polygon",
         "exterior": {"kind": "Curve", "segments": [
             {"type": "LineString",
              "coords": [[486602, 5449119], [516675, 5452049], [503729, 5463799],
                         [480775, 5464220], [486602, 5449119]]}]}},
        {"patch": "Polygon",
         "exterior": {"kind": "Curve", "segments": [
             {"type": "LineString",
              "coords": [[516675, 5452049], [532639, 5473874], [503729, 5463799],
                         [516675, 5452049]]}]}},
    ],
}

POLYGON_WITH_HOLE = {
    "kind": "Polygon",
    "epsg": 4326,
    "exterior": {"kind": "LinearRing",
                 "coords": [[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]]},
    "interiors": [{"kind": "LinearRing",
                   "coords": [[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]]}],
}


# ---------------------------------------------------------------------------
# case table
# ---------------------------------------------------------------------------

def _cases() -> list[tuple[str, Callable[[], Value], Value]]:
    from georay.crs.geodesy import geodesic_destination, orthodromic_distance
    from georay.crs.identifiers import (
        convert_srs_name_to_urn,
        get_abbreviated_crs_identifier,
        get_crs_identifier,
    )
    from georay.crs.validity import get_domain_of_validity
    from georay.geom.arcs import infer_points_on_arc
    from georay.geom.curves import (
        curve_coordinate_list,
        extract_pos_list,
        surface_exterior_boundary,
        surface_interior_boundaries,
    )
    from georay.geom.envelope import (
        Envelope,
        antipodal_envelope,
        coalesce_bounding_boxes,
        envelope_as_gml,
        envelope_to_string,
        get_antipode,
    )
    from georay.geom.hull import convex_hull
    from georay.geom.rings import (
        remove_consecutive_duplicates,
        transform_ring_to_right_handed,
    )
    from georay.temporal import (
        RELATION_NAMES,
        add_us,
        relative_position,
        temporal_compare,
    )
    from georay.uom import length_in_meters

    C: list[tuple[str, Callable[[], Value], Value]] = []

    # ---- R-02 geodesic destination (VerifyGeodesyUtils.java:79-109; the
    # JUnit asserts are delta comparisons -> emitted as their outcome)
    def dest(az):
        return geodesic_destination(YVR[0], YVR[1], az, 1852.0)

    C.append(("r02_north_lat", lambda: _tol(dest(0.0)[0], 49.194722 + 0.016667, 1e-4), 1.0))
    C.append(("r02_north_lon", lambda: _tol(dest(0.0)[1], -123.183889, 1.5e-4), 1.0))
    C.append(("r02_east_lat", lambda: _tol(dest(90.0)[0], 49.194722, 1e-4), 1.0))
    C.append(("r02_east_lon", lambda: _tol(dest(90.0)[1], -123.183889 + 0.025310, 1.5e-4), 1.0))
    C.append(("r02_west_lon", lambda: _tol(dest(270.0)[1], -123.183889 - 0.025310, 1.5e-4), 1.0))
    # azimuth normalization (GeodesyUtils.java:115-119): 360 == 0 exactly
    C.append(("r02_az360_eq_az0",
              lambda: 1.0 if dest(360.0) == dest(0.0) else 0.0, 1.0))

    # ---- R-03 domain of validity (GeodesyUtils.java:56-66; UTM 10N)
    def dov(i):
        # projected CRS: easting-first axis order -> (lon_lo, lat_lo, lon_hi, lat_hi)
        return float(get_domain_of_validity("urn:ogc:def:crs:EPSG::32610")[0][i])

    C.append(("r03_utm10n_lon_lo", lambda: dov(0), -186.0 + 6.0 * 10))
    C.append(("r03_utm10n_lat_lo", lambda: dov(1), 0.0))
    C.append(("r03_utm10n_lon_hi", lambda: dov(2), (-186.0 + 6.0 * 10) + 6.0))
    C.append(("r03_utm10n_lat_hi", lambda: dov(3), 84.0))

    # ---- R-04 / R-07 / R-08 identifiers (GeodesyUtils.java:77-98,222-271)
    C.append(("r04_urn_4326", lambda: get_crs_identifier(4326),
              "urn:ogc:def:crs:EPSG::4326"))
    C.append(("r04_crs84", lambda: get_crs_identifier(4326, crs84=True),
              "urn:ogc:def:crs:OGC:1.3:CRS84"))
    C.append(("r07_abbrev_http",
              lambda: get_abbreviated_crs_identifier(
                  "http://www.opengis.net/def/crs/EPSG/0/4326"), "EPSG:4326"))
    C.append(("r07_abbrev_urn",
              lambda: get_abbreviated_crs_identifier("urn:ogc:def:crs:EPSG::32610"),
              "EPSG:32610"))
    C.append(("r08_http_to_urn",
              lambda: convert_srs_name_to_urn("http://www.opengis.net/def/crs/EPSG/0/4326"),
              "urn:ogc:def:crs:EPSG::4326"))
    C.append(("r08_keeps_version",
              lambda: convert_srs_name_to_urn("http://www.opengis.net/def/crs/EPSG/9.9/4326"),
              "urn:ogc:def:crs:EPSG:9.9:4326"))

    # ---- R-05 / R-06 right-handed ring transform (VerifyGeodesyUtils.java:112-165)
    ring = np.asarray(EXTERIOR_RING, dtype=np.float64)
    C.append(("r05_linear_ring_count",
              lambda: float(len(transform_ring_to_right_handed(ring, 4326))), 6.0))
    C.append(("r05_first_x_is_lon",
              lambda: float(transform_ring_to_right_handed(ring, 4326)[0, 0]), -123.1839))
    C.append(("r06_keep_all_count",
              lambda: float(len(transform_ring_to_right_handed(ring, 4326, keep_all_coords=True))),
              6.0))

    def tri_raw():
        from georay.geom.curves import curve_coordinate_list as ccl
        return ccl(TRIPARTITE, 4326)

    C.append(("r05_tripartite_dedup_count",
              lambda: float(len(transform_ring_to_right_handed(tri_raw(), 4326))), 7.0))
    C.append(("r06_tripartite_keep_all_count",
              lambda: float(len(transform_ring_to_right_handed(tri_raw(), 4326, keep_all_coords=True))),
              9.0))
    C.append(("r05_tripartite_first_lon",
              lambda: _tol(transform_ring_to_right_handed(tri_raw(), 4326)[0, 0], -36.1667, 1e-4),
              1.0))

    # ---- R-09 ppm dedup (VerifyGeodesyUtils.java:168-209)
    C.append(("r09_1ppm_removed", lambda: float(len(remove_consecutive_duplicates(
        np.array([[55.233333, -36.166667], [55.231164, -36.894373],
                  [55.23116339, -36.89437371]]), 1))), 2.0))
    C.append(("r09_no_dups_kept", lambda: float(len(remove_consecutive_duplicates(
        np.array([[55.233333, -36.166667], [55.231164, -36.894373],
                  [54.928164, -35.674116], [55.233333, -36.166667]]), 1))), 4.0))
    C.append(("r09_closure_count", lambda: float(len(remove_consecutive_duplicates(
        np.asarray(CLOSURE_RING), 1))), 7.0))
    C.append(("r09_closure_preserved", lambda: 1.0 if np.array_equal(
        remove_consecutive_duplicates(np.asarray(CLOSURE_RING), 1)[0],
        remove_consecutive_duplicates(np.asarray(CLOSURE_RING), 1)[-1]) else 0.0, 1.0))
    # Java quirk: 0/0 -> NaN -> never a duplicate (GeodesyUtils.java:283-304)
    C.append(("r09_zero_ordinate_kept", lambda: float(len(remove_consecutive_duplicates(
        np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]]), 1))), 3.0))

    # ---- G-01 arc densification (GmlUtils.java:98-128; VerifyGmlUtils.java:154-181)
    C.append(("g01_arc_count", lambda: float(len(
        infer_points_on_arc(YVR[0], YVR[1], 10.0, "NM", 90.0, 360.0, epsg=4326))), 5.0))
    C.append(("g01_arc_end_lat", lambda: _tol(
        infer_points_on_arc(YVR[0], YVR[1], 10.0, "NM", 90.0, 360.0, epsg=4326)[-1][0],
        49.19472 + 0.16653, 1.5e-4), 1.0))
    C.append(("g01_circle_first_lat", lambda: _tol(
        infer_points_on_arc(YVR[0], YVR[1], 5000.0, "m", epsg=4326)[0][0],
        49.19472 + 0.04496, 1.5e-4), 1.0))
    C.append(("g01_circle_closed", lambda: 1.0 if np.allclose(
        infer_points_on_arc(YVR[0], YVR[1], 5000.0, "m", epsg=4326)[0],
        infer_points_on_arc(YVR[0], YVR[1], 5000.0, "m", epsg=4326)[-1], atol=1e-9)
        else 0.0, 1.0))

    # ---- G-02 convex hull (GmlUtils.java:138-143): square + 2 interior
    # points -> CLOSED 4-vertex hull ring = 5 coords
    C.append(("g02_hull_count", lambda: float(len(convex_hull(np.array(
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [2.0, 2.0], [1.0, 2.0]])))), 5.0))

    # ---- G-08 posList stride (GmlUtils.java:250-258)
    C.append(("g08_stride3_count",
              lambda: float(len(extract_pos_list([1, 2, 99, 3, 4, 99], 3))), 2.0))
    C.append(("g08_stride3_first_x",
              lambda: float(extract_pos_list([1, 2, 99, 3, 4, 99], 3)[0, 0]), 1.0))

    # ---- G-09 min curve segment positions (GmlUtils.java:267-277)
    from georay.geom.curves import MIN_SEGMENT_POSITIONS

    C.append(("g09_bycenter_min", lambda: float(MIN_SEGMENT_POSITIONS["ArcByCenterPoint"]), 1.0))
    C.append(("g09_arc_min", lambda: float(MIN_SEGMENT_POSITIONS["Arc"]), 3.0))
    C.append(("g09_linestring_min", lambda: float(MIN_SEGMENT_POSITIONS["LineString"]), 2.0))

    # ---- G-10 UCUM lengths (GmlUtils.java:220-240; VerifyGmlUtils.java:184-197)
    C.append(("g10_100M", lambda: length_in_meters(100.0, "M"), 100.0 * 1852.0))
    C.append(("g10_nmi", lambda: length_in_meters(1.0, "[nmi_i]"), 1852.0))
    C.append(("g10_12km", lambda: length_in_meters(12.0, "km"), 12.0 * 1000.0))
    C.append(("g10_mi", lambda: length_in_meters(1.0, "mi"), 1609.34))
    C.append(("g10_uri_fragment", lambda: length_in_meters(2.0, "http://x#km"), 2000.0))

    # ---- C-03..C-09 curve factories (VerifyCurveCoordinateListFactory.java:43-108)
    C.append(("c05_two_linestrings_count",
              lambda: float(len(curve_coordinate_list(CURVE_TWO_LINESTRINGS))), 5.0))
    C.append(("c05_first_y",
              lambda: float(curve_coordinate_list(CURVE_TWO_LINESTRINGS)[0, 1]), -123.140714))
    C.append(("c06_composite_count",
              lambda: float(len(curve_coordinate_list(COMPOSITE_CURVE))), 8.0))
    C.append(("c07_orientable_reversed_first_x", lambda: float(curve_coordinate_list(
        {"kind": "OrientableCurve", "orientation": "-", "base": ORIENTABLE_BASE})[0, 0]),
        49.361246))
    C.append(("c04_tripartite_count",
              lambda: float(len(curve_coordinate_list(
                  {"kind": "Curve", "epsg": 4326, "segments": TRIPARTITE["members"][0]["segments"]}))),
              9.0))

    # ---- C-10..C-14 surface factories (VerifySurfaceCoordinateListFactory.java:46-125)
    C.append(("c11_two_patch_union_count",
              lambda: float(len(surface_exterior_boundary(TWO_PATCHES))), 6.0))
    C.append(("c11_union_closed", lambda: 1.0 if np.array_equal(
        surface_exterior_boundary(TWO_PATCHES)[0],
        surface_exterior_boundary(TWO_PATCHES)[-1]) else 0.0, 1.0))
    C.append(("c12_poly_exterior_count",
              lambda: float(len(surface_exterior_boundary(POLYGON_WITH_HOLE))), 5.0))
    C.append(("c13_poly_interior_rings",
              lambda: float(len(surface_interior_boundaries(POLYGON_WITH_HOLE))), 1.0))
    C.append(("c13_poly_interior_count",
              lambda: float(len(surface_interior_boundaries(POLYGON_WITH_HOLE)[0])), 5.0))

    # ---- C-11 degenerate patch contacts: vertex-on-edge and collinear
    # partial overlap (JTS unions these robustly,
    # SurfaceCoordinateListFactory.java:196-197; the r2 walk raised).
    # Expected areas computed by hand via inclusion-exclusion; coords are
    # exact binary fractions so the shoelace sums are exact in f64.
    from georay.geom.union import _signed_area as _usa, union_overlapping_rings as _uor

    _SQ = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    _TRI_TOUCH = np.array([[2, 1], [4, 0], [4, 2], [2, 1]], float)
    _HALF_EDGE = np.array([[2, 1], [4, 1], [4, 3], [2, 3], [2, 1]], float)
    _TRI_CROSS = np.array([[1, 3], [2, 1], [3, 3], [1, 3]], float)
    C.append(("c11_union_point_touch_area",
              lambda: float(_usa(_uor(_SQ, _TRI_TOUCH))), 6.0))
    C.append(("c11_union_collinear_half_edge_area",
              lambda: float(_usa(_uor(_SQ, _HALF_EDGE))), 8.0))
    C.append(("c11_union_collinear_half_edge_count",
              lambda: float(len(_uor(_SQ, _HALF_EDGE))), 9.0))
    C.append(("c11_union_vertex_on_edge_area",
              lambda: float(_usa(_uor(_SQ, _TRI_CROSS))), 5.75))

    # ---- P-03 curve-curve DE-9IM (TopologicalRelationships.java:74-91
    # relates ANY pair via JTS relate; disjointCurves —
    # VerifyTopologicalRelationships.java:92-97 — is the reference's
    # curve-curve fixture, the rest are JTS relate outcomes for synthetic
    # line pairs covering the remaining predicate-matrix hole)
    from georay.geom.linestring import LineString as _LS
    from georay.geom.relate import relate_line_line as _rll

    _REF_C1 = [(-123.140714, 49.274247), (-123.132265, 49.276956),
               (-123.125993, 49.281191), (-123.116355, 49.274977)]
    _REF_C2 = [(-121.5, 50.0), (-121.0, 50.5), (-120.7, 50.5)]

    def _llr(a, b, pred):
        return 1.0 if _rll(_LS(a), _LS(b))[pred] else 0.0

    C.append(("p03_curves_disjoint_ref",
              lambda: _llr(_REF_C1, _REF_C2, "DISJOINT"), 1.0))
    C.append(("p03_curves_cross_x",
              lambda: _llr([(0, 0), (2, 2)], [(0, 2), (2, 0)], "CROSSES"), 1.0))
    C.append(("p03_curves_touch_endpoint",
              lambda: _llr([(0, 0), (2, 0)], [(1, 0), (1, 1)], "TOUCHES"), 1.0))
    C.append(("p03_curves_overlap_collinear",
              lambda: _llr([(0, 0), (3, 0)], [(1, 0), (4, 0)], "OVERLAPS"), 1.0))
    C.append(("p03_curves_contains_sub",
              lambda: _llr([(0, 0), (4, 0)], [(1, 0), (2, 0)], "CONTAINS"), 1.0))
    C.append(("p03_curves_equals_revertex",
              lambda: _llr([(0, 0), (2, 0)], [(0, 0), (1, 0), (2, 0)], "EQUALS"), 1.0))

    # ---- A-06 / A-07 envelope serialization (Extents.java:191-223,364-382)
    env_dec = Envelope(49.1234, -123.4567, 50.5599, -122.8801, 4326)

    def gml_corner(which):
        xml = envelope_as_gml(env_dec)
        tag = f"gml:{which}Corner"
        return xml.split(f"<{tag}>")[1].split(f"</{tag}>")[0]

    C.append(("a06_round_down_lower", lambda: gml_corner("lower"), "49.12 -123.45"))
    C.append(("a06_round_down_upper", lambda: gml_corner("upper"), "50.55 -122.88"))
    C.append(("a06_integers_bare", lambda: envelope_as_gml(
        Envelope(480775.0, 5464219.0, 532639.0, 9329005.0, 32610)
    ).split("<gml:upperCorner>")[1].split("</gml:upperCorner>")[0], "532639 9329005"))
    C.append(("a07_kvp_crs84", lambda: envelope_to_string(
        Envelope(-116.0, 32.6, -115.0, 34.0, 4326, crs84=True)), "-116.0,32.6,-115.0,34.0"))
    C.append(("a07_kvp_4326", lambda: envelope_to_string(
        Envelope(32.0, -117.6, 33.5, -116.2, 4326)),
        "32.0,-117.6,33.5,-116.2,urn:ogc:def:crs:EPSG::4326"))

    # ---- A-03 coalesce (Extents.java:258-274)
    C.append(("a03_coalesce_same_crs", lambda: envelope_to_string(coalesce_bounding_boxes(
        [Envelope(0.0, 0.0, 10.0, 10.0, 4326), Envelope(5.0, -5.0, 15.0, 8.0, 4326)])),
        "0.0,-5.0,15.0,10.0,urn:ogc:def:crs:EPSG::4326"))

    # ---- A-08 / A-09 antipodes (Extents.java:390-431; VerifyExtents.java:264-300)
    C.append(("a09_vancouver_lat", lambda: float(get_antipode([49.19, -123.18])[0]), -49.19))
    C.append(("a09_vancouver_lon", lambda: float(get_antipode([49.19, -123.18])[1]),
              -123.18 + 180.0))
    C.append(("a08_env4326_lower_lat", lambda: float(antipodal_envelope(
        Envelope(32.0, -117.6, 33.5, -116.2, 4326)).lower_corner()[0]), -33.5))
    C.append(("a08_env4326_lower_lon", lambda: float(antipodal_envelope(
        Envelope(32.0, -117.6, 33.5, -116.2, 4326)).lower_corner()[1]), -117.6 + 180.0))
    C.append(("a08_utm_lower_ok", lambda: 1.0 if np.allclose(
        antipodal_envelope(Envelope(514432.0, 5429689.0, 529130.0, 5451619.0, 32610)
                           ).lower_corner(), (-49.22, 57.20), atol=0.01) else 0.0, 1.0))

    # ---- T-02 / T-03 temporal relations (time/VerifyTemporalUtils.java,
    # TemporalComparator.java:13-40)
    def rel(b1, e1, b2, e2):
        return RELATION_NAMES[int(relative_position(b1, e1, b2, e2))]

    for cid, args, want in [
        ("t02_before", (0, 5, 10, 20), "BEFORE"),
        ("t02_after", (30, 40, 10, 20), "AFTER"),
        ("t02_meets", (0, 10, 10, 20), "MEETS"),
        ("t02_met_by", (20, 30, 10, 20), "MET_BY"),
        ("t02_overlaps", (0, 15, 10, 20), "OVERLAPS"),
        ("t02_overlapped_by", (15, 25, 10, 20), "OVERLAPPED_BY"),
        ("t02_during", (12, 18, 10, 20), "DURING"),
        ("t02_contains", (10, 30, 12, 18), "CONTAINS"),
        ("t02_equals", (10, 20, 10, 20), "EQUALS"),
        ("t02_begins", (10, 15, 10, 20), "BEGINS"),
        ("t02_begun_by", (10, 25, 10, 20), "BEGUN_BY"),
        ("t02_ends", (15, 20, 10, 20), "ENDS"),
        ("t02_ended_by", (5, 20, 10, 20), "ENDED_BY"),
        ("t02_instant_during", (15, 15, 10, 20), "DURING"),
    ]:
        C.append((cid, (lambda a=args: rel(*a)), want))
    C.append(("t03_before_neg", lambda: float(temporal_compare(0, 5, 10, 20)), -1.0))
    C.append(("t03_after_pos", lambda: float(temporal_compare(30, 40, 10, 20)), 1.0))
    C.append(("t03_during_zero", lambda: float(temporal_compare(12, 18, 10, 20)), 0.0))

    # ---- T-05 instant arithmetic (time/TemporalUtils.java:134-140)
    C.append(("t05_add_hour", lambda: float(add_us(1_000_000, 3_600_000_000)),
              float(1_000_000 + 3_600_000_000)))

    # ---- R-01 reprojection (setCRS, TopologicalRelationships.java:261-271;
    # fixtures: Point-Atkinson-4326/-32610.xml, 1 m-rounded; round-trip at
    # GeoAPI tolerance 1e-4 deg ~ 10 m, VerifyGeodesyUtils.java:85)
    from georay.crs.projections import transformer

    def utm_fwd():
        return transformer(4326, 32610).transform(-123.2646, 49.3304)

    C.append(("r01_atkinson_easting", lambda: _tol(utm_fwd()[0], 480775.0, 2.0), 1.0))
    C.append(("r01_atkinson_northing", lambda: _tol(utm_fwd()[1], 5464220.0, 2.0), 1.0))
    C.append(("r01_jericho_easting", lambda: _tol(
        transformer(4326, 32610).transform(-123.2015, 49.2756)[0], 485341.0, 3.0), 1.0))
    C.append(("r01_roundtrip_lon", lambda: _tol(
        transformer(32610, 4326).transform(480775.0, 5464220.0)[0], -123.2646, 1e-4), 1.0))
    C.append(("r01_roundtrip_lat", lambda: _tol(
        transformer(32610, 4326).transform(480775.0, 5464220.0)[1], 49.3304, 1e-4), 1.0))
    C.append(("r01_utm32n_lat", lambda: _tol(
        transformer(32632, 4258).transform(358626.0, 5793259.0)[1], 52.2715, 0.01), 1.0))

    # ---- P-04 / P-05 DWithin & Beyond on the Atkinson/Jericho fixture
    # (VerifyTopologicalRelationships.java:119-152: within 8 km, NOT
    # within 3 nmi = 5556 m -> Beyond 3 nmi true)
    d_aj = orthodromic_distance(*ATKINSON, *JERICHO)
    C.append(("p04_within_8km", lambda: 1.0 if d_aj < 8000.0 else 0.0, 1.0))
    C.append(("p05_beyond_3nmi",
              lambda: 1.0 if not (d_aj < length_in_meters(3.0, "[nmi_i]")) else 0.0, 1.0))

    return C


def conformance_table() -> pa.Table:
    ids, nums, strs = [], [], []
    for cid, fn, _exp in _cases():
        v = fn()
        ids.append(cid)
        if isinstance(v, str):
            nums.append(None)
            strs.append(v)
        else:
            nums.append(float(v))
            strs.append(None)
    return pa.table(
        {
            "case_id": pa.array(ids, pa.string()),
            "value_num": pa.array(nums, pa.float64()),
            "value_str": pa.array(strs, pa.string()),
        }
    )


def conformance_sql() -> str:
    """Literal VALUES oracle of the reference-derived expectations."""
    rows = []
    for cid, _fn, exp in _cases():
        if isinstance(exp, str):
            rows.append(f"('{cid}', CAST(NULL AS DOUBLE), '{exp}')")
        else:
            rows.append(f"('{cid}', {float(exp)!r}, CAST(NULL AS VARCHAR))")
    body = ",\n    ".join(rows)
    return (
        "SELECT case_id, value_num, value_str FROM (VALUES\n    "
        + body
        + "\n) t(case_id, value_num, value_str)"
    )
