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
