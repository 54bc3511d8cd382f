"""Overlapping surface-patch union (SurfaceCoordinateListFactory.java:196-197
unions patch polygons via JTS; georay covers edge-adjacent complexes by
shared-edge cancellation and transversal overlaps by a Greiner-Hormann
union walk)."""

import numpy as np
import pytest

from georay.geom.curves import merge_patch_rings, surface_exterior_boundary
from georay.geom.union import _signed_area, union_overlapping_rings

SQ_A = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
SQ_B = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], float)


class TestUnionWalk:
    def test_overlapping_squares_exact_ring(self):
        u = union_overlapping_rings(SQ_A, SQ_B)
        want = np.array(
            [[0, 0], [2, 0], [2, 1], [3, 1], [3, 3], [1, 3], [1, 2], [0, 2], [0, 0]],
            float,
        )
        np.testing.assert_allclose(u, want)
        assert _signed_area(u) == pytest.approx(7.0)

    def test_orientation_invariant(self):
        u = union_overlapping_rings(SQ_A[::-1], SQ_B)  # CW input normalized
        assert _signed_area(u) == pytest.approx(7.0)

    def test_argument_order_same_area(self):
        u1 = union_overlapping_rings(SQ_A, SQ_B)
        u2 = union_overlapping_rings(SQ_B, SQ_A)
        assert _signed_area(u1) == pytest.approx(_signed_area(u2))

    def test_containment_returns_outer(self):
        inner = np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]], float)
        u = union_overlapping_rings(SQ_A, inner)
        assert _signed_area(u) == pytest.approx(4.0)
        u2 = union_overlapping_rings(inner, SQ_A)
        assert _signed_area(u2) == pytest.approx(4.0)

    def test_disjoint_raises(self):
        far = SQ_A + 10.0
        with pytest.raises(ValueError):
            union_overlapping_rings(SQ_A, far)

    def test_triangle_square_area_identity(self):
        # area(union) == area(A) + area(T) - area(A ∩ T), overlap computed
        # by hand: T clipped to the square
        tri = np.array([[1.5, -1.0], [3.5, 1.0], [1.5, 1.5], [1.5, -1.0]], float)
        u = union_overlapping_rings(SQ_A, tri)
        a_sq = 4.0
        a_tri = abs(_signed_area(tri))
        assert _signed_area(u) < a_sq + a_tri  # strict: overlap removed once
        assert _signed_area(u) > max(a_sq, a_tri)

    def test_point_contact_argument_order_independent(self):
        # regression (r3 review): when the walk STARTS at a point-touch
        # junction, closing on first return to the start vertex orphaned
        # the other lobe — union(TRI, SQ) raised while union(SQ, TRI)
        # worked; the closing turn must compete in the rightmost-turn rule
        b = np.array([[2, 1], [4, 0], [4, 2], [2, 1]], float)
        u1 = union_overlapping_rings(SQ_A, b)
        u2 = union_overlapping_rings(b, SQ_A)
        assert _signed_area(u1) == pytest.approx(6.0)
        assert _signed_area(u2) == pytest.approx(6.0)
        np.testing.assert_allclose(u1, u2)  # canonicalized output

    def test_figure_eight_fold_order_independent(self):
        from georay.geom.curves import merge_patch_rings

        r1 = np.array([[0, 0], [2, 0], [1, 1], [0, 0]], float)
        r2 = np.array([[1, 1], [0, 2], [2, 2], [1, 1]], float)
        a1 = _signed_area(merge_patch_rings([r1, r2]))
        a2 = _signed_area(merge_patch_rings([r2, r1]))
        assert a1 == pytest.approx(2.0)
        assert a2 == pytest.approx(2.0)

    def test_tangential_point_contact_unions(self):
        # B's corner exactly on A's edge (zero-area overlap): JTS unions
        # this robustly (r2 raised); the boundary revisits the touch
        # vertex once and the area is exactly additive
        b = np.array([[2, 1], [4, 0], [4, 2], [2, 1]], float)
        u = union_overlapping_rings(SQ_A, b)
        assert _signed_area(u) == pytest.approx(4.0 + 2.0)
        np.testing.assert_allclose(u[0], u[-1])
        # the touch vertex appears twice in the open ring
        assert (np.all(u[:-1] == [2.0, 1.0], axis=1)).sum() == 2

    def test_vertex_on_edge_with_crossing(self):
        # B's apex sits exactly on A's right edge while B's other edges
        # cross INTO A: the mixed contact r2 refused.  Union area checked
        # against the inclusion-exclusion hand computation.
        b = np.array([[1.0, 3.0], [2.0, 1.0], [3.0, 3.0], [1.0, 3.0]], float)
        u = union_overlapping_rings(SQ_A, b)
        # overlap = B clipped to A: triangle (2,1),(1.5,2),(2,2) — the
        # x>2 half of B's apex region is outside A — area 0.25
        a_b = abs(_signed_area(b))
        assert _signed_area(u) == pytest.approx(4.0 + a_b - 0.25)

    def test_collinear_partial_edge_overlap(self):
        # B shares HALF of A's right edge collinearly (no proper
        # crossing): union is the L-shaped octagon, area additive
        b = np.array([[2, 1], [4, 1], [4, 3], [2, 3], [2, 1]], float)
        u = union_overlapping_rings(SQ_A, b)
        assert _signed_area(u) == pytest.approx(8.0)
        # the shared sub-edge (2,1)-(2,2) is interior: neither kept copy
        xs, ys = u[:-1, 0], u[:-1, 1]
        assert len(u) == 9  # 8 corners + closure

    def test_collinear_overlap_mixed_with_crossing(self):
        # B overlaps A's right edge collinearly AND crosses A's top edge
        b = np.array([[2.0, 1.0], [4.0, 1.0], [4.0, 4.0], [1.0, 4.0],
                      [1.0, 1.5], [2.0, 1.5], [2.0, 1.0]], float)
        u = union_overlapping_rings(SQ_A, b)
        # overlap of A and B: strip x in [1,2] band... computed by hand:
        # B covers (x>=2 side) plus the notch [1,2]x[1.5,4]; intersection
        # with A=[0,2]^2 is [1,2]x[1.5,2], area 0.5
        a_b = abs(_signed_area(b))
        assert _signed_area(u) == pytest.approx(4.0 + a_b - 0.5)


class TestOverlappingSurfacePatches:
    def test_surface_with_crossing_patches(self):
        surf = {
            "kind": "Surface",
            "epsg": 32610,
            "patches": [
                {
                    "patch": "Polygon",
                    "exterior": {"kind": "LinearRing",
                                 "coords": [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]},
                },
                {
                    "patch": "Polygon",
                    "exterior": {"kind": "LinearRing",
                                 "coords": [[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]]},
                },
            ],
        }
        out = surface_exterior_boundary(surf)
        assert len(out) == 9
        assert _signed_area(out) == pytest.approx(7.0)

    def test_adjacent_patches_still_use_cancellation(self):
        # the existing two-patch fixture path must be untouched
        rings = [
            np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float),
            np.array([[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]], float),
        ]
        out = merge_patch_rings(rings)
        assert len(out) == 7  # 6 distinct corners + closure


class TestUnionReviewRegressions:
    def test_near_coincident_rings_resolve(self):
        # every vertex within eps of the other boundary: the r2 walk had
        # no valid start vertex and raised; the overlay's on-boundary
        # tie-break returns (approximately) the common square
        b = SQ_A + np.array([1e-12, -1e-12])
        u = union_overlapping_rings(SQ_A, b)
        assert _signed_area(u) == pytest.approx(4.0, abs=1e-9)

    def test_bridged_patches_order_independent(self):
        sq1 = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
        sq2 = sq1 + np.array([3.0, 0.0])
        bar = np.array(
            [[-1, 0.25], [5, 0.25], [5, 0.75], [-1, 0.75], [-1, 0.25]], float
        )
        for order in ([bar, sq1, sq2], [sq1, sq2, bar], [sq2, bar, sq1]):
            out = merge_patch_rings([r.copy() for r in order])
            assert _signed_area(out) == pytest.approx(
                1.0 + 1.0 + 6 * 0.5 - 2 * (1.0 * 0.5)
            )

    def test_union_with_hole_raises(self):
        # U-shape closed by a bar: the union has an interior ring the
        # single-exterior representation cannot carry -> loud error
        u_shape = np.array(
            [[0, 0], [3, 0], [3, 3], [2, 3], [2, 1], [1, 1], [1, 3], [0, 3], [0, 0]],
            float,
        )
        bar = np.array([[-0.5, 2], [3.5, 2], [3.5, 2.5], [-0.5, 2.5], [-0.5, 2]], float)
        with pytest.raises(ValueError):
            union_overlapping_rings(u_shape, bar)
