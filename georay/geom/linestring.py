"""LineString kernels: segment intersection, line-vs-line and
line-vs-polygon predicates, geometry-to-geometry minimum distance.

Completes the P-01 predicate surface for CURVE operands
(TopologicalRelationships.java:57-96 accepts any geometry pair; the
conformance suite exercises curve-vs-polygon and curve-vs-curve —
VerifyTopologicalRelationships.java:52-58, 86-94, 96-104) and the P-04
DWithin between extended geometries (polygonAndLineWithin5km,
VerifyTopologicalRelationships.java:141-152: JTS DistanceOp nearest
points, then orthodromic distance).

All kernels are vectorized over segment arrays (numpy broadcasting);
coordinates are right-handed (x=east) in one common CRS.
"""

from __future__ import annotations

import numpy as np

from georay.geom.polygon import Polygon


def _segments(coords: np.ndarray):
    coords = np.asarray(coords, dtype=np.float64)
    return coords[:-1], coords[1:]


def segments_intersect(a1, a2, b1, b2, eps: float = 0.0):
    """Pairwise test: does segment (a1[i], a2[i]) intersect (b1[j], b2[j])?
    Returns a (len(a), len(b)) bool matrix.  Standard orientation test
    with collinear-overlap handling (same outcomes as JTS robust
    intersection for the fixture tolerances)."""
    a1 = np.asarray(a1, dtype=np.float64)[:, None, :]
    a2 = np.asarray(a2, dtype=np.float64)[:, None, :]
    b1 = np.asarray(b1, dtype=np.float64)[None, :, :]
    b2 = np.asarray(b2, dtype=np.float64)[None, :, :]

    def cross(o, p, q):
        return (p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1]) - (
            p[..., 1] - o[..., 1]
        ) * (q[..., 0] - o[..., 0])

    d1 = cross(b1, b2, a1)
    d2 = cross(b1, b2, a2)
    d3 = cross(a1, a2, b1)
    d4 = cross(a1, a2, b2)

    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def on_segment(o, p, q):
        # q collinear with (o,p): is q within the bbox of (o,p)?
        return (
            (q[..., 0] >= np.minimum(o[..., 0], p[..., 0]) - eps)
            & (q[..., 0] <= np.maximum(o[..., 0], p[..., 0]) + eps)
            & (q[..., 1] >= np.minimum(o[..., 1], p[..., 1]) - eps)
            & (q[..., 1] <= np.maximum(o[..., 1], p[..., 1]) + eps)
        )

    touch = (
        ((d1 == 0) & on_segment(b1, b2, a1))
        | ((d2 == 0) & on_segment(b1, b2, a2))
        | ((d3 == 0) & on_segment(a1, a2, b1))
        | ((d4 == 0) & on_segment(a1, a2, b2))
    )
    return proper | touch


def segment_segment_distance(a1, a2, b1, b2):
    """Pairwise min distance between segment sets -> (len(a), len(b)).
    0 where they intersect; else min over the four endpoint-to-segment
    distances (exact for non-intersecting segments)."""
    inter = segments_intersect(a1, a2, b1, b2)

    def pt_seg(p, s1, s2):
        # p: (n,1,2) points vs (1,m,2) segments
        d = s2 - s1
        len2 = (d**2).sum(-1)
        len2 = np.where(len2 == 0.0, 1.0, len2)
        t = np.clip(((p - s1) * d).sum(-1) / len2, 0.0, 1.0)
        q = s1 + t[..., None] * d
        return np.sqrt(((p - q) ** 2).sum(-1))

    a1p = np.asarray(a1, dtype=np.float64)[:, None, :]
    a2p = np.asarray(a2, dtype=np.float64)[:, None, :]
    b1p = np.asarray(b1, dtype=np.float64)[None, :, :]
    b2p = np.asarray(b2, dtype=np.float64)[None, :, :]
    d = np.minimum.reduce(
        [
            pt_seg(a1p, b1p, b2p),
            pt_seg(a2p, b1p, b2p),
            pt_seg(b1p, a1p, a2p),
            pt_seg(b2p, a1p, a2p),
        ]
    )
    return np.where(inter, 0.0, d)


class LineString:
    """Polyline with vectorized predicates against lines and polygons."""

    __slots__ = ("coords", "epsg")

    def __init__(self, coords, epsg: int = 4326):
        self.coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        self.epsg = int(epsg)

    def intersects_line(self, other: "LineString") -> bool:
        a1, a2 = _segments(self.coords)
        b1, b2 = _segments(other.coords)
        return bool(segments_intersect(a1, a2, b1, b2).any())

    def intersects_polygon(self, poly: Polygon) -> bool:
        """Line INTERSECTS polygon: any vertex inside/boundary, or any
        segment crossing the boundary (covers line fully inside too)."""
        interior, boundary = poly.locate(self.coords[:, 0], self.coords[:, 1])
        if bool((interior | boundary).any()):
            return True
        a1, a2 = _segments(self.coords)
        return bool(segments_intersect(a1, a2, poly._ex1, poly._ex2).any())

    def min_distance_to_polygon(self, poly: Polygon) -> tuple[float, np.ndarray, np.ndarray]:
        """Planar min distance + the nearest point pair (line_pt, poly_pt)
        — the DistanceOp.nearestPoints analog for the P-04 two-step."""
        interior, boundary = poly.locate(self.coords[:, 0], self.coords[:, 1])
        if bool((interior | boundary).any()):
            i = int(np.nonzero(interior | boundary)[0][0])
            p = self.coords[i]
            return 0.0, p, p
        a1, a2 = _segments(self.coords)
        d = segment_segment_distance(a1, a2, poly._ex1, poly._ex2)
        i, j = np.unravel_index(int(np.argmin(d)), d.shape)
        if d[i, j] == 0.0:
            # the line CROSSES the boundary with all vertices outside:
            # the nearest pair is the crossing point itself (coincident) —
            # endpoint projection would return a non-zero-separation pair
            # and invert the downstream orthodromic DWithin result
            p = _segment_intersection_point(a1[i], a2[i], poly._ex1[j], poly._ex2[j])
            return 0.0, p, p
        # refine the actual nearest pair on the two winning segments
        lp, pp = _nearest_pair_on_segments(a1[i], a2[i], poly._ex1[j], poly._ex2[j])
        return float(d[i, j]), lp, pp

    def min_distance_to_line(self, other: "LineString") -> float:
        a1, a2 = _segments(self.coords)
        b1, b2 = _segments(other.coords)
        return float(segment_segment_distance(a1, a2, b1, b2).min())


def _segment_intersection_point(p1, p2, q1, q2) -> np.ndarray:
    """A point common to two intersecting segments: the proper crossing
    when the segments cross, else (collinear/touching) an endpoint that
    lies on the other segment."""
    p1 = np.asarray(p1, dtype=np.float64)
    p2 = np.asarray(p2, dtype=np.float64)
    q1 = np.asarray(q1, dtype=np.float64)
    q2 = np.asarray(q2, dtype=np.float64)
    r = p2 - p1
    s = q2 - q1
    denom = r[0] * s[1] - r[1] * s[0]
    if denom != 0.0:
        t = ((q1[0] - p1[0]) * s[1] - (q1[1] - p1[1]) * s[0]) / denom
        return p1 + np.clip(t, 0.0, 1.0) * r
    # collinear / degenerate: return whichever endpoint touches the other
    for p, s1, s2 in ((p1, q1, q2), (p2, q1, q2), (q1, p1, p2), (q2, p1, p2)):
        d = s2 - s1
        len2 = float((d**2).sum()) or 1.0
        t = float(np.clip(((p - s1) * d).sum() / len2, 0.0, 1.0))
        if float(np.hypot(*(p - (s1 + t * d)))) == 0.0:
            return p
    return p1


def _nearest_pair_on_segments(p1, p2, q1, q2):
    """Nearest points between two single segments (sampled + projected;
    exact enough for the two-step distance semantics at fixture tolerance)."""

    def project(p, s1, s2):
        d = s2 - s1
        len2 = float((d**2).sum()) or 1.0
        t = float(np.clip(((p - s1) * d).sum() / len2, 0.0, 1.0))
        return s1 + t * d

    best = None
    for p in (p1, p2):
        q = project(p, q1, q2)
        dist = float(np.hypot(*(p - q)))
        if best is None or dist < best[0]:
            best = (dist, p, q)
    for q in (q1, q2):
        p = project(q, p1, p2)
        dist = float(np.hypot(*(p - q)))
        if dist < best[0]:
            best = (dist, p, q)
    return best[1], best[2]
