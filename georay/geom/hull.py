"""Planar convex hull (GmlUtils.computeConvexHull, G-02).

Andrew's monotone chain over a coordinate set — same result as the JTS
``ConvexHull`` the reference delegates to (GmlUtils.java:138-143).
"""

from __future__ import annotations

import numpy as np


def convex_hull(coords: np.ndarray) -> np.ndarray:
    """(N,2) point set -> closed CCW hull ring (M,2), M>=4 for areal hulls.

    Degenerate inputs (<3 distinct points) return the distinct points.
    """
    pts = np.unique(np.asarray(coords, dtype=np.float64), axis=0)
    if len(pts) < 3:
        return pts
    # lexicographic sort by (x, y) — np.unique already did this
    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and _cross(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.asarray(lower[:-1] + upper[:-1] + [lower[0]], dtype=np.float64)
    if len(ring) < 4:  # collinear input
        return pts
    return ring


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
