"""Union of properly-overlapping simple rings (Greiner & Hormann 1998,
ACM TOG — public algorithm, "always switch at intersections" union walk).

Closes the surface-patch-union gap: the reference unions overlapping
patch polygons via JTS (SurfaceCoordinateListFactory.java:196-197).
Edge-ADJACENT patches are handled exactly by the shared-edge
cancellation in :func:`georay.geom.curves.merge_patch_rings`; this module
covers patches whose boundaries cross TRANSVERSALLY.  Degenerate
configurations (vertex exactly on the other boundary, collinear partial
overlaps mixed with crossings) raise rather than produce a silently
wrong boundary.
"""

from __future__ import annotations

import numpy as np

from georay.geom.polygon import Polygon


def _close(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return 0.5 * float(np.sum(x * y2 - x2 * y))


def _ccw(ring: np.ndarray) -> np.ndarray:
    return ring if _signed_area(ring) >= 0 else ring[::-1]


def _proper_intersections(a: np.ndarray, b: np.ndarray):
    """All strictly-interior edge crossings between closed rings a and b:
    list of (ia, ta, ib, tb, point).  Raises on tangential/degenerate
    contact (t or u exactly 0/1, or collinear overlap)."""
    out = []
    for i in range(len(a) - 1):
        p = a[i]
        r = a[i + 1] - p
        for j in range(len(b) - 1):
            q = b[j]
            s = b[j + 1] - q
            denom = r[0] * s[1] - r[1] * s[0]
            qp = q - p
            if denom == 0.0:
                # parallel: collinear overlap with crossings elsewhere is a
                # degenerate mix this walk cannot express
                cross_qp_r = qp[0] * r[1] - qp[1] * r[0]
                if cross_qp_r == 0.0:
                    lo = min(p[0], a[i + 1][0]), min(p[1], a[i + 1][1])
                    hi = max(p[0], a[i + 1][0]), max(p[1], a[i + 1][1])
                    blo = min(q[0], b[j + 1][0]), min(q[1], b[j + 1][1])
                    bhi = max(q[0], b[j + 1][0]), max(q[1], b[j + 1][1])
                    if lo[0] <= bhi[0] and blo[0] <= hi[0] and lo[1] <= bhi[1] and blo[1] <= hi[1]:
                        raise ValueError(
                            "collinear overlapping edges in a transversal union "
                            "(mixed adjacency+overlap complex)"
                        )
                continue
            t = (qp[0] * s[1] - qp[1] * s[0]) / denom
            u = (qp[0] * r[1] - qp[1] * r[0]) / denom
            if 0.0 < t < 1.0 and 0.0 < u < 1.0:
                out.append((i, t, j, u, p + t * r))
            elif (0.0 <= t <= 1.0 and u in (0.0, 1.0)) or (
                0.0 <= u <= 1.0 and t in (0.0, 1.0)
            ):
                raise ValueError(
                    "vertex lies exactly on the other ring (tangential contact); "
                    "transversal union requires proper crossings"
                )
    return out


def union_overlapping_rings(a: np.ndarray, b: np.ndarray, _retry: bool = True) -> np.ndarray:
    """Exterior boundary of the union of two simple rings whose
    boundaries cross transversally (an even number of proper crossings).
    Containment cases return the outer ring; disjoint rings raise (the
    union is not a single polygon); a union that would create an interior
    ring (hole) raises rather than silently dropping it — matching the
    cancellation path's multiple-boundary-rings contract."""
    a = _ccw(_close(a))
    b = _ccw(_close(b))
    inter = _proper_intersections(a, b)
    if not inter:
        pa = Polygon(a)
        pb = Polygon(b)
        a_in_b, a_on_b = pb.locate(a[:-1, 0], a[:-1, 1])
        if bool((a_in_b | a_on_b).all()):
            return b
        b_in_a, b_on_a = pa.locate(b[:-1, 0], b[:-1, 1])
        if bool((b_in_a | b_on_a).all()):
            return a
        raise ValueError("disjoint rings: union is not a single polygon")

    # augmented vertex sequences: ring vertices + crossings (sorted by
    # edge position), with cross-links between the two sequences
    def augment(ring, key_edge, key_t):
        nodes = []  # (point, xid | None)
        by_edge: dict[int, list[tuple[float, int]]] = {}
        for xid, item in enumerate(inter):
            e = item[key_edge]
            t = item[key_t]
            by_edge.setdefault(e, []).append((t, xid))
        for i in range(len(ring) - 1):
            nodes.append((ring[i], None))
            for t, xid in sorted(by_edge.get(i, [])):
                nodes.append((inter[xid][4], xid))
        return nodes

    na = augment(a, 0, 1)
    nb = augment(b, 2, 3)
    pos_a = {xid: i for i, (_, xid) in enumerate(na) if xid is not None}
    pos_b = {xid: i for i, (_, xid) in enumerate(nb) if xid is not None}

    # start from a vertex of A strictly outside B
    pb = Polygon(b)
    start_idx = None
    for i, (pt, xid) in enumerate(na):
        if xid is None:
            inside, on = pb.locate(np.array([pt[0]]), np.array([pt[1]]))
            if not bool(inside[0]) and not bool(on[0]):
                start_idx = i
                break
    if start_idx is None:
        # A has no vertex strictly outside B; try the symmetric start once
        # (near-coincident rings have no such vertex on EITHER side —
        # degenerate, not an infinite mutual fallback)
        if _retry:
            return union_overlapping_rings(b, a, _retry=False)
        raise ValueError(
            "no start vertex strictly outside the other ring on either side "
            "(near-coincident overlapping rings); degenerate for the union walk"
        )

    out = [na[start_idx][0]]
    visited: set[int] = set()
    ring_id, idx = "A", start_idx
    max_steps = 2 * (len(na) + len(nb)) + 4
    for _ in range(max_steps):
        if ring_id == "A":
            idx = (idx + 1) % len(na)
            pt, xid = na[idx]
            if idx == start_idx:
                break
            out.append(pt)
            if xid is not None:
                visited.add(xid)
                ring_id, idx = "B", pos_b[xid]
        else:
            idx = (idx + 1) % len(nb)
            pt, xid = nb[idx]
            out.append(pt)
            if xid is not None:
                visited.add(xid)
                ring_id, idx = "A", pos_a[xid]
    else:
        raise ValueError("union walk did not close (degenerate ring pair)")
    if len(visited) < len(inter):
        # crossings not on the exterior walk belong to an interior ring:
        # the union has a hole this representation cannot carry
        raise ValueError(
            "union creates an interior ring (hole); merge_patch_rings only "
            "returns a single simple exterior"
        )
    out.append(out[0])
    ring = np.asarray(out, dtype=np.float64)
    # drop consecutive duplicates introduced by switching exactly at a point
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = np.any(ring[1:] != ring[:-1], axis=1)
    ring = ring[keep]
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring
