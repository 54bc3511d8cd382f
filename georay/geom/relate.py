"""Full DE-9IM predicate surface for AREA-AREA and CURVE-AREA pairs.

The reference evaluates all eight predicates between ANY two geometries
via JTS relate (TopologicalRelationships.java:57-96; predicate switch at
74-91).  Round 1 reduced to point-vs-area; this module completes the
surface with classical computational-geometry tests on the existing
kernels (ring crossings + containment + interior-representative points):

- :func:`relate_polygon_polygon` — generic polygon pair (holes included),
  all 8 predicates at once.
- :func:`relate_line_polygon` — curve-vs-area WITHIN / CROSSES / TOUCHES
  (round 1 had only INTERSECTS / distance).
- :func:`box_polygon_relations` — VECTORIZED axis-aligned-box stream vs
  one broadcast polygon (the raster-tile-clip vs admin-polygon join the
  north_star names).  Exact arithmetic, no epsilon: every float op
  mirrors the SQL oracle term for term, so predicate parity is bitwise.

Semantics follow JTS/DE-9IM:
  INTERSECTS  = any dimension pair nonempty        DISJOINT = negation
  CONTAINS(A,B) = B ⊆ closure(A) and II nonempty   WITHIN = converse
  TOUCHES     = intersects and interiors disjoint
  OVERLAPS    = II nonempty, neither contains the other (equal-dim)
  EQUALS      = contains both ways (topological, equalsTopo analog)
  CROSSES     = area-area: never (dim rule); line-area: II and IE nonempty
"""

from __future__ import annotations

import numpy as np

from georay.geom.linestring import LineString, segments_intersect
from georay.geom.polygon import Polygon


# ---------------------------------------------------------------------------
# shared primitives
# ---------------------------------------------------------------------------

def segments_cross_kinds(a1, a2, b1, b2):
    """Pairwise segment intersection split into (proper, touching).

    proper: the segments cross at a single interior point of both
    (orientation signs strictly opposite on both) — implies the two
    bounded regions' interiors meet when the segments are area
    boundaries.  touching: intersection exists but an endpoint lies on
    the other segment (collinear overlap included).
    Exact float arithmetic — the SQL mirror reproduces d1..d4 verbatim.
    """
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
    proper = (
        ((d1 > 0) != (d2 > 0))
        & ((d3 > 0) != (d4 > 0))
        & (d1 != 0)
        & (d2 != 0)
        & (d3 != 0)
        & (d4 != 0)
    )

    def on_segment(o, p, q):
        return (
            (q[..., 0] >= np.minimum(o[..., 0], p[..., 0]))
            & (q[..., 0] <= np.maximum(o[..., 0], p[..., 0]))
            & (q[..., 1] >= np.minimum(o[..., 1], p[..., 1]))
            & (q[..., 1] <= np.maximum(o[..., 1], p[..., 1]))
        )

    touch = (
        ((d1 == 0) & on_segment(b1, b2, a1))
        | ((d2 == 0) & on_segment(b1, b2, a2))
        | ((d3 == 0) & on_segment(a1, a2, b1))
        | ((d4 == 0) & on_segment(a1, a2, b2))
    )
    return proper, touch


def interior_point(poly: Polygon) -> np.ndarray:
    """A deterministic point strictly inside the polygon (holes honoured):
    the vertex centroid when interior (always true for star-shaped
    rings), else a scanline probe — cast horizontal lines between
    adjacent distinct vertex heights and take midpoints of consecutive
    ring crossings (even-odd: the first interval is interior)."""
    ring = poly.exterior[:-1]
    cand = ring.mean(axis=0)
    inside, _ = poly.locate(np.array([cand[0]]), np.array([cand[1]]))
    if bool(inside[0]):
        return cand
    x1, y1 = poly._ex1[:, 0], poly._ex1[:, 1]
    x2, y2 = poly._ex2[:, 0], poly._ex2[:, 1]
    ys = np.unique(np.concatenate([y1, y2]))
    for lo, hi in zip(ys[:-1], ys[1:]):
        yq = (lo + hi) / 2.0
        crossing = (y1 > yq) != (y2 > yq)
        if not crossing.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = x1[crossing] + (yq - y1[crossing]) * (x2[crossing] - x1[crossing]) / (
                y2[crossing] - y1[crossing]
            )
        xin = np.sort(xin)
        for a, b in zip(xin[0::2], xin[1::2]):
            mid = np.array([(a + b) / 2.0, yq])
            inside, _ = poly.locate(np.array([mid[0]]), np.array([mid[1]]))
            if bool(inside[0]):
                return mid
    raise ValueError("degenerate polygon: no interior point found")


# ---------------------------------------------------------------------------
# generic polygon-polygon relate (per pair; pytest / API surface)
# ---------------------------------------------------------------------------

def relate_polygon_polygon(a: Polygon, b: Polygon) -> dict[str, bool]:
    """All 8 DE-9IM predicates between two polygons (holes honoured via
    the even-odd locate kernel).  Mirrors JTS relate outcomes for
    non-degenerate inputs (TopologicalRelationships.java:74-91)."""
    proper, touch = segments_cross_kinds(a._ex1, a._ex2, b._ex1, b._ex2)
    proper_any = bool(proper.any())
    contact_any = proper_any or bool(touch.any())

    av_in_b, av_on_b = b.locate(a.exterior[:-1, 0], a.exterior[:-1, 1])
    bv_in_a, bv_on_a = a.locate(b.exterior[:-1, 0], b.exterior[:-1, 1])
    ip_a = interior_point(a)
    ip_b = interior_point(b)
    ipa_in_b, ipa_on_b = b.locate(np.array([ip_a[0]]), np.array([ip_a[1]]))
    ipb_in_a, ipb_on_a = a.locate(np.array([ip_b[0]]), np.array([ip_b[1]]))

    def hole_inside(holder: Polygon, other: Polygon) -> bool:
        # does any hole of ``holder`` poke a hole in ``other``'s claim to
        # be contained?  A hole ring that crosses ``other`` is caught by
        # the proper-crossing test (edge arrays include hole edges); the
        # remaining case is a hole whose INTERIOR lies inside ``other`` —
        # detected by a hole vertex, edge midpoint, or interior-probe
        # point strictly interior to ``other`` (vertices alone miss holes
        # whose every vertex sits exactly ON the other's boundary)
        for h in holder.holes:
            if len(h) > 1:
                ring = h[:-1]
                mids = (h[:-1] + h[1:]) / 2.0
                probes = np.vstack([ring, mids, interior_point(Polygon(h))])
                inside, _ = other.locate(probes[:, 0], probes[:, 1])
                if bool(inside.any()):
                    return True
        return False

    interiors = (
        proper_any
        or bool(av_in_b.any())
        or bool(bv_in_a.any())
        or bool(ipa_in_b[0])
        or bool(ipb_in_a[0])
    )
    intersects = (
        interiors
        or contact_any
        or bool(av_on_b.any())
        or bool(bv_on_a.any())
    )
    contains = (
        interiors
        and not proper_any
        and bool((bv_in_a | bv_on_a).all())
        and bool(ipb_in_a[0] or ipb_on_a[0])
        and not hole_inside(a, b)  # an A-hole inside B leaves B ⊄ closure(A)
    )
    within = (
        interiors
        and not proper_any
        and bool((av_in_b | av_on_b).all())
        and bool(ipa_in_b[0] or ipa_on_b[0])
        and not hole_inside(b, a)
    )
    equals = contains and within
    return {
        "INTERSECTS": intersects,
        "DISJOINT": not intersects,
        "CONTAINS": contains,
        "WITHIN": within,
        "EQUALS": equals,
        "TOUCHES": intersects and not interiors,
        "OVERLAPS": interiors and not contains and not within,
        "CROSSES": False,  # equal-dimension areas never cross (DE-9IM dim rule)
    }


# ---------------------------------------------------------------------------
# curve-area relate (completes P-03 for CURVE operands)
# ---------------------------------------------------------------------------

def relate_line_polygon(line: LineString, poly: Polygon) -> dict[str, bool]:
    """Full line-vs-area predicate set.  Interior probes are the line's
    vertices plus segment midpoints (sufficient for fixtures whose
    segments cross the boundary at most once between probes)."""
    c = line.coords
    mids = (c[:-1] + c[1:]) / 2.0
    probes = np.vstack([c, mids])
    p_in, p_on = poly.locate(probes[:, 0], probes[:, 1])
    proper, touch = segments_cross_kinds(c[:-1], c[1:], poly._ex1, poly._ex2)
    proper_any = bool(proper.any())

    interiors = proper_any or bool(p_in.any())  # II nonempty
    exterior_reach = proper_any or bool((~p_in & ~p_on).any())  # IE nonempty
    intersects = interiors or bool(touch.any()) or bool(p_on.any())
    within = interiors and not exterior_reach
    return {
        "INTERSECTS": intersects,
        "DISJOINT": not intersects,
        "WITHIN": within,
        "CONTAINS": False,  # a curve cannot contain an area
        "EQUALS": False,  # dimension mismatch
        "TOUCHES": intersects and not interiors,
        "CROSSES": interiors and exterior_reach,
        "OVERLAPS": False,  # dimension mismatch
    }


def relate_polygon_line(poly: Polygon, line: LineString) -> dict[str, bool]:
    """Area-vs-curve view: transpose of :func:`relate_line_polygon`."""
    r = relate_line_polygon(line, poly)
    return {
        "INTERSECTS": r["INTERSECTS"],
        "DISJOINT": r["DISJOINT"],
        "CONTAINS": r["WITHIN"],  # polygon contains line <=> line within polygon
        "WITHIN": False,
        "EQUALS": False,
        "TOUCHES": r["TOUCHES"],
        "CROSSES": r["CROSSES"],
        "OVERLAPS": False,
    }


# ---------------------------------------------------------------------------
# curve-curve relate (completes the last predicate-matrix hole: the
# reference relates ANY geometry pair via JTS relate,
# TopologicalRelationships.java:74-91; VerifyTopologicalRelationships.java:92
# exercises the curve-curve DISJOINT fixture)
# ---------------------------------------------------------------------------

def _line_boundary(coords: np.ndarray) -> np.ndarray:
    """Mod-2 boundary of a polyline: its two endpoints; empty for a
    closed ring (every interior vertex touches two segments)."""
    if len(coords) > 1 and np.array_equal(coords[0], coords[-1]):
        return np.empty((0, 2))
    return np.vstack([coords[0], coords[-1]])


def _points_on_polyline(pts: np.ndarray, line: np.ndarray) -> np.ndarray:
    """bool[n]: does each point lie ON the polyline (exact arithmetic)."""
    l1, l2 = line[:-1], line[1:]
    P = pts[:, None, :]
    d = (l2 - l1)[None, :, :]
    cr = (P[..., 0] - l1[None, :, 0]) * d[..., 1] - (P[..., 1] - l1[None, :, 1]) * d[..., 0]
    inx = (P[..., 0] >= np.minimum(l1, l2)[None, :, 0]) & (
        P[..., 0] <= np.maximum(l1, l2)[None, :, 0]
    )
    iny = (P[..., 1] >= np.minimum(l1, l2)[None, :, 1]) & (
        P[..., 1] <= np.maximum(l1, l2)[None, :, 1]
    )
    return ((cr == 0.0) & inx & iny).any(axis=1)


def _collinear_intervals(p: np.ndarray, q: np.ndarray, a: np.ndarray):
    """Parameter intervals [t0, t1] (clipped to [0,1]) of segment (p, q)
    covered by COLLINEAR segments of polyline ``a``; empty list if none."""
    a1, a2 = a[:-1], a[1:]
    d = q - p
    L2 = float(d[0] * d[0] + d[1] * d[1])
    if L2 == 0.0:
        return []
    c1 = (a1[:, 0] - p[0]) * d[1] - (a1[:, 1] - p[1]) * d[0]
    c2 = (a2[:, 0] - p[0]) * d[1] - (a2[:, 1] - p[1]) * d[0]
    col = (c1 == 0.0) & (c2 == 0.0)
    if not col.any():
        return []
    t0 = ((a1[col] - p) @ d) / L2
    t1 = ((a2[col] - p) @ d) / L2
    lo = np.clip(np.minimum(t0, t1), 0.0, 1.0)
    hi = np.clip(np.maximum(t0, t1), 0.0, 1.0)
    keep = hi > lo
    return sorted(zip(lo[keep], hi[keep]))


def _polyline_covers(a: np.ndarray, b: np.ndarray) -> bool:
    """Point-set containment B ⊆ A: every segment of ``b`` fully covered
    by the union of collinear overlaps with ``a``'s segments (1-d
    coverage needs collinearity; crossing points have measure zero)."""
    for k in range(len(b) - 1):
        p, q = b[k], b[k + 1]
        if np.array_equal(p, q):
            continue
        ivs = _collinear_intervals(p, q, a)
        cover = 0.0
        for lo, hi in ivs:
            if lo > cover:
                return False
            cover = max(cover, hi)
        if cover < 1.0:
            return False
    return True


def _has_collinear_overlap(a: np.ndarray, b: np.ndarray) -> bool:
    """Any positive-length collinear overlap between the two polylines
    (=> dim(I ∩ I) = 1: a 1-d overlap always contains interior points of
    both curves, the curve boundary being just two endpoints)."""
    for k in range(len(b) - 1):
        if _collinear_intervals(b[k], b[k + 1], a):
            return True
    return False


def relate_line_line(a: LineString, b: LineString) -> dict[str, bool]:
    """All 8 DE-9IM predicates between two curves (JTS relate parity,
    TopologicalRelationships.java:74-91).  Contact inventory: proper
    segment crossings (interior x interior points), vertices of one line
    lying on the other (interior or boundary contact by whether the
    vertex is a curve endpoint), and positive-length collinear overlaps
    (dim-1 interior intersection).  Straight segments cannot touch
    interior-to-interior without crossing or collinearity, so the
    inventory is complete.  Exact float arithmetic, no epsilon."""
    A, B = a.coords, b.coords
    proper, _touch = segments_cross_kinds(A[:-1], A[1:], B[:-1], B[1:])
    proper_any = bool(proper.any())
    bnd_a = _line_boundary(A)
    bnd_b = _line_boundary(B)
    va_on_b = _points_on_polyline(A, B)
    vb_on_a = _points_on_polyline(B, A)
    has_1d = _has_collinear_overlap(A, B)

    def not_boundary(pts: np.ndarray, bnd: np.ndarray) -> np.ndarray:
        if len(bnd) == 0:
            return np.ones(len(pts), dtype=bool)
        return ~(pts[:, None, :] == bnd[None, :, :]).all(-1).any(1)

    ii_vertex = False
    for pts, on_mask in ((A, va_on_b), (B, vb_on_a)):
        sel = pts[on_mask]
        if len(sel):
            ii_vertex |= bool(
                (not_boundary(sel, bnd_a) & not_boundary(sel, bnd_b)).any()
            )
    ii_point = proper_any or ii_vertex
    interiors = ii_point or has_1d
    contact = proper_any or has_1d or bool(va_on_b.any()) or bool(vb_on_a.any())
    covered_ab = _polyline_covers(A, B)  # B ⊆ A
    covered_ba = _polyline_covers(B, A)  # A ⊆ B
    return {
        "INTERSECTS": contact,
        "DISJOINT": not contact,
        "CONTAINS": covered_ab and interiors,
        "WITHIN": covered_ba and interiors,
        "EQUALS": covered_ab and covered_ba,
        "TOUCHES": contact and not interiors,
        "CROSSES": ii_point and not has_1d,  # dim(II) = 0 for line/line
        "OVERLAPS": has_1d and not covered_ab and not covered_ba,
    }


# ---------------------------------------------------------------------------
# vectorized box-stream vs broadcast polygon (the join kernel)
# ---------------------------------------------------------------------------

def _parity_in_ring(px, py, x1, y1, x2, y2):
    """Even-odd crossing parity, exact arithmetic, op order identical to
    the pip_join SQL oracle: (y1>py) != (y2>py) AND px < x1+(py-y1)*dx/dy."""
    cpx = px[:, None]
    cpy = py[:, None]
    cond = (y1 > cpy) != (y2 > cpy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = x1 + (cpy - y1) * (x2 - x1) / (y2 - y1)
    crossings = np.count_nonzero(cond & (cpx < xin), axis=1)
    return (crossings & 1).astype(bool)


def box_polygon_relations(minx, miny, maxx, maxy, ring: np.ndarray,
                          interior_pt: tuple[float, float]) -> dict[str, np.ndarray]:
    """Vectorized DE-9IM predicate set between N axis-aligned boxes (the
    stream side: per-document tile clip rectangles) and ONE hole-free
    polygon (the broadcast side), exact float arithmetic throughout so a
    SQL oracle mirrors every comparison bitwise.

    ``interior_pt`` is a point strictly inside the polygon supplied by the
    caller (for star-shaped rings: the arithmetic center), keeping the
    interior-representative probe identical on both sides of the oracle.

    Returns boolean arrays: intersects, contains (box ⊇ polygon), within
    (box ⊆ polygon), touches, overlaps, equals.
    """
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    n = len(minx)
    rx1, ry1 = ring[:-1, 0], ring[:-1, 1]
    rx2, ry2 = ring[1:, 0], ring[1:, 1]

    # polygon vertices vs boxes (closed / strict)
    vx = rx1[None, :]
    vy = ry1[None, :]
    v_closed = (
        (vx >= minx[:, None]) & (vx <= maxx[:, None])
        & (vy >= miny[:, None]) & (vy <= maxy[:, None])
    )
    v_strict = (
        (vx > minx[:, None]) & (vx < maxx[:, None])
        & (vy > miny[:, None]) & (vy < maxy[:, None])
    )
    all_v_closed = v_closed.all(axis=1)
    any_v_strict = v_strict.any(axis=1)

    # box corners (and center) vs polygon by crossing parity
    corner_in = np.zeros((n, 4), dtype=bool)
    corners = ((minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy))
    for ci, (cx, cy) in enumerate(corners):
        corner_in[:, ci] = _parity_in_ring(cx, cy, rx1, ry1, rx2, ry2)
    cx = (minx + maxx) / 2.0
    cy = (miny + maxy) / 2.0
    center_in = _parity_in_ring(cx, cy, rx1, ry1, rx2, ry2)

    ipx, ipy = float(interior_pt[0]), float(interior_pt[1])
    ip_strict_in_box = (
        (ipx > minx) & (ipx < maxx) & (ipy > miny) & (ipy < maxy)
    )

    # box edges x polygon edges, proper / touching — evaluated per box
    # edge (4 broadcasts of (n, E)), same d1..d4 formula as the SQL
    proper_any = np.zeros(n, dtype=bool)
    touch_any = np.zeros(n, dtype=bool)
    box_edges = (
        ((minx, miny), (maxx, miny)),
        ((maxx, miny), (maxx, maxy)),
        ((maxx, maxy), (minx, maxy)),
        ((minx, maxy), (minx, miny)),
    )

    def cross(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    bx1 = rx1[None, :]
    by1 = ry1[None, :]
    bx2 = rx2[None, :]
    by2 = ry2[None, :]
    for (ax1, ay1), (ax2, ay2) in box_edges:
        a1x = ax1[:, None]
        a1y = ay1[:, None]
        a2x = ax2[:, None]
        a2y = ay2[:, None]
        d1 = cross(bx1, by1, bx2, by2, a1x, a1y)
        d2 = cross(bx1, by1, bx2, by2, a2x, a2y)
        d3 = cross(a1x, a1y, a2x, a2y, bx1, by1)
        d4 = cross(a1x, a1y, a2x, a2y, bx2, by2)
        proper = (
            ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
            & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
        )

        def on_seg(ox, oy, px_, py_, qx, qy):
            return (
                (qx >= np.minimum(ox, px_)) & (qx <= np.maximum(ox, px_))
                & (qy >= np.minimum(oy, py_)) & (qy <= np.maximum(oy, py_))
            )

        touch = (
            ((d1 == 0) & on_seg(bx1, by1, bx2, by2, a1x, a1y))
            | ((d2 == 0) & on_seg(bx1, by1, bx2, by2, a2x, a2y))
            | ((d3 == 0) & on_seg(a1x, a1y, a2x, a2y, bx1, by1))
            | ((d4 == 0) & on_seg(a1x, a1y, a2x, a2y, bx2, by2))
        )
        proper_any |= proper.any(axis=1)
        touch_any |= touch.any(axis=1)

    interiors = (
        proper_any | any_v_strict | corner_in.any(axis=1) | center_in | ip_strict_in_box
    )
    boundary_contact = proper_any | touch_any
    intersects = interiors | boundary_contact
    contains = all_v_closed & ~proper_any & interiors
    within = corner_in.all(axis=1) & ~proper_any & interiors
    equals = contains & within
    return {
        "intersects": intersects,
        "contains": contains,
        "within": within,
        "touches": intersects & ~interiors,
        "overlaps": interiors & ~contains & ~within,
        "equals": equals,
    }
