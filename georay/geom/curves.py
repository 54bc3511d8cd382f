"""Curve / surface coordinate-list factories (gml/ package semantics,
C-01..C-15) over dict-based geometry descriptors.

The reference walks JAXB objects with ``instanceof`` dispatch
(CurveCoordinateListFactory.java:64-91, SurfaceCoordinateListFactory.java:71-84,
GeometryCoordinateList.java:25-42); the engine's IR is a plain descriptor:

segment  := {"type": "LineString"|"GeodesicString"|"Arc"|"ArcString",
             "coords": (N,2) authority-axis-order array}
          | {"type": "ArcByCenterPoint"|"CircleByCenterPoint",
             "center": (2,), "radius": float, "radius_uom": str,
             "start_angle": float|None, "end_angle": float|None}
curve    := {"kind": "Curve", "segments": [segment...]}
          | {"kind": "LineString", "coords": ...}
          | {"kind": "CompositeCurve", "members": [curve...]}
          | {"kind": "OrientableCurve", "orientation": "+"|"-", "base": curve}
          | {"kind": "Ring", "members": [curve...]}
          | {"kind": "LinearRing", "coords": ...}
surface  := {"kind": "Polygon", "exterior": curve/ring, "interiors": [...]}
          | {"kind": "Surface", "patches": [{"patch": "Polygon"|"Rectangle"|
             "Triangle", "exterior": ..., "interiors": [...]}]}

``epsg`` may sit at any level; members inherit the parent's when absent
(srsName propagation, C-06 / G-07).  Remote ``xlink:href`` members are NOT
dereferenced (C-08 note: the engine performs no per-record I/O at scale —
broadcast geometries arrive fully materialized).
"""

from __future__ import annotations

import numpy as np

from georay.geom.arcs import infer_points_on_arc

#: minimum positions per segment type (GmlUtils.minCurveSegmentLength, G-09)
MIN_SEGMENT_POSITIONS = {
    "ArcByCenterPoint": 1,
    "CircleByCenterPoint": 1,
    "Arc": 3,
    "ArcString": 3,
    "Circle": 3,
    "LineString": 2,
    "GeodesicString": 2,
}


def _segment_coords(seg: dict, epsg: int, latlon: bool | None = None) -> np.ndarray:
    """C-09: per-segment coordinate extraction (CurveSegmentType.java:23-106).
    All kinds demand a resolved CRS.  ``latlon`` carries the srsName
    form's axis order (CRS84: epsg 4326 but lon-first) into the geodesic
    arc sampler, which must know which ordinate is the latitude."""
    if epsg is None:
        raise ValueError("CRS reference is required for curve segments")
    t = seg["type"]
    if t in ("ArcByCenterPoint", "CircleByCenterPoint"):
        c = np.asarray(seg["center"], dtype=np.float64)
        return infer_points_on_arc(
            c[0],
            c[1],
            seg["radius"],
            seg.get("radius_uom", "m"),
            seg.get("start_angle") if t == "ArcByCenterPoint" else None,
            seg.get("end_angle") if t == "ArcByCenterPoint" else None,
            epsg,
            latlon=latlon,
        )
    from georay import registry

    if t in registry.SEGMENT_KERNELS:  # user-extension point (SURVEY §2.10)
        need = MIN_SEGMENT_POSITIONS.get(t, 0)
        in_coords = seg.get("coords")
        # G-09 validates the segment's INPUT positions (a densifying
        # kernel's output count says nothing about input validity)
        if in_coords is not None and len(np.asarray(in_coords).reshape(-1, 2)) < need:
            raise ValueError(
                f"{t} segment requires >= {need} positions, "
                f"got {len(np.asarray(in_coords).reshape(-1, 2))}"
            )
        return registry._coerce_coords(registry.SEGMENT_KERNELS[t](seg, epsg, latlon))
    coords = np.asarray(seg["coords"], dtype=np.float64).reshape(-1, 2)
    need = MIN_SEGMENT_POSITIONS.get(t)
    if need is None:
        raise ValueError(f"Unsupported curve segment type: {t}")  # C-04 unknown => error
    if len(coords) < need:
        raise ValueError(f"{t} segment requires >= {need} positions, got {len(coords)}")
    return coords


def extract_pos_list(values, crs_dim: int) -> np.ndarray:
    """G-08: flatten a posList value stream -> (N,2), stride = CRS dim,
    dimensions beyond the second dropped (GmlUtils.java:250-258)."""
    return np.asarray(values, dtype=np.float64).reshape(-1, int(crs_dim))[:, :2]


def curve_coordinate_list(geom: dict, epsg: int | None = None, latlon: bool | None = None) -> np.ndarray:
    """C-03 dispatch: any curve descriptor -> concatenated (N,2) coords
    (in the descriptor's declared axis order; ``latlon`` inherits down
    exactly like ``epsg``)."""
    epsg = geom.get("epsg", epsg)
    latlon = geom.get("latlon", latlon)
    kind = geom["kind"]
    if kind in ("LineString", "LinearRing"):
        return np.asarray(geom["coords"], dtype=np.float64).reshape(-1, 2)
    if kind == "Curve":
        parts = [_segment_coords(s, epsg, latlon) for s in geom["segments"]]
        return np.concatenate(parts) if parts else np.empty((0, 2))
    if kind == "CompositeCurve":
        # members inherit the composite's srsName (C-06)
        parts = [curve_coordinate_list(m, epsg, latlon) for m in geom["members"]]
        return np.concatenate(parts) if parts else np.empty((0, 2))
    if kind == "OrientableCurve":
        base = curve_coordinate_list(geom["base"], epsg, latlon)
        return base[::-1].copy() if geom.get("orientation") == "-" else base  # C-07
    if kind == "Ring":
        parts = [curve_coordinate_list(m, epsg, latlon) for m in geom["members"]]
        return np.concatenate(parts) if parts else np.empty((0, 2))
    from georay import registry

    if kind in registry.CURVE_KIND_KERNELS:  # user-extension point (SURVEY §2.10)
        return registry._coerce_coords(registry.CURVE_KIND_KERNELS[kind](geom, epsg, latlon))
    raise ValueError(f"Unsupported curve kind: {kind}")


def _any_proper_crossing(rings: list[np.ndarray], chunk: int = 1024) -> bool:
    """Do any two patch rings cross transversally (overlapping patches,
    not merely edge-adjacent)?  Chunked with bbox pruning so large patch
    complexes never allocate a dense E_i x E_j matrix at once."""
    from georay.geom.relate import segments_cross_kinds

    closed = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[0]])
        closed.append(r)
    bboxes = [
        (r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()) for r in closed
    ]
    for i in range(len(closed)):
        for j in range(i + 1, len(closed)):
            ai, bj = bboxes[i], bboxes[j]
            if ai[2] < bj[0] or bj[2] < ai[0] or ai[3] < bj[1] or bj[3] < ai[1]:
                continue
            a, b = closed[i], closed[j]
            b1_all, b2_all = b[:-1], b[1:]
            bmin = np.minimum(b1_all, b2_all)
            bmax = np.maximum(b1_all, b2_all)
            ea1, ea2 = a[:-1], a[1:]
            for s in range(0, len(ea1), chunk):
                a1 = ea1[s : s + chunk]
                a2 = ea2[s : s + chunk]
                lo = np.minimum(a1, a2).min(axis=0)
                hi = np.maximum(a1, a2).max(axis=0)
                keep = ~(
                    (bmax[:, 0] < lo[0]) | (bmin[:, 0] > hi[0])
                    | (bmax[:, 1] < lo[1]) | (bmin[:, 1] > hi[1])
                )
                if not keep.any():
                    continue
                b1k, b2k = b1_all[keep], b2_all[keep]
                for t in range(0, len(b1k), chunk):
                    proper, _ = segments_cross_kinds(
                        a1, a2, b1k[t : t + chunk], b2k[t : t + chunk]
                    )
                    if bool(proper.any()):
                        return True
    return False


def _patch_exterior(patch: dict, epsg) -> np.ndarray:
    from georay import registry

    k = patch.get("patch")
    if k in registry.PATCH_KERNELS:  # user-extension point (SURVEY §2.10)
        return registry._coerce_coords(registry.PATCH_KERNELS[k](patch, epsg))
    return curve_coordinate_list(patch["exterior"], patch.get("epsg", epsg))


def _patch_interiors(patch: dict, epsg) -> list[np.ndarray]:
    # Rectangle / Triangle patches have no interior rings (C-14)
    if patch.get("patch") in ("Rectangle", "Triangle"):
        return []
    return [curve_coordinate_list(r, patch.get("epsg", epsg)) for r in patch.get("interiors", [])]


def merge_patch_rings(rings: list[np.ndarray]) -> np.ndarray:
    """C-11: exterior boundary of a patch union.

    The reference unions patch polygons with JTS
    (SurfaceCoordinateListFactory.java:196-197); here the union is
    computed by shared-edge cancellation — adjacent patches in a valid
    gml:Surface share complete edges, so edges appearing twice (in either
    direction) are interior and the survivors stitch into the outer ring.
    This is exact for edge-adjacent patch complexes (the conformance
    corpus).  Patches whose boundaries CROSS transversally fall back to a
    pairwise Greiner-Hormann union walk (georay.geom.union); mixed
    adjacency+overlap complexes raise rather than emit a wrong boundary.
    """
    if not rings:
        raise ValueError("Surface has no patches (empty exterior)")
    if len(rings) > 1 and _any_proper_crossing(rings):
        return _union_fold(rings)
    if len(rings) == 1:
        r = rings[0]
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[0]])
        return r
    edges = {}
    order = []
    for ring in rings:
        r = ring
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[0]])
        for a, b in zip(r[:-1], r[1:]):
            ka, kb = tuple(a), tuple(b)
            if ka == kb:
                continue
            if (kb, ka) in edges:
                edges.pop((kb, ka))
            elif (ka, kb) in edges:
                edges.pop((ka, kb))  # duplicate same-direction edge also cancels
            else:
                edges[(ka, kb)] = True
                order.append((ka, kb))
    remaining = [e for e in order if e in edges]
    if not remaining:
        return rings[0]
    nxt = {}
    for a, b in remaining:
        if a in nxt:
            # a vertex with two outgoing boundary edges: not an
            # edge-adjacent complex — degenerate contact (vertex-on-edge,
            # partial collinear overlap); the overlay fold handles those
            return _union_fold(rings)
        nxt[a] = b
    start = remaining[0][0]
    out = [start]
    cur = start
    for _ in range(len(remaining)):
        cur = nxt[cur]
        out.append(cur)
        if cur == start:
            break
    if len(out) - 1 < len(remaining):
        # multiple boundary rings: patches touch at points / partial
        # edges rather than complete shared edges — overlay fold
        return _union_fold(rings)
    return np.asarray(out, dtype=np.float64)


def _union_fold(rings: list[np.ndarray]) -> np.ndarray:
    """Pairwise overlay-union fold over a patch complex.  Always unions a
    ring that actually meets the accumulator (input order must not matter
    — a pair of mutually disjoint patches bridged by a later one is still
    one polygon)."""
    from georay.geom.union import union_overlapping_rings

    acc = rings[0]
    remaining = list(rings[1:])
    while remaining:
        progressed = False
        for i, r in enumerate(remaining):
            try:
                acc = union_overlapping_rings(acc, r)
            except ValueError as ex:
                if "disjoint" in str(ex):
                    continue
                raise
            remaining.pop(i)
            progressed = True
            break
        if not progressed:
            raise ValueError(
                "patch complex does not union into a single connected polygon"
            )
    return acc


def surface_exterior_boundary(geom: dict, epsg: int | None = None) -> np.ndarray:
    """C-10/C-11/C-12: exterior boundary coords of a Polygon or Surface."""
    epsg = geom.get("epsg", epsg)
    if geom["kind"] == "Polygon":
        return curve_coordinate_list(geom["exterior"], epsg)
    if geom["kind"] == "Surface":
        rings = [_patch_exterior(p, epsg) for p in geom["patches"]]
        return merge_patch_rings(rings)
    raise ValueError(f"Unsupported surface kind: {geom['kind']}")


def surface_interior_boundaries(geom: dict, epsg: int | None = None) -> list[np.ndarray]:
    """C-13: the set of interior-ring coordinate lists (holes)."""
    epsg = geom.get("epsg", epsg)
    if geom["kind"] == "Polygon":
        return [curve_coordinate_list(r, epsg) for r in geom.get("interiors", [])]
    if geom["kind"] == "Surface":
        out = []
        for p in geom["patches"]:
            out.extend(_patch_interiors(p, epsg))
        return out
    raise ValueError(f"Unsupported surface kind: {geom['kind']}")


def build_line_string(curve: dict, epsg: int | None = None):
    """G-03 (GmlUtils.buildLineString, GmlUtils.java:441-458): curve ->
    densified, 1ppm-deduped, right-handed LineString — the fallback path
    the reference uses when converting GML Curves to JTS.

    Returns a :class:`georay.geom.linestring.LineString` in right-handed
    axis order (lon/lat for geographic CRSs).
    """
    from georay.geom.linestring import LineString
    from georay.geom.rings import transform_ring_to_right_handed

    epsg = curve.get("epsg", epsg)
    if epsg is None:
        raise ValueError("CRS reference is required to build a LineString")
    coords = curve_coordinate_list(curve, epsg)
    coords = transform_ring_to_right_handed(
        coords, int(epsg), latlon=curve.get("latlon")
    )  # densified + dedup@1ppm
    return LineString(coords, int(epsg))


def geometry_coordinate_list(geom: dict, epsg: int | None = None) -> np.ndarray:
    """C-15 top-level dispatch POINT / CURVE / SURFACE
    (GeometryCoordinateList.java:25-42, GeometryType.java:8-34)."""
    kind = geom["kind"]
    if kind == "Point":
        return np.asarray(geom["coords"], dtype=np.float64).reshape(1, 2)
    if kind in ("LineString", "Curve", "CompositeCurve", "OrientableCurve", "Ring", "LinearRing"):
        return curve_coordinate_list(geom, epsg)
    if kind in ("Polygon", "Surface"):
        return surface_exterior_boundary(geom, epsg)
    if kind.startswith("Multi"):
        # G-07: members inherit the collection's srsName
        parts = [geometry_coordinate_list(m, geom.get("epsg", epsg)) for m in geom["members"]]
        return np.concatenate(parts) if parts else np.empty((0, 2))
    raise ValueError(f"Unsupported geometry kind: {kind}")
