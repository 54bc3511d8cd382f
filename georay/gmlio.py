"""GML 3.2 geometry reader: XML -> georay geometry descriptors.

The reference unmarshals GML via Geotk JAXB bindings (GmlUtils.java:414-433,
TopologicalRelationships.java:227-247).  This reader (stdlib
``xml.etree``, no JAXB) parses the same fixture corpus into the
descriptor IR of ``georay.geom.curves``, implementing the reference's
resolution semantics:

- srsName chain (G-05/G-06, GmlUtils.findCRSReference GmlUtils.java:299-327):
  element's own ``@srsName`` ▸ nearest ancestor's ▸ child pos/posList's;
  URN and http forms both accepted (R-07/R-08).
- collection members inherit the collection's srsName (G-07).
- posList flattened with ``srsDimension`` stride, dims > 2 dropped (G-08).
- ArcByCenterPoint/CircleByCenterPoint keep radius uom + angles for G-01.

Used by the conformance tests to parse ``/root/reference``'s own XML
fixtures and assert the reference's exact expected values; the production
engine's source edge is html extraction (georay.extract), not GML.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from georay.crs.identifiers import parse_epsg


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _srs_info(srs_name: str):
    """srsName string -> {'epsg', 'latlon'} — the axis-order bit must ride
    along with the code: CRS84 parses to 4326 but is LON-first, so losing
    it would transpose every coordinate downstream."""
    from georay.crs.identifiers import axis_order_latlon

    try:
        return {"epsg": parse_epsg(srs_name), "latlon": axis_order_latlon(srs_name)}
    except ValueError:
        return None


def _srs_of(elem, inherited=None):
    srs = elem.get("srsName")
    if srs:
        info = _srs_info(srs)
        if info is not None:
            return info
    return inherited


def _child_srs(elem):
    """Third fallback of findCRSReference (GmlUtils.java:312-315): srsName
    on a DIRECT pos/posList child only — the reference XPath is
    './gml:posList | ./gml:pos', not a descendant scan."""
    for ch in list(elem):
        if _local(ch.tag) in ("pos", "posList") and ch.get("srsName"):
            info = _srs_info(ch.get("srsName"))
            if info is not None:
                return info
    return None


def _floats(text: str) -> np.ndarray:
    return np.fromstring(text.replace(",", " "), sep=" ") if text else np.empty(0)


def _coords_of(elem, dim: int | None = None) -> np.ndarray:
    """Collect pos / posList children (in document order) -> (N,2).

    The stride comes from ``srsDimension`` on the element or the
    posList/pos child (G-08: dims > 2 dropped); default 2.
    """
    def dim_of(child) -> int:
        for source in (child, elem):
            v = source.get("srsDimension")
            if v:
                return int(v)
        return dim or 2

    rows = []
    for ch in list(elem):
        name = _local(ch.tag)
        if name == "posList":
            d = dim_of(ch)
            rows.append(_floats(ch.text).reshape(-1, d)[:, :2])
        elif name == "pos":
            rows.append(_floats(ch.text)[:2].reshape(1, 2))
    if not rows:
        return np.empty((0, 2))
    return np.concatenate(rows)


def _find_children(elem, *names):
    return [ch for ch in list(elem) if _local(ch.tag) in names]


def _segment_from_xml(seg) -> dict:
    name = _local(seg.tag)
    if name in ("ArcByCenterPoint", "CircleByCenterPoint"):
        center = _coords_of(seg)[0]
        radius_el = _find_children(seg, "radius")[0]
        out = {
            "type": name,
            "center": center,
            "radius": float(radius_el.text),
            "radius_uom": radius_el.get("uom", "m"),
        }
        start = _find_children(seg, "startAngle")
        end = _find_children(seg, "endAngle")
        if start:
            out["start_angle"] = float(start[0].text)
        if end:
            out["end_angle"] = float(end[0].text)
        return out
    type_map = {
        "LineStringSegment": "LineString",
        "GeodesicString": "GeodesicString",
        "Arc": "Arc",
        "ArcString": "ArcString",
        "Circle": "Circle",
    }
    if name not in type_map:
        raise ValueError(f"Unsupported curve segment element: {name}")
    return {"type": type_map[name], "coords": _coords_of(seg)}


#: document context stack for xlink:href resolution — parse_gml_file
#: pushes {"dir": <document directory>, "root": <document element>} so
#: ring members can reference curves by fragment or sibling file.  A
#: plain stack (not contextvars): parsing is synchronous and single
#: threaded within a task, and nested file resolution pushes/pops.
_HREF_CTX: list[dict] = []
_HREF_MAX_DEPTH = 8

#: caller-supplied transport for REMOTE xlink:href members
#: (CurveCoordinateListFactory.java:198-204 unmarshals any URI; we keep
#: the per-geometry network fetch out of the engine).  Signature:
#: ``fetcher(url: str) -> bytes`` returning the referenced GML document.
#: Resolution still happens only at polygon-LOAD time (driver side,
#: before the broadcast) — never inside a per-batch stage — so a fetcher
#: is a bounded number of calls over the small broadcast side.
_HREF_FETCHER = None


def set_href_fetcher(fetcher):
    """Install (or clear, with None) the remote-href transport; returns
    the previous fetcher so tests/callers can restore it."""
    global _HREF_FETCHER
    prev = _HREF_FETCHER
    _HREF_FETCHER = fetcher
    return prev


def _href_of(elem) -> str | None:
    for k, v in elem.attrib.items():
        if _local(k) == "href":
            return v
    return None


def _elem_by_gml_id(root, frag: str):
    for el in root.iter():
        for k, v in el.attrib.items():
            if _local(k) == "id" and v == frag:
                return el
    return None


def _resolve_href(href: str):
    """C-08 (CurveCoordinateListFactory.java:198-204): a gml:Ring curve
    member may carry ``xlink:href`` instead of an in-line curve; the
    reference unmarshals the URI.  At 10^12-doc scale a per-geometry
    remote fetch is a non-starter, so this resolver accepts LOCAL
    references only — ``#id`` fragments within the referencing document
    and relative / ``file:`` paths (optionally ``path#id``) against the
    referencing document's directory — and raises cleanly on remote
    schemes.  Resolution happens where GML polygons are loaded (driver
    side, before the broadcast), never inside a per-batch stage."""
    import os.path
    import urllib.parse

    if len(_HREF_CTX) > _HREF_MAX_DEPTH:
        raise ValueError(f"xlink:href resolution exceeded depth {_HREF_MAX_DEPTH} (cycle?)")
    ctx = _HREF_CTX[-1] if _HREF_CTX else {}
    parsed = urllib.parse.urlparse(href)
    if parsed.scheme in ("http", "https", "ftp", "s3", "gs"):
        if _HREF_FETCHER is None:
            raise ValueError(
                f"remote xlink:href {href!r} is not dereferenced (no per-geometry "
                "network fetch at scale); inline the member, ship the file "
                "next to the referencing document, or install a transport "
                "with gmlio.set_href_fetcher"
            )
        frag = parsed.fragment
        url = href.split("#", 1)[0]
        root = ET.fromstring(_HREF_FETCHER(url))
        el = _elem_by_gml_id(root, frag) if frag else root
        if el is None:
            raise ValueError(
                f"xlink:href {href!r}: no element with gml:id={frag!r} in fetched {url}"
            )
        # remote members may fragment-reference within themselves, but a
        # relative path has no directory to resolve against
        _HREF_CTX.append({"dir": None, "root": root})
        return el
    if parsed.scheme not in ("", "file"):
        raise ValueError(f"unsupported xlink:href scheme {parsed.scheme!r} in {href!r}")
    path, frag = parsed.path, parsed.fragment
    if not path:  # same-document fragment: #curve1
        root = ctx.get("root")
        if root is None:
            raise ValueError(f"fragment href {href!r} outside a document context")
        el = _elem_by_gml_id(root, frag)
        if el is None:
            raise ValueError(f"xlink:href fragment {href!r}: no element with gml:id={frag!r}")
        return el
    if not os.path.isabs(path):
        base = ctx.get("dir")
        if base is None:
            raise ValueError(f"relative href {href!r} outside a document context")
        path = os.path.join(base, path)
    root = ET.parse(path).getroot()
    el = _elem_by_gml_id(root, frag) if frag else root
    if el is None:
        raise ValueError(f"xlink:href {href!r}: no element with gml:id={frag!r} in {path}")
    # member files resolve their own relative hrefs against THEIR directory
    _HREF_CTX.append({"dir": os.path.dirname(path), "root": root})
    return el


def _ring_from_xml(ring, srs) -> dict:
    name = _local(ring.tag)
    epsg = srs["epsg"] if srs else None
    latlon = srs["latlon"] if srs else None
    if name == "LinearRing":
        return {"kind": "LinearRing", "coords": _coords_of(ring), "epsg": epsg, "latlon": latlon}
    if name == "Ring":
        members = []
        for cm in _find_children(ring, "curveMember", "curveMembers"):
            inline = list(cm)
            href = _href_of(cm)
            if not inline and href is not None:
                depth = len(_HREF_CTX)
                target = _resolve_href(href)
                try:
                    members.append(parse_geometry(target, inherited_epsg=srs))
                finally:
                    del _HREF_CTX[depth:]  # pop any context a file ref pushed
                continue
            for geom in inline:
                members.append(parse_geometry(geom, inherited_epsg=srs))
        return {"kind": "Ring", "members": members, "epsg": epsg, "latlon": latlon}
    raise ValueError(f"Unsupported ring element: {name}")


def parse_geometry(elem, inherited_epsg=None) -> dict:
    """GML element -> georay geometry descriptor (kind/epsg/latlon/...).

    ``latlon`` records the authority axis order of the srsName FORM used
    (CRS84 is 4326 but lon-first); descriptors default to the EPSG
    authority order when absent.
    """
    from georay.crs.identifiers import axis_order_latlon

    name = _local(elem.tag)
    if isinstance(inherited_epsg, int):
        inherited_epsg = {"epsg": inherited_epsg, "latlon": axis_order_latlon(inherited_epsg)}
    srs = _srs_of(elem, inherited_epsg) or _child_srs(elem)
    epsg = srs["epsg"] if srs else None
    latlon = srs["latlon"] if srs else None

    if name == "Point":
        return {"kind": "Point", "coords": _coords_of(elem)[0], "epsg": epsg, "latlon": latlon}

    if name == "LineString":
        return {"kind": "LineString", "coords": _coords_of(elem), "epsg": epsg, "latlon": latlon}

    if name == "Curve":
        segs = []
        for segments in _find_children(elem, "segments"):
            for seg in list(segments):
                segs.append(_segment_from_xml(seg))
        return {"kind": "Curve", "segments": segs, "epsg": epsg, "latlon": latlon}

    if name == "CompositeCurve":
        members = []
        for cm in _find_children(elem, "curveMember", "curveMembers"):
            for geom in list(cm):
                members.append(parse_geometry(geom, inherited_epsg=srs))
        return {"kind": "CompositeCurve", "members": members, "epsg": epsg, "latlon": latlon}

    if name == "OrientableCurve":
        base = None
        for bc in _find_children(elem, "baseCurve"):
            for geom in list(bc):
                base = parse_geometry(geom, inherited_epsg=srs)
        return {
            "kind": "OrientableCurve",
            "orientation": elem.get("orientation", "+"),
            "base": base,
            "epsg": epsg if epsg is not None else (base or {}).get("epsg"),
            "latlon": latlon if latlon is not None else (base or {}).get("latlon"),
        }

    if name == "Polygon":
        exterior = None
        interiors = []
        for ext in _find_children(elem, "exterior"):
            exterior = _ring_from_xml(list(ext)[0], srs)
        for inte in _find_children(elem, "interior"):
            interiors.append(_ring_from_xml(list(inte)[0], srs))
        return {"kind": "Polygon", "exterior": exterior, "interiors": interiors, "epsg": epsg, "latlon": latlon}

    if name == "Surface":
        patches = []
        for patches_el in _find_children(elem, "patches"):
            for patch in list(patches_el):
                pname = _local(patch.tag)
                kind = {"PolygonPatch": "Polygon", "Rectangle": "Rectangle", "Triangle": "Triangle"}.get(
                    pname, "Polygon"
                )
                exterior = None
                interiors = []
                for ext in _find_children(patch, "exterior"):
                    exterior = _ring_from_xml(list(ext)[0], srs)
                for inte in _find_children(patch, "interior"):
                    interiors.append(_ring_from_xml(list(inte)[0], srs))
                patches.append({"patch": kind, "exterior": exterior, "interiors": interiors})
        return {"kind": "Surface", "patches": patches, "epsg": epsg, "latlon": latlon}

    if name in ("MultiCurve", "MultiSurface", "MultiPoint", "MultiGeometry"):
        members = []
        member_tags = (
            "curveMember", "curveMembers", "surfaceMember", "surfaceMembers",
            "pointMember", "pointMembers", "geometryMember", "geometryMembers",
        )
        for mm in _find_children(elem, *member_tags):
            for geom in list(mm):
                # members lacking srsName inherit the collection's (G-07)
                members.append(parse_geometry(geom, inherited_epsg=srs))
        return {"kind": name, "members": members, "epsg": epsg, "latlon": latlon}

    raise ValueError(f"Unsupported GML geometry element: {name}")


def parse_gml_file(path: str) -> dict:
    """Parse a GML fixture file's document element (G-04 analog).

    Establishes the document context for C-08 ``xlink:href`` ring-member
    resolution (fragments and sibling files; see ``_resolve_href``)."""
    import os.path

    root = ET.parse(path).getroot()
    _HREF_CTX.append({"dir": os.path.dirname(os.path.abspath(path)), "root": root})
    try:
        return parse_geometry(root)
    finally:
        _HREF_CTX.pop()


def prepare_geometry(desc: dict, target_epsg: int = 4326):
    """Descriptor -> computational geometry in ONE right-handed CRS — the
    EP-1 pipeline (unmarshal -> toJTSGeometry -> setCRS,
    TopologicalRelationships.java:204-271):

    densify curves (G-01/C-*), swap to right-handed axis order (R-05),
    reproject into ``target_epsg`` (R-01), dedup @1ppm.  Returns
    ('point', (x, y)) | ('line', LineString) | ('polygon', Polygon) |
    ('multi', [prepared...]).
    """
    from georay.crs.identifiers import axis_order_latlon
    from georay.crs.projections import transformer
    from georay.geom.curves import curve_coordinate_list
    from georay.geom.linestring import LineString
    from georay.geom.polygon import Polygon
    from georay.geom.rings import remove_consecutive_duplicates

    kind = desc["kind"]
    epsg = desc.get("epsg") or 4326
    latlon = desc.get("latlon")
    if latlon is None:
        latlon = axis_order_latlon(epsg)

    def harmonize(coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        if latlon:
            coords = coords[:, ::-1]
        if int(epsg) != int(target_epsg):
            x, y = transformer(int(epsg), int(target_epsg)).transform(coords[:, 0], coords[:, 1])
            coords = np.column_stack([x, y])
        return coords

    if kind == "Point":
        p = harmonize(desc["coords"])[0]
        return ("point", (float(p[0]), float(p[1])))
    if kind in ("LineString", "Curve", "CompositeCurve", "OrientableCurve", "Ring", "LinearRing"):
        coords = curve_coordinate_list(desc, epsg)
        coords = remove_consecutive_duplicates(harmonize(coords), 1.0)
        return ("line", LineString(coords, target_epsg))
    if kind in ("Polygon", "Surface"):
        from georay.geom.curves import surface_exterior_boundary, surface_interior_boundaries

        ext = harmonize(surface_exterior_boundary(desc, epsg))
        holes = [harmonize(h) for h in surface_interior_boundaries(desc, epsg)]
        return ("polygon", Polygon(ext, holes, target_epsg))
    if kind.startswith("Multi"):
        return ("multi", [prepare_geometry(m, target_epsg) for m in desc["members"]])
    raise ValueError(f"Unsupported geometry kind: {kind}")


def is_spatially_related(predicate: str, desc1: dict, desc2: dict) -> bool:
    """EP-1 end-to-end: the reference's ``isSpatiallyRelated(pred, g1, g2)``
    over parsed GML descriptors — harmonize into g2's CRS family (here:
    EPSG:4326 lon/lat) and evaluate the predicate for the operand-type
    combinations the conformance corpus exercises."""
    import numpy as np

    pred = predicate.upper()
    g1 = prepare_geometry(desc1)
    g2 = prepare_geometry(desc2)

    def pairs(g):
        return g[1] if g[0] == "multi" else [g]

    def relate(a, b):
        (ka, va), (kb, vb) = a, b
        if ka == "point" and kb == "polygon":
            return bool(vb.relate_points(np.array([va[0]]), np.array([va[1]]), pred)[0])
        if ka == "polygon" and kb == "point":
            inv = {"WITHIN": "CONTAINS", "CONTAINS": "WITHIN"}.get(pred, pred)
            return bool(va.relate_points(np.array([vb[0]]), np.array([vb[1]]), inv)[0])
        if ka == "line" and kb == "line":
            hit = va.intersects_line(vb)
        elif ka == "line" and kb == "polygon":
            hit = va.intersects_polygon(vb)
        elif ka == "polygon" and kb == "line":
            hit = vb.intersects_polygon(va)
        elif ka == "point" and kb == "point":
            hit = bool(np.allclose(va, vb))
        else:
            raise ValueError(f"Unsupported operand pair: {ka} vs {kb}")
        if pred == "INTERSECTS":
            return hit
        if pred == "DISJOINT":
            return not hit
        raise ValueError(f"Predicate {pred} not defined for {ka} vs {kb}")

    results = [relate(a, b) for a in pairs(g1) for b in pairs(g2)]
    # multi-geometry aggregation: INTERSECTS/BBOX are existential (any
    # member pair suffices); WITHIN/CONTAINS/DISJOINT are universal
    # (every member must satisfy the relation).  Other predicates over
    # multi operands have no simple pairwise reduction — reject loudly.
    multi = g1[0] == "multi" or g2[0] == "multi"
    if pred in ("DISJOINT", "WITHIN", "CONTAINS"):
        return all(results)
    if pred in ("INTERSECTS", "BBOX"):
        return any(results)
    if multi:
        raise ValueError(f"Predicate {pred} is not defined over multi-geometries here")
    return results[0]


def parse_temporal(elem):
    """gml:TimeInstant / gml:TimePeriod -> (begin_us, end_us) UTC epoch
    microseconds (T-01, GmlUtils.gmlToTemporalGeometricPrimitive,
    GmlUtils.java:466-506).  Only full ISO-8601 date-times are accepted;
    date-only / gYear positions raise (reference rejects non-instant
    values, GmlUtils.java:480-483)."""
    from datetime import datetime, timezone

    def to_us(text: str) -> int:
        s = text.strip()
        if "T" not in s or s.endswith("T") or s.endswith("TZ"):
            raise ValueError(f"Not an ISO-8601 instant: {text}")
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)

    name = _local(elem.tag)
    if name == "TimeInstant":
        pos = _find_children(elem, "timePosition")[0]
        t = to_us(pos.text)
        return t, t
    if name == "TimePeriod":
        begin = _find_children(elem, "beginPosition")[0]
        end = _find_children(elem, "endPosition")[0]
        return to_us(begin.text), to_us(end.text)
    raise ValueError(f"Unsupported temporal element: {name}")


def parse_temporal_file(path: str):
    return parse_temporal(ET.parse(path).getroot())


def parse_envelope_file(path: str):
    """ows:BoundingBox / ows:WGS84BoundingBox / gml:Envelope -> Envelope
    (Extents.createEnvelope, A-04: missing CRS or CRS84 => default
    geographic lon/lat)."""
    from georay.geom.envelope import Envelope

    root = ET.parse(path).getroot()
    name = _local(root.tag)
    crs_ref = root.get("crs") or root.get("srsName")
    lower = upper = None
    for ch in root.iter():
        ln = _local(ch.tag)
        if ln in ("LowerCorner", "lowerCorner"):
            lower = _floats(ch.text)
        elif ln in ("UpperCorner", "upperCorner"):
            upper = _floats(ch.text)
    if lower is None or upper is None:
        raise ValueError(f"No corners in {name}")
    if name == "WGS84BoundingBox" or not crs_ref:
        return Envelope(lower[0], lower[1], upper[0], upper[1], 4326, crs84=True)
    epsg = parse_epsg(crs_ref)
    crs84 = crs_ref.upper().endswith(("CRS84", "CRS:84"))
    return Envelope(lower[0], lower[1], upper[0], upper[1], epsg, crs84=crs84)
