"""Envelope (MBR) algebra — Extents.java semantics (A-01..A-09).

An :class:`Envelope` stores its corners in the CRS's *authority axis
order* (lat-first for geographic EPSG codes, x/y otherwise), exactly like
the reference's SIS ``GeneralEnvelope``; the engine's columnar form is
always four lon-lat ``float64`` columns (SURVEY.md §1.3) and converts at
the edges.

Aggregation helpers are partial+final (per-batch min/max then merge) so
they drop straight into ``Dataset.aggregate`` / salted groupbys
(SURVEY.md §3 EP-2).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from georay.crs.identifiers import axis_order_latlon, get_crs_identifier
from georay.crs.projections import transformer


@dataclass
class Envelope:
    """Axis-aligned MBR + CRS; ordinates in authority axis order."""

    min0: float
    min1: float
    max0: float
    max1: float
    epsg: int = 4326
    crs84: bool = False  # OGC CRS84: WGS84 datum, lon/lat order, 'default geographic'

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_lonlat(cls, minlon, minlat, maxlon, maxlat, epsg: int = 4326, crs84: bool = False):
        if not crs84 and axis_order_latlon(epsg):
            return cls(minlat, minlon, maxlat, maxlon, epsg, crs84)
        return cls(minlon, minlat, maxlon, maxlat, epsg, crs84)

    # -- accessors ----------------------------------------------------------
    @property
    def latlon_first(self) -> bool:
        return (not self.crs84) and axis_order_latlon(self.epsg)

    def as_lonlat(self):
        """(minlon, minlat, maxlon, maxlat) regardless of axis order."""
        if self.latlon_first:
            return self.min1, self.min0, self.max1, self.max0
        return self.min0, self.min1, self.max0, self.max1

    def lower_corner(self):
        return (self.min0, self.min1)

    def upper_corner(self):
        return (self.max0, self.max1)

    # -- A-05: envelope -> closed 5-point ring (Extents.java:231-243) -------
    def as_polygon_ring(self) -> np.ndarray:
        x0, y0, x1, y1 = self.min0, self.min1, self.max0, self.max1
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)

    # -- P-07: envelope intersection (SpatialAssert.java:39-67) -------------
    def intersects(self, other: "Envelope") -> bool:
        a, b = self, other
        if (a.epsg, a.crs84) != (b.epsg, b.crs84):
            b = b.transform(a.epsg, a.crs84)
        return not (
            a.max0 < b.min0 or b.max0 < a.min0 or a.max1 < b.min1 or b.max1 < a.min1
        )

    # -- reprojection -------------------------------------------------------
    def transform(self, dst_epsg: int, dst_crs84: bool = False) -> "Envelope":
        """Corner-transform into another CRS (sufficient for the axis-aligned
        fixtures; the reference delegates to SIS ``Envelopes.transform``)."""
        minlon, minlat, maxlon, maxlat = self.as_lonlat()
        t = transformer(self.epsg, int(dst_epsg))
        xs, ys = t.transform(
            np.array([minlon, maxlon, minlon, maxlon]), np.array([minlat, minlat, maxlat, maxlat])
        )
        return Envelope.from_lonlat(
            float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()), int(dst_epsg), dst_crs84
        )


# ---------------------------------------------------------------------------
# A-06: gml:Envelope serialization with round-DOWN 2dp (Extents.java:191-223)
# ---------------------------------------------------------------------------

def _format_round_down(v: float) -> str:
    """Java DecimalFormat '#.##' with RoundingMode.DOWN, root locale:
    truncate toward zero at 2 decimals, strip trailing zeros/point."""
    sign = "-" if v < 0 else ""
    scaled = math.floor(abs(v) * 100.0 + 1e-9)  # epsilon guards repr noise like 2.9999999996
    whole, frac = divmod(scaled, 100)
    if frac == 0:
        return f"{sign}{whole}"
    if frac % 10 == 0:
        return f"{sign}{whole}.{frac // 10}"
    return f"{sign}{whole}.{frac:02d}"


def envelope_as_gml(env: Envelope) -> str:
    """gml:Envelope XML string (A-06)."""
    srs = get_crs_identifier(env.epsg, env.crs84)
    lower = f"{_format_round_down(env.min0)} {_format_round_down(env.min1)}"
    upper = f"{_format_round_down(env.max0)} {_format_round_down(env.max1)}"
    return (
        f'<gml:Envelope xmlns:gml="http://www.opengis.net/gml/3.2" srsName="{srs}">'
        f"<gml:lowerCorner>{lower}</gml:lowerCorner>"
        f"<gml:upperCorner>{upper}</gml:upperCorner></gml:Envelope>"
    )


# ---------------------------------------------------------------------------
# A-07: KVP serialization (Extents.java:364-382)
# ---------------------------------------------------------------------------

def _java_double(v: float) -> str:
    """Java Double.toString for the value range the fixtures use."""
    s = repr(float(v))
    return s


def envelope_to_string(env: Envelope) -> str:
    """'min0,min1,max0,max1[,crsURN]'; CRS omitted for default geographic
    (CRS84) per Extents.java:375-380."""
    parts = [_java_double(env.min0), _java_double(env.min1), _java_double(env.max0), _java_double(env.max1)]
    if not env.crs84:
        parts.append(get_crs_identifier(env.epsg))
    return ",".join(parts)


def envelope_from_kvp(kvp: str) -> Envelope:
    """Inverse of :func:`envelope_to_string` — parse
    'min0,min1,max0,max1[,crsRef]' (A-04 input-edge analog for KVP
    bbox parameters; missing CRS => default geographic / CRS84 per
    Extents.java:296-299)."""
    from georay.crs.identifiers import parse_epsg

    parts = [p.strip() for p in kvp.split(",")]
    if len(parts) == 4:
        ords = [float(p) for p in parts]
        return Envelope(*ords, 4326, crs84=True)
    if len(parts) == 5:
        ords = [float(p) for p in parts[:4]]
        crs84 = parts[4].upper().endswith(("CRS84", "CRS:84"))
        return Envelope(*ords, parse_epsg(parts[4]), crs84=crs84)
    raise ValueError(f"Invalid bbox KVP: {kvp}")


# ---------------------------------------------------------------------------
# A-08 / A-09: antipodes (Extents.java:390-431)
# ---------------------------------------------------------------------------

def get_antipode(coord):
    """(phi, lam) -> (-phi, lam +/- 180); vectorized over trailing axis 0/1
    pairs (Extents.java:421-431 keeps higher dims untouched — we are 2D)."""
    c = np.asarray(coord, dtype=np.float64)
    out = c.copy()
    out[..., 0] = -c[..., 0]
    out[..., 1] = np.where(c[..., 1] < 0, c[..., 1] + 180.0, c[..., 1] - 180.0)
    return out


def antipodal_envelope(env: Envelope) -> Envelope:
    """Envelope on the opposite side of Earth, in EPSG:4326 (A-08).

    Exactly Extents.java:404-411: ONLY the first ordinate (latitude) is
    swapped between the corners; longitudes keep their antipode values
    unsorted.  For an envelope whose lon range crosses 0, the antipodal
    lon range crosses the antimeridian and is represented WRAPAROUND
    (min1 > max1, SIS GeneralEnvelope semantics) — re-sorting it would
    describe the 340-degree complement instead of the true region.
    """
    e = env if (env.epsg == 4326 and not env.crs84 and env.latlon_first) else env.transform(4326)
    ap_lower = get_antipode(np.array([e.min0, e.min1]))
    ap_upper = get_antipode(np.array([e.max0, e.max1]))
    # swap first ordinate so corners stay lower<=upper in latitude
    ap_lower[0], ap_upper[0] = ap_upper[0], ap_lower[0]
    return Envelope(ap_lower[0], ap_lower[1], ap_upper[0], ap_upper[1], 4326)


# ---------------------------------------------------------------------------
# A-01 / A-03: envelope aggregation as partial+final combiners
# ---------------------------------------------------------------------------

def envelope_partial(lon, lat):
    """Per-batch partial for the envelope aggregate: (minlon, minlat,
    maxlon, maxlat) of finite coords; None for an empty batch."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mask = np.isfinite(lon) & np.isfinite(lat)
    if not mask.any():
        return None
    lon, lat = lon[mask], lat[mask]
    return (float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max()))


def envelope_merge(a, b):
    """Final combine for partials (re-mergeable: SURVEY.md §7.4)."""
    if a is None:
        return b
    if b is None:
        return a
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def coalesce_bounding_boxes(envelopes) -> Envelope:
    """Union of N envelopes, all transformed into the FIRST one's CRS
    before accumulating — Extents.java:258-274 'first CRS wins' rule."""
    envelopes = list(envelopes)
    if not envelopes:
        raise ValueError("no envelopes to coalesce")
    first = envelopes[0]
    acc = first
    for env in envelopes[1:]:
        e = env if (env.epsg, env.crs84) == (first.epsg, first.crs84) else env.transform(first.epsg, first.crs84)
        acc = Envelope(
            min(acc.min0, e.min0),
            min(acc.min1, e.min1),
            max(acc.max0, e.max0),
            max(acc.max1, e.max1),
            first.epsg,
            first.crs84,
        )
    return acc
