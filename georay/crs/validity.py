"""Domain-of-validity envelopes per CRS (GeodesyUtils.java:56-66, R-03).

The reference asks Apache SIS's embedded EPSG database for
``CRS.getDomainOfValidity``; we embed the handful of areas-of-use the
engine needs (EPSG area-of-use values, public EPSG registry data) and
derive UTM zone extents arithmetically.  Used to validate / clip
extracted coordinates before they enter the join.

Returns envelopes in the CRS's *authority axis order* to match the
reference fixture (VerifyGeodesyUtils.java:47-53 expects lower-corner
ordinate 0 == -90 for EPSG:4326, i.e. latitude first).
"""

from __future__ import annotations

from georay.crs.identifiers import parse_epsg, axis_order_latlon

# epsg -> (lat_min, lon_min, lat_max, lon_max)  [EPSG registry area of use]
_DOMAINS = {
    4326: (-90.0, -180.0, 90.0, 180.0),
    4979: (-90.0, -180.0, 90.0, 180.0),
    4258: (32.88, -16.1, 84.73, 40.18),   # ETRS89
    4269: (14.92, 167.65, 86.46, -47.74),  # NAD83 (crosses antimeridian)
    3857: (-85.06, -180.0, 85.06, 180.0),
}


def _utm_domain(epsg: int):
    if 32601 <= epsg <= 32660:
        zone, lat_lo, lat_hi = epsg - 32600, 0.0, 84.0
    elif 32701 <= epsg <= 32760:
        zone, lat_lo, lat_hi = epsg - 32700, -80.0, 0.0
    elif 25828 <= epsg <= 25838:
        zone, lat_lo, lat_hi = epsg - 25800, 0.0, 84.0
    elif 26901 <= epsg <= 26923:
        zone, lat_lo, lat_hi = epsg - 26900, 0.0, 84.0
    else:
        return None
    lon_lo = -186.0 + 6.0 * zone
    return (lat_lo, lon_lo, lat_hi, lon_lo + 6.0)


def get_domain_of_validity(crs_ref: str):
    """CRS reference (URN / http URI) -> (min0, min1, max0, max1) in the
    CRS's authority axis order, plus that order as a bool (lat-first?).

    Raises ValueError for malformed refs (ref: IllegalArgumentException)
    and KeyError for unknown EPSG codes (ref: NoSuchAuthorityCodeException)
    — GeodesyUtils.java:56-66 contract.
    """
    epsg = parse_epsg(crs_ref)  # ValueError on malformed
    dom = _DOMAINS.get(epsg) or _utm_domain(epsg)
    if dom is None:
        raise KeyError(f"No such EPSG code: {epsg}")
    lat_min, lon_min, lat_max, lon_max = dom
    if axis_order_latlon(epsg):
        return (lat_min, lon_min, lat_max, lon_max), True
    return (lon_min, lat_min, lon_max, lat_max), False
