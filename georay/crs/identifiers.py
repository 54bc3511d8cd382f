"""CRS identifier normalization (GeodesyUtils.java R-04 / R-07 / R-08).

The engine stores CRSs as an ``epsg: int32`` column internally and renders
URN / URI forms only at the edges; these kernels do the string work.

Reference semantics replicated:

- ``getAbbreviatedCRSIdentifier`` (GeodesyUtils.java:222-240): 'http' or
  'urn' CRS reference -> ``authority:code`` (e.g. ``EPSG:4326``); any other
  scheme raises (IllegalArgumentException -> ValueError).
- ``convertSRSNameToURN`` (GeodesyUtils.java:254-271): http URI ->
  ``urn:ogc:def:crs:{auth}:{version}:{code}`` with version '0' / '' elided.
- ``getCRSIdentifier`` (GeodesyUtils.java:77-98): CRS -> URN; the WGS84
  lon/lat (CRS84) system is special-cased to the OGC URN.
"""

from __future__ import annotations

import numpy as np

EPSG_4326_URN = "urn:ogc:def:crs:EPSG::4326"
CRS84_URN = "urn:ogc:def:crs:OGC:1.3:CRS84"

#: geographic EPSG codes whose GML axis order is lat-first (ISO 6709);
#: everything projected (and CRS84) is x/y (east/north) first.
_LATLON_FIRST = {4326, 4258, 4269, 4019, 4979}


def get_abbreviated_crs_identifier(srs_name: str) -> str:
    """'http...' or 'urn...' CRS ref -> 'AUTHORITY:CODE' (R-07).

    Path segments are NOT empty-filtered (GeodesyUtils.java splits
    verbatim): 'EPSG//4326' means authority EPSG with an empty version.
    """
    s = srs_name.strip()
    if s.startswith("http"):
        parts = s.split("/")
        if len(parts) < 3:
            raise ValueError(f"Invalid CRS reference: {srs_name}")
        authority, code = parts[-3], parts[-1]
        return f"{authority}:{code}"
    if s.startswith("urn"):
        parts = s.split(":")
        if len(parts) < 6:
            raise ValueError(f"Invalid CRS URN: {srs_name}")
        return f"{parts[4]}:{parts[-1]}"
    raise ValueError(f"Unsupported CRS reference scheme: {srs_name}")


def convert_srs_name_to_urn(srs_name: str) -> str:
    """http CRS URI -> URN form; any non-'http' value is returned
    UNCHANGED (GeodesyUtils.java:255-257 — the reference tolerates URNs
    and arbitrary identifiers here; only 'http' URIs are rewritten)."""
    s = srs_name.strip()
    if not s.startswith("http"):
        return s
    parts = s.split("/")
    if len(parts) < 3:
        raise ValueError(f"Invalid CRS reference: {srs_name}")
    authority, version, code = parts[-3], parts[-2], parts[-1]
    if version == "0":
        version = ""  # EPSG definitions are not versioned (GeodesyUtils.java:92)
    return f"urn:ogc:def:crs:{authority}:{version}:{code}"


def get_crs_identifier(epsg: int, crs84: bool = False) -> str:
    """EPSG code -> URN; CRS84 (WGS84 lon/lat) special case (R-04)."""
    if crs84:
        return CRS84_URN
    return f"urn:ogc:def:crs:EPSG::{int(epsg)}"


def parse_epsg(srs_name: str) -> int:
    """Any supported srsName form -> integer EPSG code.

    CRS84 maps to 4326 (same datum, lon/lat axis order — see
    :func:`axis_order_latlon` for the order bit).
    """
    s = srs_name.strip()
    if not s:
        raise ValueError("empty srsName")
    upper = s.upper()
    if upper.endswith("CRS84") or upper.endswith("CRS:84"):
        return 4326
    if s.startswith(("http", "urn")):
        abbrev = get_abbreviated_crs_identifier(s)
        authority, _, code = abbrev.partition(":")
        if authority.upper() not in ("EPSG", "OGC"):
            raise ValueError(f"Unsupported CRS authority: {authority}")
        return int(code)
    if upper.startswith("EPSG:"):
        return int(s.split(":")[-1])
    raise ValueError(f"Unsupported CRS reference: {srs_name}")


def axis_order_latlon(srs_name_or_epsg) -> bool:
    """True when the authority axis order is latitude-first (R-05 critical
    semantic: GML EPSG:4326 coords are lat,lon; engine math is lon,lat)."""
    if isinstance(srs_name_or_epsg, (int, np.integer)):
        return int(srs_name_or_epsg) in _LATLON_FIRST
    s = str(srs_name_or_epsg).strip().upper()
    if s.endswith("CRS84") or s.endswith("CRS:84"):
        return False
    return parse_epsg(str(srs_name_or_epsg)) in _LATLON_FIRST


def parse_epsg_column(values) -> np.ndarray:
    """Vectorized :func:`parse_epsg` over a string column.

    srsName cardinality is tiny in practice, so parse unique values once
    and gather — O(n) with a handful of python-level parses.
    """
    arr = np.asarray(values, dtype=object)
    uniq, inverse = np.unique(arr.astype(str), return_inverse=True)
    codes = np.array([parse_epsg(u) for u in uniq], dtype=np.int32)
    return codes[inverse]
