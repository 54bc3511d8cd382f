"""Ring normalization kernels (GeodesyUtils.java R-05 / R-06 / R-09).

- :func:`remove_consecutive_duplicates` — ppm-relative dedup with the
  ring-closure rule (duplicate *last* point removes the next-to-last
  instead), bit-for-bit with GeodesyUtils.java:283-304.
- :func:`transform_ring_to_right_handed` — densified ring coords in the
  source CRS's authority axis order -> right-handed (x=east) coords,
  optionally deduped @1ppm (GeodesyUtils.java:144-209).
"""

from __future__ import annotations

import numpy as np

from georay.crs.identifiers import axis_order_latlon
from georay.crs.projections import transformer


def _is_dup(prev: np.ndarray, nxt: np.ndarray, tol: float) -> bool:
    # relative comparison: |next/prev - 1| <= tol per ordinate
    # (GeodesyUtils.java:291-293).  Java double semantics carried exactly:
    # x/0 -> inf (not a dup) and 0/0 -> NaN, whose <= comparison is FALSE
    # — so a point with a zero ordinate is never removed, even when the
    # coordinates are identical.  (NaN <= tol is already False in numpy;
    # no remapping.)
    with np.errstate(divide="ignore", invalid="ignore"):
        delta = np.abs(nxt / prev - 1.0)
    return bool(np.all(delta <= tol))


def remove_consecutive_duplicates(coords: np.ndarray, tolerance_ppm: float) -> np.ndarray:
    """Drop P(n+1) when it equals P(n) within tolerance; if the duplicate is
    the LAST point, drop P(n) instead to preserve ring closure.

    Sequential by definition (each comparison is against the last *kept*
    point); rings are small (SURVEY.md §7.4), and the vectorized adjacent
    check below short-circuits the common no-duplicate case.
    """
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n < 2:
        return coords.copy()
    tol = tolerance_ppm * 1e-6
    # fast path: no adjacent pair is within tolerance -> nothing to remove
    # (NaN from 0/0 compares False, matching Java — see _is_dup)
    with np.errstate(divide="ignore", invalid="ignore"):
        deltas = np.abs(coords[1:] / coords[:-1] - 1.0)
    if not np.any(np.all(deltas <= tol, axis=1)):
        return coords.copy()

    out = list(coords)
    i = 1
    while i < len(out):
        if _is_dup(out[i - 1], out[i], tol):
            if i == len(out) - 1:
                # duplicate last point: remove next-to-last, keep closure
                # (GeodesyUtils.java:294-297)
                del out[len(out) - 2]
                break
            del out[i]
        else:
            i += 1
    return np.asarray(out, dtype=np.float64)


def transform_ring_to_right_handed(
    coords: np.ndarray,
    epsg: int,
    keep_all_coords: bool = False,
    dst_epsg: int | None = None,
    latlon: bool | None = None,
) -> np.ndarray:
    """Ring coords (authority axis order of ``epsg``) -> right-handed CS.

    For geographic lat-first CRSs this is the lat,lon -> lon,lat column
    swap (AxesConvention.RIGHT_HANDED); projected CRSs are already
    right-handed.  Unless ``keep_all_coords``, consecutive duplicates are
    removed at 1 ppm — the R-05 vs R-06 split the reference fixtures pin
    to 7 vs 9 coords (VerifyGeodesyUtils.java:135,163).
    """
    coords = np.asarray(coords, dtype=np.float64)
    # latlon overrides for srsName forms whose order differs from the
    # EPSG authority order (CRS84: code 4326 but already lon-first)
    lat_first = axis_order_latlon(int(epsg)) if latlon is None else bool(latlon)
    if lat_first:
        out = coords[:, ::-1].copy()  # lat,lon -> lon,lat
    else:
        out = coords.copy()
    if dst_epsg is not None and int(dst_epsg) != int(epsg):
        x, y = transformer(int(epsg), int(dst_epsg)).transform(out[:, 0], out[:, 1])
        out = np.column_stack([x, y])
    if not keep_all_coords:
        out = remove_consecutive_duplicates(out, 1.0)
    return out
