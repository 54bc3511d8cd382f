"""Hierarchical tile-cell index over lon/lat (H3/S2-style, quadtree flavour).

The reference library has no tiling; ``north_rule`` requires an H3/S2-style
cell index as the shuffle key for tile assignment, per-cell aggregation and
kNN cell-neighbourhood expansion.  Neither ``h3`` nor ``s2`` bindings exist
in this environment, so we define an equivalent deterministic scheme:

At resolution ``r`` the globe (lon in [-180,180), lat in [-90,90)) is an
equirectangular grid of 2^r x 2^r cells.  A cell id packs into a single
non-negative int64 (SQL- and Arrow-friendly):

    cell = (r << 58) | (iy << 29) | ix

with ``ix = floor((lon+180)/360 * 2^r)`` and ``iy = floor((lat+90)/180 * 2^r)``
(clamped to the grid).  This is exactly expressible in ANSI SQL::

    CAST(r AS BIGINT)*288230376151711744            -- 2^58
      + CAST(floor((lat+90.0)/180.0*pow(2,r)) AS BIGINT)*536870912   -- 2^29
      + CAST(floor((lon+180.0)/360.0*pow(2,r)) AS BIGINT)

which the DuckDB oracles in ``__ray_entry__`` mirror term for term.

Cell neighbourhoods (``grid_disk``) wrap in longitude and clamp in latitude,
which is what the kNN ring-expansion join uses (SURVEY.md §2.1 kNN note).

All functions are vectorized numpy kernels intended to run inside
``Dataset.map_batches(batch_format="pyarrow")`` stages.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29  # ix/iy each fit in 29 bits; res in bits 58..62
_RES_SHIFT = np.int64(58)
_Y_SHIFT = np.int64(29)
_XY_MASK = np.int64((1 << 29) - 1)


def latlng_to_cell(lat, lon, res: int):
    """Encode lon/lat arrays (degrees) to int64 cell ids at ``res``.

    Engine analog of ``h3.latlng_to_cell``; the per-document tile
    assignment of SURVEY.md §2.8.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution out of range [0, {MAX_RES}]: {res}")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = np.int64(1) << np.int64(res)
    # operation order matters: the SQL oracle replicates it verbatim so both
    # sides floor identical IEEE-754 doubles.
    ix = np.floor((lon + 180.0) / 360.0 * np.float64(n)).astype(np.int64)
    iy = np.floor((lat + 90.0) / 180.0 * np.float64(n)).astype(np.int64)
    np.clip(ix, 0, n - 1, out=ix)
    np.clip(iy, 0, n - 1, out=iy)
    return (np.int64(res) << _RES_SHIFT) | (iy << _Y_SHIFT) | ix


def cell_res(cell):
    return (np.asarray(cell, dtype=np.int64) >> _RES_SHIFT).astype(np.int64)


def cell_ix(cell):
    return np.asarray(cell, dtype=np.int64) & _XY_MASK


def cell_iy(cell):
    return (np.asarray(cell, dtype=np.int64) >> _Y_SHIFT) & _XY_MASK


def cell_to_bbox(cell):
    """Cell -> (minlon, minlat, maxlon, maxlat) arrays (degrees)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    n = (np.int64(1) << res).astype(np.float64)
    ix = cell_ix(cell).astype(np.float64)
    iy = cell_iy(cell).astype(np.float64)
    w = 360.0 / n
    h = 180.0 / n
    minlon = -180.0 + ix * w
    minlat = -90.0 + iy * h
    return minlon, minlat, minlon + w, minlat + h


def cell_to_polygon(cell):
    """Cell -> closed 5-point lon/lat ring, analog of ``Extents.envelopeAsPolygon``
    (Extents.java:231-243): the raster->vector bridge for tile clipping."""
    minlon, minlat, maxlon, maxlat = cell_to_bbox(np.asarray([cell], dtype=np.int64))
    x0, y0, x1, y1 = minlon[0], minlat[0], maxlon[0], maxlat[0]
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )


def cell_parent(cell, parent_res: int):
    """Coarsen cells to ``parent_res`` (hierarchical rollup key)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell resolution")
    shift = (res - np.int64(parent_res)).astype(np.int64)
    ix = cell_ix(cell) >> shift
    iy = cell_iy(cell) >> shift
    return (np.int64(parent_res) << _RES_SHIFT) | (iy << _Y_SHIFT) | ix


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of ``cell`` (incl. itself).

    Longitude wraps; latitude clamps at the poles.  This is the
    cell-neighbourhood expansion primitive for the kNN join
    (BASELINE.json north_star: "kNN via cell-neighborhood expansion").
    """
    cell = int(cell)
    res = int(cell_res(cell))
    n = 1 << res
    cx = int(cell_ix(cell))
    cy = int(cell_iy(cell))
    ys = np.arange(max(0, cy - k), min(n - 1, cy + k) + 1, dtype=np.int64)
    xs = (np.arange(cx - k, cx + k + 1, dtype=np.int64)) % n
    xs = np.unique(xs)
    gx, gy = np.meshgrid(xs, ys)
    return (np.int64(res) << _RES_SHIFT) | (gy.ravel() << _Y_SHIFT) | gx.ravel()


def grid_ring(cell: int, k: int) -> np.ndarray:
    """The hollow ring at exactly Chebyshev distance ``k`` (k>=1)."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    disk_k = grid_disk(cell, k)
    disk_km1 = grid_disk(cell, k - 1)
    return np.setdiff1d(disk_k, disk_km1, assume_unique=True)


def cell_width_meters(res: int, lat: float = 0.0) -> float:
    """Approximate cell edge length in meters at a latitude (for choosing
    the kNN expansion radius)."""
    from georay.crs.geodesy import WGS84_A

    circumference = 2.0 * np.pi * WGS84_A * np.cos(np.radians(lat))
    return float(circumference / (1 << res))
