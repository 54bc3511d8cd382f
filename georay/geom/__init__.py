"""Geometry kernels: envelopes, rings, polygons, hulls, arcs, spatial index."""

from georay.geom.envelope import Envelope  # noqa: F401
from georay.geom.polygon import Polygon, PolygonSet  # noqa: F401
from georay.geom.rings import (  # noqa: F401
    remove_consecutive_duplicates,
    transform_ring_to_right_handed,
)
from georay.geom.hull import convex_hull  # noqa: F401
from georay.geom.arcs import infer_points_on_arc, TOTAL_ARC_POINTS  # noqa: F401
