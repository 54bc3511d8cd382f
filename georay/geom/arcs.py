"""Arc densification by geodesic sampling (GmlUtils.inferPointsOnArc, G-01).

Exactly ``TOTAL_ARC_POINTS = 5`` samples including both end points
(GmlUtils.java:71,98-128) — fixture-count parity depends on this constant
(VerifyGmlUtils.java:161, VerifyCurveCoordinateListFactory.java:49).

Semantics (GmlUtils.java:104-127):
- CircleByCenterPoint => startAngle=0, endAngle=360;
- endAngle == 0 is rewritten to 360 so endAngle > startAngle;
- radius converted to meters via UCUM (georay.uom);
- each sample is a geodesic *destination* from the center at the given
  azimuth (GeodesyUtils.calculateDestination), i.e. Vincenty direct.

Coordinates follow the curve CRS's authority axis order (lat-first for
EPSG:4326 — the fixtures assert arcEnd.x is a latitude).
"""

from __future__ import annotations

import numpy as np

from georay.crs.geodesy import geodesic_destination
from georay.crs.identifiers import axis_order_latlon
from georay.uom import length_in_meters

TOTAL_ARC_POINTS = 5


def infer_points_on_arc(
    center_0: float,
    center_1: float,
    radius: float,
    radius_uom: str = "m",
    start_angle: float | None = None,
    end_angle: float | None = None,
    epsg: int = 4326,
    latlon: bool | None = None,
) -> np.ndarray:
    """Densify an ArcByCenterPoint / CircleByCenterPoint -> (5,2) coords in
    the CRS's authority axis order (center given the same way).

    ``latlon`` overrides the axis-order decision for srsName forms whose
    order differs from the EPSG authority order (CRS84 is 4326 but
    lon-first).  A start angle without an end angle is rejected cleanly
    (the reference NPEs on the same input).
    """
    if start_angle is None:  # CircleByCenterPoint
        start_angle, end_angle = 0.0, 360.0
    if end_angle is None:
        raise ValueError("ArcByCenterPoint requires an endAngle when startAngle is given")
    if end_angle == 0:
        end_angle = 360.0  # ensure endAngle > startAngle (GmlUtils.java:116)
    radius_m = length_in_meters(radius, radius_uom)

    latlon_first = axis_order_latlon(int(epsg)) if latlon is None else bool(latlon)
    lat_c, lon_c = (center_0, center_1) if latlon_first else (center_1, center_0)

    angles = start_angle + (end_angle - start_angle) / (TOTAL_ARC_POINTS - 1) * np.arange(
        TOTAL_ARC_POINTS, dtype=np.float64
    )
    lat, lon = geodesic_destination(
        np.full(TOTAL_ARC_POINTS, lat_c), np.full(TOTAL_ARC_POINTS, lon_c), angles, radius_m
    )
    if latlon_first:
        return np.column_stack([lat, lon])
    return np.column_stack([lon, lat])
