"""Ellipsoidal geodesy on WGS84, vectorized (Vincenty direct / inverse).

Replicates the semantics the reference delegates to Apache SIS's
``GeodeticCalculator`` / Geotk's ``JTS.orthodromicDistance``:

- ``GeodesyUtils.calculateDestination`` (GeodesyUtils.java:110-132):
  geodesic *direct* problem — start + azimuth + distance -> destination,
  azimuth normalized into [-180, 180].
- ``TopologicalRelationships.isWithinDistance`` (TopologicalRelationships.java:149-179):
  *orthodromic* (ellipsoidal-surface) distance between nearest points.

No pyproj in this environment, so Vincenty's formulae (public domain,
Survey Review XXIII(176), 1975) are implemented directly over numpy
arrays; accuracy ~0.5 mm, far inside the reference fixtures' ~10 m
tolerances (VerifyGeodesyUtils.java:85-86).

Conventions: latitudes/longitudes in degrees, azimuth clockwise from
north in degrees, distances in meters.  All functions broadcast.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)


def normalize_azimuth(az):
    """Normalize azimuth into [-180, 180] exactly as GeodesyUtils.java:115-119."""
    az = np.asarray(az, dtype=np.float64)
    az = np.where(az > 180.0, az - 360.0, az)
    az = np.where(az < -180.0, az + 360.0, az)
    return az


def geodesic_destination(lat, lon, azimuth_deg, distance_m):
    """Vincenty direct problem -> (lat2, lon2) in degrees.

    Mirrors ``GeodesyUtils.calculateDestination``; fixture parity:
    1 NM north/east/west of YVR within ~10 m
    (VerifyGeodesyUtils.java:79-109).
    """
    lat1 = np.radians(np.asarray(lat, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon, dtype=np.float64))
    alpha1 = np.radians(normalize_azimuth(azimuth_deg))
    s = np.asarray(distance_m, dtype=np.float64)

    a, b, f = WGS84_A, WGS84_B, WGS84_F
    sin_a1, cos_a1 = np.sin(alpha1), np.cos(alpha1)
    tan_u1 = (1.0 - f) * np.tan(lat1)
    cos_u1 = 1.0 / np.sqrt(1.0 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1

    sigma1 = np.arctan2(tan_u1, cos_a1)
    sin_alpha = cos_u1 * sin_a1
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))

    sigma = s / (b * A)
    for _ in range(8):
        two_sigma_m = 2.0 * sigma1 + sigma
        cos_2sm = np.cos(two_sigma_m)
        sin_s, cos_s = np.sin(sigma), np.cos(sigma)
        delta_sigma = (
            B
            * sin_s
            * (
                cos_2sm
                + B
                / 4.0
                * (
                    cos_s * (-1.0 + 2.0 * cos_2sm * cos_2sm)
                    - B
                    / 6.0
                    * cos_2sm
                    * (-3.0 + 4.0 * sin_s * sin_s)
                    * (-3.0 + 4.0 * cos_2sm * cos_2sm)
                )
            )
        )
        sigma = s / (b * A) + delta_sigma

    two_sigma_m = 2.0 * sigma1 + sigma
    sin_s, cos_s = np.sin(sigma), np.cos(sigma)
    cos_2sm = np.cos(two_sigma_m)

    tmp = sin_u1 * sin_s - cos_u1 * cos_s * cos_a1
    lat2 = np.arctan2(
        sin_u1 * cos_s + cos_u1 * sin_s * cos_a1,
        (1.0 - f) * np.sqrt(sin_alpha * sin_alpha + tmp * tmp),
    )
    lam = np.arctan2(sin_s * sin_a1, cos_u1 * cos_s - sin_u1 * sin_s * cos_a1)
    C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
    L = lam - (1.0 - C) * f * sin_alpha * (
        sigma + C * sin_s * (cos_2sm + C * cos_s * (-1.0 + 2.0 * cos_2sm * cos_2sm))
    )
    lon2 = (lon1 + L + 3.0 * np.pi) % (2.0 * np.pi) - np.pi
    return np.degrees(lat2), np.degrees(lon2)


def geodesic_inverse(lat1, lon1, lat2, lon2):
    """Vincenty inverse problem -> (distance_m, azimuth1_deg, azimuth2_deg).

    The 'orthodromic distance' of TopologicalRelationships.java:157.
    Near-antipodal pairs where Vincenty fails to converge fall back to a
    great-circle (haversine) distance on the mean-radius sphere.
    """
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat1, lon1, lat2, lon2 = np.broadcast_arrays(lat1, lon1, lat2, lon2)

    a, b, f = WGS84_A, WGS84_B, WGS84_F
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    L = np.radians(lon2 - lon1)

    tan_u1 = (1.0 - f) * np.tan(phi1)
    cos_u1 = 1.0 / np.sqrt(1.0 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1
    tan_u2 = (1.0 - f) * np.tan(phi2)
    cos_u2 = 1.0 / np.sqrt(1.0 + tan_u2 * tan_u2)
    sin_u2 = tan_u2 * cos_u2

    lam = L.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    sin_alpha = np.zeros_like(lam)
    cos2_alpha = np.ones_like(lam)
    cos_2sm = np.ones_like(lam)

    for _ in range(100):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt(
            (cos_u2 * sin_lam) ** 2 + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam) ** 2
        )
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sigma != 0.0, cos_u1 * cos_u2 * sin_lam / sin_sigma, 0.0)
        cos2_alpha = 1.0 - sin_alpha * sin_alpha
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_2sm = np.where(
                cos2_alpha != 0.0,
                cos_sigma - 2.0 * sin_u1 * sin_u2 / np.where(cos2_alpha == 0.0, 1.0, cos2_alpha),
                0.0,  # equatorial line
            )
        C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
        lam_prev = lam
        lam = L + (1.0 - C) * f * sin_alpha * (
            sigma
            + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm))
        )
        converged = np.abs(lam - lam_prev) < 1e-12
        if np.all(converged):
            break

    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    delta_sigma = (
        B
        * sin_sigma
        * (
            cos_2sm
            + B
            / 4.0
            * (
                cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm)
                - B
                / 6.0
                * cos_2sm
                * (-3.0 + 4.0 * sin_sigma * sin_sigma)
                * (-3.0 + 4.0 * cos_2sm * cos_2sm)
            )
        )
    )
    dist = b * A * (sigma - delta_sigma)

    # coincident points -> 0; non-converged (near-antipodal) -> haversine
    coincident = (np.abs(lat1 - lat2) < 1e-13) & (np.abs(lon1 - lon2) < 1e-13)
    dist = np.where(coincident, 0.0, dist)
    if not np.all(converged):
        dist = np.where(converged | coincident, dist, haversine_m(lat1, lon1, lat2, lon2))

    sin_lam, cos_lam = np.sin(lam), np.cos(lam)
    az1 = np.degrees(np.arctan2(cos_u2 * sin_lam, cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam))
    az2 = np.degrees(np.arctan2(cos_u1 * sin_lam, -sin_u1 * cos_u2 + cos_u1 * sin_u2 * cos_lam))
    return dist, az1, az2


def orthodromic_distance(lat1, lon1, lat2, lon2):
    """Ellipsoidal surface distance in meters (P-04 kernel)."""
    return geodesic_inverse(lat1, lon1, lat2, lon2)[0]


#: mean Earth radius (IUGG) used for the spherical fallback / fast paths
SPHERE_R = 6371008.8


def haversine_m(lat1, lon1, lat2, lon2, radius: float = SPHERE_R):
    """Great-circle distance on a sphere (meters).

    Fast pre-filter for DWithin / kNN candidate generation; also the
    SQL-expressible distance the DuckDB oracles use (documented where used).
    """
    phi1 = np.radians(np.asarray(lat1, dtype=np.float64))
    phi2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dphi = phi2 - phi1
    dlam = np.radians(np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64))
    h = np.sin(dphi / 2.0) ** 2 + np.cos(phi1) * np.cos(phi2) * np.sin(dlam / 2.0) ** 2
    return 2.0 * radius * np.arcsin(np.minimum(1.0, np.sqrt(h)))
