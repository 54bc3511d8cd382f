"""Conformance vectors from VerifyGeodesyUtils.java / VerifyTopologicalRelationships.java."""

import numpy as np
import pytest

from georay.crs.geodesy import (
    geodesic_destination,
    geodesic_inverse,
    haversine_m,
    normalize_azimuth,
    orthodromic_distance,
)

YVR = (49.194722, -123.183889)
ATKINSON = (49.3304, -123.2646)  # Point-Atkinson-4326.xml
JERICHO = (49.2756, -123.2015)  # Point-Jericho-4326.xml


class TestDestination:
    # VerifyGeodesyUtils.java:79-109 — 1 NM from YVR, ~10 m tolerance
    def test_north_from_yvr(self):
        lat, lon = geodesic_destination(*YVR, 0.0, 1852.0)
        assert lat == pytest.approx(49.194722 + 0.016667, abs=1e-4)
        assert lon == pytest.approx(-123.183889, abs=1.5e-4)

    def test_east_from_yvr(self):
        lat, lon = geodesic_destination(*YVR, 90.0, 1852.0)
        assert lat == pytest.approx(49.194722, abs=1e-4)
        assert lon == pytest.approx(-123.183889 + 0.025310, abs=1.5e-4)

    def test_west_from_yvr(self):
        lat, lon = geodesic_destination(*YVR, 270.0, 1852.0)
        assert lat == pytest.approx(49.194722, abs=1e-4)
        assert lon == pytest.approx(-123.183889 - 0.025310, abs=1.5e-4)

    def test_azimuth_normalized_like_reference(self):
        # GeodesyUtils.java:115-119: 360 -> 0, -270 -> 90
        assert normalize_azimuth(360.0) == 0.0
        assert normalize_azimuth(-270.0) == 90.0
        lat360, lon360 = geodesic_destination(*YVR, 360.0, 1852.0)
        lat0, lon0 = geodesic_destination(*YVR, 0.0, 1852.0)
        assert lat360 == pytest.approx(lat0, abs=1e-12)
        assert lon360 == pytest.approx(lon0, abs=1e-12)

    def test_roundtrip_inverse(self):
        lat, lon = geodesic_destination(*YVR, 37.0, 5000.0)
        d, az, _ = geodesic_inverse(YVR[0], YVR[1], lat, lon)
        assert d == pytest.approx(5000.0, abs=0.01)
        assert az == pytest.approx(37.0, abs=1e-6)


class TestOrthodromicDistance:
    def test_atkinson_jericho_between_3nmi_and_8km(self):
        # VerifyTopologicalRelationships.java:119-152: DWithin 8 km true,
        # DWithin 3 nmi (5556 m) false
        d = orthodromic_distance(*ATKINSON, *JERICHO)
        assert 5556.0 < d < 8000.0

    def test_vectorized_broadcast(self):
        d = orthodromic_distance(
            np.array([ATKINSON[0], YVR[0]]), np.array([ATKINSON[1], YVR[1]]), JERICHO[0], JERICHO[1]
        )
        assert d.shape == (2,)
        assert d[0] < d[1]

    def test_coincident_zero(self):
        assert orthodromic_distance(*YVR, *YVR) == 0.0

    def test_haversine_close_to_vincenty_mid_latitude(self):
        dv = orthodromic_distance(*ATKINSON, *JERICHO)
        dh = haversine_m(*ATKINSON, *JERICHO)
        assert abs(dv - dh) / dv < 0.006  # sphere vs ellipsoid < 0.6%

    def test_antipodal_fallback_finite(self):
        d = orthodromic_distance(0.0, 0.0, 0.5, 179.7)
        assert np.isfinite(d) and d > 1.9e7
