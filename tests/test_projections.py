"""UTM / Web-Mercator transforms vs the reference's cross-CRS fixtures."""

import numpy as np
import pytest

from georay.crs.projections import Transformer, crs_kind, transformer


class TestUTM:
    # Point-Atkinson / Point-Jericho 4326 <-> 32610 fixture pairs (values
    # rounded to 1 m in the fixtures)
    def test_atkinson_forward(self):
        x, y = transformer(4326, 32610).transform(-123.2646, 49.3304)
        assert x == pytest.approx(480775, abs=2.0)
        assert y == pytest.approx(5464220, abs=2.0)

    def test_jericho_forward(self):
        x, y = transformer(4326, 32610).transform(-123.2015, 49.2756)
        assert x == pytest.approx(485341, abs=3.0)
        assert y == pytest.approx(5458113, abs=2.0)

    def test_inverse_roundtrip_tolerance(self):
        # GeoAPI-style round-trip: 1e-4 deg ~ 10 m (VerifyGeodesyUtils.java:85)
        lon, lat = transformer(32610, 4326).transform(480775.0, 5464220.0)
        assert lon == pytest.approx(-123.2646, abs=1e-4)
        assert lat == pytest.approx(49.3304, abs=1e-4)

    def test_utm32n_point(self):
        # Point-UTM32N.xml (358626, 5793259 in EPSG:32632) lies in the
        # EPSG:4258 polygon near (52.27, 6.93)
        lon, lat = transformer(32632, 4258).transform(358626.0, 5793259.0)
        assert lon == pytest.approx(6.928, abs=0.01)
        assert lat == pytest.approx(52.2715, abs=0.01)

    def test_south_hemisphere_false_northing(self):
        x, y = transformer(4326, 32760).transform(174.0, -41.0)
        assert 0 < y < 10_000_000
        lon, lat = transformer(32760, 4326).transform(x, y)
        assert lon == pytest.approx(174.0, abs=1e-9)
        assert lat == pytest.approx(-41.0, abs=1e-9)

    def test_vectorized(self):
        lons = np.linspace(-125.9, -120.1, 50)
        lats = np.linspace(0.5, 83.5, 50)
        x, y = transformer(4326, 32610).transform(lons, lats)
        lon2, lat2 = transformer(32610, 4326).transform(x, y)
        np.testing.assert_allclose(lon2, lons, atol=1e-9)
        np.testing.assert_allclose(lat2, lats, atol=1e-9)


class TestWebMercator:
    def test_roundtrip(self):
        x, y = transformer(4326, 3857).transform(-123.2646, 49.3304)
        lon, lat = transformer(3857, 4326).transform(x, y)
        assert lon == pytest.approx(-123.2646, abs=1e-9)
        assert lat == pytest.approx(49.3304, abs=1e-9)

    def test_known_value(self):
        x, _ = transformer(4326, 3857).transform(180.0, 0.0)
        assert x == pytest.approx(20037508.342789244, rel=1e-12)


class TestRegistry:
    def test_identity_same_crs(self):
        x, y = transformer(4326, 4326).transform(1.0, 2.0)
        assert (x, y) == (1.0, 2.0)

    def test_unknown_epsg_raises(self):
        with pytest.raises(ValueError):
            Transformer(999999, 4326)

    def test_kinds(self):
        assert crs_kind(4326)[0] == "geographic"
        assert crs_kind(32610) == ("utm", -123.0, True)
        assert crs_kind(3857)[0] == "webmerc"

    def test_cache_identity(self):
        assert transformer(4326, 32610) is transformer(4326, 32610)
