"""Envelope algebra fixtures (VerifyExtents.java)."""

import numpy as np
import pytest

from georay.geom.envelope import (
    Envelope,
    antipodal_envelope,
    coalesce_bounding_boxes,
    envelope_as_gml,
    envelope_merge,
    envelope_partial,
    envelope_to_string,
    get_antipode,
)


class TestKVP:
    def test_wgs84_default_geographic_no_crs(self):
        # VerifyExtents.writeWGS84BoundingBoxToString
        env = Envelope(-116.0, 32.6, -115.0, 34.0, 4326, crs84=True)
        assert envelope_to_string(env) == "-116.0,32.6,-115.0,34.0"

    def test_epsg4326_with_urn(self):
        # VerifyExtents.writeEPSG4326BoundingBoxToString (lat-first order)
        env = Envelope(32.0, -117.6, 33.5, -116.2, 4326)
        assert envelope_to_string(env) == "32.0,-117.6,33.5,-116.2,urn:ogc:def:crs:EPSG::4326"


class TestGML:
    def test_round_down_two_decimals(self):
        # Extents.java:202-205: '#.##' RoundingMode.DOWN, root locale;
        # VerifyExtents.java:60 expects -122.88 from -122.88xx
        env = Envelope(49.1234, -123.4567, 50.5599, -122.8801, 4326)
        xml = envelope_as_gml(env)
        assert 'srsName="urn:ogc:def:crs:EPSG::4326"' in xml
        assert "<gml:lowerCorner>49.12 -123.45</gml:lowerCorner>" in xml
        assert "<gml:upperCorner>50.55 -122.88</gml:upperCorner>" in xml

    def test_integers_render_bare(self):
        env = Envelope(480775.0, 5464219.0, 532639.0, 9329005.0, 32610)
        xml = envelope_as_gml(env)
        assert "<gml:upperCorner>532639 9329005</gml:upperCorner>" in xml


class TestAntipodes:
    def test_vancouver(self):
        np.testing.assert_allclose(get_antipode([49.19, -123.18]), [-49.19, -123.18 + 180], atol=0.01)

    def test_vienna(self):
        np.testing.assert_allclose(get_antipode([48.11, 16.57]), [-48.11, 16.57 - 180], atol=0.01)

    def test_perth(self):
        np.testing.assert_allclose(get_antipode([-31.94, 115.97]), [31.94, 115.97 - 180], atol=0.01)

    def test_antipodal_envelope_4326(self):
        # VerifyExtents.antipodalEnvelopeFrom4326: bbox (32.0,-117.6, 33.5,-116.2)
        # -> lower corner (-33.5, 62.4)
        env = Envelope(32.0, -117.6, 33.5, -116.2, 4326)
        ap = antipodal_envelope(env)
        assert ap.lower_corner() == pytest.approx((-33.5, -117.6 + 180), abs=0.01)

    def test_antipodal_envelope_utm(self):
        # VerifyExtents.antipodalEnvelopeFrom32610 (Envelope-UTM.xml
        # 514432,5429689 .. 529130,5451619): expected lower corner
        # (-49.22, 57.20) within 0.01
        env = Envelope(514432.0, 5429689.0, 529130.0, 5451619.0, 32610)
        ap = antipodal_envelope(env)
        assert ap.lower_corner() == pytest.approx((-49.22, 57.20), abs=0.01)


class TestCoalesceAndAggregate:
    def test_coalesce_same_crs(self):
        a = Envelope(0.0, 0.0, 10.0, 10.0, 4326)
        b = Envelope(5.0, -5.0, 15.0, 8.0, 4326)
        out = coalesce_bounding_boxes([a, b])
        assert (out.min0, out.min1, out.max0, out.max1) == (0.0, -5.0, 15.0, 10.0)
        assert out.epsg == 4326

    def test_coalesce_first_crs_wins(self):
        # Extents.java:266-269: subsequent boxes transformed into first CRS
        first = Envelope(480000.0, 5450000.0, 490000.0, 5460000.0, 32610)
        second = Envelope(49.33, -123.27, 49.34, -123.26, 4326)  # lat-first
        out = coalesce_bounding_boxes([first, second])
        assert out.epsg == 32610
        assert out.min0 < 480775  # Atkinson easting pulled the box west

    def test_envelope_partial_merge(self):
        p1 = envelope_partial([1.0, 2.0], [3.0, 4.0])
        p2 = envelope_partial([0.5, np.nan], [10.0, np.nan])
        assert envelope_merge(p1, p2) == (0.5, 3.0, 2.0, 10.0)
        assert envelope_merge(None, p1) == p1

    def test_intersects_cross_crs(self):
        # SpatialAssert.assertIntersects semantics: transform then bbox test
        a = Envelope(49.2, -123.3, 49.4, -123.1, 4326)  # around Atkinson, lat-first
        b = Envelope(480000.0, 5460000.0, 482000.0, 5466000.0, 32610)
        assert a.intersects(b)
        far = Envelope(0.0, 0.0, 1.0, 1.0, 4326)
        assert not a.intersects(far)


class TestAntipodalWraparound:
    def test_zero_spanning_lon_range_wraps(self):
        # lon [-10, 10] -> antipodal lons 170 / -170: the reference keeps
        # the wraparound range (min1 > max1), NOT the 340-degree complement
        env = Envelope(40.0, -10.0, 50.0, 10.0, 4326)
        ap = antipodal_envelope(env)
        assert ap.min0 == -50.0 and ap.max0 == -40.0  # latitudes swapped
        assert ap.min1 == 170.0 and ap.max1 == -170.0  # wraparound preserved
