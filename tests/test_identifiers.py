"""CRS identifier kernels vs GeodesyUtils fixtures (R-03/R-04/R-07/R-08)."""

import numpy as np
import pytest

from georay.crs.identifiers import (
    axis_order_latlon,
    convert_srs_name_to_urn,
    get_abbreviated_crs_identifier,
    get_crs_identifier,
    parse_epsg,
    parse_epsg_column,
)
from georay.crs.validity import get_domain_of_validity


class TestIdentifiers:
    def test_urn_for_epsg4326(self):
        # VerifyGeodesyUtils.getCRSIdentifier_epsg4326
        assert get_crs_identifier(4326) == "urn:ogc:def:crs:EPSG::4326"

    def test_crs84_special_case(self):
        assert get_crs_identifier(4326, crs84=True) == "urn:ogc:def:crs:OGC:1.3:CRS84"

    def test_convert_http_to_urn(self):
        # VerifyGeodesyUtils.convertEPSGSrsNameToURN
        assert (
            convert_srs_name_to_urn("http://www.opengis.net/def/crs/EPSG/0/4326")
            == "urn:ogc:def:crs:EPSG::4326"
        )

    def test_convert_keeps_real_version(self):
        assert (
            convert_srs_name_to_urn("http://www.opengis.net/def/crs/EPSG/9.9/4326")
            == "urn:ogc:def:crs:EPSG:9.9:4326"
        )

    def test_urn_passthrough(self):
        urn = "urn:ogc:def:crs:EPSG::4326"
        assert convert_srs_name_to_urn(urn) == urn

    def test_abbreviated_from_http(self):
        assert get_abbreviated_crs_identifier("http://www.opengis.net/def/crs/EPSG/0/4326") == "EPSG:4326"

    def test_abbreviated_from_urn(self):
        assert get_abbreviated_crs_identifier("urn:ogc:def:crs:EPSG::32610") == "EPSG:32610"

    def test_other_scheme_rejected(self):
        with pytest.raises(ValueError):
            get_abbreviated_crs_identifier("epsg-4326")

    def test_parse_epsg_forms(self):
        assert parse_epsg("urn:ogc:def:crs:EPSG::4326") == 4326
        assert parse_epsg("http://www.opengis.net/def/crs/EPSG/0/32610") == 32610
        assert parse_epsg("EPSG:4258") == 4258
        assert parse_epsg("urn:ogc:def:crs:OGC:1.3:CRS84") == 4326

    def test_axis_order(self):
        # R-05 critical semantic: GML 4326 is lat-first; CRS84 / UTM are x/y
        assert axis_order_latlon(4326)
        assert axis_order_latlon("urn:ogc:def:crs:EPSG::4258")
        assert not axis_order_latlon(32610)
        assert not axis_order_latlon("urn:ogc:def:crs:OGC:1.3:CRS84")

    def test_parse_column_vectorized(self):
        arr = ["urn:ogc:def:crs:EPSG::4326", "EPSG:32610", "urn:ogc:def:crs:EPSG::4326"]
        np.testing.assert_array_equal(parse_epsg_column(arr), [4326, 32610, 4326])


class TestDomainOfValidity:
    def test_epsg4326(self):
        # VerifyGeodesyUtils.getExtentOfCRS_epsg4326: lower corner ordinate 0 == -90
        (min0, _min1, _max0, _max1), latlon_first = get_domain_of_validity("urn:ogc:def:crs:EPSG::4326")
        assert latlon_first
        assert min0 == pytest.approx(-90, abs=0.01)

    def test_invalid_uri_raises(self):
        with pytest.raises(ValueError):
            get_domain_of_validity("epsg-4326")

    def test_unknown_code_raises(self):
        with pytest.raises(KeyError):
            get_domain_of_validity("http://www.opengis.net/def/crs/EPSG/0/999999")

    def test_utm_zone_domain(self):
        (min0, min1, max0, max1), latlon_first = get_domain_of_validity("urn:ogc:def:crs:EPSG::32610")
        assert not latlon_first
        assert (min0, min1, max0, max1) == (-126.0, 0.0, -120.0, 84.0)
