"""CRS / referencing kernels (GeodesyUtils.java semantics, numpy-vectorized)."""

from georay.crs.geodesy import (  # noqa: F401
    WGS84_A,
    WGS84_F,
    geodesic_destination,
    geodesic_inverse,
    haversine_m,
    orthodromic_distance,
)
from georay.crs.identifiers import (  # noqa: F401
    EPSG_4326_URN,
    convert_srs_name_to_urn,
    get_abbreviated_crs_identifier,
    get_crs_identifier,
    parse_epsg,
    axis_order_latlon,
)
from georay.crs.projections import Transformer, transformer  # noqa: F401
from georay.crs.validity import get_domain_of_validity  # noqa: F401
