"""html/text coordinate extraction: precedence chain, CRS resolution,
byte-identity invariant (G-04/G-05/G-06 analog)."""

import numpy as np
import pyarrow as pa
import pytest

from georay.extract import extract_geo_batch, extract_geo_columns


def page(html: str) -> pa.Array:
    return pa.array([html.encode()], pa.binary())


class TestPrecedenceChain:
    def test_geo_position_meta(self):
        lon, lat, epsg, has = extract_geo_columns(
            page('<html><head><meta name="geo.position" content="49.33;-123.26"></head></html>')
        )
        assert has[0] and lat[0] == 49.33 and lon[0] == -123.26 and epsg[0] == 4326

    def test_icbm_meta(self):
        lon, lat, _, has = extract_geo_columns(
            page('<html><head><meta name="ICBM" content="-33.86, 151.21"></head></html>')
        )
        assert has[0] and lat[0] == -33.86 and lon[0] == 151.21

    def test_microdata(self):
        lon, lat, _, has = extract_geo_columns(
            page('<div itemprop="latitude" content="48.85"></div><div itemprop="longitude" content="2.35"></div>')
        )
        assert has[0] and lat[0] == 48.85 and lon[0] == 2.35

    def test_text_pattern_lowest_precedence(self):
        lon, lat, _, has = extract_geo_columns(page("<body>geo: 35.68, 139.69</body>"))
        assert has[0] and lat[0] == 35.68 and lon[0] == 139.69

    def test_meta_beats_text(self):
        # explicit srsName chain: geo.position outranks body text (G-06)
        lon, lat, _, _ = extract_geo_columns(
            page('<meta name="geo.position" content="1.00;2.00"><body>geo: 9.99, 8.88</body>')
        )
        assert lat[0] == 1.0 and lon[0] == 2.0

    def test_no_geo(self):
        lon, lat, _, has = extract_geo_columns(page("<html><body>nothing here</body></html>"))
        assert not has[0] and np.isnan(lat[0]) and np.isnan(lon[0])


class TestCrsResolution:
    def test_srs_meta_override(self):
        _, _, epsg, _ = extract_geo_columns(
            page(
                '<meta name="geo.position" content="5464220;480775">'
                '<meta name="geo.srsName" content="urn:ogc:def:crs:EPSG::32610">'
            )
        )
        assert epsg[0] == 32610

    def test_unknown_srs_falls_back(self):
        _, _, epsg, _ = extract_geo_columns(
            page('<meta name="geo.position" content="1;2"><meta name="geo.srsName" content="bogus">')
        )
        assert epsg[0] == 4326


class TestBatchKernel:
    def test_drops_html_keeps_text_bytes(self):
        text = "exact text é中"
        batch = pa.table(
            {
                "url": ["u"],
                "html": [f'<meta name="geo.position" content="1.5;2.5"><body>{text}</body>'.encode()],
                "text": [text],
                "doc_id": [1],
            }
        )
        out = extract_geo_batch(batch)
        assert "html" not in out.column_names
        assert out.column("text").to_pylist() == [text]  # byte-identical invariant
        assert out.column("lat").to_pylist() == [1.5]
        assert out.column("lon").to_pylist() == [2.5]
        assert out.column("has_geo").to_pylist() == [True]


class TestReprojectStage:
    def test_mixed_epsg_batch(self):
        from georay.stages.geo import Reproject

        batch = pa.table(
            {
                "lon": [480775.0, -123.2015],
                "lat": [5464220.0, 49.2756],
                "epsg": pa.array([32610, 4326], pa.int32()),
            }
        )
        out = Reproject(4326)(batch)
        lon = out.column("lon").to_pylist()
        lat = out.column("lat").to_pylist()
        assert lon[0] == pytest.approx(-123.2646, abs=1e-4)
        assert lat[0] == pytest.approx(49.3304, abs=1e-4)
        assert lon[1] == -123.2015 and lat[1] == 49.2756  # untouched
        assert out.column("epsg").to_pylist() == [4326, 4326]


class TestInvalidUtf8:
    """Real crawls contain invalid UTF-8 constantly — the decode must stay
    vectorized for the valid bulk and replacement-decode only the rows
    near actual bad bytes (bisection), never the whole column in Python."""

    def test_mixed_valid_invalid_bytes(self):
        from georay.extract import _to_utf8_strings

        good = '<meta name="geo.position" content="49.28;-123.12">'.encode()
        rows = [good] * 50 + [b"corrupt \xff\xfe page"] + [good] * 50 + [None, b"\x80bad"]
        out = _to_utf8_strings(pa.array(rows, pa.binary()))
        assert out.type == pa.string()
        vals = out.to_pylist()
        assert vals[0] == good.decode()
        assert "�" in vals[50]  # replacement char, row preserved
        assert vals[-2] is None
        assert "�" in vals[-1]

    def test_extraction_survives_corruption(self):
        """A corrupt row must not poison extraction of its neighbours."""
        good = '<meta name="geo.position" content="49.28;-123.12">'.encode()
        arr = pa.chunked_array([pa.array([good, b"\xffjunk", good], pa.binary())])
        lon, lat, epsg, has_geo = extract_geo_columns(arr)
        assert has_geo.tolist() == [True, False, True]
        assert lat[0] == pytest.approx(49.28)

    def test_all_valid_fast_path_zero_python(self):
        from georay.extract import _to_utf8_strings

        arr = pa.array([b"plain ascii", "unicodé".encode()], pa.binary())
        out = _to_utf8_strings(arr)
        assert out.to_pylist() == ["plain ascii", "unicodé"]

    def test_bisect_finds_many_scattered_bad_rows(self):
        from georay.extract import _to_utf8_strings

        rows = []
        for i in range(300):
            rows.append(b"\xfe bad %d" % i if i % 37 == 0 else b"ok %d" % i)
        out = _to_utf8_strings(pa.array(rows, pa.binary())).to_pylist()
        for i, v in enumerate(out):
            assert ("�" in v) == (i % 37 == 0)
