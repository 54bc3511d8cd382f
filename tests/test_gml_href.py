"""C-08: gml:Ring curveMember xlink:href dereference.

The reference resolves ring-member hrefs by unmarshalling the URI
(CurveCoordinateListFactory.java:198-204) — its ONLY I/O-performing
operator.  georay resolves LOCAL references only (same-document
fragments, sibling files) at polygon-load time and raises cleanly on
remote schemes: a per-geometry network fetch inside a 10^12-row
pipeline is a design error, not a feature.  Composite/orientable curve
members deliberately ignore hrefs, matching the reference's in-line
assumption (CurveCoordinateListFactory.java:143,163).
"""

import numpy as np
import pytest

from georay.gmlio import parse_geometry, parse_gml_file

GML_NS = "http://www.opengis.net/gml/3.2"
XLINK_NS = "http://www.w3.org/1999/xlink"

RING_DOC = f"""<gml:Polygon xmlns:gml="{GML_NS}" xmlns:xlink="{XLINK_NS}"
    srsName="urn:ogc:def:crs:EPSG::4326">
  <gml:exterior>
    <gml:Ring>
      <gml:curveMember xlink:href="#c1"/>
      <gml:curveMember>
        <gml:LineString>
          <gml:posList>1.0 1.0 1.0 0.0 0.0 0.0</gml:posList>
        </gml:LineString>
      </gml:curveMember>
    </gml:Ring>
  </gml:exterior>
  <gml:LineString gml:id="c1">
    <gml:posList>0.0 0.0 0.0 1.0 1.0 1.0</gml:posList>
  </gml:LineString>
</gml:Polygon>
"""

MEMBER_FILE = f"""<gml:LineString xmlns:gml="{GML_NS}" gml:id="seg2">
  <gml:posList>1.0 1.0 1.0 0.0 0.0 0.0</gml:posList>
</gml:LineString>
"""

FILE_REF_DOC = f"""<gml:Polygon xmlns:gml="{GML_NS}" xmlns:xlink="{XLINK_NS}"
    srsName="urn:ogc:def:crs:EPSG::4326">
  <gml:exterior>
    <gml:Ring>
      <gml:curveMember xlink:href="#c1"/>
      <gml:curveMember xlink:href="member_curve.xml#seg2"/>
    </gml:Ring>
  </gml:exterior>
  <gml:LineString gml:id="c1">
    <gml:posList>0.0 0.0 0.0 1.0 1.0 1.0</gml:posList>
  </gml:LineString>
</gml:Polygon>
"""

REMOTE_REF_DOC = f"""<gml:Polygon xmlns:gml="{GML_NS}" xmlns:xlink="{XLINK_NS}"
    srsName="urn:ogc:def:crs:EPSG::4326">
  <gml:exterior>
    <gml:Ring>
      <gml:curveMember xlink:href="https://example.com/curves.xml#c1"/>
    </gml:Ring>
  </gml:exterior>
</gml:Polygon>
"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


class TestRingHref:
    def test_fragment_member_resolved(self, tmp_path):
        desc = parse_gml_file(_write(tmp_path, "ring.xml", RING_DOC))
        ring = desc["exterior"]
        assert ring["kind"] == "Ring"
        assert len(ring["members"]) == 2
        href_member, inline_member = ring["members"]
        assert href_member["kind"] == "LineString"
        np.testing.assert_allclose(
            href_member["coords"], [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
        )
        # referenced curve has no srsName of its own -> inherits the
        # ring's (CurveCoordinateListFactory.java:211-213)
        assert href_member["epsg"] == 4326
        assert inline_member["epsg"] == 4326

    def test_sibling_file_member_resolved(self, tmp_path):
        _write(tmp_path, "member_curve.xml", MEMBER_FILE)
        desc = parse_gml_file(_write(tmp_path, "ring.xml", FILE_REF_DOC))
        members = desc["exterior"]["members"]
        assert len(members) == 2
        np.testing.assert_allclose(
            members[1]["coords"], [[1.0, 1.0], [1.0, 0.0], [0.0, 0.0]]
        )
        assert members[1]["epsg"] == 4326

    def test_remote_href_raises(self, tmp_path):
        with pytest.raises(ValueError, match="remote xlink:href"):
            parse_gml_file(_write(tmp_path, "ring.xml", REMOTE_REF_DOC))

    def test_missing_fragment_raises(self, tmp_path):
        doc = RING_DOC.replace('xlink:href="#c1"', 'xlink:href="#nope"')
        with pytest.raises(ValueError, match="no element with gml:id"):
            parse_gml_file(_write(tmp_path, "ring.xml", doc))

    def test_fragment_outside_document_context_raises(self):
        import xml.etree.ElementTree as ET

        # parse_geometry called directly (no parse_gml_file context):
        # fragment resolution must fail loudly, not return garbage
        root = ET.fromstring(RING_DOC)
        with pytest.raises(ValueError, match="document context"):
            parse_geometry(root)


class TestInjectedRemoteFetcher:
    def test_fetcher_resolves_remote_member(self, tmp_path):
        from georay.gmlio import set_href_fetcher

        calls = []

        def fetcher(url):
            calls.append(url)
            assert url == "https://example.com/curves.xml"  # no fragment
            return MEMBER_FILE.replace("seg2", "c1").encode()

        prev = set_href_fetcher(fetcher)
        try:
            desc = parse_gml_file(_write(tmp_path, "ring.xml", REMOTE_REF_DOC))
        finally:
            set_href_fetcher(prev)
        members = desc["exterior"]["members"]
        assert len(members) == 1
        np.testing.assert_allclose(
            members[0]["coords"], [[1.0, 1.0], [1.0, 0.0], [0.0, 0.0]]
        )
        assert members[0]["epsg"] == 4326  # inherits the ring's CRS
        assert calls == ["https://example.com/curves.xml"]

    def test_fetcher_missing_fragment_raises(self, tmp_path):
        from georay.gmlio import set_href_fetcher

        prev = set_href_fetcher(lambda url: MEMBER_FILE.encode())  # id=seg2, want c1
        try:
            with pytest.raises(ValueError, match="no element with gml:id"):
                parse_gml_file(_write(tmp_path, "ring.xml", REMOTE_REF_DOC))
        finally:
            set_href_fetcher(prev)

    def test_without_fetcher_still_raises(self, tmp_path):
        with pytest.raises(ValueError, match="set_href_fetcher"):
            parse_gml_file(_write(tmp_path, "ring.xml", REMOTE_REF_DOC))
