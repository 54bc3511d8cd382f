"""Source-format plurality and invalid-UTF-8 robustness."""

import pyarrow as pa
import pyarrow.csv
import pyarrow.parquet as pq
import pytest

from georay.extract import extract_geo_batch, extract_geo_columns
from georay.sources import read_table


class TestInvalidUtf8:
    def test_invalid_bytes_dont_poison_batch(self):
        rows = [
            b'<meta name="geo.position" content="49.33;-123.26">',
            b"\xff\xfe broken \x80 bytes",  # invalid UTF-8
            b'<body>geo: 35.68, 139.69 \xc3(</body>',  # invalid continuation mid-doc
        ]
        lon, lat, epsg, has = extract_geo_columns(pa.array(rows, pa.binary()))
        assert has[0] and lat[0] == 49.33
        assert not has[1]
        assert has[2] and lat[2] == 35.68  # coords still found around bad bytes

    def test_batch_kernel_with_invalid_bytes(self):
        batch = pa.table(
            {
                "url": ["a", "b"],
                "html": pa.array([b"\xff\xfe", b'<meta name="ICBM" content="1.5, 2.5">'], pa.binary()),
                "text": ["t1", "t2"],
                "doc_id": pa.array([1, 2], pa.int64()),
            }
        )
        out = extract_geo_batch(batch)
        assert out.column("has_geo").to_pylist() == [False, True]


class TestSourceFormats:
    @pytest.fixture()
    def doc_files(self, tmp_path):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a b", "c d", "e f"], pa.string()),
                "lang": pa.array(["en", "de", "fr"], pa.string()),
            }
        )
        paths = {}
        pq.write_table(t, tmp_path / "docs.parquet")
        paths["parquet"] = str(tmp_path / "docs.parquet")
        pa.csv.write_csv(t, tmp_path / "docs.csv")
        paths["csv"] = str(tmp_path / "docs.csv")
        with open(tmp_path / "docs.json", "w") as f:
            for row in t.to_pylist():
                import json

                f.write(json.dumps(row) + "\n")
        paths["json"] = str(tmp_path / "docs.json")
        return paths

    @pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
    def test_same_rows_from_every_format(self, ray_session, doc_files, fmt):
        ds = read_table(doc_files[fmt], columns=["doc_id", "text"])
        df = ds.to_pandas().sort_values("doc_id", ignore_index=True)
        assert list(df.columns) == ["doc_id", "text"]
        assert df["doc_id"].tolist() == [1, 2, 3]
        assert df["text"].tolist() == ["a b", "c d", "e f"]

    def test_format_inferred_from_extension(self, ray_session, doc_files):
        ds = read_table(doc_files["csv"])
        assert ds.count() == 3

    def test_unknown_format_raises(self):
        with pytest.raises(ValueError):
            read_table("/tmp/x.xyz", fmt="xyz")


class TestReadGml:
    def test_reference_corpus_inventory(self, ray_session):
        """Distributed GML source over the reference's own fixture corpus
        (SURVEY §2.7: XML documents are the reference's only source
        format): geometry files parse through the full G-04/EP-1 chain
        inside map_batches; non-geometry docs are inventoried as error
        rows instead of killing the job."""
        from georay.sources import read_gml

        out = read_gml("/root/reference/src/test/resources/gml").to_pandas()
        ok = out[out.error.isna()]
        assert len(ok) >= 30  # the geometry fixtures
        assert {"Point", "Curve", "Surface", "Polygon", "LineString"} <= set(ok.kind)
        # every parsed geometry has a sane 4326 envelope and coords
        assert (ok.n_coords >= 1).all()
        assert ok.minx.le(ok.maxx).all() and ok.miny.le(ok.maxy).all()
        assert ok.minx.ge(-180).all() and ok.maxx.le(180).all()
        # the known non-geometry docs (temporal, AIXM edge cases) are
        # flagged, not silently dropped: every file on disk gets a row
        import glob
        n_files = len(glob.glob("/root/reference/src/test/resources/gml/**/*.xml",
                                recursive=True))
        assert out.error.notna().sum() >= 1
        assert len(out) == n_files

    def test_strict_raises_on_mixed_corpus(self, ray_session):
        import pytest

        from georay.sources import read_gml

        # the temporal docs are valid XML but not geometries: strict mode
        # must re-raise the PARSE failure (not pass on any infra error)
        with pytest.raises(Exception, match="[Uu]nsupported|[Uu]nknown|geometry|kind"):
            read_gml(
                "/root/reference/src/test/resources/gml/temporal", strict=True
            ).to_pandas()
