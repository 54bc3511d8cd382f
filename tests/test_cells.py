"""Tile-cell index: encode/decode, hierarchy, neighbourhoods, SQL parity."""

import duckdb
import numpy as np
import pytest

from georay import cells


class TestEncodeDecode:
    def test_roundtrip_bbox_contains_point(self):
        lats = np.array([49.0, -33.9, 0.0, 84.9, -84.9])
        lons = np.array([-123.0, 151.2, 0.0, 179.9, -179.9])
        c = cells.latlng_to_cell(lats, lons, 12)
        minlon, minlat, maxlon, maxlat = cells.cell_to_bbox(c)
        assert ((lons >= minlon) & (lons < maxlon)).all()
        assert ((lats >= minlat) & (lats < maxlat)).all()

    def test_res_extraction(self):
        c = cells.latlng_to_cell(np.array([10.0]), np.array([20.0]), 9)
        assert cells.cell_res(c)[0] == 9

    def test_edge_clamping(self):
        c = cells.latlng_to_cell(np.array([90.0]), np.array([180.0]), 5)
        assert cells.cell_ix(c)[0] == 31 and cells.cell_iy(c)[0] == 31

    def test_res_out_of_range(self):
        with pytest.raises(ValueError):
            cells.latlng_to_cell(np.array([0.0]), np.array([0.0]), 30)

    def test_cell_to_polygon_closed_ring(self):
        c = cells.latlng_to_cell(np.array([49.0]), np.array([-123.0]), 7)
        ring = cells.cell_to_polygon(int(c[0]))
        assert ring.shape == (5, 2)
        assert np.array_equal(ring[0], ring[-1])


class TestHierarchy:
    def test_parent_contains_child(self):
        c = cells.latlng_to_cell(np.array([49.33]), np.array([-123.26]), 12)
        p = cells.cell_parent(c, 7)
        assert cells.cell_res(p)[0] == 7
        direct = cells.latlng_to_cell(np.array([49.33]), np.array([-123.26]), 7)
        assert p[0] == direct[0]

    def test_parent_res_too_fine_raises(self):
        c = cells.latlng_to_cell(np.array([0.0]), np.array([0.0]), 5)
        with pytest.raises(ValueError):
            cells.cell_parent(c, 9)


class TestNeighbourhoods:
    def test_disk_interior_cell(self):
        c = int(cells.latlng_to_cell(np.array([0.0]), np.array([0.0]), 6)[0])
        assert len(cells.grid_disk(c, 1)) == 9
        assert len(cells.grid_disk(c, 2)) == 25

    def test_disk_wraps_antimeridian(self):
        c = int(cells.latlng_to_cell(np.array([0.0]), np.array([-179.99]), 6)[0])
        disk = cells.grid_disk(c, 1)
        assert len(disk) == 9
        ix = cells.cell_ix(disk)
        assert 0 in ix and (63 in ix)  # wrapped to the far edge

    def test_disk_clamps_at_pole(self):
        c = int(cells.latlng_to_cell(np.array([89.9]), np.array([0.0]), 6)[0])
        disk = cells.grid_disk(c, 1)
        assert len(disk) == 6  # top row clipped

    def test_ring_is_disk_difference(self):
        c = int(cells.latlng_to_cell(np.array([10.0]), np.array([10.0]), 6)[0])
        ring = cells.grid_ring(c, 2)
        assert len(ring) == 25 - 9
        assert c not in ring


class TestSqlParity:
    def test_formula_matches_duckdb(self):
        # the documented SQL mirror must agree bit-for-bit with numpy
        rng = np.random.default_rng(42)
        lons = np.round(rng.uniform(-180, 179.99, 500) * 100) / 100
        lats = np.round(rng.uniform(-85, 84.99, 500) * 100) / 100
        res = 7
        ours = cells.latlng_to_cell(lats, lons, res)
        con = duckdb.connect()
        con.execute("CREATE TABLE pts AS SELECT * FROM (VALUES " + ",".join(
            f"({lo!r},{la!r})" for lo, la in zip(lons, lats)) + ") t(lon, lat)")
        theirs = con.execute(
            f"SELECT {res}*288230376151711744 "
            f"+ CAST(floor((lat+90.0)/180.0*{1 << res}) AS BIGINT)*536870912 "
            f"+ CAST(floor((lon+180.0)/360.0*{1 << res}) AS BIGINT) FROM pts"
        ).fetchnumpy()
        np.testing.assert_array_equal(ours, list(theirs.values())[0])
