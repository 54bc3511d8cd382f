"""georay — a Ray-Data-native spatial-join + tiling engine.

Re-implements the referencing / geometry / temporal semantics of
``opengeospatial/geomatics-geotk`` (see ``/root/reference``, SURVEY.md) as
vectorized numpy kernels driven by ``ray.data.Dataset`` pipelines:

- ``georay.crs``       — CRS identifiers, reprojection, geodesy (GeodesyUtils.java)
- ``georay.cells``     — hierarchical uint64 tile cells (H3/S2-style index)
- ``georay.geom``      — envelopes, rings, polygons, predicates
                          (Extents.java, TopologicalRelationships.java, gml/)
- ``georay.temporal``  — ISO-19108 / Allen interval relations (time/)
- ``georay.extract``   — html/text -> point-geometry extraction (GmlUtils.java analog)
- ``georay.stages``    — map_batches callables (stateless fns + actor classes)
- ``georay.pipelines`` — end-to-end Dataset pipelines
- ``georay.dedup`` / ``georay.text`` / ``georay.ann`` — training-data ops

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

# Convenience top-level API (lazy: keep `import georay` light for workers).


def __getattr__(name):
    _EXPORTS = {
        "read_pages": ("georay.pipelines.pages", "read_pages"),
        "read_table": ("georay.sources", "read_table"),
        "geo_dataset": ("georay.pipelines.flagship", "geo_dataset"),
        "flagship": ("georay.pipelines.flagship", "flagship"),
        "parse_gml_file": ("georay.gmlio", "parse_gml_file"),
        "is_spatially_related": ("georay.gmlio", "is_spatially_related"),
        "latlng_to_cell": ("georay.cells", "latlng_to_cell"),
        "grid_disk": ("georay.cells", "grid_disk"),
        "transformer": ("georay.crs.projections", "transformer"),
        "orthodromic_distance": ("georay.crs.geodesy", "orthodromic_distance"),
        "geodesic_destination": ("georay.crs.geodesy", "geodesic_destination"),
    }
    if name in _EXPORTS:
        import importlib

        mod, attr = _EXPORTS[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'georay' has no attribute {name!r}")
