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
