"""Declared Arrow schemas for the engine's tables (SURVEY.md §1.3).

The reference is schemaless/object-oriented; the engine fixes columnar
schemas so every stage is a zero-copy Arrow transform.
"""

from __future__ import annotations

import pyarrow as pa

#: Common-Crawl-style web-page table (BASELINE.json input_hint)
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("doc_id", pa.int64()),  # provenance key back into the documents table
    ]
)

#: post-extraction geometry columns (html dropped immediately — SURVEY.md §4)
GEO = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("doc_id", pa.int64()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("epsg", pa.int32()),
        ("has_geo", pa.bool_()),
    ]
)

#: broadcast polygon side (WKB-free: ring coords as list<list<double>>)
POLYGONS = pa.schema(
    [
        ("polygon_id", pa.string()),
        ("epsg", pa.int32()),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
        ("exterior", pa.list_(pa.list_(pa.float64()))),
        ("holes", pa.list_(pa.list_(pa.list_(pa.float64())))),
    ]
)

#: spatial-join output rows
JOIN_OUT = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("polygon_id", pa.string()),
        ("predicate", pa.string()),
    ]
)

#: per-document tile assignment
TILES = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("cell", pa.int64()),
    ]
)

#: per-partition lineage + metrics record (north_rule resumability)
LINEAGE = pa.schema(
    [
        ("partition", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_sec", pa.float64()),
        ("engine_version", pa.string()),
    ]
)
