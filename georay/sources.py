"""Source readers: one entry point over the formats Ray Data ships,
plus a distributed GML corpus reader.

The reference's only sources are XML streams (SURVEY.md §2.7:
classpath streams, absolute-URI fetch); the engine's sources are Ray
Data's file readers, wrapped so every pipeline accepts parquet / csv /
json(l) interchangeably with the same pruning semantics (columns pushed
to the parquet reader; post-read projection for row-oriented formats
that cannot prune at the read).  :func:`read_gml` maps the reference's
XML-document source to a Dataset: every file parsed inside
``map_batches`` (the XML never leaves the worker — only the slim
geometry summary rows do).
"""

from __future__ import annotations

import os


def read_table(path: str, fmt: str | None = None, columns=None, override_num_blocks=None):
    """Read a table from parquet / csv / json(l) into a Dataset.

    ``fmt`` inferred from the extension when omitted.  Column pruning is
    a true read-time pushdown only for parquet; csv/json project after
    parse (documented cost — columnar input is the scale format).
    """
    import ray.data

    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lstrip(".").lower()
        fmt = ext or "parquet"
    fmt = fmt.lower()
    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    if fmt == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif fmt in ("json", "jsonl", "ndjson"):
        ds = ray.data.read_json(path, **kwargs)
    else:
        raise ValueError(f"Unsupported source format: {fmt}")
    if columns:
        ds = ds.map_batches(lambda b: b.select(list(columns)), batch_format="pyarrow")
    return ds


def _geom_bbox(prepared):
    """4326 bbox + coordinate count of a prepare_geometry result."""
    import numpy as np

    kind, obj = prepared
    if kind == "point":
        x, y = float(obj[0]), float(obj[1])
        return 1, x, y, x, y
    if kind == "line":
        c = obj.coords
        return len(c), float(c[:, 0].min()), float(c[:, 1].min()), float(c[:, 0].max()), float(c[:, 1].max())
    if kind == "polygon":
        c = obj.exterior
        n = len(c) + sum(len(h) for h in obj.holes)
        return n, float(c[:, 0].min()), float(c[:, 1].min()), float(c[:, 0].max()), float(c[:, 1].max())
    # multi: union of members
    if not obj:
        raise ValueError("multi geometry with zero members (no extent)")
    parts = [_geom_bbox(p) for p in obj]
    ns, x0s, y0s, x1s, y1s = zip(*parts)
    return int(np.sum(ns)), min(x0s), min(y0s), max(x1s), max(y1s)


def read_gml(path: str, target_epsg: int = 4326, strict: bool = False,
             override_num_blocks=None):
    """Distributed reader over a GML document corpus (the reference's
    source format, SURVEY.md §2.7): one summary row per file —
    ``(path, kind, epsg, n_coords, minx, miny, maxx, maxy, error)`` —
    with parsing, densification, axis normalization and reprojection to
    ``target_epsg`` all running INSIDE ``map_batches`` (G-04/EP-1 chain:
    unmarshal -> toJTSGeometry -> setCRS).  Files that are not GML
    geometries (envelopes, CSW responses, temporal docs) emit an
    ``error`` row when ``strict=False`` (honest inventory of a mixed
    corpus) and raise when ``strict=True``."""
    import ray.data

    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    files = ray.data.read_binary_files(path, include_paths=True, **kwargs)

    def parse(batch):
        import xml.etree.ElementTree as ET

        import pyarrow as pa

        from georay.gmlio import parse_geometry, prepare_geometry

        paths, kinds, epsgs, ncs = [], [], [], []
        bbs = {k: [] for k in ("minx", "miny", "maxx", "maxy")}
        errs = []
        for p, raw in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            paths.append(p)
            try:
                desc = parse_geometry(ET.fromstring(raw))
                prepared = prepare_geometry(desc, target_epsg=target_epsg)
                n, x0, y0, x1, y1 = _geom_bbox(prepared)
                kinds.append(desc.get("kind", prepared[0]))
                epsgs.append(int(desc.get("epsg") or 0))
                ncs.append(int(n))
                for k, v in zip(("minx", "miny", "maxx", "maxy"), (x0, y0, x1, y1)):
                    bbs[k].append(float(v))
                errs.append(None)
            except Exception as ex:  # noqa: BLE001 — mixed-corpus inventory
                if strict:
                    raise
                kinds.append("error")
                epsgs.append(0)
                ncs.append(0)
                for k in bbs:
                    bbs[k].append(None)
                errs.append(f"{type(ex).__name__}: {ex}"[:200])
        return pa.table(
            {
                "path": pa.array(paths, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "epsg": pa.array(epsgs, pa.int32()),
                "n_coords": pa.array(ncs, pa.int64()),
                "minx": pa.array(bbs["minx"], pa.float64()),
                "miny": pa.array(bbs["miny"], pa.float64()),
                "maxx": pa.array(bbs["maxx"], pa.float64()),
                "maxy": pa.array(bbs["maxy"], pa.float64()),
                "error": pa.array(errs, pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
