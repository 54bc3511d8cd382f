"""Source readers: one entry point over the formats Ray Data ships.

The reference's only sources are XML streams (SURVEY.md §2.7); the
engine's sources are Ray Data's file readers, wrapped so every pipeline
accepts parquet / csv / json(l) interchangeably with the same pruning
semantics (columns pushed to the parquet reader; post-read projection for
row-oriented formats that cannot prune at the read).
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
