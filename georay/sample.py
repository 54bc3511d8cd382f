"""Deterministic stratified sampling — the corpus-subsampling operator a
training-data pipeline runs before expensive stages (per-language /
per-source rate control).

Scale design: the sampling decision is a PURE FUNCTION of the row
(stratum rate + a deterministic hash of the id), so the operator is a
stateless ``map_batches`` filter — no shuffle, no RNG state, and
resumed / re-run partitions select identical rows (the resumability
requirement `georay.state.checkpoint` relies on).  Rates are integer
BASIS POINTS compared against ``hash(id) % 10000`` so the SQL oracle
reproduces the predicate exactly (no float thresholds).

Hash backends (same pattern as simhash/fingerprint): ``fast`` =
pandas' vectorized C hash kernel (production); ``md5`` = DuckDB's
``md5_number_lower`` mirror (oracle parity; hashes per unique id, the
documented oracle-surface cost).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from georay.dedup import md5_u64


def _id_hash(ids: np.ndarray, hash_impl: str) -> np.ndarray:
    if hash_impl == "md5":
        return md5_u64(ids.astype(str).astype(object))
    return pd.util.hash_array(ids).astype(np.uint64)


def stratified_sample_batch(
    batch: pa.Table,
    rates_bp: dict[str, int],
    default_bp: int = 0,
    key_col: str = "lang",
    id_col: str = "doc_id",
    hash_impl: str = "fast",
    keep_cols: tuple[str, ...] | None = None,
) -> pa.Table:
    """Keep a row iff ``hash(id) % 10000 < rates_bp.get(stratum,
    default_bp)`` — vectorized per-stratum Bernoulli selection with a
    deterministic, re-run-stable decision per document."""
    if batch.num_rows == 0:
        cols = keep_cols or batch.column_names
        return batch.select(list(cols))
    ids = batch.column(id_col).to_numpy()
    strata = batch.column(key_col).to_numpy(zero_copy_only=False)
    h = _id_hash(ids, hash_impl) % np.uint64(10_000)
    thresh = np.full(len(ids), default_bp, dtype=np.uint64)
    for stratum, bp in rates_bp.items():
        thresh[strata == stratum] = bp
    out = batch.filter(pa.array(h < thresh))
    if keep_cols is not None:
        out = out.select(list(keep_cols))
    return out


def stratified_sample(ds, rates_bp: dict[str, int], default_bp: int = 0,
                      key_col: str = "lang", id_col: str = "doc_id",
                      hash_impl: str = "fast",
                      keep_cols: tuple[str, ...] | None = None):
    """Dataset form: one stateless map_batches filter over the stream."""
    return ds.map_batches(
        lambda b: stratified_sample_batch(
            b, rates_bp, default_bp, key_col, id_col, hash_impl, keep_cols
        ),
        batch_format="pyarrow",
    )
