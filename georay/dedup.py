"""Deduplication kernels: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (training-data pipeline extras).

Scale design (SURVEY.md §2.8):
- exact: hash text -> hash-partition groupby -> keep min id (no full-text
  shuffle; only 16-byte digests move).
- MinHash+LSH: per-batch signature computation is fully vectorized
  (token hash -> shingle hash -> P universal-hash permutations with
  ``np.minimum.reduceat`` over the flattened token stream); banding emits
  (band, band_hash) keys, the ONLY shuffle is the band-bucket groupby,
  and candidate pairs are verified per group.
- SimHash: 64-bit sign-aggregated token hashes; near-dup = hamming
  distance <= d via multi-index (4x16-bit block keys, exact check per
  bucket).
- embedding cosine: random-hyperplane LSH bucket -> within-bucket exact
  cosine; brute-force path for small sides.

All hashes are deterministic (fixed seeds) so runs are reproducible.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MERSENNE_P = np.uint64((1 << 61) - 1)


def segment_reduce(ufunc, values: np.ndarray, offsets: np.ndarray, empty_fill, axis0_shape=None):
    """Per-segment ``ufunc.reduceat`` that handles EMPTY segments correctly.

    Clamping trailing empty-segment starts to len-1 (the naive fix for
    reduceat's index bound) silently ends the PREVIOUS segment one element
    early — a document's reduction then depends on whether an empty doc
    follows it in the batch.  Reducing over only the non-empty starts is
    exact: zero-width segments between two non-empty ones contribute no
    elements, so consecutive non-empty starts still delimit the right
    ranges.  Empty segments get ``empty_fill``.
    """
    n = len(offsets) - 1
    starts = offsets[:-1]
    nonempty = starts < offsets[1:]
    if axis0_shape is None:
        out = np.full(n, empty_fill, dtype=values.dtype if hasattr(values, "dtype") else None)
    else:
        out = np.full((n,) + axis0_shape, empty_fill, dtype=values.dtype)
    if len(values) and nonempty.any():
        res = ufunc.reduceat(values, starts[nonempty].astype(np.int64), axis=0)
        out[nonempty] = res
    return out


def md5_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Exact-dedup partial: stable digest per text (the hash-partition key).
    Null text hashes to a sentinel distinct from the empty string, so
    null rows group together without crashing the stage."""
    hs = [
        hashlib.md5(b"\x00<NULL>" if t is None else t.encode()).hexdigest()
        for t in batch.column(text_col).to_pylist()
    ]
    return pa.table({"h": pa.array(hs, pa.string()), id_col: batch.column(id_col)})


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: pa.Array, k: int = 3):
    """Whitespace tokens -> rolling k-token shingle hashes (uint64),
    flattened across the batch with per-doc offsets."""
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(text)
    if len(flat) == 0:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    # splitting '' yields one empty token — drop empties and rebuild offsets
    tok_np = flat.to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = lens > 0
    if not keep.all():
        kept_cum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        offsets = kept_cum[offsets]
        tok_np = tok_np[keep]
        if len(tok_np) == 0:
            return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    th = pd.util.hash_array(tok_np).astype(np.uint64)
    # rolling combine within each doc; shingles crossing doc boundaries are
    # masked out by rebuilding offsets
    C1, C2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0x85EBCA77C2B2AE63)
    sh_offsets = np.zeros(n + 1, dtype=np.int64)
    parts = []
    for i in range(n):
        s, e = offsets[i], offsets[i + 1]
        m = e - s
        if m >= k:
            sh = th[s : e - k + 1] * C1
            for j in range(1, k):
                sh = sh + th[s + j : e - k + 1 + j] * (C2 if j % 2 else C1 ^ C2)
            parts.append(sh)
            sh_offsets[i + 1] = sh_offsets[i] + len(sh)
        elif m > 0:
            parts.append(th[s:e])
            sh_offsets[i + 1] = sh_offsets[i] + m
        else:
            sh_offsets[i + 1] = sh_offsets[i]
    return (np.concatenate(parts) if parts else np.empty(0, np.uint64)), sh_offsets


def minhash_signatures(text: pa.Array, num_perm: int = 128, k: int = 3) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures; empty docs get all-max."""
    sh, offsets = _shingle_hashes(text, k)
    n = len(offsets) - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    a, b = _perm_params(num_perm)
    for p in range(num_perm):
        vals = (a[p] * sh + b[p]) % MERSENNE_P
        sig[:, p] = segment_reduce(np.minimum, vals, offsets, np.iinfo(np.uint64).max)
    return sig


def lsh_band_keys(sig: np.ndarray, bands: int = 32) -> np.ndarray:
    """(n_docs, bands) int64 band-bucket keys: hash of each band's rows.
    Docs sharing any (band, key) are near-dup candidates."""
    n, num_perm = sig.shape
    r = num_perm // bands
    out = np.empty((n, bands), dtype=np.int64)
    C = np.uint64(0xC2B2AE3D27D4EB4F)
    for bidx in range(bands):
        block = sig[:, bidx * r : (bidx + 1) * r]
        h = np.uint64(bidx + 1)
        for j in range(r):
            h = (h ^ block[:, j]) * C
        out[:, bidx] = (h >> np.uint64(1)).astype(np.int64)  # keep non-negative
    return out


def minhash_band_batch(
    batch: pa.Table, num_perm: int = 128, bands: int = 32, k: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> pa.Table:
    """map_batches kernel: docs -> exploded (band, key, doc_id) rows.
    The downstream ``groupby(["band","key"])`` is the only shuffle, and it
    moves 16 bytes per (doc, band) instead of the documents themselves."""
    sig = minhash_signatures(batch.column(text_col).combine_chunks(), num_perm, k)
    keys = lsh_band_keys(sig, bands)
    n = len(batch)
    ids = batch.column(id_col).to_numpy()
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
            "key": pa.array(keys.ravel(), pa.int64()),
            id_col: pa.array(np.repeat(ids, bands)),
        }
    )


def _bucket_list_partial(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Per-batch combine: (band, key) -> list of doc_ids (pyarrow C++)."""
    g = batch.group_by(["band", "key"]).aggregate([(id_col, "list")])
    return g.rename_columns(["band", "key", "ids"])


def _bucket_list_merge(batch: pa.Table) -> pa.Table:
    """Merge partial id-lists per (band, key): explode back to rows
    (pyarrow's hash_list can't aggregate list columns) and re-list."""
    ids = batch.column("ids").combine_chunks()
    lengths = pc.list_value_length(ids).to_numpy(zero_copy_only=False)
    idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), lengths), pa.int64())
    rows = pa.table(
        {
            "band": batch.column("band").combine_chunks().take(idx),
            "key": batch.column("key").combine_chunks().take(idx),
            "doc_id": ids.flatten(),
        }
    )
    return rows.group_by(["band", "key"]).aggregate([("doc_id", "list")]).rename_columns(
        ["band", "key", "ids"]
    )


def band_bucket_pairs(banded_ds, id_col: str = "doc_id", fanout: int = 8, max_bucket: int = 512):
    """(band, key, doc_id) rows -> distinct candidate pairs (doc_a < doc_b).

    Tree-merged bucket aggregation (same pattern as the cell aggregate):
    per-block pyarrow group_by into id-lists, coalesce, merge, then one
    vectorized pair-expansion pass — avoids Ray's per-group ``map_groups``
    dispatch, which costs ~0.5 ms per bucket and dominates when most LSH
    buckets hold a single document.  Buckets larger than ``max_bucket``
    are truncated (pathological all-identical shards) and flagged.
    """
    merged = banded_ds.map_batches(
        lambda b: _bucket_list_partial(b, id_col), batch_format="pyarrow", batch_size=None
    )
    merged = merged.repartition(fanout).map_batches(
        _bucket_list_merge, batch_format="pyarrow", batch_size=None
    )
    merged = merged.repartition(1).map_batches(
        _bucket_list_merge, batch_format="pyarrow", batch_size=None
    )

    def expand(batch: pa.Table) -> pa.Table:
        ids_col = batch.column("ids").combine_chunks()
        lengths = pc.list_value_length(ids_col).to_numpy(zero_copy_only=False)
        out_a, out_b, out_tr = [], [], []
        offsets = ids_col.offsets.to_numpy(zero_copy_only=False)
        flat = ids_col.flatten().to_numpy(zero_copy_only=False)
        for i in np.nonzero(lengths >= 2)[0]:
            ids = np.unique(flat[offsets[i] : offsets[i + 1]])
            truncated = len(ids) > max_bucket
            if truncated:
                ids = ids[:max_bucket]
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            out_tr.append(np.full(len(ia), truncated))
        if not out_a:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "truncated": pa.array([], pa.bool_())}
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
                "truncated": pa.array(np.concatenate(out_tr), pa.bool_()),
            }
        )

    pairs = merged.map_batches(expand, batch_format="pyarrow", batch_size=None)
    # distinct pairs (a pair can collide in several bands)
    return pairs.map_batches(
        lambda b: b.group_by(["doc_a", "doc_b"]).aggregate([("truncated", "max")]).rename_columns(
            ["doc_a", "doc_b", "truncated"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def bucket_pairs(group: pd.DataFrame, id_col: str = "doc_id", max_bucket: int = 512) -> pd.DataFrame:
    """map_groups kernel for a (band,key) bucket -> candidate pairs
    (doc_a < doc_b).  Buckets larger than ``max_bucket`` are truncated
    (pathological all-identical shards); the cap is logged via a flag
    column rather than silently."""
    ids = np.unique(group[id_col].to_numpy())
    truncated = len(ids) > max_bucket
    if truncated:
        ids = ids[:max_bucket]
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "truncated": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "truncated": "bool"}
        )
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame(
        {"doc_a": ids[ia], "doc_b": ids[ib], "truncated": np.full(len(ia), truncated)}
    )


def jaccard_ngrams(a: str, b: str, k: int = 3) -> float:
    """Exact k-token-shingle Jaccard (the verification kernel for LSH
    candidates; also usable standalone for small pairsets)."""

    def shingles(s):
        t = s.split()
        if len(t) < k:
            return set(t)
        return {tuple(t[i : i + k]) for i in range(len(t) - k + 1)}

    sa, sb = shingles(a), shingles(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash per document + 4x16-bit block keys for hamming-<=3
    candidate bucketing (Charikar 2002 / Manku et al. 2007, public)."""
    text = batch.column(text_col).combine_chunks()
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(text)
    sims = np.zeros(n, dtype=np.uint64)
    if len(flat):
        th = pd.util.hash_array(flat.to_numpy(zero_copy_only=False)).astype(np.uint64)
        bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        signed = bits.astype(np.int32) * 2 - 1  # (n_tokens, 64) in {-1, +1}
        acc = segment_reduce(np.add, signed, offsets, 0, axis0_shape=(64,))
        nonempty = offsets[:-1] < offsets[1:]
        bitvals = (acc > 0).astype(np.uint8)
        packed = np.packbits(bitvals, axis=1, bitorder="little").view(np.uint64).ravel()
        sims[nonempty] = packed[nonempty]
    out = {id_col: batch.column(id_col), "simhash": pa.array(sims.astype(np.int64), pa.int64())}
    for blk in range(4):
        out[f"blk{blk}"] = pa.array(
            ((sims >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.int32), pa.int32()
        )
    return pa.table(out)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def hyperplane_keys(vecs: np.ndarray, n_planes: int = 16, seed: int = 11) -> np.ndarray:
    """Random-hyperplane LSH bucket key per vector (int32)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((vecs.shape[1], n_planes))
    bits = (vecs @ planes) > 0
    packed = np.packbits(bits, axis=1, bitorder="little")
    out = np.zeros((len(vecs), 4), dtype=np.uint8)
    out[:, : min(4, packed.shape[1])] = packed[:, :4]
    return out.view(np.int32).ravel()


def embed_lsh_pairs(ds, vectors_ref, threshold: float, n_tables: int = 8, n_planes: int = 12,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed LSH-bucketed near-dup pipeline (the scale path):

    1. map_batches: ``n_tables`` independent hyperplane keys per vector ->
       exploded (band, key, id) rows (band = table index; only 12 bytes
       per (vector, table) ever shuffles);
    2. :func:`band_bucket_pairs` tree merge -> candidate pairs;
    3. verification map_batches: exact cosine against the broadcast
       vector matrix, keep pairs >= threshold.

    Recall < 1 by construction (tested against the brute kernel);
    precision = 1 because of the exact verification step.
    """
    import ray as _ray

    def keys_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()), "key": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64())}
            )
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        vecs = flat.reshape(len(col), -1)
        ids = batch.column(id_col).to_numpy()
        bands = []
        keys = []
        out_ids = []
        for t in range(n_tables):
            k = hyperplane_keys(vecs, n_planes=n_planes, seed=11 + t)
            bands.append(np.full(len(ids), t, dtype=np.int32))
            keys.append(k.astype(np.int64))
            out_ids.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands), pa.int32()),
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_ids)),
            }
        )

    cand = band_bucket_pairs(ds.map_batches(keys_batch, batch_format="pyarrow"))

    def verify(batch: pa.Table) -> pa.Table:
        payload = _ray.get(vectors_ref) if isinstance(vectors_ref, _ray.ObjectRef) else vectors_ref
        ids = np.asarray(payload["ids"])
        vecs = np.asarray(payload["vectors"], dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        # vectorized id -> row mapping (a python dict over millions of
        # candidate pairs dominates the stage otherwise)
        order = np.argsort(ids, kind="stable")
        sorted_ids = np.asarray(ids)[order]
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        pa_pos = np.searchsorted(sorted_ids, da)
        pb_pos = np.searchsorted(sorted_ids, db)
        # the broadcast payload must cover every id in the stream — an
        # unchecked searchsorted would score a missing id against an
        # unrelated vector (or index out of bounds)
        ok = (
            (pa_pos < len(sorted_ids))
            & (pb_pos < len(sorted_ids))
        )
        if not ok.all():
            missing = np.unique(np.concatenate([da[~ok], db[~ok]]))[:5]
            raise ValueError(f"vectors payload missing ids (e.g. {missing.tolist()})")
        if len(da) and (
            (sorted_ids[pa_pos] != da).any() or (sorted_ids[pb_pos] != db).any()
        ):
            bad = np.unique(
                np.concatenate([da[sorted_ids[pa_pos] != da], db[sorted_ids[pb_pos] != db]])
            )[:5]
            raise ValueError(f"vectors payload missing ids (e.g. {bad.tolist()})")
        a = order[pa_pos]
        b = order[pb_pos]
        sim = np.einsum("ij,ij->i", unit[a], unit[b]) if len(a) else np.empty(0)
        keep = sim >= threshold
        return pa.table({"vec_a": pa.array(da[keep]), "vec_b": pa.array(db[keep])})

    return cand.map_batches(verify, batch_format="pyarrow", batch_size=None)


def cosine_pairs(vecs: np.ndarray, ids: np.ndarray, threshold: float) -> pa.Table:
    """Exact all-pairs cosine >= threshold within one bucket (or small side)."""
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    sim = unit @ unit.T
    ia, ib = np.nonzero(np.triu(sim >= threshold, k=1))
    return pa.table(
        {
            "vec_a": pa.array(ids[ia]),
            "vec_b": pa.array(ids[ib]),
            "cosine": pa.array(sim[ia, ib], pa.float64()),
        }
    )
