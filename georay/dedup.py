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




def _cluster_partitions(mult: int = 1, cap: int = 32, ds=None,
                        rows_per_partition: int = 2_000_000) -> int:
    """Cluster-sized partition count (a fixed constant starves a big
    cluster).  ``mult`` > 1 over-partitions for group-task kernels
    (smaller per-task working sets); joins keep mult=1 (each partition
    carries aggregator overhead).  ``cap`` bounds the fixed aggregator
    overhead at small scale — but when ``ds``'s row count is knowable
    for free (materialized dataset / fresh parquet read; ``_meta_count``
    never computes), the count additionally grows as
    ceil(rows / rows_per_partition) past the cap, so per-partition
    shares stay bounded at 10^12 rows instead of growing linearly
    (same rows-aware pattern as ``pipelines.events.default_partitions``)."""
    import ray

    p = max(4, min(int(ray.cluster_resources().get("CPU", 4)) * mult, cap))
    n_rows = None
    if ds is not None:
        try:
            n_rows = ds._meta_count()
        except Exception:
            n_rows = None
    if n_rows:
        p = min(max(p, -(-int(n_rows) // max(1, rows_per_partition))), 65_536)
    return p


def _join_partitions(big_ds, extra_rows: int | None = None, floor: int = 8,
                     rows_per_partition: int = 250_000) -> int:
    """Hash-join partition count: every partition carries fixed
    aggregator overhead, so the count follows the DATA — the old fixed
    floor (8, matching the measured small-scale optimum) until the
    bigger join side is known to exceed floor x rows_per_partition, then
    ceil(rows / rows_per_partition) up to 65536.  Row counts come from
    free plan metadata only (``_meta_count``); an opaque lazy side keeps
    the floor rather than guessing."""
    n = None
    if big_ds is not None:
        try:
            n = big_ds._meta_count()
        except Exception:
            n = None
    if extra_rows is not None:
        n = max(n or 0, int(extra_rows))
    if not n:
        return floor
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(min(floor, cpus), min(-(-n // rows_per_partition), 65_536))


def _normalize_blocks(ds, n_rows: int, rows_per_block: int = 4_000_000):
    """Rebuild a materialized dataset's blocks from actual rows before a
    hash join: sort-based aggregates emit SCHEMALESS empty blocks for
    empty partitions, Ray skips UDFs on empty blocks (typed-empty guards
    never run on them), and a join partition fed such a block fails with
    "no match for key field" — repartition constructs every output block
    from real rows, restoring the schema everywhere."""
    return ds.repartition(max(1, min(n_rows // rows_per_block + 1, 10_000)))


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


#: two independent 16-byte keys -> a 128-bit combined text key; collision
#: probability at 10^12 docs is ~(10^12)^2 / 2^129 ≈ 1e-15 — safe for
#: exact dedup without per-row Python hashing.  (Review finding: a
#: previous version sliced the distinguishing suffix off at [:16],
#: silently collapsing both keys to the same 64-bit hash.)
_KEY_A = "georay-dedupkeyA"
_KEY_B = "georay-dedupkeyB"
assert len(_KEY_A) == len(_KEY_B) == 16 and _KEY_A != _KEY_B


def text_key_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Exact-dedup partial: 128-bit vectorized content key per text (the
    hash-partition key) as two uint64 columns ``h1``/``h2``.  Null text
    hashes to a stable sentinel distinct from the empty string.  Fully
    vectorized (pandas' C hash kernel) — no per-document Python loop."""
    txt = batch.column(text_col).to_numpy(zero_copy_only=False)
    h1 = pd.util.hash_array(txt, hash_key=_KEY_A).astype(np.uint64)
    h2 = pd.util.hash_array(txt, hash_key=_KEY_B).astype(np.uint64)
    return pa.table(
        {
            "h1": pa.array(h1.astype(np.int64), pa.int64()),
            "h2": pa.array(h2.astype(np.int64), pa.int64()),
            id_col: batch.column(id_col),
        }
    )


def md5_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """md5 digest per text (verification surfaces whose SQL oracle needs
    literal ``md5(text)``; production dedup uses :func:`text_key_batch`).
    Null text hashes to a sentinel distinct from the empty string."""
    hs = [
        hashlib.md5(b"\x00<NULL>" if t is None else t.encode()).hexdigest()
        for t in batch.column(text_col).to_pylist()
    ]
    return pa.table({"h": pa.array(hs, pa.string()), id_col: batch.column(id_col)})


def md5_u64(strings: np.ndarray) -> np.ndarray:
    """DuckDB-mirrorable 64-bit string hash: ``md5_number_lower(s)`` ==
    little-endian uint64 of md5 digest bytes [8:16].  Hashes each UNIQUE
    value once (vocabulary-bounded), then scatters — the per-unique-token
    hashlib call is the only non-vectorized step, bounded by batch
    vocabulary rather than token count."""
    if len(strings) == 0:
        return np.empty(0, np.uint64)
    uniq, inv = np.unique(strings, return_inverse=True)
    out = np.empty(len(uniq), np.uint64)
    for i, s in enumerate(uniq):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
    return out[inv]


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


def _tokens_nonempty(text: pa.Array):
    """Whitespace split -> (token object array, per-doc offsets) with empty
    tokens dropped (splitting '' — or padded text — yields empty tokens).
    Null docs contribute zero tokens."""
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(text)
    if len(flat) == 0:
        return np.empty(0, dtype=object), np.zeros(n + 1, np.int64)
    tok_np = flat.to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = lens > 0
    if not keep.all():
        kept_cum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        offsets = kept_cum[offsets]
        tok_np = tok_np[keep]
    return tok_np, offsets


def _gather_segments(n_per_seg: np.ndarray, src_starts: np.ndarray):
    """Vectorized ragged gather plan: for segment i, read ``n_per_seg[i]``
    consecutive elements starting at ``src_starts[i]``.  Returns flat
    source indices (concatenated, segment order preserved)."""
    total = int(n_per_seg.sum())
    if total == 0:
        return np.empty(0, np.int64)
    seg_of = np.repeat(np.arange(len(n_per_seg)), n_per_seg)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_per_seg)[:-1]]), n_per_seg
    )
    return src_starts[seg_of] + pos


def _shingle_layout(offsets: np.ndarray, k: int):
    """Per-doc output layout for rolling k-shingles: docs with >= k tokens
    emit m-k+1 shingles, shorter non-empty docs fall back to their m raw
    tokens.  Returns (out_offsets, big_doc_token_starts, small_mask)."""
    m = np.diff(offsets)
    out_counts = np.where(m >= k, m - k + 1, m)
    out_offsets = np.zeros(len(m) + 1, np.int64)
    np.cumsum(out_counts, out=out_offsets[1:])
    return m, out_counts, out_offsets


def _roll_shingles(th: np.ndarray, offsets: np.ndarray, k: int):
    """Vectorized per-doc rolling k-combine of token hashes (uint64
    wraparound arithmetic); no per-document Python loop.  Shingles never
    cross document boundaries; docs with fewer than k tokens contribute
    their raw token hashes."""
    n = len(offsets) - 1
    m, out_counts, out_offsets = _shingle_layout(offsets, k)
    T = len(th)
    out = np.empty(out_offsets[-1], np.uint64)
    C1, C2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0x85EBCA77C2B2AE63)
    big = m >= k
    if big.any() and T >= k:
        sh_all = th[: T - k + 1] * C1
        for j in range(1, k):
            sh_all = sh_all + th[j : T - k + 1 + j] * (C2 if j % 2 else C1 ^ C2)
        src = _gather_segments(np.where(big, m - k + 1, 0), offsets[:-1])
        dst = _gather_segments(np.where(big, m - k + 1, 0), out_offsets[:-1])
        out[dst] = sh_all[src]
    small = (m > 0) & (m < k)
    if small.any():
        src = _gather_segments(np.where(small, m, 0), offsets[:-1])
        dst = _gather_segments(np.where(small, m, 0), out_offsets[:-1])
        out[dst] = th[src]
    return out, out_offsets


def _shingle_hashes(text: pa.Array, k: int = 3):
    """Whitespace tokens -> rolling k-token shingle hashes (uint64),
    flattened across the batch with per-doc offsets; fully vectorized."""
    tok_np, offsets = _tokens_nonempty(text)
    n = len(offsets) - 1
    if len(tok_np) == 0:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    th = pd.util.hash_array(tok_np).astype(np.uint64)
    return _roll_shingles(th, offsets, k)


def _shingle_hashes2(text: pa.Array, k: int = 3):
    """Like :func:`_shingle_hashes` but with TWO independently-keyed
    streams (128-bit effective shingle identity): set operations on
    (h1, h2) pairs match exact string-shingle sets up to a ~2^-128
    collision probability — safe to stand in for string sets in
    oracle-checked integer-Jaccard comparisons."""
    tok_np, offsets = _tokens_nonempty(text)
    n = len(offsets) - 1
    if len(tok_np) == 0:
        z = np.empty(0, np.uint64)
        return z, z, np.zeros(n + 1, np.int64)
    th1 = pd.util.hash_array(tok_np, hash_key=_KEY_A).astype(np.uint64)
    th2 = pd.util.hash_array(tok_np, hash_key=_KEY_B).astype(np.uint64)
    h1, off = _roll_shingles(th1, offsets, k)
    h2, _ = _roll_shingles(th2, offsets, k)
    return h1, h2, off


def _segment_unique2(h1: np.ndarray, h2: np.ndarray, seg: np.ndarray):
    """Per-segment set dedup of (h1, h2) value pairs: one lexsort + one
    adjacent-difference mask over the whole batch (no per-segment loop).
    Returns the deduped (h1, h2, seg) triplets sorted by segment."""
    order = np.lexsort((h2, h1, seg))
    a, b, s = h1[order], h2[order], seg[order]
    keep = np.ones(len(s), bool)
    keep[1:] = (s[1:] != s[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[keep], b[keep], s[keep]


def _shingle_strings(tok_np: np.ndarray, offsets: np.ndarray, k: int = 3):
    """Per-doc k-token shingles as ' '-joined STRINGS (the md5 oracle
    backend: DuckDB mirrors them as ``tk[i]||' '||tk[i+1]||' '||tk[i+2]``).
    Same layout rules as :func:`_roll_shingles`."""
    n = len(offsets) - 1
    m, out_counts, out_offsets = _shingle_layout(offsets, k)
    T = len(tok_np)
    out = np.empty(out_offsets[-1], dtype=object)
    big = m >= k
    if big.any() and T >= k:
        sh_all = tok_np[: T - k + 1]
        for j in range(1, k):
            sh_all = sh_all + " "
            sh_all = sh_all + tok_np[j : T - k + 1 + j]
        src = _gather_segments(np.where(big, m - k + 1, 0), offsets[:-1])
        dst = _gather_segments(np.where(big, m - k + 1, 0), out_offsets[:-1])
        out[dst] = sh_all[src]
    small = (m > 0) & (m < k)
    if small.any():
        src = _gather_segments(np.where(small, m, 0), offsets[:-1])
        dst = _gather_segments(np.where(small, m, 0), out_offsets[:-1])
        out[dst] = tok_np[src]
    return out, out_offsets


def winnow_minima(values: np.ndarray, offsets: np.ndarray, window: int = 4):
    """Winnowing (Schleimer et al. 2003): per-doc sliding-window minima of
    the hash stream, deduplicated.  Returns per-doc ``(fp_count,
    fp_xor_digest)`` — fully vectorized (global sliding window + boundary
    masking + lexsort dedup + reduceat), no per-document loop."""
    n = len(offsets) - 1
    cnt = np.diff(offsets)
    counts = np.zeros(n, np.int64)
    digests = np.zeros(n, np.uint64)
    if len(values) == 0:
        return counts, digests
    doc_of = np.repeat(np.arange(n), cnt)
    mins_parts = []
    docs_parts = []
    T = len(values)
    if T >= window:
        view = np.lib.stride_tricks.sliding_window_view(values, window)
        valid = doc_of[: T - window + 1] == doc_of[window - 1 :]
        if valid.any():
            mins_parts.append(view.min(axis=1)[valid])
            docs_parts.append(doc_of[: T - window + 1][valid])
    small = (cnt > 0) & (cnt < window)
    if small.any():
        small_min = segment_reduce(np.minimum, values, offsets, np.iinfo(np.uint64).max)
        mins_parts.append(small_min[small])
        docs_parts.append(np.nonzero(small)[0])
    if not mins_parts:
        return counts, digests
    mins = np.concatenate(mins_parts)
    docs = np.concatenate(docs_parts)
    order = np.lexsort((mins, docs))
    mins, docs = mins[order], docs[order]
    first = np.ones(len(mins), bool)
    first[1:] = (docs[1:] != docs[:-1]) | (mins[1:] != mins[:-1])
    mins, docs = mins[first], docs[first]
    np.add.at(counts, docs, 1)
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    nz = counts > 0
    digests[nz] = np.bitwise_xor.reduceat(mins, starts[:-1][nz])
    return counts, digests


def minhash_signatures(text: pa.Array, num_perm: int = 128, k: int = 3) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures; empty docs get all-max."""
    sh, offsets = _shingle_hashes(text, k)
    n = len(offsets) - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    a, b = _perm_params(num_perm)
    # The permutation loop is the minhash hot path: num_perm full passes
    # over every shingle hash.  Two optimizations, both BIT-EXACT vs the
    # naive `(a*sh + b) % MERSENNE_P` (the SQL oracle mirrors the wrapped
    # uint64 intermediate, so results must not change):
    #   * Mersenne fold instead of integer division — for x < 2^64 and
    #     P = 2^61-1, x = q*(P+1) + r gives x mod P = (q + r) mod P with
    #     q = x>>61 <= 7, so one conditional subtract finishes the mod.
    #   * preallocated out= buffers — zero allocations per permutation
    #     (the naive form allocates ~4 shingle-sized temporaries each).
    tmp = np.empty_like(sh)
    fold = np.empty_like(sh)
    shift = np.uint64(61)
    for p in range(num_perm):
        np.multiply(sh, a[p], out=tmp)   # wraps mod 2^64, same as before
        np.add(tmp, b[p], out=tmp)
        np.bitwise_and(tmp, MERSENNE_P, out=fold)
        np.right_shift(tmp, shift, out=tmp)
        np.add(fold, tmp, out=fold)
        fold[fold >= MERSENNE_P] -= MERSENNE_P
        sig[:, p] = segment_reduce(np.minimum, fold, offsets, np.iinfo(np.uint64).max)
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


def _empty_bucket_lists(has_payload: bool) -> pa.Table:
    cols = {
        "band": pa.array([], pa.int32()),
        "key": pa.array([], pa.int64()),
        "ids": pa.array([], pa.list_(pa.int64())),
    }
    if has_payload:
        cols["payloads"] = pa.array([], pa.list_(pa.int64()))
    return pa.table(cols)


def _bucket_list_partial(batch: pa.Table, id_col: str = "doc_id",
                         payload_col: str | None = None) -> pa.Table:
    """Per-batch combine: (band, key) -> list of doc_ids (pyarrow C++);
    an optional fixed-width payload column (e.g. the 64-bit simhash) is
    list-aggregated alongside so inline pair verification never needs a
    join back against the corpus.  EMPTY batches return a literal typed
    table — pyarrow group_by on an empty input yields 0-chunk columns
    Ray's block layer treats as schemaless (r3 review finding)."""
    if batch.num_rows == 0:
        return _empty_bucket_lists(payload_col is not None)
    aggs = [(id_col, "list")]
    names = ["band", "key", "ids"]
    if payload_col is not None:
        aggs.append((payload_col, "list"))
        names.append("payloads")
    g = batch.group_by(["band", "key"]).aggregate(aggs)
    return g.rename_columns(names)


def _bucket_list_merge(batch: pa.Table, has_payload: bool = False) -> pa.Table:
    """Merge partial id-lists per (band, key): explode back to rows
    (pyarrow's hash_list can't aggregate list columns) and re-list.
    ``has_payload`` is caller-supplied because an EMPTY input block (the
    norm after repartition(fanout) of a small partials table) may be
    schemaless — its column list can't be trusted to infer layout."""
    if batch.num_rows == 0:
        return _empty_bucket_lists(has_payload)
    ids = batch.column("ids").combine_chunks()
    lengths = pc.list_value_length(ids).to_numpy(zero_copy_only=False)
    idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), lengths), pa.int64())
    cols = {
        "band": batch.column("band").combine_chunks().take(idx),
        "key": batch.column("key").combine_chunks().take(idx),
        "doc_id": ids.flatten(),
    }
    aggs = [("doc_id", "list")]
    names = ["band", "key", "ids"]
    if has_payload:
        cols["payload"] = batch.column("payloads").combine_chunks().flatten()
        aggs.append(("payload", "list"))
        names.append("payloads")
    rows = pa.table(cols)
    return rows.group_by(["band", "key"]).aggregate(aggs).rename_columns(names)


def _truncated_int_to_bool(b: pa.Table) -> pa.Table:
    """(doc_a, doc_b, truncated:int32) -> bool flag, typed even when the
    upstream sort aggregate emits a schemaless empty partition."""
    if b.num_rows == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "truncated": pa.array([], pa.bool_())}
        )
    return pa.table(
        {"doc_a": b.column("doc_a"), "doc_b": b.column("doc_b"),
         "truncated": pa.compute.cast(pa.compute.greater(b.column("truncated"), 0), pa.bool_())}
    )


def _bucket_lists_to_rows(b: pa.Table, out_col: str = "doc_a") -> pa.Table:
    """Explode materialized (band, key, ids[, payloads]) partials back to
    slim (band, key, id[, payload]) rows — lets mode="auto" reuse the
    already-computed partials for the join path instead of re-running the
    signature lineage."""
    has_payload = "payloads" in b.column_names
    if b.num_rows == 0:
        out = {"band": pa.array([], pa.int32()), "key": pa.array([], pa.int64()),
               out_col: pa.array([], pa.int64())}
        if has_payload:
            out["payload"] = pa.array([], pa.int64())
        return pa.table(out)
    ids = b.column("ids").combine_chunks()
    lengths = pc.list_value_length(ids).to_numpy(zero_copy_only=False)
    idx = pa.array(np.repeat(np.arange(len(b), dtype=np.int64), lengths), pa.int64())
    out = {
        "band": b.column("band").combine_chunks().take(idx),
        "key": b.column("key").combine_chunks().take(idx),
        out_col: ids.flatten(),
    }
    if has_payload:
        out["payload"] = b.column("payloads").combine_chunks().flatten()
    return pa.table(out)


def _join_pairs_from_slim(slim, pair_filter=None, max_bucket=None):
    """Distributed self-hash-join pair expansion over a MATERIALIZED slim
    (band, key, doc_a[, payload]) dataset — no single merge task, no
    per-group dispatch; every stage is a partitioned C++ join / groupby.
    ``pair_filter(payload_a, payload_b) -> bool mask`` verifies pairs
    inline from payloads riding the join (e.g. exact hamming on simhash)
    — no join back against the corpus.

    ``max_bucket``: a self-join expands a hot bucket QUADRATICALLY, so
    buckets with more than ``max_bucket`` rows are THINNED to ~max_bucket
    deterministically-hash-selected members (detected by a vectorized
    groupby count; pathological all-identical shards only) — pairs among
    the retained members still link the cluster, the same partial-loss
    semantics as tree-mode truncation (the SELECTION differs: tree keeps
    the lowest ids, join keeps a hash-chosen subset; both flag every
    emitted pair from a thinned bucket and add a marker row per thinned
    bucket).  The guard costs one extra shuffle of the slim (band, key)
    pairs — comparable to the join's own build side; pass
    ``max_bucket=None`` to skip it when the signature design already
    bounds bucket sizes."""
    from ray.data.aggregate import Count as _Count, Max as _Max

    has_payload = pair_filter is not None
    markers = None
    if max_bucket is not None:
        def hot_only(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {"band": pa.array([], pa.int32()), "key": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())}
                )
            t = b.filter(pc.greater(b.column("n"), max_bucket))
            return pa.table(
                {"band": t.column("band").cast(pa.int32()), "key": t.column("key"),
                 "n": t.column("n").cast(pa.int64())}
            )

        # bounded driver-side pull: hot buckets are pathological by
        # definition (all-identical shards); 100k of them means the
        # upstream signature design is broken — fail loudly rather than
        # OOM the driver
        _HOT_LIMIT = 100_000
        hot = (
            slim.groupby(["band", "key"])
            .aggregate(_Count(alias_name="n"))
            .map_batches(hot_only, batch_format="pyarrow")
            .take(_HOT_LIMIT + 1)
        )
        if len(hot) > _HOT_LIMIT:
            raise ValueError(
                f"more than {_HOT_LIMIT} buckets exceed max_bucket={max_bucket}: "
                "the banding/signature design is degenerate for this corpus; "
                "fix the index (more key bits) or pass max_bucket=None"
            )
        if hot:
            import logging

            import ray.data as _rd

            logging.getLogger("georay.dedup").warning(
                "join-mode pair expansion thinned %d bucket(s) larger than "
                "max_bucket=%d to ~max_bucket members each (quadratic "
                "self-join guard); pairs among dropped members are NOT "
                "emitted — flagged pairs + marker rows record the loss",
                len(hot), max_bucket,
            )

            M1 = np.uint64(0x9E3779B97F4A7C15)
            M2 = np.uint64(0xC2B2AE3D27D4EB4F)

            def bucket_hash(band: np.ndarray, key: np.ndarray) -> np.ndarray:
                h = key.astype(np.uint64) * M1
                h ^= band.astype(np.uint64) + np.uint64(0x165667B19E3779F9)
                h *= M2
                h ^= h >> np.uint64(29)
                return h

            hb = np.asarray([int(r["band"]) for r in hot], np.int64)
            hk = np.asarray([int(r["key"]) for r in hot], np.int64)
            hn = np.asarray([int(r["n"]) for r in hot], np.int64)
            hh = bucket_hash(hb, hk)
            order = np.argsort(hh)
            hot_hashes, hot_ns = hh[order], hn[order]

            def thin_hot(b: pa.Table) -> pa.Table:
                # ONE vectorized membership pass per batch (searchsorted
                # against the broadcast hot-hash table), not a Python
                # loop over hot buckets; a 2^-64 hash collision merely
                # thins an innocent bucket slightly
                if b.num_rows == 0:
                    return b.append_column("hot", pa.array([], pa.int32()))
                band = b.column("band").to_numpy()
                key = b.column("key").to_numpy()
                h = bucket_hash(band, key)
                idx = np.clip(np.searchsorted(hot_hashes, h), 0, len(hot_hashes) - 1)
                is_hot = hot_hashes[idx] == h
                keep = np.ones(len(h), bool)
                if is_hot.any():
                    n = hot_ns[idx].astype(np.uint64)
                    ids = b.column("doc_a").to_numpy().astype(np.uint64)
                    r = (ids * M1) >> np.uint64(17)
                    keep = np.where(is_hot, (r % np.maximum(n, 1)) < np.uint64(max_bucket), True)
                out = b.filter(pa.array(keep))
                return out.append_column(
                    "hot", pa.array(is_hot[keep].astype(np.int32), pa.int32())
                )

            slim = slim.map_batches(thin_hot, batch_format="pyarrow")
            # one marker row per thinned bucket, distinct (doc_b) so the
            # downstream pair-distinct cannot collapse the count
            markers = _rd.from_arrow(
                pa.table(
                    {
                        "doc_a": pa.array([-1] * len(hot), pa.int64()),
                        "doc_b": pa.array([-1 - i for i in range(len(hot))], pa.int64()),
                        "truncated": pa.array([True] * len(hot), pa.bool_()),
                    }
                )
            )

    def rename_right(b: pa.Table) -> pa.Table:
        names = {"doc_a": "doc_b", "payload": "payload_b"}
        keep_cols = [c for c in b.column_names if c != "hot"]
        return b.select(keep_cols).rename_columns(
            [names.get(c, c) for c in keep_cols]
        )

    right = slim.map_batches(rename_right, batch_format="pyarrow")
    # slim is materialized, so its row count is free — the join partition
    # count scales with the slim table, not just the cluster
    n_part = _cluster_partitions(ds=slim)
    j = slim.join(right, join_type="inner", num_partitions=n_part, on=("band", "key"))

    def ordered(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "truncated": pa.array([], pa.int32())}
            )
        da = b.column("doc_a").to_numpy()
        db = b.column("doc_b").to_numpy()
        keep = da < db
        if has_payload:
            keep = keep & pair_filter(
                b.column("payload").to_numpy(), b.column("payload_b").to_numpy()
            )
        if "hot" in b.column_names:  # pairs from thinned buckets are flagged
            trunc = b.column("hot").to_numpy().astype(np.int32)[keep]
        else:
            trunc = np.zeros(int(keep.sum()), np.int32)
        return pa.table(
            {
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "truncated": pa.array(trunc, pa.int32()),
            }
        )

    distinct = (
        j.map_batches(ordered, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(_Max("truncated", alias_name="truncated"))
    )
    result = distinct.map_batches(_truncated_int_to_bool, batch_format="pyarrow")
    if markers is not None:
        result = result.union(markers)
    return result


def _tree_pairs_from_partials(partials, fanout: int, max_bucket: int, pair_filter=None,
                              has_payload: bool = False):
    """Coalesce-and-merge the (band, key, ids[, payloads]) partials down
    to one block, then one vectorized pair-expansion pass (with optional
    inline payload verification).  The final merge coalesces to a single
    task — callers must bound bucket-table cardinality (that is what
    mode="auto" measures)."""
    merged = partials.repartition(fanout).map_batches(
        lambda b: _bucket_list_merge(b, has_payload), batch_format="pyarrow", batch_size=None
    )
    merged = merged.repartition(1).map_batches(
        lambda b: _bucket_list_merge(b, has_payload), batch_format="pyarrow", batch_size=None
    )

    def expand(batch: pa.Table) -> pa.Table:
        ids_col = batch.column("ids").combine_chunks()
        lengths = pc.list_value_length(ids_col).to_numpy(zero_copy_only=False)
        out_a, out_b, out_tr = [], [], []
        offsets = ids_col.offsets.to_numpy(zero_copy_only=False)
        flat = ids_col.flatten().to_numpy(zero_copy_only=False)
        if has_payload:
            pl_flat = batch.column("payloads").combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
        n_markers = 0
        for i in np.nonzero(lengths >= 2)[0]:
            seg = flat[offsets[i] : offsets[i + 1]]
            ids, first = np.unique(seg, return_index=True)
            truncated = max_bucket is not None and len(ids) > max_bucket
            if truncated:
                ids = ids[:max_bucket]
                first = first[:max_bucket]
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            if has_payload and pair_filter is not None:
                pl = pl_flat[offsets[i] : offsets[i + 1]][first]
                m = pair_filter(pl[ia], pl[ib])
                ia, ib = ia[m], ib[m]
                if len(ia) == 0:
                    if truncated:
                        # keep truncation observable even when the filter
                        # rejects every surviving pair: a marker row per
                        # bucket, doc_b made distinct so the downstream
                        # pair-distinct cannot collapse the count
                        # (consumers drop doc_a < 0)
                        n_markers += 1
                        out_a.append(np.array([-1], np.int64))
                        out_b.append(np.array([-n_markers], np.int64))
                        out_tr.append(np.array([True]))
                    continue
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

    def distinct(b: pa.Table) -> pa.Table:
        # distinct pairs (a pair can collide in several bands).  pyarrow
        # group_by on an EMPTY table yields 0-chunk columns that Ray's
        # block layer treats as schemaless — rebuild the typed empty
        if b.num_rows == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "truncated": pa.array([], pa.bool_())}
            )
        return b.group_by(["doc_a", "doc_b"]).aggregate([("truncated", "max")]).rename_columns(
            ["doc_a", "doc_b", "truncated"]
        )

    return pairs.map_batches(distinct, batch_format="pyarrow", batch_size=None)


def band_bucket_pairs(
    banded_ds, id_col: str = "doc_id", fanout: int = 8, max_bucket: int = 512,
    mode: str = "auto", tree_row_limit: int = 2_000_000,
    payload_col: str | None = None, pair_filter=None,
):
    """(band, key, doc_id) rows -> distinct candidate pairs (doc_a < doc_b).

    mode="auto" (default): per-block combine into (band, key, id-list)
    partials, MEASURE the surviving bucket-table cardinality, and pick the
    tree merge when it fits comfortably in one task (``tree_row_limit``)
    else the distributed self-join — the mode choice follows the data,
    not caller knowledge (mirrors ``final_cell_agg(mode="auto")``).  Auto
    is necessarily EAGER up to the partials; both downstream paths reuse
    the materialized partials, so the (dominant) signature/banding
    lineage runs exactly once either way.

    mode="tree": per-block pyarrow group_by into id-lists, coalesce,
    merge, then one vectorized pair-expansion pass — avoids Ray's
    per-group ``map_groups`` dispatch (~0.5 ms per bucket, dominant when
    most LSH buckets are singletons).  The final merge coalesces to one
    task, so this mode is for MODERATE bucket-table cardinality (≤ a few
    million buckets of id-lists after per-block combining); keeps the
    pipeline fully lazy.

    mode="groupby": Ray's sort-based ``groupby(["band","key"])`` with a
    per-bucket pair kernel — per-group dispatch bounds it to workloads
    whose bucket count is itself bounded (e.g. hyperplane LSH:
    ``2^planes × tables`` buckets).

    mode="join": distributed self-hash-join on (band, key) — the
    unbounded-cardinality scale path (10^12-doc MinHash: no single merge
    task, no per-group dispatch, every stage a partitioned C++ join /
    groupby).

    ``max_bucket`` (pathological all-identical shards): tree/groupby
    modes TRUNCATE oversized buckets to the cap and flag the emitted
    pairs; join mode THINS them to ~max_bucket hash-chosen members (a
    self-join expands hot buckets quadratically) and emits one marker row
    per thinned bucket — ``doc_a = -1`` with a DISTINCT negative
    ``doc_b`` (-1, -2, …) so the downstream pair-distinct cannot collapse
    the count; consumers filter ``doc_a < 0``, never the literal pair
    (-1, -1).  The loss is programmatically observable on every path the
    default mode="auto" can pick.  Pass ``max_bucket=None`` to disable.

    ``payload_col``/``pair_filter``: a fixed-width per-doc payload (e.g.
    the 64-bit simhash) rides the bucket shuffle and
    ``pair_filter(payload_a, payload_b) -> bool mask`` verifies candidate
    pairs INLINE at expansion — candidates never join back against the
    corpus, and only verified pairs leave the stage.
    """
    if mode == "auto":
        partials = banded_ds.map_batches(
            lambda b: _bucket_list_partial(b, id_col, payload_col),
            batch_format="pyarrow", batch_size=None,
        ).materialize()
        if partials.count() <= tree_row_limit:
            return _tree_pairs_from_partials(partials, fanout, max_bucket, pair_filter,
                                             has_payload=payload_col is not None)
        slim = partials.map_batches(_bucket_lists_to_rows, batch_format="pyarrow").materialize()
        return _join_pairs_from_slim(slim, pair_filter, max_bucket)
    if mode == "join":

        def _project(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                out = {"band": pa.array([], pa.int32()), "key": pa.array([], pa.int64()),
                       "doc_a": pa.array([], pa.int64())}
                if payload_col is not None:
                    out["payload"] = pa.array([], pa.int64())
                return pa.table(out)
            out = {"band": b.column("band"), "key": b.column("key"), "doc_a": b.column(id_col)}
            if payload_col is not None:
                out["payload"] = b.column(payload_col)
            return pa.table(out)

        # materialize the slim (band, key, id) projection ONCE — deriving
        # both join sides from the lazy upstream would re-execute the
        # whole signature/banding lineage twice (the dominant cost)
        slim = banded_ds.map_batches(_project, batch_format="pyarrow").materialize()
        return _join_pairs_from_slim(slim, pair_filter, max_bucket)
    if mode == "groupby":
        if payload_col is not None:
            raise ValueError("payload verification is not supported in groupby mode")
        from ray.data.aggregate import Max as _Max

        pairs = banded_ds.groupby(["band", "key"]).map_groups(
            lambda g: bucket_pairs(g, id_col=id_col, max_bucket=max_bucket),
            batch_format="pandas",
        )

        def _as_int(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:  # sort aggregates emit schemaless empty partitions
                return pa.table(
                    {
                        "doc_a": pa.array([], pa.int64()),
                        "doc_b": pa.array([], pa.int64()),
                        "truncated": pa.array([], pa.int32()),
                    }
                )
            return pa.table(
                {
                    "doc_a": b.column("doc_a"),
                    "doc_b": b.column("doc_b"),
                    "truncated": b.column("truncated").cast(pa.int32()),
                }
            )

        distinct = (
            pairs.map_batches(_as_int, batch_format="pyarrow")
            .groupby(["doc_a", "doc_b"])
            .aggregate(_Max("truncated", alias_name="truncated"))
        )
        return distinct.map_batches(_truncated_int_to_bool, batch_format="pyarrow")
    if mode != "tree":
        raise ValueError(f"unknown band_bucket_pairs mode {mode!r}")

    partials = banded_ds.map_batches(
        lambda b: _bucket_list_partial(b, id_col, payload_col),
        batch_format="pyarrow", batch_size=None,
    )
    return _tree_pairs_from_partials(partials, fanout, max_bucket, pair_filter,
                                     has_payload=payload_col is not None)


def bucket_pairs(group: pd.DataFrame, id_col: str = "doc_id", max_bucket: int = 512) -> pd.DataFrame:
    """map_groups kernel for a (band,key) bucket -> candidate pairs
    (doc_a < doc_b).  Buckets larger than ``max_bucket`` are truncated
    (pathological all-identical shards); the cap is logged via a flag
    column rather than silently."""
    ids = np.unique(group[id_col].to_numpy())
    truncated = max_bucket is not None and len(ids) > max_bucket
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

def simhash_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id", hash_impl: str = "fast"
) -> pa.Table:
    """64-bit SimHash per document + 4x16-bit block keys for hamming-<=3
    candidate bucketing (Charikar 2002 / Manku et al. 2007, public).

    ``hash_impl="fast"`` (default): pandas' vectorized C hash kernel.
    ``hash_impl="md5"``: DuckDB-mirrorable ``md5_number_lower`` token hash
    (vocabulary-bounded hashing of unique tokens) — the oracle-parity
    backend; the algorithm is hash-agnostic."""
    text = batch.column(text_col).combine_chunks()
    tok_np, offsets = _tokens_nonempty(text)
    n = len(text)
    sims = np.zeros(n, dtype=np.uint64)
    if len(tok_np):
        if hash_impl == "md5":
            th = md5_u64(tok_np)
        else:
            th = pd.util.hash_array(tok_np).astype(np.uint64)
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


def simhash_index_tables(blocks: int = 6, max_hamming: int = 3):
    """Table layout for the permuted multi-index (Manku et al. 2007 §4,
    public): split 64 bits into ``blocks`` contiguous ranges and build one
    table per (blocks - max_hamming)-subset of ranges.  Returns
    ``(bounds, combos)`` where ``bounds`` are the range bit boundaries and
    ``combos`` the per-table range subsets."""
    from itertools import combinations

    if blocks <= max_hamming:
        raise ValueError("need blocks > max_hamming for the pigeonhole guarantee")
    bounds = np.linspace(0, 64, blocks + 1).astype(np.int64)
    combos = list(combinations(range(blocks), blocks - max_hamming))
    return bounds, combos


def simhash_index_keys(u: np.ndarray, blocks: int = 6, max_hamming: int = 3):
    """Permuted-table multi-index keys: yields ``(table_id, key)`` per
    table, where ``key`` concatenates the bits of that table's block
    subset.  ``hamming(a, b) <= max_hamming`` flips bits in at most
    ``max_hamming`` blocks, so at least ``blocks - max_hamming`` blocks
    are intact and SOME table's subset avoids every flipped block — a, b
    share that table's key (recall 1 by pigeonhole).  Key width is
    ``64 - (bits of the excluded blocks)`` (~32 bits for blocks=6, d=3),
    so distinct-bucket cardinality grows with the corpus instead of
    capping at 2^16 like the naive 4x16 scheme — the fix for the
    round-2 scale verdict on ``simhash_pairs``.  Tables = C(blocks,
    max_hamming) (20 for 6/3); banding volume scales with table count,
    bucket size shrinks with key width."""
    bounds, combos = simhash_index_tables(blocks, max_hamming)
    widths = np.diff(bounds)
    u = u.astype(np.uint64)
    block_vals = [
        (u >> np.uint64(bounds[i])) & np.uint64((1 << int(widths[i])) - 1)
        for i in range(blocks)
    ]
    for table_id, combo in enumerate(combos):
        key = np.zeros(len(u), np.uint64)
        shift = 0
        for bi in combo:
            key |= block_vals[bi] << np.uint64(shift)
            shift += int(widths[bi])
        yield table_id, key.astype(np.int64)


def simhash_pairs(ds, max_hamming: int = 3, max_bucket: int = 512,
                  text_col: str = "text", id_col: str = "doc_id",
                  hash_impl: str = "fast",
                  blocks: int = 6, stats_out: dict | None = None):
    """SimHash near-dup PAIRS via the permuted multi-index
    (:func:`simhash_index_keys`): docs sharing any table's block-subset
    key are candidates (recall 1 for hamming <= ``max_hamming`` by
    pigeonhole), verified INLINE by exact hamming distance — the 8-byte
    simhash rides the bucket shuffle as a ``band_bucket_pairs`` payload,
    so candidates never hash-join back against the corpus (the round-2
    shape paid two distributed joins here).  Candidate-pair expansion
    goes through ``band_bucket_pairs(mode="auto")`` which picks the tree
    merge or the distributed self-join by measured bucket cardinality.
    ``blocks`` tunes the recall/volume trade-off: C(blocks, max_hamming)
    tables, key width ~``64 * (1 - max_hamming/blocks)`` bits (6/3 -> 20
    tables, ~32-bit keys — bucket cardinality grows with the corpus
    instead of capping at 2^16)."""
    # one simhash pass over the corpus; table keys are re-derived from
    # the 64-bit hash by shifting (the banded branch must not re-run the
    # dominant token-hashing upstream)
    sims_slim = ds.map_batches(
        lambda b: simhash_batch(b, text_col=text_col, id_col=id_col, hash_impl=hash_impl)
        .select([id_col, "simhash"]),
        batch_format="pyarrow",
    )

    def banded(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        sim = b.column("simhash").to_numpy()
        u = sim.astype(np.uint64)
        out_band, out_key, out_id, out_sim = [], [], [], []
        for table_id, key in simhash_index_keys(u, blocks=blocks, max_hamming=max_hamming):
            out_band.append(np.full(len(ids), table_id, dtype=np.int32))
            out_key.append(key)
            out_id.append(ids)
            out_sim.append(sim)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "key": pa.array(np.concatenate(out_key), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_sim), pa.int64()),
            }
        )

    verified = band_bucket_pairs(
        sims_slim.map_batches(banded, batch_format="pyarrow"),
        max_bucket=max_bucket,
        payload_col="sim",
        pair_filter=lambda sa, sb: hamming64(sa, sb) <= max_hamming,
    ).materialize()

    import ray.data as _rd

    empty = pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    if verified.count() == 0:
        # Ray skips the UDF on empty blocks, so an all-empty dataset
        # cannot be re-typed by map_batches guards — pin the schema with
        # a literal empty dataset (r3 review finding).  Zero rows also
        # means zero markers, i.e. genuinely no truncation: the stats
        # contract must still be honoured with an explicit 0
        if stats_out is not None:
            stats_out["truncated_candidate_pairs"] = 0
        return _rd.from_arrow(empty)

    trunc = verified.map_batches(
        lambda b: pa.table({"t": b.column("truncated").cast(pa.int32())}),
        batch_format="pyarrow",
    ).sum("t")
    if stats_out is not None:
        # programmatic truncation contract (the warning below is for
        # humans): rows from buckets that hit the max_bucket cap —
        # verified pairs from truncated buckets, plus one (-1, -k)
        # marker per truncated bucket whose pairs were all
        # hamming-rejected (distinct doc_b so the pair-distinct cannot
        # collapse the count), so the count is nonzero WHENEVER the
        # recall-1 guarantee was voided
        stats_out["truncated_candidate_pairs"] = int(trunc or 0)
    if trunc:
        import logging

        logging.getLogger("georay.dedup").warning(
            "simhash block bucket(s) truncated at max_bucket=%d — pairs beyond "
            "the cap are dropped, so the pigeonhole recall-1 guarantee does NOT "
            "hold for this run; raise max_bucket for exact results",
            max_bucket,
        )
    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        # drop (-1,-1) truncation marker rows — they carry the flag for
        # the stats/warning above, not real pairs
        b = b.filter(pc.greater_equal(b.column("doc_a"), 0))
        return b.select(["doc_a", "doc_b"])

    out = verified.map_batches(final, batch_format="pyarrow").materialize()
    if out.count() == 0:  # all rows were markers: re-pin the schema
        return _rd.from_arrow(empty)
    return out


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


def embed_lsh_pairs(ds, vectors_ref=None, threshold: float = 0.9, n_tables: int = 8,
                    n_planes: int = 12, vec_col: str = "embedding", id_col: str = "vec_id",
                    mode: str = "bucket", num_partitions: int = 8, max_bucket: int = 512,
                    include_truncated: bool = False):
    """Distributed LSH-bucketed near-dup pipeline (the scale path).

    mode="bucket" (default) — BUCKET-LOCAL verification: the packed
    vector rides the (band, key) groupby, each bucket verifies its own
    pairs with exact cosine, and only VERIFIED pairs leave the bucket
    (near-dup workloads emit orders of magnitude fewer verified pairs
    than candidates, so nothing quadratic ever shuffles).  The exchange
    cost is ``n_tables`` copies of the vector table through one sort
    shuffle; bucket count is bounded by ``2^planes × tables`` so the
    per-group dispatch is cheap.  No single-task merge, no broadcast.

    mode="join" — candidate pairs from :func:`band_bucket_pairs` are
    hash-joined back against the vector dataset and verified
    (:func:`cosine_verify_pairs`); the right shape when candidates are
    rare but buckets would not fit a group task.

    ``vectors_ref`` is accepted for backward compatibility and ignored
    (verification never needs a broadcast matrix).

    Recall < 1 by construction (tested against the brute kernel);
    precision = 1 because of the exact verification step.

    ``include_truncated=True`` adds a ``truncated`` bool column in bucket
    mode (did the pair's bucket hit the ``max_bucket`` cap — i.e. other
    pairs from that bucket were DROPPED), mirroring the tree-mode
    contract of :func:`band_bucket_pairs` so downstream consumers can
    detect the loss programmatically instead of scraping warning logs.
    """

    carry_vec = mode == "bucket"

    def keys_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = {
                "band": pa.array([], pa.int32()),
                "key": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            }
            if carry_vec:
                out["vec_bin"] = pa.array([], pa.binary())
            return pa.table(out)
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        vecs = flat.reshape(len(col), -1)
        ids = batch.column(id_col).to_numpy()
        bands = []
        keys = []
        for t in range(n_tables):
            k = hyperplane_keys(vecs, n_planes=n_planes, seed=11 + t)
            bands.append(np.full(len(ids), t, dtype=np.int32))
            keys.append(k.astype(np.int64))
        out = {
            "band": pa.array(np.concatenate(bands), pa.int32()),
            "key": pa.array(np.concatenate(keys), pa.int64()),
            "doc_id": pa.array(np.tile(ids, n_tables)),
        }
        if carry_vec:
            width = vecs.shape[1] * 8
            buf = pa.py_buffer(np.ascontiguousarray(vecs).tobytes())
            vb = pa.FixedSizeBinaryArray.from_buffers(pa.binary(width), len(vecs), [None, buf])
            out["vec_bin"] = pa.chunked_array([vb] * n_tables).combine_chunks().cast(pa.binary())
        return pa.table(out)

    banded = ds.map_batches(keys_batch, batch_format="pyarrow")

    if mode == "join":
        cand = band_bucket_pairs(banded, mode="groupby", max_bucket=max_bucket)
        return cosine_verify_pairs(
            cand, ds, threshold, vec_col=vec_col, id_col=id_col, num_partitions=num_partitions
        )

    # hash-partition the buckets: ONE kernel per partition verifies ALL
    # of its buckets (a bucket's rows always hash together), replacing
    # per-bucket map_groups dispatch (~0.5 ms x #buckets) with P group
    # tasks whose inner per-bucket matmuls run in a plain loop
    # banded is lazy (rows = n_vecs x n_tables); the input's row count —
    # free when ds is a fresh read/materialized — is a lower bound that
    # still scales the count with the corpus past the 256 cap
    n_part = _cluster_partitions(mult=2, cap=256, ds=ds)
    PMIX = np.uint64(0x9E3779B97F4A7C15)

    def add_part(b: pa.Table) -> pa.Table:
        h = (b.column("key").to_numpy().astype(np.uint64)
             + b.column("band").to_numpy().astype(np.uint64) * np.uint64(0x1F123BB5)) * PMIX
        h ^= h >> np.uint64(29)
        return b.append_column(
            "part", pa.array((h % np.uint64(n_part)).astype(np.int32), pa.int32())
        )

    def verify_partition(g):
        import pandas as pd

        g = g.sort_values(["band", "key"], kind="stable")
        band = g["band"].to_numpy()
        key = g["key"].to_numpy()
        ids = g["doc_id"].to_numpy()
        vec_bin = g["vec_bin"].to_numpy()
        seg = np.ones(len(g), bool)
        seg[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        bounds = np.concatenate([np.nonzero(seg)[0], [len(g)]])
        out_a, out_b, out_tr = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            uniq, first_idx = np.unique(ids[s:e], return_index=True)
            truncated = len(uniq) > max_bucket
            if truncated:  # pathological all-identical shard guard
                import logging

                logging.getLogger("georay.dedup").warning(
                    "embed LSH bucket truncated: %d unique vectors > max_bucket=%d "
                    "(band=%s key=%s) — verified pairs beyond the cap are dropped; "
                    "raise max_bucket or n_planes if this fires on real data",
                    len(uniq), max_bucket, band[s], key[s],
                )
                uniq = uniq[:max_bucket]
                first_idx = first_idx[:max_bucket]
            if len(uniq) < 2:
                continue
            raw = b"".join(vec_bin[s:e][i] for i in first_idx)
            vecs = np.frombuffer(raw, np.float64).reshape(len(uniq), -1)
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            unit = vecs / norms[:, None]
            sim = unit @ unit.T
            ia, ib = np.nonzero(np.triu(sim >= threshold, k=1))
            out_a.append(uniq[ia])
            out_b.append(uniq[ib])
            out_tr.append(np.full(len(ia), int(truncated), np.int32))
        if not out_a:
            return pd.DataFrame(
                {"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64),
                 "truncated": np.empty(0, np.int32)}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a).astype(np.int64),
             "doc_b": np.concatenate(out_b).astype(np.int64),
             "truncated": np.concatenate(out_tr)}
        )

    pairs = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: verify_partition(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )

    def _typed_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            out = {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            if include_truncated:
                out["truncated"] = pa.array([], pa.bool_())
            return pa.table(out)
        out = {"vec_a": b.column("doc_a"), "vec_b": b.column("doc_b")}
        if include_truncated:
            out["truncated"] = pc.cast(pc.greater(b.column("truncated"), 0), pa.bool_())
        return pa.table(out)

    from ray.data.aggregate import Max as _MaxAgg

    distinct = (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(_MaxAgg("truncated", alias_name="truncated"))
        .map_batches(_typed_pairs, batch_format="pyarrow")
    )
    return distinct


def _list_to_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:  # reshape(0, -1) is a numpy error; empty blocks pass through
        return np.empty((0, 0))
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _bin_to_matrix(col) -> np.ndarray:
    """fixed_size_binary column of packed float64 rows -> (n, d) matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    width = col.type.byte_width
    raw = b"".join(col.to_pylist())
    return np.frombuffer(raw, dtype=np.float64).reshape(len(col), width // 8)


def cosine_verify_pairs(pairs_ds, vectors_ds, threshold: float,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        num_partitions: int | None = None):
    """Exact-cosine verification of candidate (doc_a, doc_b) pairs via two
    distributed hash joins against the vector dataset — the scale-safe
    alternative to broadcasting the whole matrix (only candidate rows and
    their two vectors move; both joins partition on the pair ids).

    Vectors travel through the join as packed fixed-size binary (Arrow's
    hash join does not accept list columns as payload)."""
    # candidate tables are tiny relative to the corpus — pin them so the
    # count() below doesn't re-execute the candidate DAG for the join
    pairs_ds = pairs_ds.materialize()
    rows = pairs_ds.count()
    if rows == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())})
        )
    if num_partitions is None:
        num_partitions = _join_partitions(vectors_ds, extra_rows=rows)
    pairs_ds = _normalize_blocks(pairs_ds, rows)

    def pack(batch: pa.Table) -> pa.Table:
        mat = np.ascontiguousarray(_list_to_matrix(batch.column(vec_col)))
        width = mat.shape[1] * 8 if batch.num_rows else 8
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(mat), [None, pa.py_buffer(mat.tobytes())]
        )
        return pa.table({id_col: batch.column(id_col), "vec_bin": arr})

    packed = vectors_ds.map_batches(pack, batch_format="pyarrow")
    j1 = pairs_ds.join(
        packed, join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), right_on=(id_col,),
    ).map_batches(
        lambda b: b.rename_columns(
            ["vec_bin_a" if c == "vec_bin" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        packed, join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), right_on=(id_col,),
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        va = _bin_to_matrix(batch.column("vec_bin_a"))
        vb = _bin_to_matrix(batch.column("vec_bin"))
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        sim = np.einsum("ij,ij->i", va / na[:, None], vb / nb[:, None])
        keep = sim >= threshold
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        return pa.table({"vec_a": pa.array(da[keep]), "vec_b": pa.array(db[keep])})

    return j2.map_batches(score, batch_format="pyarrow")


def jaccard_verify_pairs(pairs_ds, docs_ds, k: int = 3, threshold_num: int = 1,
                         threshold_den: int = 2, id_col: str = "doc_id",
                         text_col: str = "text", num_partitions: int | None = None):
    """Exact k-shingle Jaccard verification of candidate pairs: keep
    (doc_a, doc_b) iff ``|Sa ∩ Sb| * den >= |Sa ∪ Sb| * num`` — i.e.
    J >= num/den decided in INTEGER arithmetic (float-free, so a DuckDB
    mirror computes the identical predicate).  Docs shorter than k tokens
    use their raw token set; two empty shingle sets count as a match
    (J := 1, reference semantics of :func:`jaccard_ngrams`).

    Scoring is fully vectorized: both sides' shingle sets are computed by
    the batched rolling-hash kernels (:func:`_shingle_hashes2`, 128-bit
    shingle identity so hash collisions are ~2^-128 — decision-identical
    to string sets), per-doc set dedup and pairwise intersection counts
    are lexsort + adjacent-compare + bincount over the whole batch.  No
    per-pair Python loop (the round-2 version looped :func:`set` ops per
    candidate).

    Texts are fetched by distributed hash join of the candidate ids
    against the documents dataset — the corpus is never broadcast.
    """
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        )
    pairs_ds = _normalize_blocks(pairs_ds, n_pairs)
    if num_partitions is None:
        num_partitions = _join_partitions(docs_ds, extra_rows=n_pairs)
    j1 = pairs_ds.join(
        docs_ds, join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), right_on=(id_col,),
    ).map_batches(
        lambda b: b.rename_columns(["text_a" if c == text_col else c for c in b.column_names]),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        docs_ds, join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), right_on=(id_col,),
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        n = batch.num_rows
        ha1, ha2, oa = _shingle_hashes2(batch.column("text_a").combine_chunks(), k)
        hb1, hb2, ob = _shingle_hashes2(batch.column(text_col).combine_chunks(), k)
        rng = np.arange(n, dtype=np.int64)
        ua1, ua2, seg_a = _segment_unique2(ha1, ha2, np.repeat(rng, np.diff(oa)))
        ub1, ub2, seg_b = _segment_unique2(hb1, hb2, np.repeat(rng, np.diff(ob)))
        ca = np.bincount(seg_a, minlength=n)
        cb = np.bincount(seg_b, minlength=n)
        # |Sa ∩ Sb| per pair: values unique within each side, so a value
        # seen twice in the pair's combined stream is in both sets
        v1 = np.concatenate([ua1, ub1])
        v2 = np.concatenate([ua2, ub2])
        s = np.concatenate([seg_a, seg_b])
        order = np.lexsort((v2, v1, s))
        v1, v2, s = v1[order], v2[order], s[order]
        dup = (s[1:] == s[:-1]) & (v1[1:] == v1[:-1]) & (v2[1:] == v2[:-1])
        inter = np.bincount(s[1:][dup], minlength=n)
        union = ca + cb - inter
        # union == 0 (both sets empty) -> 0 >= 0 -> match (J := 1)
        keep = inter * threshold_den >= union * threshold_num
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        return pa.table({"doc_a": pa.array(da[keep]), "doc_b": pa.array(db[keep])})

    return j2.map_batches(score, batch_format="pyarrow")


def connected_components(pairs_ds, num_partitions: int | None = None, max_iter: int = 32):
    """Candidate pairs -> (doc_id, survivor) per connected component: the
    dedup-resolution step after candidate generation (the survivor is the
    component-minimum id; every doc appearing in a pair gets a row).

    Distributed min-label propagation with SHORTCUTTING.  Per round:

    1. Delivery: union three message streams keyed by node — edge rows
       ``(key=u, dest=v)`` ("send u's label to v"), self rows
       ``(key=node, label=L)`` (the current label table), and shortcut
       rows ``(key=L[n], dest=n)`` ("send my label's label to me" — the
       pointer-doubling step, so chains converge in O(log diameter)
       rounds instead of one hop per round).  Messages are
       hash-partitioned on ``hash(key) % P`` and each partition runs ONE
       vectorized multi-node kernel (pandas C groupby + gather) — no
       per-node Python dispatch (the round-2 ``groupby(node).map_groups``
       paid ~0.5 ms per node per round).
    2. Reduce: ``groupby(node).aggregate(Min)`` — Ray's sort-based
       shuffle with a block-vectorized aggregate, again no per-group
       Python.

    Both shuffles move only (int64, int64) rows; per-round volume is
    constant (2|E| + 2|V| delivery rows).  Labels only originate from
    node ids inside the component (min over members seen so far), so the
    shortcut edges never cross components and the fixpoint is the exact
    component minimum.  Convergence is detected via the monotone
    non-increasing label sum over the deduped table; if ``max_iter``
    rounds pass without a fixpoint the function RAISES rather than
    returning non-minimal survivors (with shortcutting, 32 rounds covers
    component diameters ~2^32 — exhaustion means something is wrong).
    """
    import ray as _ray
    import ray.data as _rd
    from ray.data.aggregate import Min as _Min, Sum as _Sum

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "survivor": pa.array([], pa.int64())}
    )
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return _rd.from_arrow(empty)
    if num_partitions is None:
        # pairs are materialized: size to measured rows past the cap
        num_partitions = _cluster_partitions(cap=64, ds=pairs_ds)
    P = np.uint64(num_partitions)
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def _part_of(key: np.ndarray) -> np.ndarray:
        h = key.astype(np.uint64) * MIX
        h ^= h >> np.uint64(29)
        return (h % P).astype(np.int32)

    def both_dirs(b: pa.Table) -> pa.Table:
        da = b.column("doc_a").to_numpy()
        db = b.column("doc_b").to_numpy()
        return pa.table(
            {
                "u": pa.array(np.concatenate([da, db]), pa.int64()),
                "v": pa.array(np.concatenate([db, da]), pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def edge_msgs(b: pa.Table) -> pa.Table:
        # "node v asks for u's label": key=u, dest=v, no label payload
        u = b.column("u").to_numpy()
        return pa.table(
            {
                "key": b.column("u"),
                "dest": b.column("v"),
                "label": pa.array(np.full(len(u), -1, np.int64), pa.int64()),
                "part": pa.array(_part_of(u)),
            }
        )

    def label_msgs(b: pa.Table) -> pa.Table:
        # current label table, keyed by node; plus the shortcut request
        # (key=label, dest=node) for every row whose label differs from
        # the node (pointer-doubling: node learns L[L[node]] next round)
        node = b.column("node").to_numpy()
        label = b.column("label").to_numpy()
        sc = label != node
        key = np.concatenate([node, label[sc]])
        dest = np.concatenate([np.full(len(node), -1, np.int64), node[sc]])
        lab = np.concatenate([label, np.full(int(sc.sum()), -1, np.int64)])
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "dest": pa.array(dest, pa.int64()),
                "label": pa.array(lab, pa.int64()),
                "part": pa.array(_part_of(key)),
            }
        )

    def deliver(g):
        # one hash partition: vectorized per-key min label + gather to dests
        g = g.drop(columns=["part"])
        is_lab = (g["dest"].to_numpy() < 0)
        lab = g[is_lab]
        L = lab.groupby("key")["label"].min()
        dst = g[~is_lab]
        lk = L.reindex(dst["key"]).to_numpy()
        if lk.dtype.kind == "f":  # reindex produced NaNs: a key with no
            miss = np.isnan(lk)   # label row (defensive) labels itself
            lk[miss] = dst["key"].to_numpy()[miss]
        nodes = np.concatenate([dst["dest"].to_numpy(), L.index.to_numpy()])
        labels_out = np.concatenate([lk.astype(np.int64), L.to_numpy()])
        return pd.DataFrame(
            {"node": nodes.astype(np.int64), "label": labels_out.astype(np.int64)}
        )

    def _typed(b: pa.Table) -> pa.Table:
        # Ray's sort-based aggregate emits schemaless EMPTY blocks for
        # empty partitions — coerce every block to the declared schema
        if b.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        return b.select(["node", "label"])

    def init_labels(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy()
        v = b.column("v").to_numpy()
        return pa.table(
            {"node": pa.array(u, pa.int64()),
             "label": pa.array(np.minimum(u, v), pa.int64())}
        )

    # one row per node, label = min over incident edges (saves a round)
    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Min("label", alias_name="label"))
        .map_batches(_typed, batch_format="pyarrow")
        .materialize()
    )
    prev = labels.aggregate(_Sum("label"))["sum(label)"]
    for _ in range(max_iter):
        msgs = edges.map_batches(edge_msgs, batch_format="pyarrow").union(
            labels.map_batches(label_msgs, batch_format="pyarrow")
        )
        labels = (
            msgs.groupby("part")
            .map_groups(deliver, batch_format="pandas")
            .groupby("node")
            .aggregate(_Min("label", alias_name="label"))
            .map_batches(_typed, batch_format="pyarrow")
            .materialize()
        )
        # labels are per-node minima: the sum is monotone non-increasing
        # and equal sums mean every label is at its fixpoint
        cur = labels.aggregate(_Sum("label"))["sum(label)"]
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            f"with shortcutting this covers diameters ~2^{max_iter}; refusing "
            "to return non-minimal survivors (raise max_iter to override)"
        )
    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("node"), "survivor": b.column("label")}),
        batch_format="pyarrow",
    )


def apply_dedup(docs_ds, resolution_ds, id_col: str = "doc_id",
                num_partitions: int | None = None):
    """Corpus -> SURVIVORS only: drop every doc whose resolution row
    (:func:`connected_components` output) names a DIFFERENT survivor —
    the final step a training-data dedup actually ships.  Distributed
    LEFT ANTI hash join on the doc id: the corpus streams through the
    join partitioned by id; only the duplicate-id table (tiny next to
    the corpus — 8 bytes per dropped doc) shuffles with it.  Docs absent
    from the resolution table (never in any candidate pair) pass through
    untouched."""
    import ray
    import ray.data as _rd

    if num_partitions is None:
        # the LEFT ANTI join shuffles the whole corpus — size to its
        # row count (free plan metadata on a fresh read) past the cap
        num_partitions = _cluster_partitions(cap=64, ds=docs_ds)

    def dupes_only(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"dup_id": pa.array([], pa.int64())})
        keep = pc.not_equal(b.column("doc_id"), b.column("survivor"))
        return pa.table({"dup_id": b.column("doc_id").filter(keep)})

    dupes = resolution_ds.map_batches(dupes_only, batch_format="pyarrow").materialize()
    n_dupes = dupes.count()
    if n_dupes == 0:
        # Ray's hash join chokes on an empty build side; nothing to drop
        return docs_ds
    dupes = _normalize_blocks(dupes, n_dupes)
    return docs_ds.join(
        dupes, join_type="left_anti", num_partitions=num_partitions,
        on=(id_col,), right_on=("dup_id",),
    )


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


# ---------------------------------------------------------------------------
# cross-document duplicate spans (exact substring dedup at window level)
# ---------------------------------------------------------------------------

_SPAN_KEY = "georay-dupspan01"


def dup_span_partial(batch: pa.Table, w: int = 5, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Per-batch combine for duplicate-span detection: one
    (h, gram, doc_id, n_occ) row per distinct w-token window per document.

    Windows are the ' '-joined rolling w-grams of the whitespace tokens
    (the exact DuckDB mirror ``tk[i]||' '||...``); documents shorter than
    ``w`` tokens emit NOTHING (no raw-token fallback — a duplicate *span*
    needs a full window).  Grouping key is the 64-bit hash of the gram —
    at corpus scale the shuffle moves 8-byte keys plus one representative
    string per (window, doc), never positions; the ~1e-19 in-test hash
    collision rate is documented, not load-bearing (same contract as
    decontam matching).  Everything is one lexsort + difference masks; no
    per-document Python."""
    empty = pa.table(
        {
            "h": pa.array([], pa.int64()),
            "gram": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "n_occ": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    text = batch.column(text_col).combine_chunks()
    ids = batch.column(id_col).to_numpy()
    tok_np, offsets = _tokens_nonempty(text)
    if len(tok_np) == 0:
        return empty
    grams, goffs = _shingle_strings(tok_np, offsets, w)
    m = np.diff(offsets)
    counts = np.diff(goffs)
    seg = np.repeat(np.arange(len(m), dtype=np.int64), counts)
    keep = (m >= w)[seg]  # drop the short-doc raw-token fallback segments
    grams = grams[keep]
    seg = seg[keep]
    if len(grams) == 0:
        return empty
    h = pd.util.hash_array(grams, hash_key=_SPAN_KEY).astype(np.uint64)
    doc = ids[seg]
    order = np.lexsort((doc, h))
    hs, dc, gs = h[order], doc[order], grams[order]
    first = np.ones(len(hs), bool)
    first[1:] = (hs[1:] != hs[:-1]) | (dc[1:] != dc[:-1])
    starts = np.nonzero(first)[0]
    n_occ = np.diff(np.append(starts, len(hs)))
    return pa.table(
        {
            "h": pa.array(hs[starts].view(np.int64), pa.int64()),
            "gram": pa.array(gs[starts], pa.string()),
            id_col: pa.array(dc[starts]),
            "n_occ": pa.array(n_occ.astype(np.int64), pa.int64()),
        }
    )


def dup_spans(docs_ds, w: int = 5, min_docs: int = 2, text_col: str = "text",
              id_col: str = "doc_id"):
    """Cross-document duplicate w-token windows (the window-granular form
    of exact-substring training-data dedup): every window appearing in at
    least ``min_docs`` DISTINCT documents, with its document count and
    total occurrence count.

    Shape: per-batch combine (each document lives in one block, so
    partial rows are already per (window, doc)) -> ONE hash shuffle
    keyed by the window hash -> tiny vectorized filter.  Returns rows
    (gram, n_docs, n_occ)."""
    from ray.data.aggregate import Count, Max, Sum

    partials = docs_ds.map_batches(
        lambda b: dup_span_partial(b, w=w, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
    agg = partials.groupby("h").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_occ", alias_name="n_occ"),
        # all rows in a group share one gram string (64-bit-hash groups);
        # Max is just the cheapest way to carry it through the aggregate
        Max("gram", alias_name="gram"),
    )

    def finish(b: pa.Table) -> pa.Table:
        sel = pc.greater_equal(b.column("n_docs"), min_docs)
        out = b.filter(sel)
        return out.select(["gram", "n_docs", "n_occ"])

    return agg.map_batches(finish, batch_format="pyarrow")
