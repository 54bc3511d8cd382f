"""Sharded shared mutable SEEN-INDEX — the one operator family the
Dataset API genuinely cannot express (driver mandate: "drop to raw Ray
tasks / actors only where the Dataset API can't express the semantics,
e.g. a shared mutable index").

Online / streaming exact dedup: admit each document's content key
exactly once ACROSS the whole stream, as batches arrive — unlike the
batch `dedup_exact` groupby (which needs the full corpus before it can
pick survivors), the index answers during ingestion, so it serves
incremental loads ("is this page already in the corpus?") and
cross-pipeline admission control.

Scale design:
- The index is SHARDED over N actors by key hash; each shard holds a
  plain Python dict (C-level hashing, ~10M ops/s/actor).  The per-shard
  actor is the serialization point — that is the NATURE of a shared
  mutable index — and sharding provides the parallelism: size
  ``n_shards`` to the cluster and each admit() call carries a whole
  batch's keys for that shard (one RPC per shard per batch, never per
  row).
- RETRY SAFETY (at-least-once execution): Ray re-executes a map task
  whose worker died after its admit() RPCs committed but before its
  output block did.  A naive seen-SET would answer False on the retry
  and silently DROP every row of the block.  Admission is therefore
  recorded as ``key -> claim token`` where the token deterministically
  identifies the claiming batch (hash of the batch's ids+keys): a
  retried task re-presents the identical batch, gets the identical
  token, and receives the identical admission mask.  Corollary:
  re-running the byte-identical ingest over the same blocks replays the
  same admissions (idempotent), while a DIFFERENT load carrying the
  same content keys (new doc ids => new tokens) is rejected as
  duplicate — exactly-once per content key across distinct loads.
- WHICH duplicate survives depends on arrival order (first wins) and is
  therefore nondeterministic under distributed execution; the SET of
  admitted keys is exactly the distinct key set — the deterministic
  surface the driver oracle checks.  Pipelines that need a
  deterministic survivor use the batch `dedup_exact` path instead.
- At 10^12 docs the in-memory dict becomes a per-shard RocksDB/sorted
  run; the actor interface (admit(keys, token) -> bool mask) is the
  stable contract.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

import ray


@ray.remote
class SeenShard:
    """One shard of the seen-index: claim-or-check for a batch of keys,
    returning the is-mine mask.  Keys are opaque hashables."""

    def __init__(self):
        self._claims: dict = {}

    def admit(self, keys: list, token: int) -> np.ndarray:
        claims = self._claims
        out = np.empty(len(keys), dtype=bool)
        for i, k in enumerate(keys):
            prev = claims.setdefault(k, token)
            out[i] = prev == token
        return out

    def size(self) -> int:
        return len(self._claims)


def make_seen_index(n_shards: int | None = None):
    """Spawn the shard actors (once per pipeline; pass the handles into
    the stage closure — they serialize by reference)."""
    if n_shards is None:
        n_shards = max(2, min(int(ray.cluster_resources().get("CPU", 4)) // 4, 32))
    return [SeenShard.remote() for _ in range(n_shards)]


def _shard_of(key, n_shards: int) -> int:
    """Deterministic cross-process routing — Python's builtin hash() is
    per-process randomized for strings, which would send the same key to
    DIFFERENT shards from different workers and admit it twice."""
    if isinstance(key, int):
        return key % n_shards
    if isinstance(key, bytes):
        return zlib.crc32(key) % n_shards
    return zlib.crc32(str(key).encode()) % n_shards


def _batch_token(batch: pa.Table, keys: list, id_col: str) -> int:
    """64-bit deterministic identity of THIS batch's claim: a retried
    task (same block content) reproduces it; a different load carrying
    the same keys does not.

    The token MUST mix in a per-row identity column, not just the key
    list: two DIFFERENT batches with identical key lists (e.g. single-row
    batches of duplicate docs) would otherwise share a token and both be
    admitted — silent duplicate admission (r3 advisor finding).  Callers
    without a row-identity column cannot use claim-token retry safety and
    get a hard error rather than a silently weaker index."""
    if id_col not in batch.column_names:
        raise ValueError(
            f"StreamDedupStage requires id column {id_col!r} to build the "
            f"retry-safe claim token (batch has {batch.column_names}); "
            "pass id_col= naming a per-row identity column"
        )
    h = hashlib.md5()
    for k in keys:
        h.update(str(k).encode())
        h.update(b"\x1f")
    col = batch.column(id_col).combine_chunks()
    t = col.type
    if (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_boolean(t)
        or pa.types.is_temporal(t)
    ):
        # fixed-width: the numpy byte image is the logical content
        h.update(col.to_numpy(zero_copy_only=False).tobytes())
    else:
        # variable-width (string/binary ids): hash logical values, not
        # buffers — physical offsets may differ across reconstructions
        for v in col.to_pylist():
            h.update(str(v).encode())
            h.update(b"\x1e")
    return int.from_bytes(h.digest()[:8], "little")


class StreamDedupStage:
    """map_batches callable: pre-dedup the batch's keys (first in-batch
    occurrence wins), route unique keys to their shards, claim, and keep
    only rows whose key this batch claimed.  One admit RPC per touched
    shard per batch."""

    def __init__(self, shards, key_col: str = "h", id_col: str = "doc_id"):
        self.shards = shards
        self.key_col = key_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = batch.column(self.key_col).to_pylist()
        token = _batch_token(batch, keys, self.id_col)
        # in-batch pre-dedup: ship each distinct key once; only the FIRST
        # in-batch occurrence of an admitted key survives
        uniq, first_idx = np.unique(np.asarray(keys, dtype=object), return_index=True)
        n_shards = len(self.shards)
        shard_of = np.asarray([_shard_of(k, n_shards) for k in uniq], dtype=np.int64)
        admitted = np.zeros(len(uniq), dtype=bool)
        futures = []
        idx_per_shard = []
        for s in range(n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx) == 0:
                continue
            futures.append(
                self.shards[s].admit.remote([uniq[i] for i in idx], token)
            )
            idx_per_shard.append(idx)
        for idx, mask in zip(idx_per_shard, ray.get(futures)):
            admitted[idx] = mask
        keep = np.zeros(batch.num_rows, dtype=bool)
        keep[first_idx[admitted]] = True
        return batch.filter(pa.array(keep))
