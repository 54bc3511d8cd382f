"""Sharded shared mutable seen-index (raw-actor escape hatch): online
exact dedup must admit each key exactly once ACROSS batches and workers,
and stay correct under at-least-once task re-execution."""

import numpy as np
import pyarrow as pa


class TestStreamDedup:
    def test_exactly_once_across_batches(self, ray_session):
        import ray.data

        from georay.state.seen_index import StreamDedupStage, make_seen_index

        rng = np.random.default_rng(3)
        n, distinct = 2000, 137
        keys = [f"key-{i:05d}" for i in rng.integers(0, distinct, n)]
        t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                      "h": pa.array(keys)})
        shards = make_seen_index(n_shards=3)
        out = (
            ray.data.from_arrow(t)
            .repartition(16)  # spread duplicates across many blocks/workers
            .map_batches(StreamDedupStage(shards, key_col="h"), batch_format="pyarrow")
            .to_pandas()
        )
        assert len(out) == distinct
        assert set(out.h) == set(keys)

    def test_retry_replay_is_idempotent(self, ray_session):
        """Regression (r3 review): Ray re-executes a task whose worker
        died after its admit RPCs committed; the retried (byte-identical)
        batch must receive the SAME admission mask, not all-False — a
        seen-SET silently dropped every row of retried blocks."""
        from georay.state.seen_index import StreamDedupStage, make_seen_index

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "h": pa.array(["a", "b", "a"])})
        shards = make_seen_index(n_shards=2)
        stage = StreamDedupStage(shards, key_col="h")
        first = stage(t)
        replay = stage(t)  # identical batch = what a task retry presents
        assert first.num_rows == 2  # a (first occurrence) + b
        assert replay.num_rows == 2
        assert first.equals(replay)

    def test_different_load_with_same_keys_rejected(self, ray_session):
        """A NEW load (different doc ids) carrying already-admitted
        content keys is a duplicate, not a replay — rejected."""
        from georay.state.seen_index import StreamDedupStage, make_seen_index

        shards = make_seen_index(n_shards=2)
        stage = StreamDedupStage(shards, key_col="h")
        t1 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                       "h": pa.array(["a", "b"])})
        t2 = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                       "h": pa.array(["a", "b"])})
        assert stage(t1).num_rows == 2
        assert stage(t2).num_rows == 0

    def test_in_batch_duplicates_keep_first_occurrence(self, ray_session):
        from georay.state.seen_index import StreamDedupStage, make_seen_index

        t = pa.table({"doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                      "h": pa.array(["x", "x", "y", "x"])})
        shards = make_seen_index(n_shards=2)
        out = StreamDedupStage(shards, key_col="h")(t)
        assert out.column("doc_id").to_pylist() == [10, 12]

    def test_identical_key_lists_from_different_batches_not_both_admitted(
        self, ray_session
    ):
        """Regression (r3 advisor): two DIFFERENT batches with identical
        key lists (single-row batches of duplicate docs) must not share a
        claim token — the second is a duplicate, not a retry replay."""
        from georay.state.seen_index import StreamDedupStage, make_seen_index

        shards = make_seen_index(n_shards=2)
        stage = StreamDedupStage(shards, key_col="h")
        b1 = pa.table({"doc_id": pa.array([1], pa.int64()), "h": pa.array(["k"])})
        b2 = pa.table({"doc_id": pa.array([2], pa.int64()), "h": pa.array(["k"])})
        assert stage(b1).num_rows == 1
        assert stage(b2).num_rows == 0

    def test_string_id_column_token_is_content_based(self, ray_session):
        """Variable-width id columns hash logical values (buffer layout is
        not stable across block reconstructions): same content replays,
        different ids reject."""
        from georay.state.seen_index import StreamDedupStage, make_seen_index

        shards = make_seen_index(n_shards=2)
        stage = StreamDedupStage(shards, key_col="h", id_col="url")
        b1 = pa.table({"url": pa.array(["http://a"]), "h": pa.array(["k"])})
        b2 = pa.table({"url": pa.array(["http://b"]), "h": pa.array(["k"])})
        assert stage(b1).num_rows == 1
        assert stage(b1).num_rows == 1  # retry replay of the same batch
        assert stage(b2).num_rows == 0

    def test_missing_id_column_raises(self, ray_session):
        """No id column = no retry-safe token; hard error beats a silently
        duplicate-admitting index."""
        import pytest

        from georay.state.seen_index import StreamDedupStage, make_seen_index

        shards = make_seen_index(n_shards=2)
        stage = StreamDedupStage(shards, key_col="h")
        t = pa.table({"h": pa.array(["a", "b"])})
        with pytest.raises(ValueError, match="id column"):
            stage(t)

    def test_routing_is_process_stable(self):
        """Builtin hash() is per-process randomized for strings — routing
        must come from a deterministic hash or the same key admits twice
        from different workers."""
        import zlib

        from georay.state.seen_index import _shard_of

        assert _shard_of("key-00001", 7) == _shard_of("key-00001", 7)
        assert _shard_of("abc", 5) == zlib.crc32(b"abc") % 5
        assert _shard_of(12345, 7) == 12345 % 7
        assert _shard_of(b"xy", 3) == zlib.crc32(b"xy") % 3
