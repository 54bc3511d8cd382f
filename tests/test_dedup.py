"""Deduplication kernels: minhash signatures/LSH, simhash, jaccard, cosine."""

import numpy as np
import pyarrow as pa

from georay.dedup import (
    cosine_pairs,
    estimate_jaccard,
    hamming64,
    hyperplane_keys,
    jaccard_ngrams,
    lsh_band_keys,
    minhash_band_batch,
    minhash_signatures,
    simhash_batch,
)

DOC = (
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm "
    "windowsill and the birds sing in the garden under a bright morning sun"
)
NEAR = DOC.replace("morning", "evening")
FAR = (
    "completely different content about distributed dataflow engines processing parquet "
    "tables with vectorized arrow kernels across many worker nodes in a cluster"
)


def tbl(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())}
    )


class TestMinHash:
    def test_identical_docs_identical_signatures(self):
        sig = minhash_signatures(pa.array([DOC, DOC]))
        np.testing.assert_array_equal(sig[0], sig[1])

    def test_near_dup_high_estimate(self):
        sig = minhash_signatures(pa.array([DOC, NEAR, FAR]))
        assert estimate_jaccard(sig[0], sig[1]) > 0.6
        assert estimate_jaccard(sig[0], sig[2]) < 0.1

    def test_estimate_tracks_true_jaccard(self):
        true_j = jaccard_ngrams(DOC, NEAR)
        sig = minhash_signatures(pa.array([DOC, NEAR]))
        est = estimate_jaccard(sig[0], sig[1])
        assert abs(est - true_j) < 0.15  # 128 perms -> se ~ 0.04

    def test_band_keys_collide_for_near_dups(self):
        sig = minhash_signatures(pa.array([DOC, NEAR, FAR]))
        keys = lsh_band_keys(sig)
        shared_near = (keys[0] == keys[1]).sum()
        shared_far = (keys[0] == keys[2]).sum()
        assert shared_near >= 1
        assert shared_far == 0

    def test_band_batch_layout(self):
        out = minhash_band_batch(tbl([DOC, NEAR]), num_perm=64, bands=16)
        assert out.column_names == ["band", "key", "doc_id"]
        assert out.num_rows == 2 * 16

    def test_empty_doc(self):
        sig = minhash_signatures(pa.array(["", DOC]))
        assert (sig[0] == np.iinfo(np.uint64).max).all()


class TestSimHash:
    def test_identical_same_hash(self):
        out = simhash_batch(tbl([DOC, DOC]))
        s = out.column("simhash").to_pylist()
        assert s[0] == s[1]

    def test_near_dup_small_hamming(self):
        out = simhash_batch(tbl([DOC, NEAR, FAR]))
        s = np.asarray(out.column("simhash").to_pylist(), dtype=np.int64)
        d_near = hamming64(s[0:1], s[1:2])[0]
        d_far = hamming64(s[0:1], s[2:3])[0]
        assert d_near < d_far
        assert d_near <= 12

    def test_block_keys_cover_hash(self):
        out = simhash_batch(tbl([DOC]))
        s = np.array(out.column("simhash").to_pylist(), dtype=np.int64).view(np.uint64)[0]
        blocks = [out.column(f"blk{i}").to_pylist()[0] for i in range(4)]
        recomposed = np.uint64(0)
        for i, b in enumerate(blocks):
            recomposed |= np.uint64(b) << np.uint64(16 * i)
        assert recomposed == s


class TestEmbeddingDedup:
    def test_cosine_pairs_threshold(self):
        vecs = np.array([[1.0, 0.0], [0.99, 0.14], [0.0, 1.0]])
        out = cosine_pairs(vecs, np.array([10, 11, 12]), 0.9)
        pairs = list(zip(out.column("vec_a").to_pylist(), out.column("vec_b").to_pylist()))
        assert pairs == [(10, 11)]

    def test_hyperplane_buckets_group_identical(self):
        rng = np.random.default_rng(0)
        v = rng.standard_normal((20, 16))
        keys = hyperplane_keys(v)
        keys2 = hyperplane_keys(v.copy())
        np.testing.assert_array_equal(keys, keys2)
        assert hyperplane_keys(v[:1])[0] == keys[0]


class TestEmbedLshPipeline:
    def test_recall_vs_brute(self, ray_session):
        import pyarrow.parquet as pq
        import ray as _ray
        import ray.data

        from georay.ann import _to_matrix
        from georay.dedup import cosine_pairs, embed_lsh_pairs

        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"])
        vecs = _to_matrix(t.column("embedding"))
        ids = t.column("vec_id").to_numpy()
        brute = cosine_pairs(vecs, ids, 0.30)
        brute_set = set(zip(brute.column("vec_a").to_pylist(), brute.column("vec_b").to_pylist()))

        ref = _ray.put({"ids": ids, "vectors": vecs})
        ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"])
        got = embed_lsh_pairs(ds, ref, threshold=0.30, n_planes=4).to_pandas()
        got_set = set(zip(got["vec_a"], got["vec_b"]))

        assert got_set <= brute_set  # precision 1 (exact verification)
        recall = len(got_set) / max(1, len(brute_set))
        # cos=0.30 is the hard regime for hyperplane LSH: collision prob
        # ~0.6^4 per table -> expect roughly 2/3 recall over 8 tables
        assert recall >= 0.4

    def test_high_recall_on_planted_near_dups(self, ray_session):
        import pyarrow as pa
        import ray as _ray
        import ray.data

        from georay.dedup import cosine_pairs, embed_lsh_pairs

        rng = np.random.default_rng(5)
        base = rng.standard_normal((100, 32))
        # plant a near-duplicate of each base vector (cos > ~0.98)
        dups = base + 0.1 * rng.standard_normal((100, 32))
        vecs = np.vstack([base, dups])
        ids = np.arange(200, dtype=np.int64)
        brute = cosine_pairs(vecs, ids, 0.9)
        brute_set = set(zip(brute.column("vec_a").to_pylist(), brute.column("vec_b").to_pylist()))
        assert len(brute_set) >= 90  # the planted pairs exist

        tbl = pa.table({"vec_id": ids, "embedding": pa.array(list(vecs.astype(np.float32)))})
        ds = ray.data.from_arrow(tbl)
        ref = _ray.put({"ids": ids, "vectors": vecs})
        got = embed_lsh_pairs(ds, ref, threshold=0.9).to_pandas()
        got_set = set(zip(got["vec_a"], got["vec_b"]))
        assert got_set <= brute_set
        recall = len(got_set) / len(brute_set)
        assert recall >= 0.9  # default 12 planes x 8 tables at cos>0.9


class TestBatchCompositionIndependence:
    """Regression: a document's signature must not depend on what follows
    it in the batch (the reduceat trailing-empty-segment bug)."""

    def test_minhash_stable_with_trailing_empty(self):
        a = minhash_signatures(pa.array([DOC]))
        b = minhash_signatures(pa.array([DOC, "   "]))
        np.testing.assert_array_equal(a[0], b[0])

    def test_simhash_stable_with_trailing_null(self):
        s1 = simhash_batch(tbl([DOC])).column("simhash").to_pylist()[0]
        t2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                       "text": pa.array([DOC, None], pa.string())})
        s2 = simhash_batch(t2).column("simhash").to_pylist()[0]
        assert s1 == s2

    def test_md5_batch_null_text(self):
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["x", None], pa.string())})
        from georay.dedup import md5_batch
        out = md5_batch(t)
        assert out.num_rows == 2
        hs = out.column("h").to_pylist()
        assert hs[0] != hs[1]


class TestConnectedComponents:
    def test_chain_and_disjoint(self, ray_session):
        import pyarrow as pa
        import ray.data

        from georay.dedup import connected_components

        # chain 1-2-3-4 (diameter 3) + pair (10, 11) + isolated docs absent
        pairs = pa.table({
            "doc_a": pa.array([1, 2, 3, 10], pa.int64()),
            "doc_b": pa.array([2, 3, 4, 11], pa.int64()),
        })
        out = connected_components(ray.data.from_arrow(pairs)).to_pandas()
        got = dict(zip(out.doc_id, out.survivor))
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_empty(self, ray_session):
        import pyarrow as pa
        import ray.data

        from georay.dedup import connected_components

        empty = pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        out = connected_components(ray.data.from_arrow(empty)).to_pandas()
        assert len(out) == 0

    def test_long_chain_converges_with_shortcutting(self, ray_session):
        """A 200-node chain (diameter 199) must converge well inside
        max_iter=10 — one-hop-per-round propagation could not (the round-2
        cap silently returned non-minimal labels on diameter > max_iter);
        the label-shortcut (pointer-doubling) edges give O(log d) rounds."""
        import pyarrow as pa
        import ray.data

        from georay.dedup import connected_components

        n = 200
        pairs = pa.table({
            "doc_a": pa.array(np.arange(n - 1), pa.int64()),
            "doc_b": pa.array(np.arange(1, n), pa.int64()),
        })
        out = connected_components(ray.data.from_arrow(pairs), max_iter=10).to_pandas()
        assert len(out) == n
        assert (out.survivor == 0).all()

    def test_nonconvergence_raises(self, ray_session):
        """max_iter exhaustion must raise, not silently return non-minimal
        survivors (ADVICE r2)."""
        import pyarrow as pa
        import pytest
        import ray.data

        from georay.dedup import connected_components

        pairs = pa.table({
            "doc_a": pa.array([1, 2], pa.int64()),
            "doc_b": pa.array([2, 3], pa.int64()),
        })
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(ray.data.from_arrow(pairs), max_iter=0)


class TestSimhashMultiIndex:
    def test_pigeonhole_recall_one(self):
        """Any <=3-bit flip of a 64-bit hash must share at least one
        table key with the original — the multi-index recall guarantee."""
        from georay.dedup import simhash_index_keys

        rng = np.random.default_rng(9)
        base = rng.integers(0, 1 << 63, size=50, dtype=np.uint64)
        flipped = base.copy()
        for i in range(len(base)):
            bits = rng.choice(64, size=rng.integers(1, 4), replace=False)
            for b in bits:
                flipped[i] ^= np.uint64(1) << np.uint64(b)
        keys_a = dict(simhash_index_keys(base))
        keys_b = dict(simhash_index_keys(flipped))
        shared = np.zeros(len(base), bool)
        for t in keys_a:
            shared |= keys_a[t] == keys_b[t]
        assert shared.all()

    def test_key_width_exceeds_16_bits(self):
        """The 6/3 index keys span ~32 bits — bucket cardinality must not
        cap at 2^16 like the round-2 4x16 scheme."""
        from georay.dedup import simhash_index_keys

        rng = np.random.default_rng(10)
        u = rng.integers(0, np.iinfo(np.uint64).max, size=5000, dtype=np.uint64)
        max_key = max(int(k.max()) for _, k in simhash_index_keys(u))
        assert max_key > (1 << 16)

    def test_deterministic(self):
        from georay.dedup import simhash_index_keys

        u = np.array([12345678901234567, 98765432109876543], dtype=np.uint64)
        a = [(t, k.tolist()) for t, k in simhash_index_keys(u)]
        b = [(t, k.tolist()) for t, k in simhash_index_keys(u.copy())]
        assert a == b
        assert len(a) == 20  # C(6, 3) tables


class TestPairSchemaAndTruncationObservability:
    def test_empty_pair_result_keeps_schema(self, ray_session):
        """Regression (r3 review): pyarrow group_by on an empty table
        yields 0-chunk columns Ray treats as schemaless — an all-singleton
        corpus must still return typed doc_a/doc_b columns."""
        import pyarrow as pa
        import ray.data

        from georay.dedup import simhash_pairs

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["aaa bbb ccc", "ddd eee fff ggg",
                              "hhh iii jjj kkk lll", "mmm nnn ooo ppp"], pa.string()),
        })
        out = simhash_pairs(ray.data.from_arrow(t))
        # Dataset.to_pandas() drops columns for ANY 0-row dataset (Ray
        # quirk), so the schema contract is asserted on the dataset
        assert out.schema().names == ["doc_a", "doc_b"]
        assert out.count() == 0

    def test_truncation_reported_even_when_filter_rejects_all(self, ray_session):
        """Regression (r3 review): a truncated bucket whose surviving
        pairs all fail inline verification must still report truncation
        (marker row) — zero would falsely claim the recall-1 guarantee
        held."""
        import pyarrow as pa
        import ray.data

        from georay.dedup import band_bucket_pairs

        n = 10
        t = pa.table({
            "band": pa.array([0] * n, pa.int32()),
            "key": pa.array([7] * n, pa.int64()),
            "doc_id": pa.array(range(n), pa.int64()),
            "sim": pa.array(range(n), pa.int64()),
        })
        out = band_bucket_pairs(
            ray.data.from_arrow(t), max_bucket=4,
            payload_col="sim", pair_filter=lambda a, b: np.zeros(len(a), bool),
        ).to_pandas()
        # all pairs rejected, bucket truncated -> exactly the marker row
        assert len(out) == 1
        assert out.doc_a.iloc[0] == -1 and bool(out.truncated.iloc[0])

    def test_join_mode_thins_hot_bucket_with_marker(self, ray_session):
        """Regression (r3 review x2): join mode must honour max_bucket —
        a hot bucket is THINNED to ~max_bucket hash-chosen members (its
        cluster stays linked via the retained pairs, which are flagged
        truncated) rather than expanded quadratically OR dropped outright
        (dropping silently lost whole duplicate clusters)."""
        import pyarrow as pa
        import ray.data

        from georay.dedup import band_bucket_pairs

        hot = 40
        t = pa.table({
            "band": pa.array([0] * hot + [1, 1], pa.int32()),
            "key": pa.array([7] * hot + [9, 9], pa.int64()),
            "doc_id": pa.array(list(range(hot)) + [100, 101], pa.int64()),
        })
        out = band_bucket_pairs(
            ray.data.from_arrow(t), mode="join", max_bucket=4
        ).to_pandas()
        real = out[out.doc_a >= 0]
        markers = out[out.doc_a < 0]
        cold = real[~real.truncated]
        thinned = real[real.truncated]
        assert set(zip(cold.doc_a, cold.doc_b)) == {(100, 101)}
        # the hot cluster survives partially: >=1 pair among retained
        # members, far fewer than the full C(40,2)=780 expansion
        assert 1 <= len(thinned) < 100
        assert thinned.doc_a.max() < hot and thinned.doc_b.max() < hot
        assert len(markers) == 1 and bool(markers.truncated.iloc[0])


class TestMaxBucketNone:
    def test_all_modes_accept_none(self, ray_session):
        """Regression (r3 review): the docs advertise max_bucket=None to
        disable the cap, but tree/groupby crashed with TypeError on the
        None comparison."""
        import pyarrow as pa
        import ray.data

        from georay.dedup import band_bucket_pairs

        t = pa.table({
            "band": pa.array([0] * 6, pa.int32()),
            "key": pa.array([7] * 6, pa.int64()),
            "doc_id": pa.array(range(6), pa.int64()),
        })
        want = {(a, b) for a in range(6) for b in range(6) if a < b}
        for mode in ("tree", "groupby", "join", "auto"):
            out = band_bucket_pairs(
                ray.data.from_arrow(t), mode=mode, max_bucket=None
            ).to_pandas()
            assert set(zip(out.doc_a, out.doc_b)) == want, mode
            assert not out.truncated.any(), mode


class TestJaccardVectorized:
    def test_matches_scalar_kernel(self, ray_session):
        """The vectorized integer-Jaccard verify must agree with the
        scalar jaccard_ngrams reference on every candidate pair."""
        import pyarrow as pa
        import ray.data

        from georay.dedup import jaccard_ngrams, jaccard_verify_pairs

        texts = [DOC, NEAR, FAR, "", "one two", DOC + " extra tail words here",
                 "one two", "a b c d e f g h"]
        ids = list(range(len(texts)))
        docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})
        cand = [(a, b) for a in ids for b in ids if a < b]
        pairs = pa.table({"doc_a": pa.array([a for a, _ in cand], pa.int64()),
                          "doc_b": pa.array([b for _, b in cand], pa.int64())})
        out = jaccard_verify_pairs(
            ray.data.from_arrow(pairs), ray.data.from_arrow(docs),
            k=3, threshold_num=1, threshold_den=2,
        ).to_pandas()
        got = set(zip(out.doc_a, out.doc_b))
        want = {(a, b) for a, b in cand if jaccard_ngrams(texts[a], texts[b]) >= 0.5}
        assert got == want


class TestTextKeyIndependence:
    def test_two_keys_differ(self):
        # regression: [:16] slicing once collapsed both hash keys into one,
        # silently reducing the 128-bit dedup key to 64 bits
        import pyarrow as pa

        from georay.dedup import text_key_batch

        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["alpha", "beta"], pa.string())})
        out = text_key_batch(t)
        h1 = out.column("h1").to_pylist()
        h2 = out.column("h2").to_pylist()
        assert h1 != h2  # independent hash functions


class TestBandBucketModes:
    def test_all_modes_agree(self, ray_session):
        import pyarrow as pa
        import ray.data

        from georay.dedup import band_bucket_pairs

        rng = np.random.default_rng(2)
        n = 200
        t = pa.table({
            "band": pa.array(rng.integers(0, 4, n), pa.int32()),
            "key": pa.array(rng.integers(0, 20, n), pa.int64()),
            "doc_id": pa.array(rng.integers(0, 60, n), pa.int64()),
        })
        results = {}
        for mode in ("tree", "groupby", "join", "auto"):
            ds = ray.data.from_arrow(t)
            out = band_bucket_pairs(ds, mode=mode).to_pandas()
            results[mode] = set(zip(out.doc_a, out.doc_b))
        assert results["tree"] == results["groupby"] == results["join"] == results["auto"]
        assert len(results["tree"]) > 0

    def test_auto_routes_to_join_above_limit(self, ray_session):
        """auto with a tiny tree_row_limit must take the join path and
        still produce the same pair set as tree."""
        import pyarrow as pa
        import ray.data

        from georay.dedup import band_bucket_pairs

        rng = np.random.default_rng(3)
        n = 300
        t = pa.table({
            "band": pa.array(rng.integers(0, 4, n), pa.int32()),
            "key": pa.array(rng.integers(0, 40, n), pa.int64()),
            "doc_id": pa.array(rng.integers(0, 80, n), pa.int64()),
        })
        tree = band_bucket_pairs(ray.data.from_arrow(t), mode="tree").to_pandas()
        auto = band_bucket_pairs(
            ray.data.from_arrow(t), mode="auto", tree_row_limit=1
        ).to_pandas()
        assert set(zip(auto.doc_a, auto.doc_b)) == set(zip(tree.doc_a, tree.doc_b))


class TestApplyDedup:
    def test_drops_non_survivors_keeps_rest(self, ray_session):
        import pyarrow as pa
        import ray.data

        from georay.dedup import apply_dedup

        docs = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64())})
        res = pa.table({
            "doc_id": pa.array([1, 2, 4], pa.int64()),
            "survivor": pa.array([1, 1, 4], pa.int64()),
        })
        out = apply_dedup(
            ray.data.from_arrow(docs), ray.data.from_arrow(res)
        ).to_pandas()
        # 2 is a duplicate of 1; 1 and 4 are survivors; 3, 5 untouched
        assert sorted(out.doc_id) == [1, 3, 4, 5]

    def test_empty_resolution_passthrough(self, ray_session):
        import pyarrow as pa
        import ray.data

        from georay.dedup import apply_dedup

        docs = pa.table({"doc_id": pa.array([7, 8], pa.int64())})
        res = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "survivor": pa.array([], pa.int64()),
        })
        out = apply_dedup(
            ray.data.from_arrow(docs), ray.data.from_arrow(res)
        ).to_pandas()
        assert sorted(out.doc_id) == [7, 8]

    def test_resolution_with_schemaless_empty_blocks(self, ray_session):
        """Regression: a resolution table produced by a sort aggregate
        carries SCHEMALESS empty blocks for empty partitions, which Ray's
        hash join rejects ('no match for key field dup_id') — apply_dedup
        must normalize the build side."""
        import pyarrow as pa
        import ray.data
        from ray.data.aggregate import Min

        from georay.dedup import apply_dedup

        # groupby over 8 partitions of 3 rows -> mostly-empty partitions
        t = pa.table({"node": pa.array([2, 4, 5], pa.int64()),
                      "label": pa.array([1, 4, 4], pa.int64())})
        res = (
            ray.data.from_arrow(t).repartition(8)
            .groupby("node").aggregate(Min("label", alias_name="label"))
            .map_batches(
                lambda b: pa.table({"doc_id": b.column("node"), "survivor": b.column("label")})
                if b.num_rows else b,
                batch_format="pyarrow",
            )
        )
        docs = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64())})
        out = apply_dedup(ray.data.from_arrow(docs), res).to_pandas()
        # 2 (survivor 1) and 5 (survivor 4) are duplicates; 4 survives itself
        assert sorted(out.doc_id) == [1, 3, 4]


class TestDupSpans:
    def test_partial_kernel(self):
        import pyarrow as pa

        from georay.dedup import dup_span_partial

        b = pa.table({"doc_id": [1, 2, 3, 4], "text": [
            "a b c d e f g",
            "x a b c d e f",
            "too short",
            "a b c d e x y z a b c d e x",
        ]})
        t = dup_span_partial(b, w=5).to_pandas()
        # the shared window appears in docs 1, 2 and twice in doc 4
        rows = t[t.gram == "a b c d e"].sort_values("doc_id")
        assert list(rows.doc_id) == [1, 2, 4]
        assert list(rows.n_occ) == [1, 1, 2]
        # short docs emit nothing (no raw-token fallback for spans)
        assert (t.doc_id != 3).all()
        # every row is a full 5-token window
        assert (t.gram.str.split(" ").str.len() == 5).all()

    def test_empty_and_all_short(self):
        import pyarrow as pa

        from georay.dedup import dup_span_partial

        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())})
        assert dup_span_partial(empty, w=5).num_rows == 0
        short = pa.table({"doc_id": [1], "text": ["a b"]})
        t = dup_span_partial(short, w=5)
        assert t.num_rows == 0 and t.column_names == ["h", "gram", "doc_id", "n_occ"]

    def test_dataset_end_to_end(self, ray_session):
        import pyarrow as pa
        import ray.data

        from georay.dedup import dup_spans

        docs = pa.table({"doc_id": list(range(6)), "text": [
            "the quick brown fox jumps over it",
            "a quick brown fox jumps over me",
            "unrelated words entirely here now ok",
            "the quick brown fox jumps again too",
            "tiny",
            "the quick brown fox jumps over it",  # exact dup of doc 0
        ]})
        out = dup_spans(ray.data.from_arrow(docs).repartition(3), w=5).to_pandas()
        got = {r.gram: (r.n_docs, r.n_occ) for r in out.itertuples()}
        # "quick brown fox jumps over" in docs 0, 1, 5
        assert got["quick brown fox jumps over"] == (3, 3)
        # "the quick brown fox jumps" in docs 0, 3, 5
        assert got["the quick brown fox jumps"] == (3, 3)
        # nothing with fewer than 2 docs leaks through
        assert (out.n_docs >= 2).all()


class TestClusterPartitionsRowsAware:
    def test_scales_past_cap_with_known_rows(self, ray_session):
        import ray.data

        from georay.dedup import _cluster_partitions

        ds = ray.data.range(100_000).materialize()
        p = _cluster_partitions(cap=32, ds=ds, rows_per_partition=100)
        assert p == 1000  # ceil(100k/100) > cap

    def test_small_data_keeps_cap_behavior(self, ray_session):
        import ray.data

        from georay.dedup import _cluster_partitions

        ds = ray.data.range(10).materialize()
        assert _cluster_partitions(cap=32, ds=ds) == _cluster_partitions(cap=32)

    def test_unknown_rows_unchanged(self, ray_session):
        import ray.data

        from georay.dedup import _cluster_partitions

        lazy = ray.data.range(1000).map_batches(lambda b: b)  # count unknown
        assert _cluster_partitions(cap=32, ds=lazy) == _cluster_partitions(cap=32)
