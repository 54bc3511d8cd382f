"""BM25 search + benchmark decontamination (georay.search / georay.decontam)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from georay.decontam import contamination_batch, decontaminate, eval_shingle_set
from georay.search import K1, B, SCORE_SCALE, bm25_topk, corpus_stats


def _docs(texts, start_id=0):
    return pa.table(
        {
            "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


CORPUS = [
    "the cat sat on the mat",
    "the dog chased the cat around",
    "fish swim in the sea",
    "cat cat cat dog",
    "completely unrelated words here now",
]


class TestBM25:
    def test_stats(self):
        ds = ray.data.from_arrow(_docs(CORPUS))
        st = corpus_stats(ds, ["cat", "dog", "absent"])
        assert st["n_docs"] == 5
        assert st["n_tokens"] == sum(len(t.split()) for t in CORPUS)
        assert st["df"] == {"cat": 3, "dog": 2, "absent": 0}

    def test_scores_match_reference_formula(self):
        ds = ray.data.from_arrow(_docs(CORPUS))
        out = {
            r["doc_id"]: r["score_q"]
            for r in bm25_topk(ds, ["cat", "dog"], top=5).take_all()
        }
        n = len(CORPUS)
        dls = [len(t.split()) for t in CORPUS]
        avgdl = sum(dls) / n
        dfs = {"cat": 3, "dog": 2}
        for i, t in enumerate(CORPUS):
            expect = 0
            for term in ("cat", "dog"):
                tf = t.split().count(term)
                idf = math.log((n - dfs[term] + 0.5) / (dfs[term] + 0.5) + 1.0)
                s = idf * ((tf * (K1 + 1.0)) / (tf + K1 * ((1.0 - B) + B * (dls[i] / avgdl))))
                expect += math.floor(s * SCORE_SCALE + 0.5)
            assert out[i] == expect, f"doc {i}"

    def test_topk_order_and_limit(self):
        ds = ray.data.from_arrow(_docs(CORPUS))
        rows = bm25_topk(ds, ["cat"], top=3).take_all()
        assert len(rows) == 3
        scores = [r["score_q"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert rows[0]["doc_id"] == 3  # "cat cat cat dog" saturates highest

    def test_absent_terms_zero(self):
        ds = ray.data.from_arrow(_docs(CORPUS))
        rows = bm25_topk(ds, ["zzz"], top=5).take_all()
        assert all(r["score_q"] == 0 for r in rows)


class TestDecontam:
    def test_fragment_overlap(self):
        # doc 1 shares a full 3-gram window with eval doc 0; doc 2 doesn't
        ev = ray.data.from_arrow(_docs(["alpha beta gamma delta"], start_id=100))
        hashes = eval_shingle_set(ev, k=3)
        assert len(hashes) == 2  # two rolling 3-grams
        batch = _docs(
            ["x alpha beta gamma y", "alpha gamma beta x y", "beta gamma delta q"]
        )
        out = contamination_batch(batch, hashes, k=3)
        assert out.column("n_hits").to_pylist() == [1, 0, 1]
        assert out.column("contaminated").to_pylist() == [True, False, True]
        assert out.column("n_shingles").to_pylist() == [3, 3, 2]

    def test_short_doc_fallback_tokens(self):
        # < k tokens: shingles fall back to raw tokens (shared layout with
        # the MinHash kernels) — a shared token then counts as a hit
        ev = ray.data.from_arrow(_docs(["beta"], start_id=100))
        hashes = eval_shingle_set(ev, k=3)
        out = contamination_batch(_docs(["beta gamma"]), hashes, k=3)
        assert out.column("n_hits").to_pylist() == [1]

    def test_end_to_end_self_eval(self):
        docs = ray.data.from_arrow(_docs(CORPUS))
        ev = ray.data.from_arrow(_docs([CORPUS[0]]))  # eval = first doc
        rows = sorted(
            decontaminate(docs, ev, k=3).take_all(), key=lambda r: r["doc_id"]
        )
        assert rows[0]["contaminated"]  # the eval doc itself
        assert rows[0]["n_hits"] == rows[0]["n_shingles"]
        assert not rows[4]["contaminated"]

    def test_empty_eval_set(self):
        out = contamination_batch(_docs(["a b c d"]), np.empty(0, np.uint64), k=3)
        assert out.column("n_hits").to_pylist() == [0]
        assert out.column("contaminated").to_pylist() == [False]
