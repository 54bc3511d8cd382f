"""Text-analysis kernels: counts, quality, language ID, fingerprints."""

import numpy as np
import pyarrow as pa

from georay.text import (
    detect_language,
    fingerprint_batch,
    langid_batch,
    quality_batch,
    token_counts,
)


def tbl(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})


class TestTokenCounts:
    def test_basic(self):
        c = token_counts(pa.array(["a b  c", "", "one, two!"]))
        np.testing.assert_array_equal(c["n_tokens"], [3, 0, 2])
        np.testing.assert_array_equal(c["n_punct"], [0, 0, 2])
        np.testing.assert_array_equal(c["n_chars"], [6, 0, 9])

    def test_bpe_splits_mixed(self):
        c = token_counts(pa.array(["abc123-def"]))
        assert c["n_bpe"][0] == 4  # abc | 123 | - | def

    def test_stopwords_case_insensitive(self):
        c = token_counts(pa.array(["The cat AND the dog"]))
        assert c["n_stop"][0] == 3  # the, and, the


class TestQuality:
    def test_deterministic_and_bounded(self):
        out = quality_batch(tbl(["the quick brown fox jumps over the lazy dog", "!!!!"]))
        bp = out.column("quality_bp").to_pylist()
        assert 0 <= bp[0] <= 10000 and 0 <= bp[1] <= 10000
        assert bp[0] > bp[1]  # stopwordy prose beats punctuation soup

    def test_empty_text(self):
        out = quality_batch(tbl([""]))
        assert out.num_rows == 1


class TestLangId:
    def test_clear_cases(self):
        langs = detect_language(
            pa.array(
                [
                    "the cat and the dog that was in it",
                    "der Hund und die Katze ist nicht mit mir",
                    "le chat et la maison est dans les arbres",
                    "el perro y la casa es una de las cosas que",
                    "这是一个中文文档",
                    "zzz qqq xxx",
                ]
            )
        )
        assert list(langs) == ["en", "de", "fr", "es", "zh", "und"]

    def test_batch_kernel_shape(self):
        out = langid_batch(tbl(["the of and", "und der die"]))
        assert out.column_names == ["doc_id", "lang_pred"]


class TestFingerprint:
    def test_identical_docs_same_digest(self):
        out = fingerprint_batch(tbl(["alpha beta gamma delta epsilon zeta"] * 2))
        d = out.column("fp_digest").to_pylist()
        assert d[0] == d[1]

    def test_different_docs_differ(self):
        out = fingerprint_batch(
            tbl(["alpha beta gamma delta epsilon zeta", "one two three four five six"])
        )
        d = out.column("fp_digest").to_pylist()
        assert d[0] != d[1]

    def test_near_dup_shares_fingerprints(self):
        # winnowing: one changed token leaves most window minima intact
        a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
        b = a.replace("w9", "CHANGED")
        out = fingerprint_batch(tbl([a, b]))
        assert out.column("fp_count").to_pylist()[0] > 0


class TestNullAndBatchIndependence:
    def test_langid_stable_with_trailing_null(self):
        a = detect_language(pa.array(["quick brown fox the"]))
        b = detect_language(pa.array(["quick brown fox the", None]))
        assert a[0] == b[0] == "en"

    def test_token_counts_null_text_zero(self):
        c = token_counts(pa.array(["hello world", None]))
        assert c["n_tokens"][1] == 0 and c["n_chars"][1] == 0

    def test_quality_null_text(self):
        out = quality_batch(tbl(["ok text here", None]))
        bp = out.column("quality_bp").to_pylist()
        assert 0 <= bp[1] <= 10000
