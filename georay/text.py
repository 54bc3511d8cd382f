"""Text-analysis kernels for training-data pipelines (SURVEY-mandated
large-scale extras): token counting, quality metrics, language ID,
document fingerprinting.

All kernels are vectorized (pyarrow C++ regex / numpy); per-document
Python loops appear only where variable-length token structure forces
them, and then only over flattened arrays with ``reduceat``-style
offsets.  Counting kernels have exact DuckDB mirrors (documented inline)
so they are oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: token = maximal run of non-whitespace; SQL mirror:
#:   length(regexp_extract_all(text, '\S+'))
TOKEN_RE = r"\S+"
#: BPE-ish subword splitter: runs of letters, digits, or single punctuation
#: (a deterministic approximation of byte-pair pretokenization); SQL mirror
#: uses the identical RE2 pattern.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.,;:!?]"
STOPWORDS = (
    "the a an and or of to in is are was were for on with as at by it this that".split()
)
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"


def token_counts(text: pa.Array) -> dict[str, np.ndarray]:
    """Counting kernels, each with an exact SQL mirror:

    n_chars   = length(text)
    n_tokens  = length(regexp_extract_all(text, '\\S+'))
    n_bpe     = length(regexp_extract_all(text, BPE_RE))
    n_punct   = length(regexp_extract_all(text, '[.,;:!?]'))
    n_stop    = length(regexp_extract_all(lower(text), STOPWORD_RE))
    """
    def _count(arr) -> np.ndarray:
        # null text -> 0, not NaN-cast-to-INT64_MIN garbage
        return arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)

    return {
        "n_chars": _count(pc.utf8_length(text)),
        "n_tokens": _count(pc.count_substring_regex(text, TOKEN_RE)),
        "n_bpe": _count(pc.count_substring_regex(text, BPE_RE)),
        "n_punct": _count(pc.count_substring_regex(text, PUNCT_RE)),
        "n_stop": _count(pc.count_substring_regex(pc.utf8_lower(text), STOPWORD_RE)),
    }


def quality_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-document quality metrics as integer counts (exact, oracle-safe)
    plus a fixed-point quality score in basis points.

    score_bp = floor(10000 * (0.4*stop_ratio + 0.3*min(1, n_tokens/100)
                              + 0.3*(1 - punct_ratio)) + 0.5)
    (floor(x+0.5) rather than round(): numpy rounds half-to-even, SQL
    half-away — floor(+0.5) is identical on both sides.)
    """
    text = batch.column(text_col).combine_chunks()
    c = token_counts(text)
    nt = np.maximum(1, c["n_tokens"])
    stop_ratio = c["n_stop"] / nt
    punct_ratio = np.minimum(1.0, c["n_punct"] / nt)
    score = 0.4 * stop_ratio + 0.3 * np.minimum(1.0, c["n_tokens"] / 100.0) + 0.3 * (1.0 - punct_ratio)
    out = {id_col: batch.column(id_col)}
    for k, v in c.items():
        out[k] = pa.array(v, pa.int64())
    out["quality_bp"] = pa.array(np.floor(score * 10000 + 0.5).astype(np.int64), pa.int64())
    return pa.table(out)


# ---------------------------------------------------------------------------
# language identification (n-gram / stopword heuristic)
# ---------------------------------------------------------------------------

#: tiny per-language stopword profiles (top function words); public knowledge
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu"},
    "fr": {"le", "la", "les", "et", "des", "est", "un", "une", "que", "dans"},
    "es": {"el", "la", "los", "y", "de", "que", "es", "un", "una", "por"},
}


def detect_language(text: pa.Array) -> np.ndarray:
    """Heuristic language ID: CJK codepoint share -> 'zh'; otherwise the
    language whose stopword profile matches the most tokens; 'und' when
    nothing matches.  Vectorized via one lowercase tokenization pass."""
    n = len(text)
    # CJK detection: any CJK-unified char
    cjk = pc.count_substring_regex(text, r"[一-鿿]").to_numpy(zero_copy_only=False)
    toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\W+")
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    from georay.dedup import segment_reduce

    scores = np.zeros((n, len(_LANG_PROFILES)), dtype=np.int32)
    langs = list(_LANG_PROFILES)
    for li, lang in enumerate(langs):
        prof = sorted(_LANG_PROFILES[lang])
        if len(flat):
            hits = np.isin(flat, prof).astype(np.int32)
            scores[:, li] = segment_reduce(np.add, hits, offsets, 0)
    best = np.argmax(scores, axis=1)
    best_score = scores[np.arange(n), best]
    out = np.asarray([langs[b] for b in best], dtype=object)
    out[best_score == 0] = "und"
    out[cjk > 0] = "zh"
    return out


def langid_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    pred = detect_language(batch.column(text_col).combine_chunks())
    return pa.table({id_col: batch.column(id_col), "lang_pred": pa.array(pred, pa.string())})


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing over a rolling token-hash window)
# ---------------------------------------------------------------------------

def fingerprint_batch(
    batch: pa.Table, window: int = 4, text_col: str = "text", id_col: str = "doc_id",
    hash_impl: str = "fast",
) -> pa.Table:
    """Winnowing fingerprint (Schleimer et al. 2003, SIGMOD — public
    algorithm): rolling 3-token shingle hashes, minimum per sliding
    window, deduplicated; emitted as a per-doc fingerprint count +
    xor-combined digest.  Fully vectorized (shared shingle/winnow kernels
    in :mod:`georay.dedup` — no per-document Python loop).

    ``hash_impl="fast"`` (default): pandas' C hash of tokens + rolling
    arithmetic combine.  ``hash_impl="md5"``: shingle STRINGS hashed with
    the DuckDB-mirrorable ``md5_number_lower`` (vocabulary-bounded unique
    hashing) — the oracle-parity backend; the winnowing algorithm is
    hash-agnostic."""
    from georay.dedup import (
        _shingle_hashes,
        _shingle_strings,
        _tokens_nonempty,
        md5_u64,
        winnow_minima,
    )

    text = batch.column(text_col).combine_chunks()
    if hash_impl == "md5":
        tok_np, offsets = _tokens_nonempty(text)
        sh_strings, sh_offsets = _shingle_strings(tok_np, offsets, k=3)
        sh = md5_u64(sh_strings)
    else:
        sh, sh_offsets = _shingle_hashes(text, k=3)
    counts, digests = winnow_minima(sh, sh_offsets, window)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "fp_count": pa.array(counts, pa.int64()),
            "fp_digest": pa.array(digests.astype(np.int64), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# text normalization (NFC + lower + whitespace collapse)
# ---------------------------------------------------------------------------

def normalize_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Canonical text normalization for training corpora: Unicode NFC,
    full lowercasing, internal whitespace collapsed to single spaces,
    leading/trailing SPACES trimmed.  All vectorized kernels — polars'
    Rust normalizer for the NFC step (pyarrow 16's ``utf8_normalize``
    emits DECOMPOSED output even with ``form="NFC"`` — NFC input
    ``0xe9`` comes back as ``0x65 0x301`` — so it cannot match any
    composing engine byte for byte), then pyarrow utf8proc lower + RE2
    collapse + trim.  No Python per row; the polars round-trip is
    zero-copy in both directions for large-string Arrow columns.

    Exact SQL mirror (DuckDB composes NFC and shares RE2 semantics):
        trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'), ' ')

    The trim step removes ' ' only (not arbitrary Unicode whitespace):
    the RE2 collapse has already mapped every whitespace run — including
    leading/trailing — to a single ASCII space, so trimming ' ' is
    complete, and both engines agree on it byte for byte.
    """
    import polars as pl

    text = batch.column(text_col).combine_chunks()
    norm = pl.from_arrow(text).str.normalize("NFC").to_arrow().cast(pa.string())
    norm = pc.utf8_lower(norm)
    norm = pc.replace_substring_regex(norm, r"\s+", " ")
    norm = pc.utf8_trim(norm, characters=" ")
    return pa.table(
        {
            id_col: batch.column(id_col),
            "norm_text": norm,
            "n_norm_chars": pc.utf8_length(norm).cast(pa.int64()),
            "changed": pc.not_equal(norm, text),
        }
    )


# ---------------------------------------------------------------------------
# corpus n-gram counting (global heavy hitters)
# ---------------------------------------------------------------------------

def ngram_count_batch(batch: pa.Table, k: int = 3, text_col: str = "text") -> pa.Table:
    """map_batches kernel: documents -> per-BLOCK (ngram, cnt) partial
    counts.  Word k-grams via the shared vectorized shingle kernels
    (georay.dedup): docs with >= k tokens emit their m-k+1 rolling
    k-grams (occurrences, NOT per-doc distinct), shorter non-empty docs
    fall back to their raw tokens — the same layout the MinHash oracle
    already mirrors in SQL.  The in-block group_by is the combiner that
    makes the downstream global groupby tractable: the shuffle moves
    (distinct-ngram-per-block, count) rows, never one row per token.
    """
    from georay.dedup import _shingle_strings, _tokens_nonempty

    text = batch.column(text_col).combine_chunks()
    tok_np, offsets = _tokens_nonempty(text)
    grams, _ = _shingle_strings(tok_np, offsets, k)
    if len(grams) == 0:
        return pa.table(
            {"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    tbl = pa.table({"ngram": pa.array(grams, pa.string())})
    agg = tbl.group_by("ngram").aggregate([([], "count_all")])
    return pa.table(
        {
            "ngram": agg.column("ngram"),
            "cnt": agg.column("count_all").cast(pa.int64()),
        }
    )


def top_ngrams(docs_ds, k: int = 3, top: int = 20):
    """Global top-``top`` word ``k``-grams by occurrence count.

    Scale shape: in-block combiner (``ngram_count_batch``) -> ONE
    hash/sort groupby over (ngram, cnt) partials -> per-block top-k
    prune (each ngram lives in exactly ONE block after the groupby, so
    per-block top-k then a global merge is EXACT, and the final sort
    sees <= top x blocks rows instead of the whole distinct-ngram
    table) -> global sort + limit.  Ties break lexicographically so the
    result is deterministic and oracle-comparable.
    """
    import pyarrow.compute as _pc

    agg = (
        docs_ds.map_batches(
            lambda b, k=k: ngram_count_batch(b, k=k), batch_format="pyarrow"
        )
        .groupby("ngram")
        .sum("cnt")
    )

    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        b = pa.table({"ngram": b.column("ngram"), "cnt": b.column("sum(cnt)")})
        idx = _pc.sort_indices(
            b, sort_keys=[("cnt", "descending"), ("ngram", "ascending")]
        )
        return b.take(idx[:top])

    return (
        agg.map_batches(block_topk, batch_format="pyarrow")
        .sort(["cnt", "ngram"], descending=[True, False])
        .limit(top)
    )
