"""Text analysis kernels for the training-data pipeline ops: language ID
(stopword n-gram heuristic), quality scoring (length/punct/stopword
ratios), token counting, rolling-hash document fingerprinting. All
batch-vectorized (Arrow kernels + numpy) or single-pass per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "nl": {"de", "het", "een", "en", "van", "in", "is", "dat", "op", "te"},
    "de": {"der", "die", "das", "und", "ein", "von", "zu", "mit", "ist", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "los", "por"},
}


def token_count(texts: pa.Array) -> pa.Array:
    """Whitespace token count as ``count(' ') + 1`` — the exact formula a
    SQL oracle can mirror (length - length(replace) + 1)."""
    return pc.add(pc.count_substring(texts, " "), 1)


def lang_id(texts) -> list[str]:
    """Stopword-overlap language ID: the language whose stopword set has
    the most DISTINCT members present in the document; 'und' when none.
    Deterministic tie-break by language code (sorted iteration + strict
    >). Vectorized: one Arrow regex containment kernel per stopword over
    the whole batch — no per-row Python."""
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, type=pa.string()
    )
    low = pc.utf8_lower(arr)
    n = len(arr)
    best_score = np.zeros(n, dtype=np.int64)
    best_lang = np.full(n, "und", dtype=object)
    for lang in sorted(_STOPWORDS):
        score = np.zeros(n, dtype=np.int64)
        for w in _STOPWORDS[lang]:
            hit = pc.match_substring_regex(low, rf"(^|\s){w}(\s|$)")
            score += hit.to_numpy(zero_copy_only=False).astype(np.int64)
        better = score > best_score
        best_score = np.where(better, score, best_score)
        best_lang = np.where(better, lang, best_lang)
    return best_lang.tolist()


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality features, all Arrow kernels: char length, token
    count, punctuation count, uppercase ratio (×1e6 int for exactness)."""
    t = batch[text_col]
    n_chars = pc.utf8_length(t)
    toks = token_count(t)
    punct = pc.count_substring_regex(t, r"[.,;:!?]")
    return (
        batch.append_column("n_chars_q", n_chars.combine_chunks() if isinstance(n_chars, pa.ChunkedArray) else n_chars)
        .append_column("n_tokens", toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks)
        .append_column("n_punct", punct.combine_chunks() if isinstance(punct, pa.ChunkedArray) else punct)
    )


def fingerprint(texts) -> np.ndarray:
    """Karp–Rabin rolling polynomial fingerprint over UTF-8 bytes,
    wrapping mod 2^64 — a deterministic, order-sensitive whole-document
    fingerprint (D4 content dedup key, unlike a bag-of-words hash).

    Fully vectorized over the Arrow value buffer: fp(doc) =
    Σ byte[j]·B^(L-1-j), computed as one power-table gather + one
    segment-sum (reduceat) — no per-row, let alone per-byte, Python."""
    from .murmur3 import string_buffers

    B = np.uint64(1000003)
    data, offsets = string_buffers(texts)
    # string_buffers returns ABSOLUTE offsets into the full value buffer;
    # a sliced StringArray (arr.offset > 0) starts past 0 — normalize so
    # positions index the slice's bytes (ADVICE r1)
    base = int(offsets[0])
    if base:
        offsets = offsets - base
        data = data[base:]
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    total = int(offsets[-1])
    if total == 0:
        return out.view(np.int64)
    data = data[:total]
    lengths = offsets[1:] - offsets[:-1]
    maxlen = int(lengths.max())
    with np.errstate(over="ignore"):
        powers = np.empty(maxlen, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if maxlen > 1:
            np.cumprod(np.full(maxlen - 1, B, dtype=np.uint64), out=powers[1:])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        pos_from_end = offsets[1:][doc_of] - 1 - np.arange(total, dtype=np.int64)
        terms = data.astype(np.uint64) * powers[pos_from_end]
        nonempty = np.where(lengths > 0)[0]
        out[nonempty] = np.add.reduceat(terms, offsets[:-1][nonempty])
    return out.view(np.int64)
