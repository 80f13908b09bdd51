"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All are stateless-per-batch or actor-pool ``map_batches`` stages over
the ``documents`` table shape (``doc_id, text, lang, source,
n_chars``). Kernels stay vectorized (pyarrow.compute regex counting,
pandas str ops) or C-backed (hashlib); per-row Python only where a
true per-document reduction is required (fingerprint set-building).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# batch_size=None = one whole block per batch: every kernel here is
# vectorized, so Ray's 1024-row default would only add per-batch overhead
_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

# tiny stopword profiles for the n-gram/stopword language heuristic
_LANG_PROFILES: Dict[str, set] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


class LangId:
    """Language-ID heuristic: stopword-profile voting with a compiled
    word regex (state built once per actor)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.word_re = re.compile(r"[a-zA-Zàâéèêëïîôùûüöäßñ]+")
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def classify(self, text: Optional[str]) -> Optional[str]:
        if not text:
            return None
        words = self.word_re.findall(text.lower())[:400]
        if not words:
            return None
        best, best_score = "unknown", 0
        for lang, stops in self.profiles.items():
            score = sum(1 for w in words if w in stops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds, type=pa.string()))


def lang_id(ds: Dataset, text_col: str = "text", concurrency: int = 2) -> Dataset:
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs={"text_col": text_col},
        concurrency=concurrency,
        num_cpus=0.5,
        **_PYARROW,
    )


def token_count(ds: Dataset, text_col: str = "text", out_col: str = "n_tokens") -> Dataset:
    """Whitespace-token count — fully vectorized
    (``pc.count_substring_regex``); DuckDB-parity expression:
    ``len(regexp_extract_all(text, '\\S+'))``."""

    def apply(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], r"\S+")
        n = pc.fill_null(n, 0).cast(pa.int64())
        return t.append_column(out_col, n)

    return ds.map_batches(apply, **_PYARROW)


_BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(ds: Dataset, text_col: str = "text", out_col: str = "n_bpe_tokens") -> Dataset:
    """BPE-ish token count: letter runs, single digits, punctuation —
    the pre-tokenization split GPT-style BPE applies. Vectorized regex
    count; DuckDB parity: ``len(regexp_extract_all(text, <same>))``."""

    def apply(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], _BPE_ISH)
        return t.append_column(out_col, pc.fill_null(n, 0).cast(pa.int64()))

    return ds.map_batches(apply, **_PYARROW)


def quality_score(ds: Dataset, text_col: str = "text") -> Dataset:
    """Quality signals: length, punctuation ratio, stopword ratio,
    mean word length, and a [0,1] composite. Vectorized arrow regex
    counts — no per-row Python."""
    stop_pattern = r"(?i)\b(?:the|and|of|to|a|in|is|that|it|for)\b"

    def apply(t: pa.Table) -> pa.Table:
        text = t[text_col]
        n_chars = pc.fill_null(pc.utf8_length(text), 0).cast(pa.float64())
        n_words = pc.fill_null(pc.count_substring_regex(text, r"\S+"), 0).cast(pa.float64())
        n_punct = pc.fill_null(pc.count_substring_regex(text, r"[^\w\s]"), 0).cast(pa.float64())
        n_stop = pc.fill_null(pc.count_substring_regex(text, stop_pattern), 0).cast(pa.float64())
        safe_words = pc.max_element_wise(n_words, 1.0)
        punct_ratio = pc.divide(n_punct, pc.max_element_wise(n_chars, 1.0))
        stop_ratio = pc.divide(n_stop, safe_words)
        mean_word_len = pc.divide(n_chars, safe_words)
        # composite: long enough, some stopwords, not punctuation soup
        len_term = pc.min_element_wise(pc.divide(n_words, 100.0), 1.0)
        stop_term = pc.min_element_wise(pc.multiply(stop_ratio, 3.0), 1.0)
        punct_term = pc.subtract(1.0, pc.min_element_wise(pc.multiply(punct_ratio, 4.0), 1.0))
        score = pc.divide(pc.add(pc.add(len_term, stop_term), punct_term), 3.0)
        out = t.append_column("punct_ratio", punct_ratio)
        out = out.append_column("stop_ratio", stop_ratio)
        out = out.append_column("mean_word_len", mean_word_len)
        return out.append_column("quality", score)

    return ds.map_batches(apply, **_PYARROW)


def fingerprint(ds: Dataset, text_col: str = "text", out_col: str = "fingerprint") -> Dataset:
    """Document fingerprint (normalization-stable): lowercase → word
    split → unique sorted → join → sha256. DuckDB parity:
    ``sha256(array_to_string(list_sort(list_distinct(
    regexp_extract_all(lower(text), '\\w+'))), ' '))``."""
    word_re = re.compile(r"\w+")

    def apply(t: pa.Table) -> pa.Table:
        out = []
        for text in t[text_col].to_pylist():
            if text is None:
                out.append(None)
                continue
            words = sorted(set(word_re.findall(text.lower())))
            out.append(hashlib.sha256(" ".join(words).encode()).hexdigest())
        return t.append_column(out_col, pa.array(out, type=pa.string()))

    return ds.map_batches(apply, **_PYARROW)


# PII redaction patterns, applied IN ORDER (email first so an
# address's host part is not half-eaten by the IP rule). RE2 syntax —
# identical semantics in pyarrow (replace_substring_regex) and DuckDB
# (regexp_replace(..., 'g')), verified by the redact_events oracle.
REDACT_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{1,2}[- ]?\d{3}[- ]\d{3}[- ]\d{4}|\b\d{3}[- ]\d{3}[- ]\d{4}\b",
     "<PHONE>"),
)


def redact(
    ds: Dataset,
    cols,
    patterns=REDACT_PATTERNS,
) -> Dataset:
    """Replace PII-shaped substrings (emails, IPv4s, phone numbers by
    default) with placeholder tokens — the training-data scrub
    companion to the reference's `pseudonymize`
    (`builtins/operators/pseudonymize.cpp`), which keeps referential
    integrity where this destroys it.

    Vectorized: each (pattern, replacement) is one C-backed RE2 pass
    (``pc.replace_substring_regex``) per batch; no shuffle, no Python
    rows."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def apply(t: pa.Table) -> pa.Table:
        for c in cols:
            arr = t[c]
            for pat, repl in patterns:
                arr = pc.replace_substring_regex(
                    arr, pattern=pat, replacement=repl
                )
            t = t.set_column(t.column_names.index(c), c, arr)
        return t

    return ds.map_batches(apply, **_PYARROW)
