"""Text-analysis functions for the training-data pipeline operators
(SURVEY brief: language-ID, quality scoring, token counting, document
fingerprinting).  All vectorized-friendly; heavy regexes compiled at module
load (amortized per worker process, the same pattern as actor __init__).
"""

from __future__ import annotations

import re

import numpy as np

# ---------------------------------------------------------------------------
# language id — n-gram/stopword heuristic (no model deps in this container)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is was for that with his are有".split()[:11] or []),
    "de": frozenset("der die das und ist von den nicht mit ein eine für".split()),
    "fr": frozenset("le la les et des est dans pour que une du".split()),
    "es": frozenset("el la los las de que y en un una por para".split()),
    "it": frozenset("il la di che e un una per con del sono".split()),
}
_LANG_MARKERS["en"] = frozenset("the and of to in is was for that with as his are at by it".split())

_WORD_RE = re.compile(r"[a-zA-ZäöüßéèêàâçñáíóúìòùÄÖÜ]+")


def detect_language(text: str) -> str:
    """Stopword-vote language id; '' when no evidence (short/noisy text)."""
    words = [w.lower() for w in _WORD_RE.findall(text or "")]
    if not words:
        return ""
    scores = {lang: 0 for lang in _LANG_MARKERS}
    for w in words:
        for lang, markers in _LANG_MARKERS.items():
            if w in markers:
                scores[lang] += 1
    best = max(scores, key=lambda l: (scores[l], l))
    if scores[best] == 0:
        return ""
    return best


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_EN_STOP = _LANG_MARKERS["en"]
_PUNCT_RE = re.compile(r"[^\w\s]")
_SENT_END_RE = re.compile(r"[.!?]")


def quality_features(text: str) -> dict[str, float]:
    """Length / punctuation / stopword-ratio features (C4/Gopher-style rules
    computable without models)."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return {
            "n_chars": float(n_chars), "n_words": 0.0, "mean_word_len": 0.0,
            "stopword_ratio": 0.0, "punct_ratio": 0.0, "sentence_count": 0.0,
            "alpha_ratio": 0.0, "quality_score": 0.0,
        }
    mean_wl = sum(len(w) for w in words) / n_words
    stop_ratio = sum(1 for w in words if w.lower().strip(".,;:!?") in _EN_STOP) / n_words
    punct_ratio = len(_PUNCT_RE.findall(text)) / max(1, n_chars)
    alpha_ratio = sum(ch.isalpha() for ch in text) / max(1, n_chars)
    sentences = len(_SENT_END_RE.findall(text))
    # simple composite: in-range word length, some stopwords, mostly alphabetic
    score = 0.0
    if 3.0 <= mean_wl <= 10.0:
        score += 0.4
    if stop_ratio >= 0.05:
        score += 0.3
    if alpha_ratio >= 0.6:
        score += 0.2
    if sentences >= 1:
        score += 0.1
    return {
        "n_chars": float(n_chars), "n_words": float(n_words),
        "mean_word_len": mean_wl, "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio, "sentence_count": float(sentences),
        "alpha_ratio": alpha_ratio, "quality_score": score,
    }


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer pattern (public; approximates BPE segmentation
# without a merges table).
_BPE_SPLIT_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?\d+| ?[^\sA-Za-z\d]+|\s+(?!\S)|\s+"
)


def count_whitespace_tokens(text: str) -> int:
    return len(text.split())


def count_bpe_tokens(text: str) -> int:
    """Upper-bound BPE token count via the GPT-2 pre-tokenization regex."""
    return len(_BPE_SPLIT_RE.findall(text))


# ---------------------------------------------------------------------------
# document fingerprinting — winnowing over a rolling Rabin-Karp hash
# ---------------------------------------------------------------------------

_B = np.uint64(1000003)


def rolling_hashes(text: str, k: int = 8) -> np.ndarray:
    """Rabin-Karp hashes of every k-byte window (uint64, natural overflow)."""
    data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
    n = data.size
    if n < k:
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        h = np.uint64(0)
        for b in data:
            h = h * _B + b
        return np.array([h], dtype=np.uint64)
    # powers of B
    powers = np.empty(k, dtype=np.uint64)
    powers[k - 1] = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash function
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * _B
    # windowed dot product via cumulative trick: direct strided computation
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    return (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD'03): min hash per sliding window of
    ``window`` consecutive k-gram hashes, deduplicated → compact fingerprint."""
    h = rolling_hashes(text, k)
    if h.size == 0:
        return h
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(wins.min(axis=1))


# ---------------------------------------------------------------------------
# repetition signals — Gopher-style quality rules (Rae et al. 2021 §A1.1:
# repetitious documents are low-quality training data)
# ---------------------------------------------------------------------------

def repetition_signals(text: str) -> dict[str, float]:
    """Per-document repetition features over whitespace words:
    duplicate-word fraction (1 − distinct/total), top-bigram fraction and
    top-trigram fraction (most frequent n-gram's occurrences over all n-gram
    positions).  Empty/short inputs yield 0 fractions."""
    words = text.split(" ") if text else []
    n = len(words)
    out = {"n_words": float(n), "dup_word_frac": 0.0,
           "top_bigram_frac": 0.0, "top_trigram_frac": 0.0}
    if n == 0 or (n == 1 and words[0] == ""):
        out["n_words"] = 0.0
        return out
    out["dup_word_frac"] = 1.0 - len(set(words)) / n
    if n >= 2:
        from collections import Counter

        bi = Counter(zip(words, words[1:]))
        out["top_bigram_frac"] = max(bi.values()) / (n - 1)
    if n >= 3:
        from collections import Counter

        tri = Counter(zip(words, words[1:], words[2:]))
        out["top_trigram_frac"] = max(tri.values()) / (n - 2)
    return out


# ---------------------------------------------------------------------------
# PII scrubbing — email / IPv4 / phone redaction (C4-style cleanup).
# Patterns are RE2-compatible (no backrefs/lookarounds) so the DuckDB oracle
# can run the IDENTICAL expressions; application order matters (a phone
# pattern could eat IPv4 digits) and is fixed: email → ipv4 → phone.
# ---------------------------------------------------------------------------

import re as _re2

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{3,10}", "<PHONE>"),
)

_PII_COMPILED = [(name, _re2.compile(pat), repl)
                 for name, pat, repl in PII_PATTERNS]


def scrub_pii(text: str) -> tuple[str, dict[str, int]]:
    """→ (scrubbed text, {kind: redaction count}), kinds applied in the
    fixed PII_PATTERNS order."""
    counts: dict[str, int] = {}
    for name, rx, repl in _PII_COMPILED:
        text, k = rx.subn(repl, text)
        counts[name] = k
    return text, counts
