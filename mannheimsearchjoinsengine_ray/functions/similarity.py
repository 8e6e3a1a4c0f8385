"""Similarity measures.

- ``ngrams_in_bounds``      — NGram.getAllNgramsInBound (SJ/utils/NGram.java:14-82)
- ``jaccard_ngram``         — Jaccard over 2–4 char n-grams, the reference's
  string similarity (secondstring Jaccard used in
  InstanceBasedComparer.java:556-575 and LabelBasedComparer)
- ``levenshtein``           — edit distance (fuzzy candidate re-rank,
  searchJoins.conf:31-32 maxEditDistance)
- ``numeric_similarity``    — 1 if equal else 0.5·min/max of absolute values
  (InstanceBasedComparer.java:507-531; also used for unit/coordinate values)
- ``date_similarity``       — day-difference normalized by the columns'
  min-max date range (InstanceBasedComparer.java:532-555)
- ``compare_values``        — per-type dispatch (compareColumnValues,
  InstanceBasedComparer.java:496-630): type mismatch → 0, link/bool exact.
"""

from __future__ import annotations

from datetime import datetime


def ngrams_in_bounds(value: str, min_n: int = 2, max_n: int = 4) -> list[str]:
    """All character n-grams of value for n in [min_n, max_n]."""
    out: list[str] = []
    L = len(value)
    for n in range(min_n, max_n + 1):
        if n > L:
            break
        out.extend(value[i:i + n] for i in range(L - n + 1))
    return out


def word_ngrams(tokens: list[str], min_n: int, max_n: int) -> list[str]:
    out: list[str] = []
    L = len(tokens)
    for n in range(min_n, max_n + 1):
        if n > L:
            break
        out.extend(" ".join(tokens[i:i + n]) for i in range(L - n + 1))
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def jaccard_ngram(s1: str, s2: str, min_n: int = 2, max_n: int = 4) -> float:
    if s1 == s2:
        return 1.0
    return jaccard(set(ngrams_in_bounds(s1, min_n, max_n)),
                   set(ngrams_in_bounds(s2, min_n, max_n)))


def levenshtein(s1: str, s2: str, max_dist: int | None = None) -> int:
    """Classic DP edit distance with optional early-exit band."""
    if s1 == s2:
        return 0
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    if max_dist is not None and len(s2) - len(s1) > max_dist:
        return max_dist + 1
    prev = list(range(len(s1) + 1))
    for j, c2 in enumerate(s2, 1):
        cur = [j]
        best = j
        for i, c1 in enumerate(s1, 1):
            cost = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (c1 != c2))
            cur.append(cost)
            best = min(best, cost)
        if max_dist is not None and best > max_dist:
            return max_dist + 1
        prev = cur
    return prev[-1]


def numeric_similarity(v1: float, v2: float) -> float:
    if v1 == v2:
        return 1.0
    a1, a2 = abs(v1), abs(v2)
    if a1 == 0.0 or a2 == 0.0:
        return 0.0
    return 0.5 * (min(a1, a2) / max(a1, a2))


def date_similarity(d1: datetime, d2: datetime, range_days: float) -> float:
    """1 - |Δdays| / range, floored at 0; equal dates → 1 (range 0 → exact)."""
    if d1 == d2:
        return 1.0
    if range_days <= 0:
        return 0.0
    diff = abs((d1 - d2).total_seconds()) / 86400.0
    return max(0.0, 1.0 - diff / range_days)


def compare_values(v1, v2, data_type: str, date_range_days: float = 0.0) -> float:
    """Per-type value similarity (InstanceBasedComparer.java:496-630).
    Callers guarantee matching types — mismatched columns are never compared
    (type mismatch scores 0 upstream)."""
    if v1 is None or v2 is None:
        return 0.0
    if data_type in ("numeric", "unit", "coordinate"):
        try:
            return numeric_similarity(float(v1), float(v2))
        except (TypeError, ValueError):
            return 0.0
    if data_type == "date":
        if isinstance(v1, datetime) and isinstance(v2, datetime):
            return date_similarity(v1, v2, date_range_days)
        return 1.0 if v1 == v2 else 0.0
    if data_type in ("link", "bool"):
        return 1.0 if v1 == v2 else 0.0
    # string / unknown / list
    return jaccard_ngram(str(v1), str(v2))
