"""Schema matching: instance-based + label-based column scoring and the
greedy duplicate-column decision.

Behavioral port of SURVEY §2.5:
  * ``ColumnScoreValue``            — running (sum, count, complement)
    accumulator (SJ/model/schema/ColumnScoreValue.java)
  * ``score_column_pair``           — InstanceBasedColumnComparer (:67-207):
    align values on shared row ids, per-type value similarity for co-present
    pairs (compare_values), one-sided rows count as complement; different
    types or same source → no score (InstanceBasedMatcher skip :99-109)
  * ``complementary_similarity``    — ScoreEvaluator (:146-150):
    (complement × complementaryScore + Σscores) / totalCount
  * ``label_similarity``            — header similarity, Jaccard over 2-4
    char n-grams of the normalized headers (LabelBasedComparer without the
    SPARQL/WordNet network calls — SURVEY maps those to a local gazetteer)
  * ``decide_object_matching``      — InstanceBasedComparer (:130-347):
    greedy 1↔N matching with per-type thresholds (string 0.8 / numeric 0.4;
    0.5 / 0.3 when label evidence also passed), a partner is dropped when
    another column scores it strictly higher
  * ``score_pairs_ds``              — the Dataset stage: candidate column
    pairs (post-LSH-blocking, NOT all-pairs) scored in map_batches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, NULL_VALUE, PipelineConfig
from ..functions.normalize import clear_string
from ..functions.similarity import compare_values, jaccard_ngram


@dataclass
class ColumnScoreValue:
    """Running pairwise-score accumulator."""
    score_sum: float = 0.0
    count: int = 0
    complement: int = 0

    def add_score(self, s: float) -> None:
        self.score_sum += s
        self.count += 1

    def add_complement(self) -> None:
        self.complement += 1

    @property
    def average(self) -> float:
        return self.score_sum / self.count if self.count else 0.0


def score_column_pair(values_a: dict[int, str], values_b: dict[int, str],
                      data_type: str, date_range_days: float = 0.0,
                      sample_ratio: float = 1.0) -> ColumnScoreValue:
    """Instance-based similarity of two columns sharing a row-id space."""
    csv = ColumnScoreValue()
    rows = sorted(set(values_a) | set(values_b))
    if sample_ratio < 1.0:
        step = max(1, int(round(1.0 / sample_ratio)))
        rows = rows[::step]
    for r in rows:
        va = values_a.get(r)
        vb = values_b.get(r)
        a_null = va in (None, "", NULL_VALUE)
        b_null = vb in (None, "", NULL_VALUE)
        if a_null and b_null:
            continue
        if a_null or b_null:
            csv.add_complement()
            continue
        csv.add_score(compare_values(va, vb, data_type, date_range_days))
    return csv


def complementary_similarity(csv: ColumnScoreValue,
                             complementary_score: float = 1.0) -> float:
    total = csv.count + csv.complement
    if total == 0:
        return 0.0
    return (csv.complement * complementary_score + csv.score_sum) / total


# WordNet-tier multipliers (LabelBasedComparer.java:31-39)
WORDNET_EXACT_MATCH_SCORE = 5.0
WORDNET_SYNSET_MATCH_SCORE = 2.0


def match_strings(header_a: str, header_b: str) -> float:
    """LabelBasedComparer.matchStrings port (:106-187): n-gram Jaccard of the
    cleared headers scaled by the WordNet tier —

      equal strings                      × 2.2   (synsetScore + 0.2 — the
                                                  reference's equal-string
                                                  branch overwrites the
                                                  exact-match 5, quirk kept)
      equal strings, both in the lexicon × 2.0   (their synsets overlap, so
                                                  the synset branch fires
                                                  last)
      synonym-set overlap                × 2.0
      hypernym/hyponym overlap           × 2.0
      otherwise                          × 1.0

    The synonym channel uses the bundled lexicon (functions/wordnet.py)
    loaded once per worker instead of a WordNet dictionary."""
    from ..functions import wordnet

    a = clear_string(header_a, False)
    b = clear_string(header_b, False)
    if len(a) < 3 or len(b) < 3:
        return 0.0
    price = 1.0
    syn_a, syn_b = wordnet.phrase_synonyms(a), wordnet.phrase_synonyms(b)
    if a == b:
        price = WORDNET_SYNSET_MATCH_SCORE + 0.2
    if syn_a and syn_b and (syn_a & syn_b):
        price = WORDNET_SYNSET_MATCH_SCORE
    elif wordnet.phrase_related(a) & wordnet.phrase_related(b):
        price = WORDNET_SYNSET_MATCH_SCORE
    elif price == 1.0 and (not syn_a or not syn_b):
        # word-ngram fallback (LabelBasedComparer.java:151-165 via
        # populateNgramList :297-315): a phrase the dictionary doesn't know
        # gets a synonym list built from its 1-2-word grams — and since a
        # dictionary's synset contains the word itself, two multi-word
        # headers sharing any >2-char word (or any gram-synonym) take the
        # synset multiplier
        ga = _word_gram_synsets(a, wordnet) if not syn_a else syn_a
        gb = _word_gram_synsets(b, wordnet) if not syn_b else syn_b
        if ga & gb:
            price = WORDNET_SYNSET_MATCH_SCORE
    return jaccard_ngram(a, b) * price if a != b else price


def _word_gram_synsets(phrase: str, wordnet) -> set[str]:
    """1-2-word grams of length > 2, each expanded with its own synonyms +
    hypernyms and itself (the reference's populateNgramList, with exact
    overlap standing in for its Levenshtein-threshold list match)."""
    words = [w for w in phrase.split() if len(w) > 2]
    grams = list(words) + [f"{x} {y}" for x, y in zip(words, words[1:])]
    out: set[str] = set()
    for g in grams:
        out.add(g)
        out |= wordnet.phrase_synonyms(g)
        out |= wordnet.phrase_related(g)
    return out


def label_similarity(header_a: str, header_b: str) -> float:
    """0..1 header similarity for the duplicate-column threshold tests:
    n-gram Jaccard, lifted to 0.85 when the bundled synonym channel links
    the headers (the WordNet tier of LabelBasedComparer, restoring
    'country' ≈ 'nation')."""
    from ..functions import wordnet

    a = clear_string(header_a, True)
    b = clear_string(header_b, True)
    if a == b:
        return 1.0
    base = jaccard_ngram(a, b)
    if wordnet.phrase_synonyms(a) & wordnet.phrase_synonyms(b):
        return max(base, 0.85)
    if wordnet.phrase_related(a) & wordnet.phrase_related(b):
        return max(base, 0.7)
    return base


@dataclass
class ColumnRef:
    column_id: str
    header: str
    data_type: str
    source: str
    values: dict[int, str] = field(default_factory=dict)


def _threshold(data_type: str, with_label: bool,
               cfg: PipelineConfig) -> float:
    if data_type in ("numeric", "unit", "coordinate", "date"):
        return cfg.dup_numeric_threshold_label if with_label else cfg.dup_numeric_threshold
    return cfg.dup_string_threshold_label if with_label else cfg.dup_string_threshold


def decide_object_matching(
    scores: dict[tuple[str, str], float],
    col_types: dict[str, str],
    label_passed: set[tuple[str, str]] | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict[str, list[str]]:
    """Greedy 1↔N matching over a symmetric pair-score map.

    Returns {column_id: [matched partner ids]}.  A column's match list is its
    best-scoring partner plus every partner above the per-type threshold; a
    partner goes to whichever column scores it highest (strictly-higher wins,
    first-seen keeps on ties — deterministic total order).
    """
    label_passed = label_passed or set()
    sym: dict[tuple[str, str], float] = {}
    for (a, b), s in scores.items():
        sym[(a, b)] = s
        sym[(b, a)] = s

    partners: dict[str, list[tuple[str, float]]] = {}
    for (a, b), s in sym.items():
        partners.setdefault(a, []).append((b, s))

    out: dict[str, list[str]] = {}
    owner: dict[str, tuple[str, float]] = {}  # partner -> (column, score)
    matched: set[str] = set()                 # columns already consumed
    for col in sorted(partners):
        if col in matched:
            continue
        plist = sorted(partners[col], key=lambda p: (-p[1], p[0]))
        claimed: list[str] = []
        for partner, s in plist:
            with_label = (col, partner) in label_passed or \
                (partner, col) in label_passed
            thr = _threshold(col_types.get(partner, "string"), with_label, cfg)
            if s < thr and claimed:
                break
            if s < thr:
                continue
            prev = owner.get(partner)
            if prev is not None and prev[1] >= s:
                continue
            if prev is not None:
                # steal: remove from the previous owner's list
                out[prev[0]] = [p for p in out.get(prev[0], []) if p != partner]
            owner[partner] = (col, s)
            claimed.append(partner)
        if claimed:
            out[col] = claimed
            matched.add(col)
            matched.update(claimed)
    return {c: m for c, m in out.items() if m}


# ---------------------------------------------------------------------------
# ExperimentalDuplicateResolver port: merge instance-matched columns
# ---------------------------------------------------------------------------
# Behavior parity with SJ/datafusion/ExperimentalDuplicateResolver.java
# (reference flags it experimental; quirks kept and documented):
#   * label matches are IGNORED for the output — the reference calls
#     labelMatches.producePairs() (:38) but the only consumer
#     (checkDuplicatesBasedOnLabelAndInstanceSim, :139-185) is never invoked;
#     resolveDuplicate (:111-132) goes straight to mergeColumns.
#   * median quirk (:342-354): sorted values pick index size/2 when even but
#     size/2+1 when odd — one PAST the middle (for 3 values, the maximum).
#   * date dead-store quirk (:356-372): the loop overwrites avgSeconds with
#     each parsed right value instead of summing, so the "average" is the
#     LAST successfully-parsed date's epoch seconds divided by (1+len(rights));
#     parse failures keep the partial value (ParseException swallowed).
#     Documented divergence: we render the result as an ISO timestamp string,
#     not Java's locale/zone-dependent Date.toString().
#   * voting (:322-340): first value to strictly EXCEED the running max wins
#     (left seeded at 1), so ties keep the earliest-established winner.

_NULL = "null"


def _vote_first_to_exceed(left: str, rights: list[str]) -> str:
    counts = {left: 1}
    best, mx = left, 1
    for r in rights:
        c = counts.get(r, 0) + 1
        counts[r] = c
        if c > mx:
            mx, best = c, r
    return best


def _median_quirk(left: str, rights: list[str]) -> str:
    vals = sorted([float(left)] + [float(r) for r in rights])
    n = len(vals)
    idx = n // 2 if n % 2 == 0 else n // 2 + 1
    return str(vals[idx])


def _avg_seconds_deadstore(left: str, rights: list[str]) -> int:
    from datetime import timezone

    from ..functions.parsers import parse_date

    def _epoch(d) -> int:              # TZ-free: parsed dates are naive UTC
        return int(d.replace(tzinfo=timezone.utc).timestamp())

    secs = 0
    d = parse_date(left)
    if d is None:                      # ParseException analog: keep partial
        return int(secs / (1 + len(rights)))
    secs = _epoch(d)
    for s in rights:
        d2 = parse_date(s)
        if d2 is None:
            break
        secs = _epoch(d2)              # dead store kept: overwrites, not +=
    return int(secs / (1 + len(rights)))


def _merge_values(left: str, rights: list[str], data_type: str,
                  cfg: PipelineConfig) -> str:
    """One row of mergeColumns (:218-306): same → left, null-fill both ways,
    else the per-dtype resolution strategy."""
    from ..config import NumericResolution, StringResolution

    if all(r == left for r in rights):
        return left
    if left == _NULL:
        return next((r for r in rights if r != _NULL), _NULL)
    if all(r == _NULL for r in rights):
        return left
    if data_type in ("string", "link"):
        if cfg.string_resolution == StringResolution.longest:
            best, mx = left, len(left)
            for r in rights:           # strict > : left wins length ties
                if len(r) > mx:
                    mx, best = len(r), r
            return best
        if cfg.string_resolution == StringResolution.voting:
            return _vote_first_to_exceed(left, rights)
        return left
    if data_type == "bool":
        return left                    # reference TODO: keeps left (:259-262)
    if data_type in ("numeric", "coordinate", "unit"):
        try:
            if cfg.numeric_resolution == NumericResolution.median:
                return _median_quirk(left, rights)
            if cfg.numeric_resolution == NumericResolution.average:
                vals = [float(left)] + [float(r) for r in rights]
                return str(sum(vals) / len(vals))
            if cfg.numeric_resolution == NumericResolution.voting:
                return _vote_first_to_exceed(left, rights)
        except (TypeError, ValueError):
            pass                       # exception swallowed → keep left
        return left
    if data_type == "date":
        try:
            secs = _avg_seconds_deadstore(left, rights)
            from datetime import datetime, timezone

            return datetime.fromtimestamp(secs, tz=timezone.utc) \
                .strftime("%Y-%m-%d %H:%M:%S")
        except (OverflowError, OSError, ValueError):
            return left
    return left


def merge_duplicate_columns(
    columns: list[ColumnRef],
    instance_matches: dict[str, list[str]],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    keys: set[str] | None = None,
) -> tuple[list[ColumnRef], set[str]]:
    """resolveDuplicates (:33-79): each instance-match group (left column +
    matched partners, the shape ``decide_object_matching`` emits) merges into
    ONE column — header/source concatenated with ``||``, dtype = left's,
    key flag OR'd across the group — values resolved row-wise by
    ``_merge_values``.  Unmatched columns pass through unchanged, in table
    order after the merged ones (reference appends them the same way,
    :71-76).  Returns (columns, merged-column-ids flagged as keys)."""
    keys = keys or set()
    by_id = {c.column_id: c for c in columns}
    consumed: set[str] = set()
    out: list[ColumnRef] = []
    out_keys: set[str] = set()
    for left_id in sorted(instance_matches):
        right_ids = instance_matches[left_id]
        if left_id not in by_id or any(r not in by_id for r in right_ids):
            continue
        left = by_id[left_id]
        rights = [by_id[r] for r in right_ids]
        consumed.add(left_id)
        consumed.update(right_ids)
        header = left.header + "".join("||" + r.header for r in rights)
        source = left.source + "".join("||" + r.source for r in rights)
        merged_vals: dict[int, str] = {}
        for idx, lv in left.values.items():
            rvs = [r.values.get(idx, _NULL) for r in rights]
            merged_vals[idx] = _merge_values(lv, rvs, left.data_type, cfg)
        merged = ColumnRef(column_id=left_id, header=header,
                           data_type=left.data_type, source=source,
                           values=merged_vals)
        out.append(merged)
        if left_id in keys or any(r in keys for r in right_ids):
            out_keys.add(left_id)
    for c in columns:
        if c.column_id not in consumed:
            out.append(c)
            if c.column_id in keys:
                out_keys.add(c.column_id)
    return out, out_keys


# ---------------------------------------------------------------------------
# Dataset stage: score candidate column pairs
# ---------------------------------------------------------------------------

PAIR_SCORE_SCHEMA = pa.schema([
    ("left_col", pa.string()),
    ("right_col", pa.string()),
    ("data_type", pa.string()),
    ("score", pa.float64()),
    ("count", pa.int64()),
    ("complement", pa.int64()),
    ("label_score", pa.float64()),
    ("wordnet_label_score", pa.float64()),
])


def score_pairs_batch(df: pd.DataFrame,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Candidate pair rows with columns (left_col, right_col, left_header,
    right_header, data_type_left, data_type_right, left_source, right_source,
    left_values, right_values [dict row->value]) → scored pairs.  Same-source
    or type-mismatched pairs score 0 and are dropped."""
    out = {n: [] for n in PAIR_SCORE_SCHEMA.names}
    for _, r in df.iterrows():
        if r["data_type_left"] != r["data_type_right"]:
            continue
        if r.get("left_source") and r.get("left_source") == r.get("right_source"):
            continue
        csv = score_column_pair(r["left_values"], r["right_values"],
                                r["data_type_left"],
                                sample_ratio=cfg.instance_sample_ratio)
        out["left_col"].append(r["left_col"])
        out["right_col"].append(r["right_col"])
        out["data_type"].append(r["data_type_left"])
        out["score"].append(csv.average)
        out["count"].append(csv.count)
        out["complement"].append(csv.complement)
        out["label_score"].append(label_similarity(r["left_header"], r["right_header"]))
        # the raw matchStrings channel (ngram-Jaccard × WordNet tier) rides
        # beside the 0..1 similarity — the reference's label-based matcher
        # score (TablesLabeledBasedMatcher.calculateScores)
        out["wordnet_label_score"].append(
            match_strings(r["left_header"], r["right_header"]))
    return pd.DataFrame(out)


def score_pairs_ds(pairs_ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    return pairs_ds.map_batches(lambda df: score_pairs_batch(df, cfg),
                                batch_format="pandas")
