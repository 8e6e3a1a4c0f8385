"""Column data-type guessing.

Behavioral port of ColumnTypeGuesser.guessTypeForValue
(SJ/TableProcessor/ColumnTypeGuesser.java:41-97) and the per-column majority
vote TableColumn.setFinalDataType (SJ/model/TableColumn.java:288-313).

Guess order per value (order is semantics):
  1. list regex ``^\\{.+\\|.+\\}$``
  2. length > 50 disables unit/date/bool/coordinate/numeric (link still checked)
  3. unit (when enabled; header bracket hint tried first)
  4. date (DateUtil regex table; bare yyyy IS a date)
  5. bool — Java ``Boolean.parseBoolean``: only "true" (case-insensitive)
  6. link (URLParser)
  7. coordinate
  8. numeric (parseDouble or digit-ratio)
  9. default: string

Column type = argmax of per-value guess counts (nulls excluded); a bool
winner is demoted to numeric when any value is outside {0,1,true,false}.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable

from ..config import NULL_VALUE
from . import parsers
from .units import extract_unit_abbr_from_header, parse_unit

# The 9 reference types (TableColumn.java:23-25)
TYPES = ("numeric", "string", "coordinate", "date", "link", "bool", "unknown", "unit", "list")


_UNSET = object()


def guess_type_for_value(
    value: str, column_header: str | None = None, use_unit: bool = False,
    header_hint=_UNSET,
) -> str:
    if parsers.check_if_list(value):
        return "list"
    valid_length = len(value) <= 50
    if not valid_length:
        use_unit = False
    if use_unit:
        # callers looping over a column pass the hint precomputed — the
        # bracket-regex on the header is per-COLUMN state, not per value
        if header_hint is _UNSET:
            header_hint = extract_unit_abbr_from_header(column_header) \
                if column_header else None
        if parse_unit(value, header_hint=header_hint) is not None:
            return "unit"
    if valid_length and parsers.parse_date(value) is not None:
        return "date"
    if valid_length and parsers.parse_boolean_strict(value):
        return "bool"
    if parsers.parse_url(value):
        return "link"
    if valid_length and parsers.parse_geo_coordinate(value):
        return "coordinate"
    if valid_length and parsers.parse_numeric(value):
        return "numeric"
    return "string"


# worker-lifetime guess memo: corpora repeat values heavily across pages
# (entity attributes, categories, shared numbers), so the same (value, hint)
# guess recurs far beyond one column.  Bounded; stops adding when full.
_GUESS_MEMO: dict[tuple, str] = {}
_GUESS_MEMO_CAP = 500_000


def vote_column_type(values: Iterable[str], header: str | None = None,
                     use_unit: bool = False) -> str:
    """Majority vote over non-null values with the bool demotion check.

    Distinct (value, header-hint) pairs are guessed once per WORKER (module
    memo — repeated values dominate real web corpora); the vote still counts
    every occurrence, identical to the reference's per-value loop."""
    counts: Counter[str] = Counter()
    non_null: list[str] = []
    hint = extract_unit_abbr_from_header(header) \
        if (use_unit and header) else None
    memo = _GUESS_MEMO
    for v in values:
        if v is None or v == "" or v == NULL_VALUE:
            continue
        non_null.append(v)
        key = (v, hint, use_unit)
        t = memo.get(key)
        if t is None:
            t = guess_type_for_value(v, header, use_unit, header_hint=hint)
            if len(memo) < _GUESS_MEMO_CAP:
                memo[key] = t
        counts[t] += 1
    if not counts:
        return "string"
    winner = max(counts, key=lambda t: counts[t])
    if winner == "bool":
        for v in non_null:
            if v not in ("0", "1") and v.lower() not in ("true", "false"):
                winner = "numeric"
                break
    return winner
