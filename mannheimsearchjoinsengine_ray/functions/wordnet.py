"""Bundled synonym/hypernym lexicon — the WordNet channel without WordNet.

Replaces the reference's JWI-backed WordnetAPI (SJ/lod/WordnetAPI.java:24-129:
getSynonyms / getHypernyms / getHyponyms over a local WordNet dictionary) with
a small hand-authored lexicon of table-header vocabulary (own public data —
common English synonym groups).  Loaded once per process (module import =
once per Ray worker), no network, no dictionary files.

The reference consumes these lists only through set-overlap checks inside
``LabelBasedComparer.matchStrings`` (:106-187), so a compact lexicon focused
on header-ish nouns preserves the mechanism; swap ``_SYNSETS``/``_HYPERNYMS``
for a full WordNet export to widen coverage.
"""

from __future__ import annotations

# synonym groups (symmetric): words in one group are mutual synonyms
_SYNSETS: list[set[str]] = [s if isinstance(s, set) else set(s) for s in [
    {"country", "nation", "state", "land"},
    {"city", "town", "municipality", "metropolis"},
    {"person", "people", "human", "individual"},
    {"company", "organisation", "organization", "firm", "corporation",
     "enterprise", "business"},
    {"name", "title", "label", "designation"},
    {"population", "inhabitants", "residents"},
    {"area", "region", "zone", "territory"},
    {"capital", "seat"},
    {"river", "stream", "waterway"},
    {"mountain", "peak", "mount"},
    {"lake", "loch"},
    {"street", "road", "avenue"},
    {"price", "cost", "charge"},
    {"revenue", "income", "earnings", "turnover"},
    {"profit", "gain", "surplus"},
    {"salary", "wage", "pay", "remuneration"},
    {"year", "yr"},
    {"date", "day"},
    {"begin", "start", "commence"},
    {"end", "finish", "conclusion"},
    {"founded", "established", "created"},
    {"born", "birth"},
    {"died", "death", "deceased"},
    {"height", "elevation", "altitude"},
    {"length", "distance"},
    {"weight", "mass"},
    {"speed", "velocity", "pace"},
    {"size", "magnitude", "dimension"},
    {"amount", "quantity", "number", "count"},
    {"total", "sum", "aggregate"},
    {"average", "mean"},
    {"rank", "rating", "position", "standing"},
    {"score", "points", "result"},
    {"winner", "champion", "victor"},
    {"team", "club", "squad", "side"},
    {"coach", "manager", "trainer"},
    {"player", "athlete", "sportsman"},
    {"film", "movie", "picture"},
    {"song", "track", "tune"},
    {"album", "record", "release"},
    {"author", "writer"},
    {"book", "volume", "publication"},
    {"language", "tongue"},
    {"currency", "money"},
    {"job", "occupation", "profession", "work"},
    {"school", "academy"},
    {"university", "college"},
    {"church", "chapel", "cathedral"},
    {"house", "home", "residence", "dwelling"},
    {"building", "structure", "edifice"},
    {"car", "automobile", "vehicle", "auto"},
    {"ship", "vessel", "boat"},
    {"plane", "aircraft", "airplane", "aeroplane"},
    {"type", "kind", "category", "class", "genre"},
    {"location", "place", "site", "position"},
    {"owner", "proprietor", "holder"},
    {"leader", "chief", "head", "boss"},
    {"king", "monarch", "sovereign"},
    {"spouse", "partner", "consort"},
    {"child", "kid", "offspring"},
    {"sex", "gender"},
    {"island", "isle"},
    {"sea", "ocean"},
    {"forest", "wood", "woodland"},
    {"valley", "vale", "glen"},
    {"bridge", "viaduct"},
    {"castle", "fortress", "fort"},
    {"market", "bazaar"},
    {"station", "depot", "terminal"},
    {"museum", "gallery"},
    {"garden", "park"},
    {"temple", "shrine"},
    {"harbor", "harbour", "port"},
    {"tower", "spire"},
    {"color", "colour", "hue"},
    {"status", "condition", "state"},
    {"description", "summary", "overview"},
    {"website", "homepage", "site"},
    {"budget", "funds", "allocation"},
]]

# child word -> set of ancestor (hypernym) words; symmetric descent gives
# hyponyms for free
_HYPERNYMS: dict[str, set[str]] = {
    "city": {"settlement", "place"},
    "town": {"settlement", "place"},
    "village": {"settlement", "place"},
    "country": {"place", "polity"},
    "river": {"water", "place"},
    "lake": {"water", "place"},
    "sea": {"water", "place"},
    "mountain": {"landform", "place"},
    "valley": {"landform", "place"},
    "island": {"landform", "place"},
    "king": {"ruler", "person"},
    "queen": {"ruler", "person"},
    "president": {"leader", "person"},
    "author": {"person"},
    "player": {"person"},
    "coach": {"person"},
    "car": {"vehicle"},
    "ship": {"vehicle"},
    "plane": {"vehicle"},
    "train": {"vehicle"},
    "film": {"work"},
    "song": {"work"},
    "album": {"work"},
    "book": {"work"},
    "dollar": {"currency"},
    "euro": {"currency"},
    "pound": {"currency"},
    "school": {"institution"},
    "university": {"institution"},
    "church": {"building", "institution"},
    "castle": {"building"},
    "tower": {"building"},
    "museum": {"building", "institution"},
}

_WORD_TO_SYNSET: dict[str, set[str]] = {}
for _group in _SYNSETS:
    for _w in _group:
        _WORD_TO_SYNSET.setdefault(_w, set()).update(_group)

_HYPONYMS: dict[str, set[str]] = {}
for _child, _parents in _HYPERNYMS.items():
    for _p in _parents:
        _HYPONYMS.setdefault(_p, set()).add(_child)


def known(word: str) -> bool:
    """True when the word is in the lexicon (WordnetAPI 'recognized')."""
    w = word.lower()
    return w in _WORD_TO_SYNSET or w in _HYPERNYMS or w in _HYPONYMS


def synonyms(word: str) -> set[str]:
    """Synset members of a word, including itself ('' set when unknown)."""
    return set(_WORD_TO_SYNSET.get(word.lower(), ()))


def hypernyms(word: str) -> set[str]:
    return set(_HYPERNYMS.get(word.lower(), ()))


def hyponyms(word: str) -> set[str]:
    return set(_HYPONYMS.get(word.lower(), ()))


def phrase_synonyms(phrase: str) -> set[str]:
    """Union of synonyms over a multi-word phrase's tokens (the reference
    calls getSynonyms on cleared strings that may hold several words)."""
    out: set[str] = set()
    for w in phrase.split():
        out |= synonyms(w)
    return out


def phrase_related(phrase: str) -> set[str]:
    """Synonyms ∪ hypernyms ∪ hyponyms over a phrase's tokens."""
    out: set[str] = set()
    for w in phrase.split():
        out |= synonyms(w)
        out |= hypernyms(w)
        out |= hyponyms(w)
    return out
