"""Deterministic synthetic page corpus (FIXTURES.md F1) + entity gazetteer (F4)
+ spec-derived goldens (F2 text, F3 triples, F5 links).

Schema per BASELINE.json input_hint:
  pages(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)

Determinism: every page is generated from ``rng(seed ^ page_id)`` only, so any
partitioning of page ids yields identical bytes — generation itself runs as a
Ray Data ``map_batches`` over ``range(n_pages)``.

Goldens are derived from the page SPEC (the structured cell values and declared
key/type columns), NOT from the HTML-parsing stages they verify.  The expected
triple set re-derives the reference Triplifier rules (SJ/IO/Triplifier.java:31-159)
in straight-line spec-driven form; the expected text is the block sequence the
extractor contract promises (see stages/extract.py docstring).
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass, field

import numpy as np

from ..functions.normalize import (
    capitalize_words,
    clean_web_header,
    get_human_header,
    simple_string_normalization,
)

NS = "http://table.searchjoins.de/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
OWL_DATATYPE_PROPERTY = "http://www.w3.org/2002/07/owl#DatatypeProperty"

_TLDS = ["com", "org", "net", "de", "co.uk"]
_DOMAINS = ["alpha", "bravo", "canyon", "delta", "echo", "falcon", "gamma", "harbor"]

_ADJ = ["red", "blue", "green", "silver", "golden", "north", "south", "east",
        "west", "upper", "lower", "grand", "little", "new", "old", "royal"]
_NOUN = ["river", "mountain", "city", "valley", "harbor", "bridge", "castle",
         "forest", "island", "lake", "tower", "garden", "temple", "market",
         "station", "museum"]

_HEAD_TYPES = ["Place", "Person", "Organisation"]
_TAIL_TYPES = ["Work", "Species", "Event", "Device", "Food", "Sport", "Award"]

_PARA_WORDS = ("the quick brown fox jumps over the lazy dog while many people "
               "visit the old market near the river and watch boats pass under "
               "the stone bridge every summer evening with great interest").split()

# column kinds a generated table can carry (key column is always "key")
_VALUE_KINDS = ["numeric", "date", "unit", "link", "coordinate", "string"]
_KIND_HEADERS = {
    "numeric": ["population", "score", "total area", "budget", "height"],
    "date": ["founded", "updated", "birth date", "release"],
    "unit": ["area", "weight", "distance", "duration"],
    "link": ["website", "homepage", "source link"],
    "coordinate": ["location", "position"],
    "string": ["description", "category", "region", "color", "status"],
}
_KIND_OBJ_TYPE = {
    "numeric": "float", "date": "date", "unit": "float",
    "coordinate": "float", "string": "string", "bool": "boolean",
}


# ---------------------------------------------------------------------------
# Gazetteer (F4)
# ---------------------------------------------------------------------------

def entity_label(eid: int) -> str:
    a = _ADJ[eid % len(_ADJ)]
    n = _NOUN[(eid // len(_ADJ)) % len(_NOUN)]
    return f"{a} {n} {eid}"


def entity_type(eid: int) -> str:
    # ~30% of entities land in 3 head types (hot-key skew per F4)
    if eid % 10 < 3:
        return _HEAD_TYPES[eid % 3]
    return _TAIL_TYPES[eid % len(_TAIL_TYPES)]


_ATTR_REGIONS = ["north region", "south region", "east region", "west region",
                 "central region", "coastal region"]
_ATTR_COLORS = ["red", "blue", "green", "silver", "golden", "white"]


def entity_attrs(eid: int) -> list[str]:
    """Deterministic sibling-attribute values for an entity (the entity-table
    row context the reference's refine-attrs search matches against,
    IndexManager.findRefineAttrsMatches, SJ/index/IndexManager.java:677-746)."""
    return [
        _ATTR_REGIONS[eid % len(_ATTR_REGIONS)],
        _ATTR_COLORS[(eid // len(_ATTR_REGIONS)) % len(_ATTR_COLORS)],
        f"founded {1900 + eid % 100}",
    ]


def make_gazetteer(num_entities: int, ambiguous_pairs: int = 0) -> dict:
    """Columns: entity_uri, label, aliases(list<str>), entity_type,
    attrs(list<str>).

    ``ambiguous_pairs > 0`` appends one twin per entity 0..n-1 sharing the
    SAME label but DIFFERENT attrs (uri suffix ``Alt``) — the fixture for
    refine-attrs context scoring: without row context the twins tie on label
    evidence; with context the attribute overlap decides."""
    uris, labels, aliases, types, attrs = [], [], [], [], []
    for eid in range(num_entities):
        label = entity_label(eid)
        uris.append(NS + capitalize_words(label).replace(" ", ""))
        labels.append(label)
        als = [label.upper(), label.replace(" ", "  ", 1)]
        if len(label) > 4:
            als.append(label[:-1])  # edit distance 1
        aliases.append(als)
        types.append(entity_type(eid))
        attrs.append(entity_attrs(eid))
    for eid in range(min(ambiguous_pairs, num_entities)):
        label = entity_label(eid)
        uris.append(NS + capitalize_words(label).replace(" ", "") + "Alt")
        labels.append(label)
        aliases.append([label.upper()])
        types.append(entity_type(eid))
        # offset picks a disjoint (region, color) combination for the twin
        attrs.append(entity_attrs(eid + 7))
    return {"entity_uri": uris, "label": labels, "aliases": aliases,
            "entity_type": types, "attrs": attrs}


def _scale_word(i: int, salt: int) -> str:
    """Deterministic pronounceable-ish token from a hash — base-26 letters."""
    import hashlib

    h = int.from_bytes(hashlib.blake2b(f"{salt}:{i}".encode(),
                                       digest_size=6).digest(), "little")
    out = []
    for _ in range(5):
        out.append(chr(ord("a") + h % 26))
        h //= 26
    return "".join(out)


def make_scale_gazetteer_batch(batch) -> "dict":
    """Batch generator for the LARGE-gazetteer bench (100k–1M entities):
    ``rd.range(n).map_batches(make_scale_gazetteer_batch)``.

    Labels are ``<word_a> <word_b> <eid>`` with word_a/word_b drawn from
    4096-word pools, so token document frequency stays ~n/4096 (a real KB's
    vocabulary grows with the KB; the toy ``make_gazetteer`` cycles ~20
    adjectives/nouns, which at 200k entities gives every token df≈10k and
    makes EVERY mention match 10k candidates — a vocabulary artifact, not a
    linking workload)."""
    eids = batch["id"].tolist() if hasattr(batch["id"], "tolist") \
        else list(batch["id"])
    uris, labels, aliases, types, attrs = [], [], [], [], []
    for eid in eids:
        eid = int(eid)
        a = _scale_word(eid % 4096, 1)
        b = _scale_word((eid // 7) % 4096, 2)
        label = f"{a} {b} {eid}"
        uris.append(NS + f"E{eid}")
        labels.append(label)
        aliases.append([label.upper()])
        types.append(entity_type(eid))
        attrs.append(entity_attrs(eid))
    return {"entity_uri": uris, "label": labels, "aliases": aliases,
            "entity_type": types, "attrs": attrs}


def scale_gazetteer_label(eid: int) -> str:
    a = _scale_word(eid % 4096, 1)
    b = _scale_word((eid // 7) % 4096, 2)
    return f"{a} {b} {eid}"


# ---------------------------------------------------------------------------
# Page spec
# ---------------------------------------------------------------------------

@dataclass
class TableSpec:
    headers: list[str]
    kinds: list[str]          # per column: "key" | one of _VALUE_KINDS
    rows: list[list[str]]     # raw cell strings as they appear in HTML
    key_idx: int              # -1 when the table has no identifiable key
    valid: bool               # meets min_cols/min_rows
    entity_ids: list[int] = field(default_factory=list)  # per row, -1 = distractor


@dataclass
class PageSpec:
    page_id: int
    url: str
    warc_ts: int              # microseconds since epoch
    lang: str
    paragraphs: list[str]
    tables: list[TableSpec]


def _numeric_value(rng) -> str:
    return f"{rng.uniform(100.0, 99999.0):.2f}"


def _date_value(rng) -> str:
    y = int(rng.integers(1950, 2020))
    m = int(rng.integers(1, 13))
    d = int(rng.integers(1, 28))
    style = int(rng.integers(0, 3))
    if style == 0:
        return f"{y}-{m:02d}-{d:02d}"
    if style == 1:
        months = ["January", "February", "March", "April", "May", "June", "July",
                  "August", "September", "October", "November", "December"]
        return f"{d} {months[m - 1]} {y}"
    return f"{m:02d}/{d:02d}/{y}"


def _unit_value(rng) -> str:
    choices = [("kg", 1.0), ("km", 1.0), ("sqkm", 1.0), ("mph", 1.0)]
    abbr, _ = choices[int(rng.integers(0, len(choices)))]
    return f"{rng.uniform(1.0, 900.0):.1f}{abbr}"


def _link_value(rng) -> str:
    d = _DOMAINS[int(rng.integers(0, len(_DOMAINS)))]
    return f"http://www.{d}-site.com/info{int(rng.integers(0, 1000))}"


def _coordinate_value(rng) -> str:
    return f"{rng.uniform(-80, 80):.3f} {rng.uniform(-170, 170):.3f}"


def _string_value(rng) -> str:
    k = int(rng.integers(2, 5))
    words = [_PARA_WORDS[int(rng.integers(0, len(_PARA_WORDS)))] for _ in range(k)]
    return " ".join(words)


_VALUE_FNS = {
    "numeric": _numeric_value, "date": _date_value, "unit": _unit_value,
    "link": _link_value, "coordinate": _coordinate_value, "string": _string_value,
}


def _make_table_spec(rng, num_entities: int, force_invalid: bool = False,
                     keyless: bool = False) -> TableSpec:
    if force_invalid:
        # too few columns or rows (ConvertFileToTable.isTableValid: <3 cols or <5 rows)
        if rng.random() < 0.5:
            headers, kinds = ["name", "score"], ["key", "numeric"]
            n_rows = int(rng.integers(5, 12))
        else:
            headers = ["name", "score", "founded"]
            kinds = ["key", "numeric", "date"]
            n_rows = int(rng.integers(1, 5) - 1) or 1
    elif keyless:
        # No identifiable key: every column fails the heuristic — repeated
        # category words (uniqueness < 0.6), tiny numbers (avg len <= 3),
        # overlong text (avg len > 50).  TableKeyIdentifier.java:96-162.
        headers = ["category", "count", "note"]
        kinds = ["string", "numeric", "string"]
        n_rows = int(rng.integers(5, 20))
        cats = ["summer", "winter"]
        rows = [[cats[r % 2], str(int(rng.integers(1, 99))),
                 " ".join(_PARA_WORDS[int(rng.integers(0, len(_PARA_WORDS)))]
                          for _ in range(12))]
                for r in range(n_rows)]
        return TableSpec(headers=headers, kinds=kinds, rows=rows, key_idx=-1,
                         valid=True, entity_ids=[-1] * n_rows)
    else:
        n_cols = int(rng.integers(3, 9))
        n_rows = int(rng.integers(5, 51))
        kinds = ["key"]
        headers = ["name"]
        for c in range(1, n_cols):
            kind = _VALUE_KINDS[int(rng.integers(0, len(_VALUE_KINDS)))]
            kinds.append(kind)
            hs = _KIND_HEADERS[kind]
            headers.append(hs[int(rng.integers(0, len(hs)))] + (f" {c}" if c > 1 else ""))

    rows: list[list[str]] = []
    entity_ids: list[int] = []
    used: set[int] = set()
    for r in range(n_rows):
        if keyless:
            key_val = _string_value(rng)  # low-uniqueness-ish free text, no 'name' header
            eid = -1
        else:
            eid = int(rng.integers(0, num_entities))
            while eid in used:
                eid = (eid + 1) % num_entities
            used.add(eid)
            key_val = entity_label(eid)
            if rng.random() < 0.15:  # alias/case-noise mention
                key_val = key_val.upper() if rng.random() < 0.5 else key_val + " "
        row = []
        for kind in kinds:
            if kind == "key":
                row.append(key_val)
            else:
                row.append(_VALUE_FNS[kind](rng))
        rows.append(row)
        entity_ids.append(eid)

    key_idx = -1 if keyless else 0
    valid = (len(headers) >= 3 and len(rows) >= 5)
    return TableSpec(headers=headers, kinds=kinds, rows=rows, key_idx=key_idx,
                     valid=valid and not force_invalid, entity_ids=entity_ids)


def make_page_spec(page_id: int, seed: int = 42, num_entities: int = 500) -> PageSpec:
    rng = np.random.default_rng((seed << 32) ^ page_id)
    tld = _TLDS[page_id % len(_TLDS)]
    domain = _DOMAINS[page_id % len(_DOMAINS)]
    url = f"http://{domain}{page_id % 20}.{tld}/page{page_id}"
    warc_ts = 1_600_000_000_000_000 + page_id * 1_000_000
    lang = "en" if page_id % 17 else ("de" if page_id % 2 else "")

    n_paras = int(rng.integers(1, 4))
    paragraphs = []
    for _ in range(n_paras):
        k = int(rng.integers(8, 25))
        idx = rng.integers(0, len(_PARA_WORDS), size=k)
        paragraphs.append(" ".join(_PARA_WORDS[i] for i in idx))

    tables: list[TableSpec] = []
    r = rng.random()
    if r < 0.6:  # 60% of pages carry 1-3 tables
        n_tables = int(rng.integers(1, 4))
        for t in range(n_tables):
            roll = rng.random()
            tables.append(_make_table_spec(
                rng, num_entities,
                force_invalid=(roll < 0.15),
                keyless=(0.15 <= roll < 0.25),
            ))
    return PageSpec(page_id=page_id, url=url, warc_ts=warc_ts, lang=lang,
                    paragraphs=paragraphs, tables=tables)


# ---------------------------------------------------------------------------
# HTML rendering + expected text (the extraction contract)
# ---------------------------------------------------------------------------

def render_html(spec: PageSpec) -> bytes:
    parts = [
        "<!DOCTYPE html><html><head><title>",
        _html.escape(f"Page {spec.page_id}"),
        "</title><style>body{font:12px}</style>",
        "<script>var x = 1 < 2;</script></head><body>",
        '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>',
        f"<h1>Page {spec.page_id}</h1>",
    ]
    for i, para in enumerate(spec.paragraphs):
        parts.append(f"<p>{_html.escape(para)}</p>")
        if i == 0 and spec.tables:
            for ts in spec.tables:
                parts.append("<table><tr>")
                parts.extend(f"<th>{_html.escape(h)}</th>" for h in ts.headers)
                parts.append("</tr>")
                for row in ts.rows:
                    parts.append("<tr>")
                    parts.extend(f"<td>{_html.escape(c)}</td>" for c in row)
                    parts.append("</tr>")
                parts.append("</table>")
    parts.append('<footer>Copyright 2020 — <a href="/imprint">Imprint</a></footer>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def expected_text(spec: PageSpec) -> str:
    """The extraction contract: title dropped, nav/footer/script/style dropped,
    block elements on their own lines, table rows tab-joined, whitespace runs
    collapsed inside a block, blocks joined with '\\n'."""
    blocks = [f"Page {spec.page_id}"]
    for i, para in enumerate(spec.paragraphs):
        blocks.append(" ".join(para.split()))
        if i == 0 and spec.tables:
            for ts in spec.tables:
                blocks.append("\t".join(" ".join(h.split()) for h in ts.headers))
                for row in ts.rows:
                    blocks.append("\t".join(" ".join(c.split()) for c in row))
    return "\n".join(blocks)


# ---------------------------------------------------------------------------
# Spec-derived golden triples (reference Triplifier rules, straight-line form)
# ---------------------------------------------------------------------------

def _subject_uri(normalized_key: str) -> str:
    return NS + capitalize_words(normalized_key).replace(" ", "")


def _predicate_uri(header: str) -> str:
    import re as _re
    h = get_human_header(clean_web_header(header))
    return NS + _re.sub(r"\(.*\)", "", h.replace(" ", ""))


def _property_uri(header: str) -> str:
    return NS + capitalize_words(clean_web_header(header)).replace(" ", "")


def golden_triples_for_page(spec: PageSpec) -> list[tuple[str, str, str, str, str]]:
    """(subj, pred, obj, obj_type, source_url) rows expected from this page.

    Mirrors Triplifier.triplifyTable (SJ/IO/Triplifier.java:41-114): per key
    value emit rdf:type + rdfs:label + one triple per non-key cell; per table
    emit class + property declaration triples.  Literals are the normalized
    cell values re-capitalized by addBrackets (:129-159); null objects are
    skipped (sane divergence from the reference's null-line artifact).
    """
    out: list[tuple[str, str, str, str, str]] = []
    for ts in spec.tables:
        if not ts.valid or ts.key_idx < 0:
            continue
        key_header = clean_web_header(ts.headers[ts.key_idx])
        class_uri = NS + capitalize_words(key_header).replace(" ", "")
        class_label = capitalize_words(key_header)
        seen_key = False
        for row in ts.rows:
            key_norm = simple_string_normalization(row[ts.key_idx])
            if key_norm in ("", "null", "string"):
                continue
            seen_key = True
            subj = _subject_uri(key_norm)
            out.append((subj, RDF_TYPE, class_uri, "uri", spec.url))
            out.append((subj, RDFS_LABEL, capitalize_words(key_norm), "string", spec.url))
            for ci, (header, kind) in enumerate(zip(ts.headers, ts.kinds)):
                if ci == ts.key_idx:
                    continue
                obj_norm = simple_string_normalization(row[ci])
                if obj_norm in ("", "null"):
                    continue
                pred = _predicate_uri(header)
                if "http" in obj_norm:
                    out.append((subj, pred, obj_norm, "uri", spec.url))
                else:
                    out.append((subj, pred, capitalize_words(obj_norm),
                                _KIND_OBJ_TYPE.get(kind, "string"), spec.url))
        if seen_key:
            out.append((class_uri, RDF_TYPE, OWL_CLASS, "uri", spec.url))
            out.append((class_uri, RDFS_LABEL, class_label, "string", spec.url))
            for ci, header in enumerate(ts.headers):
                if ci == ts.key_idx:
                    continue
                prop = _property_uri(header)
                out.append((prop, RDF_TYPE, OWL_DATATYPE_PROPERTY, "uri", spec.url))
                out.append((prop, RDFS_LABEL,
                            capitalize_words(clean_web_header(header)), "string", spec.url))
    return out


def golden_links_for_page(spec: PageSpec) -> list[tuple[str, int, int, str, str]]:
    """(url, table_idx, row_idx, mention, entity_uri) expected top-1 links (F5)."""
    out = []
    for ti, ts in enumerate(spec.tables):
        if not ts.valid or ts.key_idx < 0:
            continue
        for ri, (row, eid) in enumerate(zip(ts.rows, ts.entity_ids)):
            if eid < 0:
                continue
            uri = NS + capitalize_words(entity_label(eid)).replace(" ", "")
            out.append((spec.url, ti, ri, row[ts.key_idx], uri))
    return out


# ---------------------------------------------------------------------------
# Batch generation (Ray Data map_batches-compatible: page ids in, pages out)
# ---------------------------------------------------------------------------

def generate_pages_batch(batch: dict, seed: int = 42,
                         num_entities: int = 500) -> dict:
    """dict(id=np.ndarray[int64]) → pages columns.  Pure function of ids."""
    ids = batch["id"]
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for pid in ids:
        spec = make_page_spec(int(pid), seed=seed, num_entities=num_entities)
        urls.append(spec.url)
        tss.append(spec.warc_ts)
        htmls.append(render_html(spec))
        texts.append(expected_text(spec))
        langs.append(spec.lang)
    return {
        "url": np.array(urls, dtype=object),
        "warc_ts": np.array(tss, dtype="datetime64[us]"),
        "html": np.array(htmls, dtype=object),
        "text": np.array(texts, dtype=object),
        "lang": np.array(langs, dtype=object),
    }


def write_corpus(path: str, n_pages: int, seed: int = 42,
                 num_entities: int = 500, parallelism: int | None = None) -> None:
    """Generate the corpus to partitioned Parquet via Ray Data (idempotent:
    skips when the output directory already exists and is non-empty)."""
    import os
    import shutil

    import ray.data as rd

    done_marker = path.rstrip("/") + ".complete"  # outside the dir so
    # read_parquet(dir) never sees a non-parquet file
    if os.path.exists(done_marker):
        return
    if os.path.isdir(path):
        # partial output from a killed run — regenerate from scratch
        shutil.rmtree(path)
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    nblocks = parallelism or max(2, n_pages // 2000)
    ds = rd.range(n_pages, override_num_blocks=nblocks)
    ds = ds.map_batches(
        generate_pages_batch,
        fn_kwargs={"seed": seed, "num_entities": num_entities},
        batch_format="numpy",
        batch_size=1000,
    )
    # bound rows per file: fragments are BOTH the unit of sharded resume AND
    # the unit of read parallelism (a Common-Crawl corpus has thousands of
    # WARC-derived files; one row group per small file can't be split, so
    # under-fragmenting caps every downstream map stage)
    per_file = max(50, min(250, n_pages // 32))
    ds.write_parquet(tmp, max_rows_per_file=per_file, min_rows_per_file=1)
    os.replace(tmp, path)
    with open(done_marker, "w") as fh:
        fh.write("ok")
