"""Token-sharded inverted label index (the Lucene value index re-expressed).

Reference: IndexManager.indexValue (SJ/index/IndexManager.java:239-272) builds
one Lucene doc per cell posting behind a single synchronized 1-GB-buffer
IndexWriter; search tokenizes the query and ORs term queries with optional
fuzzy expansion (searchIndex :290-458).

New design (SURVEY §2.3): the index is DATA, not a side effect —

  build:  entities Dataset → explode (alias → posting rows) → tokenize →
          (token, entry_id, ...) posting Dataset → hash(token) % num_shards →
          one Parquet file per shard (written in parallel, no shared writer).
  serve:  each LinkerActor loads shard files once in __init__ into
          dict[token] -> np.ndarray[entry ids] + idf table.  The gazetteer is
          the SMALL side (≪ corpus) so full replication per actor is the
          broadcast-small-side pattern; at larger gazetteer scale actors load
          a shard subset and mentions route by their rarest token's shard
          (documented partitioning assumption).

Schema of a posting row:
  (token, entry_id, entity_uri, name_norm, n_tokens, is_primary)
entry_id indexes the per-shard string tables; is_primary marks the canonical
label vs aliases (IndexEntry.isPrimaryKey analog).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash64
from ..functions.normalize import clear_string, tokenize_string
from ..functions.similarity import jaccard, levenshtein

POSTING_SCHEMA = pa.schema([
    ("token", pa.string()),
    ("entity_uri", pa.string()),
    ("name_norm", pa.string()),
    ("n_tokens", pa.int32()),
    ("is_primary", pa.bool_()),
    ("entity_type", pa.string()),
    ("attrs_norm", pa.string()),   # '\x1f'-joined normalized sibling attrs
])

_ATTR_SEP = "\x1f"


def postings_from_entities_batch(batch: pa.Table) -> pa.Table:
    """entities(entity_uri, label, aliases[, entity_type, attrs]) → posting
    rows (one per token per name variant).  ``attrs`` (list<str>) are the
    entity's sibling-attribute values — indexed alongside every posting so the
    serving structure can score row context (refine-attrs,
    IndexManager.java:677-746) without a second lookup."""
    uris = batch.column("entity_uri").to_pylist()
    labels = batch.column("label").to_pylist()
    aliases = batch.column("aliases").to_pylist() if "aliases" in batch.column_names \
        else [[] for _ in uris]
    types = batch.column("entity_type").to_pylist() \
        if "entity_type" in batch.column_names else [""] * len(uris)
    attrs = batch.column("attrs").to_pylist() \
        if "attrs" in batch.column_names else [[] for _ in uris]
    cols = {n: [] for n in POSTING_SCHEMA.names}
    for uri, label, als, etype, ats in zip(uris, labels, aliases, types, attrs):
        attrs_norm = _ATTR_SEP.join(
            " ".join(tokenize_string(a, remove_brackets=True))
            for a in (ats or []) if a)
        names = [(label, True)] + [(a, False) for a in (als or [])]
        seen_norms = set()
        for name, primary in names:
            toks = tokenize_string(name, remove_brackets=True)
            norm = " ".join(toks)
            if not toks or norm in seen_norms:
                continue
            seen_norms.add(norm)
            for t in set(toks):
                cols["token"].append(t)
                cols["entity_uri"].append(uri)
                cols["name_norm"].append(norm)
                cols["n_tokens"].append(len(toks))
                cols["is_primary"].append(primary)
                cols["entity_type"].append(etype)
                cols["attrs_norm"].append(attrs_norm)
    return pa.Table.from_pydict(cols, schema=POSTING_SCHEMA)


def add_shard_column(batch: pa.Table, num_shards: int) -> pa.Table:
    shard = hash64(batch.column("token").to_pylist()) % num_shards
    return batch.append_column("shard", pa.array(shard.astype("int32")))


def build_index(entities_ds, index_dir: str, num_shards: int = 8) -> int:
    """Distributed index build: postings → shard groupby → parallel shard
    writes.  Returns the number of postings."""
    os.makedirs(index_dir, exist_ok=True)
    postings = entities_ds.map_batches(postings_from_entities_batch,
                                       batch_format="pyarrow")
    sharded = postings.map_batches(
        lambda t: add_shard_column(t, num_shards), batch_format="pyarrow")

    def write_shard(group: pa.Table) -> pa.Table:
        sid = int(group.column("shard")[0].as_py())
        out = group.drop_columns(["shard"]).sort_by([("token", "ascending")])
        tmp = os.path.join(index_dir, f"shard_{sid:04d}.parquet.tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(index_dir, f"shard_{sid:04d}.parquet"))
        return pa.table({"shard": [sid], "postings": [out.num_rows]})

    stats = sharded.groupby("shard").map_groups(write_shard, batch_format="pyarrow")
    return int(sum(r["postings"] for r in stats.take_all()))


class LabelIndex:
    """In-memory serving structure over the shard files (loaded once per
    actor).  Mirrors IValueIndex (SJ/index/IValueIndex.java:7-11) with
    TF-IDF scoring in place of Lucene BM25."""

    def __init__(self, index_dir: str, shards: list[int] | None = None):
        files = sorted(
            os.path.join(index_dir, f) for f in os.listdir(index_dir)
            if f.startswith("shard_") and f.endswith(".parquet")
        )
        if shards is not None:
            keep = {f"shard_{s:04d}.parquet" for s in shards}
            files = [f for f in files if os.path.basename(f) in keep]
        if not files:
            raise FileNotFoundError(f"no index shards under {index_dir}")

        # Vectorized ingestion (pandas factorize/groupby — no per-posting
        # Python loop; matters at 10^6+ entities): entry identity is
        # (uri, name_norm); postings become token → sorted entry-id arrays.
        import pandas as pd

        tables = [pq.read_table(f) for f in files]
        t = pa.concat_tables(tables, promote_options="default") \
            if len(tables) > 1 else tables[0]
        df = pd.DataFrame({
            "token": t.column("token").to_pandas(),
            "uri": t.column("entity_uri").to_pandas(),
            "norm": t.column("name_norm").to_pandas(),
            "ntok": t.column("n_tokens").to_pandas(),
            "prim": t.column("is_primary").to_pandas(),
            "etype": t.column("entity_type").to_pandas()
            if "entity_type" in t.column_names else "",
            "anorm": t.column("attrs_norm").to_pandas()
            if "attrs_norm" in t.column_names else "",
        })
        eids, _ = pd.factorize(df["uri"] + "\x00" + df["norm"], sort=False)
        df["eid"] = eids
        firsts = df.drop_duplicates("eid").sort_values("eid")
        self.entries_uri: list[str] = firsts["uri"].tolist()
        self.entries_norm: list[str] = firsts["norm"].tolist()
        self.entries_ntok = firsts["ntok"].to_numpy()
        self.entries_primary: list[bool] = firsts["prim"].tolist()
        self.entries_type: list[str] = firsts["etype"].astype(str).tolist()
        # per entry: tuple of frozenset token sets, one per sibling attribute
        # (refine-attrs context, IndexManager.java:677-746)
        self.entries_attrs: list[tuple[frozenset, ...]] = [
            tuple(frozenset(a.split()) for a in anorm.split(_ATTR_SEP) if a)
            if anorm else ()
            for anorm in firsts["anorm"].astype(str).tolist()
        ]
        self._uri_to_first_eid: dict[str, int] = {}
        for i, u in enumerate(self.entries_uri):
            self._uri_to_first_eid.setdefault(u, i)

        self.postings: dict[str, np.ndarray] = {
            tok: np.unique(g.to_numpy()).astype(np.int64)
            for tok, g in df.groupby("token", sort=False)["eid"]
        }
        n_entries = max(1, len(self.entries_uri))
        self.idf: dict[str, float] = {
            t: float(np.log1p(n_entries / len(ids)))
            for t, ids in self.postings.items()
        }
        # (first_char, length) buckets for bounded fuzzy expansion
        self._fuzzy_buckets: dict[tuple[str, int], list[str]] = defaultdict(list)
        for t in self.postings:
            self._fuzzy_buckets[(t[0], len(t))].append(t)
        self.entries_ntok = np.asarray(self.entries_ntok, dtype=np.int32)

    def fuzzy_expand(self, token: str, max_edit: int = 1) -> list[str]:
        """Vocabulary tokens within edit distance (candidates bucketed by
        first char and length±1 — the cheap analog of Lucene's fuzzy term
        enumeration, IndexManager.java:341-358)."""
        out = []
        for dl in (-1, 0, 1):
            for cand in self._fuzzy_buckets.get((token[0], len(token) + dl), ()):
                if cand != token and levenshtein(token, cand, max_edit) <= max_edit:
                    out.append(cand)
        return out

    def entity_type_of(self, uri: str) -> str:
        """entity_type of the first entry with this uri ('' if unknown) —
        O(1) dict lookup (the list.index scan was a 10^6-entity trap)."""
        eid = self._uri_to_first_eid.get(uri)
        return self.entries_type[eid] if eid is not None else ""

    def search_scored(self, mention: str, fuzzy: bool = True,
                      max_edit: int = 1) -> list[tuple[int, float]]:
        """Context-independent candidate scan → [(entry_id, base_score)].

        Scoring: sum of idf over matched tokens, normalized by the larger of
        the mention/name token counts (OR-query TF-IDF), then blended 50/50
        with token-set Jaccard; exact normalized match pins to the top
        (exact-mode post-filter analog, IndexManager.java:409-436).  The
        result is cacheable per mention — context re-scoring happens in
        ``finalize``."""
        toks = tokenize_string(mention, remove_brackets=True)
        if not toks:
            return []
        norm = " ".join(toks)
        tokset = set(toks)

        acc: dict[int, float] = defaultdict(float)
        for t in tokset:
            ids = self.postings.get(t)
            if ids is None and fuzzy:
                for ft in self.fuzzy_expand(t, max_edit):
                    fids = self.postings[ft]
                    w = self.idf[ft] * 0.5  # fuzzy matches at half weight
                    for eid in fids:
                        acc[eid] += w
                continue
            if ids is None:
                continue
            w = self.idf[t]
            for eid in ids:
                acc[eid] += w

        results: list[tuple[int, float]] = []
        for eid, s in acc.items():
            name = self.entries_norm[eid]
            denom = max(len(tokset), int(self.entries_ntok[eid]))
            tfidf = s / max(1e-9, denom)
            jac = jaccard(tokset, set(name.split()))
            score = 0.5 * tfidf + 0.5 * jac
            if name == norm:
                score += 10.0  # exact normalized match dominates
            results.append((eid, score))
        return results

    def context_bonus(self, eid: int, context_toksets: list[set[str]],
                      refine_factor: float) -> float:
        """Refine-attrs term (ScoreEvaluator.assessIndexEntry,
        SJ/scoring/ScoreEvaluator.java:24-33): for each sibling cell of the
        query row, the best token-Jaccard against the entity's own attribute
        values counts as a refine hit when >= 0.5 (the cell value 'appears in
        that entity's row'); hit scores sum, weighted by refineAttrsFactor."""
        attrs = self.entries_attrs[eid]
        if not attrs or not context_toksets:
            return 0.0
        bonus = 0.0
        for ctoks in context_toksets:
            if not ctoks:
                continue
            best = 0.0
            for atoks in attrs:
                j = jaccard(ctoks, atoks)
                if j > best:
                    best = j
            if best >= 0.5:
                bonus += best
        return refine_factor * bonus

    def finalize(self, scored: list[tuple[int, float]], top_k: int,
                 context: list[str] | None = None,
                 refine_factor: float = 0.0
                 ) -> list[tuple[str, float, str, str]]:
        """(entry_id, base) candidates → deduped top-k
        [(entity_uri, score, matched_name_norm, entity_type)] with the
        refine-attrs context term blended in.

        Short-circuit: tokenizing the row context dominates linker cost
        (measured 3.6× at sf0.01), so the context term is only computed when
        it COULD change the top entity — ≥2 candidates, at least one with
        indexed attrs, and a top-two base-score margin within the maximum
        attainable bonus (refine_factor × context cells).  When skipped, the
        reported scores are the base scores (the top-1 decision is
        invariant)."""
        use_ctx = bool(context) and refine_factor > 0.0 and len(scored) > 1
        if use_ctx:
            cells = [c for c in context if c and c != "null"]
            max_bonus = refine_factor * len(cells)
            if not cells:
                use_ctx = False
            else:
                top2 = sorted(s for _, s in scored)[-2:]
                if top2[1] - top2[0] > max_bonus:
                    use_ctx = False
                elif not any(self.entries_attrs[eid] for eid, _ in scored):
                    use_ctx = False
        if use_ctx:
            ctoksets = [set(tokenize_string(c, remove_brackets=True))
                        for c in cells]
            results = [(eid, s + self.context_bonus(eid, ctoksets, refine_factor))
                       for eid, s in scored]
        else:
            results = scored
        rows = [(self.entries_uri[eid], score, self.entries_norm[eid],
                 self.entries_type[eid]) for eid, score in results]
        # rank by the score ROUNDED to 9 decimals with uri tie-break — the
        # exact ordering the SQL oracle uses, so a float-summation drift
        # inside the rounding window can never flip the top-1 between sides
        rows.sort(key=lambda r: (-round(r[1], 9), r[0]))
        # dedup per entity uri keeping best name (per-(value,table) dedup analog)
        seen: set[str] = set()
        out = []
        for uri, score, name, etype in rows:
            if uri in seen:
                continue
            seen.add(uri)
            out.append((uri, score, name, etype))
            if len(out) >= top_k:
                break
        return out

    def search(self, mention: str, top_k: int = 10, fuzzy: bool = True,
               max_edit: int = 1, context: list[str] | None = None,
               refine_factor: float = 0.0
               ) -> list[tuple[str, float, str, str]]:
        """→ [(entity_uri, score, matched_name_norm, entity_type)] by score
        desc; ``context`` (sibling cells of the mention's row) adds the
        refine-attrs term per assessIndexEntry."""
        return self.finalize(self.search_scored(mention, fuzzy, max_edit),
                             top_k, context, refine_factor)


def clear_mention(mention: str) -> str:
    """Canonical mention key (clearString; empty → 'null')."""
    return clear_string(mention, remove_brackets=True)
