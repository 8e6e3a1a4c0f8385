"""Token-sharded inverted label index (the Lucene value index re-expressed).

Reference: IndexManager.indexValue (SJ/index/IndexManager.java:239-272) builds
one Lucene doc per cell posting behind a single synchronized 1-GB-buffer
IndexWriter; search tokenizes the query and ORs term queries with optional
fuzzy expansion (searchIndex :290-458).

New design (SURVEY §2.3): the index is DATA, not a side effect —

  build:  entities Dataset → explode (alias → posting rows) → tokenize →
          distinct (token, entry) posting Dataset → hash(ENTITY) %
          num_shards → one Parquet file per shard (written in parallel, no
          shared writer), plus a global term dictionary (``vocab/``: token →
          document frequency) and ``_meta.json`` (global entry count, shard
          list, byte size).
  serve:  two modes —
          * replicated (small gazetteer): each LinkerActor loads ALL shards
            once in __init__ — the broadcast-small-side pattern.
          * shard-routed (large KB): each serving task loads ONE shard =
            a complete mini-index over 1/N of the entities (the Lucene
            scatter-gather design, one index many searchers:
            SJ/index/IndexManager.java:239-272).  Because entries are
            ENTITY-sharded, a candidate's whole score accumulates inside
            its home shard; with the build-time GLOBAL df/n_entries the
            per-shard scores equal the full-index scores exactly, and the
            gather step just concatenates candidate lists per mention.
            Token-routed sharding (mentions to their rarest token's shard)
            was rejected: a multi-token mention's idf contributions span
            token shards, so no single shard can reproduce the full score.
          Fuzzy expansion stays exact under sharding: the trigger "token
          missing from the GLOBAL vocabulary" consults the term dictionary
          (hash64-membership; 64-bit collisions are the documented
          approximation), and each shard expands over its LOCAL vocabulary
          only — the union over shards equals the full-index expansion
          because a fuzzy token contributes only through its own postings.

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


_VOCAB_DIR = "vocab"
_META_FILE = "_meta.json"
# LabelIndex resident bytes ≈ this × uncompressed Arrow posting bytes
# (measured 6.6× at a 1M-entity/3M-posting gazetteer; rounded up)
_MEM_INFLATION = 7


def add_shard_column(batch: pa.Table, num_shards: int) -> pa.Table:
    """ENTITY-hash shard assignment: an entry (uri, name_norm) and all its
    postings land on ONE shard, so each shard file is a complete mini-index
    over 1/N of the entities (the shard-routed serving contract)."""
    import pyarrow.compute as pc

    ent = pc.binary_join_element_wise(
        batch.column("entity_uri"), batch.column("name_norm"), "\x00")
    shard = hash64(ent.to_pylist()) % num_shards
    return batch.append_column("shard", pa.array(shard.astype("int32")))


def build_index(entities_ds, index_dir: str, num_shards: int = 8,
                fs=None, driver_final_bytes: int | None = None) -> int:
    """Index build: postings → distinct (token, entry) → [global df per
    token → ``vocab/``] + [entity-shard split → one Parquet file per
    shard] + ``_meta.json`` (global n_entries, live shards, bytes).
    Returns the number of distinct postings.

    The posting map runs as ONE Dataset job and is materialized to MEASURE
    the posting bytes (the ``two_phase_agg`` pattern).  Under
    ``driver_final_bytes`` (default ``GRAFT_INDEX_DRIVER_BYTES`` or the
    house 32 MB guard) the dedupe/df/vocab/shard finish happens ON THE
    DRIVER — the distributed tail is three more exchanges over the posting
    set (distinct, df aggregate, shard groupby), ~1.5–2 s of fixed task
    overhead for a kilobyte-scale gazetteer (BASELINE.md #44).  Above the
    guard every step stays distributed; the artifact layout is identical
    either way (equivalence pinned by
    ``test_index_build_local_distributed_identical``).

    ``fs``: optional ``pyarrow.fs.FileSystem`` for ``index_dir`` — the
    shared-storage index build (shard writers run in Ray tasks and carry
    the pickled fs).  ``None`` = POSIX fast path (see ``state/fsio.py``)."""
    from ..stages.aggregates import (
        DRIVER_FINAL_BYTES,
        dedupe_by_key,
        two_phase_agg,
    )
    from . import fsio

    if driver_final_bytes is None:
        driver_final_bytes = int(os.environ.get(
            "GRAFT_INDEX_DRIVER_BYTES", DRIVER_FINAL_BYTES))

    fsio.makedirs(fs, index_dir)
    # a rebuild with fewer live shards must not leave stale files behind —
    # the full-load LabelIndex globs shard_*.parquet
    for f in fsio.listdir(fs, index_dir):
        if f.startswith("shard_") or f == _META_FILE:
            fsio.remove(fs, os.path.join(index_dir, f))
    fsio.rmtree(fs, os.path.join(index_dir, _VOCAB_DIR))

    postings = entities_ds.map_batches(postings_from_entities_batch,
                                       batch_format="pyarrow").materialize()
    if (postings.size_bytes() or 0) <= driver_final_bytes:
        import ray as _ray

        refs = postings.to_arrow_refs()
        blocks = [b for b in _ray.get(refs) if b.num_rows] if refs else []
        # empty blocks pass through with the INPUT schema (Ray never calls
        # the UDF on them) — an all-empty pull must still be POSTING_SCHEMA
        tbl = pa.concat_tables(blocks) if blocks \
            else POSTING_SCHEMA.empty_table()
        return _build_index_driver(tbl, index_dir, num_shards, fs)

    def add_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ent = pc.binary_join_element_wise(
            t.column("entity_uri"), t.column("name_norm"), "\x00")
        key = pc.binary_join_element_wise(t.column("token"), ent, "\x00")
        return t.append_column("__key", key)

    # duplicate gazetteer rows (same uri+norm) must collapse BEFORE df:
    # document frequency is distinct-entry count per token — the serving
    # structure factorizes to the same set, so idf stays bit-identical
    # between the replicated and shard-routed paths
    deduped = dedupe_by_key(
        postings.map_batches(add_key, batch_format="pyarrow"),
        "__key").materialize()
    n_postings = deduped.count()

    vocab_tmp = os.path.join(index_dir, _VOCAB_DIR + ".tmp")
    vocab_dir = os.path.join(index_dir, _VOCAB_DIR)
    fsio.rmtree(fs, vocab_tmp)
    df_ds = two_phase_agg(deduped, ["token"], {"df": (None, "count")})
    if fs is None:
        df_ds.write_parquet(vocab_tmp)
    else:
        df_ds.write_parquet(vocab_tmp, filesystem=fs)
    fsio.rmtree(fs, vocab_dir)
    fsio.move(fs, vocab_tmp, vocab_dir)

    sharded = deduped.map_batches(
        lambda t: add_shard_column(t.drop_columns(["__key"]), num_shards),
        batch_format="pyarrow")

    def write_shard(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sid = int(group.column("shard")[0].as_py())
        out = group.drop_columns(["shard"]).sort_by([("token", "ascending")])
        tmp = os.path.join(index_dir, f"shard_{sid:04d}.parquet.tmp")
        fsio.write_parquet(fs, out, tmp)
        fsio.move(fs, tmp, os.path.join(index_dir, f"shard_{sid:04d}.parquet"))
        # entity-sharding makes shard-local entry sets DISJOINT, so the
        # global n_entries is the plain sum of per-shard distincts
        ents = pc.binary_join_element_wise(
            out.column("entity_uri"), out.column("name_norm"), "\x00")
        return pa.table({"shard": [sid], "postings": [out.num_rows],
                         "entries": [int(pc.count_distinct(ents).as_py())],
                         "arrow_bytes": [int(out.nbytes)]})

    stats = sharded.groupby("shard").map_groups(
        write_shard, batch_format="pyarrow").take_all()
    return _write_index_meta(fs, index_dir, num_shards, stats)["postings"]


def _write_index_meta(fs, index_dir: str, num_shards: int,
                      stats: list[dict]) -> dict:
    """``_meta.json`` from per-shard (shard, postings, entries, arrow_bytes)
    stats — shared by the driver-local and distributed builds."""
    from . import fsio

    live = sorted(int(r["shard"]) for r in stats)
    arrow_bytes = int(sum(r["arrow_bytes"] for r in stats))
    meta = {
        "version": 1,
        "sharding": "entity",
        "num_shards": num_shards,
        "shards": live,
        "n_entries": int(sum(r["entries"] for r in stats)),
        "postings": int(sum(r["postings"] for r in stats)),
        "bytes": sum(fsio.size(fs, os.path.join(index_dir, f))
                     for f in fsio.listdir(fs, index_dir)
                     if f.startswith("shard_") and f.endswith(".parquet")),
        # what the REPLICATED mode would cost per worker: LabelIndex's
        # Python strings/frozensets resident bytes, estimated from the
        # uncompressed Arrow posting bytes.  Parquet file size is the WRONG
        # basis for the replicate-vs-shard-route decision — measured at a
        # 1M-entity gazetteer: 76 MB parquet → 360 MB Arrow → ~2.4 GB
        # resident (~6.6× Arrow, ~30× disk; BASELINE.md round 5)
        "arrow_bytes": arrow_bytes,
        "mem_bytes_est": arrow_bytes * _MEM_INFLATION,
    }
    fsio.write_json_atomic(fs, os.path.join(index_dir, _META_FILE), meta)
    return meta


def _build_index_driver(tbl: pa.Table, index_dir: str, num_shards: int,
                        fs) -> int:
    """Driver-local finish for a measured-small posting set: identical
    artifact layout (``vocab/``, ``shard_*.parquet``, ``_meta.json``)
    without the dedupe/df/shard Dataset exchanges.  The whole posting set
    fits the 32 MB driver guard, so dedupe is one ``np.unique`` and each
    shard file is a filtered, token-sorted slice written directly."""
    import numpy as np
    import pyarrow.compute as pc

    from . import fsio

    tbl = tbl.combine_chunks()
    ent = pc.binary_join_element_wise(
        tbl.column("entity_uri"), tbl.column("name_norm"), "\x00")
    key = pc.binary_join_element_wise(tbl.column("token"), ent, "\x00")
    karr = np.asarray(key.to_pylist(), dtype=object)
    _, first = np.unique(karr, return_index=True)
    if len(first) != len(karr):
        sel = pa.array(np.sort(first))
        tbl = tbl.take(sel)
        ent = ent.take(sel)

    # postings are now distinct per (token, entry) → df = rows per token
    utok, dfc = np.unique(
        np.asarray(tbl.column("token").to_pylist(), dtype=object),
        return_counts=True)
    vocab_tmp = os.path.join(index_dir, _VOCAB_DIR + ".tmp")
    vocab_dir = os.path.join(index_dir, _VOCAB_DIR)
    fsio.rmtree(fs, vocab_tmp)
    fsio.makedirs(fs, vocab_tmp)
    fsio.write_parquet(
        fs,
        pa.table({"token": pa.array(utok.tolist(), pa.string()),
                  "df": pa.array(dfc.astype("int64"))}),
        os.path.join(vocab_tmp, "vocab-00000.parquet"))
    fsio.rmtree(fs, vocab_dir)
    fsio.move(fs, vocab_tmp, vocab_dir)

    shard = hash64(ent.to_pylist()) % num_shards
    stats: list[dict] = []
    for sid in np.unique(shard):
        idx = np.flatnonzero(shard == sid)
        out = tbl.take(pa.array(idx)).sort_by([("token", "ascending")])
        tmp = os.path.join(index_dir, f"shard_{int(sid):04d}.parquet.tmp")
        fsio.write_parquet(fs, out, tmp)
        fsio.move(fs, tmp,
                  os.path.join(index_dir, f"shard_{int(sid):04d}.parquet"))
        ents = pc.binary_join_element_wise(
            out.column("entity_uri"), out.column("name_norm"), "\x00")
        stats.append({"shard": int(sid), "postings": out.num_rows,
                      "entries": int(pc.count_distinct(ents).as_py()),
                      "arrow_bytes": int(out.nbytes)})
    return _write_index_meta(fs, index_dir, num_shards, stats)["postings"]


def index_meta(index_dir: str) -> dict | None:
    """The build's ``_meta.json`` (None for a pre-meta or missing index)."""
    import json as _json

    try:
        with open(os.path.join(index_dir, _META_FILE)) as fh:
            return _json.load(fh)
    except (FileNotFoundError, ValueError):
        return None


class VocabStats:
    """The global term dictionary (token → document frequency) + global
    entry count, loaded once per worker process and shared by every shard
    index of the same ``index_dir``.  Membership/df lookups go through a
    sorted hash64 array — ~12 bytes per vocabulary token, the only global
    state a shard-routed worker holds (the postings + entry metadata, which
    dominate the index, stay 1/N per shard)."""

    def __init__(self, index_dir: str):
        meta = index_meta(index_dir)
        if meta is None:
            raise FileNotFoundError(f"no {_META_FILE} under {index_dir}")
        self.n_entries = max(1, int(meta["n_entries"]))
        vdir = os.path.join(index_dir, _VOCAB_DIR)
        files = [os.path.join(vdir, f) for f in sorted(os.listdir(vdir))
                 if f.endswith(".parquet")]
        tabs = [pq.read_table(f, columns=["token", "df"]) for f in files]
        t = pa.concat_tables(tabs) if tabs else pa.table(
            {"token": pa.array([], pa.string()),
             "df": pa.array([], pa.int64())})
        hashes = hash64(t.column("token").to_pylist()).astype(np.uint64)
        order = np.argsort(hashes, kind="stable")
        self._h = hashes[order]
        self._df = t.column("df").to_numpy(zero_copy_only=False)[order] \
            .astype(np.int64)

    def df_of(self, token: str) -> int:
        h = hash64([token])[0]
        i = int(np.searchsorted(self._h, h))
        if i < len(self._h) and self._h[i] == h:
            return int(self._df[i])
        return 0

    def contains(self, token: str) -> bool:
        h = hash64([token])[0]
        i = int(np.searchsorted(self._h, h))
        return i < len(self._h) and self._h[i] == h


_VOCAB_CACHE: dict[str, VocabStats] = {}


def vocab_stats_for(index_dir: str) -> VocabStats:
    """Per-process VocabStats cache (Ray reuses worker processes)."""
    v = _VOCAB_CACHE.get(index_dir)
    if v is None:
        if len(_VOCAB_CACHE) > 4:
            _VOCAB_CACHE.clear()
        v = VocabStats(index_dir)
        _VOCAB_CACHE[index_dir] = v
    return v


class LabelIndex:
    """In-memory serving structure over the shard files (loaded once per
    actor).  Mirrors IValueIndex (SJ/index/IValueIndex.java:7-11) with
    TF-IDF scoring in place of Lucene BM25."""

    def __init__(self, index_dir: str, shards: list[int] | None = None,
                 vocab: VocabStats | None = None):
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
        # shard-routed serving (``vocab`` given): idf from the GLOBAL term
        # dictionary + global entry count so a shard's per-candidate scores
        # equal the full-index scores exactly (local df under-counts a token
        # whose entries span shards — entity sharding spreads a token's
        # postings even though each ENTRY stays whole)
        self._vocab = vocab
        if vocab is not None:
            self.idf = {
                t: float(np.log1p(vocab.n_entries / max(1, vocab.df_of(t))))
                for t in self.postings
            }
        else:
            n_entries = max(1, len(self.entries_uri))
            self.idf = {
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
            if ids is None and self._vocab is not None \
                    and self._vocab.contains(t):
                # the token exists in the GLOBAL vocabulary — its exact
                # postings live on another shard, so this shard contributes
                # nothing (and must NOT fuzzy-expand: the full index would
                # have taken the exact branch)
                continue
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
        """Refine-attrs term for one entry — delegates to the pure
        :func:`context_bonus_for` over the entry's attr token sets."""
        return context_bonus_for(self.entries_attrs[eid], context_toksets,
                                 refine_factor)

    def search_candidates(self, mention: str, fuzzy: bool = True,
                          max_edit: int = 1) -> list[tuple]:
        """Context-independent candidate scan in the index-free CANDIDATE
        form: [(entity_uri, base_score, name_norm, entity_type,
        attrs_toksets)] — everything :func:`finalize_candidates` needs, so
        shard partials can merge and context-rescore without any index."""
        return [(self.entries_uri[eid], s, self.entries_norm[eid],
                 self.entries_type[eid], self.entries_attrs[eid])
                for eid, s in self.search_scored(mention, fuzzy, max_edit)]

    def finalize(self, scored: list[tuple[int, float]], top_k: int,
                 context: list[str] | None = None,
                 refine_factor: float = 0.0
                 ) -> list[tuple[str, float, str, str]]:
        """(entry_id, base) candidates → deduped top-k via the pure
        :func:`finalize_candidates` (same semantics, shared with the
        shard-routed gather so the two paths cannot drift)."""
        cands = [(self.entries_uri[eid], s, self.entries_norm[eid],
                  self.entries_type[eid], self.entries_attrs[eid])
                 for eid, s in scored]
        return finalize_candidates(cands, top_k, context, refine_factor)

    def search(self, mention: str, top_k: int = 10, fuzzy: bool = True,
               max_edit: int = 1, context: list[str] | None = None,
               refine_factor: float = 0.0
               ) -> list[tuple[str, float, str, str]]:
        """→ [(entity_uri, score, matched_name_norm, entity_type)] by score
        desc; ``context`` (sibling cells of the mention's row) adds the
        refine-attrs term per assessIndexEntry."""
        return self.finalize(self.search_scored(mention, fuzzy, max_edit),
                             top_k, context, refine_factor)


def context_bonus_for(attrs: tuple, context_toksets: list[set[str]],
                      refine_factor: float) -> float:
    """Refine-attrs term (ScoreEvaluator.assessIndexEntry,
    SJ/scoring/ScoreEvaluator.java:24-33): for each sibling cell of the
    query row, the best token-Jaccard against the entity's own attribute
    values counts as a refine hit when >= 0.5 (the cell value 'appears in
    that entity's row'); hit scores sum, weighted by refineAttrsFactor."""
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


def finalize_candidates(cands: list[tuple], top_k: int,
                        context: list[str] | None = None,
                        refine_factor: float = 0.0
                        ) -> list[tuple[str, float, str, str]]:
    """[(uri, base_score, name_norm, entity_type, attrs_toksets)] → deduped
    top-k [(entity_uri, score, matched_name_norm, entity_type)] with the
    refine-attrs context term blended in.  Pure — no index state — so the
    shard-routed gather and the merge-stage context re-score run it over
    candidate payloads directly.

    Short-circuit: tokenizing the row context dominates linker cost
    (measured 3.6× at sf0.01), so the context term is only computed when
    it COULD change the top entity — ≥2 candidates, at least one with
    indexed attrs, and a top-two base-score margin within the maximum
    attainable bonus (refine_factor × context cells).  When skipped, the
    reported scores are the base scores (the top-1 decision is
    invariant)."""
    use_ctx = bool(context) and refine_factor > 0.0 and len(cands) > 1
    if use_ctx:
        cells = [c for c in context if c and c != "null"]
        max_bonus = refine_factor * len(cells)
        if not cells:
            use_ctx = False
        else:
            top2 = sorted(c[1] for c in cands)[-2:]
            if top2[1] - top2[0] > max_bonus:
                use_ctx = False
            elif not any(c[4] for c in cands):
                use_ctx = False
    if use_ctx:
        ctoksets = [set(tokenize_string(c, remove_brackets=True))
                    for c in cells]
        rows = [(u, s + context_bonus_for(a, ctoksets, refine_factor), n, e)
                for u, s, n, e, a in cands]
    else:
        rows = [(u, s, n, e) for u, s, n, e, _ in cands]
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


def clear_mention(mention: str) -> str:
    """Canonical mention key (clearString; empty → 'null')."""
    return clear_string(mention, remove_brackets=True)
