"""Entity linking: mention Dataset → edge Dataset via a stateful actor pool.

Re-expresses the reference's search join core (SearchJoin.findJoinsForColumnFast,
SJ/searchjoin/SearchJoin.java:547-855): per key cell, search the value index
(candidate generation), score, re-rank, then aggregate per target into
JoinResult-style records (accumulation :827-840) ranked by the ScoreEvaluator
modes (SJ/scoring/ScoreEvaluator.java:48-122).

Ray design (SURVEY §3.2): the hand-rolled producer/consumer + bounded queue
backpressure (:398-410) disappears — mentions stream through
``map_batches(LinkerActor, concurrency=N)`` with executor backpressure; the
"group by entity table" thread becomes a groupby shuffle over the edge
Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..state.index import LabelIndex

EDGE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("table_idx", pa.int32()),
    ("row_idx", pa.int32()),
    ("mention", pa.string()),
    ("entity_uri", pa.string()),
    ("score", pa.float64()),
    ("rank", pa.int32()),
    ("matched_name", pa.string()),
    ("entity_type", pa.string()),
])


CONTEXT_SEP = "\x1f"

MENTION_SCHEMA = pa.schema([
    ("url", pa.string()), ("table_idx", pa.int32()),
    ("row_idx", pa.int32()), ("mention", pa.string()),
    ("context", pa.string())])   # '\x1f'-joined sibling cells (see below)

_MAX_CONTEXT_CELLS = 8


def mentions_from_tables_batch(batch: pa.Table) -> pa.Table:
    """Table records (stages.extract) → one mention per key cell, carrying the
    row's sibling cells as ``context`` (the refine attributes the reference
    searches per candidate, SearchJoin.java key handling +
    IndexManager.findRefineAttrsMatches :677-746).

    ``context`` travels as ONE '\\x1f'-joined string, not a list column —
    mentions are ~one per corpus row, so the per-row Arrow list overhead and
    the per-cell Python appends were measurable at 64k pages; the linker
    splits the string only for the rare rows whose margin gate passes."""
    urls = batch.column("url").to_pylist()
    tids = batch.column("table_idx").to_pylist()
    key_idx = batch.column("key_idx").to_pylist()
    has_key = batch.column("has_key").to_pylist()
    raw_keys = batch.column("raw_keys").to_pylist()
    rows_col = batch.column("rows").to_pylist() \
        if "rows" in batch.column_names else [None] * len(urls)
    out = {"url": [], "table_idx": [], "row_idx": [], "mention": [],
           "context": []}
    for url, ti, ki, hk, keys, rows in zip(urls, tids, key_idx, has_key,
                                           raw_keys, rows_col):
        if not hk or ki < 0:
            continue
        for ri, k in enumerate(keys):
            if k and k.strip():
                out["url"].append(url)
                out["table_idx"].append(ti)
                out["row_idx"].append(ri)
                out["mention"].append(k)
                if rows is not None and ri < len(rows):
                    cells = rows[ri]
                    # filter the key/empty cells FIRST, then cap — slicing
                    # before the filter under-caps whenever key_idx falls
                    # outside the slice (wide tables carried 9 cells)
                    ctx_cells = [c for ci, c in enumerate(cells)
                                 if ci != ki and c and c != "null"]
                    ctx = CONTEXT_SEP.join(ctx_cells[:_MAX_CONTEXT_CELLS])
                else:
                    ctx = ""
                out["context"].append(ctx)
    return pa.Table.from_pydict(out, schema=MENTION_SCHEMA)


class LinkerActor:
    """Stateful linker: loads the sharded label index ONCE per actor
    (__init__), links a batch of mentions per __call__.

    Pass to ``map_batches(LinkerActor, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)``.  With a per-actor mention cache, repeated
    head mentions (skew) short-circuit — the salting analog for the linking
    stage."""

    def __init__(self, index_dir: str, top_k: int = 5,
                 max_edit: int = 1, fuzzy: bool = True,
                 refine_factor: float = 0.0):
        self.index = LabelIndex(index_dir)
        self.top_k = top_k
        self.max_edit = max_edit
        self.fuzzy = fuzzy
        self.refine_factor = refine_factor
        # caches, per mention string: the context-independent candidate scan,
        # its finalized no-context hits, the top-two base-score gap, and
        # whether any candidate carries indexed attrs.  Per ROW only an
        # O(context cells) margin check runs — the full context re-score
        # happens solely when it could flip the top entity (ties within the
        # attainable bonus), so repeated head mentions stay cached
        self._cache: dict[str, tuple] = {}

    def _entry_for(self, m: str) -> tuple:
        entry = self._cache.get(m)
        if entry is None:
            scored = self.index.search_scored(m, fuzzy=self.fuzzy,
                                              max_edit=self.max_edit)
            base_hits = self.index.finalize(scored, self.top_k)
            if len(scored) > 1:
                top2 = sorted(s for _, s in scored)[-2:]
                gap = top2[1] - top2[0]
            else:
                gap = float("inf")
            has_attrs = any(self.index.entries_attrs[eid]
                            for eid, _ in scored)
            entry = (scored, base_hits, gap, has_attrs)
            if len(self._cache) < 200_000:
                self._cache[m] = entry
        return entry

    @staticmethod
    def _hit_arrays(hits) -> tuple:
        k = len(hits)
        return (np.array([h[0] for h in hits], dtype=object),
                np.array([h[1] for h in hits], dtype=np.float64),
                np.arange(k, dtype=np.int32),
                np.array([h[2] for h in hits], dtype=object),
                np.array([h[3] for h in hits], dtype=object))

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized linking: DISTINCT mentions resolve once
        (factorize → per-unique cached index scan + hit arrays), the margin
        gate evaluates as one numpy expression, and edges assemble by array
        concatenation in original row order — the per-row python work is one
        list-of-array-refs append, not k scalar appends (round-3 verdict
        item; identical edges to the per-row loop by equivalence test)."""
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_pydict({c: [] for c in EDGE_SCHEMA.names},
                                        schema=EDGE_SCHEMA)
        urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
        tids = np.asarray(batch.column("table_idx").to_pylist(), dtype=np.int64)
        rids = np.asarray(batch.column("row_idx").to_pylist(), dtype=np.int64)
        mentions = batch.column("mention").to_pylist()
        contexts = batch.column("context").to_pylist() \
            if "context" in batch.column_names else [None] * n
        factor = self.refine_factor

        codes, uniques = pd.factorize(np.asarray(mentions, dtype=object))
        entries = [self._entry_for(m) for m in uniques]
        uni_arrays = [self._hit_arrays(e[1]) for e in entries]

        # margin gate, vectorized over rows: re-score only where the cached
        # top-two gap could be closed by the attainable context bonus
        gate = np.zeros(n, dtype=bool)
        if factor > 0.0 and any(e[3] for e in entries):
            gaps = np.array([e[2] for e in entries], dtype=np.float64)
            attrs = np.array([e[3] for e in entries], dtype=bool)
            n_cells = np.array(
                [(c.count(CONTEXT_SEP) + 1) if isinstance(c, str) and c
                 else (len(c) if c else 0) for c in contexts],
                dtype=np.int64)
            gate = (n_cells > 0) & attrs[codes] & \
                (gaps[codes] <= factor * n_cells)

        uri_p: list = []
        score_p: list = []
        rank_p: list = []
        name_p: list = []
        etype_p: list = []
        counts = np.empty(n, dtype=np.int64)
        for i in range(n):
            c = codes[i]
            if gate[i]:
                ctx = contexts[i]
                cells = ctx.split(CONTEXT_SEP) if isinstance(ctx, str) \
                    else list(ctx)
                hits = self.index.finalize(entries[c][0], self.top_k,
                                           context=cells,
                                           refine_factor=factor)
                arrs = self._hit_arrays(hits)
            else:
                arrs = uni_arrays[c]
            counts[i] = len(arrs[0])
            uri_p.append(arrs[0])
            score_p.append(arrs[1])
            rank_p.append(arrs[2])
            name_p.append(arrs[3])
            etype_p.append(arrs[4])

        mention_arr = np.asarray(mentions, dtype=object)
        return pa.Table.from_pydict({
            "url": np.repeat(urls, counts),
            "table_idx": np.repeat(tids, counts),
            "row_idx": np.repeat(rids, counts),
            "mention": np.repeat(mention_arr, counts),
            "entity_uri": np.concatenate(uri_p) if uri_p else [],
            "score": np.concatenate(score_p) if score_p else [],
            "rank": np.concatenate(rank_p) if rank_p else [],
            "matched_name": np.concatenate(name_p) if name_p else [],
            "entity_type": np.concatenate(etype_p) if etype_p else [],
        }, schema=EDGE_SCHEMA)


def link_mentions(mentions_ds, index_dir: str,
                  cfg: PipelineConfig = DEFAULT_CONFIG, top_k: int = 5):
    """mentions → edges through the actor pool."""
    return mentions_ds.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"index_dir": index_dir, "top_k": top_k,
                               "max_edit": cfg.max_edit_distance,
                               "refine_factor": cfg.refine_attrs_factor},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.linker_concurrency,
        num_cpus=1,
    )


def top1_links(edges_ds):
    """rank-0 edges only (the link decision)."""
    return edges_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["rank"], pa.scalar(0, pa.int32()))),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# JoinResult-style aggregation + ranking modes
# ---------------------------------------------------------------------------

def aggregate_edges(edges_ds, left_total_mentions: int,
                    ranking: str = "queryTableCoverage",
                    label_ranks: dict | None = None,
                    min_rank: float | None = None):
    """Edge Dataset → per-entity-group JoinResult aggregates.

    JoinResult accumulation (SearchJoin.java:827-840): count, score sums;
    ranking modes (ScoreEvaluator.assessJoinResult :48-122):
      queryTableCoverage           = count * avgScore / leftDistinct
      entityTableCoverage          = count * avgScore / rightCardinality
      queryEntitySum               = count * avgScore / rightCardinality
                                     (the reference case dead-stores its sum
                                     and falls into the entityTableCoverage
                                     expression — quirk preserved)
      queryTableCoverageNormalized = (sumScore / joinPairs) / (maxScore /
                                     maxJoins), with joinPairs bumped to
                                     leftDistinct when count < 30 % of it
                                     (the few-matches penalty) — max-
                                     normalized against the best group
                                     (SearchJoin.java:203-222).
    The mode rank then blends 50/50 with the normalized label-based
    schema-matching rank (``label_ranks``: group → raw label score;
    normalization per ScoreEvaluator.getNormalizedLabelScore :124-129,
    bounds ±3×DBPEDIA_EXACT_MATCH_SCORE) — ``total_rank`` is the blended
    final, ``rank`` the mode rank (r.setRank vs r.setTotalRank).
    ``min_rank`` filters the blended rank (the reference's >= 0.6 selection
    for the normalized mode, SearchJoin.java:236-238).
    Group key here is the entity-URI prefix class (entity "table" analog).
    """
    def add_group(t: pa.Table) -> pa.Table:
        # entity "table" analog = entity_type (the gazetteer's class — the
        # skewed head types from F4 land here, absorbed by the two-phase
        # combiner); falls back to the URI namespace when untyped
        if "entity_type" in t.column_names:
            types = t.column("entity_type").to_pylist()
            uris = t.column("entity_uri").to_pylist()
            groups = [ty if ty else u.rsplit("/", 1)[0]
                      for ty, u in zip(types, uris)]
        else:
            groups = [u.rsplit("/", 1)[0]
                      for u in t.column("entity_uri").to_pylist()]
        return t.append_column("entity_group", pa.array(groups, pa.string()))

    from .aggregates import dedupe_by_key, two_phase_agg

    grouped = edges_ds.map_batches(add_group, batch_format="pyarrow").materialize()
    if grouped.count() == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            c: pd.Series(dtype="object" if c == "entity_group" else "float64")
            for c in ["entity_group", "count", "sum_score", "avg_score",
                      "right_cardinality", "rank", "label_rank_norm",
                      "total_rank"]}))
    agg = two_phase_agg(grouped, ["entity_group"], {
        "count": (None, "count"),
        "sum_score": ("score", "sum"),
        "avg_score": ("score", "mean"),
    })
    # right cardinality = distinct entities per group (JoinResult's
    # rightColumnCardinality): distinct via the bucket shuffle, then a tiny
    # per-group count
    distinct = dedupe_by_key(
        grouped.map_batches(
            lambda df: df[["entity_group", "entity_uri"]].assign(
                __pair=df["entity_group"] + "\0" + df["entity_uri"]),
            batch_format="pandas"),
        "__pair")
    card = two_phase_agg(distinct, ["entity_group"],
                         {"right_cardinality": (None, "count")}).to_pandas()
    card_map = dict(zip(card["entity_group"], card["right_cardinality"]))

    # the per-group table is bounded by the entity-group count (tiny next to
    # the edges), so the max-normalization + blend run driver-side pandas
    df = agg.to_pandas()
    df["right_cardinality"] = df["entity_group"].map(card_map) \
        .fillna(1).astype("int64")
    left_card = max(1, left_total_mentions)
    if ranking == "queryTableCoverage":
        df["rank"] = df["count"] * df["avg_score"] / left_card
    elif ranking == "queryEntitySum":
        # reference quirk kept: the queryEntitySum case DEAD-STORES its sum
        # expression and immediately overwrites with count*avg/rightCard
        # (ScoreEvaluator.java:62-65), so the mode behaves exactly like
        # entityTableCoverage
        df["rank"] = df["count"] * df["avg_score"] / \
            df["right_cardinality"].clip(lower=1)
    elif ranking == "entityTableCoverage":
        df["rank"] = df["count"] * df["avg_score"] / \
            df["right_cardinality"].clip(lower=1)
    elif ranking == "queryTableCoverageNormalized":
        if len(df):
            best = df["sum_score"].idxmax()
            max_score = float(df.loc[best, "sum_score"])
            max_joins = max(1, int(df.loc[best, "count"]))
            join_pairs = df["count"].where(
                df["count"] >= left_card * 0.3, left_card)
            best_score = max_score / max_joins if max_score > 0 else 1.0
            df["rank"] = (df["sum_score"] / join_pairs) / max(1e-12, best_score)
        else:
            df["rank"] = pd.Series(dtype=float)
    else:
        df["rank"] = df["avg_score"]

    # 50/50 blend with the normalized label-based schema-matching rank
    # (ScoreEvaluator.java:106-122); raw label rank defaults to 0, which
    # normalizes to the midpoint 15/31 — same constant shift for every group
    exact = 5.0  # LabelBasedComparer.DBPEDIA_EXACT_MATCH_SCORE
    lmin, lmax = -3.0 * exact, 3.0 * exact + 1
    raw_label = df["entity_group"].map(label_ranks or {}).fillna(0.0)
    df["label_rank_norm"] = (raw_label - lmin) / (lmax - lmin)
    df["total_rank"] = 0.5 * df["rank"] + 0.5 * df["label_rank_norm"]
    if min_rank is not None:
        df = df[df["total_rank"] >= min_rank]
    df = df.sort_values("total_rank", ascending=False).reset_index(drop=True)

    import ray.data as rd

    return rd.from_pandas(df)
