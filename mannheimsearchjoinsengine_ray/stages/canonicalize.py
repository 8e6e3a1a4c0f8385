"""Canonicalization: near-dup blocking → verify → connected components →
per-component value resolution.

Replaces the reference's duplicate machinery (SURVEY §2.5):
  * FastJoin external fuzzy matcher (SJ/utils/FastJoinWrapper.java:83-196) →
    MinHash-LSH blocking (shingle → signature → band keys → groupby(band))
    with Jaccard verification;
  * MatchClustering.clusterMatchesAgglomerative (:182-314) → iterative
    min-label propagation connected components over the match edges;
  * DuplicateResolver.resolveDuplicates/mergeColumns (:36-84, 219-362) →
    groupby(component).map_groups value resolution (string voting/longest,
    numeric median/average/voting, date mean — config enums preserved).

Scale notes:
  * blocking shuffle key = (band_idx, band_hash); head bands (stopword-ish
    shingles) are salted by capping candidate-group size (``max_block``) —
    oversized blocks are re-split by a secondary hash, the two-level
    aggregation analog for skew;
  * connected components: labels propagate via groupby-min until fixpoint
    (≤ cc_max_iterations); each iteration is one hash-join + one groupby —
    the alias graph is orders of magnitude smaller than the corpus;
  * a driver-side union-find fast path exists for provably small edge sets
    (candidate pairs after verification), used when |edges| < 2M.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig, StringResolution, NumericResolution
from ..functions.hashing import MinHasher, band_keys, hash64
from ..functions.normalize import tokenize_string
from ..functions.similarity import jaccard

# ---------------------------------------------------------------------------
# 1. MinHash-LSH blocking
# ---------------------------------------------------------------------------

class LshBlocker:
    """(id, name) batches → (band_idx, band_hash, id, name) rows.  Stateful:
    the permutation tables compile once per actor/worker."""

    def __init__(self, num_perm: int = 64, num_bands: int = 8,
                 shingle_tokens: bool = True):
        self.mh = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.shingle_tokens = shingle_tokens

    def _token_hashes(self, name: str) -> np.ndarray:
        toks = tokenize_string(name, remove_brackets=True)
        if self.shingle_tokens:
            items = toks if toks else [name]
        else:
            items = [name[i:i + 3] for i in range(max(1, len(name) - 2))]
        return hash64(items)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        names = batch.column("name").to_pylist()
        sigs = self.mh.signatures([self._token_hashes(n or "") for n in names])
        bk = band_keys(sigs, self.num_bands)
        n = len(ids)
        return pa.table({
            "band_idx": pa.array(np.repeat(np.arange(self.num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(bk.T.reshape(-1).astype("int64")),
            "id": pa.array(np.tile(np.array(ids, dtype=object), self.num_bands)),
            "name": pa.array(np.tile(np.array(names, dtype=object), self.num_bands)),
        })


_BLOCKER_CACHE: dict[tuple[int, int], "LshBlocker"] = {}


def lsh_block_batch(batch: pa.Table, num_perm: int = 64,
                    num_bands: int = 8) -> pa.Table:
    """Function form of LshBlocker for stateless tasks: the hasher is cached
    at module level (once per worker process — same amortization as an actor
    without the pool spin-up; right for light state like permutation tables)."""
    key = (num_perm, num_bands)
    blocker = _BLOCKER_CACHE.get(key)
    if blocker is None:
        blocker = _BLOCKER_CACHE[key] = LshBlocker(num_perm, num_bands)
    return blocker(batch)


_BAND_COLS = ("band_idx", "band_hash", "id")


def _pairs_from_group(group: pd.DataFrame, max_block: int = 50) -> pd.DataFrame:
    """Band-bucket rows → unordered candidate pairs.  PAYLOAD-GENERIC: every
    column besides (band_idx, band_hash, id) rides along as left_<col> /
    right_<col> — callers choose what the verify stage needs in the shuffle
    (short label strings, an 8-byte simhash, a binary vector) or carry
    NOTHING and join payloads back by id (stages/dedup.attach_pair_payloads,
    the right shape when the payload is full document text)."""
    g = group.drop_duplicates("id").sort_values("id")
    payload = [c for c in g.columns if c not in _BAND_COLS]
    k = len(g)
    if k < 2:
        data = {"left_id": pd.Series(dtype=group["id"].dtype),
                "right_id": pd.Series(dtype=group["id"].dtype)}
        for c in payload:
            data[f"left_{c}"] = pd.Series(dtype=g[c].dtype)
            data[f"right_{c}"] = pd.Series(dtype=g[c].dtype)
        return pd.DataFrame(data)
    if k <= max_block:
        li, ri = np.triu_indices(k, 1)
    else:
        # star around the minimum id — O(n) edges, same components
        li = np.zeros(k - 1, dtype=np.int64)
        ri = np.arange(1, k, dtype=np.int64)
    data = {"left_id": g["id"].to_numpy()[li],
            "right_id": g["id"].to_numpy()[ri]}
    for c in payload:
        v = g[c].to_numpy()
        data[f"left_{c}"] = v[li]
        data[f"right_{c}"] = v[ri]
    return pd.DataFrame(data)


def candidate_pairs(blocked_ds, max_block: int = 50, bloom_bits: int = 1 << 22):
    """groupby(band) → unordered candidate pairs.  Blocks larger than
    ``max_block`` are truncated after sorting by id (deterministic) — the
    skew guard; every member still pairs with the block minimum so the
    component structure survives (star pattern instead of clique).

    Almost every (band_idx, band_hash) key is a singleton that cannot yield a
    pair; since map_groups pays per-group overhead, singletons are dropped
    FIRST.  The duplicated-band-key set is found WITHOUT a high-cardinality
    Ray aggregate: per-batch pandas counts reduce through a CONSTANT-bucket
    shuffle; each bucket emits its pair-producing keys as an OR-mergeable
    Bloom PARTIAL, so what reaches the driver is bounded by the FIXED filter
    size, never by the duplicate count.  Bloom false positives only let a
    few singleton bands through the semi-filter — singleton groups yield no
    pairs, so the result stays exact."""
    import ray

    from ..functions.hashing import bloom_contains, bloom_partial, hash64

    blocked_ds = blocked_ds.materialize()

    def _band_keys(df: pd.DataFrame) -> np.ndarray:
        return (df["band_idx"].astype(str) + ":"
                + df["band_hash"].astype(str)).to_numpy()

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["band_idx", "band_hash"], sort=False).size()
        out = g.rename("n").reset_index()
        out["__bucket"] = (
            (out["band_hash"].to_numpy().astype(np.uint64)
             ^ hash64(out["band_idx"].astype(str).to_numpy()))
            % np.uint64(16)).astype("int64")
        return out

    def hot_bloom(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["band_idx", "band_hash"], sort=False)["n"].sum()
        hot = tot[tot >= 2].reset_index()
        bits = bloom_partial(_band_keys(hot), num_bits=bloom_bits)
        return pd.DataFrame({"bloom": [bits.tobytes()], "n_hot": [len(hot)]})

    parts = blocked_ds.map_batches(partial_counts, batch_format="pandas") \
        .groupby("__bucket").map_groups(hot_bloom, batch_format="pandas") \
        .to_pandas()
    if parts.empty or int(parts["n_hot"].sum()) == 0:
        return blocked_ds.limit(0).map_batches(
            lambda g: _pairs_from_group(g, max_block), batch_format="pandas")
    bloom = np.zeros(bloom_bits // 8, dtype=np.uint8)
    for b in parts["bloom"]:
        bloom |= np.frombuffer(b, dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        mask = bloom_contains(ray.get(bloom_ref), _band_keys(df))
        return df[mask]

    # exchange width derived from the MEASURED hot-band bytes (a fixed 8
    # capped the pair-producing reduce stage at any scale)
    from .aggregates import _auto_block_count

    hot = blocked_ds.map_batches(semi, batch_format="pandas").materialize()
    return hot.repartition(_auto_block_count(hot)) \
        .groupby(["band_idx", "band_hash"]) \
        .map_groups(lambda g: _pairs_from_group(g, max_block),
                    batch_format="pandas")


def _verify_df(df: pd.DataFrame, min_jaccard: float) -> pd.DataFrame:
    if df.empty:
        df["jaccard"] = []
        return df
    keep = []
    jac = []
    for ln, rn in zip(df["left_name"], df["right_name"]):
        j = jaccard(set(tokenize_string(ln or "")), set(tokenize_string(rn or "")))
        jac.append(j)
        keep.append(j >= min_jaccard)
    df = df.assign(jaccard=jac)[pd.Series(keep, index=df.index)]
    return df.drop_duplicates(["left_id", "right_id"])


def verify_pairs(pairs_ds, min_jaccard: float = 0.5):
    """Token-set Jaccard verification (FastJoin FJACCARD δ τ analog;
    fuzzy_min_confidence in config)."""
    return pairs_ds.map_batches(lambda df: _verify_df(df, min_jaccard),
                                batch_format="pandas")


def alias_edges_local(labels_df: pd.DataFrame,
                      cfg: PipelineConfig = DEFAULT_CONFIG,
                      min_jaccard: float | None = None) -> pd.DataFrame:
    """Driver-local blocking + verify for SMALL deduped label sets (the
    caller guards with a row-count check — e.g. Parquet metadata counts).
    Identical semantics to the distributed path, none of the per-op
    scheduling overhead."""
    mj = min_jaccard if min_jaccard is not None else cfg.fuzzy_min_confidence
    df = labels_df.drop_duplicates("id")
    if df.empty:
        return pd.DataFrame({"left_id": [], "right_id": [], "jaccard": []})
    blocker = LshBlocker(cfg.minhash_num_perm, cfg.minhash_bands)
    blocked = blocker(pa.Table.from_pandas(df, preserve_index=False)).to_pandas()
    # singleton bands can't produce pairs — drop them vectorized before the
    # per-group python work (almost all bands are singletons)
    blocked = blocked[blocked.duplicated(["band_idx", "band_hash"], keep=False)]
    L: list = []
    R: list = []
    LN: list = []
    RN: list = []
    for _, g in blocked.groupby(["band_idx", "band_hash"], sort=False):
        g = g.drop_duplicates("id").sort_values("id")
        ids = g["id"].tolist()
        names = g["name"].tolist()
        if len(ids) < 2:
            continue
        rng = range(len(ids)) if len(ids) <= 50 else range(1)
        for i in rng:
            for j in range(i + 1, len(ids)):
                L.append(ids[i]); R.append(ids[j])
                LN.append(names[i]); RN.append(names[j])
    pairs = pd.DataFrame({"left_id": L, "right_id": R,
                          "left_name": LN, "right_name": RN})
    pairs = pairs.drop_duplicates(["left_id", "right_id"])
    return _verify_df(pairs, mj)


# ---------------------------------------------------------------------------
# 2. Connected components
# ---------------------------------------------------------------------------

def connected_components_local(edges: pd.DataFrame,
                               left: str = "left_id", right: str = "right_id") -> pd.DataFrame:
    """Union-find on the driver — ONLY for verified candidate-pair sets that
    are provably small (they are post-blocking).  Returns (id, component)
    with component = lexicographic min member."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra

    for a, b in zip(edges[left], edges[right]):
        union(a, b)
    nodes = sorted(set(edges[left]) | set(edges[right]))
    return pd.DataFrame({"id": nodes, "component": [find(n) for n in nodes]})


def _star_round(edges, small: bool, num_buckets: int):
    """One large-star or small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond", 2014 — public algorithm):

      large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
      small-star(u): m = min({v ∈ N(u): v < u} ∪ {u});
                     emit (v, m) for v ∈ N(u), v < u, plus (u, m)

    Implemented as ONE bucket shuffle (hash(u) % B groups, never a
    high-cardinality Ray groupby) with vectorized pandas transforms inside
    each bucket.  Input/output: canonical undirected edges (a < b), deduped.
    """

    def bucketize(t: pa.Table) -> pd.DataFrame:
        a = t.column("a").to_pandas()
        b = t.column("b").to_pandas()
        # group key is u — every edge appears under BOTH endpoints
        df = pd.DataFrame({"u": pd.concat([a, b], ignore_index=True),
                           "v": pd.concat([b, a], ignore_index=True)})
        df["__bucket"] = (hash64(df["u"].astype(str).to_numpy())
                          % np.uint64(num_buckets)).astype("int64")
        return df

    def star(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "v"])
        if small:
            lt = g[g["v"] < g["u"]]
            mn = lt.groupby("u", sort=False)["v"].min()
            # m = min(smaller neighbors, u) = that min (it is < u); nodes with
            # no smaller neighbor keep m = u.  Built with numpy positional
            # placement — any NaN detour (reindex / Series.update) silently
            # upcasts int ids to float, and the bucket hash of "10.0" != "10"
            # then splits groups across rounds (livelock).
            uniq = pd.Index(g["u"].unique())
            vals = uniq.to_numpy().copy()
            pos = uniq.get_indexer(mn.index)
            vals[pos] = mn.to_numpy()
            m_of = pd.Series(vals, index=uniq)
            # emit (v, m) for v < u, plus (u, m)
            out_v = lt["v"]
            out_m = lt["u"].map(m_of)
            self_rows = pd.DataFrame({"x": m_of.index, "y": m_of.to_numpy()})
            out = pd.concat([pd.DataFrame({"x": out_v.to_numpy(),
                                           "y": out_m.to_numpy()}), self_rows],
                            ignore_index=True)
        else:
            mn = g.groupby("u", sort=False)["v"].min()
            u_ser = mn.index.to_series()
            m_of = mn.where(mn < u_ser, u_ser)
            gt = g[g["v"] > g["u"]]
            out = pd.DataFrame({"x": gt["v"].to_numpy(),
                                "y": gt["u"].map(m_of).to_numpy()})
        out = out[out["x"] != out["y"]]
        a = out[["x", "y"]].min(axis=1)
        b = out[["x", "y"]].max(axis=1)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    return edges.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(star, batch_format="pandas")


def _edge_stats(edges) -> tuple[int, int]:
    """(count, order-independent checksum) in one cheap map over the
    ALREADY-MATERIALIZED edge blocks (no lineage re-execution)."""
    parts = edges.map_batches(
        lambda df: pd.DataFrame({
            "n": [len(df)],
            "h": [int((hash64((df["a"].astype(str) + "\0" +
                               df["b"].astype(str)).to_numpy())
                       % np.uint64(2**61)).sum())] if len(df) else [0]}),
        batch_format="pandas").to_pandas()
    if parts.empty or "n" not in parts.columns:
        return 0, 0
    return int(parts["n"].sum()), int(parts["h"].sum())


def _local_roots(a_vals, b_vals) -> dict:
    """Union-find over one batch's edges → {node: root} (root = component
    min), the map-side combine of the distributed CC."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    seen = set()
    for x, y in zip(a_vals, b_vals):
        seen.add(x)
        seen.add(y)
        rx, ry = find(x), find(y)
        if rx == ry:
            continue
        if ry < rx:
            rx, ry = ry, rx
        parent[ry] = rx
    return {x: find(x) for x in seen}


def connected_components_distributed(edges_ds, max_iterations: int = 50,
                                     num_buckets: int = 32,
                                     driver_finish_threshold: int = 200_000):
    """Distributed connected components in three phases:

      1. PRE-CONTRACT (map-only, no shuffle): per-batch union-find collapses
         every intra-batch structure — chains/cliques that fit a block never
         reach the shuffle.  Emits contracted edges + (node → rep) mapping
         rows in one tagged pass.  Contraction typically shrinks the graph
         by orders of magnitude (the residual is only cross-batch links).
      2a. RESIDUAL ≤ driver_finish_threshold: finish with driver union-find
         (the residual is provably bounded by the explicit guard — the same
         hybrid the repo uses for label blocking).
      2b. Otherwise STAR ROUNDS: alternating large-star / small-star
         (Kiveris et al., "Connected Components in MapReduce and Beyond",
         2014 — public algorithm) over the contracted cross-batch edges; ONE
         bucket shuffle per round, no joins; long chains collapse in
         O(log n) rounds.  At convergence the edge set IS the star forest
         (component-min → v).
      3. COMPOSE (one bucket shuffle): component(node) =
         star_label(rep(node)) or rep(node) — matched per bucket with numpy
         searchsorted, so integer/string id dtypes survive (no NaN-float
         round-trip)."""
    import ray.data as rd

    def canon_contract(t: pa.Table) -> pd.DataFrame:
        l = t.column("left_id").to_pandas()
        r = t.column("right_id").to_pandas()
        df = pd.DataFrame({"a": l.where(l < r, r), "b": r.where(l < r, l)})
        df = df[df["a"] != df["b"]].drop_duplicates()
        roots = _local_roots(df["a"].to_numpy(), df["b"].to_numpy())
        ra = df["a"].map(roots)
        rb = df["b"].map(roots)
        ea = ra.where(ra < rb, rb)
        eb = rb.where(ra < rb, ra)
        ed = pd.DataFrame({"x": ea, "y": eb})
        ed = ed[ed["x"] != ed["y"]].drop_duplicates()
        nodes = pd.unique(pd.concat([df["a"], df["b"]], ignore_index=True))
        reps = pd.Series(nodes).map(roots)
        mp = pd.DataFrame({"x": nodes, "y": reps.to_numpy()})
        ed.insert(0, "kind", np.int8(0))
        mp.insert(0, "kind", np.int8(1))
        return pd.concat([ed, mp], ignore_index=True)

    tagged = edges_ds.map_batches(canon_contract, batch_format="pyarrow") \
        .materialize()
    contracted = tagged.map_batches(
        lambda df: df[df["kind"] == 0].rename(columns={"x": "a", "y": "b"})
        [["a", "b"]], batch_format="pandas")
    mapping = tagged.map_batches(
        lambda df: df[df["kind"] == 1].rename(columns={"x": "node", "y": "rep"})
        [["node", "rep"]], batch_format="pandas")

    if tagged.count() == 0:
        return rd.from_pandas(pd.DataFrame({"id": pd.Series(dtype=object),
                                            "component": pd.Series(dtype=object)}))

    # a node seen by several batches got independent local reps — those reps
    # are one component, so link them (one bucket shuffle over the mapping)
    def bucketize_nodes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (hash64(df["node"].astype(str).to_numpy())
                          % np.uint64(num_buckets)).astype("int64")
        return df

    def link_shared(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["node", "rep"])
        mn = g.groupby("node", sort=False)["rep"].transform("min")
        extra = g["rep"] != mn
        return pd.DataFrame({"a": mn[extra].to_numpy(),
                             "b": g.loc[extra, "rep"].to_numpy()}) \
            .drop_duplicates()

    link_edges = mapping.map_batches(bucketize_nodes, batch_format="pandas") \
        .groupby("__bucket").map_groups(link_shared, batch_format="pandas")
    edges = contracted.union(link_edges).materialize()

    import os as _os
    debug = bool(_os.environ.get("GRAFT_CC_DEBUG"))
    n, checksum = _edge_stats(edges)

    def star_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"rep": df["b"], "comp": df["a"]})
        roots = pd.DataFrame({"rep": df["a"].unique()})
        roots["comp"] = roots["rep"]
        out = pd.concat([out, roots], ignore_index=True).drop_duplicates("rep")
        out.insert(0, "kind", np.int8(1))
        return out.rename(columns={"rep": "node", "comp": "val"})

    if 0 < n <= driver_finish_threshold:
        # residual is guard-bounded — driver union-find, skip the rounds
        edf = edges.to_pandas()
        comp = connected_components_local(edf, left="a", right="b")
        lab_df = pd.DataFrame({"kind": np.int8(1), "node": comp["id"],
                               "val": comp["component"]})
        labels = rd.from_pandas(lab_df)
        if debug:
            print(f"[cc] driver finish: residual {n} edges", flush=True)
    else:
        it = 0
        while n > 0 and it < max_iterations:
            edges = _star_round(edges, small=False, num_buckets=num_buckets) \
                .materialize()
            edges = _star_round(edges, small=True, num_buckets=num_buckets) \
                .materialize()
            new_n, new_checksum = _edge_stats(edges)
            if debug:
                print(f"[cc] round {it}: edges {n}->{new_n}", flush=True)
            if (new_n, new_checksum) == (n, checksum):
                break
            n, checksum = new_n, new_checksum
            it += 1
        # --- star forest labels ---
        labels = edges.map_batches(star_labels, batch_format="pandas")
    probes = mapping.map_batches(
        lambda df: pd.DataFrame({"kind": np.int8(0), "node": df["node"],
                                 "val": df["rep"]}),
        batch_format="pandas")

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        # label rows key on the rep they describe (their own node); probe
        # rows key on the rep they need (their val)
        kind = df["kind"].to_numpy()
        key = np.where(kind == 1, df["node"].astype(str).to_numpy(),
                       df["val"].astype(str).to_numpy())
        df = df.copy()
        df["__bucket"] = (hash64(key) % np.uint64(num_buckets)).astype("int64")
        return df

    def compose(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 1].drop_duplicates("node")
        pr = g[g["kind"] == 0]
        if pr.empty:
            return pd.DataFrame({"id": pr["node"], "component": pr["val"]})
        rep = pr["val"].to_numpy()
        if lab.empty:
            return pd.DataFrame({"id": pr["node"].to_numpy(), "component": rep})
        # numpy searchsorted lookup — id dtypes survive (no NaN-float detour)
        order = np.argsort(lab["node"].to_numpy(), kind="stable")
        keys = lab["node"].to_numpy()[order]
        vals = lab["val"].to_numpy()[order]
        idx = np.searchsorted(keys, rep)
        idx_c = np.clip(idx, 0, len(keys) - 1)
        found = keys[idx_c] == rep
        comp = np.where(found, vals[idx_c], rep)
        return pd.DataFrame({"id": pr["node"].to_numpy(), "component": comp})

    composed = labels.union(probes) \
        .map_batches(bucketize, batch_format="pandas") \
        .groupby("__bucket").map_groups(compose, batch_format="pandas")
    # a node seen by several batches composes once per distinct rep — all
    # agree on the component (the reps were linked), so keep the first
    from .aggregates import dedupe_by_key

    return dedupe_by_key(composed, "id", num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# 3. Per-component value resolution (DuplicateResolver port)
# ---------------------------------------------------------------------------

def resolve_string(values: list[str], strategy: StringResolution) -> str:
    vals = [v for v in values if v not in (None, "", "null")]
    if not vals:
        return "null"
    if strategy == StringResolution.longest:
        return max(vals, key=lambda v: (len(v), v))
    # voting: most frequent, ties → first in sorted order (total order for
    # run-to-run determinism; reference ties break by insertion order)
    counts = pd.Series(vals).value_counts()
    top = counts[counts == counts.iloc[0]]
    return sorted(top.index)[0]


def resolve_numeric(values: list[float], strategy: NumericResolution) -> float | None:
    vals = [v for v in values if v is not None and not (isinstance(v, float) and np.isnan(v))]
    if not vals:
        return None
    if strategy == NumericResolution.median:
        return float(np.median(vals))
    if strategy == NumericResolution.average:
        return float(np.mean(vals))
    counts = pd.Series(vals).value_counts()
    top = counts[counts == counts.iloc[0]]
    return float(sorted(top.index)[0])


def resolve_date(values: list) -> "pd.Timestamp | None":
    """DuplicateResolver date merge: mean of the epoch seconds (:340-355)."""
    ts = pd.to_datetime(pd.Series(values), errors="coerce").dropna()
    if ts.empty:
        return None
    return pd.Timestamp(int(ts.astype("int64").mean()))


def resolve_components(values_ds, value_type: str = "string",
                       cfg: PipelineConfig = DEFAULT_CONFIG):
    """(component, value) Dataset → (component, canonical_value).  One group
    per component; the merge functions are the DuplicateResolver resolutions
    (:294-355) with deterministic tie-breaks."""

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        comp = g["component"].iloc[0]
        if value_type == "numeric":
            canon = resolve_numeric(list(pd.to_numeric(g["value"], errors="coerce")),
                                    cfg.numeric_resolution)
        elif value_type == "date":
            canon = resolve_date(list(g["value"]))
        else:
            canon = resolve_string(list(g["value"].astype(str)), cfg.string_resolution)
        return pd.DataFrame({"component": [comp], "canonical_value": [canon]})

    return values_ds.groupby("component").map_groups(resolve, batch_format="pandas")


# ---------------------------------------------------------------------------
# 4. End-to-end canonicalization of a triple Dataset
# ---------------------------------------------------------------------------

def alias_edges_from_labels(labels_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                            min_jaccard: float | None = None):
    """(id, name) label pairs → verified near-duplicate id pairs.

    Labels repeat (across pages/shards): global dedupe runs as a
    LOW-cardinality bucket shuffle (aggregates.dedupe_by_key) — per-batch
    drop_duplicates as the map-side combine, then hash(id)%32 buckets, so
    neither the per-group overhead of a high-cardinality groupby nor
    cross-shard repeats (which would defeat the singleton-band prefilter in
    candidate_pairs) survive."""
    from .aggregates import dedupe_by_key

    # label-id cardinality is corpus-sized on the distributed path —
    # num_buckets=None derives B from the measured per-batch-deduped bytes
    labels = dedupe_by_key(labels_ds, "id", num_buckets=None)
    blocked = labels.map_batches(
        lsh_block_batch,
        fn_kwargs={"num_perm": cfg.minhash_num_perm,
                   "num_bands": cfg.minhash_bands},
        batch_format="pyarrow",
    )
    pairs = candidate_pairs(blocked)
    return verify_pairs(pairs, min_jaccard=min_jaccard
                        if min_jaccard is not None else cfg.fuzzy_min_confidence)


def subject_alias_edges(triples_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                        min_jaccard: float | None = None):
    """rdfs:label triples → verified near-duplicate subject pairs."""
    import pyarrow.compute as pc

    def label_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(
            t["pred"], pa.scalar("http://www.w3.org/2000/01/rdf-schema#label")))
        df = pd.DataFrame({"id": t.column("subj").to_pylist(),
                           "name": t.column("obj").to_pylist()})
        return pa.Table.from_pandas(df.drop_duplicates("id"), preserve_index=False)

    labels = triples_ds.map_batches(label_partials, batch_format="pyarrow")
    return alias_edges_from_labels(labels, cfg, min_jaccard)


def mapping_from_edges(edges_df: pd.DataFrame,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       use_distributed_cc: bool | None = None) -> dict:
    """Verified alias edges → {uri: canonical_uri} via connected components
    (empty dict = nothing merges; identity).

    SMALL-PATH ONLY: the caller must bound ``edges_df`` (it is a driver
    DataFrame).  The scale path is ``mapping_ds_from_edges`` — edge Dataset
    in, (uri, canon) Dataset out, nothing driver-sized in between."""
    if edges_df.empty:
        return {}
    if use_distributed_cc is None:
        use_distributed_cc = len(edges_df) >= 2_000_000
    if use_distributed_cc:
        import ray.data as rd

        comp = connected_components_distributed(
            rd.from_pandas(edges_df), cfg.cc_max_iterations).to_pandas()
    else:
        comp = connected_components_local(edges_df)
    return {i: c for i, c in zip(comp["id"], comp["component"]) if i != c}


def mapping_ds_from_edges(edges_ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Verified alias-edge Dataset → (uri, canon) mapping Dataset, fully
    Dataset-native: distributed connected components, then a map-only filter
    to the non-identity rows.  The mapping NEVER lands on the driver — feed
    the result straight to ``apply_canonical_mapping_join`` (or to
    ``apply_canonical_mapping``, which dispatches on type)."""
    comp = connected_components_distributed(edges_ds, cfg.cc_max_iterations)

    def non_identity(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["id"] != df["component"]]
        return pd.DataFrame({"uri": out["id"].to_numpy(),
                             "canon": out["component"].to_numpy()})

    return comp.map_batches(non_identity, batch_format="pandas")


def build_canonical_mapping(triples_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                            use_distributed_cc: bool | None = None) -> dict:
    """Blocking + verify + connected components over a triple Dataset."""
    edges_df = subject_alias_edges(triples_ds, cfg).to_pandas()
    return mapping_from_edges(edges_df, cfg, use_distributed_cc)


# a canonical mapping up to this many entries broadcasts via ray.put; larger
# mappings (not provably driver-sized at 10^12-document scale) go through the
# co-partitioned join path
MAPPING_BROADCAST_LIMIT = 5_000_000


def apply_canonical_mapping(triples_ds, mapping,
                            broadcast_limit: int = MAPPING_BROADCAST_LIMIT,
                            bucket_count: int | None = None):
    """Rewrite subj/obj URIs through the sameAs mapping.

    ``mapping`` is a dict (broadcast when within the explicit guard) or a
    Dataset with columns (uri, canon).  Above the guard the rewrite runs as
    co-partitioned bucket joins — the mapping never lands on the driver."""
    import ray
    import ray.data as rd

    if isinstance(mapping, dict):
        if not mapping:
            return triples_ds
        if len(mapping) <= broadcast_limit:
            map_ref = ray.put(mapping)

            def rewrite(df: pd.DataFrame) -> pd.DataFrame:
                m = ray.get(map_ref)
                mapped = df["subj"].map(m)
                df["subj"] = mapped.where(mapped.notna(), df["subj"])
                is_uri = df["obj_type"] == "uri"
                if is_uri.any():
                    mo = df.loc[is_uri, "obj"].map(m)
                    df.loc[is_uri, "obj"] = mo.where(mo.notna(),
                                                     df.loc[is_uri, "obj"])
                return df

            return triples_ds.map_batches(rewrite, batch_format="pandas")
        mapping = rd.from_pandas(pd.DataFrame(
            {"uri": list(mapping.keys()), "canon": list(mapping.values())}))
    return apply_canonical_mapping_join(triples_ds, mapping, bucket_count)


def apply_canonical_mapping_join(triples_ds, mapping_ds,
                                 bucket_count: int | None = None):
    """Join-based URI rewrite: triples ⋈ (uri → canon) co-partitioned on the
    subject hash, then the uri-typed objects through a second join; literal
    rows bypass the second shuffle entirely."""
    from .joins import bucket_join

    mapping_ds = mapping_ds.materialize()

    def fix_subj(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["subj"] = out["canon"].where(out["canon"].notna(), out["subj"])
        return out.drop(columns=["canon"])

    joined = bucket_join(triples_ds, mapping_ds, left_on="subj",
                         right_on="uri", bucket_count=bucket_count,
                         how="left").map_batches(fix_subj,
                                                 batch_format="pandas")
    joined = joined.materialize()
    uri_rows = joined.map_batches(lambda df: df[df["obj_type"] == "uri"],
                                  batch_format="pandas")
    lit_rows = joined.map_batches(lambda df: df[df["obj_type"] != "uri"],
                                  batch_format="pandas")

    def fix_obj(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["obj"] = out["canon"].where(out["canon"].notna(), out["obj"])
        return out.drop(columns=["canon"])

    fixed_uri = bucket_join(uri_rows, mapping_ds, left_on="obj",
                            right_on="uri", bucket_count=bucket_count,
                            how="left").map_batches(fix_obj,
                                                    batch_format="pandas")
    cols = ["subj", "pred", "obj", "obj_type", "source_url"]
    return lit_rows.map_batches(lambda df: df[cols], batch_format="pandas") \
        .union(fixed_uri.map_batches(lambda df: df[cols],
                                     batch_format="pandas"))


def canonicalize_triples(triples_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                         use_distributed_cc: bool | None = None):
    """build_canonical_mapping + apply_canonical_mapping in one call."""
    mapping = build_canonical_mapping(triples_ds, cfg, use_distributed_cc)
    return apply_canonical_mapping(triples_ds, mapping)
