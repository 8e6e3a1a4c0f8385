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


def _pairs_from_group(group: pd.DataFrame, max_block: int = 50) -> pd.DataFrame:
    g = group.drop_duplicates("id").sort_values("id")
    ids = g["id"].tolist()
    names = g["name"].tolist()
    if len(ids) < 2:
        return pd.DataFrame({
            "left_id": pd.Series(dtype=group["id"].dtype),
            "right_id": pd.Series(dtype=group["id"].dtype),
            "left_name": pd.Series(dtype="string"),
            "right_name": pd.Series(dtype="string"),
        })
    L, R, LN, RN = [], [], [], []
    if len(ids) <= max_block:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                L.append(ids[i]); R.append(ids[j])
                LN.append(names[i]); RN.append(names[j])
    else:
        # star around the minimum id — O(n) edges, same components
        for j in range(1, len(ids)):
            L.append(ids[0]); R.append(ids[j])
            LN.append(names[0]); RN.append(names[j])
    return pd.DataFrame({"left_id": L, "right_id": R,
                         "left_name": LN, "right_name": RN})


def candidate_pairs(blocked_ds, max_block: int = 50):
    """groupby(band) → unordered candidate pairs.  Blocks larger than
    ``max_block`` are truncated after sorting by id (deterministic) — the
    skew guard; every member still pairs with the block minimum so the
    component structure survives (star pattern instead of clique).

    Almost every (band_idx, band_hash) key is a singleton that cannot yield a
    pair; since map_groups pays per-group overhead, singletons are dropped
    FIRST.  The duplicated-band-key set is found WITHOUT a high-cardinality
    Ray aggregate (this version's groupby cost scales with group count):
    per-batch pandas counts are merged on the driver — partials are bounded
    by the blocked row count, a few MB at millions of labels.  (Beyond ~10^8
    distinct band keys the merge itself would need a tree reduce.)"""
    import ray

    blocked_ds = blocked_ds.materialize()

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["band_idx", "band_hash"], sort=False).size()
        return g.rename("n").reset_index()

    partials = blocked_ds.map_batches(partial_counts,
                                      batch_format="pandas").to_pandas()
    if partials.empty:
        return blocked_ds.limit(0).map_batches(
            lambda g: _pairs_from_group(g, max_block), batch_format="pandas")
    totals = partials.groupby(["band_idx", "band_hash"], sort=False)["n"].sum()
    hot = totals[totals >= 2]
    if hot.empty:
        return blocked_ds.limit(0).map_batches(
            lambda g: _pairs_from_group(g, max_block), batch_format="pandas")
    hot_keys = set(hot.index)
    hot_ref = ray.put(hot_keys)

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(hot_ref)
        mask = [
            (bi, bh) in keys
            for bi, bh in zip(df["band_idx"], df["band_hash"])
        ]
        return df[pd.Series(mask, index=df.index)]

    return blocked_ds.map_batches(semi, batch_format="pandas") \
        .repartition(8).groupby(["band_idx", "band_hash"]) \
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


def connected_components_distributed(edges_ds, max_iterations: int = 50,
                                     num_partitions: int = 16):
    """Min-label propagation with Dataset ops only (the canonicalization
    groupby-aggregate of the north rule).

    labels(node,label) start as node; each round joins labels across edges
    and takes groupby(node).min(candidate); stops when the global checksum of
    labels is stable.  Hot nodes are just rows — the groupby shuffle hashes
    them across partitions, and min() is associative so Ray's map-side
    combine handles skew (two-phase aggregation)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = edges_ds.map_batches(
        lambda t: pa.table({"src": t["left_id"], "dst": t["right_id"]}),
        batch_format="pyarrow")

    def explode_nodes(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nodes = pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()])
        return pa.table({"node": nodes, "label": nodes})

    labels = edges.map_batches(explode_nodes, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label"))

    def checksum(lab_ds) -> int:
        from ray.data.aggregate import Sum

        h = lab_ds.map_batches(
            lambda t: pa.table({"h": (hash64(t.column("label").to_pylist())
                                      % np.uint64(2**61)).astype("int64")}),
            batch_format="pyarrow")
        return h.aggregate(Sum("h"))["sum(h)"]

    prev = checksum(labels)
    for _ in range(max_iterations):
        # candidate labels flow across edges in both directions
        l1 = edges.join(labels, join_type="inner", num_partitions=num_partitions,
                        on=("src",), right_on=("node",)) \
            .map_batches(lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
                         batch_format="pyarrow")
        l2 = edges.join(labels, join_type="inner", num_partitions=num_partitions,
                        on=("dst",), right_on=("node",)) \
            .map_batches(lambda t: pa.table({"node": t["src"], "label": t["label"]}),
                         batch_format="pyarrow")
        cand = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label"]}),
            batch_format="pyarrow").union(l1).union(l2)
        labels = cand.groupby("node").aggregate(Min("label", alias_name="label")) \
            .materialize()
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels.map_batches(
        lambda t: pa.table({"id": t["node"], "component": t["label"]}),
        batch_format="pyarrow")


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

    labels = dedupe_by_key(labels_ds, "id", num_buckets=32)
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
    (empty dict = nothing merges; identity)."""
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


def build_canonical_mapping(triples_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                            use_distributed_cc: bool | None = None) -> dict:
    """Blocking + verify + connected components over a triple Dataset."""
    edges_df = subject_alias_edges(triples_ds, cfg).to_pandas()
    return mapping_from_edges(edges_df, cfg, use_distributed_cc)


def apply_canonical_mapping(triples_ds, mapping: dict):
    """Rewrite subj/obj URIs through the (small, broadcast) sameAs mapping."""
    import ray

    if not mapping:
        return triples_ds
    map_ref = ray.put(mapping)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        mapped = df["subj"].map(m)
        df["subj"] = mapped.where(mapped.notna(), df["subj"])
        is_uri = df["obj_type"] == "uri"
        if is_uri.any():
            mo = df.loc[is_uri, "obj"].map(m)
            df.loc[is_uri, "obj"] = mo.where(mo.notna(), df.loc[is_uri, "obj"])
        return df

    return triples_ds.map_batches(rewrite, batch_format="pandas")


def canonicalize_triples(triples_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                         use_distributed_cc: bool | None = None):
    """build_canonical_mapping + apply_canonical_mapping in one call."""
    mapping = build_canonical_mapping(triples_ds, cfg, use_distributed_cc)
    return apply_canonical_mapping(triples_ds, mapping)
