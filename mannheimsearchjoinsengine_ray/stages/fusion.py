"""Fusion: matched entities ⋈ triples → augmented (long) view + pivot.

Re-expresses DataFuser.fuseCompleteTableFast / addValuesToColumn
(SJ/datafusion/DataFuser.java:271-462, 489-556) at triple granularity
(SURVEY §7.4: the reference pivots into hundreds of ``header|table|colIdx``
columns; at scale the fused view stays a LONG (query_key, pred, obj) table
and pivots only for small exports):

  * link edges (mention → entity_uri) are the small side → broadcast;
  * triples are filtered to matched subjects (broadcast semi-join) and tagged
    with the mention that matched them;
  * optional header filter = allowed predicate set, exact or normalized
    (DataFuser.java:497-506), applied as a vectorized filter;
  * ``pivot_fused`` builds the reference-shaped wide table for small results,
    column key = ``pred|source_url`` (the header|tablePath analog), cells
    resolved by first-wins like TableColumn.addNewValue.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.normalize import clear_string

FUSED_SCHEMA = pa.schema([
    ("query_key", pa.string()),      # the mention that matched
    ("entity_uri", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_type", pa.string()),
    ("source_url", pa.string()),
])


def fuse_edges_with_triples(edges_ds, triples_ds,
                            header_filter: list[str] | None = None,
                            exact_headers: bool = False):
    """Long fused view: one row per (matched mention × entity triple).

    edges: (mention, entity_uri, ...) — top-1 link edges, the SMALL side.
    triples: (subj, pred, obj, obj_type, source_url).
    """
    import ray

    edges_df = edges_ds.to_pandas() if hasattr(edges_ds, "to_pandas") else edges_ds
    uri_to_mentions: dict[str, list[str]] = {}
    for m, u in zip(edges_df["mention"], edges_df["entity_uri"]):
        uri_to_mentions.setdefault(u, []).append(m)
    allowed = None
    if header_filter:
        allowed = set(header_filter) if exact_headers else {
            clear_string(h, True) for h in header_filter}
    lookup_ref = ray.put((uri_to_mentions, allowed, exact_headers))

    def fuse(batch: pa.Table) -> pa.Table:
        uri_map, allow, exact = ray.get(lookup_ref)
        out = {n: [] for n in FUSED_SCHEMA.names}
        for subj, pred, obj, ot, src in zip(
            batch.column("subj").to_pylist(), batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(), batch.column("obj_type").to_pylist(),
            batch.column("source_url").to_pylist(),
        ):
            mentions = uri_map.get(subj)
            if not mentions:
                continue
            if allow is not None:
                header = pred.rsplit("/", 1)[-1]
                key = header if exact else clear_string(header, True)
                if key not in allow:
                    continue
            for m in mentions:
                out["query_key"].append(m)
                out["entity_uri"].append(subj)
                out["pred"].append(pred)
                out["obj"].append(obj)
                out["obj_type"].append(ot)
                out["source_url"].append(src)
        return pa.Table.from_pydict(out, schema=FUSED_SCHEMA)

    return triples_ds.map_batches(fuse, batch_format="pyarrow")


def pivot_fused(long_df: pd.DataFrame) -> pd.DataFrame:
    """Wide AugmentedTable view for SMALL fused results: one row per
    query_key, one column per (pred | source_url), first value wins
    (TableColumn.addNewValue insert semantics)."""
    if long_df.empty:
        return pd.DataFrame({"query_key": []})
    long_df = long_df.copy()
    long_df["col"] = long_df["pred"].str.rsplit("/", n=1).str[-1] + "|" + \
        long_df["source_url"]
    wide = long_df.pivot_table(index="query_key", columns="col", values="obj",
                               aggfunc="first")
    wide.columns.name = None
    return wide.reset_index()
