"""Partitioned hash join built from groupby primitives (the portable
large-large join).

``Dataset.join`` exists in this Ray version but its actor-based hash shuffle
carries heavy fixed costs at moderate scale; this operator expresses the same
exchange as ONE union + ONE groupby shuffle:

    left  → add bucket = hash(key) % B, tag side=0
    right → add bucket,                 tag side=1
    union → groupby(bucket) → pandas merge inside each group

Partitioning assumption: both sides co-locate by ``hash(key) % B``; B sizes
the per-task merge to worker memory.  Skewed keys: pass ``salt=K`` with a
``hot_keys`` set (``detect_hot_keys`` finds them with bounded partials) —
hot probe rows spread over K sub-buckets, hot build rows replicate into
each, equivalence-tested against the unsalted join.

Used by the fusion operator (DataFuser analog) and the relational queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import hash64


def _schema_names(ds) -> list[str]:
    sch = ds.schema()
    names = getattr(sch, "names", None)
    if names:
        return list(names)
    base = getattr(sch, "base_schema", sch)
    out = []
    for f in base:
        out.append(f.name if hasattr(f, "name") else str(f))
    return out


def _prep(ds, on: str, bucket_count: int, side: int, all_cols: list[str]):
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame()
        out["__key"] = df[on]
        for c in all_cols:
            if c in df.columns and c != on:
                out[c] = df[c]
            elif c != on:
                out[c] = None
        out["__bucket"] = (hash64(df[on].astype(str).to_numpy())
                           % np.uint64(bucket_count)).astype("int64")
        out["__side"] = np.int8(side)
        return out

    return ds.map_batches(tag, batch_format="pandas")


def detect_hot_keys(ds, col: str, min_count: int = 100_000,
                    top_n: int = 64) -> set:
    """Keys whose row count exceeds ``min_count`` (bounded to the top_n):
    per-batch partial counts keep only candidates above min_count/#batches…
    simplified to per-batch top counts merged on the driver — the partials
    are top_n rows per batch, so the merge is bounded by batches × top_n."""
    partials = ds.map_batches(
        lambda df: df[col].value_counts().head(top_n).rename("n")
        .rename_axis("k").reset_index(),
        batch_format="pandas").to_pandas()
    if partials.empty:
        return set()
    totals = partials.groupby("k")["n"].sum()
    return set(totals[totals >= min_count].head(top_n).index)


def bucket_join(left_ds, right_ds, left_on: str, right_on: str,
                bucket_count: int = 32, how: str = "inner",
                salt: int = 1, hot_keys: set | None = None):
    """Hash-partitioned join of two Datasets → Dataset with the union of
    columns (join key kept under the LEFT name).

    Skew: with ``salt > 1`` and a ``hot_keys`` set (e.g. from
    ``detect_hot_keys``), hot LEFT rows spread over ``salt`` sub-buckets
    (random-ish via a row-content hash) while hot RIGHT rows REPLICATE into
    every sub-bucket — the classic salted join, so one hot key no longer
    pins an entire reduce task."""
    left_cols = _schema_names(left_ds)
    right_cols = _schema_names(right_ds)
    shared = (set(left_cols) - {left_on}) & (set(right_cols) - {right_on})
    if shared:
        raise ValueError(f"overlapping non-key columns: {shared}")
    all_cols = sorted((set(left_cols) - {left_on}) | (set(right_cols) - {right_on}))

    use_salt = salt > 1 and hot_keys
    if use_salt:
        import ray

        hot_ref = ray.put(set(hot_keys))

        def prep_salted(ds, on, side):
            def tag(df: pd.DataFrame) -> pd.DataFrame:
                hot = ray.get(hot_ref)
                out = pd.DataFrame()
                out["__key"] = df[on]
                for c in all_cols:
                    if c in df.columns and c != on:
                        out[c] = df[c]
                    elif c != on:
                        out[c] = None
                base = hash64(df[on].astype(str).to_numpy())
                is_hot = df[on].isin(hot).to_numpy()
                if side == 0:
                    # spread hot probe rows by a per-row salt
                    row_salt = (np.arange(len(df)) % salt).astype(np.uint64)
                    sub = np.where(is_hot, row_salt, 0).astype(np.uint64)
                    out["__bucket"] = ((base * np.uint64(salt) + sub)
                                       % np.uint64(bucket_count * salt)) \
                        .astype("int64")
                    out["__side"] = np.int8(0)
                    return out
                # build side: replicate hot rows into every sub-bucket
                out["__side"] = np.int8(1)
                cold = out[~is_hot].copy()
                cold["__bucket"] = ((base[~is_hot] * np.uint64(salt))
                                    % np.uint64(bucket_count * salt)) \
                    .astype("int64")
                reps = []
                hot_rows = out[is_hot]
                hb = base[is_hot]
                for s in range(salt):
                    rep = hot_rows.copy()
                    rep["__bucket"] = ((hb * np.uint64(salt) + np.uint64(s))
                                       % np.uint64(bucket_count * salt)) \
                        .astype("int64")
                    reps.append(rep)
                return pd.concat([cold] + reps, ignore_index=True)

            return ds.map_batches(tag, batch_format="pandas")

        l2 = prep_salted(left_ds, left_on, 0)
        r2 = prep_salted(right_ds, right_on, 1)
    else:
        l2 = _prep(left_ds, left_on, bucket_count, 0, all_cols)
        r2 = _prep(right_ds, right_on, bucket_count, 1, all_cols)
    lc = [c for c in left_cols if c != left_on]
    rc = [c for c in right_cols if c != right_on]

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0]
        r = group[group["__side"] == 1]
        m = l[["__key"] + lc].merge(r[["__key"] + rc], on="__key", how=how)
        return m.rename(columns={"__key": left_on})

    return l2.union(r2).groupby("__bucket").map_groups(merge, batch_format="pandas")


def bucket_anti_join(left_ds, right_ds, left_on: str, right_on: str,
                     bucket_count: int = 32):
    """LEFT rows whose key has NO match on the right — the exact anti-join,
    expressed as the same one-union-one-groupby exchange as ``bucket_join``.
    The right side ships only its per-batch-deduped KEYS (map-side combine),
    so the shuffle volume is bounded by distinct keys, not fact-table rows."""
    left_cols = _schema_names(left_ds)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__key"] = df[left_on]
        out["__bucket"] = (hash64(df[left_on].astype(str).to_numpy())
                           % np.uint64(bucket_count)).astype("int64")
        out["__side"] = np.int8(0)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[right_on].drop_duplicates()
        out = pd.DataFrame({"__key": keys})
        for c in left_cols:
            out[c] = None
        out["__bucket"] = (hash64(keys.astype(str).to_numpy())
                           % np.uint64(bucket_count)).astype("int64")
        out["__side"] = np.int8(1)
        return out

    l2 = left_ds.map_batches(tag_left, batch_format="pandas")
    r2 = right_ds.map_batches(tag_right, batch_format="pandas")

    def anti(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0]
        rkeys = group.loc[group["__side"] == 1, "__key"]
        keep = l[~l["__key"].isin(set(rkeys))]
        return keep[left_cols]

    return l2.union(r2).groupby("__bucket").map_groups(anti,
                                                       batch_format="pandas")


def asof_join(left_ds, right_ds, left_on: str, right_on: str,
              left_ts: str, right_ts: str, bucket_count: int = 16,
              inner: bool = True):
    """As-of join (nearest right row with right_ts <= left_ts per key): sort
    both sides by (key, ts) within hash(key) buckets and ``pd.merge_asof``
    per bucket — the range-join pattern from the Ray guide.  One groupby
    shuffle; ordering assumption: ts sortable within a bucket's memory."""
    left_cols = _schema_names(left_ds)
    right_cols = _schema_names(right_ds)
    shared = (set(left_cols) - {left_on}) & (set(right_cols) - {right_on})
    if shared:
        raise ValueError(f"overlapping non-key columns: {shared}")
    all_cols = sorted((set(left_cols) - {left_on}) | (set(right_cols) - {right_on}))

    l2 = _prep(left_ds, left_on, bucket_count, 0, all_cols)
    r2 = _prep(right_ds, right_on, bucket_count, 1, all_cols)
    lc = [c for c in left_cols if c != left_on]
    rc = [c for c in right_cols if c != right_on]

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0][["__key"] + lc] \
            .sort_values([left_ts, "__key"]).reset_index(drop=True)
        r = group[group["__side"] == 1][["__key"] + rc] \
            .sort_values([right_ts, "__key"]).reset_index(drop=True)
        # blocks may carry different timestamp resolutions (us vs ns)
        # depending on which stage produced them — merge_asof needs equal dtypes
        if pd.api.types.is_datetime64_any_dtype(l[left_ts]):
            l[left_ts] = l[left_ts].astype("datetime64[ns]")
        if pd.api.types.is_datetime64_any_dtype(r[right_ts]):
            r[right_ts] = r[right_ts].astype("datetime64[ns]")
        if l.empty:
            return pd.DataFrame(columns=["__key"] + lc + rc).rename(
                columns={"__key": left_on})
        if r.empty:
            m = l.copy()
            for c in rc:
                m[c] = None
        else:
            m = pd.merge_asof(l, r, left_on=left_ts, right_on=right_ts,
                              by="__key", direction="backward")
        if inner:
            m = m[m[right_ts].notna()]
        return m.rename(columns={"__key": left_on})

    return l2.union(r2).groupby("__bucket").map_groups(merge, batch_format="pandas")
