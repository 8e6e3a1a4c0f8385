"""Two-phase (map-side partial + small final) grouped aggregation.

A bare ``groupby(key).aggregate(...)`` shuffles every row and, in this Ray
version, carries heavy per-block/per-group overhead (measured 35s vs 0.6s on
a 600k-row join output).  This operator computes partials per batch with
vectorized pandas, shuffles ONLY the partials, and finishes with a small
groupby — the combiner pattern the reference implements ad hoc with
synchronized accumulators (TableColumn.valuesInfo, JoinResult sums,
SearchJoin.java:827-840).

Supported functions: sum, count, min, max, mean (mean = sum/count derived
after the final merge).  Output column names are exactly the spec keys.
"""

from __future__ import annotations

import pandas as pd


def _auto_block_count(ds, target_bytes: int = 64 << 20,
                      lo: int = 8, hi: int = 4096) -> int:
    """Bucket/block count from measured bytes of a MATERIALIZED dataset —
    a fixed 8/32 caps reduce parallelism and requires each bucket to fit one
    worker's heap at any scale."""
    import numpy as np

    total = ds.size_bytes() or 0
    b = 1 << int(np.ceil(np.log2(max(1.0, total / target_bytes))))
    return int(np.clip(b, lo, hi))


def dedupe_by_key(ds, key: str, num_buckets: int | None = 32,
                  driver_final_bytes: int | None = None):
    """Global distinct-by-key.  The per-batch drop_duplicates pass (map-side
    combine) always runs and is materialized to MEASURE the surviving set:

    * under the driver guard (default ``DRIVER_FINAL_BYTES``): one pandas
      drop_duplicates on the driver, split back into ``num_buckets`` blocks
      WITHOUT a shuffle — the bucket sort-exchange costs ~2 s of fixed task
      overhead for kilobytes of distinct rows (measured on distinct_mentions:
      2.5 s → 0.1 s for 1000 distinct strings).  First row per key in global
      block order wins — the same first-wins contract as the bucket path.
    * above it: bucket = hash(key) % B → groupby(bucket).map_groups
      (drop_duplicates).  B groups regardless of key cardinality — the
      per-group overhead of a high-cardinality groupby never appears.
      ``num_buckets=None`` derives B from the measured bytes."""
    import numpy as np

    import ray.data as rd

    from ..functions.hashing import hash64

    if driver_final_bytes is None:
        driver_final_bytes = DRIVER_FINAL_BYTES
    deduped = ds.map_batches(lambda df: df.drop_duplicates(key),
                             batch_format="pandas").materialize()
    if deduped.num_blocks() > 64:
        # second combine level: per-block distinct sets repeat hot keys once
        # per block, so at large block counts the driver pull (and the
        # bucket exchange above the guard) would carry blocks × distinct
        # rows — bundle ~32 partial blocks per task and dedupe again
        rows_per_block = max(1, deduped.count() // deduped.num_blocks())
        deduped = deduped.map_batches(
            lambda df: df.drop_duplicates(key), batch_format="pandas",
            batch_size=max(4096, rows_per_block * 32)).materialize()
    if deduped.size_bytes() <= driver_final_bytes:
        out = deduped.to_pandas().drop_duplicates(key).reset_index(drop=True)
        if out.empty:
            return rd.from_pandas(out)
        n = int(min(num_buckets or 32, max(1, len(out))))
        return rd.from_pandas(
            [c.reset_index(drop=True) for c in np.array_split(out, n)])
    if num_buckets is None:
        num_buckets = _auto_block_count(deduped)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(key)
        df["__bucket"] = (hash64(df[key].astype(str).to_numpy())
                          % np.uint64(num_buckets)).astype("int64")
        return df

    return deduped.map_batches(local, batch_format="pandas") \
        .groupby("__bucket") \
        .map_groups(lambda g: g.drop_duplicates(key).drop(columns="__bucket"),
                    batch_format="pandas")


DRIVER_FINAL_BYTES = 32 << 20


def two_phase_agg(ds, keys: list[str], spec: dict[str, tuple[str | None, str]],
                  final_blocks: int | None = 8,
                  driver_final_bytes: int = DRIVER_FINAL_BYTES):
    """spec: output_name -> (input_column | None, fn); fn ∈ {sum,count,min,max,mean}.

    Returns a Dataset with columns keys + list(spec).

    Partials are always materialized (they are combiner output — bounded by
    #blocks × per-block distinct keys, tiny for low-cardinality groupbys).
    When the measured partial bytes fit ``driver_final_bytes`` the final
    merge happens ON THE DRIVER in one pandas groupby — a repartition + sort
    shuffle for kilobytes of partials costs ~2 s of fixed task overhead per
    query at any cluster size.  Above the guard (corpus-cardinality keys)
    the partials bucket by key hash into ``final_blocks`` groups and each
    bucket merges with ONE vectorized pandas groupby — key cardinality
    never meets Ray's per-group machinery (a bare groupby(keys).aggregate
    measured 508 s where the bucket final takes ~8 s on a 6M-row/2M-key
    posting set).  Pass ``final_blocks=None`` to derive the bucket count
    from measured partial bytes.
    """
    sum_cols: dict[str, str] = {}
    min_cols: dict[str, str] = {}
    max_cols: dict[str, str] = {}
    mean_cols: dict[str, str] = {}
    count_names: list[str] = []
    for out, (col, fn) in spec.items():
        if fn == "sum":
            sum_cols[out] = col
        elif fn == "min":
            min_cols[out] = col
        elif fn == "max":
            max_cols[out] = col
        elif fn == "mean":
            mean_cols[out] = col
        elif fn == "count":
            count_names.append(out)
        else:
            raise ValueError(f"unsupported agg fn {fn}")
    need_count = bool(count_names or mean_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        parts = {}
        for out, col in sum_cols.items():
            parts[out] = g[col].sum()
        for out, col in min_cols.items():
            parts[out] = g[col].min()
        for out, col in max_cols.items():
            parts[out] = g[col].max()
        for out, col in mean_cols.items():
            parts[f"__sum_{out}"] = g[col].sum()
        if need_count:
            parts["__n"] = g.size()
        return pd.DataFrame(parts).reset_index()

    def merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        """Partial rows → final rows (shared by the driver finish and the
        per-bucket finish — identical code, identical dtypes either way)."""
        g = pdf.groupby(keys, sort=False, dropna=False)
        parts = {}
        for out in sum_cols:
            parts[out] = g[out].sum()
        for out in min_cols:
            parts[out] = g[out].min()
        for out in max_cols:
            parts[out] = g[out].max()
        for out in mean_cols:
            parts[f"__sum_{out}"] = g[f"__sum_{out}"].sum()
        if need_count:
            parts["__n"] = g["__n"].sum()
        final = pd.DataFrame(parts).reset_index()
        for out in mean_cols:
            final[out] = final[f"__sum_{out}"] / final["__n"]
        for out in count_names:
            final[out] = final["__n"]
        return final[keys + list(spec)]

    partials = ds.map_batches(partial, batch_format="pandas").materialize()
    if partials.size_bytes() <= driver_final_bytes:
        import ray.data as rd

        pdf = partials.to_pandas()
        if pdf.empty:
            return rd.from_pandas(pd.DataFrame(columns=keys + list(spec)))
        return rd.from_pandas(merge_partials(pdf))

    # Above the guard the keys are corpus-cardinality (millions of groups):
    # a bare groupby(keys).aggregate(...) here pays Ray's per-group overhead
    # on every one of them (measured 508 s for a 6M-row / ~2M-token posting
    # df at 16 cpus).  Bucket the partials by key hash instead — B groups
    # regardless of key cardinality, one vectorized pandas merge per bucket
    # (the dedupe_by_key shape; same data, 8 s).
    import numpy as np

    from ..functions.hashing import hash64

    num_buckets = final_blocks if final_blocks else _auto_block_count(partials)

    def add_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        joined = pdf[keys[0]].astype(str)
        for k in keys[1:]:
            joined = joined + "\x00" + pdf[k].astype(str)
        pdf["__bucket"] = (hash64(joined.to_numpy())
                           % np.uint64(num_buckets)).astype("int64")
        return pdf

    return partials.map_batches(add_bucket, batch_format="pandas") \
        .groupby("__bucket") \
        .map_groups(lambda g: merge_partials(g.drop(columns="__bucket")),
                    batch_format="pandas")
