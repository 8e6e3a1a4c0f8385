"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
broadcast query matrix (ray.put once, read in every task), partial top-k per
batch, exact merge on the driver (k × #batches rows, bounded).

Scale path: IVF — coarse centroids (deterministic k-means on a sample),
vectors partitioned by nearest centroid; a query probes only the ``nprobe``
closest centroid partitions.  Two forms:
  * ``knn_ivf``      — in-memory: the Dataset carries the assignment, every
    batch is scanned but masked per query (fine when the set is already
    loaded);
  * ``build_ivf_index`` + ``knn_ivf_index`` — PHYSICAL: vectors written to
    ``centroid=<id>/`` Parquet partitions; a probe lists only its nprobe
    directories, so the pruning happens at the READ (no full scan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _unit(m: np.ndarray, dtype=np.float32) -> np.ndarray:
    m = np.asarray(m, dtype=dtype)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _det_topk(sims: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the top-``kk`` by (cosine DESC, id ASC) — the DuckDB
    oracle's order.  A bare argpartition keeps/drops equal-cosine candidates
    at the k boundary arbitrarily; here the tie set at the kth value is
    gathered exactly (O(n) threshold pass) and only it is sorted."""
    if kk >= len(sims):
        cand = np.arange(len(sims))
    else:
        thr = np.partition(sims, len(sims) - kk)[len(sims) - kk]
        cand = np.flatnonzero(sims >= thr)
    order = np.lexsort((ids[cand], -sims[cand]))
    return cand[order[:kk]]


def knn_brute(emb_ds, query_matrix: np.ndarray, k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              query_ids: np.ndarray | None = None) -> pd.DataFrame:
    """Exact cosine top-k: → (query_id, neighbor_id, cosine, rank)."""
    import ray

    q = _unit(query_matrix, dtype=np.float64)
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)                       # (Q, d) — broadcast once
        ids = np.asarray(batch.column(id_col).to_pylist())
        vecs = _unit(batch.column(vec_col).to_pylist(), dtype=np.float64)
        sims = qm @ vecs.T                        # (Q, n)
        kk = min(k, sims.shape[1])
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(qm.shape[0]):
            sel = _det_topk(sims[qi], ids, kk)
            rows_q.extend([qi] * len(sel))
            rows_id.extend(ids[sel].tolist())
            rows_s.extend(sims[qi, sel].tolist())
        return pa.table({
            "query_idx": pa.array(rows_q, pa.int32()),
            "neighbor_id": pa.array(rows_id),
            "cosine": pa.array(rows_s, pa.float64()),
        })

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int32))
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    if query_ids is not None:
        res["query_id"] = np.asarray(query_ids)[res["query_idx"]]
    else:
        res["query_id"] = res["query_idx"]
    return res[["query_id", "neighbor_id", "cosine", "rank"]]


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample."""
    rng = np.random.default_rng(seed)
    x = _unit(np.asarray(sample, dtype=np.float32))
    idx = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    c = x[idx].copy()
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = _unit(c)
    return c


def assign_centroids(emb_ds, centroids: np.ndarray,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Adds a ``centroid`` column (the IVF partitioning key)."""
    import ray

    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        vecs = _unit(np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32))
        a = (vecs @ c.T).argmax(axis=1).astype("int32")
        return batch.append_column("centroid", pa.array(a))

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def build_ivf_index(emb_ds, index_dir: str, n_centroids: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    sample_size: int = 2048) -> np.ndarray:
    """Physically partition the embedding set by nearest centroid:
    ``index_dir/centroid=<id>/part-*.parquet`` + ``centroids.npy``.  A probe
    then READS only its nprobe partitions — the pruning happens at the file
    listing, no full scan (the scale path the in-memory knn_ivf documents).
    Writes are atomic (tmp dir + rename) and idempotent via a marker."""
    import json
    import os
    import shutil

    done_marker = index_dir.rstrip("/") + ".complete"
    if os.path.exists(done_marker):
        return np.load(os.path.join(index_dir, "centroids.npy"))
    shutil.rmtree(index_dir, ignore_errors=True)
    tmp = index_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    sample = emb_ds.random_sample(
        min(1.0, sample_size / max(1, emb_ds.count())), seed=42).to_pandas()
    cents = train_centroids(np.stack(sample[vec_col].to_numpy()), n_centroids)
    assigned = assign_centroids(emb_ds, cents, id_col, vec_col)

    def write_group(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        cid = int(group.column("centroid")[0].as_py())
        d = os.path.join(tmp, f"centroid={cid:05d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(group.drop_columns(["centroid"]),
                       os.path.join(d, "part-0.parquet"))
        return pa.table({"centroid": [cid], "rows": [group.num_rows]})

    stats = assigned.groupby("centroid").map_groups(
        write_group, batch_format="pyarrow").take_all()
    np.save(os.path.join(tmp, "centroids.npy"), cents)
    with open(os.path.join(tmp, "meta.json"), "w") as fh:
        json.dump({"partitions": [{"centroid": int(s["centroid"]),
                                   "rows": int(s["rows"])} for s in stats],
                   "id_col": id_col, "vec_col": vec_col}, fh)
    os.replace(tmp, index_dir)
    with open(done_marker, "w") as fh:
        fh.write("ok")
    return cents


def ivf_partition_files(index_dir: str, centroid_ids) -> list[str]:
    """Parquet files of the given centroid partitions (the pruned listing)."""
    import os

    files: list[str] = []
    for cid in sorted(set(int(c) for c in centroid_ids)):
        d = os.path.join(index_dir, f"centroid={cid:05d}")
        if os.path.isdir(d):
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    return files


def knn_ivf_index(index_dir: str, query_matrix: np.ndarray, k: int = 5,
                  nprobe: int = 4, query_ids: np.ndarray | None = None,
                  stats: dict | None = None) -> pd.DataFrame:
    """Probe a physically-partitioned IVF index: only the union of the
    queries' nprobe centroid partitions is read (pass ``stats`` to observe
    files_read/files_total — the pruning evidence the tests assert)."""
    import os

    import ray
    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    # float64 + stable sort: the probe choice must be reproducible by the
    # DuckDB oracle (double-precision cosine, ties broken by centroid id)
    q = _unit(np.asarray(query_matrix, dtype=np.float64), dtype=np.float64)
    probe = np.argsort(-(q @ cents.astype(np.float64).T), axis=1,
                       kind="stable")[:, :nprobe]             # (Q, nprobe)
    files = ivf_partition_files(index_dir, probe.reshape(-1))
    if stats is not None:
        all_parts = [d for d in os.listdir(index_dir)
                     if d.startswith("centroid=")]
        stats["files_read"] = len(files)
        stats["files_total"] = len(ivf_partition_files(
            index_dir, [int(d.split("=")[1]) for d in all_parts]))
        stats["partitions_read"] = len({os.path.dirname(f) for f in files})
        stats["partitions_total"] = len(all_parts)
    if not files:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine", "rank"])

    assigned = rd.read_parquet(files)
    # the hive-style centroid=<id>/ path component arrives as a `centroid`
    # column from read_parquet — each batch gets its per-query mask from it
    # (a vector may sit in a partition probed by one query but not another)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe)

    def partial(batch: pa.Table) -> pa.Table:
        qm, pr = ray.get(q_ref), ray.get(probe_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist())
        cent = np.asarray([int(c) for c in
                           batch.column("centroid").to_pylist()])
        # float64 like knn_brute: at nprobe=all the probe is exact and must
        # reproduce the brute-force (and DuckDB-oracle) ordering bit-for-bit
        vecs = _unit(np.asarray(batch.column("embedding").to_pylist(),
                                dtype=np.float64), dtype=np.float64)
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cent, pr[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ qm[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sims))
            sel = _det_topk(sims, sub_ids, kk)
            rows_q.extend([qi] * kk)
            rows_id.extend(sub_ids[sel].tolist())
            rows_s.extend(sims[sel].tolist())
        return pa.table({
            "query_idx": pa.array(rows_q, pa.int32()),
            "neighbor_id": pa.array(rows_id),
            "cosine": pa.array(rows_s, pa.float64()),
        })

    partials = assigned.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int32))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_idx", "neighbor_id", "cosine", "rank"])
    if query_ids is not None:
        res["query_id"] = np.asarray(query_ids)[res["query_idx"].astype(int)]
    else:
        res["query_id"] = res["query_idx"]
    return res[["query_id", "neighbor_id", "cosine", "rank"]]


def knn_ivf(emb_ds, query_matrix: np.ndarray, k: int = 5, n_centroids: int = 16,
            nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
            query_ids: np.ndarray | None = None,
            sample_size: int = 2048,
            centroids: np.ndarray | None = None) -> pd.DataFrame:
    """IVF ANN: probe only the nprobe nearest centroid partitions per query.

    ``centroids``: pass precomputed centroids (e.g. from ``build_ivf_index``)
    to pin the assignment — ``random_sample``'s draw depends on the block
    layout, so two otherwise-identical calls can train different centroids."""
    import ray

    if centroids is not None:
        cents = centroids
    else:
        sample = emb_ds.random_sample(
            min(1.0, sample_size / max(1, emb_ds.count())),
            seed=42).to_pandas()
        cents = train_centroids(np.stack(sample[vec_col].to_numpy()),
                                n_centroids)
    assigned = assign_centroids(emb_ds, cents, id_col, vec_col)

    # float64 + stable sort, matching knn_ivf_index: probe choice and
    # neighbor ordering must be reproducible by the DuckDB oracle
    q = _unit(np.asarray(query_matrix, dtype=np.float64), dtype=np.float64)
    probe = np.argsort(-(q @ cents.astype(np.float64).T), axis=1,
                       kind="stable")[:, :nprobe]            # (Q, nprobe)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe)

    def partial(batch: pa.Table) -> pa.Table:
        qm, pr = ray.get(q_ref), ray.get(probe_ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        cent = np.asarray(batch.column("centroid").to_pylist())
        vecs = _unit(np.asarray(batch.column(vec_col).to_pylist(),
                                dtype=np.float64), dtype=np.float64)
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cent, pr[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ qm[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sims))
            sel = _det_topk(sims, sub_ids, kk)
            rows_q.extend([qi] * kk)
            rows_id.extend(sub_ids[sel].tolist())
            rows_s.extend(sims[sel].tolist())
        return pa.table({
            "query_idx": pa.array(rows_q, pa.int32()),
            "neighbor_id": pa.array(rows_id),
            "cosine": pa.array(rows_s, pa.float64()),
        })

    partials = assigned.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int32))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_idx", "neighbor_id", "cosine", "rank"])
    if query_ids is not None:
        res["query_id"] = np.asarray(query_ids)[res["query_idx"].astype(int)]
    else:
        res["query_id"] = res["query_idx"]
    return res[["query_id", "neighbor_id", "cosine", "rank"]]
