"""Graph materialize: sorted, hash-partitioned Parquet triple tables with
per-partition lineage manifests (the resume commit records).

Replaces the reference's N-Triples text sink (SJ/IO/Triplifier.java writeLines)
and file-granular resume flags (SearchJoin.java:76-128 .searchresults,
searchJoins.conf:103-109 misc.reuse*) with the north-rule design:

  * output partition = hash64(subj) % num_partitions — co-locates all triples
    of a subject, stable across runs and cluster sizes;
  * triples sorted by (subj, pred) within each partition;
  * each partition directory is written to a temp path and renamed, then a
    JSON manifest (row count, partition id, input fingerprint) is written —
    the MANIFEST, not the data file, is the commit record;
  * resume = list manifests, skip completed partitions.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa

from ..functions.hashing import hash64


def add_partition_column(batch: pa.Table, num_partitions: int,
                         key: str = "subj") -> pa.Table:
    part = hash64(batch.column(key).to_pylist()) % num_partitions
    return batch.append_column("part", pa.array(part.astype("int32")))


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"manifest_part{part:05d}.json")


def completed_partitions(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for f in os.listdir(out_dir):
        if f.startswith("manifest_part") and f.endswith(".json"):
            try:
                with open(os.path.join(out_dir, f)) as fh:
                    m = json.load(fh)
                done.add(int(m["partition"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return done


def commit_partition_dir(out_dir: str, part: int, rows: int,
                         distinct_subjects: int,
                         input_fingerprint: str = "",
                         files: int = 1) -> dict:
    """Atomic commit of an already-written ``part=P.tmp`` staging directory:
    rename to ``part=P``, then write the JSON manifest (the commit record).
    Shared by the single-task path (:func:`write_partition`) and the
    skew-split path where several sub-merge tasks each wrote one range file
    into the staging dir and the driver commits once all have reported."""
    part_dir = os.path.join(out_dir, f"part={part:05d}")
    tmp_dir = part_dir + ".tmp"
    if os.path.isdir(part_dir):
        shutil.rmtree(part_dir)
    os.replace(tmp_dir, part_dir)

    manifest = {
        "partition": part,
        "rows": rows,
        "distinct_subjects": distinct_subjects,
        "input_fingerprint": input_fingerprint,
        "files": files,
        "completed_at": time.time(),
    }
    mp = manifest_path(out_dir, part)
    tmp_mp = mp + ".tmp"
    with open(tmp_mp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp_mp, mp)
    return manifest


def write_partition(table: pa.Table, out_dir: str, part: int,
                    input_fingerprint: str = "") -> dict:
    """Atomically write one sorted partition + its manifest; returns metrics.

    Runs inside a Ray task (one per partition) — partition-parallel, no shared
    writer (vs the reference's synchronized single IndexWriter/SequenceFile
    writer, SJ/hadoop/SynchronizedSequenceFileWriter).
    """
    os.makedirs(out_dir, exist_ok=True)
    if "part" in table.column_names:
        table = table.drop_columns(["part"])
    table = table.sort_by([("subj", "ascending"), ("pred", "ascending")])

    part_dir = os.path.join(out_dir, f"part={part:05d}")
    tmp_dir = part_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    import pyarrow.parquet as pq
    pq.write_table(table, os.path.join(tmp_dir, "data.parquet"))

    import pyarrow.compute as pc

    distinct = (int(pc.count_distinct(table.column("subj")).as_py())
                if table.num_rows else 0)
    return commit_partition_dir(out_dir, part, table.num_rows, distinct,
                                input_fingerprint)


def read_materialized(out_dir: str):
    """Read back all completed partitions as one Dataset."""
    import ray.data as rd

    # expand to files: Ray treats list entries as files, not directories,
    # and a skew-split partition holds several range-sorted data-*.parquet
    paths = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("part=") and not d.endswith(".tmp"):
            part_dir = os.path.join(out_dir, d)
            paths.extend(os.path.join(part_dir, f)
                         for f in sorted(os.listdir(part_dir))
                         if f.endswith(".parquet"))
    return rd.read_parquet(paths)
