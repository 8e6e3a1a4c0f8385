"""The knowledge-graph construction pipeline (north-star flow, SURVEY §3.2):

    pages.parquet ──read_parquet (column-pruned)
      └─ extract tables    map_batches   [stateless, Arrow in/out]
      └─ triplify          map_batches   [stateless]
      └─ (optional) entity linking       [actor pool — stages/link.py]
      └─ (optional) canonicalization     [LSH + connected components]
      └─ materialize: hash(subj) partitions, sorted, manifests

Resume model (north rule): the INPUT is split into shards (groups of parquet
fragments / page-id ranges); each shard runs the full flow and commits its
output under ``out/shard=S/part=P`` plus a shard manifest written atomically
after the data.  A killed run resumes by listing shard manifests and skipping
completed shards — no re-extraction, no re-write.  Within a shard, triples are
hash-partitioned by subject and sorted by (subj, pred).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages import materialize as mat
from ..stages.extract import TableExtractor, extract_text_batch
from ..stages.triples import triples_from_tables_batch


def read_pages(path: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)


def extract_tables_ds(pages, cfg: PipelineConfig = DEFAULT_CONFIG):
    ex = TableExtractor(cfg)
    return pages.map_batches(ex, batch_format="pyarrow", batch_size=cfg.batch_size)


def triples_ds(tables, cfg: PipelineConfig = DEFAULT_CONFIG):
    return tables.map_batches(triples_from_tables_batch, batch_format="pyarrow",
                              batch_size=cfg.batch_size)


def pages_to_triples(pages_path: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """pages parquet → streaming triples Dataset (no materialization)."""
    pages = read_pages(pages_path, columns=["url", "html"])
    return triples_ds(extract_tables_ds(pages, cfg), cfg)


def extract_text_ds(pages_path: str):
    """pages parquet → (url, text) Dataset — the byte-identical invariant stage."""
    pages = read_pages(pages_path, columns=["url", "html"])
    return pages.map_batches(extract_text_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# materialize one Dataset of triples into partitioned + sorted output
# ---------------------------------------------------------------------------

def materialize_triples(triples, out_dir: str,
                        num_partitions: int = 16,
                        fingerprint: str = "") -> list[dict]:
    """Shuffle triples into hash(subj) partitions, sort each, write atomically
    with manifests.  Returns the manifest dicts."""
    part_fn = partial(mat.add_partition_column, num_partitions=num_partitions)
    with_part = triples.map_batches(part_fn, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        manifest = mat.write_partition(group, out_dir, part, fingerprint)
        return pa.table({"partition": [manifest["partition"]],
                         "rows": [manifest["rows"]]})

    result = with_part.groupby("part").map_groups(write_group, batch_format="pyarrow")
    stats = result.take_all()
    return stats


# ---------------------------------------------------------------------------
# resumable sharded run
# ---------------------------------------------------------------------------

def _shard_manifest_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard_manifest_{shard:05d}.json")


def completed_shards(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for f in os.listdir(out_dir):
        if f.startswith("shard_manifest_") and f.endswith(".json"):
            try:
                with open(os.path.join(out_dir, f)) as fh:
                    done.add(int(json.load(fh)["shard"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return done


def list_page_fragments(pages_path: str) -> list[str]:
    if os.path.isfile(pages_path):
        return [pages_path]
    return sorted(
        os.path.join(pages_path, f) for f in os.listdir(pages_path)
        if f.endswith(".parquet")
    )


def run_resumable(pages_path: str, out_dir: str,
                  cfg: PipelineConfig = DEFAULT_CONFIG,
                  num_shards: int | None = None,
                  partitions_per_shard: int = 4,
                  fail_after_shards: int | None = None) -> dict:
    """Sharded, resumable end-to-end run.  ``fail_after_shards`` injects a
    crash for the resume test (FIXTURES F8)."""
    os.makedirs(out_dir, exist_ok=True)
    frags = list_page_fragments(pages_path)
    if num_shards is None:
        num_shards = len(frags)
    # round-robin fragments into shards
    shards: list[list[str]] = [[] for _ in range(num_shards)]
    for i, f in enumerate(frags):
        shards[i % num_shards].append(f)

    done = completed_shards(out_dir)
    metrics = {"shards_total": num_shards, "shards_skipped": len(done),
               "shards_run": 0, "rows_written": 0}
    t0 = time.time()
    ran = 0
    for si, frag_group in enumerate(shards):
        if si in done or not frag_group:
            continue
        shard_dir = os.path.join(out_dir, f"shard={si:05d}")
        triples = pages_to_triples(frag_group, cfg)
        part_stats = materialize_triples(
            triples, shard_dir, num_partitions=partitions_per_shard,
            fingerprint=";".join(os.path.basename(f) for f in frag_group),
        )
        rows = sum(m["rows"] for m in part_stats)
        manifest = {
            "shard": si,
            "fragments": [os.path.basename(f) for f in frag_group],
            "partitions": len(part_stats),
            "rows": rows,
            "completed_at": time.time(),
        }
        mp = _shard_manifest_path(out_dir, si)
        with open(mp + ".tmp", "w") as fh:
            json.dump(manifest, fh)
        os.replace(mp + ".tmp", mp)
        metrics["shards_run"] += 1
        metrics["rows_written"] += rows
        ran += 1
        if fail_after_shards is not None and ran >= fail_after_shards:
            raise RuntimeError(f"injected failure after {ran} shards")
    metrics["wall_sec"] = time.time() - t0
    return metrics


def read_output(out_dir: str):
    """All committed triples (only shards with manifests)."""
    import ray.data as rd

    done = completed_shards(out_dir)
    paths = []
    for si in sorted(done):
        shard_dir = os.path.join(out_dir, f"shard={si:05d}")
        for d in sorted(os.listdir(shard_dir)):
            if d.startswith("part=") and not d.endswith(".tmp"):
                part_dir = os.path.join(shard_dir, d)
                paths.extend(
                    os.path.join(part_dir, f) for f in sorted(os.listdir(part_dir))
                    if f.endswith(".parquet")
                )
    if not paths:
        raise FileNotFoundError(f"no completed shards under {out_dir}")
    return rd.read_parquet(paths)
