"""CLI entry point (SearchJoinMain analog, SJ/main/SearchJoinMain.java:27-104).

Functions: index | kg | text | searchjoin | stats | infogather — each a thin
wrapper over
the pipeline modules, owning its own Ray session (the only place outside
bench.py/tests allowed to call ray.init).

    python -m mannheimsearchjoinsengine_ray.cli kg --pages DIR --out DIR
    python -m mannheimsearchjoinsengine_ray.cli index --entities N --out DIR
    python -m mannheimsearchjoinsengine_ray.cli text --pages DIR --out DIR
    python -m mannheimsearchjoinsengine_ray.cli searchjoin --query q.csv \
        --pages DIR --index DIR --out DIR
    python -m mannheimsearchjoinsengine_ray.cli stats --pages DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> bool:
    """→ True when this call created the session (and so owns shutdown);
    False when Ray was already initialized by an embedding caller."""
    import ray

    created = False
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        created = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return created


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mannheimsearchjoinsengine_ray")
    ap.add_argument("function",
                    choices=["index", "kg", "text", "searchjoin", "stats",
                             "infogather"])
    ap.add_argument("--pages", help="pages parquet dir/file")
    ap.add_argument("--out", help="output directory")
    ap.add_argument("--query", help="query CSV for searchjoin/infogather")
    ap.add_argument("--index", help="label index dir")
    ap.add_argument("--attribute", help="attribute name for infogather")
    ap.add_argument("--entities", type=int, default=500)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--shards", type=int, default=None)
    args = ap.parse_args(argv)

    owns_session = _init_ray(args.num_cpus)
    import ray

    try:
        if args.function == "kg":
            from .pipelines.kg import run_full

            m = run_full(args.pages, args.out, num_shards=args.shards,
                         num_entities=args.entities)
            print(json.dumps(m))
        elif args.function == "index":
            import pyarrow as pa
            import ray.data as rd

            from .sources.pages import make_gazetteer
            from .state.index import build_index

            gaz = rd.from_arrow(pa.table(make_gazetteer(args.entities)))
            n = build_index(gaz, args.out, num_shards=8)
            print(json.dumps({"postings": n, "index_dir": args.out}))
        elif args.function == "text":
            from .pipelines.kg import extract_text_ds

            extract_text_ds(args.pages).write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        elif args.function == "searchjoin":
            from .pipelines.kg import extract_tables_ds, read_pages, triples_ds
            from .sources.io import read_query_table, write_csv_export
            from .stages.fusion import fuse_edges_with_triples, pivot_fused
            from .stages.link import LinkerActor

            qt = read_query_table(args.query)
            if qt is None or not qt.has_key:
                print("query table has no identifiable key", file=sys.stderr)
                return 2
            # link the query keys, fuse against corpus triples
            linker = LinkerActor(args.index, top_k=1)
            import pyarrow as pa

            mentions = pa.table({
                "url": ["query"] * len(qt.raw_keys),
                "table_idx": pa.array([0] * len(qt.raw_keys), pa.int32()),
                "row_idx": pa.array(range(len(qt.raw_keys)), pa.int32()),
                "mention": qt.raw_keys,
            })
            edges = linker(mentions).to_pandas()
            pages = read_pages(args.pages, columns=["url", "html"])
            tr = triples_ds(extract_tables_ds(pages))
            long = fuse_edges_with_triples(edges, tr).to_pandas()
            os.makedirs(args.out, exist_ok=True)
            write_csv_export(long, os.path.join(args.out, "FusedLong.csv"))
            write_csv_export(pivot_fused(long),
                             os.path.join(args.out, "AugmentedTable.csv"))
            print(json.dumps({"rows": len(long), "out": args.out}))
        elif args.function == "infogather":
            from .pipelines.kg import extract_tables_ds, read_pages
            from .sources.io import read_query_table, write_csv_export
            from .stages.infogather import augment_by_attribute

            qt = read_query_table(args.query)
            if qt is None or not qt.has_key:
                print("query table has no identifiable key", file=sys.stderr)
                return 2
            pages = read_pages(args.pages, columns=["url", "html"])
            tables = extract_tables_ds(pages)
            out = augment_by_attribute(tables, qt.raw_keys, args.attribute)
            os.makedirs(args.out, exist_ok=True)
            write_csv_export(out, os.path.join(args.out, "InfoGatherAugmented.csv"))
            print(json.dumps({"rows": len(out), "out": args.out}))
        elif args.function == "stats":
            from .pipelines.kg import extract_tables_ds, read_pages
            from .stages.stats import header_frequencies

            pages = read_pages(args.pages, columns=["url", "html"])
            hf = header_frequencies(extract_tables_ds(pages)).to_pandas()
            print(hf.sort_values("frequency", ascending=False)
                  .head(20).to_string(index=False))
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
