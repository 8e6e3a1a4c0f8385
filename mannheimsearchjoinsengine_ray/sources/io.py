"""Readers/sinks beyond the Parquet page corpus.

- ``read_query_table``   — the reference's query-table CSV reader
  (ConvertFileToTable.readTableForSearch, SJ/IO/ConvertFileToTable.java:415-615):
  driver-side read (query tables are small by definition), header cleanup,
  per-cell normalization, column type vote, key identification.
- ``read_csv_tables``    — corpus-of-CSV-tables source: each file becomes one
  processed table record (the SequenceFile-of-web-tables analog,
  SJ/hadoop/SequenceFileReader.java → Parquet/CSV fragments).
- ``write_ntriples``     — N-Triples text sink (Triplifier output format,
  SJ/IO/Triplifier.java:116-159) on top of the Parquet triple table.
- ``write_csv_export``   — debugging CSV export of any Dataset
  (Table.writeTableToFile analog).
"""

from __future__ import annotations

import csv
import gzip
import io
import os

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.extract import ProcessedTable, RawTable, process_table
from ..stages.triples import format_ntriple


def _open_text(path: str):
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8", newline="")
    return open(path, encoding="utf-8", newline="")


def read_query_table(path: str,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> ProcessedTable | None:
    """CSV (.csv/.csv.gz) → ProcessedTable with cleaning + type vote + key
    identification.  Driver-side: the query table is the small side of every
    search join."""
    with _open_text(path) as fh:
        rows = [row for row in csv.reader(fh)]
    if not rows:
        return None
    raw = RawTable(headers=rows[0], rows=rows[1:])
    return process_table(raw, cfg)


def read_csv_tables(paths: list[str] | str,
                    cfg: PipelineConfig = DEFAULT_CONFIG):
    """Corpus of CSV tables → Dataset of processed table records (same schema
    as stages.extract.TableExtractor output).  Files stream through
    ``read_binary_files`` so the stage scales with file count."""
    import ray.data as rd

    from ..stages.extract import _TABLE_RECORD_SCHEMA

    def parse(batch: dict) -> pa.Table:
        out = {n: [] for n in _TABLE_RECORD_SCHEMA.names}
        for path, data in zip(batch["path"], batch["bytes"]):
            text = bytes(data).decode("utf-8", "replace")
            rows = [row for row in csv.reader(io.StringIO(text))]
            if not rows:
                continue
            pt = process_table(RawTable(headers=rows[0], rows=rows[1:]), cfg)
            if pt is None:
                continue
            out["url"].append(os.path.basename(path))
            out["table_idx"].append(0)
            out["n_rows"].append(len(pt.rows))
            out["headers"].append(pt.headers)
            out["col_types"].append(pt.col_types)
            out["key_idx"].append(pt.key_idx)
            out["has_key"].append(pt.has_key)
            out["rows"].append(pt.rows)
            out["raw_keys"].append(pt.raw_keys)
        return pa.Table.from_pydict(out, schema=_TABLE_RECORD_SCHEMA)

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse, batch_format="numpy")


def write_ntriples(triples_ds, out_dir: str) -> int:
    """Triple Dataset → .nt text files (one per block, parallel writers; file
    names derived from content hashes so reruns are idempotent).  Returns the
    number of triples written."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def render_and_write(t: pa.Table) -> pa.Table:
        lines = [
            format_ntriple(s, p, o, ot)
            for s, p, o, ot in zip(
                t.column("subj").to_pylist(), t.column("pred").to_pylist(),
                t.column("obj").to_pylist(), t.column("obj_type").to_pylist())
        ]
        payload = "\n".join(lines) + ("\n" if lines else "")
        digest = hashlib.blake2b(payload.encode(), digest_size=10).hexdigest()
        tmp = os.path.join(out_dir, f".part-{digest}.nt.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(payload)
        os.replace(tmp, os.path.join(out_dir, f"part-{digest}.nt"))
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    counts = triples_ds.map_batches(render_and_write,
                                    batch_format="pyarrow").take_all()
    return int(sum(r["n"] for r in counts))


def write_csv_export(ds, path: str) -> None:
    """Small-result CSV export for debugging (key columns first not enforced —
    triple tables are already long-format)."""
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    df.to_csv(path, index=False)


def read_tar_tables(paths: list[str] | str,
                    cfg: PipelineConfig = DEFAULT_CONFIG):
    """Tar/tar.gz archives of CSV tables → Dataset of processed table
    records (ParallelIndexer.extractTarFile analog,
    SJ/index/ParallelIndexer.java:358-397 — the reference explodes archives
    to disk first; here members stream straight out of the archive bytes
    inside the task, no temp files).  One task per archive file, so read
    parallelism = archive count."""
    import tarfile

    import ray.data as rd

    from ..stages.extract import _TABLE_RECORD_SCHEMA

    def parse(batch: dict) -> pa.Table:
        out = {n: [] for n in _TABLE_RECORD_SCHEMA.names}
        for path, data in zip(batch["path"], batch["bytes"]):
            with tarfile.open(fileobj=io.BytesIO(bytes(data))) as tf:
                for member in tf.getmembers():
                    if not member.isfile():
                        continue
                    name = member.name
                    if not name.endswith((".csv", ".csv.gz")):
                        continue
                    raw_bytes = tf.extractfile(member).read()
                    if name.endswith(".gz"):
                        raw_bytes = gzip.decompress(raw_bytes)
                    text = raw_bytes.decode("utf-8", "replace")
                    rows = [row for row in csv.reader(io.StringIO(text))]
                    if not rows:
                        continue
                    pt = process_table(RawTable(headers=rows[0],
                                                rows=rows[1:]), cfg)
                    if pt is None:
                        continue
                    out["url"].append(f"{os.path.basename(path)}!{name}")
                    out["table_idx"].append(0)
                    out["n_rows"].append(len(pt.rows))
                    out["headers"].append(pt.headers)
                    out["col_types"].append(pt.col_types)
                    out["key_idx"].append(pt.key_idx)
                    out["has_key"].append(pt.has_key)
                    out["rows"].append(pt.rows)
                    out["raw_keys"].append(pt.raw_keys)
        return pa.Table.from_pydict(out, schema=_TABLE_RECORD_SCHEMA)

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse, batch_format="numpy")


def write_html_report(df, path: str, title: str = "Table report") -> None:
    """CSV→HTML report (CSV2HTMLconvertor.generateHTMLTables analog,
    SJ/IO/CSV2HTMLconvertor.java:44-129 at reduced breadth): one
    self-contained HTML file with human-readable headers
    (normalize.get_human_header) and a stats line (rows/cols), striped
    table styling inline instead of the reference's Bootstrap classes."""
    import html as _html

    from ..functions.normalize import (
        capitalize_words,
        clean_web_header,
        decamel,
        get_human_header,
    )

    if hasattr(df, "to_pandas"):
        df = df.to_pandas()
    heads = [capitalize_words(decamel(
        get_human_header(clean_web_header(str(c))))) or str(c)
        for c in df.columns]
    parts = [
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>",
        _html.escape(title), "</title><style>",
        "table{border-collapse:collapse;width:100%}",
        "th,td{border:1px solid #ccc;padding:4px 8px;text-align:left}",
        "tr:nth-child(even){background:#f6f6f6}",
        "</style></head><body>",
        f"<p>Rows: {len(df)} &middot; Cols: {len(df.columns)}</p>",
        "<table id=\"table1\"><thead><tr>",
    ]
    parts.extend(f"<th>{_html.escape(h)}</th>" for h in heads)
    parts.append("</tr></thead><tbody>")
    for _, row in df.iterrows():
        parts.append("<tr>")
        parts.extend(f"<td>{_html.escape(str(v))}</td>" for v in row)
        parts.append("</tr>")
    parts.append("</tbody></table></body></html>")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("".join(parts))
    os.replace(tmp, path)
