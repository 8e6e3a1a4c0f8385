"""WARC source: Common Crawl's native archive format → pages Dataset.

A WARC file is a sequence of records:

    WARC/1.0\r\n
    <headers: WARC-Type, WARC-Target-URI, WARC-Date, Content-Length, ...>\r\n
    \r\n
    <Content-Length bytes of payload>\r\n\r\n

``read_warc`` streams .warc / .warc.gz files through ``read_binary_files``
(one task per file — the natural Common-Crawl parallelism: thousands of ~1GB
segment files) and parses ``response`` records into the engine's page schema
(url, warc_ts, html, text='', lang='').  HTTP response headers inside the
payload are stripped to the body.

``write_warc`` renders a pages Dataset back to WARC for fixtures/round-trips.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _parse_warc_bytes(data: bytes) -> list[tuple[str, datetime, bytes]]:
    """→ [(url, ts, html_payload)] for every response record."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out: list[tuple[str, datetime, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        header_end = data.find(b"\r\n\r\n", pos)
        if header_end < 0:
            break
        header_block = data[pos:header_end].decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            pos = header_end + 4
            continue
        headers = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = data[header_end + 4:header_end + 4 + length]
        pos = header_end + 4 + length
        # records are separated by two CRLFs
        while data[pos:pos + 2] == b"\r\n":
            pos += 2

        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "1970-01-01T00:00:00Z")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")) \
                .astimezone(timezone.utc).replace(tzinfo=None)
        except ValueError:
            ts = datetime(1970, 1, 1)
        # strip HTTP response headers when present
        if payload[:5] in (b"HTTP/",):
            body_start = payload.find(b"\r\n\r\n")
            if body_start >= 0:
                payload = payload[body_start + 4:]
        out.append((url, ts, payload))
    return out


def read_warc(paths: list[str] | str):
    """.warc/.warc.gz files → pages Dataset (url, warc_ts, html, text, lang)."""
    import numpy as np
    import ray.data as rd

    def parse(batch: dict) -> pa.Table:
        urls, tss, htmls = [], [], []
        for data in batch["bytes"]:
            for url, ts, payload in _parse_warc_bytes(bytes(data)):
                urls.append(url)
                tss.append(ts)
                htmls.append(payload)
        return pa.Table.from_pydict({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.array(tss, dtype="datetime64[us]")
                                if tss else [], pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array([""] * len(urls), pa.string()),
        }, schema=PAGES_SCHEMA)

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse, batch_format="numpy")


def write_warc(pages_df, path: str, compress: bool = False) -> int:
    """pages rows (pandas) → one WARC file; returns records written."""
    buf = io.BytesIO()
    n = 0
    for _, row in pages_df.iterrows():
        payload = bytes(row["html"])
        ts = row["warc_ts"]
        ts_str = (ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts) \
            .strftime("%Y-%m-%dT%H:%M:%SZ")
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {row['url']}\r\n"
            f"WARC-Date: {ts_str}\r\n"
            f"Content-Length: {len(payload)}\r\n"
        ).encode()
        buf.write(header + b"\r\n" + payload + b"\r\n\r\n")
        n += 1
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as fh:
        fh.write(data)
    return n
