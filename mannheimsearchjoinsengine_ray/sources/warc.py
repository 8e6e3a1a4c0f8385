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


def _parse_warc_bytes(data: bytes, record_type: str = "response"
                      ) -> list[tuple[str, datetime, bytes]]:
    """→ [(url, ts, payload)] for every record of ``record_type``."""
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

        if headers.get("warc-type") != record_type:
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


def read_warc(paths: list[str] | str, record_type: str = "response"):
    """.warc/.warc.gz files → pages Dataset (url, warc_ts, html, text, lang).

    ``record_type='response'`` reads raw-HTML records (WARC);
    ``record_type='conversion'`` reads WET text records — the payload lands in
    the ``text`` column (html empty), matching Common Crawl's WET layout."""
    import numpy as np
    import ray.data as rd

    as_text = record_type == "conversion"

    def parse(batch: dict) -> pa.Table:
        urls, tss, payloads = [], [], []
        for data in batch["bytes"]:
            for url, ts, payload in _parse_warc_bytes(bytes(data),
                                                      record_type=record_type):
                urls.append(url)
                tss.append(ts)
                payloads.append(payload)
        n = len(urls)
        return pa.Table.from_pydict({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.array(tss, dtype="datetime64[us]")
                                if tss else [], pa.timestamp("us")),
            "html": pa.array([b""] * n if as_text else payloads, pa.binary()),
            "text": pa.array([p.decode("utf-8", "replace") for p in payloads]
                             if as_text else [""] * n, pa.string()),
            "lang": pa.array([""] * n, pa.string()),
        }, schema=PAGES_SCHEMA)

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse, batch_format="numpy")


def read_wet(paths: list[str] | str):
    """Common Crawl WET files → pages Dataset with pre-extracted ``text``."""
    return read_warc(paths, record_type="conversion")


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
