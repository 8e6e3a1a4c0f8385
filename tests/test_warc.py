"""WARC source round-trip: pages → WARC file → read_warc → same pipeline."""

from __future__ import annotations

import pandas as pd
import pytest

from mannheimsearchjoinsengine_ray.pipelines import kg
from mannheimsearchjoinsengine_ray.sources import pages as P
from mannheimsearchjoinsengine_ray.sources import warc as W


@pytest.fixture(scope="module")
def warc_file(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    specs = [P.make_page_spec(i) for i in range(25)]
    df = pd.DataFrame({
        "url": [s.url for s in specs],
        "warc_ts": pd.to_datetime([s.warc_ts for s in specs], unit="us"),
        "html": [P.render_html(s) for s in specs],
    })
    path = str(d / "segment-00000.warc")
    n = W.write_warc(df, path)
    assert n == 25
    gz = str(d / "segment-00001.warc.gz")
    W.write_warc(df.iloc[:5], gz, compress=True)
    return path, gz, specs


def test_read_warc_roundtrip(ray_session, warc_file):
    path, gz, specs = warc_file
    pages = W.read_warc([path]).to_pandas().sort_values("url").reset_index(drop=True)
    want = sorted((s.url, P.render_html(s)) for s in specs)
    assert len(pages) == 25
    assert list(pages["url"]) == [u for u, _ in want]
    assert all(bytes(h) == w for h, w in zip(pages["html"], (h for _, h in want)))
    # timestamps survive (second granularity in WARC-Date)
    assert pages["warc_ts"].notna().all()

    gz_pages = W.read_warc([gz]).to_pandas()
    assert len(gz_pages) == 5


def test_warc_feeds_pipeline(ray_session, warc_file):
    """WARC → extract → triples produces the same triples as the parquet path."""
    path, _, specs = warc_file
    pages = W.read_warc([path])
    tables = kg.extract_tables_ds(pages)
    triples = kg.triples_ds(tables)
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples.take_all()}
    gold = set()
    for s in specs:
        for su, p, o, t, u in P.golden_triples_for_page(s):
            gold.add((su, p, o))
    assert got == gold


def test_run_full_over_warc_segments(ray_session, tmp_path):
    """The resumable pipeline consumes .warc.gz segments directly."""
    import os
    import shutil

    wd = str(tmp_path / "segments")
    os.makedirs(wd)
    specs = [P.make_page_spec(i) for i in range(30)]
    for chunk in range(2):
        sub = specs[chunk * 15:(chunk + 1) * 15]
        df = pd.DataFrame({
            "url": [s.url for s in sub],
            "warc_ts": pd.to_datetime([s.warc_ts for s in sub], unit="us"),
            "html": [P.render_html(s) for s in sub],
        })
        W.write_warc(df, f"{wd}/seg-{chunk:02d}.warc.gz", compress=True)
    out = str(tmp_path / "out")
    m = kg.run_full(wd, out, num_shards=2, partitions_per_shard=2)
    gold = set()
    for s in specs:
        for su, p, o, ty, u in P.golden_triples_for_page(s):
            gold.add((su, p, o))
    got = {(r["subj"], r["pred"], r["obj"])
           for r in kg.read_output(out).take_all()}
    assert got == gold
    assert m["final_rows"] > 0


def test_warc_http_headers_stripped(ray_session, tmp_path):
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.com/a\r\n"
        b"WARC-Date: 2020-01-02T03:04:05Z\r\n"
        b"Content-Length: 79\r\n"
        b"\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><p>hi</p></body></html>"
        b"\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Target-URI: http://x.com/a\r\n"
        b"Content-Length: 2\r\n"
        b"\r\n"
        b"GE"
        b"\r\n\r\n"
    )
    recs = W._parse_warc_bytes(raw)
    assert len(recs) == 1  # request record skipped
    url, ts, payload = recs[0]
    assert url == "http://x.com/a"
    assert payload == b"<html><body><p>hi</p></body></html>"
    assert ts.year == 2020 and ts.hour == 3


def test_read_wet(ray_session, tmp_path):
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://x.com/a\r\n"
        b"WARC-Date: 2021-06-01T00:00:00Z\r\n"
        b"Content-Length: 17\r\n"
        b"\r\n"
        b"plain text body\r\n"
        b"\r\n\r\n"
    )
    p = str(tmp_path / "f.warc")
    open(p, "wb").write(raw)
    df = W.read_wet([p]).to_pandas()
    assert len(df) == 1
    assert df.iloc[0]["text"].startswith("plain text body")
    assert bytes(df.iloc[0]["html"]) == b""
    # response reader skips conversion records
    assert len(W.read_warc([p]).to_pandas()) == 0
