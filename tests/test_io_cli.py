"""CSV sources, N-Triples sink, and CLI plumbing tests."""

from __future__ import annotations

import glob
import os

import pytest

from mannheimsearchjoinsengine_ray.sources import io as sio


@pytest.fixture()
def query_csv(tmp_path):
    p = tmp_path / "q.csv"
    lines = ["name,population,founded"]
    for i in range(8):
        lines.append(f"entity name {i},{1000 + i}.5,19{50 + i}-01-0{i % 9 + 1}")
    p.write_text("\n".join(lines))
    return str(p)


def test_read_query_table(query_csv):
    qt = sio.read_query_table(query_csv)
    assert qt is not None and qt.has_key
    assert qt.key_idx == 0
    assert qt.col_types == ["string", "numeric", "date"]
    assert len(qt.rows) == 8


def test_read_query_table_gz(query_csv, tmp_path):
    import gzip
    import shutil

    gz = str(tmp_path / "q.csv.gz")
    with open(query_csv, "rb") as f_in, gzip.open(gz, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    qt = sio.read_query_table(gz)
    assert qt is not None and len(qt.rows) == 8


def test_read_csv_tables(ray_session, tmp_path):
    for i in range(3):
        rows = ["name,score,founded"] + [
            f"entity {i} row {j},{100 + j}.5,19{60 + j}-02-02" for j in range(6)]
        (tmp_path / f"t{i}.csv").write_text("\n".join(rows))
    ds = sio.read_csv_tables(str(tmp_path))
    df = ds.to_pandas()
    assert len(df) == 3
    assert df["has_key"].all()


def test_write_ntriples(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    tr = rd.from_pandas(pd.DataFrame([
        {"subj": "http://x/S", "pred": "http://x/p", "obj": "Val, with comma",
         "obj_type": "string", "source_url": "u"},
        {"subj": "http://x/S", "pred": "http://x/q", "obj": "12.5",
         "obj_type": "float", "source_url": "u"},
    ]))
    out = str(tmp_path / "nt")
    n = sio.write_ntriples(tr, out)
    assert n == 2
    content = "".join(open(f).read() for f in glob.glob(out + "/*.nt"))
    assert '<http://x/S> <http://x/p> "Val, with comma"@en .' in content
    assert '"12.5"^^<http://www.w3.org/2001/XMLSchema#float>' in content


def test_cli_help_and_badquery(tmp_path, query_csv):
    from mannheimsearchjoinsengine_ray import cli

    with pytest.raises(SystemExit):
        cli.main(["bogus"])


def test_read_tar_tables(ray_session, tmp_path):
    """Tar archives of CSVs stream into table records without temp files."""
    import gzip
    import io as _io
    import tarfile

    from mannheimsearchjoinsengine_ray.sources.io import read_tar_tables

    csv_text = "name,population,founded\n" + "\n".join(
        f"city {i},{1000 + i},19{50 + i}" for i in range(6))
    tar_path = str(tmp_path / "tables.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tf:
        for n, payload in [("a.csv", csv_text.encode()),
                           ("b.csv.gz", gzip.compress(csv_text.encode())),
                           ("skip.txt", b"not a table")]:
            ti = tarfile.TarInfo(n)
            ti.size = len(payload)
            tf.addfile(ti, _io.BytesIO(payload))
    recs = read_tar_tables([tar_path]).to_pandas()
    assert len(recs) == 2  # a.csv + b.csv.gz, txt skipped
    assert all(u.startswith("tables.tar.gz!") for u in recs["url"])
    assert (recs["has_key"]).all()
    assert recs["n_rows"].tolist() == [6, 6]


def test_write_html_report(tmp_path):
    import pandas as pd

    from mannheimsearchjoinsengine_ray.sources.io import write_html_report

    df = pd.DataFrame({"cityName": ["a<b", "x"], "totalArea": [1, 2]})
    out = str(tmp_path / "report.html")
    write_html_report(df, out)
    html = open(out, encoding="utf-8").read()
    assert "<table id=\"table1\">" in html
    assert "a&lt;b" in html            # escaping
    assert "City Name" in html         # human header (decamel + capitalize)
    assert "Rows: 2" in html
