"""URL canonicalization (stages/urlnorm.py) — rule coverage plus the
DuckDB twin differential."""

import duckdb
import pyarrow as pa
import pytest

from nxsearch_ray.stages.urlnorm import (
    url_canonicalize,
    url_canonicalize_sql,
)

CASES = [
    ("HTTPS://WWW.Example.ORG:443/Path/Sub?b=2&a=1&#frag",
     "https://example.org/Path/Sub?a=1&b=2"),
    ("http://site.io:80/p?z=9", "http://site.io/p?z=9"),
    ("https://www.x.y/", "https://x.y/"),
    ("https://plain.org/a/b", "https://plain.org/a/b"),
    ("http://host.com/path?", "http://host.com/path"),
    ("ftp://Files.example.net:21/x",
     "ftp://files.example.net:21/x"),       # non-default port kept
    ("https://h.org/p?b=1&b=0&a=2", "https://h.org/p?a=2&b=0&b=1"),
    ("https://h.org/CaseSensitive/PATH",    # path case preserved
     "https://h.org/CaseSensitive/PATH"),
    ("https://h.org:8443/x?y=1#a#b", "https://h.org:8443/x?y=1"),
]


@pytest.mark.parametrize("url,want", CASES)
def test_rules(url, want):
    t = pa.table({"url": pa.array([url], pa.string())})
    assert url_canonicalize(t).column("url_canon").to_pylist() == [want]


def test_matches_duckdb_twin():
    t = pa.table({"url": pa.array([u for u, _ in CASES], pa.string())})
    got = url_canonicalize(t).column("url_canon").to_pylist()
    con = duckdb.connect()
    con.register("t", t)
    want = [r[0] for r in con.execute(
        f"SELECT {url_canonicalize_sql()} FROM t").fetchall()]
    assert got == want


def test_batch_shapes():
    # empty batch and chunked input
    empty = pa.table({"url": pa.array([], pa.string())})
    assert url_canonicalize(empty).num_rows == 0
    chunked = pa.Table.from_batches([
        pa.record_batch({"url": pa.array(["https://WWW.a.b/x"])}),
        pa.record_batch({"url": pa.array(["https://c.d/?b=2&a=1"])}),
    ])
    out = url_canonicalize(chunked).column("url_canon").to_pylist()
    assert out == ["https://a.b/x", "https://c.d/?a=1&b=2"]
