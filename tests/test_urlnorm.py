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


def test_canonicalization_idempotent():
    """canon(canon(u)) == canon(u) — required for recrawl keying."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    host = st.from_regex(r"[a-z][a-z0-9.-]{0,20}", fullmatch=True)
    path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}", fullmatch=True)
    query = st.from_regex(r"(\?([a-z]=[0-9]{0,3}&?){0,5})?",
                          fullmatch=True)
    frag = st.from_regex(r"(#[a-z0-9]{0,6})?", fullmatch=True)
    scheme = st.sampled_from(["http", "HTTPS", "https", "HtTp"])
    www = st.sampled_from(["", "www.", "WWW."])
    port = st.sampled_from(["", ":80", ":443", ":8080"])

    @settings(max_examples=200, deadline=None)
    @given(scheme, www, host, port, path, query, frag)
    def run(sc, w, h, po, pa_, q, f):
        url = f"{sc}://{w}{h}{po}{pa_}{q}{f}"
        t = pa.table({"url": pa.array([url], pa.string())})
        once = url_canonicalize(t).column("url_canon").to_pylist()[0]
        t2 = pa.table({"url": pa.array([once], pa.string())})
        twice = url_canonicalize(t2).column("url_canon").to_pylist()[0]
        assert twice == once, (url, once, twice)

    run()
