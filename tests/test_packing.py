"""Sequence packing + exact quantiles (stages/packing.py) — the
distributed prefix-scan operators, with DuckDB differentials."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from nxsearch_ray.stages.packing import (
    count_tokens,
    exact_quantiles,
    exact_quantiles_sql,
    pack_sequences,
    pack_sequences_sql,
)


def test_count_tokens():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["a b c", "", "one"]})
    out = count_tokens(t)
    assert out.column("n_tokens").to_pylist() == [3, 0, 1]


def test_pack_boundaries(ray_session):
    """Documents fall into packs by their starting token offset."""
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": ["w " * 60, "w " * 60, "w " * 60, "w"]})
    out = {r["doc_id"]: r for r in
           pack_sequences(rd.from_arrow(t), budget=100).take_all()}
    assert out[1]["pack_id"] == 0 and out[1]["pack_offset"] == 0
    assert out[2]["pack_id"] == 0 and out[2]["pack_offset"] == 60
    assert out[3]["pack_id"] == 1 and out[3]["pack_offset"] == 20
    assert out[4]["pack_id"] == 1 and out[4]["pack_offset"] == 80


def test_pack_block_count_invariance(ray_session):
    """The scan must not depend on how blocks split the sorted order."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": ["w " * int(n)
                           for n in rng.integers(1, 80, size=200)]})
    a = pack_sequences(rd.from_arrow(t), budget=256).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(rd.from_arrow(t).repartition(13),
                       budget=256).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (a.values == b.values).all()


def test_pack_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    got = pack_sequences(ds, budget=512).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(pack_sequences_sql(budget=512) +
                       " ORDER BY doc_id").fetchdf()
    assert got.shape == want.shape and (got.values == want.values).all()


def test_quantiles_match_duckdb(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]) \
        .map_batches(count_tokens, batch_format="pyarrow")
    got = exact_quantiles(ds, "n_tokens")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(exact_quantiles_sql(
        "documents", r"len(regexp_extract_all(text, '\S+'))")).fetchdf()
    assert (got.to_pandas().values == want.values).all()


def test_quantile_disc_semantics(ray_session):
    """ceil(q*n)-th smallest — pinned against tiny known cases."""
    import ray.data as rd

    t = pa.table({"v": pa.array([10, 20], pa.int64())})
    out = exact_quantiles(rd.from_arrow(t), "v",
                          qs=(0.5, 0.6, 0.75))
    assert out.column("value").to_pylist() == [10, 20, 20]
    t = pa.table({"v": pa.array(range(1, 11), pa.int64())})
    out = exact_quantiles(rd.from_arrow(t), "v", qs=(0.5, 0.9))
    assert out.column("value").to_pylist() == [5, 9]


def test_quantiles_sorted_float_matches_duckdb(ray_session, sf_dir):
    """Sorted-rank plan on an all-distinct float column."""
    import ray.data as rd

    from nxsearch_ray.stages.packing import exact_quantiles_sorted

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    got = exact_quantiles_sorted(ds, "value")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(exact_quantiles_sql("events", "value")).fetchdf()
    assert (got.to_pandas().values == want.values).all()


def test_quantiles_sorted_matches_census_plan(ray_session):
    """Both quantile plans agree on the same integer data."""
    import ray.data as rd

    from nxsearch_ray.stages.packing import exact_quantiles_sorted

    rng = np.random.default_rng(11)
    t = pa.table({"v": pa.array(rng.integers(0, 50, size=500),
                                pa.int64())})
    a = exact_quantiles(rd.from_arrow(t), "v")
    b = exact_quantiles_sorted(rd.from_arrow(t), "v")
    assert a.column("value").to_pylist() == b.column("value").to_pylist()


def test_chunk_documents_windows():
    from nxsearch_ray.stages.packing import chunk_documents

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": [" ".join(str(i) for i in range(10))]})
    out = chunk_documents(t, chunk_tokens=4, overlap=1).to_pylist()
    # stride 3: starts 0,3,6 cover through word 9 (last covers 6..9)
    assert [r["chunk_no"] for r in out] == [0, 1, 2]
    assert out[0]["chunk_text"] == "0 1 2 3"
    assert out[1]["chunk_text"] == "3 4 5 6"
    assert out[2]["chunk_text"] == "6 7 8 9"
    # exact-fit doc: one chunk, no degenerate tail
    t2 = pa.table({"doc_id": pa.array([2], pa.int64()),
                   "text": ["a b c d"]})
    out2 = chunk_documents(t2, chunk_tokens=4, overlap=1).to_pylist()
    assert len(out2) == 1 and out2[0]["n_chunk_tokens"] == 4


def test_chunk_documents_matches_duckdb(sf_dir):
    import pyarrow.parquet as pq

    from nxsearch_ray.stages.packing import (
        chunk_documents,
        chunk_documents_sql,
    )

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    got = chunk_documents(docs, chunk_tokens=64, overlap=16) \
        .to_pandas().sort_values(["doc_id", "chunk_no"]) \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(chunk_documents_sql(chunk_tokens=64, overlap=16)
                       + " ORDER BY doc_id, chunk_no").fetchdf()
    assert got.shape == want.shape and (got.values == want.values).all()
