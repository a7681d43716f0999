"""Deterministic stratified sampling (stages/sampling.py)."""

import duckdb
import pyarrow as pa

from nxsearch_ray.stages.sampling import (
    stratified_sample,
    stratified_sample_sql,
)


def test_sample_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    got = stratified_sample(ds, group_col="lang", id_col="doc_id",
                            k=7, seed=42).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(stratified_sample_sql(
        "documents", group_col="lang", id_col="doc_id",
        columns="doc_id, lang", k=7, seed=42) +
        " ORDER BY doc_id").fetchdf()
    assert got.shape == want.shape
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["lang"].values == want["lang"].values).all()


def test_sample_sizes_and_determinism(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    a = stratified_sample(ds, group_col="lang", id_col="doc_id",
                          k=5, seed=1).to_pandas()
    # exactly 5 per group (every lang has >5 docs at sf0.001)
    assert (a.groupby("lang").size() == 5).all()
    b = stratified_sample(ds.repartition(9), group_col="lang",
                          id_col="doc_id", k=5, seed=1).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])   # partition-proof
    c = stratified_sample(ds, group_col="lang", id_col="doc_id",
                          k=5, seed=2).to_pandas()
    assert sorted(a["doc_id"]) != sorted(c["doc_id"])   # seed changes it


def test_fnv_scale_path(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "lang": pa.array(["en", "de"] * 50, pa.string())})
    a = stratified_sample(rd.from_arrow(t), group_col="lang",
                          id_col="doc_id", k=10, seed=3,
                          method="fnv").to_pandas()
    assert (a.groupby("lang").size() == 10).all()
    b = stratified_sample(rd.from_arrow(t).repartition(7),
                          group_col="lang", id_col="doc_id", k=10,
                          seed=3, method="fnv").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
