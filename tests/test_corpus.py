"""End-to-end corpus pipeline (pipelines/corpus.py): clean -> near-dup
-> semantic tiers composed as one resumable dataflow, plus the
`--pipeline corpus` CLI route (VERDICT r04 next #8)."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nxsearch_ray.sources.synth import synth_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _embeddings_for(pages: pa.Table, *, dim: int = 32, seed: int = 7,
                    n_sem_dups: int = 6) -> pa.Table:
    """(vec_id, embedding) keyed by page_id; the LAST ``n_sem_dups``
    non-duplicated ORIGINAL pages get byte-identical embeddings to the
    FIRST ones (cross-base semantic dups the near-dup tier can't see)."""
    ids = np.asarray(pages.column("page_id").to_pylist(), dtype=np.int64)
    clusters = np.asarray(pages.column("truth_cluster").to_pylist())
    variants = np.asarray(pages.column("variant").to_pylist())
    rng = np.random.default_rng(seed)
    anchors = rng.normal(size=(16, dim))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    mat = anchors[np.arange(len(ids)) % 16] * 12.0 \
        + rng.normal(size=(len(ids), dim))
    # semantic dups between singleton originals (truth_cluster == -1)
    singles = np.nonzero((clusters == -1) & (variants == "orig"))[0]
    pairs = []
    for k in range(min(n_sem_dups, len(singles) // 2)):
        a, b = singles[k], singles[-(k + 1)]
        mat[b] = mat[a]
        lo, hi = sorted((int(ids[a]), int(ids[b])))
        pairs.append((lo, hi))
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(mat.astype(np.float32)),
                              type=pa.list_(pa.float32()))}), pairs


@pytest.fixture(scope="module")
def corpus_tables():
    pages = synth_pages(150, seed=11)
    emb, sem_pairs = _embeddings_for(pages)
    return pages, emb, sem_pairs


def test_run_corpus_streaming(ray_session, corpus_tables):
    import ray.data as rd

    from nxsearch_ray.pipelines.corpus import (decisions_as_table,
                                               run_corpus)

    pages, emb, sem_pairs = corpus_tables
    res = run_corpus(rd.from_arrow(pages),
                     embeddings_ds=rd.from_arrow(emb),
                     semdedup_nlist=4, min_words=10,
                     min_required_stopwords=0)
    dec = decisions_as_table(res)
    assert dec.schema.names == ["page_id", "drop_tier", "dup_of"]
    assert dec.num_rows == res.stats["n_clean_pages"]
    tiers = dec.column("drop_tier").to_numpy()
    ids = dec.column("page_id").to_numpy()
    dup = dec.column("dup_of").to_numpy()
    # tier-2: near-dup members drop onto their component minimum
    assert (tiers == 2).sum() > 0
    assert (dup[tiers == 2] < ids[tiers == 2]).all()
    # kept rows owe nothing
    assert (dup[tiers == 0] == -1).all()
    # tier-3: the planted cross-base semantic dups are found (higher
    # id drops onto lower), and never double-dropped by tier 2
    by_id = dict(zip(ids.tolist(), zip(tiers.tolist(), dup.tolist())))
    found = 0
    for lo, hi in sem_pairs:
        t, d = by_id[hi]
        if t == 3 and d == lo:
            found += 1
    assert found == len(sem_pairs), (found, sem_pairs)
    assert (dup[tiers == 3] < ids[tiers == 3]).all()


def test_run_corpus_quality_gate(ray_session, corpus_tables):
    """Short pages are removed by the Gopher gate before any dedup."""
    import ray.data as rd

    from nxsearch_ray.pipelines.corpus import run_corpus

    pages, _, _ = corpus_tables
    short = pa.table({
        "page_id": pa.array([10_000_001, 10_000_002], type=pa.int64()),
        "url": pa.array(["https://x.org/a", "https://x.org/b"]),
        "text": pa.array(["too short", "tiny page"])})
    both = pa.concat_tables([
        pages.select(["page_id", "url", "text"]), short])
    res = run_corpus(rd.from_arrow(both), min_words=10,
                     min_required_stopwords=0)
    assert res.stats["n_clean_pages"] == pages.num_rows  # shorts gone


def test_run_corpus_resume(ray_session, corpus_tables, tmp_path):
    import ray.data as rd

    from nxsearch_ray.pipelines.corpus import (decisions_as_table,
                                               run_corpus)

    pages, emb, _ = corpus_tables
    out = str(tmp_path / "run")
    kw = dict(embeddings_ds=rd.from_arrow(emb), semdedup_nlist=4,
              min_words=10, min_required_stopwords=0, out_dir=out)
    r1 = run_corpus(rd.from_arrow(pages), **kw)
    d1 = decisions_as_table(r1)
    assert r1.stats["clean_pages_resumed"] is False
    r2 = run_corpus(rd.from_arrow(pages), **kw)
    d2 = decisions_as_table(r2)
    assert r2.stats["clean_pages_resumed"] is True
    assert r2.stats["corpus_final_resumed"] is True
    assert r2.stats["neardup_verified_pairs_resumed"] is True
    assert r2.stats["semantic_semdedup_decisions_resumed"] is True
    assert d1.equals(d2)
    # per-stage walls recorded for bench attribution
    for k in ("wall_clean", "wall_neardup", "wall_final"):
        assert k in r2.stats


def test_cli_corpus(tmp_path):
    pages = synth_pages(120, seed=13)
    emb, _ = _embeddings_for(pages, n_sem_dups=4)
    inp = tmp_path / "pages"
    edir = tmp_path / "emb"
    out = tmp_path / "out"
    inp.mkdir()
    edir.mkdir()
    pq.write_table(pages, inp / "part-0.parquet")
    pq.write_table(emb, edir / "part-0.parquet")

    args = ["--pipeline", "corpus", "--input", str(inp),
            "--embeddings", str(edir), "--output", str(out),
            "--min-words", "10", "--min-stopwords", "0",
            "--num-cpus", "4"]
    r = subprocess.run([sys.executable, "-m", "nxsearch_ray.run",
                        *args], capture_output=True, text=True,
                       timeout=300, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["metric"] == "nxsearch_ray.run corpus"
    assert line["n_decisions"] > 0
    assert line["n_drop_neardup"] > 0
    assert line["n_kept"] + line["n_drop_neardup"] \
        + line["n_drop_semantic"] == line["n_decisions"]
    metrics = json.loads((out / "metrics.json").read_text())
    assert "wall_neardup" in metrics["stats"]
    assert (out / "corpus_final" / "manifest.json").exists()

    # second run resumes every stage and reproduces the decisions
    r2 = subprocess.run([sys.executable, "-m", "nxsearch_ray.run",
                         *args], capture_output=True, text=True,
                        timeout=300, cwd=REPO)
    assert r2.returncode == 0, r2.stderr[-2000:]
    line2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert line2["n_decisions"] == line["n_decisions"]
    metrics2 = json.loads((out / "metrics.json").read_text())
    assert metrics2["stats"]["corpus_final_resumed"] is True
    assert metrics2["stats"]["clean_pages_resumed"] is True
