"""End-to-end pipeline gates (SURVEY.md §5):

  * distributed pipeline == pure-python oracle, exactly
  * dup-pair recall ≥ 0.99 vs planted truth
  * parallelism invariance (different block counts → identical output)
  * checkpoint-resume → identical output, stages skipped
  * physical-plan equivalence (bucketed verify / labelprop CC)
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pytest

from nxsearch_ray.config import PipelineConfig
from nxsearch_ray.oracle import oracle_clusters
from nxsearch_ray.pipelines.dedup import clusters_as_table, run_dedup
from nxsearch_ray.sources.synth import synth_pages, truth_pairs

N_BASE = 600
SEED = 21


@pytest.fixture(scope="module")
def corpus():
    return synth_pages(N_BASE, seed=SEED)


@pytest.fixture(scope="module")
def oracle(corpus):
    return oracle_clusters(corpus, PipelineConfig())


@pytest.fixture(scope="module")
def corpus_dir(corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("synth")
    n = corpus.num_rows
    per = (n + 7) // 8
    for i in range(0, n, per):
        pq.write_table(corpus.slice(i, per), d / f"part-{i:06d}.parquet")
    return str(d)


def _pages_ds(corpus_dir):
    import ray.data as rd

    return rd.read_parquet(
        corpus_dir, columns=["page_id", "url", "warc_ts", "html", "lang"])


def _cluster_dict(res) -> dict[int, int]:
    t = clusters_as_table(res)
    return dict(zip(t.column("page_id").to_pylist(),
                    t.column("cluster_id").to_pylist()))


def _pair_set(res) -> set[tuple[int, int]]:
    batches = list(res.verified_pairs.iter_batches(
        batch_size=100000, batch_format="pyarrow"))
    if not batches:
        return set()
    t = pa.concat_tables(batches)
    return set(zip(t.column("a").to_pylist(), t.column("b").to_pylist()))


def test_pipeline_matches_oracle_exactly(ray_session, corpus_dir, oracle):
    labels, opairs = oracle
    res = run_dedup(_pages_ds(corpus_dir), PipelineConfig())
    assert _cluster_dict(res) == labels
    assert _pair_set(res) == opairs


def test_recall_gate(oracle, corpus):
    labels, _ = oracle
    truth = truth_pairs(corpus)
    hit = sum(1 for (a, b) in truth
              if labels.get(a) is not None
              and labels.get(a) == labels.get(b))
    assert hit / len(truth) >= 0.99, f"recall {hit}/{len(truth)}"


def test_parallelism_invariance(ray_session, corpus_dir, oracle):
    labels, _ = oracle
    ds = _pages_ds(corpus_dir).repartition(17)
    res = run_dedup(ds, PipelineConfig())
    assert _cluster_dict(res) == labels


def test_physical_plan_equivalence(ray_session, corpus_dir, oracle):
    labels, opairs = oracle
    res = run_dedup(_pages_ds(corpus_dir), PipelineConfig(),
                    verify_mode="bucketed", cc_mode="labelprop")
    assert _cluster_dict(res) == labels
    assert _pair_set(res) == opairs


def test_tiny_doc_tail_containment(ray_session):
    """A 5-word tail of a 10-word doc has exactly ONE 5-shingle, so it
    can share at most one anchor bucket — the suffix co-occurrence
    threshold must cap at the achievable-hit bound (min of the sides'
    anchor counts) or the pair is structurally unreachable (regression:
    planted tail of doc 275 at sf0.01 was missed under a flat
    min_anchor_hits=2)."""
    import ray.data as rd

    text = "alpha row beta window merge hash window group order join"
    tail = " ".join(text.split()[5:])
    mk = (lambda t: f"<html><head><title>x</title></head>"
          f"<body><p>{t}</p></body></html>".encode())
    # decoy singletons so the corpus isn't degenerate
    decoys = [f"decoy{u} " * 12 for u in range(6)]
    rows = [(0, "https://a.example.org/0", text),
            (2, "https://a.example.org/0/tail", tail)] + [
        (10 + 4 * u, f"https://d.example.org/{u}", d)
        for u, d in enumerate(decoys)]
    t = pa.table({
        "page_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "url": pa.array([r[1] for r in rows]),
        "warc_ts": pa.array([0] * len(rows),
                            type=pa.timestamp("us")),
        "html": pa.array([mk(r[2]) for r in rows], type=pa.binary()),
        "lang": pa.array(["en"] * len(rows)),
    })
    res = run_dedup(rd.from_arrow(t), PipelineConfig())
    assert (0, 2) in _pair_set(res)
    labels = _cluster_dict(res)
    assert labels[0] == labels[2]


def test_checkpoint_resume(ray_session, corpus_dir, oracle, tmp_path):
    labels, _ = oracle
    out = str(tmp_path / "ckpt")
    cfg = PipelineConfig()
    r1 = run_dedup(_pages_ds(corpus_dir), cfg, out_dir=out)
    assert _cluster_dict(r1) == labels
    assert not any(v for k, v in r1.stats.items() if k.endswith("resumed"))

    r2 = run_dedup(_pages_ds(corpus_dir), cfg, out_dir=out)
    assert _cluster_dict(r2) == labels
    assert r2.stats["signatures_resumed"]
    assert r2.stats["verified_pairs_resumed"]

    # stale config invalidates every checkpoint
    r3 = run_dedup(_pages_ds(corpus_dir),
                   cfg.with_(jaccard_threshold=0.6), out_dir=out)
    assert not r3.stats["signatures_resumed"]
    shutil.rmtree(out, ignore_errors=True)


def test_partial_resume_from_mid_stage(ray_session, corpus_dir, oracle,
                                       tmp_path):
    """Kill-after-stage-k simulation: run with checkpoints, delete the
    later stage dirs, re-run — early stages load, later recompute,
    output identical (the north rule's resumable-boundaries gate)."""
    labels, _ = oracle
    out = str(tmp_path / "ckpt2")
    cfg = PipelineConfig()
    run_dedup(_pages_ds(corpus_dir), cfg, out_dir=out)
    shutil.rmtree(f"{out}/verified_pairs")
    shutil.rmtree(f"{out}/clusters")
    r = run_dedup(_pages_ds(corpus_dir), cfg, out_dir=out)
    assert r.stats["signatures_resumed"]
    assert not r.stats["verified_pairs_resumed"]
    assert _cluster_dict(r) == labels
    shutil.rmtree(out, ignore_errors=True)

def test_crash_mid_write_discards_stale_parts(ray_session, corpus_dir,
                                              oracle, tmp_path):
    """ADVICE r01 #1 scenario: a crash mid-write leaves stale parquet
    parts with no (or stale) manifest; the re-run must recompute the
    stage and NOT mix the stale parts into the checkpoint."""
    import glob
    import os

    labels, _ = oracle
    out = str(tmp_path / "crash")
    cfg = PipelineConfig()
    run_dedup(_pages_ds(corpus_dir), cfg, out_dir=out)

    sigdir = f"{out}/signatures"
    parts = sorted(glob.glob(f"{sigdir}/*.parquet"))
    # simulate the crash: duplicate a part (stale leftover rows) and
    # drop the manifest (the write never completed)
    shutil.copy(parts[0], f"{sigdir}/zz-stale-partial.parquet")
    os.remove(f"{sigdir}/manifest.json")
    shutil.rmtree(f"{out}/verified_pairs")
    shutil.rmtree(f"{out}/clusters")

    r = run_dedup(_pages_ds(corpus_dir), cfg, out_dir=out)
    assert not r.stats["signatures_resumed"]
    assert _cluster_dict(r) == labels
    assert not os.path.exists(f"{sigdir}/zz-stale-partial.parquet")
    shutil.rmtree(out, ignore_errors=True)


def test_incremental_ingest(ray_session, corpus, corpus_dir, oracle,
                            tmp_path):
    """Append-only ingest (reference offset-replay analogue): run on a
    subset, append the rest via run_dedup_incremental, output must be
    IDENTICAL to the full recompute — and only the appended pages may
    go through the signature stage."""
    import ray.data as rd

    from nxsearch_ray.pipelines.dedup import run_dedup_incremental

    labels, opairs = oracle
    out = str(tmp_path / "inc")
    cfg = PipelineConfig()

    # prior run over ~70% of the pages (prefix by page_id order)
    n = corpus.num_rows
    cut = int(n * 0.7)
    ids = sorted(corpus.column("page_id").to_pylist())
    subset_ids = set(ids[:cut])
    sub = corpus.filter(pa.array(
        [pid in subset_ids
         for pid in corpus.column("page_id").to_pylist()]))
    run_dedup(rd.from_arrow(sub).map_batches(
        lambda t: t.select(["page_id", "url", "warc_ts", "html",
                            "lang"]), batch_format="pyarrow"),
        cfg, out_dir=out)

    # incremental over the FULL corpus
    res = run_dedup_incremental(_pages_ds(corpus_dir), cfg,
                                out_dir=out)
    assert res.stats["incremental_known_pages"] == cut
    assert res.stats["incremental_new_pages"] == n - cut
    assert _cluster_dict(res) == labels
    assert _pair_set(res) == opairs
    shutil.rmtree(out, ignore_errors=True)


def test_remove_docs(ray_session, corpus, corpus_dir, oracle, tmp_path):
    """Document deletion (reference tombstone-replay analogue,
    dtmap.c:546-655): delete pages from a checkpointed run — including
    a cluster's min-id representative, so cluster ids must re-derive —
    and the output must be IDENTICAL to a full recompute without them,
    with the signature stage resumed (canonicalization never redone)."""
    from nxsearch_ray.pipelines.dedup import run_dedup_remove

    labels, _ = oracle
    out = str(tmp_path / "rm")
    cfg = PipelineConfig()
    run_dedup(_pages_ds(corpus_dir), cfg, out_dir=out)

    # removed set: the min-id member of the largest cluster (forces a
    # cluster-id change), one full small cluster, plus every 37th page
    by_cluster: dict[int, list[int]] = {}
    for pid, cid in labels.items():
        by_cluster.setdefault(cid, []).append(pid)
    sized = sorted(by_cluster.values(), key=len)
    removed = {min(sized[-1])}                      # biggest cluster's rep
    multi = [m for m in sized if len(m) > 1]
    removed.update(multi[0])                        # a whole small cluster
    all_ids = sorted(labels)
    removed.update(all_ids[::37])
    removed_ids = sorted(removed)

    res = run_dedup_remove(removed_ids, cfg, out_dir=out)
    assert res.stats["removed_found"] == len(removed_ids)
    assert res.stats["signatures_resumed"]

    keep = pa.array([pid not in removed
                     for pid in corpus.column("page_id").to_pylist()])
    exp_labels, exp_pairs = oracle_clusters(corpus.filter(keep),
                                            PipelineConfig())
    assert _cluster_dict(res) == exp_labels
    assert _pair_set(res) == exp_pairs

    # deleting EVERYTHING must refuse before mutating any checkpoint
    with pytest.raises(ValueError, match="every page"):
        run_dedup_remove(sorted(corpus.column("page_id").to_pylist()),
                         cfg, out_dir=out)
    shutil.rmtree(out, ignore_errors=True)
