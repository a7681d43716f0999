"""Driver-contract checks for __ray_entry__.

The driver calls ray.init() itself, imports this module and runs
entry()/queries()/oracle_sql(); the correctness gate compares each
queries() result against its oracle_sql() by sorted-column value
hash.  These tests pin the contract shape so a refactor can't break
the graded surface silently.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __ray_entry__ as entry_mod  # noqa: E402


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle_sql keys without queries(): {missing}"
    # every callable takes one positional sf_dir argument
    for name, fn in q.items():
        assert callable(fn), name


def test_expected_query_inventory():
    """The graded operator inventory — adding is fine, silently losing
    an entry is not."""
    q = set(entry_mod.queries())
    # signatures/canonicalize/dedup_clusters were consolidated in r5
    # (duplicates of their _plain twins / verify+sizes pair — round-4
    # verdict task 2); their machinery is still covered by the
    # remaining entries and entry().
    expected = {
        "pages_build", "extract_text", "exact_dedup", "doc_stats",
        "lang_counts", "ngram_jaccard", "fingerprint", "ann_topk",
        "ann_topk_lsh", "ann_topk_ivf", "dedup_pairs",
        "cluster_sizes", "langid",
        "image_features", "audio_features", "video_frames",
        "embedding_dups", "embedding_dups_lsh",
        "query_probe", "bucket_census",
        "dedup_exact_verify", "signatures_plain", "canonicalize_plain",
        "ann_lsh_recall", "ann_ivf_recall", "ann_recall_report",
        "pii_scrub", "decontaminate", "gopher_quality", "url_blocklist",
        "image_features_real", "web_clean",
        "lm_perplexity", "lm_perplexity_ngram", "semantic_dedup",
        "semdedup_clustered_verify", "dedup_cascade",
    }
    missing = expected - q
    assert not missing, f"queries() lost entries: {missing}"


def test_sql_twinned_queries_precede_no_oracle():
    """The driver grades only the first 50 queries() entries; a
    hash-graded (SQL-twinned) query displaced past the cap by a
    rows-only entry silently loses its correctness gate (round-4
    verdict task 2).  Enforce: every entry in the graded head is
    oracled, and the oracled block is contiguous at the front —
    oracled entries BEYOND the cap are allowed by design (they keep
    their twin and are graded by tools/compare_oracle.py instead;
    registering them later would displace a previously-green query)."""
    names = list(entry_mod.queries())
    oracled = set(entry_mod.oracle_sql())
    head = names[:min(50, len(names))]
    assert set(head) <= oracled, (
        f"non-oracled entries inside the graded head: "
        f"{set(head) - oracled}")
    seen_rows_only = False
    for n in names:
        if n in oracled:
            assert not seen_rows_only, (
                f"oracled query {n!r} registered after a rows-only "
                "entry")
        else:
            seen_rows_only = True


def test_entry_smoke(ray_session):
    """entry() must run on an externally-initialised Ray session and
    yield >= 0 rows with a stable schema (the driver's smoke check)."""
    out = entry_mod.entry()
    if hasattr(out, "schema"):          # ray.data.Dataset
        n = out.count()
        assert out.schema() is not None
    else:                               # pandas.DataFrame
        n = len(out)
    assert n >= 0


def test_dedup_exact_verify_invariants(ray_session):
    """The flagship-output oracle: every md5-identical page group is
    co-clustered and cluster ids are component minima (sf0.001)."""
    t = entry_mod.q_dedup_exact_verify("/root/testdata/sf0.001")
    import pyarrow as pa
    if not isinstance(t, pa.Table):
        t = pa.concat_tables(
            b for b in t.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20))
    assert t.num_rows > 0
    assert set(t.column("n_clusters").to_pylist()) == {1}
    assert set(t.column("cluster_is_component_min").to_pylist()) \
        == {True}


def test_ann_exhaustive_probe_losslessness(ray_session):
    """Exhaustive-probe LSH (nbits=1) and IVF (nprobe=nlist) must
    reproduce exact brute-force top-k — recall 1.0 per query."""
    for fn in (entry_mod.q_ann_lsh_recall, entry_mod.q_ann_ivf_recall):
        t = fn("/root/testdata/sf0.001")
        assert t.column("n_common").to_pylist() \
            == t.column("k").to_pylist()


def test_dedup_planted_pair_recall_invariants(ray_session):
    """Round-4 oracles: every planted copy/tail pair is a verified
    pair (`found` all-True) and every planted variant group lands in
    ONE cluster at least as large as the group (sf0.001)."""
    import pyarrow as pa

    def as_table(x):
        if isinstance(x, pa.Table):
            return x
        return pa.concat_tables(
            b for b in x.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20))

    pairs = as_table(entry_mod.q_dedup_pairs("/root/testdata/sf0.001"))
    assert pairs.num_rows > 0
    assert set(pairs.column("found").to_pylist()) == {True}
    assert set(pairs.column("variant").to_pylist()) == {"copy", "tail"}

    groups = as_table(
        entry_mod.q_cluster_sizes("/root/testdata/sf0.001"))
    assert groups.num_rows > 0
    assert set(groups.column("n_clusters").to_pylist()) == {1}
    assert set(groups.column("cluster_size_ok").to_pylist()) == {True}
