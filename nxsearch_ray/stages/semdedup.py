"""SemDeDup — semantic deduplication over an embedding column.

The dedup rule (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540, public):
keep one representative per epsilon-ball of embedding-cosine space.
We make the paper's "keep a random example" deterministic by keeping
the LOWEST id: a document x is dropped iff some document y with
``y < x`` has ``cos(x, y) >= eps``; its ``dup_of`` is the smallest
such y.  This matches the paper's within-cluster construction — zero
the lower triangle of the similarity matrix, drop rows whose max
remaining similarity exceeds eps — with id order as the tie-break.

Reference parity note: the reference engine (rmind/nxsearch) has no
embedding operators; this stage extends the near-dedup tier family
(pipelines/dedup.py MinHash tier, stages/setsim.py ngram tier) with
the semantic tier a training-data pipeline needs.

Two plans, same output schema ``(id, dup_of, keep)``:

* **exact** — global all-pairs via the blocked block-pair plan
  (stages/ann.py:embedding_dup_pairs_blocked): B·(B+1)/2 tasks each
  hold two O(block_rows·dim) blocks, so memory is flat in corpus
  size; the O(n²) work is inherent to exactness.  ``dup_of`` is a
  native groupby min over the pair stream; keep flags reach the full
  corpus through the key-disjoint streaming left join
  (stages/join.py:hash_join how='left') — no driver materialization,
  no broadcast of an O(n) side.  This is the verification /
  small-corpus plan and the SQL-oracle twin.

* **clustered** — SemDeDup proper, the 100-TB plan: a deterministic
  spherical k-means coarse quantizer (stages/ann.py:
  train_ivf_centroids_ref, trained on a sample in one remote task)
  assigns every vector to its nearest centroid in a streaming
  map_batches; one groupby co-locates each cluster; the within-
  cluster rule runs as a row-blocked matmul (memory
  O(block·cluster_size), never O(cluster_size²)).  Work drops to
  O(Σ n_c²) ≈ O(n²/nlist).  Approximate in exactly the paper's way —
  cross-cluster near-duplicates are missed — so its drop set is a
  SOUND SUBSET of the exact rule's (a within-cluster eps-neighbor is
  a global eps-neighbor); gated in tests: subset on the sandbox
  table, equality at nlist=1, and planted-duplicate recall (identical
  vectors always share a cluster, so exact copies can never escape).

Partitioning assumption (clustered plan): cluster sizes are within a
few × of balanced.  k-means on real embedding corpora yields this
(the paper uses 11k clusters for 100M+ docs); a degenerate corpus
where one cluster holds most rows degrades toward the exact plan's
quadratic cost for that cluster — raise ``nlist`` or pre-split hot
clusters by re-running k-means inside them if that appears.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.stages.ann import (_embedding_matrix, _normalize,
                                     embedding_dup_pairs_blocked,
                                     train_ivf_centroids_ref)

OUT_SCHEMA = pa.schema([("id", pa.int64()), ("dup_of", pa.int64()),
                        ("keep", pa.bool_())])


def _finalize(ids: np.ndarray, dup_of: np.ndarray) -> pa.Table:
    """(id, dup_of, keep) with the kept-row sentinel dup_of = -1."""
    return pa.Table.from_arrays(
        [pa.array(ids, type=pa.int64()),
         pa.array(dup_of, type=pa.int64()),
         pa.array(dup_of < 0)], schema=OUT_SCHEMA)


def semantic_dedup_exact(emb_ds, *, eps: float = 0.4,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         block_rows: int = 8192,
                         num_partitions: int | None = None):
    """Exact plan: global pairs -> per-victim min -> streaming left
    join of keep flags onto the corpus ids."""
    from nxsearch_ray.stages.join import hash_join

    pairs = embedding_dup_pairs_blocked(
        emb_ds, threshold=eps, id_col=id_col, emb_col=emb_col,
        block_rows=block_rows)
    # pin the dup map before the exchange join: same discipline as the
    # flagship's candidate pin (pipelines/dedup.py) — running the
    # groupby's shuffle concurrently with the join's hash exchange
    # stacks aggregator pools and can starve a small cluster, and the
    # intermediate is tiny (two int64s per DROPPED doc, object-store
    # resident — never on the driver)
    dups = pairs.groupby("b").min("a").materialize()

    joined = hash_join(
        emb_ds.select_columns([id_col]), dups,
        left_key=id_col, right_key="b",
        left_schema=pa.schema([(id_col, pa.int64())]),
        right_schema=pa.schema([("b", pa.int64()),
                                ("min(a)", pa.int64())]),
        num_partitions=num_partitions, how="left")

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return OUT_SCHEMA.empty_table()
        ids = t.column(id_col).to_numpy()
        dup = np.asarray(t.column("min(a)_r").fill_null(-1).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        return _finalize(ids, dup)

    return joined.map_batches(finish, batch_format="pyarrow")


def _cluster_rule(eps: float, id_col: str, emb_col: str,
                  row_block: int = 4096):
    """Within-cluster SemDeDup rule as a map_groups fn: sort by id,
    then for each row the smallest EARLIER row with cos >= eps.  The
    similarity matrix is computed in row blocks so memory stays
    O(row_block · cluster_size) whatever the cluster size."""

    def fn(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = _normalize(_embedding_matrix(g, emb_col))[order]
        n = len(ids)
        dup = np.full(n, -1, dtype=np.int64)
        for s in range(0, n, row_block):
            e = min(s + row_block, n)
            sims = mat[:e] @ mat[s:e].T          # (e, e-s)
            # row i is an eligible earlier doc for column j iff i < s+j
            hit = sims >= eps
            cols = np.arange(s, e)
            hit[cols[None, :] <= np.arange(e)[:, None]] = False
            any_hit = hit.any(axis=0)
            first = hit.argmax(axis=0)           # first True = min id
            dup[s:e][any_hit] = ids[first[any_hit]]
        return _finalize(ids, dup)

    return fn


def semantic_dedup_clustered(emb_ds, *, eps: float = 0.4,
                             nlist: int = 64, seed: int = 42,
                             id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             sample_cap: int = 65536,
                             centroids_ref=None):
    """Clustered plan (SemDeDup proper).  One sample-trained k-means,
    one streaming assignment pass, one groupby, blocked in-cluster
    matmuls.  Drops are a sound subset of the exact rule's."""
    import ray

    if centroids_ref is None:
        centroids_ref = train_ivf_centroids_ref(
            emb_ds, nlist, emb_col=emb_col, seed=seed,
            sample_cap=sample_cap)
    cent = ray.get(centroids_ref)                # (nlist, dim) — tiny
    if cent.size == 0:
        return emb_ds.limit(0).map_batches(
            lambda t: OUT_SCHEMA.empty_table(), batch_format="pyarrow")

    def assign(batch: pa.Table) -> pa.Table:
        mat = _normalize(_embedding_matrix(batch, emb_col))
        cl = (mat @ cent.T).argmax(axis=1).astype(np.int64)
        return batch.select([id_col, emb_col]).append_column(
            "cluster", pa.array(cl))

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow")
    return assigned.groupby("cluster").map_groups(
        _cluster_rule(eps, id_col, emb_col), batch_format="pyarrow")
