"""Probe-side near-duplicate query: find corpus documents similar to a
given text.

The semantics donor is the reference's search path: a probe must go
through the IDENTICAL canonicalization pipeline as the corpus
(reference src/query/query.c:75-115 `query_prepare` runs each query
term through the same filter pipeline), then the same signature math
decides matches.  This is the dedup engine's analogue of
``nxs_index_search`` (reference src/query/search.c:285-342) — instead
of BM25-ranked term matches, it returns signature-verified near-dup
candidates.

Execution: the probe's bands/anchors/seq-hash are computed driver-side
(one document); matching is a vectorized filter over the signatures
Dataset (streaming, no shuffle) followed by the standard decision
rules.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.config import PipelineConfig
from nxsearch_ray.functions import hashing as H
from nxsearch_ray.stages.canonicalize import CanonicalizeActor
from nxsearch_ray.stages.signatures import SignatureActor, list_column_numpy

QUERY_RESULT_SCHEMA = pa.schema([
    ("page_id", pa.int64()), ("est_jaccard", pa.float64()),
    ("hamming", pa.int32()), ("matched_bands", pa.int32()),
    ("keep", pa.bool_())])


def probe_signature(text: str, cfg: PipelineConfig, *,
                    lang: str | None = None) -> pa.Table:
    """Signatures row for a probe text (identical canonicalization +
    signature math as the corpus — the 'same filter pipeline'
    invariant)."""
    t = pa.Table.from_arrays(
        [pa.array([0], type=pa.int64()),
         pa.array([text], type=pa.string()),
         pa.array([lang or cfg.lang], type=pa.string())],
        names=["page_id", "text", "lang"])
    canon = CanonicalizeActor(cfg)(t)
    return SignatureActor(cfg, keep_columns=("page_id", "token_ids"))(
        canon)


def query_near_duplicates(signatures_ds, text: str,
                          cfg: PipelineConfig | None = None, *,
                          lang: str | None = None):
    """Dataset of corpus pages near-duplicating ``text``.

    Matching criteria (same thresholds as the pipeline): shared LSH
    band, or SimHash Hamming ≤ d, or exact seq-hash; ``keep`` column
    applies est_jaccard/hamming rules."""
    cfg = cfg or PipelineConfig()
    probe = probe_signature(text, cfg, lang=lang)
    p_mh_flat, _ = list_column_numpy(probe.column("minhash"))
    p_sig = p_mh_flat.reshape(1, cfg.num_perms)
    p_res = (p_sig & np.uint64(0xFF)).astype(np.uint8)[0]
    p_bands = set(H.band_keys(p_sig, cfg.lsh_bands, cfg.lsh_rows,
                              cfg.seed)[0].tolist())
    p_sim = np.uint64(probe.column("simhash")[0].as_py())
    p_seq = np.uint64(probe.column("seq_hash")[0].as_py())
    cfg_json = cfg.to_json()

    def match(batch: pa.Table) -> pa.Table:
        c = PipelineConfig.from_json(cfg_json)
        n = batch.num_rows
        if n == 0:
            return QUERY_RESULT_SCHEMA.empty_table()
        mh_flat, _ = list_column_numpy(batch.column("minhash"))
        sig = mh_flat.reshape(n, c.num_perms)
        bands = H.band_keys(sig, c.lsh_bands, c.lsh_rows, c.seed)
        band_hits = np.zeros(n, dtype=np.int32)
        for bk in p_bands:
            band_hits += (bands == np.uint64(bk)).any(axis=1)
        res_flat, _ = list_column_numpy(batch.column("mh_res"),
                                        dtype=np.uint8)
        res = res_flat.reshape(n, c.num_perms)
        est_j = (res == p_res[None, :]).mean(axis=1)
        sim = batch.column("simhash").to_numpy().astype(np.uint64)
        ham = H.hamming64(sim, np.full(n, p_sim, dtype=np.uint64))
        seq = batch.column("seq_hash").to_numpy().astype(np.uint64)
        candidate = (band_hits > 0) | (ham <= c.simhash_hamming) | \
            (seq == p_seq)
        keep = (seq == p_seq) | (est_j >= c.jaccard_threshold) | \
            (ham <= c.simhash_hamming)
        out = pa.Table.from_arrays(
            [batch.column("page_id").cast(pa.int64()),
             pa.array(est_j, type=pa.float64()),
             pa.array(ham.astype(np.int32)),
             pa.array(band_hits), pa.array(keep)],
            schema=QUERY_RESULT_SCHEMA)
        return out.filter(pa.array(candidate))

    return signatures_ds.map_batches(match, batch_format="pyarrow")
