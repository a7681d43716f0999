"""Deterministic synthetic web-page corpus with planted duplicates.

For benchmarking and recall gates we need corpora larger / more
adversarial than the sandbox tables.  Everything here derives from a
seed + the vocabulary of the sandbox `documents` table (no external
data), is fully deterministic (numpy Generator with fixed seed), and
carries ground-truth cluster ids planted at generation.

Duplicate classes (SURVEY.md §5 "Oracle dedup corpus"):

  orig      base document
  copy      exact copy (url/ts differ)
  near      ~5% of words replaced — high shingle Jaccard (MinHash path)
  contain   contiguous 30–70% slice — containment ≈ 1, Jaccard low
            (suffix/containment path)
  shuffle   word-shuffled — bag-of-words identical, shingles destroyed;
            *excluded* from the recall gate (no shingle-based config
            can catch it) but kept in the corpus as a hard negative
  boiler    base text wrapped in corpus-wide boilerplate header/footer
            — creates hot LSH buckets (skew exercise)

The recall gate counts classes {copy, near, contain, boiler}.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BOILER_HEADER = ("site navigation home products pricing about contact "
                 "login register search menu footer copyright")
BOILER_FOOTER = ("privacy policy terms of service cookie settings "
                 "newsletter subscribe social links sitemap help")

TRUTH_CLASSES_GATED = ("copy", "near", "contain", "boiler")


def vocab_from_documents(sf_dir: str, limit: int = 32768) -> list[str]:
    """Deterministic vocabulary: distinct whitespace words of the
    sandbox documents table, deterministically extended with numbered
    variants up to ``limit``.

    The extension matters for realism: with a tiny vocabulary,
    unrelated zipf documents share exact 5-grams at rates real web
    text never shows, flooding every shingle-keyed pass with junk
    candidates.  ~32k tokens puts cross-document shingle collisions
    back into a Common-Crawl-plausible regime."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    words: set[str] = set()
    for txt in t.column("text").to_pylist():
        words.update((txt or "").split())
    base = sorted(words)
    out: list[str] = []
    k = 0
    while len(out) < limit:
        suffix = str(k) if k else ""
        out.extend(w + suffix for w in base)
        k += 1
    return out[:limit]


def synth_pages(n_base: int, *, seed: int = 42,
                vocab: list[str] | None = None,
                sf_dir: str = "/root/testdata/sf0.001",
                min_len: int = 40, max_len: int = 240,
                dup_fraction: float = 0.3) -> pa.Table:
    """Corpus of ~n_base * (1 + dup_fraction) pages.

    Returns (page_id, url, warc_ts, html, text, lang, truth_cluster,
    variant); truth_cluster = base index, -1 for non-duplicated bases.
    """
    if vocab is None:
        vocab = vocab_from_documents(sf_dir)
    V = len(vocab)
    rng = np.random.default_rng(seed)

    # zipf-ish weights over the vocabulary
    ranks = np.arange(1, V + 1, dtype=np.float64)
    w = 1.0 / ranks
    w /= w.sum()

    lengths = rng.integers(min_len, max_len, n_base)
    total = int(lengths.sum())
    word_idx = rng.choice(V, size=total, p=w)
    offsets = np.zeros(n_base + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    varr = np.array(vocab, dtype=object)

    base_words = [varr[word_idx[offsets[i]:offsets[i + 1]]].tolist()
                  for i in range(n_base)]

    page_ids: list[int] = []
    urls: list[str] = []
    texts: list[str] = []
    clusters: list[int] = []
    variants: list[str] = []

    def add(base: int, slot: int, words: list[str], variant: str,
            cluster: int) -> None:
        pid = base * 8 + slot
        page_ids.append(pid)
        urls.append(f"https://synth.example.org/doc/{base}/{variant}")
        texts.append(" ".join(words))
        clusters.append(cluster)
        variants.append(variant)

    is_dup = rng.random(n_base) < dup_fraction
    dup_kind = rng.integers(0, 5, n_base)   # which class a dup base gets
    kinds = ("copy", "near", "contain", "shuffle", "boiler")

    for i in range(n_base):
        words = base_words[i]
        cluster = i if is_dup[i] else -1
        add(i, 0, words, "orig", cluster)
        if not is_dup[i]:
            continue
        kind = kinds[dup_kind[i]]
        if kind == "copy":
            add(i, 1, words, "copy", i)
        elif kind == "near":
            wcopy = list(words)
            n_rep = max(1, len(wcopy) // 20)
            pos = rng.choice(len(wcopy), size=n_rep, replace=False)
            rep = rng.choice(V, size=n_rep)
            for p, r in zip(pos, rep):
                wcopy[p] = vocab[r]
            add(i, 2, wcopy, "near", i)
        elif kind == "contain":
            span = max(10, int(len(words) * rng.uniform(0.3, 0.7)))
            start = int(rng.integers(0, len(words) - span + 1))
            add(i, 3, words[start:start + span], "contain", i)
        elif kind == "shuffle":
            wcopy = list(words)
            rng.shuffle(wcopy)
            add(i, 4, wcopy, "shuffle", i)
        else:  # boiler
            wrapped = (BOILER_HEADER.split() + words
                       + BOILER_FOOTER.split())
            add(i, 5, wrapped, "boiler", i)

    n = len(page_ids)
    ts = (np.asarray(page_ids, dtype=np.int64) % 86400) * 1_000_000 \
        + 1704067200_000_000
    htmls = [f"<html><head><title>{u}</title></head><body><p>{t}</p>"
             f"</body></html>".encode() for u, t in zip(urls, texts)]
    return pa.Table.from_arrays(
        [pa.array(page_ids, type=pa.int64()),
         pa.array(urls, type=pa.string()),
         pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
         pa.array(htmls, type=pa.binary()),
         pa.array(texts, type=pa.string()),
         pa.array(["en"] * n, type=pa.string()),
         pa.array(clusters, type=pa.int64()),
         pa.array(variants, type=pa.string())],
        names=["page_id", "url", "warc_ts", "html", "text", "lang",
               "truth_cluster", "variant"])


def synth_parquet(n_base: int, *, seed: int = 42,
                  sf_dir: str = "/root/testdata/sf0.001",
                  out_dir: str | None = None,
                  num_files: int = 32) -> str:
    """Write (or reuse) a cached synthetic corpus as a multi-file
    parquet directory (many files ⇒ many read blocks ⇒ real
    parallelism from the first stage)."""
    out_dir = out_dir or f"/tmp/synth_corpus/v2_n{n_base}_s{seed}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = synth_pages(n_base, seed=seed, sf_dir=sf_dir)
    n = t.num_rows
    per = max(1, (n + num_files - 1) // num_files)
    for f in range(0, n, per):
        pq.write_table(t.slice(f, per),
                       os.path.join(out_dir, f"part-{f:010d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("")
    return out_dir


def synth_embeddings_parquet(n: int, *, dim: int = 64, seed: int = 42,
                             n_anchors: int = 256,
                             dup_every: int = 10,
                             out_dir: str | None = None,
                             num_files: int = 32) -> str:
    """Write (or reuse) a cached deterministic embedding corpus for
    the semantic-dedup bench: ``n_anchors`` unit anchor directions,
    vectors = anchor·12 + unit noise (same-anchor cosine ≈ 0.7,
    cross-anchor ≈ 0 — clusterable, like real embedding corpora), and
    every ``dup_every``-th vector an EXACT copy of the one
    ``dup_every`` before it (planted semantic duplicates with cosine
    1.0 — the clustered plan must find them all)."""
    out_dir = out_dir or (f"/tmp/synth_emb/v1_n{n}_d{dim}_s{seed}"
                          f"_a{n_anchors}_e{dup_every}_f{num_files}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    anchors = rng.normal(size=(n_anchors, dim))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    mat = anchors[np.arange(n) % n_anchors] * 12.0 \
        + rng.normal(size=(n, dim))
    for i in range(dup_every, n, dup_every):
        mat[i] = mat[i - dup_every]
    mat32 = mat.astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    per = max(1, (n + num_files - 1) // num_files)
    for f in range(0, n, per):
        sl = slice(f, min(f + per, n))
        t = pa.table({
            "vec_id": pa.array(ids[sl]),
            "embedding": pa.array(list(mat32[sl]),
                                  type=pa.list_(pa.float32()))})
        pq.write_table(t, os.path.join(out_dir,
                                       f"part-{f:010d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("")
    return out_dir


def synth_corpus_embeddings_parquet(corpus_dir: str, *,
                                    dim: int = 64, seed: int = 42,
                                    n_anchors: int = 256,
                                    dup_every: int = 10,
                                    out_dir: str | None = None,
                                    num_files: int = 16) -> str:
    """Write (or reuse) embeddings KEYED BY the page ids of a synth
    corpus directory (``vec_id == page_id``), for benching the
    composed corpus pipeline: anchor-structured vectors (same scheme
    as synth_embeddings_parquet) with every ``dup_every``-th page an
    exact copy of the one ``dup_every`` positions earlier (planted
    semantic dups for the tier to find)."""
    tag = os.path.basename(os.path.normpath(corpus_dir))
    out_dir = out_dir or (f"/tmp/synth_corpus_emb/v1_{tag}_d{dim}"
                          f"_s{seed}_a{n_anchors}_e{dup_every}"
                          f"_f{num_files}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ids = np.sort(np.concatenate([
        pq.read_table(os.path.join(corpus_dir, f),
                      columns=["page_id"]).column("page_id").to_numpy()
        for f in sorted(os.listdir(corpus_dir))
        if f.endswith(".parquet")]))
    n = len(ids)
    rng = np.random.default_rng(seed)
    anchors = rng.normal(size=(n_anchors, dim))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    mat = anchors[np.arange(n) % n_anchors] * 12.0 \
        + rng.normal(size=(n, dim))
    for i in range(dup_every, n, dup_every):
        mat[i] = mat[i - dup_every]
    mat32 = mat.astype(np.float32)
    per = max(1, (n + num_files - 1) // num_files)
    for f in range(0, n, per):
        sl = slice(f, min(f + per, n))
        t = pa.table({
            "vec_id": pa.array(ids[sl], type=pa.int64()),
            "embedding": pa.array(list(mat32[sl]),
                                  type=pa.list_(pa.float32()))})
        pq.write_table(t, os.path.join(out_dir,
                                       f"part-{f:010d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("")
    return out_dir


def truth_pairs(table: pa.Table) -> set[tuple[int, int]]:
    """Gated ground-truth duplicate pairs (a<b) from a synth table."""
    import collections

    by_cluster = collections.defaultdict(list)
    variants = table.column("variant").to_pylist()
    clusters = table.column("truth_cluster").to_pylist()
    pids = table.column("page_id").to_pylist()
    for pid, cl, var in zip(pids, clusters, variants):
        if cl >= 0 and (var == "orig" or var in TRUTH_CLASSES_GATED):
            by_cluster[cl].append(pid)
    pairs = set()
    for members in by_cluster.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs
