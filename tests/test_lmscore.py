"""Unigram LM scoring gates: python-oracle equality, OOV floor via a
prebuilt capped model, empty-doc omission, and cross-corpus scoring
(the real CCNet shape: score new docs against a reference model)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "a cat and a dog"),
    (3, ""),                     # zero tokens -> omitted
    (4, "THE The the"),          # casefolds into 'the'
]


def _ds():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
        "text": pa.array([t for _, t in DOCS])})).repartition(3)


def _counts():
    toks = [w for _, t in DOCS for w in t.lower().split()]
    from collections import Counter
    return Counter(toks), len(toks)


def _score(ds):
    import ray
    from nxsearch_ray.stages.lmscore import lm_perplexity
    tbs = [t for t in ray.get(lm_perplexity(ds).to_arrow_refs())
           if t.num_columns]
    tb = pa.concat_tables(tbs)
    return {r["doc_id"]: r for r in tb.to_pylist()}


def test_matches_python_oracle(ray_session):
    got = _score(_ds())
    cnt, total = _counts()
    assert sorted(got) == [0, 1, 2, 4]       # doc 3 omitted
    for doc_id, text in DOCS:
        toks = text.lower().split()
        if not toks:
            continue
        ll = -sum(math.log(cnt[w] / total) for w in toks) / len(toks)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert got[doc_id]["logloss"] == pytest.approx(ll, rel=1e-12)
        assert got[doc_id]["perplexity"] == pytest.approx(
            math.exp(ll), rel=1e-12)


def test_repeated_word_cheaper_than_rare(ray_session):
    got = _score(_ds())
    # doc 4 is all 'the' (most frequent) -> lowest perplexity
    assert got[4]["perplexity"] < got[0]["perplexity"]
    assert got[4]["perplexity"] < got[2]["perplexity"]


def test_vocab_cap_oov_floor(ray_session):
    """Capped model: evicted words score the add-one floor, and the
    cap keeps the (count desc, word asc) head deterministically."""
    import ray
    from nxsearch_ray.stages.lmscore import (UnigramScorer,
                                             unigram_census,
                                             unigram_model_ref)

    ds = _ds()
    model = ray.get(unigram_model_ref(unigram_census(ds), vocab_cap=2))
    cnt, total = _counts()
    want = sorted(sorted(cnt), key=lambda w: (-cnt[w], w))[:2]
    assert sorted(model["words"].tolist()) == sorted(want)
    assert model["floor"] == pytest.approx(
        math.log(1.0 / (total + len(cnt))))

    scorer = UnigramScorer(model)
    out = scorer(pa.table({"doc_id": pa.array([9], type=pa.int64()),
                           "text": pa.array(["zzz-unseen-token"])}))
    assert out.num_rows == 1
    assert out.column("logloss")[0].as_py() == pytest.approx(
        -model["floor"])


def test_long_oov_token_does_not_truncate_into_vocab(ray_session):
    """An OOV token longer than every vocab word must NOT be clipped
    to the model's unicode itemsize (that would alias it onto a
    vocabulary entry)."""
    import ray
    from nxsearch_ray.stages.lmscore import (UnigramScorer,
                                             unigram_census,
                                             unigram_model_ref)

    ds = _ds()
    model = ray.get(unigram_model_ref(unigram_census(ds)))
    scorer = UnigramScorer(model)
    out = scorer(pa.table({
        "doc_id": pa.array([9], type=pa.int64()),
        "text": pa.array(["theeeeeeeeeeeeeeeeeeee"])}))
    assert out.column("logloss")[0].as_py() == pytest.approx(
        -model["floor"])


def test_cross_corpus_model_reuse(ray_session):
    """Score a new dataset against a prebuilt reference model (the
    CCNet deployment shape)."""
    import ray
    import ray.data as rd
    from nxsearch_ray.stages.lmscore import (lm_perplexity,
                                             unigram_census,
                                             unigram_model_ref)

    ref_model = unigram_model_ref(unigram_census(_ds()))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], type=pa.int64()),
        "text": pa.array(["the the the", "qqq www eee"])}))
    tbs = [t for t in ray.get(lm_perplexity(
        new, model_ref=ref_model).to_arrow_refs()) if t.num_columns]
    got = {r["doc_id"]: r for r in pa.concat_tables(tbs).to_pylist()}
    cnt, total = _counts()
    assert got[100]["logloss"] == pytest.approx(
        -math.log(cnt["the"] / total))
    # all-OOV doc scores exactly the floor
    m = ray.get(ref_model)
    assert got[101]["logloss"] == pytest.approx(-m["floor"])
