"""Filter-pipeline fixtures from reference src/tests/t_filters.c:39-156."""

import pytest

from nxsearch_ray.functions.filters import (
    FilterAction,
    FilterPipeline,
    build_pipeline,
    register_filter,
)


@pytest.fixture(scope="module", autouse=True)
def _test_filters():
    # Custom action filter like the C test's mock filter (t_filters.c:39-103):
    # token "M" ⇒ MUTATION (kept), "D" ⇒ DISCARD, "E" ⇒ ERROR.
    def action_factory(params):
        def filt(token):
            if token == "D":
                return FilterAction.DISCARD, token
            if token == "E":
                return FilterAction.ERROR, token
            return FilterAction.MUTATION, token
        return filt

    # Lua-equivalent plugin lowercase filter (t_filters.c:105-156).
    def lower_factory(params):
        def filt(token):
            return FilterAction.MUTATION, token.lower()
        return filt

    # Filter that empties the buffer: must yield DISCARD (filters.c:208-210).
    def empty_factory(params):
        def filt(token):
            return FilterAction.MUTATION, ""
        return filt

    for name, fac in [("t-action", action_factory),
                      ("t-lower", lower_factory),
                      ("t-empty", empty_factory)]:
        try:
            register_filter(name, fac)
        except ValueError:
            pass
    yield


def test_action_semantics():
    fp = FilterPipeline(("t-action",), {})
    assert fp.run("M") == "M"
    assert fp.run("D") is None
    assert fp.run("E") is None


def test_plugin_lowercase():
    fp = FilterPipeline(("t-lower",), {})
    assert fp.run("TEST-STRING") == "test-string"


def test_empty_buffer_discards():
    fp = FilterPipeline(("t-empty",), {})
    assert fp.run("anything") is None


def test_unknown_filter_raises():
    # filter `X' not found (reference src/core/filters.c:154-158)
    with pytest.raises(KeyError):
        FilterPipeline(("no-such-filter",), {})


def test_default_chain_order():
    # default_filters[] = normalizer, stopwords, stemmer (nxs.c:87-89)
    fp = build_pipeline(("normalizer", "stopwords", "stemmer"), "en")
    assert fp.run("The") is None          # stopword after casefold
    assert fp.run("Jumped") == "jump"     # normalize then stem
    assert fp.run("Foxes") == "fox"


def test_stopwords_unknown_lang_pass_through():
    fp = build_pipeline(("normalizer", "stopwords"), "de")
    # no stopword dict for 'de' in the reference (stopword_langs[]={"en"})
    assert fp.run("und") == "und"


def test_stemmer_unknown_lang_pass_through():
    fp = build_pipeline(("stemmer",), "zh")
    assert fp.run("jumped") == "jumped"
