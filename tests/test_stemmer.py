"""Porter2 (Snowball English) stemmer goldens.

The pairs below are from the public Snowball English specification and its
published sample vocabulary (snowballstem.org) — the same algorithm
libstemmer runs for the reference's stemmer filter
(src/core/filters_builtin.c:206-245).
"""

import pytest

from nxsearch_ray.functions.stemmer import stem

GOLDENS = [
    # fixtures (FIXTURES.md §4)
    ("jumped", "jump"),
    ("foxes", "fox"),
    # step 1a
    ("caresses", "caress"),
    ("ties", "tie"),
    ("cries", "cri"),
    ("cats", "cat"),
    ("gas", "gas"),
    # step 1b + doubling / e-restoration
    ("running", "run"),
    ("hopping", "hop"),
    ("stemming", "stem"),
    ("falling", "fall"),
    ("agreed", "agre"),
    ("sized", "size"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),          # exception list
    # exceptions
    ("skies", "sky"),
    ("dying", "die"),
    ("news", "news"),
    ("inning", "inning"),
    ("proceed", "proceed"),
    # steps 2-4
    ("national", "nation"),
    ("rational", "ration"),
    ("digitizer", "digit"),
    ("hopefulness", "hope"),
    ("generously", "generous"),
    ("communism", "communism"),  # commun- prefix exception keeps R1 tight
    # step 5
    ("rate", "rate"),
    ("cease", "ceas"),
    # short words untouched
    ("be", "be"),
    ("as", "as"),
    ("on", "on"),
]


@pytest.mark.parametrize("word,expected", GOLDENS)
def test_stemmer_goldens(word, expected):
    assert stem(word) == expected
