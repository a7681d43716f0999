"""Unicode fixtures transcribed from reference src/tests/t_utf8.c (FIXTURES.md §3)."""

from nxsearch_ray.functions.unicode import (
    nfkc_casefold,
    normalize_token,
    strip_diacritics,
    utf8_tolower,
    utf8_toupper,
)


def test_nfkc_casefold_henry():
    assert nfkc_casefold("Henry Ⅷ") == "henry viii"


def test_nfkc_casefold_circled():
    assert nfkc_casefold("AirForce ①") == "airforce 1"


def test_tolower():
    assert utf8_tolower("TEST") == "test"
    assert utf8_tolower("ĄČĘĖĮŠŲŪŽ") == "ąčęėįšųūž"


def test_toupper():
    assert utf8_toupper("straße") == "STRASSE"
    assert utf8_toupper("Дніпр") == "ДНІПР"


def test_diacritics_latin():
    assert strip_diacritics("àéîõü") == "aeiou"
    assert strip_diacritics("ąčęėįšųūž") == "aceeisuuz"
    assert strip_diacritics("Ĳ") == "IJ"  # NFKD compat decomposition


def test_normalize_token_chain():
    # normalizer filter = NFKC_Casefold then diacritics
    # (reference src/core/filters_builtin.c:53-76)
    assert normalize_token("Café") == "cafe"
    assert normalize_token("STRASSE") == "strasse"
    assert normalize_token("naïve") == "naive"


def test_default_ignorable_removed():
    # NFKC_Casefold removes Default_Ignorable code points (soft hyphen, ZWSP)
    assert nfkc_casefold("soft­hyphen") == "softhyphen"
    assert nfkc_casefold("zero​width") == "zerowidth"
