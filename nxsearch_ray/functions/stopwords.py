"""Stopword dictionaries.

The reference loads NLTK stopword lists fetched by tools/fetch_ext_data.sh
(reference: tools/fetch_ext_data.sh:24-52 downloads the public NLTK
``stopwords`` package and renames ``english``→``en`` etc.), then loads them
one word per line into per-language hashmaps at library init
(reference: src/core/filters_builtin.c:91-145).  Only ``en`` is registered
(``stopword_langs[] = { "en" }``, src/core/filters_builtin.c:89); any other
language gets a pass-through dummy (src/core/filters_builtin.c:167-180).

The English list below is the public NLTK ``stopwords/english`` word list,
embedded verbatim (no network access in this environment).
"""

from __future__ import annotations

# NLTK stopwords corpus, file `english` (public domain word list).
_EN = """i me my myself we our ours ourselves you you're you've you'll you'd
your yours yourself yourselves he him his himself she she's her hers herself
it it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had having
do does did doing a an the and but if or because as until while of at by for
with about against between into through during before after above below to
from up down in out on off over under again further then once here there when
where why how all any both each few more most other some such no nor not only
own same so than too very s t can will just don don't should should've now d
ll m o re ve y ain aren aren't couldn couldn't didn didn't doesn doesn't hadn
hadn't hasn hasn't haven haven't isn isn't ma mightn mightn't mustn mustn't
needn needn't shan shan't shouldn shouldn't wasn wasn't weren weren't won
won't wouldn wouldn't"""

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(_EN.split()),
}

# Languages with a registered dictionary, mirroring stopword_langs[]
# (reference src/core/filters_builtin.c:89).  Other langs pass through.
STOPWORD_LANGS = tuple(STOPWORDS)


def get_stopwords(lang: str) -> frozenset[str] | None:
    """Per-language stopword set, or None (pass-through) when the language
    has no dictionary — mirrors stopwords_create returning DUMMY_PTR
    (reference src/core/filters_builtin.c:167-180)."""
    return STOPWORDS.get(lang)
