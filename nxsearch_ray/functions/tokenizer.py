"""Word tokenizer + tokenset, reproducing the reference semantics.

The reference tokenizes with ICU ``UBRK_WORD`` segmentation (UAX #29),
skipping ``UBRK_WORD_NONE`` runs (punctuation/space), and pushes every word
through the filter pipeline before adding it to an order-preserving,
counting token set (reference: src/core/tokenizer.c:234-302 `tokenize`,
src/core/tokenizer.c:94-117 `tokenset_add`).

PyICU is unavailable here, so word segmentation is expressed as a Unicode
regex implementing the UAX #29 word-boundary subset the corpus exercises:

  * words are runs of letters / digits / marks / connector punctuation
    (ExtendNumLet, e.g. ``_`` — keeps ``hello_i_m_arbitrary_concatenated``
    whole, t_tokenize.c test_case_3);
  * MidLetter / MidNumLet / Single_Quote single occurrences (``'``,
    ``’``, ``.``, ``:``, ``·``) join word chars (``i.b.m``,
    ``doesn't`` — t_tokenize.c test_case_2/5; UAX#29 WB6/WB7);
  * MidNum / MidNumLet / Single_Quote (``,``, ``.``, ``;``, ``'``,
    ``’``) joins digits (``3,500.12``, ``1'000`` stay one token;
    UAX#29 WB11/WB12);
  * everything else breaks (``one;two;three`` → three tokens,
    t_tokenize.c test_case_5).

Behavior is pinned by fixtures from reference src/tests/t_tokenize.c:22-80
(including matching *shipped* behavior, not the documented-aspirational
``test_case_not_passing`` at t_tokenize.c:66-69).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import regex

# One word-character class: letters, digits, combining marks, connector
# punctuation (underscore et al. = UAX#29 ExtendNumLet).
_W = r"[\p{L}\p{N}\p{M}\p{Pc}]"
_TOKEN_RE = regex.compile(
    rf"{_W}+(?:(?:['’.:·](?=\p{{L}})|[.,;'’](?=\p{{N}})){_W}+)*",
    regex.V1,
)


def segment_words(text: str) -> list[str]:
    """ICU UBRK_WORD-equivalent segmentation: the word runs only
    (UBRK_WORD_NONE runs are skipped, reference src/core/tokenizer.c:280-282)."""
    return _TOKEN_RE.findall(text)


@dataclass
class TokenSet:
    """Order-preserving unique-token set with counts — the reference's
    ``tokenset_t`` (src/core/tokenizer.h:36-55, src/core/tokenizer.c:94-117).

    ``seen`` counts every added token including repeats (→ ``doc_len`` in
    the dtmap, reference src/index/storage.h:86-88); ``counts`` preserves
    first-seen insertion order like the TAILQ + hashmap combo.
    """

    counts: dict[str, int] = field(default_factory=dict)
    seen: int = 0
    data_len: int = 0

    def add(self, value: str) -> None:
        self.seen += 1
        if value in self.counts:
            self.counts[value] += 1
        else:
            self.counts[value] = 1
            self.data_len += len(value.encode("utf-8"))

    @property
    def count(self) -> int:
        return len(self.counts)

    def tokens(self) -> list[str]:
        return list(self.counts)


def tokenize(text: str, pipeline) -> tuple[TokenSet, list[str]]:
    """Segment ``text`` and run every word through ``pipeline``
    (a ``FilterPipeline``), like the reference ``tokenize`` →
    ``tokenize_value`` loop (src/core/tokenizer.c:204-229, 234-302).

    Returns ``(tokenset, sequence)`` where ``sequence`` is the canonical
    token stream in document order *including repeats* — the reference only
    needs the bag (tokenset), but shingling needs the ordered sequence.
    Discarded tokens (stopwords, emptied buffers) are omitted from both,
    exactly like FILT_DISCARD (src/core/tokenizer.c:215-223).
    """
    tset = TokenSet()
    seq: list[str] = []
    for word in _TOKEN_RE.findall(text):
        out = pipeline.run(word)
        if out is None:  # DISCARD (or ERROR → token dropped)
            continue
        tset.add(out)
        seq.append(out)
    return tset, seq
