"""Adversarial ICU-parity fixtures (VERDICT r02 missing #1 / next #6).

The reference's canonicalization is ICU (src/utils/utf8.c:30-31,
268-325: NFKC_Casefold; UBRK_WORD tokenization src/core/tokenizer.c:
234-302).  PyICU is uninstallable here, so the repo implements
pure-Python equivalents; these fixtures pin their behavior on the
adversarial classes the round-2 verdict called out — full-width forms,
NFKC_CF iteration chains, combining-mark stacks, Hangul/Devanagari
composition, and UAX#29 mid-word punctuation — with expectations
hand-derived from the published Unicode data files
(DerivedNormalizationProps NFKC_CF, CaseFolding.txt F/C entries,
WordBreakProperty.txt, CLDR Latin-ASCII.xml).

Knowingly-divergent cases are pinned at the bottom EXACTLY like the
reference documents its own broken tokenizer case
(src/tests/t_tokenize.c:66-69 test_case_not_passing): the divergence
is asserted, so a silent behavior change still fails the suite.
"""

import pytest

from nxsearch_ray.functions.tokenizer import segment_words
from nxsearch_ray.functions.unicode import (
    nfkc_casefold,
    normalize_token,
    strip_diacritics,
)

# ------------------------------------------------------------------
# NFKC_Casefold — full-width / ligature / iteration-chain classes
# (expected values from DerivedNormalizationProps.txt NFKC_CF and
# CaseFolding.txt; the "ﬁⅨ①ẛ" class the verdict named)

NFKC_CF_CASES = [
    # full-width / half-width forms
    ("ＡＢＣ１２３", "abc123"),
    ("ＨｅｌｌｏＷｏｒｌｄ", "helloworld"),
    ("ﾊﾝｶｸｶﾅ", "ハンカクカナ"),           # half-width katakana → full
    ("２０２４年", "2024年"),
    # ligatures (compat decomposition + casefold)
    ("ﬀ", "ff"), ("ﬁ", "fi"), ("ﬂ", "fl"), ("ﬃ", "ffi"),
    ("ﬅ", "st"), ("ſt", "st"),              # long s casefolds to s
    ("Ǆ", "dž"),                            # DŽ digraph → d + ž
    ("ǳ", "dz"),
    # enclosed / squared / roman-numeral forms
    ("Ⅸ", "ix"), ("Ⅻ", "xii"), ("①", "1"), ("⑴", "(1)"),
    ("㎞", "km"), ("㎢", "km2"),            # recursive compat (² → 2)
    ("㍿", "株式会社"),
    ("№5", "no5"),
    ("Ⓚ", "k"),
    # iteration chains (casefold→NFKC not idempotent in one pass)
    ("ẛ", "ṡ"),                             # long s with dot above
    ("ẛ̣", "ṩ"),                             # + dot below: composes after fold
    ("İ", "i̇"),                            # dotted I → i + U+0307 (F entry)
    ("ΣΊΣΥΦΟΣ", "σίσυφοσ"),                 # final sigma folds to σ
    ("ᾼ", "αι"),                            # prosgegrammeni → iota
    ("ẞ", "ss"), ("ß", "ss"),
    # fractions / super-/subscripts
    ("½", "1⁄2"),                           # FRACTION SLASH, not '/'
    ("x²y₃", "x2y3"),
    # default ignorables removed (soft hyphen, ZWSP, ZWJ, word joiner)
    ("a­b​c‍d⁠e", "abcde"),
    # Arabic presentation forms (Forms-A/B → base letters; the
    # word-ligatures expand to full phrases, U+FDFA even with spaces)
    ("ﻻ", "لا"),                            # lam-alef ligature
    ("ﷲ", "الله"),                          # Allah ligature
    ("ﷺ", "صلى الله عليه وسلم"),
    ("﷼", "ریال"),                          # rial sign
    ("ﭐ", "ٱ"),                             # alef wasla isolated form
    ("ﱠ", " َّ"),                            # shadda+fatha lig → space+marks
    ("ﴀ", "حي"),                            # initial-form word ligature
    ("ﬡ", "א"),                             # Hebrew wide alef
    # enclosed / squared CJK and era names
    ("㏒2", "log2"),
    ("㋿", "令和"),                          # Reiwa era square
    ("㊀", "一"),
    ("︽test︾", "《test》"),                # vertical forms → canonical
    ("Ｔｅｓｔ！", "test!"),
    # kana voicing marks compose (NFC step); both scripts stable
    ("ゔ", "ゔ"), ("ヴ", "ヴ"), ("が", "が"),
    # CJK compatibility ideograph → unified ideograph (singleton
    # canonical decomposition, U+F900 → U+8C48)
    ("豈", "豈"),
    # parenthesized / squared / telegraph forms
    ("㈱", "(株)"), ("℡", "tel"), ("™", "tm"), ("㍻", "平成"),
    ("⒈", "1."),                            # digit + full stop
    # half-width katakana + voicing mark composes after width fold
    ("ｶﾞ", "ガ"),
    ("ﬄ", "ffl"), ("Ĳ", "ij"),
    ("ŉ", "ʼn"),                            # U+0149 → U+02BC + n
    ("Ϊ́", "ΐ"),                       # Greek stack recomposes
]


@pytest.mark.parametrize("src,want", NFKC_CF_CASES,
                         ids=[repr(c[0]) for c in NFKC_CF_CASES])
def test_nfkc_casefold_parity(src, want):
    assert nfkc_casefold(src) == want


# ------------------------------------------------------------------
# combining-mark stacks: canonical reordering + composition

def test_combining_stack_order_independent():
    # ogonek (ccc 202) + acute (ccc 230) in both input orders must
    # canonically reorder to the same composed form
    a1 = nfkc_casefold("ą́")
    a2 = nfkc_casefold("ą́")
    assert a1 == a2 == "ą́"        # ą + combining acute


def test_composed_equals_decomposed():
    assert nfkc_casefold("café") == nfkc_casefold("café")
    assert nfkc_casefold("ế") == nfkc_casefold("ế")


def test_hangul_jamo_composition():
    # conjoining jamo compose to the syllable (NFC step of NFKC)
    assert nfkc_casefold("한") == "한"   # 한


def test_devanagari_composition_exclusion():
    # U+0958 QA is composition-excluded: normalizes to KA + NUKTA and
    # must NOT recompose
    out = nfkc_casefold("क़")
    assert out == "क़"
    assert len(out) == 2


def test_stack_strip_diacritics():
    # the transliterator chain removes the WHOLE mark stack
    assert strip_diacritics("ą́") == "a"
    assert strip_diacritics("Ǻ") == "A"     # Å with acute → A
    assert strip_diacritics("Việt Nam") == "Viet Nam"
    assert strip_diacritics("Ångström") == "Angstrom"
    assert strip_diacritics("й") == "и"          # breve is Mn; Cyrillic kept
    assert strip_diacritics("άέή") == "αεη"
    assert normalize_token("Ǻ") == "a"


# ------------------------------------------------------------------
# UAX#29 word segmentation — mid-word punctuation corpus
# (WordBreakProperty.txt: MidLetter {: · '}, MidNumLet {. '},
#  MidNum {, ;}, Single_Quote {'}, ExtendNumLet {_})

SEGMENT_CASES = [
    # MidLetter / MidNumLet / Single_Quote between letters (WB6/7)
    ("don't stop", ["don't", "stop"]),
    ("l’école", ["l’école"]),
    ("a·b c", ["a·b", "c"]),                 # middle dot MidLetter
    ("fin:de:siècle", ["fin:de:siècle"]),    # colon MidLetter
    ("i.b.m. rules", ["i.b.m", "rules"]),    # trailing dot breaks
    # quote NOT flanked by letters on both sides breaks (WB6 needs
    # a following letter; leading/trailing quotes never join)
    ("rock 'n' roll", ["rock", "n", "roll"]),
    ("'tis so", ["tis", "so"]),
    ("says ''", ["says"]),
    # MidNum / MidNumLet / Single_Quote between digits (WB11/12)
    ("3,500.12", ["3,500.12"]),
    ("1'000'000", ["1'000'000"]),            # Swiss thousands quote
    ("3;4", ["3;4"]),                        # semicolon is MidNum
    ("v1.2.3", ["v1.2.3"]),
    # double punctuation always breaks (no Numeric between)
    ("1..2", ["1", "2"]),
    ("a..b", ["a", "b"]),
    ("x''y", ["x", "y"]),
    # ExtendNumLet joins everything it touches (WB13a/13b)
    ("snake_case_2024", ["snake_case_2024"]),
    ("_lead tail_", ["_lead", "tail_"]),
    # marks extend the word (WB4: Extend glues)
    ("cafés", ["cafés"]),
    ("नमस्ते दुनिया", ["नमस्ते", "दुनिया"]),
    # everything else breaks
    ("one;two;three", ["one", "two", "three"]),
    ("[client] <foo> *bold*", ["client", "foo", "bold"]),
    ("x+y=z", ["x", "y", "z"]),
    ("€5 #tag @user", ["5", "tag", "user"]),
    # real-text multilingual parity (space-delimited scripts agree
    # with ICU UBRK_WORD exactly: marks/viramas glue via WB4)
    ("한국어 텍스트 처리", ["한국어", "텍스트", "처리"]),
    ("इस शब्द का अर्थ", ["इस", "शब्द", "का", "अर्थ"]),
    ("தமிழ் மொழி", ["தமிழ்", "மொழி"]),
    ("বাংলা ভাষা", ["বাংলা", "ভাষা"]),
    ("العربية لغة جميلة", ["العربية", "لغة", "جميلة"]),
    # fully-vocalized Arabic: harakat are Extend, one token
    ("اَلْعَرَبِيَّةُ", ["اَلْعَرَبِيَّةُ"]),
    # Hebrew with niqqud: points are Extend, one token per word
    ("שָׁלוֹם עוֹלָם", ["שָׁלוֹם", "עוֹלָם"]),
    ("русский язык тест", ["русский", "язык", "тест"]),
    ("ελληνικά κείμενα", ["ελληνικά", "κείμενα"]),
    ("Tiếng Việt rất hay", ["Tiếng", "Việt", "rất", "hay"]),
    # katakana middle dot (U+30FB) breaks — matches ICU (it is not
    # MidLetter; WB13 joins Katakana×Katakana only across nothing)
    ("ウェブ・サイト", ["ウェブ", "サイト"]),
    # real-text space-delimited scripts, second wave: Perso-Arabic
    # (Urdu), Indic (Gujarati / Telugu / Kannada / Malayalam /
    # Sinhala — vowel signs and viramas are Extend/Mc and glue),
    # Ethiopic (U+1361 ETHIOPIC WORDSPACE is Po → breaks, same as
    # ICU), Cyrillic-extended (Kazakh), Sanskrit conjunct stacks
    ("اردو زبان ہے", ["اردو", "زبان", "ہے"]),
    ("ગુજરાતી ભાષા", ["ગુજરાતી", "ભાષા"]),
    ("తెలుగు భాష", ["తెలుగు", "భాష"]),
    ("ಕನ್ನಡ ಭಾಷೆ", ["ಕನ್ನಡ", "ಭಾಷೆ"]),
    ("മലയാളം ഭാഷ", ["മലയാളം", "ഭാഷ"]),
    ("සිංහල භාෂාව", ["සිංහල", "භාෂාව"]),
    ("ሰላም ለዓለም", ["ሰላም", "ለዓለም"]),
    ("ክፍል፡ሁለት", ["ክፍል", "ሁለት"]),
    ("қазақ тілі", ["қазақ", "тілі"]),
    ("संस्कृतम् भाषा क्षेत्रज्ञः", ["संस्कृतम्", "भाषा", "क्षेत्रज्ञः"]),
    # Arabic tatweel (U+0640, Lm — a word character for ICU too):
    # elongated words stay ONE token
    ("العــربية", ["العــربية"]),
    # --- CJK second pass (UAX#29 defaults; ICU's CJ *dictionary*
    # merging remains the pinned divergence below).  Han / Hiragana
    # have no word-break class → singleton tokens (WB999, also Lucene
    # StandardTokenizer's CJK unigram rule); Katakana runs join (WB13).
    ("日本語のテキストです", ["日", "本", "語", "の", "テキスト", "で", "す"]),
    ("中文分词很难", ["中", "文", "分", "词", "很", "难"]),
    ("ひらがなとカタカナ", ["ひ", "ら", "が", "な", "と", "カタカナ"]),
    ("漢字かな交じり文", ["漢", "字", "か", "な", "交", "じ", "り", "文"]),
    # script boundaries break; Latin segment keeps its own rules
    ("日本語とEnglish混在", ["日", "本", "語", "と", "English", "混", "在"]),
    ("321万円です", ["321", "万", "円", "で", "す"]),
    ("ミスターDonald’s", ["ミスター", "Donald’s"]),
    ("カタカナ・ワープロ", ["カタカナ", "ワープロ"]),   # U+30FB breaks (Po)
    # prolonged-sound mark U+30FC is Word_Break=Katakana: joins runs,
    # but breaks from hiragana (らーめん: ら | ー | め | ん)
    ("スーパーマーケット", ["スーパーマーケット"]),
    ("らーめん", ["ら", "ー", "め", "ん"]),
    # half-width katakana incl. voicing marks U+FF9E/FF9F stay one run
    ("ｶﾞｷﾞｸﾞ ﾃﾞｰﾀ", ["ｶﾞｷﾞｸﾞ", "ﾃﾞｰﾀ"]),
    # small-kana phonetic extensions (U+31F0..) are Katakana
    ("アイヌㇰㇱ", ["アイヌㇰㇱ"]),
    # combining marks glue to the preceding CJK char (WB4)
    ("がき", ["が", "き"]),
    # iteration marks: 々 (Han, Lm) and ゝ/ヽ each singleton/run-join
    ("人々", ["人", "々"]),
    ("こゝろ", ["こ", "ゝ", "ろ"]),
    # a joiner orphaned by a CJK split is dropped, same as ICU
    ("日本,5", ["日", "本", "5"]),
    ("a.日", ["a", "日"]),
    ("第1回テスト", ["第", "1", "回", "テスト"]),
    # CJK compatibility ideographs (U+F900 block) are Han
    ("豈更", ["豈", "更"]),
    # Supplementary-plane Han (SIP, U+20000+) are Han singletons
    ("\U00020000大", ["\U00020000", "大"]),
    # Hangul is ALetter (NOT dictionary-segmented): words stay whole —
    # guards the HANH range against swallowing U+AC00-D7AF
    ("한국어와日本語", ["한국어와", "日", "本", "語"]),
    # Bopomofo is ALetter in UAX#29 (not part of the CJK second pass)
    ("ㄅㄆㄇㄈ注音", ["ㄅㄆㄇㄈ", "注", "音"]),
    # fullwidth Latin/digits (U+FF21..) are ALetter/Numeric, not CJK
    ("Ｆｕｌｌ１２３", ["Ｆｕｌｌ１２３"]),
]


@pytest.mark.parametrize("text,want", SEGMENT_CASES,
                         ids=[repr(c[0]) for c in SEGMENT_CASES])
def test_segment_words_parity(text, want):
    assert segment_words(text) == want


# ------------------------------------------------------------------
# KNOWN DIVERGENCES vs stock ICU, pinned on purpose (the reference
# pins its own broken case the same way, t_tokenize.c:66-69).

def test_divergence_zwj_inside_word():
    """ICU treats ZWJ (Word_Break=Extend/ZWJ) as transparent inside a
    word → one token "xy" after normalization removes it.  The regex
    segmenter breaks on it (Cf is not in the word class).  Pinned: a
    silent change in either direction fails here."""
    assert segment_words("x‍y") == ["x", "y"]


def test_divergence_one_sided_mid_context():
    """UAX#29 requires the SAME class on both sides of a mid-word
    joiner (letters for WB6/7, digits for WB11/12); the DuckDB oracle
    twin is RE2 (no lookbehind), so the engine and the SQL regex both
    implement the one-sided (right-context) rule and this divergence
    is accepted for engine/oracle identity.  ICU would split these."""
    assert segment_words("1.a") == ["1.a"]       # ICU: ["1", "a"]
    assert segment_words("2019’s") == ["2019’s"]  # ICU: ["2019", "s"]
    assert segment_words("a,1") == ["a,1"]       # ICU: ["a", "1"]
    assert segment_words("a_·b") == ["a_·b"]     # ICU: ["a_", "b"]
    # (WB6's left side must be AHLetter; ExtendNumLet '_' is not)


def test_divergence_mark_before_joiner():
    """A combining mark immediately before a mid-word joiner: ICU's
    WB4 makes Extend transparent, so the joiner still sees a letter on
    its left; the one-sided rule here never looks left at all, so the
    token still joins — same RESULT as ICU for this shape, pinned so a
    regression is loud."""
    assert segment_words("café's x") == ["café's", "x"]


def test_divergence_cjk_dictionary_segmentation():
    """ICU's UBRK_WORD runs a DICTIONARY segmenter for Han / Kana /
    Thai (unspaced scripts): \u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u3067\u3059 \u2192 \u65e5\u672c\u8a9e/\u306e/\u30c6\u30ad\u30b9\u30c8/\u3067\u3059.
    The second-pass segmenter implements the plain-UAX#29 defaults
    instead (Han/Hiragana unigrams, Katakana runs \u2014 the Lucene
    StandardTokenizer rule; positive cases in SEGMENT_CASES above), so
    vs ICU the remaining divergence is the dictionary MERGE of adjacent
    unigrams into words \u2014 pinned here: ICU would emit the multi-char
    dictionary words on the left, we emit the unigram split."""
    # ICU: [\u65e5\u672c\u8a9e, \u306e, \u30c6\u30ad\u30b9\u30c8, \u3067\u3059]
    assert segment_words("\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u3067\u3059") == [
        "\u65e5", "\u672c", "\u8a9e", "\u306e", "\u30c6\u30ad\u30b9\u30c8", "\u3067", "\u3059"]
    # ICU: [\u4e2d\u6587, \u5206\u8bcd, \u5f88\u96be]
    assert segment_words("\u4e2d\u6587\u5206\u8bcd\u5f88\u96be") == list("\u4e2d\u6587\u5206\u8bcd\u5f88\u96be")


def test_divergence_thai_dictionary_segmentation():
    """Thai / Lao / Khmer / Myanmar are ICU dictionary scripts too, but
    they are NOT part of the CJK second pass: a pure-Python dictionary
    break is out of scope, and unigram-splitting an alphabetic script
    (unlike ideographic Han) would destroy shingling \u2014 so unspaced
    runs stay ONE token.  Pinned divergence (ICU emits words)."""
    assert segment_words("\u0e20\u0e32\u0e29\u0e32\u0e44\u0e17\u0e22\u0e44\u0e21\u0e48\u0e21\u0e35\u0e0a\u0e48\u0e2d\u0e07\u0e27\u0e48\u0e32\u0e07") == [
        "\u0e20\u0e32\u0e29\u0e32\u0e44\u0e17\u0e22\u0e44\u0e21\u0e48\u0e21\u0e35\u0e0a\u0e48\u0e2d\u0e07\u0e27\u0e48\u0e32\u0e07"]
    # Lao / Khmer / Burmese unspaced runs
    assert segment_words("\u0e9e\u0eb2\u0eaa\u0eb2\u0ea5\u0eb2\u0ea7") == ["\u0e9e\u0eb2\u0eaa\u0eb2\u0ea5\u0eb2\u0ea7"]
    assert segment_words("\u1797\u17b6\u179f\u17b6\u1781\u17d2\u1798\u17c2\u179a") == ["\u1797\u17b6\u179f\u17b6\u1781\u17d2\u1798\u17c2\u179a"]
    assert segment_words("\u1019\u103c\u1014\u103a\u1019\u102c\u1018\u102c\u101e\u102c") == ["\u1019\u103c\u1014\u103a\u1019\u102c\u1018\u102c\u101e\u102c"]


def test_divergence_persian_zwnj():
    """Persian compound verbs use ZWNJ (U+200C, Word_Break=Extend in
    ICU → transparent, ONE token می‌خواهم).  Same root cause as the
    ZWJ divergence above: Cf is not in the regex word class, so the
    segmenter splits at it.  Pinned — a silent change fails here."""
    assert segment_words("فارسی می‌خواهم") == ["فارسی", "می", "خواهم"]


def test_divergence_hebrew_geresh_gershayim():
    """ICU WB7a keeps a Hebrew letter + geresh (U+05F3) together and
    WB7b/c joins across gershayim (U+05F4) between Hebrew letters
    (abbreviations like מ״שהו).  The regex word class has no
    Hebrew_Letter special casing, so both split — pinned."""
    assert segment_words("ישראל׳s") == ["ישראל", "s"]   # ICU: ישראל׳ s
    assert segment_words("מ״שהו") == ["מ", "שהו"]        # ICU: מ״שהו


def test_multilingual_strip_diacritics():
    """Latin-ASCII-chain behavior on non-Latin scripts: harakat /
    niqqud are Mn and strip; Devanagari vowel signs + virama are ALSO
    Mn/Mc and strip (ICU's Latin-ASCII would leave Indic text alone —
    pinned divergence: this transliterator is only applied to
    search-normalized tokens, reference fp/lua filter parity)."""
    assert strip_diacritics("العَرَبِية") == "العربية"
    assert strip_diacritics("שָׁלוֹם") == "שלום"
    assert strip_diacritics("नमस्ते") == "नमसत"          # pinned
    assert strip_diacritics("ğüşıöç") == "gusioc"
    assert strip_diacritics("ḠṺṦ") == "GUS"


# ------------------------------------------------------------------
# Engine <-> DuckDB-oracle tokenizer lockstep: the SQL twin
# (__ray_entry__._sql_tokens) must produce EXACTLY segment_words on
# adversarial inputs, including the CJK second pass — this is the
# repo invariant that keeps every token-derived oracle hash-green.

LOCKSTEP_TEXTS = [
    "don't stop 3,500.12 i.b.m. snake_case_2024",
    "日本語のテキストです 中文分词很难",
    "ひらがなとカタカナ ウェブ・サイト",
    "321万円です 日本,5 a.日 ｶﾞｷﾞｸﾞ",
    "한국어 텍스트 l’école fin:de:siècle",
    "ภาษาไทย rock 'n' roll x''y 1..2",
    "豈更 \U00020000a スーパーマーケット",
    "人々 こゝろ ラーメン らーめん",
    "العربية русский नमस्ते",
    "第1回テスト 漢字かな交じり文",
    "ミスターDonald’s ㌅㍿",
    "", "・・・", "123 abc_def",
]


@pytest.mark.parametrize("text", LOCKSTEP_TEXTS,
                         ids=[ascii(t)[:40] for t in LOCKSTEP_TEXTS])
def test_engine_sql_tokenizer_lockstep(text):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as entry

    got_sql = duckdb.execute(
        f"select {entry._sql_tokens('?::VARCHAR')}", [text]).fetchone()[0]
    assert list(got_sql) == segment_words(text)
