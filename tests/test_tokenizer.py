import pytest

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.analysis.tokenizer import standard_analyze, tokenize


@pytest.mark.parametrize(
    "inp,want",
    [
        (
            "The quick brown-fox can't jump 3.14 meters, right?",
            ["the", "quick", "brown", "fox", "can't", "jump", "3.14", "meters", "right"],
        ),
        ("john.doe@example.com", ["john.doe", "example.com"]),
        ("state-of-the-art", ["state", "of", "the", "art"]),
        ("1,000,000 items", ["1,000,000", "items"]),
        ("foo_bar baz_", ["foo_bar", "baz_"]),
        ("", []),
        ("a:b c;d", ["a:b", "c", "d"]),
    ],
)
def test_standard_analyze(inp, want):
    assert standard_analyze(inp) == want


def test_max_token_length_split():
    long = "x" * 600
    toks = tokenize(long)
    assert [len(t) for t in toks] == [255, 255, 90]


def test_stop_analyzer_position_gaps():
    terms, pos = get_analyzer("stop")("The quick and the dead")
    assert terms == ["quick", "dead"]
    assert pos == [1, 4]


def test_registry_analyzers():
    assert get_analyzer("whitespace")("A b")[0] == ["A", "b"]
    assert get_analyzer("simple")("ab3cd EF")[0] == ["ab", "cd", "ef"]
    assert get_analyzer("keyword")("One Two")[0] == ["One Two"]
    with pytest.raises(ValueError):
        get_analyzer("nope")


# ---------------------------------------------------------------- full UAX#29
# Mixed-script goldens for the full word-break path (Lucene StandardTokenizer
# semantics: Han/Hiragana single-char tokens, Katakana runs, SEA-script runs,
# Extend/Format attachment, property-class Mid* joining).
@pytest.mark.parametrize(
    "inp,want",
    [
        # Han ideographs: one token per character (IDEOGRAPHIC)
        ("数据处理系统", ["数", "据", "处", "理", "系", "统"]),
        # Hiragana: one token per character; Katakana: maximal runs
        ("ひらがな", ["ひ", "ら", "が", "な"]),
        ("アメリカ横断 ウルトラクイズ", ["アメリカ", "横", "断", "ウルトラクイズ"]),
        # halfwidth katakana incl. voiced-sound marks is a Katakana run
        ("ﾊﾞｲﾄ ok", ["ﾊﾞｲﾄ", "ok"]),
        # prolonged-sound mark U+30FC has WB=Katakana
        ("データー", ["データー"]),
        # Hangul syllables are ALetter → word runs
        ("한국어 처리 시스템", ["한국어", "처리", "시스템"]),
        # Thai/Lao/Khmer/Myanmar: maximal script runs (SOUTHEAST_ASIAN)
        ("สวัสดีครับ ไทย", ["สวัสดีครับ", "ไทย"]),
        # combining marks (WB=Extend) attach and stay in the token text
        ("école", ["école"]),
        # ZWJ/format chars attach (WB4)
        ("x‍y", ["x‍y"]),
        # Arabic / Hebrew / Cyrillic words
        ("مرحبا بالعالم", ["مرحبا", "بالعالم"]),
        ("שלום עולם", ["שלום", "עולם"]),
        ("Привет, мир", ["Привет", "мир"]),
        # Hebrew geresh/gershayim (ALetter / Mid via property classes)
        ("צה״ל", ["צה״ל"]),
        # Latin and Han break at the script boundary (WB999)
        ("foo中bar", ["foo", "中", "bar"]),
        # ExtendNumLet bridges word↔katakana (WB13a/WB13b)
        ("abc_カタ", ["abc_カタ"]),
        ("abcカタ", ["abc", "カタ"]),
        # fullwidth Latin/digits are ALetter/Numeric word chars
        ("１２３ Ａｂｃ", ["１２３", "Ａｂｃ"]),
        # whitespace-separated ideographs stay separate at tokenizer level
        ("数 据", ["数", "据"]),
    ],
)
def test_uax29_full_path(inp, want):
    assert tokenize(inp) == want


def test_fast_path_consistency():
    """Texts routed to the fast re path must tokenize identically under the
    full UAX#29 pattern (the dispatch invariant)."""
    from elasticsearch_ray.analysis.tokenizer import TOKEN_FULL_RE, TOKEN_RE, needs_full

    samples = [
        "the quick brown fox 1,000,000 u.s.a. don't a:b john.doe",
        "l'étincelle jointures données qu'elle rapide",
        "zusammenführung größe bäume ströme",
        "consultas número rápidas búsqueda",
        "Привет, мир — тест 3.14 x:y",
        "foo_bar _lead trail_ 0xdead 42",
    ]
    for text in samples:
        assert text.isascii() or not needs_full(text), text
        assert TOKEN_RE.findall(text) == TOKEN_FULL_RE.findall(text), text


def test_needs_full_dispatch():
    from elasticsearch_ray.analysis.tokenizer import needs_full

    # CJK, SEA, combining marks, format chars → full path
    for t in ["数据", "ア", "ครับ", "é", "x‍y"]:
        assert needs_full(t), t
    # precomposed Latin/Cyrillic and the legacy mid chars stay fast
    for t in ["école", "мир", "a·b", "don’t", "١٬٠٠٠"]:
        assert t.isascii() or not needs_full(t), t


def test_cjk_analyzer_bigrams_across_tokens():
    """CJKBigramFilter buffers consecutive CJK tokens: single-char Han tokens
    bigram together; an isolated ideograph is a unigram; Katakana/Hangul runs
    bigram too (default han|hiragana|katakana|hangul flags)."""
    from elasticsearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("cjk")
    assert an("数据处理")[0] == ["数据", "据处", "处理"]
    assert an("搜索 engine 中")[0] == ["搜索", "engine", "中"]
    assert an("한국어")[0] == ["한국", "국어"]
    assert an("ウルトラ")[0] == ["ウル", "ルト", "トラ"]
    # adjacency (not whitespace) drives buffering, like the reference filter
    assert an("数 据")[0] == ["数据"]


def test_diverge_table_matches_regex():
    """The embedded range table must agree with the authoritative
    property-class regex on a codepoint sample (guards Unicode-table drift)."""
    from elasticsearch_ray.analysis.tokenizer import _NEEDS_FULL, needs_full

    for i in list(range(0, 0x3200, 7)) + list(range(0x3200, 0x110000, 997)):
        if 0xD800 <= i <= 0xDFFF:
            continue
        c = chr(i)
        assert needs_full(c) == (_NEEDS_FULL.match(c) is not None), hex(i)
