"""Golden tests for EN/ZH/JA text normalization (SURVEY §2.3.1 frontend row:
the reference engine shipped ttsfrd-class TN; round-1 gap VERDICT#3; JA
added per round-3 VERDICT #8 — language tags at /root/reference/basic.py:13
include <|jp|> and the README claims EN/ZH/JA)."""

import pytest

from autostyle_tts_tpu.models.textnorm import (
    normalize_en, normalize_ja, normalize_zh, num_to_words_en,
    num_to_words_ja, num_to_words_zh, ordinal_to_words_en, year_to_words_en,
)


@pytest.mark.parametrize("n,w", [
    (0, "zero"), (7, "seven"), (13, "thirteen"), (20, "twenty"),
    (21, "twenty-one"), (99, "ninety-nine"), (100, "one hundred"),
    (101, "one hundred one"), (123, "one hundred twenty-three"),
    (1000, "one thousand"), (1234, "one thousand two hundred thirty-four"),
    (1000000, "one million"),
    (2500013, "two million five hundred thousand thirteen"),
    (-5, "minus five"),
])
def test_num_to_words_en(n, w):
    assert num_to_words_en(n) == w


@pytest.mark.parametrize("n,w", [
    (1, "first"), (2, "second"), (3, "third"), (4, "fourth"), (5, "fifth"),
    (9, "ninth"), (12, "twelfth"), (20, "twentieth"), (21, "twenty-first"),
    (32, "thirty-second"), (100, "one hundredth"), (103, "one hundred third"),
])
def test_ordinal_en(n, w):
    assert ordinal_to_words_en(n) == w


@pytest.mark.parametrize("n,w", [
    (1999, "nineteen ninety-nine"), (2024, "twenty twenty-four"),
    (2005, "two thousand five"), (1900, "nineteen hundred"),
    (1805, "eighteen oh five"),
])
def test_year_en(n, w):
    assert year_to_words_en(n) == w


@pytest.mark.parametrize("src,dst", [
    ("I have 123 apples.", "I have one hundred twenty-three apples."),
    ("It costs $5.20 now.", "It costs five dollars twenty cents now."),
    ("$1 only", "one dollar only"),
    ("45% done", "forty-five percent done"),
    ("the 3rd time", "the third time"),
    ("meet at 3:30 pm", "meet at three thirty pm"),
    ("meet at 12:05", "meet at twelve oh five"),
    ("at 9:00 sharp", "at nine o'clock sharp"),
    ("pi is 3.14", "pi is three point one four"),
    ("born in 1987", "born in nineteen eighty-seven"),
    ("the 1990s were wild", "the nineteen nineties were wild"),
    ("Dr. Smith lives on St. James Ave.",
     "doctor Smith lives on saint James avenue"),
    ("call 5551234567 now", "call five five five one two three four five six"
     " seven now"),
    ("No. 7 wins", "number seven wins"),
    ("1,234 items", "one thousand two hundred thirty-four items"),
    ("e.g. cats vs. dogs", "for example cats versus dogs"),
])
def test_normalize_en_golden(src, dst):
    assert normalize_en(src) == dst


@pytest.mark.parametrize("n,w", [
    (0, "零"), (5, "五"), (10, "十"), (14, "十四"), (20, "二十"),
    (105, "一百零五"), (123, "一百二十三"), (1000, "一千"),
    (1001, "一千零一"), (10000, "一万"), (10500, "一万零五百"),
    (123456789, "一亿二千三百四十五万六千七百八十九"),
    # 4th group (10^12) and the digit-wise overflow guard: comma-grouped
    # trillions bypass the 7-digit digit-wise regex, so num_to_words_zh
    # must handle them rather than raise (review finding: _ZH_GROUPS
    # stopped at 亿, so 10^12 crashed with IndexError mid-request)
    (10 ** 12, "一万亿"),
    (10 ** 16, "一" + "零" * 16),
])
def test_num_to_words_zh(n, w):
    assert num_to_words_zh(n) == w


@pytest.mark.parametrize("src,dst", [
    ("我有123个苹果", "我有一百二十三个苹果"),
    ("2024年5月3日", "二零二四年五月三日"),
    ("现在是3:30", "现在是三点三十分"),
    ("现在是3:05", "现在是三点零五分"),
    ("涨了45%", "涨了百分之四十五"),
    ("价格是3.14", "价格是三点一四"),
    ("¥250", "二百五十元"),
    ("总共100元", "总共一百元"),
    ("电话13812345678", "电话一三八一二三四五六七八"),
])
def test_normalize_zh_golden(src, dst):
    assert normalize_zh(src) == dst


@pytest.mark.parametrize("n,w", [
    (0, "ゼロ"), (5, "五"), (10, "十"), (11, "十一"), (20, "二十"),
    # JA drops the interior zero marker and the leading 一 before 十/百/千
    # (the two readings the ZH rules get wrong: 一百零五 / 一百 / 一千)
    (100, "百"), (105, "百五"), (123, "百二十三"), (1000, "千"),
    (1001, "千一"), (10000, "一万"), (10005, "一万五"),
    (10500, "一万五百"), (2024, "二千二十四"),
    (100000000, "一億"), (123456789, "一億二千三百四十五万六千七百八十九"),
    # the 一 before 千 is kept inside 万/億/兆 groups (一千万, not 千万) —
    # only the ones group drops it (1000 = 千)
    (10 ** 7, "一千万"), (10 ** 11, "一千億"),
    # 4th group (兆) and the digit-wise overflow guard (review finding:
    # _JA_GROUPS stopped at 億, so '1,000,000,000,000円' crashed with
    # IndexError mid-request)
    (10 ** 12, "一兆"), (10 ** 16, "一" + "〇" * 16),
])
def test_num_to_words_ja(n, w):
    assert num_to_words_ja(n) == w


@pytest.mark.parametrize("src,dst", [
    ("1,000,000,000,000円", "一兆円"),
])
def test_normalize_ja_large_currency(src, dst):
    assert normalize_ja(src) == dst


@pytest.mark.parametrize("src,dst", [
    ("りんごが123個あります", "りんごが百二十三個あります"),
    # years read as CARDINALS (二千二十四年), not digit-wise like ZH
    ("2024年5月3日", "二千二十四年五月三日"),
    # clock readings use 時, not the ZH 点
    ("今は3:30です", "今は三時三十分です"),
    ("今は3:05です", "今は三時五分です"),
    ("45%上がった", "四十五パーセント上がった"),
    ("3.14です", "三点一四です"),
    ("¥250", "二百五十円"),
    ("全部で100円", "全部で百円"),
    ("電話は0312345678", "電話は〇三一二三四五六七八"),
])
def test_normalize_ja_golden(src, dst):
    assert normalize_ja(src) == dst


def test_ja_dispatch_via_frontend():
    """The frontend's <|jp|> tag / kana detection must route to the JA
    rules (round-3 VERDICT #8: JA previously fell through to ZH)."""
    from autostyle_tts_tpu.models.frontend import detect_language, normalize
    from autostyle_tts_tpu.models.textnorm import normalize_numbers

    assert detect_language("こんにちは") == "jp"
    assert normalize_numbers("3:30", "jp") == "三時三十分"
    assert normalize_numbers("3:30", "ja") == "三時三十分"
    out = normalize("<|jp|>今は3:30です", numbers=True)
    assert "三時三十分" in out


def test_en_abbrev_requires_word_boundary():
    """Abbreviation keys must not fire inside ordinary words (round-2 review
    finding: 'first.' -> 'firsaint', 'grammar.' -> 'grammarch')."""
    from autostyle_tts_tpu.models.textnorm import normalize_en

    assert normalize_en("He came first.") == "He came first."
    assert normalize_en("Check the grammar.") == "Check the grammar."
    assert normalize_en("It was just.") == "It was just."
    assert normalize_en("Some items.") == "Some items."
    # real abbreviations still expand, including sentence-initially
    assert normalize_en("Dr. Smith on St. Mary Ave.") == \
        "doctor Smith on saint Mary avenue"
    assert normalize_en("mar. was cold") == "march was cold"


def test_sentence_final_ordinals_not_mangled():
    # round-2 ADVICE #2: the abbreviation guard must exclude digits too,
    # or '21st.' becomes '21saint' before the ordinal rule ever runs
    assert normalize_en("He finished 21st.") == "He finished twenty-first."
    assert normalize_en("3rd.") == "third."
    # letter-boundary behaviour unchanged
    assert normalize_en("Dr. Smith on St. Mary Ave.") == \
        "doctor Smith on saint Mary avenue"
