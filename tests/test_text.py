"""EWTS transliteration + label encoder tests.

Round-trip and fixed-point tests over real Tibetan orthography, including
the classic ambiguities (prefix vs stack, dag vs dga') the converter must
resolve the way the EWTS spec does.
"""

import pytest

from ocr_inference_tpu.text import (
    Converter,
    StackEncoder,
    WylieEncoder,
    normalize_unicode,
    postprocess_wylie_label,
    preprocess_unicode,
    to_unicode,
    to_wylie,
    tokenize_in_stacks,
)

# (wylie, unicode) pairs covering the syllable grammar
PAIRS = [
    ("ka", "ཀ"),
    ("kha", "ཁ"),
    ("nga", "ང"),
    ("ki", "ཀི"),
    ("ku", "ཀུ"),
    ("ke", "ཀེ"),
    ("ko", "ཀོ"),
    ("kab", "ཀབ"),
    ("dag", "དག"),                       # 2 cons: root + suffix
    ("dga'", "དགའ"),                     # 3 cons: prefix + root + 'a suffix
    ("bdag", "བདག"),                     # prefix b
    ("rta", "རྟ"),                       # superscribed r
    ("lnga", "ལྔ"),                      # superscribed l
    ("ska", "སྐ"),                       # superscribed s
    ("kya", "ཀྱ"),                       # subscribed y
    ("kra", "ཀྲ"),                       # subscribed r
    ("kla", "ཀླ"),                       # subscribed l
    ("rgya", "རྒྱ"),                     # triple stack
    ("sgra", "སྒྲ"),
    ("bsgrubs", "བསྒྲུབས"),              # full prefix+stack+vowel+suffixes
    ("dbang", "དབང"),                    # d prefix + b root (not a stack)
    ("dbyangs", "དབྱངས"),                # d prefix + by stack
    ("g.yag", "གཡག"),                    # disambiguator
    ("gyag", "གྱག"),                     # vs subscribed y
    ("mkha'", "མཁའ"),
    ("'khor", "འཁོར"),
    ("ba'i", "བའི"),                     # vowel-bearing suffix unit
    ("bla", "བླ"),
    ("zla", "ཟླ"),
    ("lha", "ལྷ"),
    ("brtags", "བརྟགས"),                 # b prefix + rt stack + suffixes
    ("bskyed", "བསྐྱེད"),
    ("a", "ཨ"),
    ("i", "ཨི"),
    ("om", "ཨོམ"),
    ("khyod", "ཁྱོད"),
    ("thams", "ཐམས"),
    ("tshe", "ཚེ"),
    ("dzam", "ཛམ"),
    ("zhes", "ཞེས"),
    ("shes", "ཤེས"),
    ("gnyis", "གཉིས"),
    ("snying", "སྙིང"),
    ("phyag", "ཕྱག"),
    ("grwa", "གྲྭ"),                     # w subscript on a stack
    ("rnam", "རྣམ"),
    ("sems", "སེམས"),
    ("1984", "༡༩༨༤"),
]


@pytest.mark.parametrize("wylie,unicode_", PAIRS)
def test_to_unicode(wylie, unicode_):
    assert to_unicode(wylie) == unicode_


@pytest.mark.parametrize("wylie,unicode_", PAIRS)
def test_to_wylie(wylie, unicode_):
    assert to_wylie(unicode_) == wylie


def test_sentence_roundtrip():
    wylie = "bkra shis bde legs/"
    uni = to_unicode(wylie)
    assert uni == "བཀྲ་ཤིས་བདེ་ལེགས།"
    assert to_wylie(uni) == wylie


def test_punctuation():
    assert to_unicode("/") == "།"
    assert to_unicode("//") == "༎"
    assert to_unicode("ka kha") == "ཀ་ཁ"
    assert to_wylie("ཀ་ཁ།") == "ka kha/"


def test_sanskrit_explicit_stacks():
    assert to_unicode("badz+ra") == "བཛྲ"
    # non-standard stack comes back with '+'
    assert to_wylie("བཛྲ") == "badz+ra"


def test_anusvara_visarga():
    assert to_unicode("oM") == "ཨོཾ"
    assert to_wylie(to_unicode("oM")) == "oM"
    assert to_unicode("kaH") == "ཀཿ"


def test_long_vowels():
    assert to_unicode("kA") == "ཀཱ"
    assert to_unicode("kI") == "ཀཱི"
    assert to_wylie("ཀཱ") == "kA"


def test_unknown_tibetan_sign_escapes():
    # unmapped Tibetan signs surface as \uXXXX (BDRC postprocess contract)
    assert to_wylie("࿓") == "\\u0fd3"
    assert postprocess_wylie_label(to_wylie("࿓")) == "@"


def test_normalize_unicode_decomposes():
    assert normalize_unicode("ཱི") == "ཱི"
    assert normalize_unicode("གྷ") == "གྷ"
    assert normalize_unicode("ༀ") == "ཨོཾ"


def test_tokenize_in_stacks():
    stacks = tokenize_in_stacks("བསྒྲུབས")
    assert stacks == ["བ", "སྒྲུ", "བ", "ས"]
    assert tokenize_in_stacks("ཀ་ཁ") == ["ཀ", "་", "ཁ"]


def test_preprocess_unicode():
    assert preprocess_unicode("ཀ༌ཁ") == "ཀ་ཁ"
    assert preprocess_unicode("ab(cd)e") == "abcde"
    assert preprocess_unicode("a(b)c", full_bracket_removal=True) == "ac"


def test_postprocess_wylie_label_tsheg_encoding():
    assert postprocess_wylie_label("bkra shis") == "bkra§shis"
    assert postprocess_wylie_label("a*b") == "a§b"


def test_wylie_encoder_reads_label(tmp_path):
    p = tmp_path / "label.txt"
    p.write_text("བཀྲ་ཤིས་བདེ་ལེགས།\n", encoding="utf-8")
    enc = WylieEncoder(list("abcdefghijklmnopqrstuvwxyz'/§ "))
    label = enc.read_label(str(p))
    assert label == "bkra§shis§bde§legs/"


def test_stack_encoder_reads_label(tmp_path):
    p = tmp_path / "label.txt"
    p.write_text("བཀྲ་ཤིས།\n", encoding="utf-8")
    enc = StackEncoder(["བ", "ཀྲ", "ཤི", "ས", "་", "།"])
    stacks = enc.read_label(str(p))
    assert stacks == ["བ", "ཀྲ", "་", "ཤི", "ས", "།"]
    ids = enc.encode(stacks)
    assert ids == [1, 2, 5, 3, 4, 6]
    assert enc.decode(ids) == "བཀྲ་ཤིས།"


def test_encoder_vocab_conventions():
    enc = WylieEncoder(list("abc"))
    assert enc.ctc_vocab[0] == " "
    assert enc.num_classes == 4
    assert enc.encode("ba") == [2, 1]


def test_converter_object_surface():
    conv = Converter()
    assert conv.toUnicode("ka") == "ཀ"
    assert conv.toWylie("ཀ") == "ka"
