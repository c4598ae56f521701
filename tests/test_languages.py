"""Non-Latin tagging (T2 language routing + F2 length filters) — probe
classes from the reference's placename-tests-cjk.txt and
TestPlaceGeocoderLanguages.java:29-80."""

from xponents_spark.gazetteer import geocode
from xponents_spark.gazetteer.matcher import normalize_token, tokens_with_offsets


def places(text):
    return [m for m in geocode(text) if m["label"] == "place"]


def test_unsegmented_chinese():
    ms = places("我想去北京旅游")
    assert ms and ms[0]["name"] == "北京" and ms[0]["cc"] == "CN"
    assert (ms[0]["span_start"], ms[0]["span_end"]) == (3, 5)


def test_japanese_with_kana_noise():
    ms = places("東京タワーはどこですか")
    assert ms and ms[0]["cc"] == "JP" and ms[0]["matchtext"] == "東京"


def test_korean_with_particles():
    ms = places("서울에서 만나요")
    assert ms and ms[0]["cc"] == "KR"


def test_arabic_with_diacritic_fold():
    ms = places("الهجوم في بغداد أمس")
    assert ms and ms[0]["cc"] == "IQ" and ms[0]["name"] == "بغداد"


def test_arabic_length_filter():
    # 3-char Arabic PPLA name drops (F2: ME scripts < 6 chars need a major
    # feature code)
    assert not places("زيارة دبي غدا")


def test_simplified_variant_of_tokyo():
    ms = places("去东京")
    assert ms and ms[0]["cc"] == "JP"


def test_cjk_char_tokenization():
    toks = tokens_with_offsets("abc 北京x def")
    assert ("abc", 0, 3) in toks
    assert ("北", 4, 5) in toks and ("京", 5, 6) in toks
    assert ("def", 8, 11) in toks


def test_arabic_variant_normalization():
    assert normalize_token("أحمد") == normalize_token("احمد")
