"""The core-token regex (edge-punct trimmed in one C scan) must equal the
definitional tokenization: whitespace split then .strip(_EDGE_PUNCT), CJK
runs to per-char tokens.  Property-fuzzed — this pins the normalization
semantics the fixture contract depends on (SURVEY.md §4.3.1)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from xponents_spark.gazetteer.matcher import (
    _CJK_CHAR, _EDGE_PUNCT, _WS_TOKEN, normalize_token, tokens_with_offsets)


def reference_tokens(text):
    out = []
    for m in _WS_TOKEN.finditer(text):
        s, e = m.start(), m.end()
        while s < e and text[s] in _EDGE_PUNCT:
            s += 1
        while e > s and text[e - 1] in _EDGE_PUNCT:
            e -= 1
        if e <= s:
            continue
        chunk = text[s:e]
        if not chunk.isascii() and _CJK_CHAR.search(chunk):
            for i, ch in enumerate(chunk):
                if _CJK_CHAR.match(ch):
                    out.append((normalize_token(ch), s + i, s + i + 1))
        else:
            out.append((normalize_token(chunk), s, e))
    return out


@settings(max_examples=500, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.text(max_size=150))
def test_tokenizer_equivalence_fuzz(text):
    assert tokens_with_offsets(text) == reference_tokens(text)


def test_tokenizer_equivalence_cases():
    for t in ["(U.S.)", "don't, stop", ",a,b,", "...", "x", "a..b..",
              "北京,上海", " 'quoted' ", "e.g.|x", "0ힰ", "한국 서울!"]:
        assert tokens_with_offsets(t) == reference_tokens(t), t
