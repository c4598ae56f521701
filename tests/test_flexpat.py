"""FlexPat engine + embedded #TEST corpora.

Mirrors the reference's primary operator-level test mechanism: every RULE in
the pattern cfgs carries TEST lines (incl. FAIL negatives) executed by a
default_tests() equivalent (SURVEY.md §5.1; reference convention documented
at /root/reference/doc/Patterns.md TEST clause).
"""

import pytest

from xponents_spark.flexpat import PatternManager, PatternMatch, pattern_file, reduce_matches
import xponents_spark.extractors.xcoord as xcoord
import xponents_spark.extractors.xtemporal as xtemporal
import xponents_spark.extractors.poli as poli


@pytest.mark.parametrize("mod", [xcoord, xtemporal, poli],
                         ids=["xcoord", "xtemporal", "poli"])
def test_embedded_corpus(mod):
    results = mod.manager().run_default_tests()
    failures = [f"{r['test']}: {r['text']!r}" for r in results if not r["pass"]]
    assert not failures, failures


def test_cfg_parse_shapes():
    mgr = PatternManager(pattern_file("geocoord_patterns.cfg"))
    assert mgr.families == {"DD", "DM", "DMS", "MGRS", "UTM"}
    dd01 = mgr.rules["DD-01"]
    # ordered group names reflect slot appearance order
    assert dd01.group_names[0] == "hemiLatPre"
    assert "decDegLon" in dd01.group_names


def test_unknown_family_raises():
    mgr = PatternManager(pattern_file("poli_patterns.cfg"))
    with pytest.raises(ValueError):
        mgr.scan("text", families=["NOPE"])


def _mk(text, start, end, pid="X-01"):
    return PatternMatch(text, start, end, pid, "X")


def test_reduce_matches_duplicate():
    a, b = _mk("abc", 0, 3), _mk("abc", 0, 3)
    reduce_matches([a, b])
    assert not a.is_duplicate and b.is_duplicate


def test_reduce_matches_submatch():
    outer, inner = _mk("abcdef", 0, 6), _mk("cd", 2, 4)
    reduce_matches([outer, inner])
    assert inner.is_submatch and not outer.is_submatch


def test_reduce_matches_overlap():
    a, b = _mk("abcd", 0, 4), _mk("cdef", 2, 6)
    reduce_matches([a, b])
    assert a.is_overlap and b.is_overlap and not a.is_submatch


def test_reduce_matches_disjoint():
    a, b = _mk("ab", 0, 2), _mk("cd", 5, 7)
    reduce_matches([a, b])
    assert not (a.is_overlap or b.is_overlap or a.is_duplicate or b.is_submatch)


def test_false_positive_traps():
    """Common real-world trap strings must extract nothing (version strings,
    invalid dates, bare years, ratios, MGRS/date collisions)."""
    from xponents_spark.pipeline import extract_turn, DEFAULT_FEATURES
    traps = [
        "version 3.14.159 released",
        "pip install pkg==2.4.1 now",
        "v1.2.3.4 build tag",
        "order #1234-5678 shipped",
        "IP 999.999.999.999 invalid",
        "on 13/13/2020 nothing",
        "price 1,234,567 units",
        "see section 42.18 paragraph 3",
        "ratio 16:9 and 4:3",
        "serial 38SMB was debated",
        "phone ext 5551212",
        "the year 2021 passed",
    ]
    for t in traps:
        _, ms = extract_turn(t, DEFAULT_FEATURES)
        assert ms == [], (t, [(m["label"], m["matchtext"]) for m in ms])
