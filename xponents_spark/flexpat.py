"""FlexPat: config-driven regex extraction (SURVEY.md §2.3 R1-R3).

A fresh implementation of the FlexPat methodology published in
``/root/reference/doc/Patterns.md`` — pattern files carry ``#DEFINE``,
``#RULE``, ``#TEST`` and ``#CLASS`` clauses; rules reference defines as
``<SLOT>`` placeholders which compile into ordered regex groups.

Behavioral contract (validated by tests/test_flexpat.py):

* ``#DEFINE <name> <pattern>``  — a named sub-pattern.  Defines must not
  contain capturing groups (use ``(?:...)``) so slot numbering is stable.
* ``#RULE <family> <id> <pattern>`` — rule key is ``family-id``; every
  ``<NAME>`` occurrence becomes ``(<define>)`` and contributes one entry to
  the ordered group-name list.
* ``#TEST <family> <id> <text>`` — embedded test case; ``$NL`` expands to a
  newline; a ``FAIL`` token in the text marks a true-negative expectation.
* ``#CLASS <family> <classname>`` — family-specific normalizer.  Here a
  normalizer is a plain function ``normalize(match) -> None`` registered via
  :func:`register_normalizer`, not a class hierarchy.
* Rules compile case-insensitive; scanning is ``finditer`` per enabled rule;
  matched groups digest into ``(name, value, start, end)`` slot tuples.
* Post-scan, duplicate and sub-span matches are marked ``filtered_out``
  (same semantics as the reference's ``reduce_matches``:
  ``doc/pydoc/opensextant.html`` embedded source L1035-1082).

This module is dependency-free and picklable so compiled managers can be
broadcast to Spark executors.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Callable

_SLOT_RE = re.compile(r"<([A-Za-z0-9_]+)>")

# family -> normalize(PatternMatch) -> None ; populated by extractor modules.
_NORMALIZERS: dict[str, Callable[["PatternMatch"], None]] = {}


def register_normalizer(family: str, fn: Callable[["PatternMatch"], None]) -> None:
    """Register the #CLASS-equivalent normalizer for a pattern family."""
    _NORMALIZERS[family] = fn


def pattern_file(name: str) -> str:
    """Resolve a pattern cfg shipped in xponents_spark/patterns/."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "patterns", name)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    return path


@dataclass
class PatternMatch:
    """One regex match with digested slots and normalization products.

    Mirrors the reference's PatternMatch/TextMatch fields
    (``doc/pydoc/opensextant/FlexPat.html`` embedded source L63-159):
    span, pattern_id, family label, slot tuples, validity/filter flags and a
    free-form ``attrs`` dict produced by normalization.
    """

    text: str
    start: int
    end: int
    pattern_id: str
    family: str
    slots: list[tuple[str, str | None, int, int]] = field(default_factory=list)
    attrs: dict = field(default_factory=dict)
    textnorm: str | None = None
    is_valid: bool = True
    filtered_out: bool = False
    is_duplicate: bool = False
    is_submatch: bool = False
    is_overlap: bool = False
    pre_text: str = ""
    post_text: str = ""

    @property
    def variant_id(self) -> str | None:
        if "-" in self.pattern_id:
            return self.pattern_id.split("-", 1)[1]
        return None

    def slot_values(self) -> dict:
        """First-wins map of slot name -> matched value (skips empty)."""
        out: dict = {}
        for name, val, _s, _e in self.slots:
            if val is not None and name not in out:
                out[name] = val
        return out

    def get_value(self, name: str):
        for key, val, _s, _e in self.slots:
            if key == name:
                return val
        return None


@dataclass
class Rule:
    family: str
    rule_id: str          # "<family>-<variant>"
    raw: str              # rule pattern before slot substitution
    regex: re.Pattern
    group_names: list[str]
    enabled: bool = True


@dataclass
class TestCase:
    test_id: str
    family: str
    rule_id: str
    text: str

    @property
    def expect_match(self) -> bool:
        return "FAIL" not in self.text


_DIGIT_RE = re.compile(r"\d")


class ScanCtx:
    """Per-text context for callable prescreens: memoizes features shared
    across families so e.g. the has-digit scan runs once per text."""

    __slots__ = ("text", "_lower", "_has_digit", "memo")

    def __init__(self, text: str):
        self.text = text
        self._lower = None
        self._has_digit = None
        self.memo: dict = {}

    @property
    def lower(self) -> str:
        if self._lower is None:
            self._lower = self.text.lower()
        return self._lower

    @property
    def has_digit(self) -> bool:
        if self._has_digit is None:
            self._has_digit = _DIGIT_RE.search(self.text) is not None
        return self._has_digit


class PatternManager:
    """Parse + compile a FlexPat cfg file.

    Equivalent to the reference's RegexPatternManager
    (``doc/pydoc/opensextant/FlexPat.html`` source L198-385).
    """

    def __init__(self, cfg_path: str,
                 prescreen: dict[str, str] | None = None):
        self.cfg_path = cfg_path if os.path.exists(cfg_path) else pattern_file(cfg_path)
        self.defines: dict[str, str] = {}
        self.rules: dict[str, Rule] = {}
        self.families: set[str] = set()
        self.test_cases: list[TestCase] = []
        self.normalizer_family: dict[str, str] = {}
        # family -> cheap necessary condition; when it fails the whole
        # family's rules skip (hot-path pruning: most text has no
        # digits/symbols, so 30+ rule scans collapse to one char scan).
        # A value is either a regex string or a callable(ScanCtx) -> bool
        # (callables share per-text memoized features like has-digit).
        self.prescreen: dict[str, object] = {
            fam: (rx if callable(rx) else re.compile(rx))
            for fam, rx in (prescreen or {}).items()}
        self._parse()

    def _parse(self) -> None:
        raw_rules: list[tuple[str, str, str]] = []
        testcount = 0
        with open(self.cfg_path, encoding="utf-8") as fh:
            for line in fh:
                stmt = line.strip()
                if stmt.startswith("#DEFINE"):
                    _, name, pat = re.split(r"[\t ]+", stmt, maxsplit=2)
                    self.defines[name] = pat
                elif stmt.startswith("#RULE"):
                    _, fam, rid, pat = re.split(r"[\t ]+", stmt, maxsplit=3)
                    key = f"{fam}-{rid}"
                    if any(k == key for _f, k, _p in raw_rules):
                        raise ValueError(f"duplicate rule {key}")
                    raw_rules.append((fam, key, pat))
                elif stmt.startswith("#TEST"):
                    _, fam, rid, text = re.split(r"[\t ]+", stmt, maxsplit=3)
                    testcount += 1
                    self.test_cases.append(
                        TestCase(f"{fam}-{rid}#{testcount}", fam, f"{fam}-{rid}",
                                 text.strip().replace("$NL", "\n")))
                elif stmt.startswith("#CLASS"):
                    _, fam, clsname = re.split(r"[\t ]+", stmt, maxsplit=2)
                    self.normalizer_family[fam] = clsname

        fam_alts: dict[str, list[str]] = {}
        for fam, key, raw in raw_rules:
            self.families.add(fam)
            group_names = _SLOT_RE.findall(raw)
            compiled = raw
            nogroup = raw
            for slot in set(group_names):
                if slot not in self.defines:
                    raise ValueError(f"rule {key}: <{slot}> has no #DEFINE")
                compiled = compiled.replace(f"<{slot}>", f"({self.defines[slot]})")
                nogroup = nogroup.replace(f"<{slot}>", f"(?:{self.defines[slot]})")
            self.rules[key] = Rule(fam, key, raw, re.compile(compiled, re.IGNORECASE),
                                   group_names)
            fam_alts.setdefault(fam, []).append(f"(?:{nogroup})")
        # capture-free union per family — kept for tooling/debug; measured
        # slower than the char-class prescreens as a scan gate, so unused there
        self.family_union: dict[str, str] = {
            fam: "|".join(alts) for fam, alts in fam_alts.items()}
        self.rules_by_family: dict[str, list[Rule]] = {}
        for rule in self.rules.values():
            self.rules_by_family.setdefault(rule.family, []).append(rule)

    def set_enabled(self, prefix: str, flag: bool) -> None:
        for rule in self.rules.values():
            if rule.rule_id.startswith(prefix):
                rule.enabled = flag

    # -- scanning -----------------------------------------------------------

    def scan(self, text: str, families=None, context_len: int = 20,
             ctx: "ScanCtx | None" = None) -> list[PatternMatch]:
        """Apply every enabled rule to ``text``; normalize + reduce.

        Same pipeline as the reference PatternExtractor.extract_patterns
        (``FlexPat.html`` source L462-513): finditer per rule, digest groups,
        family normalize, then duplicate/submatch reduction.
        """
        fams = set(families) if families else self.families
        unknown = fams - self.families
        if unknown:
            raise ValueError(f"unknown pattern families: {sorted(unknown)}")
        if self.prescreen:
            # a caller-shared ScanCtx memoizes lower()/has-digit across the
            # three pattern managers scanning the same turn
            if ctx is None:
                ctx = ScanCtx(text)
            keep = set()
            for f in fams:
                pre = self.prescreen.get(f)
                if pre is None or (pre(ctx) if callable(pre)
                                   else pre.search(text)):
                    keep.add(f)
            fams = keep
            if not fams:
                return []
        tlen = len(text)
        found: list[PatternMatch] = []
        for fam in self.rules_by_family:
            if fam not in fams:
                continue
            for rule in self.rules_by_family[fam]:
                if not rule.enabled:
                    continue
                self._scan_rule(rule, text, tlen, found)
        reduce_matches(found)
        for pm in found:
            if pm.is_duplicate or pm.is_submatch:
                pm.filtered_out = True
        return found

    def _scan_rule(self, rule: Rule, text: str, tlen: int,
                   found: list[PatternMatch], context_len: int = 20) -> None:
        for m in rule.regex.finditer(text):
            regs = m.regs   # one C-level tuple instead of 3 calls per group
            slots = [
                (name, text[s:e] if s != -1 else None, s, e)
                for name, (s, e) in zip(rule.group_names, regs[1:])
            ]
            pm = PatternMatch(m.group(), m.start(), m.end(), rule.rule_id,
                              rule.family, slots)
            pm.pre_text = text[max(0, pm.start - context_len):pm.start]
            pm.post_text = text[pm.end:min(tlen, pm.end + context_len)]
            norm = _NORMALIZERS.get(rule.family)
            if norm is not None:
                norm(pm)
            else:
                pm.textnorm = pm.text.strip()
            found.append(pm)

    # -- embedded test harness ---------------------------------------------

    def run_default_tests(self, scope: str = "rule") -> list[dict]:
        """Run every #TEST case; replicates default_tests() semantics
        (``FlexPat.html`` source L515-570): a FAIL test passes when no
        unfiltered match from the rule under test survives."""
        results = []
        for case in self.test_cases:
            matches = self.scan(case.text, families=[case.family])
            if scope == "rule":
                matches = [m for m in matches if case.rule_id == m.pattern_id]
            hits = [m for m in matches
                    if not m.filtered_out or (m.is_duplicate and m.filtered_out)]
            ok = bool(hits) if case.expect_match else not hits
            results.append({"test": case.test_id, "text": case.text,
                            "matches": matches, "pass": ok,
                            "expected_match": case.expect_match})
        return results


def reduce_matches(matches: list[PatternMatch]) -> None:
    """Mark duplicate / submatch / overlap pairs.

    Same flag outcome as the reference sweep
    (``doc/pydoc/opensextant.html`` source L1035-1082): exact-span pairs mark
    the later one duplicate; contained spans mark the inner one submatch;
    intersecting spans mark both overlap.  Implemented as a sweep over spans
    sorted by (start, -end) comparing each match only against still-active
    predecessors — linear-ish for the common sparse case instead of O(n²).
    Spans are half-open [start, end) as produced by ``re``.
    """
    n = len(matches)
    if n < 2:
        return
    order = sorted(range(n), key=lambda i: (matches[i].start, -matches[i].end, i))
    active: list[int] = []
    for oi in order:
        m = matches[oi]
        if m.filtered_out:
            continue
        kept = []
        for pi in active:
            p = matches[pi]
            if p.end < m.start:   # strictly disjoint (reference: m2 < n1)
                continue
            kept.append(pi)
            if p.filtered_out:    # reference skips filtered counterparts too
                continue
            if p.start == m.start and p.end == m.end:
                (m if oi > pi else p).is_duplicate = True
            elif p.start <= m.start and m.end <= p.end:
                m.is_submatch = True
            elif m.start <= p.start and p.end <= m.end:
                p.is_submatch = True
            else:
                p.is_overlap = True
                m.is_overlap = True
        kept.append(oi)
        active = kept
