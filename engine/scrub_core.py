"""Compiled-regex PII/toxicity scrubber — the single source of truth.

Both the Spark pandas UDF (engine/operators/scoring.py) and the pure-pandas
oracle (tests/oracle.py) call `scrub()`, so "exact scrubbed-transcript
equality" (BASELINE.json input_hint) compares pipeline plumbing, not two
regex dialects.  Application semantics are fully specified:

  * patterns applied in `_RULES` order, one full `re.sub` pass each
    (leftmost, non-overlapping within a pass — Python `re` semantics);
  * replacement tokens (<EMAIL>, ...) never re-match any pattern, so the
    scrubber is idempotent: scrub(scrub(x)) == scrub(x) (property-tested).

Graft provenance: the reference rewrites attributes in place before the
keep/drop decision (NA->0 recode of emotion columns, Step1:106; repair
writes, Step2:349-454) — the scrub slot generalizes that to PII/toxicity
rewriting of `transcript` (SURVEY.md §2.10 R9).
"""

from __future__ import annotations

import re

from . import templates

_RULES: list[tuple[str, re.Pattern, str]] = [
    ("EMAIL", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    # 16-digit cards (4-4-4-4 with optional separators) BEFORE phones so a
    # digit run is consumed by the more specific pattern first
    ("CARD", re.compile(r"(?<!\d)(?:\d{4}[- ]?){3}\d{4}(?!\d)"), "<CARD>"),
    ("SSN", re.compile(r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)"), "<SSN>"),
    ("PHONE_E164", re.compile(r"(?<![\d+])\+[1-9]\d{6,14}(?!\d)"), "<PHONE>"),
    ("PHONE_NANP", re.compile(
        r"(?<!\d)(?:\(\d{3}\)\s?|\d{3}[-. ])\d{3}[-. ]\d{4}(?!\d)"), "<PHONE>"),
    ("TOXIC_MILD", re.compile(
        r"\b(?:" + "|".join(map(re.escape, templates.TOXIC_MILD)) + r")\b",
        re.IGNORECASE), "<TOX>"),
]

_SEVERE = re.compile(
    r"\b(?:" + "|".join(map(re.escape, templates.TOXIC_SEVERE)) + r")\b",
    re.IGNORECASE)


def scrub(text: str | None) -> tuple[str | None, int, bool]:
    """Return (scrubbed_text, n_hits, has_severe_toxic).

    None passes through (missing transcript is the TXT_EMPTY rule's job).
    """
    if text is None:
        return None, 0, False
    hits = 0
    out = text
    for _name, pat, repl in _RULES:
        out, n = pat.subn(repl, out)
        hits += n
    severe = bool(_SEVERE.search(out))
    return out, hits, severe


def scrub_batch(texts):
    """Batch form: returns (list[str|None], list[int], list[bool])."""
    outs, ns, sevs = [], [], []
    for t in texts:
        o, n, s = scrub(t if isinstance(t, str) else None)
        outs.append(o)
        ns.append(n)
        sevs.append(s)
    return outs, ns, sevs
