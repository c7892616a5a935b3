"""Unit + property tests for the PII/toxicity scrubber (SURVEY §5.2-2/6)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine import scrub_core


CASES = [
    ("mail me jane.doe+x@ex-a.com now", "mail me <EMAIL> now", 1, False),
    ("cards 4242 4242 4242 4242 and 4012-8888-8888-1881",
     "cards <CARD> and <CARD>", 2, False),
    ("ssn 523-04-1234 here", "ssn <SSN> here", 1, False),
    ("call 612-555-0188", "call <PHONE>", 1, False),
    ("call (415) 555-0134", "call <PHONE>", 1, False),
    ("intl +15125550199", "intl <PHONE>", 1, False),
    ("no pii at all", "no pii at all", 0, False),
    ("you frakk and GORRAM", "you <TOX> and <TOX>", 2, False),
    ("total zorkrot here", "total zorkrot here", 0, True),  # severe: flag, keep text
    ("", "", 0, False),
]


@pytest.mark.parametrize("raw,expected,n,severe", CASES)
def test_scrub_cases(raw, expected, n, severe):
    out, hits, sev = scrub_core.scrub(raw)
    assert out == expected
    assert hits == n
    assert sev == severe


def test_none_passthrough():
    assert scrub_core.scrub(None) == (None, 0, False)


def test_card_not_eaten_by_phone():
    # 4-4-4-4 digit runs must resolve as CARD, never partially as PHONE
    out, _, _ = scrub_core.scrub("x 1234 5678 9012 3456 y")
    assert out == "x <CARD> y"


def test_ssn_boundary():
    # 9-digit run without separators is NOT an SSN match
    out, hits, _ = scrub_core.scrub("id 523041234 here")
    assert out == "id 523041234 here" and hits == 0


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_scrub_idempotent(s):
    out1, _, sev1 = scrub_core.scrub(s)
    out2, n2, sev2 = scrub_core.scrub(out1)
    assert out1 == out2
    assert n2 == 0
    assert sev1 == sev2


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789-+() .", max_size=40))
def test_scrub_digit_soup_never_crashes(s):
    out, hits, _ = scrub_core.scrub(s)
    assert isinstance(out, str) and hits >= 0
