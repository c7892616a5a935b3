"""Char-trigram language-ID scorer (fastText-lid-style, public pattern).

A multinomial model over character trigrams per language, trained once at
import time on the deterministic template corpus (`templates.SENTENCES`) —
the shipped-artifact pattern of fastText lid.176, reproduced from public
knowledge with no external model file (none is installable in the sandbox).

The model is intentionally shared between the Spark iterator UDF and the
pure-pandas oracle so the correctness gate compares *pipeline semantics*
(ordering, fusion, dedup, scrub) rather than float noise between two
hand-written scorers.  The math is deterministic: fixed corpus, fixed
smoothing, no RNG at score time.

Classification-driven labeling grafts the reference's fitted-model
label-stamping (gamlssMX fits -> cluster labels joined back,
Step3-Temporal-Inconsistency.R:150-355,849-949): fit offline, broadcast,
stamp scores per row.
"""

from __future__ import annotations

import math

import numpy as np

from . import templates

_PAD = "\x00"
_SMOOTH = 0.5


def _trigrams(text: str):
    t = _PAD + text.lower() + _PAD
    for i in range(len(t) - 2):
        yield t[i:i + 3]


def _train() -> tuple[list[str], list[dict[str, float]], list[float]]:
    langs = list(templates.LANGS)
    counts: list[dict[str, int]] = []
    for lang in langs:
        c: dict[str, int] = {}
        for sent in templates.SENTENCES[lang]:
            for g in _trigrams(sent):
                c[g] = c.get(g, 0) + 1
        counts.append(c)
    vocab = set()
    for c in counts:
        vocab.update(c)
    v = len(vocab) + 1  # +1 for OOV bucket
    logprobs: list[dict[str, float]] = []
    oov: list[float] = []
    for c in counts:
        total = sum(c.values())
        denom = total + _SMOOTH * v
        logprobs.append({g: math.log((n + _SMOOTH) / denom) for g, n in c.items()})
        oov.append(math.log(_SMOOTH / denom))
    return langs, logprobs, oov


_LANGS, _LOGPROBS, _OOV = _train()


def score_text(text: str) -> tuple[str, float]:
    """Return (predicted_lang, margin).

    margin = (best - second best) mean per-trigram log-likelihood; ~0 for
    mixed-language token salad, large for clean single-language text.
    Empty/degenerate text -> ("und", 0.0).
    """
    grams = list(_trigrams(text or ""))
    if not grams:
        return "und", 0.0
    scores = np.empty(len(_LANGS))
    for k in range(len(_LANGS)):
        lp, oov = _LOGPROBS[k], _OOV[k]
        scores[k] = sum(lp.get(g, oov) for g in grams) / len(grams)
    order = np.argsort(scores)
    best, second = int(order[-1]), int(order[-2])
    return _LANGS[best], float(scores[best] - scores[second])


def score_batch(texts) -> tuple[list[str], np.ndarray]:
    """Vectorized-over-batch scoring (list in, arrays out)."""
    langs: list[str] = []
    margins = np.empty(len(texts))
    for i, t in enumerate(texts):
        lang, m = score_text(t if isinstance(t, str) else "")
        langs.append(lang)
        margins[i] = m
    return langs, margins
