"""Deterministic synthetic per-language corpora (L1-L5).

These template sentences are the *only* training data for the char-trigram
LID model (`lid_core`) and the word-bigram perplexity model (`ppl_core`),
and the only source of clean transcripts in the fixture generator — the
same public-knowledge pattern as training a fastText/KenLM model on a fixed
corpus and shipping the artifact.  Everything is derived at import time
from fixed seeds; no wall-clock, no external data.

Each language has a distinct script/letter inventory so the five languages
have genuinely distinct character n-gram distributions (the property real
LID models exploit):

  L1  latin ascii            (head language, ~50% of rows in fixtures)
  L2  latin + accented vowels
  L3  cyrillic
  L4  greek
  L5  hiragana
"""

from __future__ import annotations

import numpy as np

LANGS = ("L1", "L2", "L3", "L4", "L5")

# per-language (consonants, vowels) inventories — disjoint scripts for
# L3/L4/L5, distinct letter statistics for L1 vs L2
_INVENTORIES = {
    "L1": ("bcdfghjklmnprstvw", "aeiou"),
    "L2": ("bcdfglmnprstvz", "àéèêíóúüaeiou"),
    "L3": ("бвгджзклмнпрстфхцчшщ", "аеиоуыэюя"),
    "L4": ("βγδζθκλμνξπρστφχψ", "αεηιουω"),
    "L5": ("かきくけこさしすせそたちつてとなにぬねのはひふへほまみむめも", "あいうえお"),
}

N_WORDS = 160          # vocabulary size per language
N_SENTENCES = 48       # template sentences per language
SENT_LEN_RANGE = (5, 12)


def _make_vocab(lang: str, rng: np.random.Generator) -> list[str]:
    cons, vow = _INVENTORIES[lang]
    cons, vow = list(cons), list(vow)
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < N_WORDS:
        n_syll = int(rng.integers(1, 4))
        w = ""
        for _ in range(n_syll):
            w += cons[int(rng.integers(0, len(cons)))]
            w += vow[int(rng.integers(0, len(vow)))]
            if rng.random() < 0.3:
                w += cons[int(rng.integers(0, len(cons)))]
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _make_sentences(vocab: list[str], rng: np.random.Generator) -> list[str]:
    sents = []
    for _ in range(N_SENTENCES):
        n = int(rng.integers(SENT_LEN_RANGE[0], SENT_LEN_RANGE[1] + 1))
        idx = rng.integers(0, len(vocab), size=n)
        sents.append(" ".join(vocab[i] for i in idx))
    return sents


def _build() -> tuple[dict[str, list[str]], dict[str, list[str]]]:
    vocabs: dict[str, list[str]] = {}
    sentences: dict[str, list[str]] = {}
    for i, lang in enumerate(LANGS):
        rng = np.random.default_rng(1000 + i)
        vocabs[lang] = _make_vocab(lang, rng)
        sentences[lang] = _make_sentences(vocabs[lang], rng)
    return vocabs, sentences


VOCABS, SENTENCES = _build()

# Synthetic toxicity blocklists (FIXTURES.md `TOXIC`): invented tokens only.
# Mild terms are scrubbed in place; severe terms drop the clip.
TOXIC_MILD = ("frakk", "gorram", "smegma9", "blitnag")
TOXIC_SEVERE = ("zorkrot", "vexscum")
