"""Word-bigram perplexity model (KenLM-style, public pattern).

One add-k-smoothed word-bigram LM per language, trained at import time on
the deterministic template corpus.  A transcript is scored under its
LID-predicted language's model; shuffled-word gibberish built from the same
vocabulary scores high bigram perplexity while clean template text scores
low — exactly the signal KenLM perplexity provides in web-scale text
filtering (CCNet-style, public knowledge).

Like the reference's mixture-model cutoffs (Step3:349-355), the resulting
threshold lives in config.PPL_MAX as a constant.
"""

from __future__ import annotations

import math

from . import templates

_BOS = "<s>"
_UNK = "<unk>"
_K = 0.1


def _train():
    models: dict[str, dict] = {}
    for lang in templates.LANGS:
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        ctx: dict[str, int] = {}
        for sent in templates.SENTENCES[lang]:
            words = sent.split()
            for w in words:
                uni[w] = uni.get(w, 0) + 1
            padded = [_BOS] + words
            for a, b in zip(padded, padded[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
                ctx[a] = ctx.get(a, 0) + 1
        vocab = set(uni) | {_BOS, _UNK}
        models[lang] = {"bi": bi, "ctx": ctx, "v": len(vocab), "vocab": set(uni)}
    return models


_MODELS = _train()


def perplexity(text: str, lang: str) -> float:
    """Bigram perplexity of `text` under `lang`'s model.

    OOV words map to <unk>.  Unknown lang ("und") or empty text -> +inf
    stand-in (1e9) so the HIGH_PPL rule fires deterministically.
    """
    m = _MODELS.get(lang)
    words = (text or "").split()
    if m is None or not words:
        return 1e9
    vocab = m["vocab"]
    toks = [w if w in vocab else _UNK for w in words]
    bi, ctx, v = m["bi"], m["ctx"], m["v"]
    ll = 0.0
    prev = _BOS
    for w in toks:
        num = bi.get((prev, w), 0) + _K
        den = ctx.get(prev, 0) + _K * v
        ll += math.log(num / den)
        prev = w
    return math.exp(-ll / len(toks))


def perplexity_batch(texts, langs) -> list[float]:
    return [perplexity(t if isinstance(t, str) else "", lang)
            for t, lang in zip(texts, langs)]
