"""Word-bigram perplexity model (KenLM-style, public pattern).

One add-k-smoothed word-bigram LM per language, trained at import time on
the deterministic template corpus.  A transcript is scored under its
LID-predicted language's model; shuffled-word gibberish built from the same
vocabulary scores high bigram perplexity while clean template text scores
low — exactly the signal KenLM perplexity provides in web-scale text
filtering (CCNet-style, public knowledge).

Scoring is BATCH-VECTORIZED (north_star: "no per-row Python"): the batch's
tokens are interned once via np.unique (one vocab-dict lookup per DISTINCT
token, not per occurrence), bigram log-probs come from one searchsorted
against a per-language sorted key table precomputed at train time (the
same float ops as computing log(num/den) per row, done once), and per-text
log-likelihoods are np.add.reduceat segment sums.  `perplexity` is the
batch of one — reduceat's per-segment reduction is a pure function of the
segment contents (pinned by tests/test_lid_ppl.py), so the row-at-a-time
pandas oracle matches the batched Spark UDF exactly.

Like the reference's mixture-model cutoffs (Step3:349-355), the resulting
threshold lives in config.PPL_MAX as a constant.
"""

from __future__ import annotations

import math

import numpy as np

from . import chunking, templates

_BOS = "<s>"
_UNK = "<unk>"
_K = 0.1
_HUGE = 1e9
_TOK_CHUNK = 1 << 20  # max tokens whose scoring arrays are live at once


class _LangModel:
    __slots__ = ("vocab_id", "unk_id", "bos_id", "bi_keys", "bi_logp",
                 "miss_logp")

    def __init__(self, sents: list[str]):
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        ctx: dict[str, int] = {}
        for sent in sents:
            words = sent.split()
            for w in words:
                uni[w] = uni.get(w, 0) + 1
            padded = [_BOS] + words
            for a, b in zip(padded, padded[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
                ctx[a] = ctx.get(a, 0) + 1
        v = len(set(uni) | {_BOS, _UNK})

        # token ids: words 0..V-1, then UNK, then BOS
        self.vocab_id = {w: i for i, w in enumerate(sorted(uni))}
        self.unk_id = len(self.vocab_id)
        self.bos_id = self.unk_id + 1
        n_ids = self.bos_id + 1

        def _tid(w: str) -> int:
            if w == _BOS:
                return self.bos_id
            return self.vocab_id.get(w, self.unk_id)

        # per-context miss log-prob: log(K / (ctx_count + K*v)) — the same
        # float division + log the scalar form computed per occurrence
        miss = np.empty(n_ids, dtype=np.float64)
        for w, i in self.vocab_id.items():
            miss[i] = math.log(_K / (ctx.get(w, 0) + _K * v))
        miss[self.unk_id] = math.log(_K / (ctx.get(_UNK, 0) + _K * v))
        miss[self.bos_id] = math.log(_K / (ctx.get(_BOS, 0) + _K * v))
        self.miss_logp = miss

        keys = np.empty(len(bi), dtype=np.int64)
        logp = np.empty(len(bi), dtype=np.float64)
        for j, ((a, b), n) in enumerate(bi.items()):
            keys[j] = _tid(a) * n_ids + _tid(b)
            logp[j] = math.log((n + _K) / (ctx.get(a, 0) + _K * v))
        order = np.argsort(keys)
        self.bi_keys = keys[order]
        self.bi_logp = logp[order]


_MODELS = {lang: _LangModel(templates.SENTENCES[lang])
           for lang in templates.LANGS}


def _score_group(m: _LangModel, toks_per_text: list[list[str]]) -> np.ndarray:
    """Vectorized perplexity for one language's texts (all non-empty)."""
    lens = np.array([len(t) for t in toks_per_text], dtype=np.int64)
    flat: list[str] = [w for toks in toks_per_text for w in toks]
    # intern: one dict lookup per DISTINCT token in the group
    uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
    uid = np.fromiter((m.vocab_id.get(u, m.unk_id) for u in uniq),
                      dtype=np.int64, count=len(uniq))
    ids = uid[inv]

    seg_starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=seg_starts[1:])
    prev = np.empty_like(ids)
    prev[1:] = ids[:-1]
    prev[seg_starts] = m.bos_id

    n_ids = m.bos_id + 1
    keys = prev * n_ids + ids
    idx = np.searchsorted(m.bi_keys, keys)
    idx[idx == len(m.bi_keys)] = 0
    found = m.bi_keys[idx] == keys
    ll_tok = np.where(found, m.bi_logp[idx], m.miss_logp[prev])

    ll = np.add.reduceat(ll_tok, seg_starts)
    return np.exp(-ll / lens)


def perplexity_batch(texts, langs) -> list[float]:
    """Vectorized batch form: bigram perplexity of each text under its
    language's model.  OOV words map to <unk>; unknown lang ("und") or
    empty text -> +inf stand-in (1e9) so HIGH_PPL fires deterministically."""
    n = len(texts)
    out = np.full(n, _HUGE, dtype=np.float64)
    # group TEXTS (references into the Arrow batch), not token lists: a
    # split token list costs ~15x its text's bytes in str-object overhead,
    # so holding every list at once would defeat the chunking below
    # (round-4 ADVICE).  Token counts are computed with a throwaway split
    # (peak = one text's list) and the real split happens chunk-locally.
    groups: dict[str, tuple[list[int], list[str], list[int]]] = {}
    for i, (t, lang) in enumerate(zip(texts, langs)):
        m = _MODELS.get(lang)
        if m is None:
            continue
        s = t if isinstance(t, str) else ""
        n_words = len(s.split())
        if n_words == 0:
            continue
        rows, txts, lens = groups.setdefault(lang, ([], [], []))
        rows.append(i)
        txts.append(s)
        lens.append(n_words)
    # bound peak memory like lid_core: the O(total tokens) scoring arrays
    # AND the token lists are materialized per chunk of <= _TOK_CHUNK
    # tokens, chunks split at text boundaries (bit-identical — every
    # per-text reduction is segment-local), so a batch of pathologically
    # long transcripts costs O(_TOK_CHUNK) per UDF worker, not
    # O(batch tokens)
    for lang, (rows, txts, lens) in groups.items():
        m = _MODELS[lang]
        for start, end in chunking.chunk_spans(lens, _TOK_CHUNK):
            out[np.array(rows[start:end], dtype=np.int64)] = \
                _score_group(m, [s.split() for s in txts[start:end]])
    return out.tolist()


def perplexity(text: str, lang: str) -> float:
    """Scalar form = batch of one (bit-identical: the batch scorer's
    per-text reduction is independent of the surrounding batch)."""
    return perplexity_batch([text], [lang])[0]
