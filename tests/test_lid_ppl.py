"""Unit tests for the LID and perplexity scorers (SURVEY §5.2-2)."""

from __future__ import annotations

import numpy as np

from engine import config, lid_core, ppl_core, templates


def test_lid_identifies_every_language():
    for lang in templates.LANGS:
        text = " ".join(templates.SENTENCES[lang][:3])
        pred, margin = lid_core.score_text(text)
        assert pred == lang
        assert margin > config.LID_MARGIN_MIN


def test_lid_mixed_text_low_margin():
    a = templates.SENTENCES["L1"][0].split()
    b = templates.SENTENCES["L4"][0].split()
    mixed = " ".join(w for pair in zip(a, b) for w in pair)
    _, margin = lid_core.score_text(mixed)
    assert margin < config.LID_MARGIN_MIN


def test_lid_empty_und():
    assert lid_core.score_text("") == ("und", 0.0)
    assert lid_core.score_text(None) == ("und", 0.0)


def test_ppl_clean_below_threshold():
    for lang in templates.LANGS:
        text = " ".join(templates.SENTENCES[lang][:4])
        assert ppl_core.perplexity(text, lang) < config.PPL_MAX


def test_ppl_shuffled_above_threshold():
    rng = np.random.default_rng(7)
    for lang in templates.LANGS:
        words = " ".join(templates.SENTENCES[lang][:4]).split()
        shuffled = " ".join(np.array(words)[rng.permutation(len(words))])
        assert ppl_core.perplexity(shuffled, lang) > config.PPL_MAX


def test_ppl_unknown_lang_or_empty_is_huge():
    assert ppl_core.perplexity("anything", "und") == 1e9
    assert ppl_core.perplexity("", "L1") == 1e9


def test_batch_forms_match_scalar():
    texts = [" ".join(templates.SENTENCES[lang][:2]) for lang in templates.LANGS]
    langs, margins = lid_core.score_batch(texts)
    ppls = ppl_core.perplexity_batch(texts, langs)
    for i, t in enumerate(texts):
        sl, sm = lid_core.score_text(t)
        assert langs[i] == sl and margins[i] == sm
        assert ppls[i] == ppl_core.perplexity(t, sl)


def test_batch_scoring_is_composition_independent():
    """The vectorized batch scorers must give each text a result that is a
    pure function of that text alone (np.add.reduceat per-segment sums are
    segment-local): the pandas oracle scores row-at-a-time while the Spark
    UDF scores 512-row batches, and the pipeline gate compares them
    bit-exactly."""
    rng = np.random.default_rng(3)
    texts = []
    for lang in templates.LANGS:
        for i in range(6):
            texts.append(" ".join(templates.SENTENCES[lang][i:i + 3]))
    texts += ["", "a", "zz qq xx", " ".join(["tok"] * 300)]
    langs_all, margins_all = lid_core.score_batch(texts)
    ppl_all = ppl_core.perplexity_batch(texts, langs_all)

    for _ in range(5):
        perm = rng.permutation(len(texts))
        cut = int(rng.integers(1, len(texts) - 1))
        for part in (perm[:cut], perm[cut:]):
            sub = [texts[i] for i in part]
            langs_s, margins_s = lid_core.score_batch(sub)
            ppl_s = ppl_core.perplexity_batch(
                sub, [langs_all[i] for i in part])
            for j, i in enumerate(part):
                assert langs_s[j] == langs_all[i]
                assert margins_s[j] == margins_all[i]
                assert ppl_s[j] == ppl_all[i]


def test_memory_chunking_is_bit_identical(monkeypatch):
    """The batch scorers bound peak memory by splitting oversized batches
    into chunks at text boundaries (lid_core._TRI_CHUNK /
    ppl_core._TOK_CHUNK).  Forcing pathologically small chunks must not
    change a single output bit — chunking is a memory knob, never a
    semantics knob (the pandas oracle runs unchunked rows)."""
    texts = []
    for lang in templates.LANGS:
        texts.append(" ".join(templates.SENTENCES[lang][:4]))
    texts += ["", "a", " ".join(["tok"] * 500), "zz qq xx " * 40]
    langs_ref, margins_ref = lid_core.score_batch(texts)
    ppl_ref = ppl_core.perplexity_batch(texts, langs_ref)

    monkeypatch.setattr(lid_core, "_TRI_CHUNK", 7)
    monkeypatch.setattr(ppl_core, "_TOK_CHUNK", 5)
    langs_c, margins_c = lid_core.score_batch(texts)
    ppl_c = ppl_core.perplexity_batch(texts, langs_c)
    assert langs_c == langs_ref
    assert np.array_equal(margins_c, margins_ref)
    assert ppl_c == ppl_ref


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_texts_strategy = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=200),
        st.text(alphabet="abcdefgh .,!?", max_size=400),
    ),
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(texts=_texts_strategy, tri_chunk=st.integers(1, 64),
       tok_chunk=st.integers(1, 64), sh_chunk=st.integers(1, 64))
def test_chunk_size_invariance_property(texts, tri_chunk, tok_chunk,
                                        sh_chunk):
    """Chunk sizes are memory knobs, never semantics knobs: for ANY
    input batch and ANY chunk sizes, the batch scorers must reproduce
    the default (one-chunk) outputs bit-for-bit.  Guards the chunked
    rewrites of lid_core/ppl_core/simhash_core against boundary bugs
    the fixed-example tests might miss (monkeypatching by hand because
    hypothesis drives many examples per test call)."""
    from engine import simhash_core

    langs_ref, margins_ref = lid_core.score_batch(texts)
    ppl_ref = ppl_core.perplexity_batch(texts, langs_ref)
    sh_ref_signed, sh_ref_bands = simhash_core.dedup_batch(texts)

    saved = (lid_core._TRI_CHUNK, ppl_core._TOK_CHUNK,
             simhash_core._SHINGLE_CHUNK)
    try:
        lid_core._TRI_CHUNK = tri_chunk
        ppl_core._TOK_CHUNK = tok_chunk
        simhash_core._SHINGLE_CHUNK = sh_chunk
        langs_c, margins_c = lid_core.score_batch(texts)
        ppl_c = ppl_core.perplexity_batch(texts, langs_c)
        sh_c_signed, sh_c_bands = simhash_core.dedup_batch(texts)
    finally:
        (lid_core._TRI_CHUNK, ppl_core._TOK_CHUNK,
         simhash_core._SHINGLE_CHUNK) = saved

    assert langs_c == langs_ref
    assert np.array_equal(margins_c, margins_ref)
    assert ppl_c == ppl_ref
    assert np.array_equal(sh_c_signed, sh_ref_signed)
    assert np.array_equal(sh_c_bands, sh_ref_bands)


def test_chunk_spans_edge_cases():
    """The shared span splitter (engine/chunking.py): empty input, a
    single oversized item in its own span, exact-fit packing, and an
    oversized item between normal ones."""
    from engine.chunking import chunk_spans

    assert list(chunk_spans([], 5)) == []
    assert list(chunk_spans([10], 5)) == [(0, 1)]
    assert list(chunk_spans([2, 2, 2, 2], 5)) == [(0, 2), (2, 4)]
    assert list(chunk_spans([2, 9, 1], 5)) == [(0, 1), (1, 2), (2, 3)]
    assert list(chunk_spans([5], 5)) == [(0, 1)]


def test_fused_batch_handles_pathological_transcripts():
    """The input class that motivated the memory bounding, driven through
    the REAL fused scoring batch (not just the cores): a batch mixing
    multi-100k-char transcripts (single-language, mixed-language, and
    repeated-token) with normal rows must complete and score every row —
    and the long rows' outputs must equal scoring them alone (batch
    composition independence at the UDF level)."""
    import pandas as pd

    from engine import templates
    from engine.operators import scoring

    def row(cid, transcript):
        return {"clip_id": cid, "part_id": 0, "bytes": None, "sr_hz": 16000,
                "dur_ms": 60000, "codec": "pcm_s16le",
                "transcript": transcript}

    en = " ".join(templates.SENTENCES[templates.LANGS[0]]) + " "
    de = " ".join(templates.SENTENCES[templates.LANGS[1]]) + " "
    long_en = (en * (120_000 // len(en) + 1))[:120_000]
    long_mixed = ((en + de) * (120_000 // len(en + de) + 1))[:120_000]
    long_tok = ("tok " * 40_000)[:120_000]
    rows = [row("p_en", long_en), row("n_0", en.strip()),
            row("p_mix", long_mixed), row("n_1", de.strip()),
            row("p_tok", long_tok)]
    pdf = pd.DataFrame(rows)
    pdf["part_id"] = pd.array(pdf["part_id"], dtype="int32")
    pdf["sr_hz"] = pd.array(pdf["sr_hz"], dtype="Int32")
    pdf["dur_ms"] = pd.array(pdf["dur_ms"], dtype="Int32")

    out = scoring._score_batch(pdf.copy()).set_index("clip_id")
    assert len(out) == 5 and out["lang"].notna().all()
    assert out.loc["p_en", "lang"] == templates.LANGS[0]

    solo = scoring._score_batch(
        pdf[pdf.clip_id.str.startswith("p_")].reset_index(drop=True).copy()
    ).set_index("clip_id")
    for cid in ("p_en", "p_mix", "p_tok"):
        for col in ("lang", "lid_margin", "ppl_score", "simhash"):
            assert out.loc[cid, col] == solo.loc[cid, col], (cid, col)
