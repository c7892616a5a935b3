"""Dedup operator edge cases: pairs/triples/singletons, canonical choice,
band recall (SURVEY §5.2-3; graft of Step5 run cases)."""

from __future__ import annotations

import numpy as np

from engine import config, simhash_core, templates
from engine.operators import dedup, scoring


def _scored(spark, rows):
    """rows: (clip_id, pcm_checksum, transcript).  Builds the minimal scored
    frame dedup needs (simhash/bands computed via the shared core)."""
    data = []
    for cid, ck, t in rows:
        u = simhash_core.simhash_for_dedup(t)
        b = simhash_core.bands(u)
        data.append((cid, 0, t, ck, simhash_core.to_signed64(u),
                     b[0], b[1], b[2], b[3]))
    return spark.createDataFrame(
        data, "clip_id string, part_id int, transcript string, "
              "pcm_checksum string, simhash long, band0 int, band1 int, "
              "band2 int, band3 int")


def _run(spark, rows):
    out = dedup.with_dup_flags(_scored(spark, rows)).toPandas()
    return out.set_index("clip_id")


def test_exact_dup_pair_and_triple(spark):
    f = _run(spark, [
        ("a1", "h1", "same text"), ("a2", "h1", "same text"),
        ("b1", "h2", "t"), ("b2", "h2", "t"), ("b3", "h2", "t"),
        ("solo", "h3", "unique"),
    ])
    e = "f_" + config.RULE_EXACT_DUP
    assert not f.loc["a1", e] and f.loc["a2", e]
    assert not f.loc["b1", e] and f.loc["b2", e] and f.loc["b3", e]
    assert not f.loc["solo", e]


def test_audio_near_dup_edited_transcript(spark):
    f = _run(spark, [
        ("a1", "h1", "hello world one"),
        ("a2", "h1", "hello world two"),   # same audio, edited text
        ("b", "h9", "hello world one"),    # same text, different audio
    ])
    n = "f_" + config.RULE_NEAR_DUP
    e = "f_" + config.RULE_EXACT_DUP
    assert not f.loc["a1", n] and f.loc["a2", n]
    assert not f.loc["a2", e]
    assert not f.loc["b", n] and not f.loc["b", e]


def test_canonical_is_lexicographic_min(spark):
    # insertion order must not matter, only clip_id order
    f = _run(spark, [
        ("z9", "h1", "x y z"), ("a0", "h1", "x y z"), ("m5", "h1", "x y z"),
    ])
    e = "f_" + config.RULE_EXACT_DUP
    assert not f.loc["a0", e] and f.loc["m5", e] and f.loc["z9", e]


def _long_text(n_words=60, seed=3):
    rng = np.random.default_rng(seed)
    vocab = templates.VOCABS["L1"]
    return " ".join(vocab[int(i)] for i in rng.integers(0, len(vocab), n_words))


def test_simhash_near_dup_long_text(spark):
    """The d<=3 radius catches formatting-level variants of long texts
    (case/whitespace changes -> identical lowered shingles -> hamming 0).
    Token edits perturb ~3 shingles each and land at hamming ~4-7 even for
    400-word texts — those are covered by the audio-key rule instead; this
    is the documented semantic of the transcript-simhash rule."""
    base = _long_text()
    cased = base.upper()          # formatting variant: hamming 0
    words = base.split()
    words[10] = "edited"
    edited = " ".join(words)      # 1-token edit: hamming > 3 at 60 words
    assert simhash_core.hamming(
        simhash_core.simhash64(base), simhash_core.simhash64(edited)) \
        > config.SIMHASH_HAMMING_MAX
    f = _run(spark, [
        ("a", "h1", base), ("b", "h2", cased), ("c", "h3", edited),
        ("d", "h4", _long_text(seed=9)),
    ])
    n = "f_" + config.RULE_NEAR_DUP
    assert not f.loc["a", n] and f.loc["b", n]
    assert not f.loc["c", n] and not f.loc["d", n]


def test_short_text_excluded_from_simhash(spark):
    # identical short texts, different audio: not near-dups (audio differs,
    # simhash gated by SIMHASH_MIN_TOKENS)
    f = _run(spark, [("a", "h1", "short same text"),
                     ("b", "h2", "short same text")])
    n = "f_" + config.RULE_NEAR_DUP
    assert not f.loc["a", n] and not f.loc["b", n]


def test_null_payload_excluded(spark):
    f = _run(spark, [("a", None, "some text here"), ("b", None, "some text here")])
    assert not f["f_" + config.RULE_EXACT_DUP].any()
    assert not f["f_" + config.RULE_NEAR_DUP].any()


def test_band_recall_exact_for_radius(spark):
    """<=3 differing bits can never touch all 4 bands (pigeonhole)."""
    rng = np.random.default_rng(0)
    for _ in range(50):
        u = int(rng.integers(0, 2**63))
        flips = rng.choice(64, size=3, replace=False)
        v = u
        for b in flips:
            v ^= 1 << int(b)
        shared = any(x == y for x, y in
                     zip(simhash_core.bands(u), simhash_core.bands(v)))
        assert shared


def test_bucket_cap_skips_mega_clusters(spark, monkeypatch):
    """Skew guard: band buckets wider than SIMHASH_BUCKET_CAP are skipped
    (their members fall back to exact/audio rules); narrower groups still
    detect.  Forced-low cap so the guard binds on a tiny frame."""
    monkeypatch.setattr(config, "SIMHASH_BUCKET_CAP", 3)
    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays a long and winding tune about distant hills")
    # 5 identical long texts (distinct checksums): every band bucket has
    # width 5 > cap -> no simhash dup flags
    mega = [(f"m{i}", f"ck{i}", base) for i in range(5)]
    out = _run(spark, mega)
    assert not out["f_" + config.RULE_NEAR_DUP].any()

    # a pair under the cap is still caught
    pair = [("p0", "ckA", base), ("p1", "ckB", base)]
    out2 = _run(spark, pair)
    assert not out2.loc["p0", "f_" + config.RULE_NEAR_DUP]
    assert out2.loc["p1", "f_" + config.RULE_NEAR_DUP]


def test_null_checksum_window_is_salted(spark):
    """Skew guard: the null checksum key (missing/undecodable payloads)
    must be salted in the window partitioning — a majority-null corpus
    cannot funnel into one reducer — while flags stay correct."""
    rows = [(f"n{i:03d}", None, f"text number {i}") for i in range(40)]
    rows += [("d1", "hX", "dup text"), ("d2", "hX", "dup text")]
    out = dedup.with_dup_flags(_scored(spark, rows))
    f = out.toPandas().set_index("clip_id")
    e = "f_" + config.RULE_EXACT_DUP
    assert not f.loc[[r[0] for r in rows[:40]], e].any()
    assert not f.loc["d1", e] and f.loc["d2", e]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(pcm_checksum" in plan
    assert "_dup_salt" in plan


def test_skew_injected_band_join_matches_oracle(spark, monkeypatch):
    """Adversarial skew injection for the band self-join: one degenerate
    band bucket wider than SIMHASH_BUCKET_CAP coexists with genuine
    near-dup pairs.  The cap must (a) exclude the degenerate bucket,
    (b) NOT suppress a clip that shares the hot bucket but matches its
    near-dup through a different, narrow band, and (c) leave flags equal
    to an independent re-implementation of the oracle's bucket logic
    (tests/oracle.py)."""
    monkeypatch.setattr(config, "SIMHASH_BUCKET_CAP", 4)

    def srow(cid, u):
        b = simhash_core.bands(u)
        return (cid, 0, f"unique text for {cid}", f"ck_{cid}",
                simhash_core.to_signed64(u), b[0], b[1], b[2], b[3])

    hot_band0 = 0x1234
    rows = []
    sims = {}
    # mega cluster: 6 identical simhashes -> every band bucket width 6 > 4
    mega_u = hot_band0 | (0xAAAA << 16) | (0x5555 << 32) | (0x0F0F << 48)
    for i in range(6):
        cid = f"m{i}"
        rows.append(srow(cid, mega_u))
        sims[cid] = mega_u
    # cross case: x0/x1 share the HOT band0 (bucket width 8 > cap) but are
    # hamming-1 of each other and meet in their own narrow band2 bucket
    x0 = hot_band0 | (0x1111 << 16) | (0x7777 << 32) | (0x9999 << 48)
    x1 = x0 ^ (1 << 20)  # flip a band1 bit -> band0, band2, band3 shared
    rows += [srow("x0", x0), srow("x1", x1)]
    sims["x0"], sims["x1"] = x0, x1
    # clean pair in entirely cold buckets
    p0 = (0x4444) | (0xBBBB << 16) | (0x2222 << 32) | (0xD00D << 48)
    p1 = p0 ^ (1 << 2)
    rows += [srow("p0", p0), srow("p1", p1)]
    sims["p0"], sims["p1"] = p0, p1

    df = spark.createDataFrame(
        rows, "clip_id string, part_id int, transcript string, "
              "pcm_checksum string, simhash long, band0 int, band1 int, "
              "band2 int, band3 int")
    got = (dedup.with_dup_flags(df).toPandas()
           .set_index("clip_id")["f_" + config.RULE_NEAR_DUP].to_dict())

    # independent oracle-style recompute (bucket -> cap skip -> pairwise)
    buckets: dict = {}
    for cid in sorted(sims):
        for bi, bv in enumerate(simhash_core.bands(sims[cid])):
            buckets.setdefault((bi, bv), []).append(cid)
    exp = {cid: False for cid in sims}
    for ids in buckets.values():
        if len(ids) > config.SIMHASH_BUCKET_CAP:
            continue
        for i in range(len(ids)):
            for j in range(i):
                a, b = ids[i], ids[j]
                if simhash_core.hamming(sims[a], sims[b]) \
                        <= config.SIMHASH_HAMMING_MAX:
                    exp[a] = True
    assert got == exp
    # and the scenario really is what the docstring claims:
    assert not any(exp[f"m{i}"] for i in range(6))  # mega bucket skipped
    assert exp["x1"] and not exp["x0"]  # hot-band clip caught via cold band
    assert exp["p1"] and not exp["p0"]


def test_simhash_batch_matches_scalar_exactly():
    """dedup_batch (the scoring UDF's vectorized path) must emit the same
    signed simhash + band values as the scalar simhash_for_dedup /
    to_signed64 / bands chain the pandas oracle uses — integer-exact."""
    import numpy as np

    from engine import simhash_core, templates

    rng = np.random.default_rng(11)
    texts = ["", None, "a b c", " ".join(["tok"] * 20)]
    for lang in templates.LANGS:
        words = " ".join(templates.SENTENCES[lang][:6]).split()
        for n in (3, 15, 16, 17, 40, 200):
            texts.append(" ".join(
                words[int(rng.integers(0, 5)):][:n]))
    signed, band_vals = simhash_core.dedup_batch(texts)
    for i, t in enumerate(texts):
        u = simhash_core.simhash_for_dedup(t)
        assert signed[i] == simhash_core.to_signed64(u)
        assert band_vals[i].tolist() == simhash_core.bands(u)


def test_simhash_memory_chunking_is_bit_identical(monkeypatch):
    """simhash64_batch bounds peak memory via _SHINGLE_CHUNK-sized chunks
    split at text boundaries; a forced tiny chunk size must reproduce the
    default output exactly (the vote is segment-local)."""
    import numpy as np

    from engine import simhash_core, templates

    texts = ["", None, "a b c", " ".join(["tok"] * 200)]
    for lang in templates.LANGS:
        texts.append(" ".join(templates.SENTENCES[lang][:8]))
    ref_signed, ref_bands = simhash_core.dedup_batch(texts)
    monkeypatch.setattr(simhash_core, "_SHINGLE_CHUNK", 3)
    c_signed, c_bands = simhash_core.dedup_batch(texts)
    assert np.array_equal(ref_signed, c_signed)
    assert np.array_equal(ref_bands, c_bands)
