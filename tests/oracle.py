"""Pure-pandas oracle: deliberately slow, obviously-correct re-implementation
of the engine's rule semantics (FIXTURES.md Table 2; SURVEY.md §5.2-1).

No Spark anywhere.  Row-at-a-time loops, dict-based grouping — the shape of
the reference's own R loops.  The model/scrub/simhash *math* is imported
from engine/*_core.py on purpose (shared single source of truth for
deterministic artifacts — see scrub_core docstring); every *pipeline*
semantic — rule definitions, precedence, dedup canonicalization, flag
tri-state handling — is re-implemented here independently of the Spark
code, so the comparison catches fusion/ordering/distribution bugs.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from engine import audio_core, config, lid_core, ppl_core, scrub_core, simhash_core


def _alpha_ratio(t: str) -> float:
    return sum(ch.isalpha() for ch in t) / len(t)


def _normalize(t: str) -> str:
    """Repair normalization, independently re-implemented: control chars ->
    space, collapse ASCII whitespace runs, trim.  ASCII-explicit classes on
    purpose — engine/operators/repair.py documents why \\s is banned."""
    t = re.sub("[\x00-\x1f\x7f]", " ", t)
    t = re.sub("[ \t\n\x0b\f\r]+", " ", t)
    return t.strip(" ")


def label_clips(clips: pd.DataFrame) -> pd.DataFrame:
    """clips (clip_id, bytes, sr_hz, dur_ms, codec, transcript[, part_id])
    -> expected_labels frame (one row per clip, keyed by clip_id)."""
    rows = []
    per = {}  # clip_id -> dict of intermediates

    for r in clips.itertuples(index=False):
        t = r.transcript if isinstance(r.transcript, str) else None
        dur = int(r.dur_ms) if pd.notna(r.dur_ms) else None
        sr = int(r.sr_hz) if pd.notna(r.sr_hz) else None
        payload = bytes(r.bytes) if r.bytes is not None else None

        flags: dict[str, bool] = {}

        flags[config.RULE_DUR_BOUNDS] = (
            dur is None or dur < config.DUR_MS_MIN or dur > config.DUR_MS_MAX)
        flags[config.RULE_SR_INVALID] = sr not in config.SR_ALLOWLIST

        canon = None
        if r.codec is not None and isinstance(r.codec, str):
            lowered = r.codec.strip().lower()
            canon = config.CODEC_ALIASES.get(lowered, lowered)
        flags[config.RULE_CODEC_INVALID] = canon not in config.CODEC_ALLOWLIST

        # decode through the same codec dispatch as the engine: a payload
        # whose decoder is missing or rejects the bytes is UNDECODABLE and
        # contributes NO features (never PCM-interpreted)
        pcm = audio_core.decode_payload(payload, canon)
        flags[config.RULE_UNDECODABLE] = payload is not None and (
            pcm is None or pcm.size == 0)

        flags[config.RULE_TXT_EMPTY] = t is None or t.strip() == ""
        flags[config.RULE_TXT_LEN] = (
            t is not None
            and (len(t) < config.TXT_LEN_MIN or len(t) > config.TXT_LEN_MAX))

        ratio_bad = False
        if t is not None and len(t) > 0:
            if _alpha_ratio(t) < config.ALPHA_RATIO_MIN:
                ratio_bad = True
            if dur is not None and dur > 0:
                cps = len(t) / (dur / 1000.0)
                if cps > config.CHARS_PER_SEC_MAX or cps < config.CHARS_PER_SEC_MIN:
                    ratio_bad = True
        flags[config.RULE_CHAR_RATIO] = ratio_bad

        # repair-then-rescore (engine/operators/repair.py): a TXT_LEN /
        # CHAR_RATIO failure whose normalized text clears all text rules is
        # kept with the repaired transcript; scrub/LID/PPL/simhash below
        # then score the repaired text
        repaired = False
        if (flags[config.RULE_TXT_LEN] or flags[config.RULE_CHAR_RATIO]) \
                and t is not None:
            norm = _normalize(t)
            if norm != t and len(norm) > 0:
                ok = config.TXT_LEN_MIN <= len(norm) <= config.TXT_LEN_MAX
                if ok and _alpha_ratio(norm) < config.ALPHA_RATIO_MIN:
                    ok = False
                if ok and dur is not None and dur > 0:
                    cps = len(norm) / (dur / 1000.0)
                    if cps > config.CHARS_PER_SEC_MAX \
                            or cps < config.CHARS_PER_SEC_MIN:
                        ok = False
                if ok:
                    repaired = True
                    t = norm
                    flags[config.RULE_TXT_EMPTY] = False
                    flags[config.RULE_TXT_LEN] = False
                    flags[config.RULE_CHAR_RATIO] = False

        # features over the dispatched decode (codec-aware)
        _undec, feats, frame_feats = audio_core.analyze(payload, sr, canon)
        dec_dur, n_samp, rms, clip_ratio, checksum = feats
        mismatch = False
        if dur is not None and dur > 0 and sr in config.SR_ALLOWLIST:
            mismatch = (dec_dur is None
                        or abs(dec_dur - dur) / dur > config.DUR_MISMATCH_FRAC)
        flags[config.RULE_DUR_MISMATCH] = mismatch

        silence_ratio, _flatness, _mel = frame_feats
        flags[config.RULE_SILENCE] = (
            silence_ratio is not None
            and silence_ratio > config.SILENCE_RATIO_MAX)

        scrubbed, n_hits, severe = scrub_core.scrub(t)
        lang, margin = lid_core.score_text(scrubbed or "")
        ppl = ppl_core.perplexity(scrubbed or "", lang)

        flags[config.RULE_LID_LOWCONF] = margin < config.LID_MARGIN_MIN
        flags[config.RULE_HIGH_PPL] = ppl > config.PPL_MAX
        flags[config.RULE_TOXIC] = severe

        simhash = simhash_core.simhash_for_dedup(scrubbed)
        per[r.clip_id] = {
            "checksum": checksum, "transcript": t, "simhash": simhash,
            "flags": flags, "scrubbed": scrubbed, "n_hits": n_hits,
            "repaired": repaired,
            "lang": lang, "margin": margin, "ppl": ppl,
            "dec_dur": dec_dur, "rms": rms, "clip_ratio": clip_ratio,
            "silence_ratio": silence_ratio,
        }

    # ---- duplicate groups (global, order-explicit) -----------------------
    exact_min: dict[tuple, str] = {}
    audio_min: dict[str, str] = {}
    for cid in sorted(per):
        p = per[cid]
        if p["checksum"] is not None and p["transcript"] is not None:
            k = (p["checksum"], p["transcript"])
            exact_min.setdefault(k, cid)
        if p["checksum"] is not None:
            audio_min.setdefault(p["checksum"], cid)

    # simhash banding: candidates sharing a band, verify hamming <= max,
    # drop iff a smaller clip_id near-dup exists
    buckets: dict[tuple[int, int], list[str]] = {}
    for cid in sorted(per):
        u = per[cid]["simhash"]
        if u == 0:
            continue
        for bi, bv in enumerate(simhash_core.bands(u)):
            buckets.setdefault((bi, bv), []).append(cid)
    sim_dup: set[str] = set()
    for ids in buckets.values():
        if len(ids) > config.SIMHASH_BUCKET_CAP:  # skew guard, mirrors dedup.py
            continue
        for i in range(len(ids)):
            for j in range(i):
                a, b = ids[i], ids[j]  # ids sorted asc -> b < a
                if simhash_core.hamming(per[a]["simhash"], per[b]["simhash"]) \
                        <= config.SIMHASH_HAMMING_MAX:
                    sim_dup.add(a)

    for cid, p in per.items():
        flags = p["flags"]
        is_exact = (p["checksum"] is not None and p["transcript"] is not None
                    and exact_min[(p["checksum"], p["transcript"])] != cid)
        is_audio = (p["checksum"] is not None and audio_min[p["checksum"]] != cid)
        flags[config.RULE_EXACT_DUP] = is_exact
        flags[config.RULE_NEAR_DUP] = is_audio or (cid in sim_dup)

        drop_reason = None
        for rule in config.RULE_ORDER:
            if flags[rule]:
                drop_reason = rule
                break
        rows.append({
            "clip_id": cid,
            "keep": drop_reason is None,
            "drop_reason": drop_reason,
            "rule_flags": dict(flags),
            "lang": p["lang"],
            "lid_margin": p["margin"],
            "ppl_score": p["ppl"],
            "scrubbed_transcript": p["scrubbed"],
            "n_scrub_hits": p["n_hits"],
            "repaired": p["repaired"],
            "decoded_dur_ms": p["dec_dur"],
            "rms": p["rms"],
            "clipping_ratio": p["clip_ratio"],
            "silence_ratio": p["silence_ratio"],
            "pcm_checksum": p["checksum"],
        })

    out = pd.DataFrame(rows).sort_values("clip_id").reset_index(drop=True)
    return out


def md5_bytes(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()
