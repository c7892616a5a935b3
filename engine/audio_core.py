"""PCM s16le decode + batch audio features (numpy, vectorized per clip).

Payloads are raw PCM s16le mono (FIXTURES.md), so decode is exact and the
SNR >= 30 dB invariant is checkable without codec libraries.  Compressed
codecs (flac/opus/mp3) would need external decoders that are not installed
in this sandbox; their decode path is stubbed behind NotImplementedError —
the Spark-side plumbing (schema, batching, UDF signature) is identical.

Graft provenance: decoding the per-row heavy payload is the analog of the
polyline decode `gepaf::decodePolyline` (Step1-Read-Data-Formatting.R:16-32);
recomputing duration from the decoded payload and checking it against the
stored column grafts the reference's recompute-and-check pattern
(Step5-Attribute-Redundancy.R:47-55).
"""

from __future__ import annotations

import hashlib

import numpy as np

INT16_FULL_SCALE = 32768.0
CLIP_THRESHOLD = 32760  # |sample| >= this counts as clipped


def decode_pcm_s16le(payload: bytes | None) -> np.ndarray | None:
    """bytes -> int16 sample array; None/odd-length -> None (undecodable)."""
    if payload is None or len(payload) < 2:
        return None
    n = len(payload) - (len(payload) % 2)
    return np.frombuffer(payload[:n], dtype="<i2")


def decode_compressed(payload: bytes, codec: str) -> np.ndarray:
    """Stub: flac/opus/mp3 decode requires external libs not present here."""
    raise NotImplementedError(
        f"codec {codec!r} decode requires an external decoder; "
        "only pcm_s16le is decodable in this environment")


def features(payload: bytes | None, sr_hz: int | None):
    """-> (decoded_dur_ms, n_samples, rms, clipping_ratio, pcm_checksum).

    All None when the payload is missing/undecodable or sr is unusable.
    """
    pcm = decode_pcm_s16le(payload)
    if pcm is None or pcm.size == 0:
        return None, None, None, None, None
    n = int(pcm.size)
    x = pcm.astype(np.float64) / INT16_FULL_SCALE
    rms = float(np.sqrt(np.mean(x * x)))
    clip_ratio = float(np.mean(np.abs(pcm.astype(np.int32)) >= CLIP_THRESHOLD))
    checksum = hashlib.md5(pcm.tobytes()).hexdigest()
    if sr_hz is None or sr_hz <= 0:
        return None, n, rms, clip_ratio, checksum
    dur = int(round(n / float(sr_hz) * 1000.0))
    return dur, n, rms, clip_ratio, checksum


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """SNR of decoded (int16-normalized) vs the float reference signal."""
    ref = np.asarray(reference, dtype=np.float64)
    dec = np.asarray(decoded, dtype=np.float64) / INT16_FULL_SCALE
    m = min(ref.size, dec.size)
    ref, dec = ref[:m], dec[:m]
    noise = ref - dec
    p_sig = float(np.mean(ref * ref))
    p_noise = float(np.mean(noise * noise))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise)
