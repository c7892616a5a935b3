"""SimHash-64 over token 3-gram shingles (deterministic, shared).

Near-duplicate semantics (shared verbatim by engine and oracle):

  * simhash64(t): 64-bit sign-aggregate of blake2b-hashed token-k-gram
    shingles of the lowercased transcript (k = config.SIMHASH_SHINGLE_K;
    texts shorter than k tokens use the whole token tuple as one shingle).
  * clips X and Y are near-dups iff hamming(simhash(X), simhash(Y)) <=
    SIMHASH_HAMMING_MAX.  Candidate generation is exact for that radius:
    with 4 disjoint 16-bit bands, <=3 differing bits cannot touch all 4
    bands (pigeonhole), so any true pair shares at least one band.
  * X is dropped as NEAR_DUP iff some Y with smaller clip_id is a near-dup
    of X (deterministic canonical = lexicographic min; graft of the
    reference keeping the last row of a duplicate run,
    Step5-Attribute-Redundancy.R:19-42, made order-explicit).

No transitive closure: the rule is pairwise against the canonical ordering,
identical in both implementations.
"""

from __future__ import annotations

import hashlib

import numpy as np

from . import config

_MASK64 = (1 << 64) - 1


def _shingle_digest(shingle: str) -> bytes:
    return hashlib.blake2b(shingle.encode("utf-8"), digest_size=8).digest()


def simhash64(text: str | None) -> int:
    """64-bit SimHash as an unsigned python int (0 for empty text)."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    k = config.SIMHASH_SHINGLE_K
    if len(toks) < k:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    buf = b"".join(_shingle_digest(s) for s in shingles)
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(len(shingles), 8)
    bits = np.unpackbits(raw, axis=1, bitorder="little")  # (n_shingles, 64)
    acc = (2 * bits.astype(np.int32) - 1).sum(axis=0)
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


def simhash_for_dedup(text: str | None) -> int:
    """SimHash used by the NEAR_DUP rule: 0 (= excluded from banding) for
    texts shorter than SIMHASH_MIN_TOKENS tokens; see config for rationale.
    Shared by the Spark scoring UDF and the oracle."""
    toks = (text or "").split()
    if len(toks) < config.SIMHASH_MIN_TOKENS:
        return 0
    return simhash64(text)


def to_signed64(u: int) -> int:
    """Unsigned 64-bit -> signed (Spark LongType representation)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def bands(u: int) -> list[int]:
    """Split into SIMHASH_BANDS disjoint band values (small ints)."""
    w = config.SIMHASH_BAND_BITS
    mask = (1 << w) - 1
    return [(u >> (i * w)) & mask for i in range(config.SIMHASH_BANDS)]


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")
