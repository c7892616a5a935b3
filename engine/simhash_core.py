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


def _shingles(text: str | None) -> list[str]:
    toks = (text or "").lower().split()
    if not toks:
        return []
    k = config.SIMHASH_SHINGLE_K
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def simhash64(text: str | None) -> int:
    """64-bit SimHash as an unsigned python int (0 for empty text).
    Scalar form = batch of one (the batch bit-vote is segment-local, so
    both forms are bit-identical — integer arithmetic throughout)."""
    return int(simhash64_batch([text])[0])


_SHINGLE_CHUNK = 1 << 19  # max shingles whose vote arrays are live at once


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized batch SimHash -> uint64 array (0 for empty texts).

    Per-batch shape (north_star: "batched n-gram hashing"): shingle
    strings are deduplicated within a chunk and blake2b-hashed once per
    DISTINCT shingle (boilerplate n-grams repeat heavily in a web
    corpus); the bit votes then run as one unpackbits + one
    np.add.reduceat over the concatenated digest buffer + one packbits —
    no per-row Python bit loop.  The digest per shingle is unchanged, so
    values are identical to hashing row-at-a-time.

    Peak memory is bounded like lid_core/ppl_core: shingle lists, digest
    cache, and the (n_shingles x 64) bit matrix are materialized per
    chunk of <= _SHINGLE_CHUNK shingles, chunks split at text boundaries
    (bit-identical — the vote is segment-local).  Normal Arrow batches
    fit one chunk, so the cross-text dedup cache is unaffected there."""
    out = np.zeros(len(texts), dtype=np.uint64)
    idxs: list[int] = []
    counts: list[int] = []
    all_shingles: list[str] = []

    def _flush() -> None:
        if not idxs:
            return
        _vote_chunk(idxs, counts, all_shingles, out)
        idxs.clear()
        counts.clear()
        all_shingles.clear()

    for i, t in enumerate(texts):
        sh = _shingles(t)
        if not sh:
            continue
        if all_shingles and len(all_shingles) + len(sh) > _SHINGLE_CHUNK:
            _flush()
        idxs.append(i)
        counts.append(len(sh))
        all_shingles.extend(sh)
    _flush()
    return out


def _vote_chunk(idxs: list, counts: list, all_shingles: list,
                out: np.ndarray) -> None:
    """Majority bit-vote for one chunk of non-empty texts, in place."""
    cache: dict[str, bytes] = {}
    buf = bytearray()
    for s in all_shingles:
        d = cache.get(s)
        if d is None:
            d = _shingle_digest(s)
            cache[s] = d
        buf += d

    counts_a = np.array(counts, dtype=np.int64)
    seg = np.zeros(len(idxs), dtype=np.int64)
    np.cumsum(counts_a[:-1], out=seg[1:])

    raw = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(-1, 8)
    bits = np.unpackbits(raw, axis=1, bitorder="little")  # (n_shingles, 64)
    # int32 accumulator (via reduceat dtype, no materialized int32 copy):
    # a pathological multi-100k-token transcript (all rows get all
    # scores, even TXT_LEN failures) would overflow 16 bits
    votes = np.add.reduceat(bits, seg, axis=0, dtype=np.int32)
    # majority: bit set iff (#ones) * 2 > #shingles  <=>  acc > 0 in the
    # +1/-1 vote formulation
    pos = (2 * votes > counts_a[:, None])
    out[np.array(idxs, dtype=np.int64)] = \
        np.packbits(pos, axis=1, bitorder="little").view("<u8").ravel()


def simhash_for_dedup(text: str | None) -> int:
    """SimHash used by the NEAR_DUP rule: 0 (= excluded from banding) for
    texts shorter than SIMHASH_MIN_TOKENS tokens; see config for rationale.
    Shared by the Spark scoring UDF (batch form below) and the oracle."""
    toks = (text or "").split()
    if len(toks) < config.SIMHASH_MIN_TOKENS:
        return 0
    return simhash64(text)


def dedup_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Batch form of the NEAR_DUP signature for the scoring UDF:
    (signed int64 simhashes, (n, SIMHASH_BANDS) int32 band values).
    Identical values to calling simhash_for_dedup / to_signed64 / bands
    per row (pinned by tests/test_dedup.py)."""
    gated = [t if isinstance(t, str)
             and len(t.split()) >= config.SIMHASH_MIN_TOKENS else None
             for t in texts]
    u = simhash64_batch(gated)
    signed = u.view(np.int64)  # two's-complement reinterpret == to_signed64
    w = np.uint64(config.SIMHASH_BAND_BITS)
    mask = np.uint64((1 << config.SIMHASH_BAND_BITS) - 1)
    band_vals = np.empty((len(texts), config.SIMHASH_BANDS), dtype=np.int32)
    for i in range(config.SIMHASH_BANDS):
        band_vals[:, i] = ((u >> (np.uint64(i) * w)) & mask).astype(np.int32)
    return signed, band_vals


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
