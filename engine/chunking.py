"""Greedy length-bounded span splitting shared by the batch scorers.

lid_core and ppl_core bound their O(batch-chars) scoring temporaries by
processing items in chunks of at most `cap` total length, split at item
boundaries (bit-identical to one pass because every per-item reduction is
segment-local).  The boundary rule lives HERE once: accumulate items until
adding the next would exceed `cap`, but always take at least one item per
span (a single oversized item forms its own span rather than looping
forever).

simhash_core intentionally does NOT use this helper: its per-item lengths
(shingle counts) are only known after materializing the shingle lists, so
a spans-over-lengths pass would require holding every list at once —
exactly the O(batch) peak the chunking exists to avoid.  It streams with
an incremental flush instead (simhash_core.simhash64_batch).
"""

from __future__ import annotations


def chunk_spans(lengths, cap: int):
    """Yield (start, end) index spans over `lengths` with sum <= cap per
    span (except single oversized items, which get their own span)."""
    n = len(lengths)
    start = 0
    while start < n:
        end, acc = start, 0
        while end < n and (end == start or acc + lengths[end] <= cap):
            acc += lengths[end]
            end += 1
        yield start, end
        start = end
