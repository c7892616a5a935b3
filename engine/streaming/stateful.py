"""Custom stateful streaming operator: running per-language corpus stats.

`stream_pipeline` handles ingest (foreachBatch, full fused pipeline per
micro-batch).  This module adds the *custom stateful operator* surface:
`applyInPandasWithState` maintaining per-language running totals across
micro-batches — the streaming analog of evaluation.corpus_report, emitting
an updated row per language per batch (a live quality dashboard feed).

Scope matches the documented lambda split (stream_pipeline docstring):
per-clip rules only — duplicate rules need global state that never expires
and belong to the periodic batch reconciliation, so the streaming decision
treats dup flags as False.  State per group is O(1) (a few counters), so
state-store size is bounded by the language-key cardinality, not rows.
(The repair stage is also absent from THIS feed: its merge-back is a join,
and stream-stream joins of two derivations of the same source need
watermark plumbing that a dashboard feed doesn't warrant.  The ingest path
in stream_pipeline runs repair — foreachBatch hands it a batch frame.)

`stream_dup_flags` narrows the lambda split: an exact-audio-dup flag
against ALL clips seen within a state TTL, not just the current
micro-batch.  State is one marker per distinct checksum, evicted by
processing-time timeout, so the store is bounded by the distinct-checksum
arrival rate x TTL — the standard bounded-state compromise.  Canonical
semantics differ from batch on purpose: the stream cannot retract an
emitted row, so first-ARRIVAL is canonical, while the batch job's
canonical is the global min clip_id; the reconcile job remains the
authority (its diff report treats dup-rule flips as expected).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import config
from ..operators import decision, heuristics, scoring

STATS_SCHEMA = T.StructType([
    T.StructField("lang", T.StringType(), False),
    T.StructField("n_total", T.LongType(), False),
    T.StructField("n_kept", T.LongType(), False),
    T.StructField("n_scrubbed", T.LongType(), False),
])
_STATE_SCHEMA = T.StructType([
    T.StructField("n_total", T.LongType(), False),
    T.StructField("n_kept", T.LongType(), False),
    T.StructField("n_scrubbed", T.LongType(), False),
])


def _update(key, pdfs, state: GroupState):
    n_total, n_kept, n_scrubbed = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n_total += len(pdf)
        n_kept += int(pdf["keep"].sum())
        n_scrubbed += int((pdf["n_scrub_hits"] > 0).sum())
    state.update((n_total, n_kept, n_scrubbed))
    yield pd.DataFrame({"lang": [key[0]], "n_total": [n_total],
                        "n_kept": [n_kept], "n_scrubbed": [n_scrubbed]})


def labeled_clip_stream(stream_clips: DataFrame) -> DataFrame:
    """streaming clips -> streaming per-clip labels (per-clip rules only;
    dup flags pinned False per the lambda split)."""
    scored = scoring.score_clips(stream_clips)
    flagged = heuristics.with_model_flags(heuristics.with_heuristic_flags(scored))
    for rule in (config.RULE_EXACT_DUP, config.RULE_NEAR_DUP):
        flagged = flagged.withColumn(f"f_{rule}", F.lit(False))
    return decision.with_decision(flagged)


def running_lang_stats(labeled_stream: DataFrame) -> DataFrame:
    """streaming labels -> streaming running (lang, n_total, n_kept,
    n_scrubbed), state updated per micro-batch."""
    return (labeled_stream
            .select("lang", "keep", "n_scrub_hits")
            .groupBy("lang")
            .applyInPandasWithState(
                _update, STATS_SCHEMA, _STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# cross-batch exact-dup flag with TTL-bounded state
# ---------------------------------------------------------------------------

DUP_TTL_MS = 60 * 60 * 1000  # evict a checksum's marker after 1 h idle

DUP_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("f_stream_dup", T.BooleanType(), False),
])
_DUP_STATE = T.StructType([T.StructField("seen", T.BooleanType(), False)])


def _dup_update(key, pdfs, state: GroupState):
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame({"clip_id": pd.Series(dtype="object"),
                            "f_stream_dup": pd.Series(dtype="bool")})
        return
    seen = state.exists
    ids: list = []
    flags: list = []
    for pdf in pdfs:
        # sort for within-batch determinism: the batch's smallest clip_id
        # is its canonical when the checksum is first seen
        for cid in sorted(pdf["clip_id"].tolist()):
            ids.append(cid)
            flags.append(bool(seen))
            seen = True
    state.update((True,))
    state.setTimeoutDuration(DUP_TTL_MS)
    yield pd.DataFrame({"clip_id": ids, "f_stream_dup": flags})


def stream_dup_flags(scored_stream: DataFrame) -> DataFrame:
    """streaming scored clips -> (clip_id, f_stream_dup): True iff another
    clip with the same audio checksum was seen earlier in the stream
    (within DUP_TTL_MS).  Null checksums never flag (missing/undecodable
    payloads are other rules' concern) and are filtered before the shuffle
    so the null key never hits one state partition."""
    src = (scored_stream
           .where(F.col("pcm_checksum").isNotNull())
           .select("pcm_checksum", "clip_id"))
    return (src.groupBy("pcm_checksum")
            .applyInPandasWithState(
                _dup_update, DUP_SCHEMA, _DUP_STATE,
                "append", GroupStateTimeout.ProcessingTimeTimeout))
