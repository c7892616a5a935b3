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
