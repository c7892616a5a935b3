"""Keep/drop decision: first failing rule in canonical order wins.

Graft of the reference's fixed script order (PostProcessing-Pipeline.R:
20-44): Step2 tombstones before Step3 models before Step5 dedup — here a
single `when()` chain over RULE_ORDER instead of six mutating passes.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config

LABEL_COLUMNS = [
    "clip_id", "part_id", "keep", "drop_reason", "rule_flags",
    "lang", "lid_margin", "ppl_score",
    "scrubbed_transcript", "n_scrub_hits", "repaired",
    "decoded_dur_ms", "rms", "clipping_ratio", "silence_ratio", "pcm_checksum",
]


def with_decision(df: DataFrame) -> DataFrame:
    """df with every f_<RULE> column -> + rule_flags map, drop_reason, keep."""
    reason = F.lit(None).cast("string")
    for rule in reversed(config.RULE_ORDER):
        reason = F.when(F.col(f"f_{rule}"), F.lit(rule)).otherwise(reason)
    flags_map = F.create_map(
        *chain.from_iterable((F.lit(r), F.col(f"f_{r}")) for r in config.RULE_ORDER))
    return (df
            .withColumn("rule_flags", flags_map)
            .withColumn("drop_reason", reason)
            .withColumn("keep", F.col("drop_reason").isNull()))


def to_labels(df: DataFrame) -> DataFrame:
    return df.select(*LABEL_COLUMNS)


def lineage_metrics(labels: DataFrame) -> DataFrame:
    """Per-partition lineage/metrics rows (FIXTURES.md Table 3) — graft of
    the per-user issue counts of Step6-Evaluation.R:7-39 at the engine's
    checkpoint granularity."""
    per_reason = (labels
                  .where(~F.col("keep"))
                  .groupBy("part_id", "drop_reason").count())
    reason_maps = (per_reason
                   .groupBy("part_id")
                   .agg(F.map_from_entries(
                       F.collect_list(F.struct("drop_reason", "count"))
                   ).alias("drop_reason_counts")))
    base = (labels.groupBy("part_id").agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
        F.sum((F.col("n_scrub_hits") > 0).cast("long")).alias("n_scrubbed"),
        F.sum(F.col("repaired").cast("long")).alias("n_repaired"),
    ))
    return (base.join(reason_maps, "part_id", "left")
            .withColumn("drop_reason_counts",
                        F.coalesce(F.col("drop_reason_counts"),
                                   F.map_from_arrays(F.array(), F.array())))
            .withColumn("status", F.lit("committed"))
            .withColumn("rule_version", F.lit(config.rule_version()))
            .select("part_id", "status", "n_total", "n_kept", "n_dropped",
                    "drop_reason_counts", "n_scrubbed", "n_repaired",
                    "rule_version"))
