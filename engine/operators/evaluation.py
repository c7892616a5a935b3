"""Before/after corpus evaluation — the Step6 graft.

The reference's evaluation pass (Step6-Evaluation.R) computes per-user
error-rate tables (Step6:7-39, split-by-UserId counting loops) and
before/after distribution comparisons (Step6:100-127).  The engine's analog
is a per-language quality report over the labels table: keep rate, per-rule
drop counts, scrub rate, score means — the numbers a corpus owner reads
after a cleaning run.

Skew (north_rule: explicit handling): at 10^12 rows a head language can be
~50% of the corpus (LANG_WEIGHTS plants exactly that skew in the fixtures),
so `lang` is precisely the kind of key AQE's skew-join splitting does NOT
help with (it is an aggregation, not a join).  The report therefore runs as
a TWO-PHASE SALTED aggregation: partial agg on (lang, salt) with
salt = pmod(xxhash64(clip_id), N_SALT) — every reducer holds at most
1/N_SALT of the head key — then a final, cheap agg of N_SALT partial rows
per language.  All measures are algebraic (counts/sums), so the two-phase
split is exact, and a unit test asserts salted == unsalted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config


def _measures() -> list:
    """Algebraic partial measures (sums/counts only — mergeable)."""
    m = [
        F.count("*").alias("n_total"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((F.col("n_scrub_hits") > 0).cast("long")).alias("n_scrubbed"),
        # score means over KEPT rows only — the "after cleaning" view
        # (dropped rows carry sentinel scores, e.g. ppl 1e9 for empty text)
        F.sum(F.when(F.col("keep"), F.col("ppl_score")).otherwise(F.lit(0.0)))
        .alias("_ppl_sum"),
        F.sum((F.col("keep") & F.col("ppl_score").isNotNull()).cast("long"))
        .alias("_ppl_n"),
        F.sum(F.when(F.col("keep"), F.col("silence_ratio")).otherwise(F.lit(0.0)))
        .alias("_sil_sum"),
        F.sum((F.col("keep") & F.col("silence_ratio").isNotNull()).cast("long"))
        .alias("_sil_n"),
    ]
    for rule in config.RULE_ORDER:
        m.append(F.sum((F.col("drop_reason") == rule).cast("long"))
                 .alias(f"_n_{rule}"))
    return m


def corpus_report(labels: DataFrame, salted: bool = True) -> DataFrame:
    """labels -> one row per lang: keep rate, drop_reason counts map,
    scrub rate, mean ppl / silence_ratio (Step6:7-39, 100-127 analog)."""
    if salted:
        partial = (labels
                   .withColumn("_salt", F.pmod(F.xxhash64("clip_id"),
                                               F.lit(config.N_SALT)))
                   .groupBy("lang", "_salt")
                   .agg(*_measures()))
        sums = [F.sum(c).alias(c) for c in partial.columns
                if c not in ("lang", "_salt")]
        agg = partial.groupBy("lang").agg(*sums)
    else:
        agg = labels.groupBy("lang").agg(*_measures())

    reason_map = F.map_from_arrays(
        F.array(*[F.lit(r) for r in config.RULE_ORDER]),
        F.array(*[F.col(f"_n_{r}") for r in config.RULE_ORDER]))
    return (agg
            .withColumn("keep_rate",
                        F.round(F.col("n_kept") / F.col("n_total"), 6))
            .withColumn("scrub_rate",
                        F.round(F.col("n_scrubbed") / F.col("n_total"), 6))
            .withColumn("avg_ppl_kept",
                        F.when(F.col("_ppl_n") > 0,
                               F.round(F.col("_ppl_sum") / F.col("_ppl_n"), 4)))
            .withColumn("avg_silence_kept",
                        F.when(F.col("_sil_n") > 0,
                               F.round(F.col("_sil_sum") / F.col("_sil_n"), 4)))
            .withColumn("drop_reason_counts", reason_map)
            .select("lang", "n_total", "n_kept", "keep_rate", "n_scrubbed",
                    "scrub_rate", "avg_ppl_kept", "avg_silence_kept",
                    "drop_reason_counts")
            .orderBy("lang"))


def corpus_report_by_dim(labels: DataFrame, dim: DataFrame,
                         n_speakers: int) -> DataFrame:
    """Clips-side dimension enrichment — the Step6 demographics join graft
    (Step6-Evaluation.R:54-61 merges a per-user demographics table into
    the issue report with O(n*m) loops; here the small speaker/source
    dimension is BROADCAST into the labels table).

    speaker_id is hash-assigned from clip_id (pmod(xxhash64, n_speakers)) —
    the stand-in for real speaker metadata the input_hint schema doesn't
    carry — then the report aggregates keep/scrub rates per dim attribute.
    The dim is tiny (thousands of speakers vs 10^12 clips), so the join
    side is a broadcast, never a shuffle of the labels table."""
    enriched = (labels
                .withColumn("speaker_id",
                            F.pmod(F.xxhash64("clip_id"),
                                   F.lit(n_speakers)).cast("int"))
                # LEFT join + '<unknown>' bucket: an inner join would
                # silently drop (and under-count) every label row whose
                # speaker_id is missing from the dim — a dim smaller than
                # n_speakers must surface as an <unknown> row, not as a
                # wrong report
                .join(F.broadcast(dim), "speaker_id", "left")
                .withColumn("region", F.coalesce("region", F.lit("<unknown>")))
                .withColumn("device", F.coalesce("device", F.lit("<unknown>"))))
    agg = enriched.groupBy("region", "device").agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((F.col("n_scrub_hits") > 0).cast("long")).alias("n_scrubbed"),
        F.sum(F.col("repaired").cast("long")).alias("n_repaired"))
    return (agg
            .withColumn("keep_rate",
                        F.round(F.col("n_kept") / F.col("n_total"), 6))
            .withColumn("scrub_rate",
                        F.round(F.col("n_scrubbed") / F.col("n_total"), 6))
            .select("region", "device", "n_total", "n_kept", "keep_rate",
                    "n_scrubbed", "scrub_rate", "n_repaired")
            .orderBy("region", "device"))
