"""Repair-then-rescore: salvage rows instead of tombstoning them.

Graft of the reference's repair family R1-R7, which rewrites rows and
keeps them rather than dropping (endpoint imputation
Step2-Data-Incompleteness.R:349-454; gap interpolation Step3:1083-1703;
spatial snap/repair Step4:310-487).  The transcript analog: a row failing
TXT_LEN/CHAR_RATIO only because of whitespace/control-character damage is
NORMALIZED (control chars -> space, ASCII-whitespace-run collapse, trim),
re-evaluated against the same text rules, and — if the normalized text
now passes — re-scored with the same scrub/LID/PPL/simhash models and
kept with `repaired = True` lineage.  A row the repair cannot rescue
keeps its original transcript and original failure.

Scale shape: the candidate predicate filters BEFORE the rescore UDF, so
the second Python crossing sees only the few-percent damaged subset (the
main fused UDF still runs exactly once over the full table).  The
merge-back is a UNION of two branches — non-rescued rows flow through a
narrow filter with NO shuffle, and only the candidate subset pays a
(candidate x rescored) join — so repair never shuffles the full table;
at 10^12 rows the joined volume is bounded by the damage rate, not the
corpus size.

Whitespace class is ASCII-EXPLICIT in both engines and the oracle: Java's
\\s and Python's re \\s disagree on unicode spaces, so the normalization
regex never uses bare \\s.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import config, lid_core, ppl_core, scrub_core, simhash_core

CTRL_CLASS = "[\\x00-\\x1F\\x7F]"
WS_RUN = "[ \\t\\n\\x0B\\f\\r]+"


def normalize_col(t: Column) -> Column:
    """control chars -> space, collapse ASCII whitespace runs, trim."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(t, CTRL_CLASS, " "), WS_RUN, " "))


RESCORED_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("r_transcript", T.StringType(), False),
    T.StructField("r_scrubbed", T.StringType(), True),
    T.StructField("r_n_scrub_hits", T.IntegerType(), False),
    T.StructField("r_tox_severe", T.BooleanType(), False),
    T.StructField("r_lang", T.StringType(), False),
    T.StructField("r_lid_margin", T.DoubleType(), False),
    T.StructField("r_ppl_score", T.DoubleType(), False),
    T.StructField("r_simhash", T.LongType(), False),
] + [T.StructField(f"r_band{i}", T.IntegerType(), False) for i in range(4)])


def _rescore_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Text-only re-score of repaired transcripts: same model math as the
    fused scoring UDF (scoring._score_batch), minus the audio columns."""
    txts = pdf["r_transcript"].tolist()
    scrubbed, hits, severe = scrub_core.scrub_batch(txts)
    langs, margins = lid_core.score_batch(scrubbed)
    ppls = ppl_core.perplexity_batch(scrubbed, langs)
    sims, bands = [], [[], [], [], []]
    for t in scrubbed:
        u = simhash_core.simhash_for_dedup(t)
        sims.append(simhash_core.to_signed64(u))
        for bi, bv in enumerate(simhash_core.bands(u)):
            bands[bi].append(bv)
    out = pd.DataFrame({
        "clip_id": pdf["clip_id"].values,
        "r_transcript": pdf["r_transcript"].values,
        "r_scrubbed": scrubbed,
        "r_n_scrub_hits": pd.array(hits, dtype="int32"),
        "r_tox_severe": severe,
        "r_lang": langs,
        "r_lid_margin": margins,
        "r_ppl_score": ppls,
        "r_simhash": pd.array(sims, dtype="int64"),
    })
    for i in range(4):
        out[f"r_band{i}"] = pd.array(bands[i], dtype="int32")
    return out


def _rescore_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _rescore_batch(pdf)


# columns replaced by the rescored values when a row is repaired
_MERGE = {
    "transcript": "r_transcript",
    "scrubbed_transcript": "r_scrubbed",
    "n_scrub_hits": "r_n_scrub_hits",
    "tox_severe": "r_tox_severe",
    "lang": "r_lang",
    "lid_margin": "r_lid_margin",
    "ppl_score": "r_ppl_score",
    "simhash": "r_simhash",
    **{f"band{i}": f"r_band{i}" for i in range(4)},
}


def with_repair(df: DataFrame) -> DataFrame:
    """df (scored + heuristic flags) -> df with `repaired` column; rescued
    rows carry the normalized transcript, rescored model columns, and
    cleared text flags.  Runs BEFORE model flags and dedup so both see the
    repaired values (a repaired transcript participates in dup groups)."""
    t = F.col("transcript")
    # guard the normalization behind the candidate flags: the two regex
    # passes only run for rows that failed a text rule (few %), not the
    # whole corpus; _norm stays null elsewhere and every predicate below
    # collapses to false through null-conjunction semantics
    norm = F.when(F.col("f_" + config.RULE_TXT_LEN)
                  | F.col("f_" + config.RULE_CHAR_RATIO),
                  normalize_col(t))

    # re-evaluate the text rules on the normalized text — same definitions
    # as heuristics.with_heuristic_flags
    n_chars = F.length("_norm")
    n_alpha = F.length(F.regexp_replace(F.col("_norm"), r"[^\p{L}]", ""))
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars.cast("double"))
    dur = F.col("dur_ms")
    cps = F.when((n_chars > 0) & dur.isNotNull() & (dur > 0),
                 n_chars.cast("double") / (dur.cast("double") / F.lit(1000.0)))
    ok_len = (n_chars >= config.TXT_LEN_MIN) & (n_chars <= config.TXT_LEN_MAX)
    ok_ratio = ~(
        F.coalesce(alpha_ratio < config.ALPHA_RATIO_MIN, F.lit(False))
        | F.coalesce(cps > config.CHARS_PER_SEC_MAX, F.lit(False))
        | F.coalesce(cps < config.CHARS_PER_SEC_MIN, F.lit(False)))

    cand = ((F.col("f_" + config.RULE_TXT_LEN)
             | F.col("f_" + config.RULE_CHAR_RATIO))
            & t.isNotNull() & (F.col("_norm") != t))
    rescue = cand & (n_chars > 0) & ok_len & ok_ratio

    staged = (df.withColumn("_norm", norm)
              .withColumn("_rescue", rescue))

    # untouched branch: narrow filter, NO shuffle of the main table
    untouched = (staged.where(~F.col("_rescue"))
                 .withColumn("repaired", F.lit(False)))

    # candidate branch: compact the (few-%) subset before the UDF — without
    # the repartition the rescore stage inherits the full scan's partition
    # count and pays one Python-worker round-trip per mostly-empty
    # partition (measured 3x on the whole pipeline).  repartition, NOT
    # coalesce: coalesce would collapse the parent filter stage's
    # parallelism too, and that stage reads the full scored table.
    cand = staged.where(F.col("_rescue"))
    rescored = (cand
                .select("clip_id", F.col("_norm").alias("r_transcript"))
                .repartition(8)
                .mapInPandas(_rescore_iter, schema=RESCORED_SCHEMA))
    merged = cand.join(rescored, "clip_id")  # candidate-sized x same — tiny
    for dst, src in _MERGE.items():
        merged = merged.withColumn(dst, F.col(src))
    for rule in (config.RULE_TXT_EMPTY, config.RULE_TXT_LEN,
                 config.RULE_CHAR_RATIO):
        merged = merged.withColumn(f"f_{rule}", F.lit(False))
    merged = merged.withColumn("repaired", F.lit(True)) \
        .drop(*RESCORED_SCHEMA.fieldNames()[1:])

    return untouched.unionByName(merged).drop("_norm", "_rescue")
