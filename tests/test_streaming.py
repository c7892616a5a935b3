"""Streaming ingest: availableNow micro-batches produce the same per-clip
labels as the batch pipeline (modulo cross-batch dedup, which is
documented as a batch-job concern)."""

from __future__ import annotations

from engine import config
from engine.operators import pipeline
from engine.streaming import stream_pipeline


def test_stream_matches_batch_per_clip_rules(spark, clips_t1, tmp_path):
    path, _, _ = clips_t1
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    q = stream_pipeline.start_stream(spark, path, out, ckpt,
                                     available_now=True)
    q.awaitTermination(300)

    got = (spark.read.parquet(f"{out}/labels")
           .toPandas().sort_values("clip_id").reset_index(drop=True))
    batch = (pipeline.run_pipeline(pipeline.read_clips(spark, path))
             .toPandas().sort_values("clip_id").reset_index(drop=True))

    assert len(got) == len(batch)
    # per-clip (non-dedup) rule columns must agree exactly
    dedup_rules = {config.RULE_EXACT_DUP, config.RULE_NEAR_DUP}
    for i in range(len(got)):
        g, b = got["rule_flags"].iloc[i], batch["rule_flags"].iloc[i]
        for rule in config.RULE_ORDER:
            if rule in dedup_rules:
                continue
            assert g[rule] == b[rule], (got["clip_id"].iloc[i], rule)
    assert (got["scrubbed_transcript"].fillna("!")
            == batch["scrubbed_transcript"].fillna("!")).all()

    # streaming dedup is a subset of batch dedup (within-batch only)
    g_dup = got.set_index("clip_id")["rule_flags"].map(
        lambda m: m[config.RULE_EXACT_DUP] or m[config.RULE_NEAR_DUP])
    b_dup = batch.set_index("clip_id")["rule_flags"].map(
        lambda m: m[config.RULE_EXACT_DUP] or m[config.RULE_NEAR_DUP])
    assert (~g_dup | b_dup.loc[g_dup.index]).all()


def test_stateful_running_stats_match_batch(spark, clips_t1, tmp_path):
    """applyInPandasWithState running per-language totals: the final state
    after consuming all micro-batches equals the batch per-clip-rules
    aggregation of the same table."""
    from pyspark.sql import functions as F

    from engine import schema
    from engine.streaming import stateful

    path, _, _ = clips_t1
    stream = (spark.readStream.schema(schema.CLIPS_SCHEMA)
              .option("maxFilesPerTrigger", 8).parquet(path))
    stats = stateful.running_lang_stats(stateful.labeled_clip_stream(stream))
    q = (stats.writeStream.format("memory").queryName("lang_stats")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    # last emitted row per lang == running total after the final batch
    got = (spark.table("lang_stats").toPandas()
           .groupby("lang").last().reset_index()
           .sort_values("lang").reset_index(drop=True))

    batch = spark.read.parquet(path)
    exp = (stateful.labeled_clip_stream(batch)
           .groupBy("lang")
           .agg(F.count("*").alias("n_total"),
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.sum((F.col("n_scrub_hits") > 0).cast("long"))
                .alias("n_scrubbed"))
           .toPandas().sort_values("lang").reset_index(drop=True))
    assert got["lang"].tolist() == exp["lang"].tolist()
    for c in ("n_total", "n_kept", "n_scrubbed"):
        assert got[c].astype(int).tolist() == exp[c].astype(int).tolist(), c
