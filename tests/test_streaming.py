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
