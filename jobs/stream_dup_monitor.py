"""Streaming duplicate monitor: cross-batch exact + near-dup flags over a
scored clip stream, shippable via spark-submit --py-files.

    spark-submit --py-files engine.zip jobs/stream_dup_monitor.py \
        --input <scored parquet dir> --output <flags dir> \
        [--checkpoint <dir>] [--available-now]

Reads a STREAM of scored rows (the columns scoring.score_clips emits —
e.g. the checkpointed `scored/` table of run_pipeline, or any directory
another job appends scored batches to) and maintains two TTL-bounded
state stores (engine/streaming/stateful.py):

  * exact audio dups   — one marker per pcm_checksum;
  * textual near-dups  — at most SIMHASH_BUCKET_CAP signatures per
    simhash band bucket.

Each sink batch folds the near-dup band rows to one row per clip
(clip-level flag = OR over its bands — done HERE, batch-side, because an
append-mode stream cannot re-aggregate its own stateful output) and
writes `flags/batch_id={id}` idempotently, same retry contract as
stream_pipeline.  The periodic batch reconcile job (reconcile_dups.py)
remains the canonical authority; this monitor is the low-latency
approximation of the documented lambda split.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("clip-stream-dup-monitor")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    # without this, a query holding registered processing-time timeouts
    # (the TTL state) schedules empty no-data micro-batches back-to-back
    # until a timer fires — under availableNow that is an hour-long spin
    # instead of termination (measured: ~100 empty batches before the
    # debug kill).  The monitor doesn't need timer-driven eviction between
    # data batches; expired state is evicted on the next data batch, and
    # the batch reconcile job is the authority anyway.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    from engine.operators import scoring
    from engine.streaming import stateful

    stream = (spark.readStream
              .schema(scoring.SCORED_SCHEMA)
              .option("maxFilesPerTrigger", args.max_files_per_trigger)
              .parquet(args.input))

    near = stateful.stream_neardup_flags(stream)

    def _sink(batch_df, batch_id: int) -> None:
        folded = (batch_df.groupBy("clip_id")
                  .agg(F.max("f_stream_neardup").alias("f_stream_neardup")))
        # no coalesce(1): a production trigger can carry millions of rows,
        # and the fold's groupBy output is already AQE-sized
        (folded.write.mode("overwrite")
         .parquet(f"{args.output}/neardup/batch_id={batch_id}"))

    ckpt = args.checkpoint or f"{args.output}/_checkpoint"
    writer = (near.writeStream
              .foreachBatch(_sink)
              .outputMode("append")
              .option("checkpointLocation", ckpt))
    if args.available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
