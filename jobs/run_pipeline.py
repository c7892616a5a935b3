"""Run the full quality-filter pipeline over a clips table.

Ship (north_rule):
    cd <repo> && zip -qr /tmp/engine.zip engine
    spark-submit --master 'local[32]' --py-files /tmp/engine.zip \
        jobs/run_pipeline.py --input /path/clips --output /path/out \
        [--wave-size 16] [--no-resume] [--no-checkpoint]

Output layout:
    out/scored/part_id=*/    per-partition checkpoint of the heavy stage
    out/labels/part_id=*/    final keep/drop + scrub labels
    out/lineage/             per-partition metrics (FIXTURES.md Table 3)
    out/_state/              commit log (part_id, stage, rule_version)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# One BLAS/OpenMP thread per Python UDF worker (same pin as bench.py):
# with K concurrent workers an unpinned numpy thread pool oversubscribes
# the box K*ncpus-fold, and even a single worker pays the pool's wake
# cost on every small per-clip reduction.  Must be set before the JVM
# starts so forked python workers inherit it; on a real cluster the
# equivalent is spark.executorEnv.*.
for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
             "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_var, "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--wave-size", type=int, default=16)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--no-checkpoint", action="store_true",
                    help="single fused in-memory pass, labels only")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from engine import config, lineage, sources
    from engine.operators import pipeline

    spark = (SparkSession.builder.appName("clip-quality-pipeline")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     str(config.ARROW_MAX_RECORDS_PER_BATCH))
             .getOrCreate())

    t0 = time.time()
    clips = sources.read_clips_table(spark, args.input)
    if args.no_checkpoint:
        labels, metrics = pipeline.run_pipeline_with_metrics(clips)
        (labels.repartition("part_id").write.mode("overwrite")
         .partitionBy("part_id").parquet(f"{args.output}/labels"))
        metrics.coalesce(1).write.mode("overwrite") \
            .parquet(f"{args.output}/lineage")
        labels = spark.read.parquet(f"{args.output}/labels")
        metrics = spark.read.parquet(f"{args.output}/lineage")
    else:
        labels, metrics = lineage.run_checkpointed(
            spark, clips, args.output,
            wave_size=args.wave_size, resume=not args.no_resume)

    n_total = labels.count()
    summary = metrics.groupBy().agg(
        {"n_kept": "sum", "n_dropped": "sum", "n_scrubbed": "sum"}).collect()[0]
    dt = time.time() - t0
    print(f"pipeline done in {dt:.1f}s: {n_total} clips, "
          f"kept={summary['sum(n_kept)']} dropped={summary['sum(n_dropped)']} "
          f"scrubbed={summary['sum(n_scrubbed)']} "
          f"({n_total / dt:.0f} clips/sec) rule_version={config.rule_version()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
