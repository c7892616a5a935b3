"""Periodic global-dedup reconciliation for the streaming ingest path.

Ship (north_rule):
    cd <repo> && zip -qr /tmp/engine.zip engine
    spark-submit --master 'local[32]' --py-files /tmp/engine.zip \
        jobs/reconcile_dups.py --clips /path/clips \
        --stream-labels /path/stream_out/labels --output /path/reconciled

Recomputes the global batch answer over the accumulated clips table,
writes it as the corrected labels, and prints/writes the diff vs the
streaming labels.  Exits non-zero if any flip is NOT duplicate-rule
related (that would mean nondeterminism, not late dup discovery).
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", required=True)
    ap.add_argument("--stream-labels", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from engine import config
    from engine.streaming import reconcile

    spark = (SparkSession.builder.appName("clip-quality-reconcile")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     str(config.ARROW_MAX_RECORDS_PER_BATCH))
             .getOrCreate())

    stream_labels = spark.read.parquet(args.stream_labels)
    corrected, diff = reconcile.reconcile(spark, args.clips, stream_labels)

    (corrected.repartition("part_id").write.mode("overwrite")
     .partitionBy("part_id").parquet(f"{args.output}/labels"))
    # diff volume scales with the cross-batch dup rate (at 10^12 clips a
    # few-% rate is 10^10 rows), so no coalesce(1) here: keep the upstream
    # (AQE-sized) partitioning — unlike the O(n_parts)-bounded lineage/
    # report writes, this table is corpus-sized in the worst case
    diff.write.mode("overwrite").parquet(f"{args.output}/diff")

    d = spark.read.parquet(f"{args.output}/diff")
    n_flips = d.count()
    n_bad = d.where(~F.col("dup_related")).count()
    print(f"reconcile: {n_flips} label flips vs streaming "
          f"({n_flips - n_bad} dup-related, {n_bad} UNEXPLAINED)")
    spark.stop()
    if n_bad:
        print("ERROR: non-dup flips indicate nondeterminism", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
