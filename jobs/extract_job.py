"""spark-submit entry point for the extraction pipeline.

Production shape (north rule):
    spark-submit --py-files engine.zip jobs/extract_job.py \
        --input iceberg:catalog.db.docs --output s3://bucket/out \
        --checkpoint s3://bucket/ckpt --partitions 4096

Sandbox shape (local[N], parquet):
    python jobs/extract_job.py --generate 20000 --cores 32 \
        --workdir /tmp/zx-run

Prints one JSON line with counters + docs/sec (job-recorded, not
JVM-boot wall clock — BASELINE.md protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="documents table path")
    ap.add_argument("--output", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--generate", type=int, default=0,
                    help="synthesize N interleaved docs first (seed=42)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workdir", default="/tmp/zhtml-spark-job")
    args = ap.parse_args()

    from zhtml_spark.corpus import corpus_dataframe
    from zhtml_spark.pipeline import build_session, run_job

    spark = build_session(app="zhtml-extract", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    input_path = args.input
    if args.generate:
        input_path = input_path or f"{args.workdir}/input-{args.generate}-{args.seed}"
        if not os.path.exists(input_path):
            corpus_dataframe(spark, args.generate, seed=args.seed).write.mode(
                "overwrite"
            ).parquet(input_path)
    if not input_path:
        ap.error("--input or --generate required")

    output = args.output or f"{args.workdir}/out-{int(time.time())}"

    t0 = time.time()
    stats = run_job(
        spark,
        input_path,
        output,
        checkpoint_path=args.checkpoint,
        num_partitions=args.partitions,
    )
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "docs_per_sec",
                "value": round(stats["docs"] / elapsed, 2) if elapsed else 0,
                "unit": "docs/sec",
                "elapsed_sec": round(elapsed, 2),
                "cores": args.cores,
                **stats,
                "mb_per_sec": round((stats["bytes"] or 0) / 1e6 / elapsed, 2),
                "output": output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
