"""100× driver-scaling rehearsal (VERDICT r3 #6).

The extraction job's only driver-side planning state is (a) ONE
stats row (total/count/q99) and (b) the giant-doc LPT list, bounded
by construction at O(giants) ≤ max_giants.  This job proves the
bound empirically at 100× the scaling-bench corpus: generate N docs
(default 2M, 10× the r3 scaling corpus which itself is 10× the
bench corpus), run the REAL `run_job` end-to-end at local[CORES],
and report:

* peak driver-python RSS (VmHWM) and peak JVM child RSS — the
  numbers that must stay flat as the corpus grows, because every
  per-doc structure lives executor-side;
* the planning collect sizes: giants actually collected (vs the
  max_giants cap) and the constant 1-row stats collect;
* post-repartition per-partition byte spread (max/mean and p50/p99)
  — the salted-LPT placement quality at width;
* end-to-end docs/sec for the run.

Usage: python jobs/scale_rehearsal.py [--docs 2000000] [--cores 32]
Prints ONE JSON line (BENCH/NOTES.md records it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _vm_hwm_kb(pid: int | str = "self") -> int:
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _jvm_children_hwm_kb() -> int:
    """Max VmHWM over ALL live descendants of this process — the
    local-mode JVM and, transitively, its pyspark worker children
    (code-review r4: a direct-children-only scan missed the workers,
    i.e. the fused UDF stage's actual footprint).  Workers that
    already exited are unobservable via /proc — their peak is bounded
    by the live ones in a steady-state job."""
    ppid_of: dict[str, str] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                ppid_of[pid] = fh.read().split()[3]
        except OSError:
            continue
    descendants: set[str] = set()
    frontier = {str(os.getpid())}
    while frontier:
        nxt = {
            pid for pid, pp in ppid_of.items()
            if pp in frontier and pid not in descendants
        }
        descendants |= nxt
        frontier = nxt
    return max((_vm_hwm_kb(p) for p in descendants), default=0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--workdir", default="/tmp/zx-rehearsal")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from zhtml_spark.corpus import corpus_dataframe
    from zhtml_spark.pipeline import (
        build_session,
        run_job,
        salted_repartition,
        with_doc_bytes,
    )

    spark = build_session(app="zx-rehearsal", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    input_path = f"{args.workdir}/input-{args.docs}-{args.seed}"
    if not os.path.exists(input_path):
        corpus_dataframe(spark, args.docs, seed=args.seed).write.mode(
            "overwrite"
        ).parquet(input_path)

    docs = with_doc_bytes(spark.read.parquet(input_path))
    num_partitions = args.cores * 2

    # ---- planning-pass replica (read-only): what does the driver hold?
    stats = docs.agg(
        F.sum("n_bytes").alias("total"),
        F.count("*").alias("cnt"),
        F.expr("approx_percentile(n_bytes, 0.99, 1000)").alias("q99"),
    ).collect()[0]
    budget = (stats["total"] or 0) / num_partitions
    threshold = max(budget * 0.25, stats["q99"] or 0)
    n_giants = docs.where(F.col("n_bytes") > threshold).count()

    # ---- per-partition byte spread after the salted repartition
    placed = salted_repartition(docs, num_partitions)
    spread = (
        placed.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum("n_bytes").alias("b"))
        .agg(
            F.count("*").alias("parts"),
            F.max("b").alias("max_b"),
            F.mean("b").alias("mean_b"),
            F.expr("percentile(b, 0.5)").alias("p50_b"),
            F.expr("percentile(b, 0.99)").alias("p99_b"),
        )
        .collect()[0]
    )

    # ---- the real job, end to end
    out = f"{args.workdir}/out-{int(time.time())}"
    t0 = time.time()
    job = run_job(spark, input_path, out, num_partitions=num_partitions)
    elapsed = time.time() - t0

    print(json.dumps({
        "metric": "rehearsal_docs_per_sec",
        "value": round(job["docs"] / elapsed, 1),
        "unit": "docs/sec",
        "docs": job["docs"],
        "elapsed_sec": round(elapsed, 2),
        "cores": args.cores,
        "partitions": num_partitions,
        "corpus_total_mb": round((stats["total"] or 0) / 1e6, 1),
        "byte_q99": stats["q99"],
        "giant_threshold": round(threshold, 1),
        "giants_collected": n_giants,
        "giants_cap": 100_000,
        "stats_collect_rows": 1,
        "partition_spread": {
            "parts": spread["parts"],
            "max_over_mean": round(spread["max_b"] / spread["mean_b"], 3),
            "p99_over_p50": round(spread["p99_b"] / spread["p50_b"], 3),
        },
        "driver_python_hwm_mb": round(_vm_hwm_kb() / 1024, 1),
        "jvm_child_hwm_mb": round(_jvm_children_hwm_kb() / 1024, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
