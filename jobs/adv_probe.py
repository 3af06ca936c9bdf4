"""Quiet-host probe for the adversarial bench rows (VERDICT r6 #3).

Runs the contamination canary plus the 5 adversarial dedup rows (and
lang_gate, the unstable short row — VERDICT r6 finding #3) N times
each (default 3), printing per-run timings and the median/min, with a
canary reading before AND after so a steal burst mid-probe is
attributable.  Same corpus/caches/protocol as bench.py.

Usage: python jobs/adv_probe.py [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ADV = int(os.environ.get("ZX_BENCH_ADV_DOCS", "20000"))
ADV_CACHE = f"/tmp/zx-bench-adv-{N_ADV}-42-v3"  # v3: pinned 32-file layout


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import pyspark.sql.functions as F

    from zhtml_spark.corpus import adversarial_web_corpus
    from zhtml_spark.pipeline import build_session
    from zhtml_spark.textops import (
        dedup_components,
        lang_gate,
        line_dedup,
        minhash_banded_candidates,
        substring_dup_spans,
        winnow_dup_candidates,
    )

    spark = build_session(app="zx-adv-probe", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(ADV_CACHE):
        adversarial_web_corpus(spark, N_ADV, seed=42).write.mode(
            "overwrite"
        ).parquet(ADV_CACHE)
    adv = spark.read.parquet(ADV_CACHE)
    adv.limit(50).count()  # touch the scan

    def canary() -> float:
        t0 = time.time()
        spark.range(400_000_000).groupBy(
            (F.col("id") % 9973).alias("k")
        ).agg(F.sum("id")).count()
        return round(time.time() - t0, 3)

    rows = {
        "adv_minhash_banded": lambda: minhash_banded_candidates(
            adv, n=3, bands=4, rows=2
        ).count(),
        "adv_winnow": lambda: winnow_dup_candidates(
            adv, min_shared=5, max_doc_freq=20
        ).count(),
        "adv_substring": lambda: substring_dup_spans(
            adv, k=25, min_len=60
        ).count(),
        "adv_components": lambda: dedup_components(
            minhash_banded_candidates(adv, n=3, bands=4, rows=2)
        ).count(),
        "adv_lines": lambda: line_dedup(adv)
        .agg(F.sum(F.length("text")))
        .collect(),
        "lang_gate_adv": lambda: lang_gate(
            adv, langs=("en", "es", "de"), min_lm_score=-8_400_000
        ).count(),
    }

    out: dict[str, object] = {"canary_pre": canary()}
    print(f"[probe] canary_pre: {out['canary_pre']}", file=sys.stderr)
    for name, fn in rows.items():
        ts = []
        for i in range(runs):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
            print(f"[probe] {name} run{i}: {ts[-1]}", file=sys.stderr)
        out[name] = {
            "runs": ts,
            "median": round(statistics.median(ts), 3),
            "min": min(ts),
        }
    out["canary_post"] = canary()
    print(f"[probe] canary_post: {out['canary_post']}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
