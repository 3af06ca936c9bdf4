"""Isolated md5-vs-xxhash64 A/B for the fused language gate
(VERDICT r6 #4 evidence): same 10-language model, same corpus, same
session — ONLY the hash engine differs.  The 2M corpus_job comparison
against r6 is confounded (r6 gated 3 languages, r7 gates 10 — 3.3x
the per-trigram fold work), so this probe pins the hash split's own
contribution.  best-of-N per engine, canary-bracketed.

Usage: python jobs/gate_hash_ab.py [--docs 240000] [--runs 3]
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
    ap.add_argument("--docs", type=int, default=240000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zhtml_spark.corpus import corpus_dataframe
    from zhtml_spark.langid_model import SEED_TEXTS
    from zhtml_spark.pipeline import build_session
    from zhtml_spark.textops import lang_gate

    spark = build_session(app="zx-gate-ab", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/zx-gate-ab-{args.docs}-42"
    if not os.path.isdir(path):
        corpus_dataframe(spark, args.docs, seed=42).repartition(
            256
        ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    txt = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                "spans", lambda s: F.coalesce(s["text"], F.lit(""))
            ),
            " ",
        ).alias("text"),
    )

    def canary() -> float:
        t0 = time.time()
        spark.range(4 * 10**8).groupBy(
            F.expr("id % 9973")
        ).count().count()
        return round(time.time() - t0, 3)

    langs = tuple(sorted(SEED_TEXTS))
    out: dict = {"docs": args.docs, "canary_pre": canary()}
    for fn in ("xxhash64", "md5"):
        times = []
        counts = set()
        for _ in range(args.runs):
            t0 = time.time()
            counts.add(
                lang_gate(
                    txt, langs=langs, min_lm_score=-8_400_000, hash_fn=fn
                ).count()
            )
            times.append(round(time.time() - t0, 2))
        out[fn] = {"runs": times, "best": min(times),
                   "survivors": sorted(counts)}
    out["canary_post"] = canary()
    out["speedup_best"] = round(out["md5"]["best"] / out["xxhash64"]["best"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
