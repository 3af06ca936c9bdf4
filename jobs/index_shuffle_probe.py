"""Shuffle-byte evidence for the persisted band index (VERDICT r6 #7).

Builds the LSH band index over a 240k-doc adversarial corpus, persists
it bucketed on (band, band_sig), then runs the SAME incremental-dedup
pass (10k-doc new batch) against (a) the bucketed table and (b) the
same parquet files read without bucketing metadata, reporting each
run's total shuffle read/write bytes from the Spark REST API.  The
bucketed run should shuffle ~only the batch's signatures; the control
pays a full index-side exchange on top.

Usage: python jobs/index_shuffle_probe.py [n_docs] [batch_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _stage_bytes(ui: str) -> tuple[int, int]:
    """(shuffle_read, shuffle_write) summed over all completed stages."""
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    import pyspark.sql.functions as F

    from zhtml_spark.corpus import adversarial_web_corpus
    from zhtml_spark.pipeline import build_session
    from zhtml_spark.textops import (
        dedup_against_index,
        minhash_band_index,
        persist_band_index,
    )

    spark = build_session(app="zx-index-probe", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    cache = f"/tmp/zx-bench-adv-{n_docs}-42-v3"
    if not os.path.exists(cache):
        adversarial_web_corpus(spark, n_docs, seed=42).write.mode(
            "overwrite"
        ).parquet(cache)
    corpus = spark.read.parquet(cache)

    index = minhash_band_index(corpus, n=3, bands=4, rows=2)
    t0 = time.time()
    persist_band_index(
        index, "band_index_probe", buckets=64,
        path=f"/tmp/zx-band-index-{n_docs}",
    )
    build_sec = round(time.time() - t0, 2)

    batch = corpus.limit(batch_docs).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    batch.write.mode("overwrite").parquet("/tmp/zx-index-batch")
    batch = spark.read.parquet("/tmp/zx-index-batch")

    out: dict[str, object] = {
        "n_docs": n_docs, "batch_docs": batch_docs,
        "index_build_sec": build_sec,
    }
    # force the join path (at real scale the index never broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for tag, idx in (
        ("bucketed", spark.table("band_index_probe")),
        ("plain", spark.read.parquet(f"/tmp/zx-band-index-{n_docs}")),
    ):
        r0, w0 = _stage_bytes(ui)
        t0 = time.time()
        n = dedup_against_index(batch, idx, n=3, bands=4, rows=2).count()
        sec = round(time.time() - t0, 2)
        time.sleep(2)  # let the status store settle
        r1, w1 = _stage_bytes(ui)
        out[tag] = {
            "survivors": n,
            "sec": sec,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }
    spark.sql("DROP TABLE IF EXISTS band_index_probe")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
