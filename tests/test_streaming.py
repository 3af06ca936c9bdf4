"""Structured Streaming incremental extraction: availableNow drains the
backlog; a second trigger after new files arrive processes ONLY the new
files (file-source checkpoint semantics)."""

from __future__ import annotations

from zhtml_spark.corpus import corpus_dataframe
from zhtml_spark.streaming import stream_extract


def test_incremental_stream_extract(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    corpus_dataframe(spark, 30, seed=21).write.parquet(inp)
    stream_extract(spark, inp, out, ckpt, num_partitions=4)
    first = spark.read.parquet(f"{out}/spans")
    assert first.count() == 30

    # drop 20 more docs as new files → only they are processed
    corpus_dataframe(spark, 20, seed=22).write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt, num_partitions=4)
    spans = spark.read.parquet(f"{out}/spans")
    assert spans.count() == 50
    assert spans.select("doc_id").distinct().count() == 50

    # third trigger with nothing new: no growth
    stream_extract(spark, inp, out, ckpt, num_partitions=4)
    assert spark.read.parquet(f"{out}/spans").count() == 50


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): first
    occurrence of each distinct text is emitted exactly once across
    micro-batches and across separate availableNow drains."""
    import pyspark.sql.functions as F

    from zhtml_spark.streaming import stream_dedup_first_seen

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = [(i, f"text-{i % 10}") for i in range(40)]  # 10 distinct
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        inp
    )
    stream_dedup_first_seen(spark, inp, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 10
    # smallest doc_id wins per text
    assert got.agg(F.max("doc_id")).collect()[0][0] == 9

    # second drain: 5 repeated texts + 5 new ones → only new emitted
    rows2 = [(100 + i, f"text-{i}") for i in range(5)] + [
        (200 + i, f"new-{i}") for i in range(5)
    ]
    spark.createDataFrame(rows2, "doc_id bigint, text string").write.mode(
        "append"
    ).parquet(inp)
    stream_dedup_first_seen(spark, inp, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 15  # 10 original + 5 genuinely new
    assert got.where(F.col("text").startswith("new-")).count() == 5
    # the repeated texts did NOT re-emit
    assert got.where(F.col("doc_id") >= 100).where(
        ~F.col("text").startswith("new-")
    ).count() == 0


def test_stream_windowed_counts_with_watermark(spark, tmp_path):
    """Watermarked tumbling windows: streamed append-mode output must
    equal the batch aggregation for every window closed by the final
    watermark (max ts - 30 min)."""
    import datetime as dt

    import pyspark.sql.functions as F

    from zhtml_spark.streaming import stream_windowed_event_counts

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(300):
        rows.append(
            (i, base + dt.timedelta(minutes=i), i % 7,
             "click" if i % 2 else "view", float(i % 10), "{}")
        )
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    spark.createDataFrame(rows, schema).write.parquet(inp)

    stream_windowed_event_counts(spark, inp, out, ckpt)
    got = spark.read.parquet(out)

    # batch reference restricted to closed windows: watermark is
    # max ts (04:59) - 30 min => windows ending <= 04:29 => hours 0-3
    batch = (
        spark.read.parquet(inp)
        .where(F.col("ts") < "2024-01-01 04:00:00")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"),
            "event_type", "n", "total_value",
        )
    )
    assert got.count() == batch.count() == 8  # 4 hours x 2 types
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_dedup_ttl_eviction_and_rocksdb(spark, tmp_path):
    """TTL compaction + RocksDB state store (VERDICT r4 #10), two
    deterministic halves: (A) a LONG ttl proves in-window duplicates
    stay suppressed across drains on the RocksDB provider; (B) a
    short ttl proves an expired fingerprint is evicted by a later
    drain's trailing timeout batches and its next copy RE-emits —
    bounded-window dedup.  (A single short-ttl sequence would race:
    multi-second drains can outlive the window before the duplicate
    arrives.)"""
    import time

    import pyspark.sql.functions as F

    from zhtml_spark.streaming import stream_dedup_first_seen

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    try:
        # -- A: suppression within a window that cannot expire ------
        inp = str(tmp_path / "a_in")
        out = str(tmp_path / "a_out")
        ckpt = str(tmp_path / "a_ckpt")
        spark.createDataFrame(
            [(1, "alpha"), (2, "alpha"), (3, "beta")],
            "doc_id bigint, text string",
        ).write.parquet(inp)
        stream_dedup_first_seen(
            spark, inp, out, ckpt, ttl="1 hour", state_store="rocksdb"
        )
        assert spark.read.parquet(out).count() == 2  # alpha(1), beta(3)
        spark.createDataFrame(
            [(10, "alpha")], "doc_id bigint, text string"
        ).write.mode("append").parquet(inp)
        stream_dedup_first_seen(
            spark, inp, out, ckpt, ttl="1 hour", state_store="rocksdb"
        )
        assert spark.read.parquet(out).count() == 2

        # -- B: eviction after expiry -------------------------------
        inp = str(tmp_path / "b_in")
        out = str(tmp_path / "b_out")
        ckpt = str(tmp_path / "b_ckpt")
        spark.createDataFrame(
            [(1, "alpha")], "doc_id bigint, text string"
        ).write.parquet(inp)
        stream_dedup_first_seen(
            spark, inp, out, ckpt, ttl="1 second", state_store="rocksdb"
        )
        time.sleep(1.5)  # let the TTL pass
        # this drain's trailing timeout batches evict the expired key
        spark.createDataFrame(
            [(20, "gamma")], "doc_id bigint, text string"
        ).write.mode("append").parquet(inp)
        stream_dedup_first_seen(
            spark, inp, out, ckpt, ttl="1 second", state_store="rocksdb"
        )
        # post-eviction copy re-emits
        spark.createDataFrame(
            [(30, "alpha")], "doc_id bigint, text string"
        ).write.mode("append").parquet(inp)
        stream_dedup_first_seen(
            spark, inp, out, ckpt, ttl="1 second", state_store="rocksdb"
        )
        got = spark.read.parquet(out)
        assert got.where(F.col("text") == "gamma").count() == 1
        alphas = got.where(F.col("text") == "alpha").select(
            "doc_id"
        ).collect()
        assert sorted(r["doc_id"] for r in alphas) == [1, 30]
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
