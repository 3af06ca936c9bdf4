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
