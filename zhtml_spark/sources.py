"""Web-archive (WARC) ingestion: the Common-Crawl-shaped source a
web-scale extraction engine reads in production.

The reference consumes bare strings (src/tokenizer.zig:127-155 — file
+ string only); the engine's scan tier adds the archive container
around that.  Spark-first: record splitting and header parsing are
pure JVM expressions (split/explode/regexp_extract) so Catalyst keeps
the whole scan → parse → extract plan in one pipeline with the single
fused extraction UDF as the only Python stage.

Scale note: this reader decodes each WARC file as one string column —
right for the sandbox and for size-bounded WARC segments (Common Crawl
caps segments at ~1 GB; `spark.sql.files.maxPartitionBytes` sizes the
scan).  A petabyte deployment would swap `binaryFile` for a
record-splitting InputFormat (e.g. HadoopInputFormat with a WARC
splitter) behind the SAME `parse_warc_records` contract — the
downstream plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_VERSION = "WARC/1.0"


def warc_record(
    url: Column, date: Column, html: Column
) -> Column:
    """Render one WARC response record (header block + payload) —
    used by tests/queries to synthesize archives deterministically."""
    return F.concat(
        F.lit(f"{WARC_VERSION}\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "), url, F.lit("\r\n"),
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit("Content-Type: text/html\r\n"),
        F.lit("Content-Length: "), F.length(html).cast("string"),
        F.lit("\r\n\r\n"),
        html,
        F.lit("\r\n\r\n"),
    )


def parse_warc_records(
    archives: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Split WARC archive strings into RESPONSE-record rows
    ``(warc_url, warc_date, html)`` — all JVM-side (split + explode +
    regexp_extract), no Python.

    Real archives interleave request/response/metadata records per
    target URI — only ``WARC-Type: response`` rows survive (without
    the filter a request record's HTTP header block would become a
    phantom "document" and duplicate every doc_id downstream).
    Records are delimited on the full ``\\r\\n\\r\\nWARC/1.0\\r\\n``
    inter-record boundary (not the bare version line, which a payload
    could trivially contain); a payload containing that exact 4-line
    boundary sequence remains the documented approximation of this
    string-level splitter — the production InputFormat honors
    Content-Length instead and is byte-exact."""
    # strip the leading version line so one split expression handles
    # the first record and all subsequent boundaries identically
    body = F.regexp_replace(
        F.col(content_col), r"\A" + r"WARC/1\.0\r\n", ""
    )
    recs = archives.select(
        F.explode(
            F.split(body, r"\r\n\r\nWARC/1\.0\r\n")
        ).alias("rec")
    ).where(F.col("rec") != "")
    return (
        recs.select(
            F.regexp_extract("rec", r"WARC-Type: ([^\r\n]*)", 1).alias(
                "warc_type"
            ),
            F.regexp_extract("rec", r"WARC-Target-URI: ([^\r\n]*)", 1).alias(
                "warc_url"
            ),
            F.regexp_extract("rec", r"WARC-Date: ([^\r\n]*)", 1).alias(
                "warc_date"
            ),
            F.regexp_extract("rec", r"(?s)\r\n\r\n(.*?)(?:\r\n\r\n)?$", 1)
            .alias("html"),
        )
        .where(F.col("warc_type") == "response")
        .where(F.col("warc_url") != "")
        .drop("warc_type")
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory/glob of ``.warc`` / ``.warc.gz`` files →
    record rows.

    ``binaryFile`` keeps whole-archive integrity (a text scan would
    split records at arbitrary line boundaries).  Plain archives
    decode + split entirely JVM-side; gzip members (Common Crawl's
    wire format) decompress in ONE Arrow-batched mapInPandas stage —
    a codec, not logic, and gzip is unsplittable anyway so per-file
    decompression is the parallelism ceiling regardless of engine.
    Multi-member gzip (Common Crawl concatenates one member per
    record) is handled by ``gzip.decompress``'s multi-member mode.
    """
    raw = spark.read.format("binaryFile").load(path)
    plain = raw.where(~F.col("path").endswith(".gz")).select(
        F.decode(F.col("content"), "UTF-8").alias("content")
    )
    gz = raw.where(F.col("path").endswith(".gz")).select("content")

    def gunzip_batches(batches):
        import gzip

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "content": [
                        gzip.decompress(b).decode("utf-8")
                        for b in pdf["content"]
                    ]
                }
            )

    archives = plain.unionByName(
        gz.mapInPandas(gunzip_batches, "content string")
    )
    return parse_warc_records(archives)


def stream_warc_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_location: str,
    num_partitions: int | None = None,
):
    """Incremental WARC ingestion: new .warc files dropped into
    ``input_path`` are split, adapted, and extracted per micro-batch —
    the crawl-to-spans path as a stream (availableNow drain; Spark's
    file-source checkpoint guarantees each archive is processed once).
    """
    from pyspark.sql import functions as F  # noqa: F401 (parity w/ streaming)

    from .pipeline import extract_documents

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        archives = batch_df.select(
            F.decode(F.col("content"), "UTF-8").alias("content")
        )
        docs = warc_to_documents(parse_warc_records(archives))
        out = extract_documents(
            docs, num_partitions=num_partitions, salt=False
        )
        # idempotent per-batch dir (foreachBatch is at-least-once; a
        # replayed epoch overwrites its own directory)
        out.select("doc_id", "spans").write.mode("overwrite").parquet(
            f"{output_path}/spans/batch={batch_id}"
        )

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc")
        .load(input_path)
    )
    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Adapt WARC records to the engine's interleaved-document input
    shape (doc_id = target URI, one html span) — feed straight into
    ``pipeline.extract_documents``."""
    return records.select(
        F.col("warc_url").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.col("html").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
