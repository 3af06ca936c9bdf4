"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction over sf0.001 documents wrapped
as interleaved HTML docs through the real fused UDF pipeline.
``queries()`` / ``oracle_sql()`` — per-operator DataFrame callables and
their DuckDB-oracle SQL (same column names/aliases both sides; the
driver hash-compares values order-insensitively).

The extraction queries wrap the deterministic ``documents`` table rows
in deterministic HTML so the DuckDB oracle can predict the engine's
exact output spans — a SQL-checkable end-to-end proof of the
tokenize→tree→extract path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _span_struct(kind, text, media_ref, offset) -> Column:
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        offset.alias("offset"),
    )


def _null_str() -> Column:
    return F.lit(None).cast("string")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _wrap_as_interleaved(docs: DataFrame, html_col: Column) -> DataFrame:
    """documents rows → the input_hint interleaved shape (single html span)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            _span_struct(F.lit("html"), html_col, _null_str(), F.lit(0))
        ).alias("spans"),
    )


def _extract_exploded(df: DataFrame) -> DataFrame:
    """Run the fused extraction UDF and explode spans to flat rows."""
    from zhtml_spark.pipeline import extract_documents

    out = extract_documents(df)
    return out.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


# ------------------------------------------------------------- queries
def _q_extract_heading_para(spark: SparkSession, sf_dir: str) -> DataFrame:
    html = F.concat(
        F.lit("<html><head><title>t</title></head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    return _extract_exploded(_wrap_as_interleaved(_docs(spark, sf_dir), html))


def _q_extract_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    html = F.concat(
        F.lit("<body><p>"),
        F.col("text"),
        F.lit(" &amp; &lt;tail&gt; &#x41;&copy;</p></body>"),
    )
    return _extract_exploded(_wrap_as_interleaved(_docs(spark, sf_dir), html))


def _q_extract_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    html = F.concat(
        F.lit("<body><p>"),
        F.col("text"),
        F.lit('</p><img src="img-'),
        F.col("doc_id").cast("string"),
        F.lit('.png" alt="fig"></body>'),
    )
    return _extract_exploded(_wrap_as_interleaved(_docs(spark, sf_dir), html))


def _q_extract_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    html = F.concat(
        F.lit("<body><ul><li>lang "),
        F.col("lang"),
        F.lit("<li>from "),
        F.col("source"),
        F.lit("</ul></body>"),
    )
    return _extract_exploded(_wrap_as_interleaved(_docs(spark, sf_dir), html))


def _q_extract_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    html = F.concat(
        F.lit(
            '<body><nav><ul><li><a href="/h">home</a></li>'
            '<li><a href="/b">blog</a></li></ul></nav><p>'
        ),
        F.col("text"),
        F.lit('</p><footer><a href="/a">about</a> site</footer></body>'),
    )
    return _extract_exploded(_wrap_as_interleaved(_docs(spark, sf_dir), html))


def _q_span_kind_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _q_extract_media(spark, sf_dir)
    return df.groupBy("kind").agg(F.count("*").alias("n")).select("kind", "n")


def _q_interleaved_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media spans interleaved between html spans pass through
    positionally (input_hint invariant)."""
    docs = _docs(spark, sf_dir)
    wrapped = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            _span_struct(
                F.lit("html"),
                F.concat(F.lit("<body><p>"), F.col("text"), F.lit("</p>")),
                _null_str(),
                F.lit(0),
            ),
            _span_struct(
                F.lit("image"),
                F.lit("a figure"),
                F.concat(F.lit("media://"), F.col("doc_id").cast("string")),
                F.lit(1),
            ),
            _span_struct(
                F.lit("html"),
                F.concat(F.lit("<p>tail "), F.col("lang"), F.lit("</p></body>")),
                _null_str(),
                F.lit(2),
            ),
        ).alias("spans"),
    )
    return _extract_exploded(wrapped)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_interleaved_passthrough(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_heading_para": _q_extract_heading_para,
        "extract_entities": _q_extract_entities,
        "extract_media": _q_extract_media,
        "extract_list": _q_extract_list,
        "extract_boilerplate": _q_extract_boilerplate,
        "span_kind_counts": _q_span_kind_counts,
        "interleaved_passthrough": _q_interleaved_passthrough,
    }


def oracle_sql() -> dict[str, str]:
    doc_id = "CAST(doc_id AS VARCHAR) AS doc_id"
    null_ref = "CAST(NULL AS VARCHAR) AS media_ref"
    return {
        "extract_heading_para": f"""
            SELECT {doc_id}, 0 AS offset, 'heading' AS kind,
                   'Doc ' || CAST(doc_id AS VARCHAR) AS text, {null_ref}
            FROM documents
            UNION ALL
            SELECT {doc_id}, 1 AS offset, 'text' AS kind, text, {null_ref}
            FROM documents
        """,
        "extract_entities": f"""
            SELECT {doc_id}, 0 AS offset, 'text' AS kind,
                   text || ' & <tail> A©' AS text, {null_ref}
            FROM documents
        """,
        "extract_media": f"""
            SELECT {doc_id}, 0 AS offset, 'text' AS kind, text, {null_ref}
            FROM documents
            UNION ALL
            SELECT {doc_id}, 1 AS offset, 'media' AS kind, 'fig' AS text,
                   'img-' || CAST(doc_id AS VARCHAR) || '.png' AS media_ref
            FROM documents
        """,
        "extract_list": f"""
            SELECT {doc_id}, 0 AS offset, 'list' AS kind,
                   'lang ' || lang AS text, {null_ref}
            FROM documents
            UNION ALL
            SELECT {doc_id}, 1 AS offset, 'list' AS kind,
                   'from ' || source AS text, {null_ref}
            FROM documents
        """,
        "extract_boilerplate": f"""
            SELECT {doc_id}, 0 AS offset, 'text' AS kind, text, {null_ref}
            FROM documents
        """,
        "span_kind_counts": """
            SELECT 'text' AS kind, count(*) AS n FROM documents
            UNION ALL
            SELECT 'media' AS kind, count(*) AS n FROM documents
        """,
        "interleaved_passthrough": f"""
            SELECT {doc_id}, 0 AS offset, 'text' AS kind, text, {null_ref}
            FROM documents
            UNION ALL
            SELECT {doc_id}, 1 AS offset, 'media' AS kind,
                   'a figure' AS text,
                   'media://' || CAST(doc_id AS VARCHAR) AS media_ref
            FROM documents
            UNION ALL
            SELECT {doc_id}, 2 AS offset, 'text' AS kind,
                   'tail ' || lang AS text, {null_ref}
            FROM documents
        """,
    }
