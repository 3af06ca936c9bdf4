"""WHATWG charset sniffing over the latin-1 WARC carrier
(sources.sniff_charset / decode_sniffed / decode_sniffed_payloads):
precedence, label normalization, flagless decoders, the extended Java
repertoire, and never-kill-the-job malformed-input behavior."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from zhtml_spark.sources import (
    decode_sniffed,
    decode_sniffed_payloads,
    sniff_charset,
)


def _carrier(b: bytes) -> str:
    return b.decode("latin-1")


def _sniff(spark, rows, default="windows-1252"):
    df = spark.createDataFrame(rows, "payload_ctype string, html string")
    return [
        r["cs"]
        for r in df.select(
            sniff_charset(
                F.col("payload_ctype"), F.col("html"), default
            ).alias("cs")
        ).collect()
    ]


def test_sniff_precedence_bom_header_meta_default(spark):
    bom_utf8 = _carrier("\ufeffx".encode("utf-8"))
    rows = [
        # BOM beats a conflicting header
        ("text/html; charset=shift_jis", bom_utf8),
        ("text/html; charset=windows-1251", _carrier(b"\xfe\xff\x00x")),
        ("text/html; charset=KOI8-R", _carrier(b"\xff\xfex\x00")),
        # header beats meta
        ("text/html; charset=EUC-JP",
         '<meta charset="utf-8"><p>x</p>'),
        # meta (both syntaxes) when the header has no charset param
        ("text/html", '<meta charset="gbk"><p>x</p>'),
        ("text/html",
         '<meta http-equiv="Content-Type" '
         'content="text/html; charset=big5"><p>x</p>'),
        # nothing declared -> caller default
        ("text/html", "<p>x</p>"),
        # unrecognized header label falls through to meta (spec:
        # unrecognized label = failure, keep sniffing)
        ("text/html; charset=x-nonsense",
         "<meta charset=utf-8><p>x</p>"),
    ]
    assert _sniff(spark, rows) == [
        "utf-8", "utf-16be", "utf-16le", "EUC-JP", "GBK", "Big5",
        "windows-1252", "utf-8",
    ]


def test_sniff_label_normalization(spark):
    rows = [
        ("text/html; charset=latin1", "<p>x</p>"),      # -> 1252
        ("text/html; charset=ISO-8859-1", "<p>x</p>"),  # -> 1252
        ("text/html; charset=us-ascii", "<p>x</p>"),    # -> 1252
        ("text/html; charset=UTF8", "<p>x</p>"),
        # meta-declared utf-16 becomes utf-8 (HTML 13.2.3.3)
        ("text/html", "<meta charset=utf-16le><p>x</p>"),
        ("text/html; charset=windows-31j", "<p>x</p>"),
        ("text/html; charset=GB2312", "<p>x</p>"),
    ]
    assert _sniff(spark, rows) == [
        "windows-1252", "windows-1252", "windows-1252", "utf-8",
        "utf-8", "Shift_JIS", "GBK",
    ]
    # meta prescan only reads the first 1024 carrier chars
    far_meta = " " * 1100 + "<meta charset=utf-8>"
    assert _sniff(spark, [("text/html", far_meta)]) == ["windows-1252"]


def _decode(spark, rows, extended=False):
    df = spark.createDataFrame(rows, "cs string, html string")
    return [
        r["d"]
        for r in df.select(
            decode_sniffed(
                F.col("html"), F.col("cs"), extended=extended
            ).alias("d")
        ).collect()
    ]


def test_decode_windows_1252_translate(spark):
    # 0x80 euro, 0x99 tm, 0xE9 e-acute, and undefined 0x81 which
    # WHATWG maps to U+0081 (the latin-1 identity)
    carrier = _carrier(bytes([0x80, 0x99, 0xE9, 0x81, 0x41]))
    [out] = _decode(spark, [("windows-1252", carrier)])
    assert out == "€™\xe9\x81A"


def test_decode_utf8_bom_stripped_and_invalid_replaced(spark):
    bom_doc = _carrier("\ufeffcafé".encode("utf-8"))
    # flagless safety: force the strict (driver-session) behavior
    # while exercising the make_valid_utf8 path
    prev = spark.conf.get("spark.sql.legacy.codingErrorAction")
    spark.conf.set("spark.sql.legacy.codingErrorAction", "false")
    try:
        invalid = _carrier(b"a\xe9b")  # lone latin-1 byte = bad UTF-8
        out = _decode(
            spark, [("utf-8", bom_doc), ("utf-8", invalid)]
        )
    finally:
        spark.conf.set("spark.sql.legacy.codingErrorAction", prev)
    assert out == ["café", "a�b"]


def test_decode_utf16_and_truncation_guard(spark):
    le = _carrier("\ufeffHé!".encode("utf-16-le"))
    be = _carrier("\ufeffHé!".encode("utf-16-be"))
    # odd carrier length: dangling half code unit is dropped, not fatal
    trunc = _carrier("\ufeffok".encode("utf-16-le") + b"\x41")
    out = _decode(
        spark,
        [("utf-16le", le), ("utf-16be", be), ("utf-16le", trunc)],
    )
    assert out == ["Hé!", "Hé!", "ok"]


def test_decode_x_user_defined(spark):
    carrier = _carrier(bytes([0x41, 0x80, 0xFF]))
    [out] = _decode(spark, [("x-user-defined", carrier)])
    assert out == "A\uf780\uf7ff"


def test_decode_extended_shift_jis_and_fallback(spark):
    sjis = _carrier("日本語ok".encode("shift_jis"))
    [ext] = _decode(spark, [("Shift_JIS", sjis)], extended=True)
    assert ext == "日本語ok"
    # without the extended repertoire the same row degrades to the
    # windows-1252 translate: wrong glyphs, but never an exception
    [fb] = _decode(spark, [("Shift_JIS", sjis)], extended=False)
    assert "ok" in fb and fb != "日本語ok"


def test_decode_sniffed_payloads_end_to_end(spark):
    from zhtml_spark.pipeline import extract_documents
    from zhtml_spark.sources import (
        parse_warc_records,
        warc_record,
        warc_to_documents,
    )

    pages = [
        # windows-1252 bytes declared via the latin1 alias
        ("https://ex.com/w1252", "text/html; charset=latin1",
         "<body><p>caf\xe9 €99</p></body>".encode("cp1252")),
        # undeclared UTF-8 (crawler-pragmatic default)
        ("https://ex.com/utf8", "text/html",
         "<body><p>naïve café</p></body>".encode("utf-8")),
        # Shift_JIS via meta prescan (extended repertoire)
        ("https://ex.com/sjis", "text/html",
         ('<head><meta charset="shift_jis"></head>'
          "<body><p>日本語のページ</p></body>").encode("shift_jis")),
    ]
    rows = [
        (u, f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n\r\n"
         + body.decode("latin-1"))
        for u, ct, body in pages
    ]
    src = spark.createDataFrame(rows, "url string, http string")
    archive = src.select(
        warc_record(
            F.col("url"),
            F.lit("2024-01-01T00:00:00Z"),
            F.col("http"),
        ).alias("rec")
    ).agg(F.concat_ws("", F.collect_list("rec")).alias("content"))
    # carrier shape: warc_record(http_headers=False) wraps the
    # already-rendered HTTP response; re-tag the record type
    archive = archive.select(
        F.regexp_replace(
            "content", "Content-Type: text/html",
            "Content-Type: application/http; msgtype=response",
        ).alias("content")
    )
    recs = decode_sniffed_payloads(
        parse_warc_records(archive), default_charset="utf-8"
    )
    cs = {
        r["warc_url"]: r["charset"]
        for r in recs.select("warc_url", "charset").collect()
    }
    assert cs == {
        "https://ex.com/w1252": "windows-1252",
        "https://ex.com/utf8": "utf-8",
        "https://ex.com/sjis": "Shift_JIS",
    }
    spans = (
        extract_documents(warc_to_documents(recs))
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", F.col("s.text").alias("text"))
    )
    text = {r["doc_id"]: r["text"] for r in spans.collect()}
    assert text == {
        "https://ex.com/w1252": "café €99",
        "https://ex.com/utf8": "naïve café",
        "https://ex.com/sjis": "日本語のページ",
    }


def test_interleaved_spans_survive_malformed_utf8(spark):
    """One broken page must never kill the extraction job: a
    payload with an invalid UTF-8 byte flows through the interleaved
    path (strict session semantics forced) and degrades to U+FFFD."""
    from zhtml_spark.sources import (
        parse_warc_records,
        warc_interleaved_spans,
        warc_record,
    )

    body = _carrier("<body><p>a".encode() + b"\xe9" + "b</p></body>".encode())
    src = spark.createDataFrame([(body,)], "html string")
    archive = src.select(
        warc_record(
            F.lit("https://ex.com/broken"),
            F.lit("2024-01-01T00:00:00Z"),
            F.col("html"),
            http_headers=True,
        ).alias("content")
    )
    prev = spark.conf.get("spark.sql.legacy.codingErrorAction")
    spark.conf.set("spark.sql.legacy.codingErrorAction", "false")
    try:
        rows = warc_interleaved_spans(
            parse_warc_records(archive)
        ).collect()
    finally:
        spark.conf.set("spark.sql.legacy.codingErrorAction", prev)
    assert [(r["kind"], r["text"]) for r in rows] == [
        ("text", "a�b")
    ]
