"""WARC / WET web-archive source and sink (ISO 28500 / WARC 1.1).

Common Crawl — the canonical 100 TB-scale public corpus — ships as
WARC (raw HTTP captures), WET (extracted plain text, ``conversion``
records) and WAT (metadata). A training-data engine that cannot read
them cannot ingest the largest corpus its users actually start from,
so this module is a from-scratch, stdlib-only WARC codec:

- the record grammar ``WARC/1.x CRLF header-lines CRLF block
  (Content-Length bytes) CRLF CRLF`` with header continuation lines,
  LF-only tolerance, and bounded resynchronization after a corrupt
  record (scan forward for the next version line instead of losing
  the rest of the file);
- Common Crawl's member-per-record gzip layout on write (every record
  its own gzip member, so byte ranges from an index are independently
  decompressable; Python's ``gzip`` consumes concatenated members
  natively on read);
- HTTP response payload split (status / headers / body) including
  chunked transfer-encoding reassembly;
- a per-record error channel — malformed records become rows with
  ``error`` set and never poison the file (the jsonl corrupt-record
  quarantine convention, sources/files.py).

Scale design: ONE WARC FILE IS THE UNIT OF PARALLELISM — exactly how
production Common Crawl jobs shard. The reader turns a path list into
a one-path-per-partition DataFrame and streams records out of each
file inside ``mapInPandas``, holding one record (CC caps ~1 MiB) plus
one emit batch in memory — never the file. The default ``via='stream'``
path ``open()``s from executors (local / NFS / fuse mounts);
``via='binaryFile'`` routes through Spark's binaryFile source instead
(any Hadoop filesystem, whole-file rows bounded by the 2 GiB limit).
Both paths share one parser, byte-identical output.

No counterpart in the reference (scraper_v2.py fetches live HTML);
this is [EXT] surface for the LLM-pipeline north star.
"""

from __future__ import annotations

import codecs
import glob as _glob
import gzip
import hashlib
import io
import os
import re
import uuid
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from http.client import responses as _HTTP_REASONS

_CRLF = b"\r\n"
_RESYNC_LINE_CAP = 100_000  # bounded scan-forward after a corrupt record
_LINE_CAP = 1 << 20  # longest header/version line read at once — a
# corrupt binary region with no LF must not buffer unboundedly
# rows bound is for SMALL records (WAT metadata ~400 B: 256-row
# batches meant ~100 KB Arrow round-trips, measured +28%/core at 8192);
# the BYTE bound is the executor-memory guard and flushes payload-heavy
# WET/WARC batches long before the row bound
_EMIT_BATCH_ROWS = 8192
_EMIT_BATCH_BYTES = 32 << 20

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


# ---------------------------------------------------------------- parser


def _read_line(stream) -> bytes:
    """One header line (through LF), capped at _LINE_CAP bytes. b'' at
    EOF. A returned chunk that fills the cap without a trailing LF is
    a pseudo-line from a corrupt binary region — callers treat it as
    corruption (``_line_overlong``), never as a header."""
    return stream.readline(_LINE_CAP)


def _line_overlong(line: bytes) -> bool:
    return len(line) >= _LINE_CAP and not line.endswith(b"\n")


def _parse_headers(stream) -> tuple[dict[str, str], str | None]:
    """Named-field block after the version line: ``Name: value`` with
    RFC-style continuation lines (leading SP/HT folds into the previous
    value), terminated by an empty line. Returns (headers, error)."""
    headers: dict[str, str] = {}
    last: str | None = None
    while True:
        line = _read_line(stream)
        if not line:
            return headers, "eof in header block"
        if _line_overlong(line):
            return headers, "header line too long"
        stripped = line.rstrip(b"\r\n")
        if stripped == b"":
            return headers, None
        if stripped[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + stripped.strip().decode("utf-8", "replace")
            continue
        name, sep, value = stripped.partition(b":")
        if not sep:
            return headers, f"malformed header line: {stripped[:80]!r}"
        key = name.strip().decode("ascii", "replace").lower()
        headers[key] = value.strip().decode("utf-8", "replace")
        last = key
    # unreachable


def iter_warc_records(
    stream,
) -> Iterator[tuple[dict[str, str], bytes, str | None]]:
    """Stream (headers, block, error) triples off a decompressed WARC
    byte stream. One record is in memory at a time. After a malformed
    record the parser resynchronizes on the next ``WARC/`` version line
    (bounded scan) so one bad record costs one error row, not the tail
    of the file."""
    while True:
        # -- version line (skip inter-record blank lines)
        line = _read_line(stream)
        if not line:
            return
        stripped = line.rstrip(b"\r\n")
        if stripped == b"" and not _line_overlong(line):
            continue
        if _line_overlong(line) or not stripped.startswith(b"WARC/"):
            # corrupt leader: bounded resync to the next version line
            # (an over-cap pseudo-line counts as corruption too — it
            # came from a binary region with no LF)
            yield {}, b"", f"expected version line, got {stripped[:80]!r}"
            for _ in range(_RESYNC_LINE_CAP):
                line = _read_line(stream)
                if not line:
                    return
                if not _line_overlong(line) and line.rstrip(b"\r\n").startswith(
                    b"WARC/"
                ):
                    stripped = line.rstrip(b"\r\n")
                    break
            else:
                return
        headers, err = _parse_headers(stream)
        if err:
            yield headers, b"", err
            continue
        raw_len = headers.get("content-length")
        try:
            n = int(raw_len)  # type: ignore[arg-type]
            if n < 0:
                raise ValueError
        except (TypeError, ValueError):
            yield headers, b"", f"bad Content-Length: {raw_len!r}"
            continue
        block = stream.read(n)
        if len(block) < n:
            yield headers, block, f"truncated block: {len(block)}/{n} bytes"
            return
        yield headers, block, None
        # trailing CRLF CRLF consumed by the blank-line skip above


def parse_http_response(
    block: bytes,
) -> tuple[int | None, dict[str, str], bytes, str | None]:
    """Split an ``application/http; msgtype=response`` block into
    (status, headers, body, error). Reassembles chunked
    transfer-encoding; on malformed chunking the raw remainder is
    returned with the error noted (quarantine, don't drop bytes)."""
    # the EARLIER of the two separators wins: LF-only headers over a
    # body that happens to contain \r\n\r\n must split at the LF-only
    # boundary, not inside the body (CRLF at p also matches \n\n at
    # p+1, so strict < keeps the CRLF form winning when both align)
    i_crlf = block.find(b"\r\n\r\n")
    i_lf = block.find(b"\n\n")
    if i_crlf != -1 and (i_lf == -1 or i_crlf < i_lf):
        head, body = block[:i_crlf], block[i_crlf + 4:]
    elif i_lf != -1:
        head, body = block[:i_lf], block[i_lf + 2:]
    else:
        return None, {}, block, "no HTTP header/body separator"
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    status_line = lines[0]
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None, {}, block, f"bad HTTP status line: {status_line[:80]!r}"
    try:
        status = int(parts[1])
    except ValueError:
        return None, {}, block, f"bad HTTP status code: {parts[1]!r}"
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        name, s, value = ln.partition(b":")
        if s:
            headers[name.strip().decode("ascii", "replace").lower()] = value.strip().decode(
                "utf-8", "replace"
            )
    if headers.get("transfer-encoding", "").lower() == "chunked":
        out = bytearray()
        buf = io.BytesIO(body)
        while True:
            size_line = buf.readline().strip()
            if not size_line:
                return status, headers, bytes(body), "truncated chunked body"
            try:
                size = int(size_line.split(b";")[0], 16)
            except ValueError:
                return status, headers, bytes(body), f"bad chunk size: {size_line[:20]!r}"
            if size == 0:
                return status, headers, bytes(out), None
            chunk = buf.read(size)
            if len(chunk) < size:
                return status, headers, bytes(body), "truncated chunk"
            out += chunk
            buf.readline()  # chunk-terminating CRLF
    return status, headers, body, None


def _decode_content_encoding(
    body: bytes, encoding: str
) -> tuple[bytes, str | None]:
    """Inflate an HTTP body per its Content-Encoding. gzip/x-gzip and
    deflate (both zlib-wrapped and raw variants — servers ship both)
    are handled with the stdlib; 'identity' passes through; anything
    else (br, zstd — decoders not in the stdlib) returns the raw body
    WITH an error so the record quarantines instead of entering the
    corpus as binary-decoded garbage."""
    enc = encoding.strip().lower()
    try:
        if enc in ("gzip", "x-gzip"):
            return gzip.decompress(body), None
        if enc == "deflate":
            import zlib

            try:
                return zlib.decompress(body), None
            except zlib.error:
                return zlib.decompress(body, -zlib.MAX_WBITS), None
        if enc in ("identity", ""):
            return body, None
    except Exception as e:
        return body, f"bad {enc} body: {type(e).__name__}: {e}"
    return body, f"unsupported content-encoding: {encoding!r}"


_TEXTUAL_CT_MARKERS = ("text/", "html", "xml", "json", "javascript")


def _is_textual_content_type(ct: str) -> bool:
    low = ct.lower()
    return any(m in low for m in _TEXTUAL_CT_MARKERS)


def _charset_of(content_type: str) -> str | None:
    """``charset=`` parameter of a Content-Type header, or None."""
    for part in content_type.split(";")[1:]:
        name, sep, value = part.partition("=")
        if sep and name.strip().lower() == "charset":
            return value.strip().strip("\"'") or None
    return None


def _decode_text(payload: bytes, charset: str | None) -> tuple[str | None, str | None]:
    """Decode a textual payload → (text, error). The declared charset
    wins (legacy Thai pages ship TIS-620 / windows-874 — the target
    domain of the reference scraper, scraper_v2.py's site); unknown
    charsets QUARANTINE (text None + error) rather than entering the
    corpus as mojibake. Byte-level errors are replaced, never raised —
    one malformed byte must not kill a 100 TB scan (and under Spark 4's
    ANSI mode a JVM-side F.decode would throw, so the decode lives HERE
    in the Python kernel)."""
    cs = (charset or "utf-8").strip().lower()
    try:
        codec = codecs.lookup(cs)
    except LookupError:
        # 'windows-874'-style names miss Python's alias table; the cp
        # form is the same codepage
        m = re.fullmatch(r"windows[-_](\d+)", cs)
        if m:
            try:
                codec = codecs.lookup(f"cp{m.group(1)}")
            except LookupError:
                return None, f"unsupported charset: {charset!r}"
        else:
            return None, f"unsupported charset: {charset!r}"
    try:
        return payload.decode(codec.name, "replace"), None
    except (LookupError, ValueError, TypeError) as e:
        # a charset header can name a registered NON-TEXT codec
        # (base64, hex, zlib…): bytes.decode refuses those with
        # LookupError even under errors='replace' — quarantine, the
        # same one-row cost as an unknown charset
        return None, f"undecodable charset {charset!r}: {type(e).__name__}"


def _int_or_none(v) -> int | None:
    """ASCII-decimal parse or None — NEVER raises. (str.isdigit() is
    not a safe int() guard: '²'.isdigit() is True while int('²')
    raises, and a corrupt header must cost one error row, not the
    task.)"""
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def _records_to_rows(
    path: str,
    stream,
    record_types: frozenset[str] | None,
    parse_http: bool,
    max_records: int | None,
    keep_payload: bool = True,
) -> Iterator[dict]:
    emitted = 0
    for headers, block, err in iter_warc_records(stream):
        wtype = headers.get("warc-type")
        if err is None and record_types is not None and wtype not in record_types:
            continue
        status = None
        http_ct = None
        payload = block
        if (
            err is None
            and parse_http
            and wtype == "response"
            and "application/http" in headers.get("content-type", "")
        ):
            status, hh, payload, herr = parse_http_response(block)
            http_ct = hh.get("content-type")
            if herr:
                err = f"http: {herr}"
            elif hh.get("content-encoding"):
                # compressed bodies must be inflated HERE or downstream
                # text decoding turns gzip bytes into mojibake documents
                # with error NULL (review finding)
                payload, enc_err = _decode_content_encoding(
                    payload, hh["content-encoding"]
                )
                if enc_err:
                    err = f"http: {enc_err}"
        # decode textual payloads HERE (Python, errors-replace) — the
        # JVM F.decode raises MALFORMED_CHARACTER_CODING under ANSI
        # mode (Spark 4 default), and only the kernel sees the
        # HTTP-declared charset
        text = None
        if err is None:
            if wtype == "conversion":
                # WET spec: UTF-8 plain text
                text = payload.decode("utf-8", "replace")
            elif http_ct is not None and _is_textual_content_type(http_ct):
                text, cs_err = _decode_text(payload, _charset_of(http_ct))
                if cs_err:
                    err = f"http: {cs_err}"
            elif _is_textual_content_type(headers.get("content-type") or ""):
                # textual WARC-level Content-Type on non-HTTP records —
                # WAT metadata records (application/json) land here;
                # application/http blocks match no textual marker, so
                # un-split response payloads stay binary
                text = payload.decode("utf-8", "replace")
        yield {
            "warc_file": path,
            "record_id": headers.get("warc-record-id"),
            "warc_type": wtype,
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": _int_or_none(headers.get("content-length")),
            "http_status": status,
            "http_content_type": http_ct,
            # keep_payload=False (the documents sources): the binary
            # column would ride every Arrow batch next to the decoded
            # text it duplicates — measured ~25% of WET read wall
            "payload": payload if keep_payload else None,
            "text": text,
            "error": err,
        }
        emitted += 1
        if max_records is not None and emitted >= max_records:
            return


def _open_maybe_gzip(path: str):
    raw = open(path, "rb")
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(raw, "rb")
    return io.BufferedReader(raw)


def _batched(rows: Iterator[dict]) -> Iterator[pd.DataFrame]:
    """Bound executor memory: flush every _EMIT_BATCH_ROWS rows or
    _EMIT_BATCH_BYTES of payload, whichever first."""
    batch: list[dict] = []
    nbytes = 0
    cols = [f.name for f in WARC_SCHEMA.fields]
    for r in rows:
        batch.append(r)
        nbytes += len(r["payload"] or b"") + len(r["text"] or "")
        if len(batch) >= _EMIT_BATCH_ROWS or nbytes >= _EMIT_BATCH_BYTES:
            yield pd.DataFrame(batch, columns=cols)
            batch, nbytes = [], 0
    if batch:
        yield pd.DataFrame(batch, columns=cols)


def _expand_paths(paths: str | Iterable[str]) -> list[str]:
    if isinstance(paths, str):
        # never treat a write-then-swap temp as an archive — the sink's
        # atomicity contract depends on readers ignoring them
        found = sorted(
            p for p in _glob.glob(paths) if not p.endswith(".inprogress")
        )
        if not found:
            raise FileNotFoundError(f"no WARC files match {paths!r}")
        return found
    out = sorted(str(p) for p in paths)
    if not out:
        raise ValueError("empty WARC path list")
    return out


def _rows_safely(
    path: str,
    open_stream,
    types: frozenset[str] | None,
    parse_http: bool,
    max_records: int | None,
    keep_payload: bool = True,
) -> Iterator[dict]:
    """Archive-level fault isolation: decompression errors (truncated
    gzip from a non-atomic upload), vanished files (swap races), and
    any other non-grammar failure become ONE error row for the file —
    never a task failure. The record grammar has its own per-record
    error channel; this is the layer above it. A streaming query
    commits the file list to its offset log BEFORE reading, so an
    exception here would wedge the stream on every restart."""
    try:
        stream = open_stream()
    except Exception as e:
        yield {
            **{f.name: None for f in WARC_SCHEMA.fields},
            "warc_file": path,
            "error": f"archive open: {type(e).__name__}: {e}",
        }
        return
    it = _records_to_rows(path, stream, types, parse_http, max_records, keep_payload)
    try:
        while True:
            try:
                row = next(it)
            except StopIteration:
                return
            except Exception as e:
                yield {
                    **{f.name: None for f in WARC_SCHEMA.fields},
                    "warc_file": path,
                    "error": f"archive read: {type(e).__name__}: {e}",
                }
                return
            yield row
    finally:
        try:
            stream.close()
        except Exception:
            pass


def _binary_parser(
    types: frozenset[str] | None,
    parse_http: bool,
    max_records: int | None,
    keep_payload: bool = True,
):
    """mapInPandas kernel over binaryFile rows (path, content) —
    shared verbatim by the batch ``via='binaryFile'`` reader and the
    streaming source, so both parse byte-identically."""

    def parse_binary(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path, content in zip(b["path"], b["content"]):

                def open_stream(content=content):
                    buf = io.BytesIO(bytes(content))
                    if buf.getbuffer()[:2] == b"\x1f\x8b":
                        return gzip.open(buf, "rb")
                    return buf

                yield from _batched(
                    _rows_safely(
                        path, open_stream, types, parse_http, max_records,
                        keep_payload,
                    )
                )

    return parse_binary


def warc_source(
    spark: SparkSession,
    paths: str | Iterable[str],
    record_types: Iterable[str] | None = ("response", "conversion"),
    parse_http: bool = True,
    max_records_per_file: int | None = None,
    via: str = "stream",
    keep_payload: bool = True,
) -> DataFrame:
    """WARC files → one row per record (WARC_SCHEMA). ``paths`` is a
    glob or an explicit list; each file becomes (about) one partition.
    ``record_types=None`` keeps every record type (warcinfo, request,
    metadata…). ``via='stream'`` opens files with Python IO from the
    executors (local/NFS); ``via='binaryFile'`` reads whole files
    through Spark's binaryFile source (any Hadoop FS, ≤2 GiB/file)."""
    types = frozenset(record_types) if record_types is not None else None

    if via == "binaryFile":
        files_df = spark.read.format("binaryFile").load(
            paths if isinstance(paths, str) else list(paths)
        )
        return files_df.select("path", "content").mapInPandas(
            _binary_parser(types, parse_http, max_records_per_file, keep_payload),
            WARC_SCHEMA,
        )

    if via != "stream":
        raise ValueError(f"unknown via={via!r} (expected 'stream' or 'binaryFile')")

    files = _expand_paths(paths)
    paths_df = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        len(files)
    )

    def parse_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path in b["path"]:
                yield from _batched(
                    _rows_safely(
                        path,
                        lambda path=path: _open_maybe_gzip(path),
                        types,
                        parse_http,
                        max_records_per_file,
                        keep_payload,
                    )
                )

    return paths_df.mapInPandas(parse_stream, WARC_SCHEMA)


WET_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def wet_documents_source(
    spark: SparkSession,
    paths: str | Iterable[str],
    via: str = "stream",
) -> DataFrame:
    """WET (``conversion``) records → documents: (record_id, url,
    warc_date, text). The payload is UTF-8 plain text by spec; decode
    errors are replaced, never raised (one bad page must not kill a
    100 TB scan — the decode runs in the reader's Python kernel with
    errors='replace'; a JVM F.decode would THROW under Spark 4's
    default ANSI mode). Good rows have error IS NULL."""
    raw = warc_source(
        spark,
        paths,
        record_types=("conversion",),
        parse_http=False,
        via=via,
        keep_payload=False,
    )
    return raw.select(
        F.col("record_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date"),
        F.col("text"),
        F.col("error"),
    )


def warc_html_documents_source(
    spark: SparkSession,
    paths: str | Iterable[str],
    via: str = "stream",
    extract_main: bool = False,
    keep_statuses: Iterable[int] | None = (200,),
) -> DataFrame:
    """RAW WARC (response records) → documents: the full Common Crawl
    path, not just pre-extracted WET. Response records with an HTML
    content type are HTTP-split by the reader (compressed bodies are
    inflated there — gzip/deflate stdlib, others quarantine), the body
    decodes in the reader's kernel honoring the HTTP-declared charset
    (legacy Thai pages ship TIS-620/windows-874; unknown charsets
    quarantine; byte errors are replaced, never fatal), and the HTML
    layer
    (functions/html.py) strips it to visible text —
    ``extract_main=True`` upgrades the strip to text-density
    main-content extraction (nav/footer chrome dropped).
    ``keep_statuses`` gates on HTTP status (default 200 only — the
    Common Crawl convention; 404/5xx/redirect pages carry 'page not
    found' boilerplate HTML that must not enter a corpus; ``None``
    keeps every status). Returns (record_id → doc_id, url, warc_date,
    http_status, text, error); non-HTML, off-status, and malformed
    records keep their error/NULL channel so the caller can
    quarantine-count on its own scan.

    Plan: the WARC parse is the partition-per-file kernel; the HTTP
    split already happened inside it; the strip is pure codegen'd
    expressions (no UDF) — one pass, no shuffle."""
    from ..functions.html import extract_main_content, strip_html

    raw = warc_source(
        spark, paths, record_types=("response",), via=via, keep_payload=False
    )
    body_text = F.col("text")
    cleaner = extract_main_content if extract_main else strip_html
    is_html = F.lower(F.coalesce(F.col("http_content_type"), F.lit(""))).contains(
        "html"
    )
    status_ok = (
        F.lit(True)
        if keep_statuses is None
        else F.col("http_status").isin([int(s) for s in keep_statuses])
    )
    good = F.col("error").isNull() & is_html & status_ok
    return raw.select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date"),
        F.col("http_status"),
        F.when(good, cleaner(body_text)).alias("text"),
        F.when(F.col("error").isNotNull(), F.col("error"))
        .when(
            ~is_html,
            F.concat(
                F.lit("not html: "),
                F.coalesce(F.col("http_content_type"), F.lit("?")),
            ),
        )
        .when(
            ~status_ok,
            F.concat(F.lit("http status "), F.col("http_status").cast("string")),
        )
        .alias("error"),
    )


# The slice of Common Crawl's WAT envelope the metadata source reads
# (the published WAT shape: Envelope → Payload-Metadata →
# HTTP-Response-Metadata → HTML-Metadata → Head.Title / Links[]);
# from_json ignores fields outside this schema, so real WAT files with
# their full envelope parse with no schema churn.
_WAT_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "Envelope",
            T.StructType(
                [
                    T.StructField(
                        "Payload-Metadata",
                        T.StructType(
                            [
                                T.StructField(
                                    "HTTP-Response-Metadata",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "HTML-Metadata",
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "Head",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "Title",
                                                                        T.StringType(),
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "Links",
                                                            T.ArrayType(
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "url",
                                                                            T.StringType(),
                                                                        )
                                                                    ]
                                                                )
                                                            ),
                                                        ),
                                                    ]
                                                ),
                                            )
                                        ]
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        ),
        # PERMISSIVE from_json yields an all-null struct on malformed
        # input (never a NULL struct), so corruption is only visible
        # through the corrupt-record column
        T.StructField("_corrupt", T.StringType()),
    ]
)


def wat_metadata_source(
    spark: SparkSession,
    paths: str | Iterable[str],
    via: str = "stream",
) -> DataFrame:
    """WAT (``metadata``) records → per-page metadata: (record_id,
    url, warc_date, title, links array<string>, error) — the third leg
    of the Common Crawl triple (WARC raw captures, WET extracted text,
    WAT metadata sidecars). The reader's kernel decodes the
    ``application/json`` payload UTF-8-replace (never fatal); the
    envelope parses JVM-side with ``from_json`` against the published
    WAT shape (title + outgoing-link urls; extra envelope fields are
    ignored). A metadata record whose payload is not valid JSON keeps
    its row with ``error='bad WAT json'`` — quarantine, not a crash
    (PERMISSIVE ``from_json`` + the corrupt-record column; a malformed
    payload parses to an all-null struct, never a raised task).

    Plan: partition-per-file kernel parse, then pure codegen'd JSON
    path extraction — one pass, no shuffle, no UDF."""
    raw = warc_source(
        spark,
        paths,
        record_types=("metadata",),
        parse_http=False,
        via=via,
        keep_payload=False,
    )
    return _wat_projection(raw)


def _wat_projection(raw: DataFrame) -> DataFrame:
    """The envelope-parse projection over a WARC_SCHEMA metadata
    relation — shared verbatim by the batch source and the streaming
    source, so the two can never drift."""
    parsed = F.from_json(
        F.col("text"),
        _WAT_ENVELOPE_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    html_meta = (
        parsed.getField("Envelope")
        .getField("Payload-Metadata")
        .getField("HTTP-Response-Metadata")
        .getField("HTML-Metadata")
    )
    return raw.select(
        F.col("record_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date"),
        html_meta.getField("Head").getField("Title").alias("title"),
        F.transform(
            F.coalesce(
                html_meta.getField("Links"),
                F.array().cast("array<struct<url:string>>"),
            ),
            lambda l: l.getField("url"),
        ).alias("links"),
        F.coalesce(
            F.col("error"),
            F.when(
                parsed.getField("_corrupt").isNotNull(),
                F.lit("bad WAT json"),
            ),
            # text NULL means the record's Content-Type never matched a
            # textual marker, so from_json saw NULL and _corrupt stayed
            # null — without this leg such records would pass as 'good'
            # empty rows (title NULL, links []) instead of quarantining
            F.when(
                F.col("text").isNull(),
                F.lit("non-textual metadata payload"),
            ),
        ).alias("error"),
    )


def wat_metadata_stream(
    spark: SparkSession,
    dir_path: str,
    max_files_per_trigger: int | None = None,
    glob: str = "*.{warc,warc.gz,wat,wat.gz}",
) -> DataFrame:
    """STREAMING WAT source: new metadata archives landing in
    ``dir_path`` join the next micro-batch, parsed by the SAME
    projection as :func:`wat_metadata_source` (continuous link-graph
    ingest — the feeder for ``streaming.link_graph``)."""
    raw = warc_stream_source(
        spark,
        dir_path,
        record_types=("metadata",),
        parse_http=False,
        max_files_per_trigger=max_files_per_trigger,
        glob=glob,
    )
    return _wat_projection(raw)


def wat_sink(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    title_col: str = "title",
    links_col: str | None = "links",
    date: str = "2000-01-01T00:00:00Z",
    gzip_per_record: bool = True,
    warcinfo: dict[str, str] | None = None,
) -> list[dict]:
    """Write per-page metadata as WAT-style ``metadata`` records: the
    (title, links) relation serializes into the published envelope
    shape with ``to_json`` (pure codegen) and rides
    :func:`warc_sink`'s record writer — so :func:`wat_metadata_source`
    round-trips it byte-exactly, and the archives interoperate with
    WAT consumers that read the standard envelope path."""
    links = (
        F.transform(F.col(links_col), lambda u: F.struct(u.alias("url")))
        if links_col
        else F.array().cast("array<struct<url:string>>")
    )
    envelope = F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    F.struct(
                        F.struct(
                            F.struct(
                                F.col(title_col).cast("string").alias("Title")
                            ).alias("Head"),
                            links.alias("Links"),
                        ).alias("HTML-Metadata")
                    ).alias("HTTP-Response-Metadata")
                ).alias("Payload-Metadata")
            ).alias("Envelope")
        )
    )
    return warc_sink(
        df.select(F.col(url_col).alias("url"), envelope.alias("_wat_json")),
        path,
        record_type="metadata",
        url_col="url",
        text_col="_wat_json",
        date=date,
        gzip_per_record=gzip_per_record,
        warcinfo=warcinfo,
    )


def warc_stream_source(
    spark: SparkSession,
    dir_path: str,
    record_types: Iterable[str] | None = ("response", "conversion"),
    parse_http: bool = True,
    max_files_per_trigger: int | None = None,
    glob: str = "*.{warc,warc.gz}",
) -> DataFrame:
    """STREAMING WARC source: a binaryFile file-source stream over
    archives arriving in ``dir_path`` (matched by ``glob``), parsed by
    the same kernel as the batch ``via='binaryFile'`` path — the
    continuous-ingest form of a Common Crawl pipeline (new WET shards
    land in a directory; each becomes part of the next micro-batch).
    ``max_files_per_trigger`` bounds epoch size the standard way.
    binaryFile holds one whole archive per row (≤2 GiB) — exactly the
    batch path's bound."""
    types = frozenset(record_types) if record_types is not None else None
    # binaryFile's schema is fixed by the format, but streaming file
    # sources require it EXPLICIT (Spark refuses inference on streams)
    binary_file_schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("modificationTime", T.TimestampType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(dir_path)
    return files.select("path", "content").mapInPandas(
        _binary_parser(types, parse_http, None), WARC_SCHEMA
    )


def wet_documents_stream(
    spark: SparkSession,
    dir_path: str,
    max_files_per_trigger: int | None = None,
    glob: str = "*.{warc,warc.gz}",
) -> DataFrame:
    """Streaming WET → the documents relation the incremental exporter
    consumes (doc_id, url, text): conversion records only, malformed
    records dropped inside the stream (an error row must never abort a
    long-running ingest query; audit malformed archives at rest with
    the batch :func:`warc_source`)."""
    raw = warc_stream_source(
        spark,
        dir_path,
        record_types=("conversion",),
        parse_http=False,
        max_files_per_trigger=max_files_per_trigger,
        glob=glob,
    )
    return raw.filter(F.col("error").isNull()).select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("text"),
    )


# ----------------------------------------------------------------- sink


def _warc_record_bytes(
    record_type: str,
    url: str | None,
    date: str,
    block: bytes,
    content_type: str,
    extra: dict[str, str] | None = None,
) -> bytes:
    """Serialize one record. The record id is uuid5 over
    (url, sha1(block)) — deterministic, so re-running an export
    produces byte-identical files (the repo-wide reproducibility
    convention)."""
    digest = hashlib.sha1(block).hexdigest()
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url or ''}|{digest}")
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + record_type.encode("ascii"),
        b"WARC-Record-ID: <urn:uuid:" + str(rid).encode("ascii") + b">",
        b"WARC-Date: " + date.encode("ascii"),
    ]
    if url:
        head.append(b"WARC-Target-URI: " + url.encode("utf-8"))
    for k, v in (extra or {}).items():
        head.append(k.encode("ascii") + b": " + v.encode("utf-8"))
    head.append(b"Content-Type: " + content_type.encode("ascii"))
    head.append(b"Content-Length: " + str(len(block)).encode("ascii"))
    return _CRLF.join(head) + _CRLF + _CRLF + block + _CRLF + _CRLF


MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def warc_sink(
    df: DataFrame,
    path: str,
    record_type: str = "conversion",
    url_col: str = "url",
    text_col: str | None = "text",
    payload_col: str | None = None,
    date: str = "2000-01-01T00:00:00Z",
    gzip_per_record: bool = True,
    warcinfo: dict[str, str] | None = None,
    http_status_col: str | None = None,
    http_content_type_col: str | None = None,
) -> list[dict]:
    """Write ``df`` as WARC files, one file per non-empty partition,
    one gzip member per record (Common Crawl's range-addressable
    layout) unless ``gzip_per_record=False`` (plain ``.warc``).

    ``record_type='conversion'`` writes WET-style text records from
    ``text_col``; ``record_type='resource'`` writes raw bytes from
    ``payload_col``; ``record_type='response'`` wraps ``payload_col``
    bytes in a minimal HTTP/1.1 response envelope
    (``application/http; msgtype=response`` — status from
    ``http_status_col`` when given, else 200; body Content-Type from
    ``http_content_type_col``, else octet-stream), which is what the
    batch reader's ``parse_http`` splits back apart. ``date`` is a
    fixed WARC-Date so exports are reproducible byte-for-byte (pass
    the real capture time per export if provenance matters more than
    determinism).

    ``warcinfo`` (a dict of fields, e.g. ``{"software": "...",
    "isPartOf": "crawl-01"}``) prepends the standard leading
    ``warcinfo`` record to every file — Common Crawl's convention;
    its block is the fields serialized as ``key: value`` lines.

    Returns the manifest: [{file, n_records, n_bytes}, …] sorted by
    file — bounded at one row per partition, never per record; the
    warcinfo record is not counted (it describes the file, it is not
    corpus data — symmetric with the reader, whose default
    record_types filter drops it).
    """
    status_col = (
        F.col(http_status_col).cast("int")
        if http_status_col
        else F.lit(None).cast("int")
    )
    http_ct_col = (
        F.col(http_content_type_col).cast("string")
        if http_content_type_col
        else F.lit(None).cast("string")
    )
    if record_type == "conversion":
        if text_col is None:
            raise ValueError("record_type='conversion' needs text_col")
        content_type = "text/plain; charset=utf-8"
        src = df.select(
            F.col(url_col).cast("string").alias("url"),
            F.encode(F.col(text_col).cast("string"), "UTF-8").alias("block"),
            status_col.alias("_status"),
            http_ct_col.alias("_http_ct"),
        )
    elif record_type == "metadata":
        # WAT convention: JSON metadata per record (text_col carries
        # the serialized envelope)
        if text_col is None:
            raise ValueError("record_type='metadata' needs text_col")
        content_type = "application/json"
        src = df.select(
            F.col(url_col).cast("string").alias("url"),
            F.encode(F.col(text_col).cast("string"), "UTF-8").alias("block"),
            status_col.alias("_status"),
            http_ct_col.alias("_http_ct"),
        )
    elif record_type in ("resource", "response"):
        if payload_col is None:
            raise ValueError(f"record_type={record_type!r} needs payload_col")
        content_type = (
            "application/http; msgtype=response"
            if record_type == "response"
            else "application/octet-stream"
        )
        src = df.select(
            F.col(url_col).cast("string").alias("url"),
            F.col(payload_col).cast("binary").alias("block"),
            status_col.alias("_status"),
            http_ct_col.alias("_http_ct"),
        )
    else:
        raise ValueError(f"unsupported record_type {record_type!r}")

    warcinfo_bytes = None
    if warcinfo is not None:
        info_block = "".join(
            f"{k}: {v}\r\n" for k, v in sorted(warcinfo.items())
        ).encode("utf-8")
        warcinfo_bytes = _warc_record_bytes(
            "warcinfo", None, date, info_block, "application/warc-fields"
        )

    os.makedirs(path, exist_ok=True)
    ext = ".warc.gz" if gzip_per_record else ".warc"
    run_tag = uuid.uuid4().hex[:12]

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(path, exist_ok=True)  # executors may not share the driver's mkdir
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}-{run_tag}{ext}")
        tmp = fname + ".inprogress"
        n = 0
        out = None

        def emit(rec: bytes) -> None:
            # mtime=0: the default embeds wall-clock time in the gzip
            # header, breaking the byte-identical-rerun contract
            # _warc_record_bytes establishes
            out.write(gzip.compress(rec, mtime=0) if gzip_per_record else rec)

        try:
            for b in batches:
                for url, block, status, http_ct in zip(
                    b["url"], b["block"], b["_status"], b["_http_ct"]
                ):
                    if out is None:
                        out = open(tmp, "wb")
                        if warcinfo_bytes is not None:
                            emit(warcinfo_bytes)
                    body = bytes(block)
                    if record_type == "response":
                        code = 200 if pd.isna(status) else int(status)
                        ct = (
                            "application/octet-stream"
                            if http_ct is None or pd.isna(http_ct)
                            else str(http_ct)
                        )
                        # header values: strip CR/LF (header injection
                        # would corrupt the envelope) and encode
                        # latin-1-replace (HTTP's header charset) — one
                        # odd content-type must never crash the export
                        ct = ct.replace("\r", " ").replace("\n", " ")
                        body = (
                            f"HTTP/1.1 {code} {_HTTP_REASONS.get(code, 'Unknown')}\r\n"
                            f"Content-Type: {ct}\r\n"
                            f"Content-Length: {len(body)}\r\n\r\n"
                        ).encode("latin-1", "replace") + body
                    emit(_warc_record_bytes(record_type, url, date, body, content_type))
                    n += 1
        finally:
            if out is not None:
                out.close()
        if n == 0:
            return  # empty partition → no file, no manifest row
        os.replace(tmp, fname)  # atomic publish (write-then-swap convention)
        yield pd.DataFrame(
            [{"file": fname, "n_records": n, "n_bytes": os.path.getsize(fname)}]
        )

    manifest = src.mapInPandas(write_partition, MANIFEST_SCHEMA).collect()
    return sorted((r.asDict() for r in manifest), key=lambda d: d["file"])
