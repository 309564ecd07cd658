"""WARC source: ingest web-archive files (the Common Crawl delivery
format, ISO 28500) straight into the corpus schema the extraction
pipeline consumes.

The reference fetches live URLs one at a time
(``/root/reference/src/FetchEngine.ts:83-165``); at 100-TB scale the
same documents arrive as crawl archives — ~1 GB ``.warc.gz`` files,
one gzip member per record.  Scale shape: FILES are the parallelism
unit — ``ray.data.read_binary_files`` distributes whole-file reads
across the cluster and each map task parses its own file's records, so
bytes never flow through the driver and a shard list partitions work
exactly like the crawl publishes it.  Multi-member gzip (the CC
convention) decompresses transparently with stdlib ``gzip``.

Pure-stdlib parser; only ``WARC-Type: response`` records carrying an
HTML HTTP response become documents (requests/metadata/non-HTML are
counted and skipped — the reference's content-type gate,
``FetchEngine.ts:116-123``).
"""

from __future__ import annotations

import gzip
import os
import zlib
from typing import Iterator

import pyarrow as pa

import ray.data

from .io import CORPUS_SCHEMA, _doc_row


class WarcFormatError(ValueError):
    pass


def split_warc_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(warc_headers, payload)`` per record.  Header names are
    lower-cased; payload is exactly ``Content-Length`` bytes."""
    pos, n = 0, len(buf)
    while pos < n:
        while buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcFormatError("truncated WARC header block")
        lines = buf[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise WarcFormatError(f"bad WARC version line: {lines[0][:40]!r}")
        headers: dict = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError as exc:
            raise WarcFormatError("missing/invalid Content-Length") from exc
        start = hdr_end + 4
        if start + length > n:
            raise WarcFormatError("truncated WARC payload")
        yield headers, buf[start : start + length]
        pos = start + length


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer coding (RFC 9112 §7.1).
    Crawl archives store the raw wire bytes, so chunk framing survives
    into the WARC payload and must be stripped before HTML parsing."""
    out, pos, n = [], 0, len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise WarcFormatError("truncated chunk-size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()  # drop chunk extensions
        try:
            size = int(size_tok, 16)
        except ValueError as exc:
            raise WarcFormatError(f"bad chunk size: {size_tok[:16]!r}") from exc
        pos = eol + 2
        if size == 0:
            break  # trailer section (if any) is ignored
        if pos + size > n:
            raise WarcFormatError("truncated chunk data")
        out.append(body[pos : pos + size])
        pos += size + 2  # skip the chunk's trailing CRLF
    return b"".join(out)


def parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """``(status, content_type, body)`` from an HTTP/1.x response
    payload (the WARC response record body).  Chunked transfer coding
    is decoded; gzip/deflate content codings are decompressed (crawlers
    archive the raw wire form)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise WarcFormatError("no HTTP header/body separator")
    head = payload[:sep].decode("latin-1", "replace").split("\r\n")
    parts = head[0].split()
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise WarcFormatError(f"bad HTTP status line: {head[0][:40]!r}")
    try:
        status = int(parts[1])
    except ValueError as exc:
        raise WarcFormatError(f"non-numeric HTTP status: {parts[1][:16]!r}") from exc
    ctype = ""
    transfer = ""
    encoding = ""
    for line in head[1:]:
        k, _, v = line.partition(":")
        k = k.strip().lower()
        if k == "content-type":
            ctype = v.strip().lower()
        elif k == "transfer-encoding":
            transfer = v.strip().lower()
        elif k == "content-encoding":
            encoding = v.strip().lower()
    body = payload[sep + 4 :]
    if "chunked" in transfer:
        body = _dechunk(body)
    if encoding in ("gzip", "x-gzip") and body[:2] == b"\x1f\x8b":
        body = gzip.decompress(body)
    elif encoding == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:  # raw-deflate servers (no zlib wrapper)
            body = zlib.decompress(body, -zlib.MAX_WBITS)
    return status, ctype, body


def _safe_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """``split_warc_records`` that degrades a mid-file format error into
    end-of-file instead of aborting the whole distributed read."""
    try:
        yield from split_warc_records(data)
    except WarcFormatError:
        return


def read_warc(paths) -> "ray.data.Dataset":
    """WARC file(s)/dir → corpus-shaped Dataset (``doc_id, spans,
    base_url, archetype``) ready for ``build_pipeline``.

    ``doc_id`` is ``<file basename>:<record index>`` (stable and unique
    per crawl shard); ``base_url`` is the record's WARC-Target-URI, so
    relative-link absolutization (M4) works exactly as it does for
    live-fetched pages.  Only 2xx ``text/html`` response records become
    documents.
    """

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            try:
                if data[:2] == b"\x1f\x8b":
                    # multi-member gzip (the CC convention); checked by
                    # magic, not extension — ray.data.read_binary_files
                    # already auto-decompresses when the extension says .gz
                    data = gzip.decompress(data)
            except (OSError, EOFError, zlib.error):
                # corrupt shard: skip the file (mid-stream gzip bit-rot
                # raises zlib.error, not OSError — one bad shard must
                # never abort the whole distributed read)
                continue
            base = os.path.basename(path)
            # a truncated record stops THIS file's walk but keeps the
            # records parsed so far (and every other file in the batch)
            for i, (hdrs, payload) in enumerate(_safe_records(data)):
                if hdrs.get("warc-type") != "response":
                    continue
                try:
                    status, ctype, body = parse_http_response(payload)
                except (WarcFormatError, OSError, EOFError, zlib.error):
                    # malformed record or corrupt compressed body:
                    # skip the record, never the shard (routine in
                    # real crawl archives)
                    continue
                if not (200 <= status < 300) or "html" not in ctype:
                    continue
                rows.append(
                    _doc_row(
                        f"{base}:{i}",
                        body.decode("utf-8", "replace"),
                        hdrs.get("warc-target-uri", ""),
                    )
                )
        return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)

    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_warc(records: list[dict], path: str, gz: bool = False) -> None:
    """Write WARC response records (test/fixture utility; also the
    round-trip proof for the parser).  Each record dict:
    ``{"url": ..., "html": ..., "status": 200, "content_type":
    "text/html", "warc_type": "response"}``.  With ``gz`` each record
    becomes its own gzip member (the Common Crawl layout)."""
    out = b""
    for rec in records:
        body = rec["html"].encode("utf-8")
        extra = ""
        if rec.get("content_encoding") == "gzip":
            body = gzip.compress(body)
            extra += "Content-Encoding: gzip\r\n"
        if rec.get("transfer_encoding") == "chunked":
            # split into two chunks to exercise reassembly
            mid = max(1, len(body) // 2)
            body = b"".join(
                b"%x\r\n%s\r\n" % (len(c), c) for c in (body[:mid], body[mid:]) if c
            ) + b"0\r\n\r\n"
            extra += "Transfer-Encoding: chunked\r\n"
        http = (
            f"HTTP/1.1 {rec.get('status', 200)} OK\r\n"
            f"Content-Type: {rec.get('content_type', 'text/html')}\r\n"
            f"{extra}"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        warc = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec.get('warc_type', 'response')}\r\n"
            f"WARC-Target-URI: {rec.get('url', '')}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("utf-8") + http + b"\r\n\r\n"
        out += gzip.compress(warc) if gz else warc
    with open(path, "wb") as f:
        f.write(out)
