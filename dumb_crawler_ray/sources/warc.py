"""WARC import/export shim — migrate existing reference archives.

The reference stores each crawled page as a WARC ``response`` record whose
``WARC-Target-URI`` is the task URL and whose block is an HTTP response
message with a ``text/html;charset=utf-8`` body
(J/services/storage/WarcStorageManager.java:77-83); its viewer walks a
directory tree for ``*.warc`` and reads records sequentially
(J/WarcViewer.java:99-141). This module implements that subset:

- ``read_warc_records(path)``   stream-parse a WARC/1.0-1.1 file
- ``write_warc(rows, path)``    emit reference-compatible response records
- ``import_warc(src, ckpt_dir, config_raw)`` convert every response record
  into the engine's ``pages`` checkpoint fragments (round id -2 so normal
  round cleanup never touches imports), computing url_hash with the SAME
  UrlHasher the crawl uses — imported pages are then queryable via
  inspect_cli / the url_hash→page lookup exactly like crawled ones.

Parsing is lenient about record CONTENT (non-HTTP blocks and unknown
charsets are skipped/decoded-with-replacement), but a record whose FRAMING
is broken — missing/invalid Content-Length, truncated block, non-WARC
leader — makes the rest of the file unwalkable, so reading STOPS there
(mirroring the viewer's stop-on-error loop) and logs a warning with the
file path and byte offset so partial imports are detectable.
"""

from __future__ import annotations

import logging
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

logger = logging.getLogger(__name__)

IMPORT_ROUND = -2  # below any crawl round; never swept by round cleanup


def _read_headers(fh) -> dict[str, str] | None:
    """Read a CRLF-terminated header block; None at EOF."""
    line = fh.readline()
    while line in (b"\r\n", b"\n"):  # tolerate extra separators
        line = fh.readline()
    if not line:
        return None
    headers: dict[str, str] = {}
    first = line.decode("utf-8", "replace").strip()
    headers["__version__"] = first
    while True:
        line = fh.readline()
        if not line or line in (b"\r\n", b"\n"):
            break
        text = line.decode("utf-8", "replace").rstrip("\r\n")
        if ":" in text:
            k, v = text.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def read_warc_records(path: str):
    """Yield (headers, block_bytes) for each record in one .warc file.
    Broken framing (non-WARC leader, bad Content-Length, truncated block)
    stops the file with a logged warning — records after the break are
    unreachable without the length chain, so they are abandoned, not
    silently skipped."""
    n_records = 0
    with open(path, "rb") as fh:
        while True:
            pos = fh.tell()
            headers = _read_headers(fh)
            if headers is None:
                return
            if not headers["__version__"].startswith("WARC/"):
                logger.warning(
                    "%s: non-WARC record leader %r at byte %d after %d "
                    "record(s); abandoning the rest of the file",
                    path, headers["__version__"][:40], pos, n_records)
                return
            try:
                n = int(headers.get("content-length", ""))
            except ValueError:
                logger.warning(
                    "%s: missing/invalid Content-Length %r at byte %d after "
                    "%d record(s); abandoning the rest of the file",
                    path, headers.get("content-length"), pos, n_records)
                return
            block = fh.read(n)
            if len(block) < n:
                logger.warning(
                    "%s: truncated block (%d of %d bytes) at byte %d after "
                    "%d record(s)", path, len(block), n, pos, n_records)
                return
            n_records += 1
            yield headers, block


def parse_http_response(block: bytes) -> tuple[int, str] | None:
    """(status, body-text) from an HTTP response message block, or None."""
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = block.partition(b"\n\n")
    lines = head.split(b"\r\n" if b"\r\n" in head else b"\n")
    if not lines or not lines[0].startswith(b"HTTP/"):
        return None
    parts = lines[0].split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None
    charset = "utf-8"
    for line in lines[1:]:
        low = line.decode("utf-8", "replace").lower()
        if low.startswith("content-type:") and "charset=" in low:
            charset = low.split("charset=", 1)[1].split(";")[0].strip()
    try:
        return status, body.decode(charset, "replace")
    except LookupError:  # unknown charset token: stay lenient, don't abort
        return status, body.decode("utf-8", "replace")


def iter_warc_pages(src: str):
    """Walk `src` (file or directory) for *.warc; yield (url, html) for
    every 200 response record."""
    if os.path.isdir(src):
        paths = sorted(
            os.path.join(root, n)
            for root, _dirs, files in os.walk(src)
            for n in files
            if n.endswith(".warc")
        )
    else:
        paths = [src]
    for p in paths:
        for headers, block in read_warc_records(p):
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri")
            if not url:
                continue
            parsed = parse_http_response(block)
            if parsed is None or parsed[0] != 200:
                continue
            yield url, parsed[1]


def import_warc(src: str, ckpt_dir: str, config_raw: dict | None = None,
                batch_rows: int = 4096) -> int:
    """Convert WARC response records into `pages` checkpoint fragments.
    Streams in bounded batches — an archive bigger than memory imports
    fine. Returns the number of imported pages."""
    from ..config import JobConfig
    from ..functions.urlhash import UrlHasher
    from ..stages.fetch import PAGES_SCHEMA

    hasher = UrlHasher(JobConfig(config_raw or {}).id_extractor_pattern)
    out_dir = os.path.join(ckpt_dir, "pages", f"round={IMPORT_ROUND}")
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    rows: list[dict] = []

    def flush():
        nonlocal rows
        if not rows:
            return
        pq.write_table(
            pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
            os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.parquet"),
        )
        rows = []

    for url, html in iter_warc_pages(src):
        # same body quirk as the live path: newline-stripped html
        # (SimpleHttpRenderer.java:44-50)
        rows.append(
            {
                "url_hash": hasher.hash_url(url),
                "url": url,
                "tags": [],
                "html": "".join(html.splitlines()),
                "round": IMPORT_ROUND,
                "rank": total,
            }
        )
        total += 1
        if len(rows) >= batch_rows:
            flush()
    flush()
    return total


def write_warc(rows, path: str) -> int:
    """Write (url, html) pairs as WARC/1.0 response records with the same
    record shape the reference emits (WarcStorageManager.createResponse).
    Export shim + round-trip test fixture writer."""
    n = 0
    with open(path, "wb") as fh:
        for url, html in rows:
            body = html.encode("utf-8")
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html;charset=utf-8\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
            )
            rec = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:uuid:{uuid.uuid4()}>\r\n"
                "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                f"WARC-Target-URI: {url}\r\n"
                "Content-Type: application/http;msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode() + http + b"\r\n\r\n"
            fh.write(rec)
            n += 1
    return n
