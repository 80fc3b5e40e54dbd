"""WARC source (SURVEY §2.1 widening): Common-Crawl-style web archives
as a Ray Data source — the native at-rest format of the §1.2 pages
table's upstream.

Scale shape: one read task per WARC file (Common Crawl shards are ~1 GB
gzip files of concatenated members; gzip members are not
range-splittable without an external index, and one-task-per-file is
exactly how production CC jobs shard).  Records are parsed STREAMING
inside the task — `_read_stream` yields fixed-size Arrow batches as it
walks the archive, so a 1 GB file never materializes as one block and
the streaming executor backpressures the read as usual.

Only `WARC-Type: response` records are emitted:
  (url string, warc_ts timestamp[us], html binary)
with the HTTP response envelope DECODED, not just stripped: headers
split off, `Transfer-Encoding: chunked` de-chunked and
`Content-Encoding: gzip/deflate` decompressed (both are routine in real
Common-Crawl response records; records without an HTTP envelope pass
through whole).  Malformed records — corrupt Content-Length, misaligned
boundaries, truncated archives, bad chunk framing — are counted and
skipped with a resync to the next 'WARC/' boundary; untrusted archives
never abort the read task.  `pages_from_warc` lifts the result to the
§1.2 pages schema (text/lang NULL — the flagship's extract stage
derives text from html).
"""

from __future__ import annotations

import gzip
import io as _io
from datetime import datetime, timezone

import pyarrow as pa
from ray.data import Dataset
from ray.data.datasource import FileBasedDatasource

_BATCH = 512


def _parse_warc_ts(s: str) -> int | None:
    """WARC-Date (ISO 8601, e.g. 2017-03-06T04:02:06Z) → epoch µs."""
    try:
        dt = datetime.fromisoformat(s.strip().replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return None


def _dechunk(body: bytes) -> bytes:
    """Decode Transfer-Encoding: chunked framing (RFC 7230 §4.1):
    hex-size line, chunk bytes, CRLF, …, 0-size terminator.  Malformed
    framing returns the chunks decoded so far plus nothing else if the
    very first size line is bad — i.e. best-effort, never raises."""
    out: list[bytes] = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body if not out else b"".join(out)
        if size == 0:
            return b"".join(out)
        start = eol + 2
        out.append(body[start:start + size])
        pos = start + size + 2  # skip the CRLF after the chunk data
    return b"".join(out) if out else body


def _strip_http_envelope(payload: bytes) -> bytes:
    """HTTP response envelope → body bytes: split at the header
    terminator, de-chunk Transfer-Encoding: chunked, decompress
    Content-Encoding: gzip/x-gzip/deflate (Common-Crawl response
    records routinely carry both — warcio does the same decode).
    Whole payload if the record carries no HTTP envelope; any malformed
    framing/compression degrades to the raw body (untrusted input must
    not kill the read task)."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return payload
    te = b""
    ce = b""
    for ln in payload[:sep].split(b"\r\n")[1:]:
        if b":" not in ln:
            continue
        k, v = ln.split(b":", 1)
        k = k.strip().lower()
        if k == b"transfer-encoding":
            te = v.strip().lower()
        elif k == b"content-encoding":
            ce = v.strip().lower()
    body = payload[sep + 4:]
    if b"chunked" in te:
        body = _dechunk(body)
    if ce in (b"gzip", b"x-gzip"):
        try:
            body = gzip.decompress(body)
        except Exception:
            pass  # mislabeled/corrupt: keep raw body
    elif ce == b"deflate":
        import zlib

        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)  # raw deflate
            except zlib.error:
                pass
    return body


def _iter_warc_records(stream, counters: "dict[str, int] | None" = None):
    """Yield (headers dict lowercased, payload bytes) per WARC record.
    Handles WARC/1.0 and 1.1; tolerant of trailing blank lines.

    Web archives are untrusted input, so one bad record must not kill
    the read task: a corrupt Content-Length or a misaligned boundary is
    COUNTED (``counters``: 'bad_length' / 'resync' / 'truncated') and
    skipped by scanning forward to the next line starting with 'WARC/'
    instead of raising."""
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue  # inter-record blank lines
        if not line.startswith(b"WARC/"):
            # lost sync (garbage between records / bad prior length):
            # resync to the next record boundary
            if counters is not None:
                counters["resync"] = counters.get("resync", 0) + 1
            while line and not line.startswith(b"WARC/"):
                line = stream.readline()
            if not line:
                return
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1"))
        try:
            n = int(headers.get("content-length", "0"))
            if n < 0:
                raise ValueError(n)
        except ValueError:
            if counters is not None:
                counters["bad_length"] = counters.get("bad_length", 0) + 1
            continue  # next loop iteration resyncs to 'WARC/'
        payload = stream.read(n)
        if len(payload) < n:
            if counters is not None:
                counters["truncated"] = counters.get("truncated", 0) + 1
            return
        yield headers, payload


class WARCDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def _read_stream(self, f, path: str):
        raw = _io.BufferedReader(_RawAdapter(f))
        head = raw.peek(2)[:2]
        stream = (_io.BufferedReader(
            gzip.GzipFile(fileobj=raw))  # multi-member transparent
            if head == b"\x1f\x8b" else raw)
        urls: list = []
        tss: list = []
        bodies: list = []

        def flush():
            t = pa.table({
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(tss, type=pa.timestamp("us")),
                "html": pa.array(bodies, type=pa.binary()),
            })
            urls.clear()
            tss.clear()
            bodies.clear()
            return t

        counters: dict[str, int] = {}
        for headers, payload in _iter_warc_records(stream, counters):
            if headers.get("warc-type") != "response":
                continue
            urls.append(headers.get("warc-target-uri"))
            tss.append(_parse_warc_ts(headers.get("warc-date", "")))
            bodies.append(_strip_http_envelope(payload))
            if len(urls) >= _BATCH:
                yield flush()
        if urls:
            yield flush()
        if counters:
            import logging

            logging.getLogger(__name__).warning(
                "WARC %s: skipped malformed input %s", path, counters)


class _RawAdapter(_io.RawIOBase):
    """pyarrow NativeFile → io.RawIOBase so BufferedReader/GzipFile get
    the file-like protocol they expect."""

    def __init__(self, f):
        self._f = f

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self._f.read(len(b))
        b[: len(data)] = data
        return len(data)


def read_warc(paths, **kwargs) -> Dataset:
    """WARC/WARC.gz files → Dataset(url, warc_ts, html) of response
    records.  One task per file (see module docstring)."""
    import ray.data

    return ray.data.read_datasource(WARCDatasource(paths, **kwargs))


def pages_from_warc(ds: Dataset) -> Dataset:
    """Lift (url, warc_ts, html) to the §1.2 pages schema: text/lang
    NULL — the flagship's extract stage derives text from html."""

    def lift(b: pa.Table) -> pa.Table:
        return b.append_column(
            "text", pa.nulls(b.num_rows, type=pa.string())
        ).append_column("lang", pa.nulls(b.num_rows, type=pa.string()))

    return ds.map_batches(lift, batch_format="pyarrow")
