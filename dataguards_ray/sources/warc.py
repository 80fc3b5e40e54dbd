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
with the HTTP response envelope stripped (body after the first CRLFCRLF;
records without an HTTP envelope pass through whole).  `pages_from_warc`
lifts the result to the §1.2 pages schema (text/lang NULL — the
flagship's extract stage derives text from html).
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


def _strip_http_envelope(payload: bytes) -> bytes:
    """Body after the HTTP response headers; whole payload if the record
    carries no HTTP envelope."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def _iter_warc_records(stream):
    """Yield (headers dict lowercased, payload bytes) per WARC record.
    Handles WARC/1.0 and 1.1; tolerant of trailing blank lines."""
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue  # inter-record blank lines
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1"))
        n = int(headers.get("content-length", "0"))
        payload = stream.read(n)
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

        for headers, payload in _iter_warc_records(stream):
            if headers.get("warc-type") != "response":
                continue
            urls.append(headers.get("warc-target-uri"))
            tss.append(_parse_warc_ts(headers.get("warc-date", "")))
            bodies.append(_strip_http_envelope(payload))
            if len(urls) >= _BATCH:
                yield flush()
        if urls:
            yield flush()


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
