"""URL normalization / domain extraction (SURVEY §2.3 M7; RefinedWeb-style
url handling).  Frozen pure functions — no network, fixed suffix snapshot.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# Frozen snapshot of multi-label public suffixes relevant to the corpora
# (a full PSL is out of scope; unknowns fall back to last-2-labels).
_TWO_LABEL_SUFFIXES = frozenset(
    "co.uk ac.uk org.uk gov.uk com.au net.au org.au co.jp or.jp ne.jp "
    "com.cn org.cn net.cn com.br org.br com.mx".split()
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_normalize_one(url: str) -> str:
    """Lowercase scheme/host, strip default port and fragment, keep
    path/query; '' for unparseable."""
    try:
        p = urlsplit(url)
    except ValueError:
        return ""
    scheme = p.scheme.lower()
    host = (p.hostname or "").rstrip(".")
    if ":" in host:  # IPv6 literal: re-bracket so the result re-parses
        host = f"[{host}]"
    port = f":{p.port}" if p.port and str(p.port) != _DEFAULT_PORTS.get(scheme) else ""
    path = p.path or "/"
    q = f"?{p.query}" if p.query else ""
    return f"{scheme}://{host}{port}{path}{q}"


def url_domain_one(url: str) -> str:
    """Registered domain: last 2 labels, or 3 when the 2-label tail is a
    known public suffix (frozen snapshot).  A trailing root dot
    (``example.com.`` — the absolute-FQDN form, a classic blocklist
    evasion) is stripped first: DNS-wise it is the same host."""
    try:
        host = (urlsplit(url).hostname or "").rstrip(".")
    except ValueError:
        return ""
    labels = host.lower().split(".")
    if len(labels) < 2:
        return host.lower()
    tail2 = ".".join(labels[-2:])
    if tail2 in _TWO_LABEL_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return tail2


def url_host_one(url: str) -> str:
    """Lowercased hostname, root dot stripped; '' for unparseable."""
    try:
        return (urlsplit(url).hostname or "").lower().rstrip(".")
    except ValueError:
        return ""


def _map_unique(urls: "pa.Array | pa.ChunkedArray", fn) -> pa.Array:
    """Apply a per-string kernel once per UNIQUE value (dictionary-
    encode → kernel over the dictionary → take; web corpora repeat
    hosts heavily, so the per-row cost is one vectorized `take`)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    enc = urls.dictionary_encode()
    vals = pa.array([fn(u) if u else "" for u in enc.dictionary.to_pylist()],
                    type=pa.string())
    return vals.take(enc.indices).fill_null("")


def domains_array(urls: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Vectorized registered-domain extraction (see _map_unique)."""
    return _map_unique(urls, url_domain_one)


def hosts_array(urls: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Vectorized lowercased-hostname extraction (see _map_unique)."""
    return _map_unique(urls, url_host_one)


def blocklist_hits(
    urls: "pa.Array | pa.ChunkedArray",
    value_set: pa.Array,
    *,
    match: str = "either",
) -> pa.Array:
    """Boolean hit mask of urls against a blocklist: ``match`` is
    'domain' (registered domain), 'host' (full lowercased hostname), or
    'either' (default — UT1-style lists mix registered domains with
    host-level entries like xxx.example.com, and real matchers probe
    both)."""
    if match not in ("domain", "host", "either"):
        raise ValueError(f"match must be domain|host|either, got {match!r}")
    hit = None
    if match in ("domain", "either"):
        hit = pc.is_in(domains_array(urls), value_set=value_set)
    if match in ("host", "either"):
        h = pc.is_in(hosts_array(urls), value_set=value_set)
        hit = h if hit is None else pc.or_(hit, h)
    return pc.fill_null(hit, False)


def add_url_domain(ds: Dataset, *, col: str = "url", out: str = "domain") -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(out, domains_array(batch.column(col)))

    return ds.map_batches(f, batch_format="pyarrow")


def block_by_domain(
    ds: Dataset,
    blocked: "frozenset[str] | set[str] | list[str]",
    *,
    col: str = "url",
    mode: str = "drop",
    match: str = "either",
    out: str = "blocked",
) -> Dataset:
    """UT1/RefinedWeb-style domain blocklist gate: drop (or flag, with
    ``mode='flag'``) every row whose registered domain or full hostname
    (``match``, see blocklist_hits) is on ``blocked``.

    Scale shape: the blocklist is list-of-domains sized (UT1 ≈ 4M rows,
    a few MB) — broadcast ONCE via ``ray.put`` and probed per batch with
    vectorized ``pc.is_in`` over the dictionary-encoded domain/host
    columns; no shuffle, no per-row Python beyond unique hosts."""
    import ray

    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    blocked_ref = ray.put(pa.array(sorted({d.lower() for d in blocked}),
                                   type=pa.string()))

    def f(batch: pa.Table) -> pa.Table:
        hit = blocklist_hits(batch.column(col), ray.get(blocked_ref),
                             match=match)
        if mode == "flag":
            return batch.append_column(out, hit)
        return batch.filter(pc.invert(hit))

    return ds.map_batches(f, batch_format="pyarrow")


def add_url_normalized(ds: Dataset, *, col: str = "url", out: str = "url_norm") -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        ns = [url_normalize_one(u) if u else "" for u in batch.column(col).to_pylist()]
        return batch.append_column(out, pa.array(ns, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")
