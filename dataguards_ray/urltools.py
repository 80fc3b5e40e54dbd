"""URL normalization / domain extraction (SURVEY §2.3 M7; RefinedWeb-style
url handling).  Frozen pure functions — no network, fixed suffix snapshot.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pyarrow as pa
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
    host = p.hostname or ""
    port = f":{p.port}" if p.port and str(p.port) != _DEFAULT_PORTS.get(scheme) else ""
    path = p.path or "/"
    q = f"?{p.query}" if p.query else ""
    return f"{scheme}://{host}{port}{path}{q}"


def url_domain_one(url: str) -> str:
    """Registered domain: last 2 labels, or 3 when the 2-label tail is a
    known public suffix (frozen snapshot)."""
    try:
        host = urlsplit(url).hostname or ""
    except ValueError:
        return ""
    labels = host.lower().split(".")
    if len(labels) < 2:
        return host.lower()
    tail2 = ".".join(labels[-2:])
    if tail2 in _TWO_LABEL_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return tail2


def add_url_domain(ds: Dataset, *, col: str = "url", out: str = "domain") -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        doms = [url_domain_one(u) if u else "" for u in batch.column(col).to_pylist()]
        return batch.append_column(out, pa.array(doms, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def add_url_normalized(ds: Dataset, *, col: str = "url", out: str = "url_norm") -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        ns = [url_normalize_one(u) if u else "" for u in batch.column(col).to_pylist()]
        return batch.append_column(out, pa.array(ns, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")
