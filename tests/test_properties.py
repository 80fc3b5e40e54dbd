"""Property / metamorphic tests (SURVEY §5.4) via hypothesis."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dataguards_ray import measures, spec, textproc

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_scrub_idempotent_and_deterministic(t):
    once = spec.scrub_text(t)
    assert spec.scrub_text(t) == once  # deterministic
    again, pii, tox = spec.scrub_text(once[0])
    assert again == once[0]  # idempotent bytes


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_normalize_idempotent(t):
    once = textproc.normalize_text_one(t)
    assert textproc.normalize_text_one(once) == once


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_url_kernels_total_functions(u):
    """url_domain_one / url_host_one are total over arbitrary strings
    (crawl urls are untrusted input): never raise, return lowercased
    strs, and the registered domain is host-derived (suffix of the
    host, or the bare host itself for short/degenerate hosts)."""
    from dataguards_ray.urltools import url_domain_one, url_host_one

    h = url_host_one(u)
    d = url_domain_one(u)
    assert isinstance(h, str) and isinstance(d, str)
    assert h == h.lower() and d == d.lower()
    if h and d:
        assert h == d or h.endswith("." + d) or d == h


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_url_kernels_hostish_fuzz(s):
    """Same totality with the host-parsing path forced: arbitrary bytes
    where a hostname should be (malformed ports, brackets, unicode —
    urlsplit raises ValueError on several of these; the kernels must
    swallow it)."""
    from dataguards_ray.urltools import url_domain_one, url_host_one

    for u in (f"http://{s}/p", f"https://{s}:99999/x", f"//{s}"):
        assert isinstance(url_host_one(u), str)
        assert isinstance(url_domain_one(u), str)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_measures_total_functions(t):
    """Measures are defined for arbitrary unicode and stay in range."""
    m = measures.doc_measures(t)
    for ratio in ("symbol_ratio", "bullet_ratio", "ellipsis_ratio",
                  "alpha_word_ratio", "dup_line_frac", "tox_ratio"):
        assert m[ratio] >= 0.0
    for frac in ("bullet_ratio", "ellipsis_ratio", "alpha_word_ratio",
                 "dup_line_frac"):
        assert m[frac] <= 1.0 + 1e-9
    assert m["word_count"] >= 0 and m["sentence_count"] >= 0


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10**19))
def test_luhn_check_digit_roundtrip(n):
    digits = str(n).zfill(15)[:15]
    total = 0
    for i, c in enumerate(reversed(digits)):
        d = int(c)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    full = digits + str((10 - total % 10) % 10)
    assert spec.luhn_ok(full)
    # flipping any digit breaks the checksum
    flipped = full[:-1] + str((int(full[-1]) + 1) % 10)
    assert not spec.luhn_ok(flipped)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ab cd", min_size=30, max_size=200),
       st.text(alphabet="ab cd", min_size=0, max_size=30))
def test_minhash_estimate_tracks_jaccard(base, suffix):
    """Estimated Jaccard from minhash signatures ≈ exact shingle Jaccard
    (±0.35 at 128 perms — coarse bound, catches broken hashing)."""
    from dataguards_ray.neardup import minhash_signature, ngram_jaccard

    a, b = base, base + suffix
    sa, sb = minhash_signature(a), minhash_signature(b)
    est = float((sa == sb).mean())
    exact = ngram_jaccard(a, b)
    assert abs(est - exact) <= 0.35


def test_langid_empty_and_whitespace():
    import numpy as np

    from dataguards_ray import langid

    W = langid.load_model()
    langs, scores = langid.score_batch(["", "   ", None], W)
    assert langs[0] == langid.UND and scores[0] == np.float32(0.0)
    assert langs[2] == langid.UND


# ---------------------------------------------------------------------------
# Distributed-operator properties (small Ray datasets, few examples —
# each example executes real Dataset pipelines)
# ---------------------------------------------------------------------------

WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=0, max_size=25).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(DOC, min_size=1, max_size=25),
    budget=st.integers(min_value=0, max_value=200),
)
def test_token_budget_sample_matches_oracle(ray_session, docs, budget):
    """sample_by_token_budget ≡ the windowed-cumsum scalar definition
    for arbitrary corpora (duplicated texts, empty docs, any budget)."""
    import hashlib
    import re

    import ray.data

    from dataguards_ray.aggregates import sample_by_token_budget

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    scored = sorted(
        (hashlib.md5(r["text"].encode()).hexdigest(), r["doc_id"],
         len(re.findall(r"\w+", r["text"])))
        for r in rows)
    keep, run = set(), 0
    for h, d, n in scored:
        if run + n > budget:
            break
        run += n
        keep.add(d)

    ds = ray.data.from_items(rows).repartition(3)
    got = {r["doc_id"] for r in sample_by_token_budget(ds, budget).take_all()}
    assert got == keep


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(DOC, min_size=1, max_size=15),
    bench=st.lists(DOC, min_size=1, max_size=4),
    n=st.integers(min_value=2, max_value=5),
)
def test_decontaminate_matches_oracle_property(ray_session, docs, bench, n):
    """decontaminate window counts ≡ exact tuple-n-gram overlap for
    arbitrary corpora and n."""
    import ray.data

    from dataguards_ray import spec
    from dataguards_ray.textstats import decontaminate

    grams = set()
    for t in bench:
        toks = spec.lm_tokens(t)
        grams.update(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))
    expect = {}
    for i, t in enumerate(docs):
        toks = spec.lm_tokens(t)
        expect[i] = sum(1 for j in range(max(0, len(toks) - n + 1))
                        if tuple(toks[j:j + n]) in grams)

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]).repartition(2)
    bds = ray.data.from_items([{"text": t} for t in bench])
    got = {r["doc_id"]: r["n_contaminated"]
           for r in decontaminate(ds, bds, n=n, mode="flag").take_all()}
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    lefts=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 40)),
                   min_size=1, max_size=18),
    rights=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 40)),
                    min_size=0, max_size=18),
)
def test_asof_join_matches_scalar_oracle(ray_session, lefts, rights):
    """Round-5 bucketed multi-key as-of kernel ≡ the scalar backward-
    inclusive definition for arbitrary key/ts multisets (ts ties on the
    left, keys with no right rows, empty right side)."""
    import pyarrow as pa
    import ray.data

    from dataguards_ray.joins import asof_join

    rset = sorted(set(rights))  # unique right (key, ts) per contract
    rrows = [{"rid": 100 + i, "k": f"u{k}", "ts": t}
             for i, (k, t) in enumerate(rset)]
    lrows = [{"lid": i, "k": f"u{k}", "ts": t}
             for i, (k, t) in enumerate(lefts)]

    def oracle(k, t):
        best = None
        for r in rrows:
            if r["k"] == k and r["ts"] <= t and (
                    best is None or r["ts"] > best["ts"]):
                best = r
        return best["rid"] if best else None

    expected = sorted((r["lid"], oracle(r["k"], r["ts"])) for r in lrows)
    lds = ray.data.from_items(lrows).repartition(2)
    rds = ray.data.from_arrow(pa.Table.from_pylist(
        rrows, schema=pa.schema([("rid", pa.int64()), ("k", pa.string()),
                                 ("ts", pa.int64())])))
    out = asof_join(lds, rds, key="k", ts_col="ts", num_buckets=3)
    got = sorted((r["lid"], r["rid"]) for r in out.take_all())
    assert got == expected


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_gif_avi_decoders_fail_cleanly_on_fuzz(payload):
    """Untrusted crawl bytes wearing GIF/AVI magics must raise a clean
    error (ValueError/NotImplementedError via decode_image's
    normalization), never hang or leak an exotic exception."""
    from dataguards_ray.codecs import decode_image, iter_avi_mjpeg_frames

    for blob in (b"GIF89a" + payload, b"GIF87a" + payload):
        try:
            decode_image(blob)
        except (ValueError, NotImplementedError):
            pass
    avi = b"RIFF" + len(payload).to_bytes(4, "little") + b"AVI " + payload
    try:
        list(iter_avi_mjpeg_frames(avi))
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=500, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_urltools_scalar_total_on_garbage(u):
    """Untrusted web urls must never crash the gate: every scalar url
    kernel is total over arbitrary text (returns '' / best-effort)."""
    from dataguards_ray.urltools import (url_domain_one, url_host_one,
                                         url_normalize_one)

    for fn in (url_domain_one, url_host_one, url_normalize_one):
        assert isinstance(fn(u), str)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=20))
def test_urltools_vector_total_on_garbage(urls):
    import pyarrow as pa

    from dataguards_ray.urltools import (blocklist_hits, domains_array,
                                         hosts_array)

    arr = pa.array(urls, type=pa.string())
    assert len(domains_array(arr)) == len(urls)
    assert len(hosts_array(arr)) == len(urls)
    assert len(blocklist_hits(arr, pa.array(["example.com"]))) == len(urls)
