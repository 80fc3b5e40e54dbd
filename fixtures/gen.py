"""Deterministic synthetic `pages` corpus generator (FIXTURES.md F1).

Schema = BASELINE.json:15 input_hint:
  (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Every §2.9 rule and every scrub category gets positive AND negative
coverage; content is seeded PER ROW INDEX (rng = f(seed, i)) so the corpus
is identical regardless of generation order, chunking or parallelism.

Usage:
  python fixtures/gen.py OUT.parquet N [SEED]
API:
  pages_table(n, seed) -> pyarrow.Table        (for tests)
  pages_parquet(path, n, seed)                 (cached corpus for bench)
"""

from __future__ import annotations

import html as _html
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dataguards_ray import langdata, spec  # noqa: E402

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

_CATEGORIES: tuple[tuple[str, float], ...] = (
    ("clean", 0.55),
    ("too_short", 0.03),
    ("too_long", 0.002),
    ("symbol_spam", 0.03),
    ("bullet_wall", 0.03),
    ("ellipsis_lines", 0.03),
    ("non_alpha", 0.03),
    ("no_stopwords", 0.018),
    ("few_sentences", 0.03),
    ("bad_marker", 0.03),
    ("dup_lines", 0.03),
    ("rep_2gram", 0.02),
    ("mixed_lang", 0.03),
    ("gibberish", 0.03),
    ("toxic", 0.03),
    ("pii", 0.04),
    ("pii_flood", 0.02),
    ("dup_cluster", 0.03),
    ("url_dup", 0.02),
)
_CUM = []
_acc = 0.0
for _name, _w in _CATEGORIES:
    _acc += _w
    _CUM.append((_acc, _name))
_TOTAL_W = _acc

DUP_POOL = 30  # exact-duplicate text pool size
URL_POOL = 25  # duplicate-url pool size


def _category(rng: random.Random) -> str:
    x = rng.random() * _TOTAL_W
    for acc, name in _CUM:
        if x <= acc:
            return name
    return "clean"


def _lang(rng: random.Random) -> str:
    return spec.LANGS[int(rng.random() ** 1.4 * len(spec.LANGS))]


def _luhn_card(rng: random.Random) -> str:
    digits = [rng.randrange(10) for _ in range(15)]
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 0:  # these will be doubled once the check digit is appended
            d *= 2
            if d > 9:
                d -= 9
        total += d
    digits.append((10 - total % 10) % 10)
    s = "".join(map(str, digits))
    return f"{s[:4]} {s[4:8]} {s[8:12]} {s[12:]}"


def _pii_snippet(rng: random.Random) -> str:
    kind = rng.randrange(8)
    if kind == 0:
        return f"user{rng.randrange(999)}@example{rng.randrange(99)}.com"
    if kind == 1:
        return f"+{rng.randrange(1, 99)} ({rng.randrange(100, 999)}) {rng.randrange(100, 999)}-{rng.randrange(1000, 9999)}"
    if kind == 2:
        return f"{rng.randrange(555, 999)}-{rng.randrange(100, 999)}-{rng.randrange(1000, 9999)}"
    if kind == 3:
        return f"10.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}"
    if kind == 4:
        return ":".join(f"{rng.randrange(16**4):x}" for _ in range(6))
    if kind == 5:
        return _luhn_card(rng)
    if kind == 6:
        return f"{rng.randrange(100, 999)}-{rng.randrange(10, 99)}-{rng.randrange(1000, 9999)}"
    return "DE" + str(rng.randrange(10, 99)) + "".join(str(rng.randrange(10)) for _ in range(18))


def _content(rng: random.Random, cat: str, lang: str, seed: int) -> str:
    if cat == "clean":
        return langdata.clean_doc(rng, lang)
    if cat == "too_short":
        return langdata.sentence(rng, lang) + " " + langdata.sentence(rng, lang)[:40]
    if cat == "too_long":
        ws = langdata.vocab(lang)
        n = spec.MAX_WORDS + rng.randint(10, 500)
        toks = [ws[rng.randrange(len(ws))] for _ in range(200)]
        body = " ".join(toks[i % 200] for i in range(n))
        return body + "."
    if cat == "symbol_spam":
        doc = langdata.clean_doc(rng, lang, 4, 10)
        words = doc.split(" ")
        k = max(3, int(len(words) * 0.2))
        for _ in range(k):
            words.insert(rng.randrange(len(words)), "#" * rng.randint(1, 3))
        return " ".join(words)
    if cat == "bullet_wall":
        return "\n".join(
            "- " + langdata.sentence(rng, lang) for _ in range(rng.randint(12, 30))
        )
    if cat == "ellipsis_lines":
        lines = [langdata.sentence(rng, lang) for _ in range(rng.randint(8, 16))]
        k = int(len(lines) * rng.uniform(0.4, 0.8))
        for i in range(k):
            lines[i] = lines[i].rstrip(".") + "..."
        return "\n".join(lines)
    if cat == "non_alpha":
        toks = [str(rng.randrange(10**6)) for _ in range(rng.randint(80, 150))]
        some = [langdata.sentence(rng, lang)]
        return " ".join(toks[: len(toks) // 2]) + " " + some[0] + " " + " ".join(toks[len(toks) // 2 :]) + "."
    if cat == "no_stopwords":
        ws = langdata._CONTENT_WORDS[lang]
        stop = spec.STOPWORDS[lang]
        pool = [w for w in ws if w.lower() not in stop]
        sents = []
        for _ in range(8):
            sents.append(" ".join(rng.choice(pool) for _ in range(10)).capitalize() + ".")
        return " ".join(sents)
    if cat == "few_sentences":
        ws = langdata.vocab(lang)
        return " ".join(ws[rng.randrange(len(ws))] for _ in range(rng.randint(60, 120)))
    if cat == "bad_marker":
        doc = langdata.clean_doc(rng, lang, 4, 12)
        marker = rng.choice(
            ["Lorem ipsum dolor sit amet.", "function() { return 0; }",
             "Please note javascript must be enabled to view this page."]
        )
        lines = doc.split("\n")
        lines.insert(rng.randrange(len(lines) + 1), marker)
        return "\n".join(lines)
    if cat == "dup_lines":
        line = langdata.sentence(rng, lang)
        uniq = [langdata.sentence(rng, lang) for _ in range(4)]
        lines = [line] * rng.randint(8, 15) + uniq
        rng.shuffle(lines)
        return "\n".join(lines)
    if cat == "rep_2gram":
        ws = langdata.vocab(lang)
        a, b = rng.sample(ws, 2)
        filler = langdata.sentence(rng, lang)
        return (f"{a} {b} " * rng.randint(40, 80)) + filler
    if cat == "mixed_lang":
        other = rng.choice([l for l in spec.LANGS if l != lang])
        sents = []
        for j in range(rng.randint(10, 16)):
            sents.append(langdata.sentence(rng, lang if j % 2 == 0 else other))
        return " ".join(sents)
    if cat == "gibberish":
        return langdata.gibberish_doc(rng, rng.randint(80, 160))
    if cat == "toxic":
        doc = langdata.clean_doc(rng, lang, 5, 12)
        words = doc.split(" ")
        k = max(3, int(len(words) * 0.05))
        for _ in range(k):
            words.insert(rng.randrange(len(words)), rng.choice(spec.BADWORDS))
        return " ".join(words)
    if cat == "pii":
        doc = langdata.clean_doc(rng, lang, 5, 14)
        words = doc.split(" ")
        for _ in range(rng.randint(1, 4)):
            words.insert(rng.randrange(len(words)), _pii_snippet(rng))
        if rng.random() < 0.3:  # negative coverage: Luhn-INVALID card stays as-is
            words.insert(rng.randrange(len(words)), "4000 1234 5678 9010")
        return " ".join(words)
    if cat == "pii_flood":
        lines = [
            f"{langdata.vocab(lang)[rng.randrange(30)]} {_pii_snippet(rng)}"
            for _ in range(rng.randint(30, 60))
        ]
        return "\n".join(lines) + "\nContact list."
    if cat == "dup_cluster":
        k = rng.randrange(DUP_POOL)
        pool_rng = random.Random(spec.fnv1a64(f"dup-pool:{seed}:{k}".encode()))
        return langdata.clean_doc(pool_rng, spec.LANGS[k % len(spec.LANGS)])
    if cat == "url_dup":
        return langdata.clean_doc(rng, lang)
    raise AssertionError(cat)


_HTML_TEMPLATE = (
    "<html><head><title>{title}</title>"
    "<style>body {{ margin: 0; }}</style>"
    "<script>var x = 1; // tracking</script></head>"
    "<body><!-- boilerplate -->"
    "<noscript>javascript must be enabled</noscript>"
    "<div id=\"main\">{body}</div>"
    "<footer>&copy; 2024 &amp; co</footer></body></html>"
)


def wrap_html(text: str, title: str) -> bytes:
    body = "".join(f"<p>{_html.escape(line)}</p>" for line in text.split("\n"))
    return _HTML_TEMPLATE.format(title=_html.escape(title), body=body).encode("utf-8")


def gen_row(i: int, seed: int = 42) -> dict:
    rng = random.Random(spec.fnv1a64(f"pages:{seed}:{i}".encode()))
    cat = _category(rng)
    lang = _lang(rng)
    text = _content(rng, cat, lang, seed)

    if cat == "url_dup":
        k = rng.randrange(URL_POOL)
        url = f"https://dup{k}.example.org/landing"
    else:
        dom = int(200 * rng.random() ** 3)  # Zipf-skewed domains (salted-groupby coverage)
        url = f"https://site{dom}.example.com/p/{i}"
    ts = EPOCH_US + (i * 1_000_003 + rng.randrange(10**9)) % (2 * 365 * 86_400 * 10**6)

    hint = lang if rng.random() >= 0.05 else rng.choice([l for l in spec.LANGS if l != lang])
    as_html = rng.random() < 0.30 and cat != "too_long"
    if as_html:
        return {"url": url, "warc_ts": ts, "html": wrap_html(text, f"Page {i}"),
                "text": None, "lang": hint}
    return {"url": url, "warc_ts": ts, "html": None, "text": text, "lang": hint}


PAGES_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_table_for_ids(ids, seed: int = 42) -> pa.Table:
    """Rows for arbitrary doc indices (shared by fixtures AND bench's
    sharded corpus generator — one place owns the rows→Arrow assembly)."""
    rows = [gen_row(int(i), seed) for i in ids]
    cols = {name: [r[name] for r in rows] for name in PAGES_ARROW_SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=PAGES_ARROW_SCHEMA)


def pages_table(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    return pages_table_for_ids(range(start, start + n), seed)


def pages_parquet(path: str, n: int, seed: int = 42, row_group_size: int = 4096) -> str:
    """Write the corpus (chunked so memory stays bounded); returns path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    writer = pq.ParquetWriter(path, PAGES_ARROW_SCHEMA)
    chunk = 8192
    for start in range(0, n, chunk):
        writer.write_table(pages_table(min(chunk, n - start), seed, start),
                           row_group_size=row_group_size)
    writer.close()
    return path


if __name__ == "__main__":
    out = sys.argv[1]
    n = int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    pages_parquet(out, n, seed)
    print(f"wrote {n} rows to {out}")
