"""Spec freeze + scrub semantics (SURVEY §2.5, §5.2).

The SHA pin makes silent threshold/regex drift loud: changing spec.py
means regenerating golden fixtures AND bumping the hash here, an
explicit two-file diff a reviewer can see.
"""

from __future__ import annotations

import hashlib
import os

from dataguards_ray import spec

SPEC_SHA256 = "f2d5970747c376e979f5868f33231ea9a492ad4c839d648db07eb18bb48ca9bd"


def test_spec_sha_pinned():
    path = os.path.join(os.path.dirname(spec.__file__), "spec.py")
    with open(path, "rb") as f:
        actual = hashlib.sha256(f.read()).hexdigest()
    assert actual == SPEC_SHA256, (
        "spec.py changed — if intentional, regenerate golden fixtures and "
        f"update SPEC_SHA256 to {actual!r}"
    )


def test_scrub_categories():
    cases = {
        "mail me at bob@example.com now": "mail me at <EMAIL> now",
        "ip 10.1.2.3 end": "ip <IP> end",
        "v6 2001:db8:1:2:3:4 end": "v6 <IP> end",
        "ssn 123-45-6789 end": "ssn <ID> end",
        "iban DE44500105175407324931 end": "iban <ID> end",
        "call +1 (555) 123-4567 ok": "call <PHONE> ok",
        "call 555-123-4567 ok": "call <PHONE> ok",
        "what the hell is this": "what the <TOX> is this",
        "plain text with nothing": "plain text with nothing",
    }
    for src, want in cases.items():
        got, pii, tox = spec.scrub_text(src)
        assert got == want, (src, got)


def test_scrub_luhn_gate():
    # Luhn-valid card is scrubbed; invalid left byte-identical
    ok, pii, _ = spec.scrub_text("card 4539 1488 0343 6467 end")
    assert ok == "card <ID> end" and pii == 1
    bad, pii, _ = spec.scrub_text("card 4000 1234 5678 9010 end")
    assert bad == "card 4000 1234 5678 9010 end" and pii == 0


def test_scrub_idempotent():
    from fixtures.gen import gen_row

    for i in range(200):
        r = gen_row(i)
        t = r["text"]
        if t is None:
            continue
        once, _, _ = spec.scrub_text(t)
        twice, _, _ = spec.scrub_text(once)
        assert twice == once


def test_scrub_fast_path_exactness():
    """Docs without trigger chars/badwords must return unchanged — and the
    full regex must agree that there is no match."""
    from fixtures.gen import gen_row

    checked = 0
    for i in range(300):
        t = gen_row(i)["text"]
        if t is None or spec._SCRUB_TRIGGER_RE.search(t):
            continue
        low = t.lower()
        if any(w in low for w in spec.BADWORDS):
            continue
        assert spec.SCRUB_RE.search(t) is None
        checked += 1
    assert checked > 20


def test_part_id_stable():
    assert spec.fnv1a64(b"") == 0xCBF29CE484222325
    assert spec.part_id_of("https://a.example.com/x", 64) == spec.part_id_of(
        "https://a.example.com/x", 64
    )
