"""Frozen per-document text transforms (HTML→text extraction, normalization).

These are byte-determinism-critical (BASELINE.json:15 "byte-identical
extracted text per url"), so there is exactly ONE implementation, pure
stdlib, shared by the Ray pipeline (per-batch loop) and the scalar oracle
(per-doc).  The algorithm is frozen; tests pin behavior on golden strings.
"""

from __future__ import annotations

import unicodedata
from html.parser import HTMLParser

# Tags whose start/end forces a line boundary in the extracted text.
_BLOCK_TAGS = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table thead tbody td th title "
    "section article header footer blockquote pre main nav aside form hr "
    "figure figcaption dl dt dd address".split()
)
# Subtrees whose text content is dropped entirely.
_SKIP_TAGS = frozenset("script style noscript template iframe svg head".split())


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.parts.append(data)


def extract_text_one(html_bytes: bytes) -> str:
    """HTML bytes → text.  Frozen algorithm:

    1. decode UTF-8 (errors='replace');
    2. parse with html.parser: drop _SKIP_TAGS subtrees and comments, block
       tags emit line boundaries, character/entity refs decoded;
    3. per line: collapse whitespace runs to one space, strip;
    4. drop empty lines; join with '\\n'.
    """
    p = _Extractor()
    p.feed(html_bytes.decode("utf-8", errors="replace"))
    p.close()
    raw = "".join(p.parts)
    lines = []
    for line in raw.split("\n"):
        collapsed = " ".join(line.split())
        if collapsed:
            lines.append(collapsed)
    return "\n".join(lines)


def normalize_text_one(text: str) -> str:
    """Normalize pre-extracted text.  Frozen algorithm:

    NFC; CRLF/CR → LF; strip trailing whitespace per line; collapse runs of
    blank lines to one; strip leading/trailing blank lines.
    """
    t = unicodedata.normalize("NFC", text)
    t = t.replace("\r\n", "\n").replace("\r", "\n")
    out: list[str] = []
    blank_pending = False
    for line in t.split("\n"):
        line = line.rstrip()
        if not line:
            blank_pending = bool(out)
            continue
        if blank_pending:
            out.append("")
            blank_pending = False
        out.append(line)
    return "\n".join(out)
