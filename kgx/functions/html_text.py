"""Deterministic, pure-Python HTML -> text extraction (trafilatura-style
boilerplate removal on stdlib ``html.parser`` only).

The reference has no HTML path at all (it reads raw ``.txt``,
/root/reference/graphrag_lite_x.py:130-148); the web-page input shape comes
from BASELINE.json ``input_hint``.  This module is therefore BOTH the
sequential oracle and the function applied inside the Ray pipeline — the
"byte-identical extracted text per url" invariant is tested as identity of
this function applied in the two harnesses, plus run-to-run stability.

Rules (fixed, versioned by EXTRACTOR_VERSION — bump on any behavior change,
it participates in checkpoint config hashes):

- bytes are decoded as UTF-8 with ``errors="replace"``; a leading BOM is
  stripped; ``None``/empty html yields ``""``.
- content inside script/style/noscript/template/head/nav/header/footer/
  aside/svg/iframe/button/form/select/option is dropped (boilerplate).
- block-level tags emit a line break; inline tags emit nothing; character
  and entity references are unescaped (``convert_charrefs=True``).
- whitespace is normalized per line (runs collapse to one space, lines
  stripped, empty lines dropped) and lines joined with ``"\\n"``.
- malformed markup is handled by html.parser's tolerant state machine; an
  unclosed skip-tag deterministically drops the remainder of the document.
"""

from __future__ import annotations

from html.parser import HTMLParser

EXTRACTOR_VERSION = "kgx-html-2"

# Subtrees that are never content.
_SKIP_TAGS = frozenset({
    "script", "style", "noscript", "template", "head", "nav", "header",
    "footer", "aside", "svg", "iframe", "button", "form", "select", "option",
})

# Tags that delimit visual blocks -> line breaks.
_BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "body", "html",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "ul", "ol", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
    "blockquote", "pre", "figure", "figcaption", "address", "hr", "br",
})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []

    _BREAK = "\x00"  # block-boundary sentinel; source newlines are spaces

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._parts.append(self._BREAK)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self._parts.append(self._BREAK)

    def handle_startendtag(self, tag, attrs):
        # self-closing (<br/>, <hr/>): a void skip tag has no subtree to skip
        if tag in _BLOCK_TAGS:
            self._parts.append(self._BREAK)

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self._parts.append(data)

    def text(self) -> str:
        lines = []
        for seg in "".join(self._parts).split(self._BREAK):
            seg = " ".join(seg.split())
            if seg:
                lines.append(seg)
        return "\n".join(lines)


def extract_text(html: bytes | bytearray | memoryview | None) -> str:
    """Extract visible text from raw page bytes. Pure and deterministic."""
    if html is None:
        return ""
    raw = bytes(html)
    if not raw:
        return ""
    s = raw.decode("utf-8", errors="replace")
    if s.startswith("﻿"):
        s = s[1:]
    parser = _TextExtractor()
    try:
        parser.feed(s)
        parser.close()
    except Exception:
        # html.parser is tolerant; any residual parse error ends extraction
        # at the last good state — deterministically.
        pass
    return parser.text()
