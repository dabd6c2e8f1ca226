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

import re
from html import unescape
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


# ---------------------------------------------------------------------------
# Fast path.  html.parser's pure-Python state machine costs ~0.5 ms/page on
# Common-Crawl-sized pages — half the whole extraction chain.  The tokenizer
# below reproduces its OBSERVABLE behavior (the emitted parts sequence) on a
# strictly verified input subset and returns None — falling back to the
# stdlib parser — the moment it sees anything whose stdlib handling it has
# not proven it mirrors: declarations / comments / PIs (``<!``, ``<?``), a
# stray ``<`` in text, a ``>`` inside a quoted attribute (detected as an
# unbalanced quote in the regex-matched tag body, which always truncates
# INSIDE the open quote), a tag name extending past ``[-.a-zA-Z0-9:_]``, an
# ambiguous trailing ``/`` (html.parser folds it into an unquoted attribute
# VALUE but self-closes after a name/quote/whitespace), a non-trivial end
# tag, or an unterminated trailing tag.  Byte-identity fast-vs-stdlib is
# pinned by a hypothesis property test over adversarial markup plus a
# whole-corpus hash compare (tests/test_functions.py).
# ---------------------------------------------------------------------------

_SUSPECT_RE = re.compile(r"<[!?]")
_TAG_RE = re.compile(r"<(/?)([a-zA-Z][^<>]*?)(/?)>")
_NAME_RE = re.compile(r"[a-zA-Z][-.a-zA-Z0-9:_]*")
_END_BODY_RE = re.compile(r"[a-zA-Z][-.a-zA-Z0-9:_]*\s*\Z")
_WS_OR_SLASH = " \t\n\r\f/"
_SELFCLOSE_OK = " \t\n\r\f\"'"
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}
_CDATA_TAIL_RE = re.compile(r"([-.a-zA-Z0-9:_]*)\s*(>?)")


def _fast_parts(s: str) -> list[str] | None:
    """html.parser-equivalent (parts, breaks) stream, or None -> stdlib."""
    if _SUSPECT_RE.search(s):
        return None
    parts: list[str] = []
    append = parts.append
    skip = 0
    pos = 0
    for m in _TAG_RE.finditer(s):
        st = m.start()
        if st < pos:                      # inside a consumed CDATA region
            continue
        data = s[pos:st]
        if "<" in data:
            return None
        if data and skip == 0:
            append(unescape(data))
        closing, body, selfclose = m.group(1), m.group(2), m.group(3)
        pos = m.end()
        if closing:
            if selfclose or not _END_BODY_RE.match(body):
                return None
            tag = _NAME_RE.match(body).group(0).lower()
            if tag in _SKIP_TAGS:
                if skip > 0:
                    skip -= 1
            elif tag in _BLOCK_TAGS:
                append(_TextExtractor._BREAK)
            continue
        nm = _NAME_RE.match(body)
        name_end = nm.end()
        if name_end < len(body) and body[name_end] not in _WS_OR_SLASH:
            return None                   # name uses chars we don't model
        tag = nm.group(0).lower()
        attrs = body[name_end:]
        if attrs.count('"') % 2 or attrs.count("'") % 2:
            return None                   # '>' inside a quoted attribute
        if selfclose:
            if attrs and attrs[-1] not in _SELFCLOSE_OK:
                return None               # '/' may belong to a bare value
            # genuine <tag/>: block tags break, skip tags have no subtree
            if tag in _BLOCK_TAGS:
                append(_TextExtractor._BREAK)
            continue
        if tag in _SKIP_TAGS:
            skip += 1
        elif tag in _BLOCK_TAGS:
            append(_TextExtractor._BREAK)
        if tag in ("script", "style"):    # CDATA content mode
            close_re = _CDATA_CLOSE[tag]
            while True:
                cm = close_re.search(s, pos)
                if cm is None:
                    pos = len(s)          # unterminated: rest is dropped
                    break
                tm = _CDATA_TAIL_RE.match(s, cm.end())
                if tm.group(1):           # </scriptx... : still CDATA
                    pos = cm.end()
                    continue
                if not tm.group(2):       # </script junk> : stdlib-only
                    return None
                if skip > 0:              # the real end tag
                    skip -= 1
                pos = tm.end()
                break
    data = s[pos:]
    if "<" in data:
        return None                       # unterminated trailing tag
    if data and skip == 0:
        append(unescape(data))
    return parts


def _finish(parts: list[str]) -> str:
    lines = []
    for seg in "".join(parts).split(_TextExtractor._BREAK):
        seg = " ".join(seg.split())
        if seg:
            lines.append(seg)
    return "\n".join(lines)


def _extract_stdlib(s: str) -> str:
    parser = _TextExtractor()
    try:
        parser.feed(s)
        parser.close()
    except Exception:
        # html.parser is tolerant; any residual parse error ends extraction
        # at the last good state — deterministically.
        pass
    return parser.text()


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
    parts = _fast_parts(s)
    if parts is not None:
        return _finish(parts)
    return _extract_stdlib(s)
