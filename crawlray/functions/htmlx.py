"""Stdlib HTML parsing → interleaved text+media spans, links, metadata.

SURVEY.md §2.2 M5–M11. The environment has no lxml/bs4 (SURVEY §0.4), so
extraction is an ``html.parser.HTMLParser`` subclass. The output shape is
the parity payload: an ordered sequence of ``(kind, text, media_ref)``
spans interleaving paragraph text with media references in original
document order (BASELINE.json input_hint), plus ``<a href>`` links in
document order (the crawl-discovery channel) and a publish date.

Pure and deterministic: both the distributed parse stage
(stages/parse.py) and the sequential oracle call this module, so parsing
can never diverge between engine and oracle — the parity tests exercise
crawl *scheduling* semantics, which is what differs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime
from html.parser import HTMLParser

_WS = re.compile(r"\s+")

_MEDIA_TAGS = {"img": "image", "video": "video", "audio": "audio"}


def norm_text(s: str) -> str:
    """M9: collapse whitespace runs, strip ends. (Entity unescape is done
    by HTMLParser via convert_charrefs.)"""
    return _WS.sub(" ", s).strip()


@dataclass
class ParsedPage:
    title: str | None = None
    # ordered interleaved spans: (kind, text, media_ref)
    spans: list[tuple[str, str | None, str | None]] = field(default_factory=list)
    # ordered links: (href, anchor_text)
    links: list[tuple[str, str]] = field(default_factory=list)
    published: datetime | None = None


def parse_date(s: str) -> datetime | None:
    """M11: ISO-8601-ish publish dates (``<time datetime=…>`` / meta)."""
    s = s.strip()
    if not s:
        return None
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        try:
            dt = datetime.strptime(s[:10], "%Y-%m-%d")
        except ValueError:
            return None
    if dt.tzinfo is not None:
        dt = dt.replace(tzinfo=None)  # Arrow/DuckDB timestamps are tz-naive
    return dt


class _Extractor(HTMLParser):
    """Single-pass extractor emitting spans/links in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.page = ParsedPage()
        self._in_title = False
        self._p_depth = 0
        self._p_buf: list[str] = []
        self._title_buf: list[str] = []
        self._a_href: str | None = None
        self._a_buf: list[str] = []
        self._skip_depth = 0  # inside <script>/<style>

    # -- helpers ---------------------------------------------------------
    def _flush_paragraph(self) -> None:
        txt = norm_text("".join(self._p_buf))
        self._p_buf.clear()
        if txt:
            self.page.spans.append(("text", txt, None))

    # -- HTMLParser hooks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        if tag in ("script", "style"):
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
        elif tag == "p":
            if self._p_depth:
                self._flush_paragraph()
            self._p_depth += 1
        elif tag in _MEDIA_TAGS:
            src = (a.get("src") or "").strip()
            if src:
                if self._p_depth:
                    # media inside an open paragraph: flush text collected so
                    # far, emit the media span, keep collecting — faithful
                    # interleaving in document order.
                    self._flush_paragraph()
                alt = norm_text(a.get("alt") or "") or None
                self.page.spans.append((_MEDIA_TAGS[tag], alt, src))
        elif tag == "a":
            href = (a.get("href") or "").strip()
            self._a_href = href or None
            self._a_buf = []
        elif tag == "time":
            dt = a.get("datetime")
            if dt and self.page.published is None:
                self.page.published = parse_date(dt)
        elif tag == "meta":
            prop = (a.get("property") or a.get("name") or "").lower()
            if prop in ("article:published_time", "date", "pubdate") and a.get("content"):
                if self.page.published is None:
                    self.page.published = parse_date(a["content"])

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style"):
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
            if self.page.title is None:
                t = norm_text("".join(self._title_buf))
                self.page.title = t or None
        elif tag == "p" and self._p_depth:
            self._flush_paragraph()
            self._p_depth -= 1
        elif tag == "a":
            if self._a_href:
                self.page.links.append((self._a_href, norm_text("".join(self._a_buf))))
            self._a_href = None
            self._a_buf = []

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self._title_buf.append(data)
        if self._p_depth:
            self._p_buf.append(data)
        if self._a_href is not None:
            self._a_buf.append(data)


def parse_html(body: bytes | str) -> ParsedPage:
    """M5: HTML → ParsedPage. Never raises on malformed input (stdlib
    parser is forgiving); undecodable bytes are replaced."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    ex = _Extractor()
    try:
        ex.feed(body)
        ex.close()
    except Exception:
        pass  # salvage whatever was extracted before the error
    if ex._p_depth:  # unclosed trailing paragraph
        ex._flush_paragraph()
    return ex.page
