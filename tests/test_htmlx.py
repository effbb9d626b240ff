"""HTML extractor goldens: interleaved spans, links, title, dates."""

from datetime import datetime

from crawlray.functions.htmlx import parse_date, parse_html
from crawlray.functions.spans import docs_table, spans_from_arrow

HTML = b"""
<html><head><title> De  Titel </title>
<meta property="article:published_time" content="2024-03-05T10:30:00Z">
<style>p { color: red }</style>
</head><body>
<p>Eerste alinea met <a href="/artikel/2">een link</a> erin.</p>
<img src="/media/a.jpg" alt="Foto A">
<p>Tweede   alinea.</p>
<p>Begin <img src="/media/b.jpg"> einde.</p>
<video src="/media/v.mp4"></video>
<p></p>
<script>var x = "<p>niet dit</p>";</script>
<a href="https://news-2.nl/x">extern</a>
<time datetime="2024-01-01T00:00:00">oud</time>
</body></html>
"""


def test_spans_interleaved():
    page = parse_html(HTML)
    assert page.title == "De Titel"
    assert page.spans == [
        ("text", "Eerste alinea met een link erin.", None),
        ("image", "Foto A", "/media/a.jpg"),
        ("text", "Tweede alinea.", None),
        ("text", "Begin", None),
        ("image", None, "/media/b.jpg"),
        ("text", "einde.", None),
        ("video", None, "/media/v.mp4"),
    ]


def test_links_in_order():
    page = parse_html(HTML)
    assert page.links == [
        ("/artikel/2", "een link"),
        ("https://news-2.nl/x", "extern"),
    ]


def test_published_first_wins():
    page = parse_html(HTML)
    assert page.published == datetime(2024, 3, 5, 10, 30)


def test_parse_date():
    assert parse_date("2024-03-05T10:30:00+02:00") == datetime(2024, 3, 5, 10, 30)
    assert parse_date("2024-03-05") == datetime(2024, 3, 5)
    assert parse_date("niet een datum") is None


def test_malformed_html_no_raise():
    page = parse_html(b"<p>open paragraaf <img src=x.jpg <<<>")
    assert any(k == "text" for k, _, _ in page.spans)


def test_docs_table_roundtrip():
    pages = [parse_html(HTML), parse_html(b"<p>solo</p>")]
    t = docs_table(["d0", "d1"], [p.spans for p in pages])
    back = spans_from_arrow(t["spans"].combine_chunks())
    assert back[1] == [("text", "solo", None, 0)]
    assert [s[:3] for s in back[0]] == pages[0].spans
    assert [s[3] for s in back[0]] == list(range(len(pages[0].spans)))
