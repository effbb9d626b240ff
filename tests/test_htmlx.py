"""HTML extractor goldens: interleaved spans, links, title, dates,
charset sniffing (VERDICT r3 missing #1)."""

from datetime import datetime

from crawlray.functions.htmlx import (
    decode_html, parse_date, parse_html, sniff_charset,
)
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


def test_sniff_charset_precedence():
    latin = "<p>Eén geïrriteerde cliënt</p>".encode("iso-8859-1")
    # header param wins over default; WHATWG maps iso-8859-1 → cp1252
    assert sniff_charset(latin, "text/html; charset=ISO-8859-1") == \
        "windows-1252"
    assert sniff_charset(latin, 'text/html; charset="latin-1"') == \
        "windows-1252"
    # meta prescan (both <meta charset> and http-equiv forms)
    meta = b'<html><head><meta charset="windows-1252"></head>' + latin
    assert sniff_charset(meta, "text/html") == "windows-1252"
    equiv = (b'<html><head><meta http-equiv="Content-Type" '
             b'content="text/html; charset=iso-8859-1"></head>' + latin)
    assert sniff_charset(equiv, None) == "windows-1252"
    # header param outranks a conflicting meta
    assert sniff_charset(meta, "text/html; charset=utf-8") == "utf-8"
    # BOM outranks everything
    assert sniff_charset(b"\xef\xbb\xbfx", "text/html; charset=latin-1") == \
        "utf-8-sig"
    assert sniff_charset(b"\xff\xfex\x00", None) == "utf-16-le"
    # unknown labels fall through to the next source / utf-8 default
    assert sniff_charset(latin, "text/html; charset=bogus-enc") == "utf-8"
    assert sniff_charset(b"plain", None) == "utf-8"


def test_decode_html_dutch_diacritics():
    txt = "Eén geïrriteerde cliënt in Curaçao — zo'n café"
    body = f"<p>{txt}</p>".encode("windows-1252")
    assert decode_html(body, "text/html; charset=iso-8859-1") == \
        f"<p>{txt}</p>"
    # meta-only declaration, generic content type
    meta_body = (b'<meta charset="iso-8859-1">'
                 + f"<p>{txt}</p>".encode("windows-1252"))
    assert txt in decode_html(meta_body, "text/html")
    # utf-8 bodies are untouched (default path)
    assert decode_html(f"<p>{txt}</p>".encode(), "text/html") == f"<p>{txt}</p>"
    # the full parse pipeline sees the decoded text
    page = parse_html(body, "text/html; charset=iso-8859-1")
    assert page.spans == [("text", txt, None)]


def test_docs_table_roundtrip():
    pages = [parse_html(HTML), parse_html(b"<p>solo</p>")]
    t = docs_table(["d0", "d1"], [p.spans for p in pages])
    back = spans_from_arrow(t["spans"].combine_chunks())
    assert back[1] == [("text", "solo", None, 0)]
    assert [s[:3] for s in back[0]] == pages[0].spans
    assert [s[3] for s in back[0]] == list(range(len(pages[0].spans)))


def test_meta_robots_directives():
    def pg(head, body="<p>x</p>"):
        return parse_html(
            f"<html><head>{head}</head><body>{body}</body></html>".encode())

    p = pg('<meta name="robots" content="noindex">')
    assert p.noindex and not p.nofollow
    p = pg('<meta name="robots" content="NOFOLLOW">')
    assert p.nofollow and not p.noindex
    p = pg('<meta name="robots" content="noindex, nofollow">')
    assert p.noindex and p.nofollow
    p = pg('<meta name="robots" content="none">')
    assert p.noindex and p.nofollow
    p = pg('<meta name="robots" content="index, follow">')
    assert not p.noindex and not p.nofollow
    # unrelated metas don't trip it
    p = pg('<meta name="viewport" content="noindex">')
    assert not p.noindex and not p.nofollow


def test_rel_canonical_and_anchor_nofollow():
    p = parse_html(
        b'<html><head><link rel="canonical" href="/echt"></head>'
        b'<body><a href="/a">a</a>'
        b'<a rel="nofollow" href="/skip">s</a>'
        b'<a rel="NOFOLLOW external" href="/skip2">s2</a>'
        b'<a href="/b">b</a></body></html>')
    assert p.canonical == "/echt"
    assert [h for h, _ in p.links] == ["/a", "/b"]
    # first canonical wins
    p2 = parse_html(
        b'<link rel="canonical" href="/one">'
        b'<link rel="canonical" href="/two">')
    assert p2.canonical == "/one"
    # nofollow anchor text still renders into open paragraphs
    p3 = parse_html(b'<p>voor <a rel="nofollow" href="/x">link</a> na</p>')
    assert p3.spans == [("text", "voor link na", None)]
    assert p3.links == []
