"""S3/S4: sitemap and RSS/Atom readers — the reference's non-link URL
discovery channels (SURVEY §2.1; reference capability: sitemap.xml /
feed parsing `[recon]`), stdlib-only (xml.etree), exposed both as pure
parsers and as a Ray Data ``flat_map``-style batch stage.

Discovery channels union into one frontier candidate stream with a
``via`` provenance column (SURVEY D1): links ∪ sitemap ∪ feed.
Malformed XML yields zero URLs (a crawler treats a broken sitemap as
absent, it does not fail the wave).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import pyarrow as pa

_SM_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
_ATOM_NS = "{http://www.w3.org/2005/Atom}"


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_dt(s: str | None):
    """lastmod/pubDate → timestamp[us]-compatible datetime (UTC, naive).
    Accepts W3C datetime (sitemaps/Atom) and RFC 822 (RSS)."""
    if not s:
        return None
    s = s.strip()
    for fn in (
        lambda x: datetime.fromisoformat(x.replace("Z", "+00:00")),
        lambda x: datetime.strptime(x, "%a, %d %b %Y %H:%M:%S %z"),
        lambda x: datetime.strptime(x, "%a, %d %b %Y %H:%M:%S GMT").replace(
            tzinfo=timezone.utc
        ),
        lambda x: datetime.strptime(x, "%Y-%m-%d"),
    ):
        try:
            dt = fn(s)
            if dt.tzinfo is not None:
                dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
            return dt
        except ValueError:
            continue
    return None


def parse_sitemap(xml_bytes: bytes) -> tuple[list[tuple[str, object]], list[str]]:
    """One sitemap document → (page_urls, child_sitemap_urls).

    ``page_urls`` is [(url, lastmod|None)] from a <urlset>; a
    <sitemapindex> instead yields child sitemap URLs (the caller
    recurses — in the engine that is simply another fetch wave over the
    ``child`` list, so index depth costs no special machinery)."""
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return [], []
    kind = _strip(root.tag)
    pages: list[tuple[str, object]] = []
    children: list[str] = []
    for el in root:
        if _strip(el.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod = None, None
        for sub in el:
            t = _strip(sub.tag)
            if t == "loc":
                loc = (sub.text or "").strip()
            elif t == "lastmod":
                lastmod = _parse_dt(sub.text)
        if not loc:
            continue
        if kind == "sitemapindex":
            children.append(loc)
        else:
            pages.append((loc, lastmod))
    return pages, children


def parse_feed(xml_bytes: bytes) -> list[tuple[str, str | None, object]]:
    """RSS 2.0 or Atom document → [(url, title, published)]."""
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return []
    out: list[tuple[str, str | None, object]] = []
    kind = _strip(root.tag)
    if kind == "rss":
        for item in root.iter("item"):
            url = (item.findtext("link") or "").strip()
            if not url:
                continue
            out.append(
                (url, item.findtext("title"), _parse_dt(item.findtext("pubDate")))
            )
    elif kind == "feed":  # Atom
        for entry in root.iter(f"{_ATOM_NS}entry"):
            url = None
            for link in entry.iter(f"{_ATOM_NS}link"):
                if link.get("rel") in (None, "alternate"):
                    url = link.get("href")
                    break
            if not url:
                continue
            out.append(
                (
                    url,
                    entry.findtext(f"{_ATOM_NS}title"),
                    _parse_dt(
                        entry.findtext(f"{_ATOM_NS}published")
                        or entry.findtext(f"{_ATOM_NS}updated")
                    ),
                )
            )
    return out


def discover_batch(batch: pa.Table) -> pa.Table:
    """Ray stage (map_batches over zero-copy Arrow): fetched discovery
    documents (url_canon, content_type, body) → exploded candidate URLs
    with provenance. Sitemap-index children come back with
    via='sitemap_index' so the driver loop can fetch-and-recurse."""
    urls, vias, titles, lastmods, srcs = [], [], [], [], []
    for src, ctype, body in zip(
        batch["url_canon"].to_pylist(),
        batch["content_type"].to_pylist(),
        batch["body"].to_pylist(),
    ):
        low = src.lower()
        if "sitemap" in low or "xml" in (ctype or ""):
            pages, children = parse_sitemap(body or b"")
            if pages or children:
                for u, lm in pages:
                    urls.append(u); vias.append("sitemap")
                    titles.append(None); lastmods.append(lm); srcs.append(src)
                for u in children:
                    urls.append(u); vias.append("sitemap_index")
                    titles.append(None); lastmods.append(None); srcs.append(src)
                continue
        for u, title, pub in parse_feed(body or b""):
            urls.append(u); vias.append("feed")
            titles.append(title); lastmods.append(pub); srcs.append(src)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "via": pa.array(vias, type=pa.string()),
            "title": pa.array(titles, type=pa.string()),
            "lastmod": pa.array(lastmods, type=pa.timestamp("us")),
            "src": pa.array(srcs, type=pa.string()),
        }
    )
