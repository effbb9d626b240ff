"""§2.10 per-site extractor registry — the reference keeps per-news-site
extraction rules; here they are named extractor callables
(``bytes → ParsedPage``) selected per host in the parse stage AND in the
sequential oracle, so custom rules stay inside the parity contract.

Config carries only extractor NAMES (``CrawlConfig.extractors:
{host_pattern: name}``) so the mapping pickles cheaply into parse
actors; the callables live here. A pattern matches a host exactly or as
a dot-suffix (``"nu.nl"`` matches ``www.nu.nl``); the longest matching
pattern wins; no match → the generic parser.
"""

from __future__ import annotations

from collections.abc import Callable

from .htmlx import ParsedPage, parse_html


def lead_only(body: bytes | str) -> ParsedPage:
    """Example per-site rule: keep only the article lead — the first two
    text paragraphs and the first media span (in document order), title
    and links untouched. Stands in for a real site's 'skip boilerplate,
    take the intro' selector set."""
    page = parse_html(body)
    keep: list[int] = []
    n_text = n_media = 0
    for i, s in enumerate(page.spans):
        if s[0] == "text" and n_text < 2:
            keep.append(i)
            n_text += 1
        elif s[0] != "text" and n_media < 1:
            keep.append(i)
            n_media += 1
    page.spans = [page.spans[i] for i in keep]
    return page


def title_as_span(body: bytes | str) -> ParsedPage:
    """Example per-site rule: prepend the page title as a text span (some
    sites carry the headline outside the article body)."""
    page = parse_html(body)
    if page.title:
        page.spans = [("text", page.title, None)] + page.spans
    return page


EXTRACTORS: dict[str, Callable[[bytes | str], ParsedPage]] = {
    "generic": parse_html,
    "lead_only": lead_only,
    "title_as_span": title_as_span,
}


def register(name: str, fn: Callable[[bytes | str], ParsedPage]) -> None:
    EXTRACTORS[name] = fn


def resolve(host: str, extractors_cfg: dict[str, str] | None):
    """Pick the extractor for ``host``: longest matching pattern (exact
    or dot-suffix) wins; default generic. Unknown extractor names fail
    loudly — a typo must not silently fall back."""
    if not extractors_cfg:
        return parse_html
    best = None
    for pattern in extractors_cfg:
        if host == pattern or host.endswith("." + pattern):
            if best is None or len(pattern) > len(best):
                best = pattern
    if best is None:
        return parse_html
    name = extractors_cfg[best]
    if name not in EXTRACTORS:
        raise KeyError(f"unknown extractor {name!r} for host pattern {best!r}")
    return EXTRACTORS[name]
