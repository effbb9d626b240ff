"""Robots policy: per-host allow/deny prefix rules + crawl-delay budget.

Semantics follow stdlib ``urllib.robotparser`` longest-match convention
simplified to path prefixes (the fixture generates prefix rules): the
longest matching rule wins; allow beats deny on equal length; no rule →
allowed. The robots table is tiny (one row per host) so it is broadcast
via ``ray.put`` and consulted inside stages — never shuffled (SURVEY J1).
"""

from __future__ import annotations

from urllib.parse import urlsplit


class RobotsPolicy:
    def __init__(self, robots_rows: list[dict], default_delay_ms: int = 1000):
        """robots_rows: [{host, allow, deny, crawl_delay_ms}, ...]."""
        self._by_host: dict[str, tuple[list[str], list[str], int]] = {}
        self.default_delay_ms = default_delay_ms
        for r in robots_rows:
            self._by_host[r["host"]] = (
                list(r.get("allow") or []),
                list(r.get("deny") or []),
                int(r.get("crawl_delay_ms") or default_delay_ms),
            )

    def crawl_delay_ms(self, host: str) -> int:
        e = self._by_host.get(host)
        return e[2] if e else self.default_delay_ms

    def allowed(self, url_canon: str) -> bool:
        parts = urlsplit(url_canon)
        e = self._by_host.get(parts.hostname or "")
        if e is None:
            return True  # no robots → allowed (reference behavior)
        allow, deny, _ = e
        path = parts.path or "/"
        best_len, best_allow = -1, True
        for rule in allow:
            if rule and path.startswith(rule) and len(rule) > best_len:
                best_len, best_allow = len(rule), True
        for rule in deny:
            if rule and path.startswith(rule) and len(rule) > best_len:
                best_len, best_allow = len(rule), False
        return best_allow

    def allowed_many(self, urls: list[str]) -> list[bool]:
        return [self.allowed(u) for u in urls]

    @classmethod
    def from_arrow(cls, robots_table, default_delay_ms: int = 1000) -> "RobotsPolicy":
        """None → empty policy (every URL allowed, default delay)."""
        rows = robots_table.to_pylist() if robots_table is not None else []
        return cls(rows, default_delay_ms=default_delay_ms)
