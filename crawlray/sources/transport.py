"""Fetch transports (SURVEY §5.2): pluggable behind the fetch stage.

``SimTransport`` serves fetches from a mini-web pages table — the
default in this sealed sandbox (no network) and the thing that makes the
benchmark measure the engine instead of socket latency. ``HttpTransport``
is the real-web path (requests.Session reuse per actor); it exists for
API completeness and is guarded — untestable here.

A transport maps canonical URLs → (status, content_type, body,
latency_ms). Missing URLs are 404 with empty body.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq


class SimTransport:
    """Deterministic in-memory web. Loaded ONCE per fetch actor from the
    pages parquet (actor-pool ``__init__``), then O(1) dict lookups per
    URL. At bench scale the pages table is a few hundred MB per actor —
    the price of simulating a web without a network."""

    def __init__(self, pages_path: str):
        t = pq.read_table(pages_path)
        urls = t["url"].to_pylist()
        self._index = dict(
            zip(
                urls,
                zip(
                    t["status"].to_pylist(),
                    t["content_type"].to_pylist(),
                    t["html"].to_pylist(),
                    t["latency_ms"].to_pylist(),
                ),
            )
        )

    def fetch_many(self, urls: list[str]):
        """[(status, content_type, body, latency_ms)] aligned with urls."""
        idx = self._index
        miss = (404, "text/html", b"", 5.0)
        return [idx.get(u, miss) for u in urls]


class SynthTransport:
    """Implicit deterministic web (miniweb.synth_page): pages are
    regenerated from the URL on demand — O(1) actor memory, so the
    simulated web can be arbitrarily larger than RAM. This is the
    10^10-frontier-scale benchmark transport; SimTransport (materialized
    table) remains the oracle-parity fixture."""

    def __init__(self, spec: dict):
        from .miniweb import synth_page

        self._spec = dict(spec)
        self._page = synth_page

    def fetch_many(self, urls: list[str]):
        spec = self._spec
        page = self._page
        return [page(spec, u) for u in urls]


class HttpTransport:
    """Real-web transport: one ``requests.Session`` per actor (connection
    reuse), UA + timeout config. NOT exercised in this sandbox (no
    egress); the politeness schedule upstream already spaces requests."""

    def __init__(self, user_agent: str = "crawlray/0.1", timeout_s: float = 10.0):
        import requests  # present in env; unusable without network

        self._sess = requests.Session()
        self._sess.headers["User-Agent"] = user_agent
        self._timeout = timeout_s

    def fetch_many(self, urls: list[str]):
        out = []
        for u in urls:
            try:
                r = self._sess.get(u, timeout=self._timeout)
                out.append(
                    (
                        r.status_code,
                        r.headers.get("Content-Type", ""),
                        r.content,
                        r.elapsed.total_seconds() * 1000.0,
                    )
                )
            except Exception:
                out.append((599, "", b"", 0.0))
        return out


def make_transport(spec: dict):
    """Build a transport from a config dict (picklable into actors)."""
    kind = spec.get("kind", "sim")
    if kind == "sim":
        return SimTransport(spec["pages_path"])
    if kind == "synth":
        return SynthTransport(spec)
    if kind == "http":
        return HttpTransport(
            user_agent=spec.get("user_agent", "crawlray/0.1"),
            timeout_s=spec.get("timeout_s", 10.0),
        )
    raise ValueError(f"unknown transport kind: {kind}")
