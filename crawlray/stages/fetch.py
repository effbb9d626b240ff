"""S5: the fetch stage — actor pool over zero-copy Arrow batches.

``map_batches(Fetcher, batch_format="pyarrow", batch_size=B,
concurrency=(a, b))``. The transport (network session or SimTransport
page index) is built ONCE per actor in ``__init__``; ``__call__`` does
only lookups/IO per batch. Bodies enter the stream here — everything
upstream of this stage shuffles only hashes and short strings
(SURVEY §7.4: wide rows never shuffle).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.canon import canonicalize
from ..sources.transport import make_transport


class Fetcher:
    """Transports follow 3xx chains internally; this stage
    re-canonicalizes the FINAL url (the page's real identity — stored
    under it downstream) and flags redirected rows so the wave commit
    can mark the final urls as seen (never re-fetched under an alias)."""

    def __init__(self, transport_spec: dict):
        self._transport = make_transport(transport_spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url_canon"].to_pylist()
        results = self._transport.fetch_many(urls)
        status = pa.array((r[0] for r in results), type=pa.int16())
        ctype = pa.array((r[1] for r in results), type=pa.string())
        body = pa.array((r[2] for r in results), type=pa.large_binary())
        latency = pa.array((float(r[3]) for r in results), type=pa.float32())
        finals = [
            (canonicalize(r[4]) or u) if r[4] != u else u
            for u, r in zip(urls, results)
        ]
        redirected = [f != u for u, f in zip(urls, finals)]
        return (
            batch.append_column("status", status)
            .append_column("content_type", ctype)
            .append_column("body", body)
            .append_column("latency_ms", latency)
            .append_column("final_url", pa.array(finals, type=pa.string()))
            .append_column("redirected", pa.array(redirected, type=pa.bool_()))
        )
