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

from ..sources.transport import make_transport


class Fetcher:
    def __init__(self, transport_spec: dict):
        self._transport = make_transport(transport_spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url_canon"].to_pylist()
        results = self._transport.fetch_many(urls)
        status = pa.array((r[0] for r in results), type=pa.int16())
        ctype = pa.array((r[1] for r in results), type=pa.string())
        body = pa.array((r[2] for r in results), type=pa.large_binary())
        latency = pa.array((float(r[3]) for r in results), type=pa.float32())
        return (
            batch.append_column("status", status)
            .append_column("content_type", ctype)
            .append_column("body", body)
            .append_column("latency_ms", latency)
        )
