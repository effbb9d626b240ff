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
import ray

from ..functions.canon import canonicalize
from ..sources.transport import NO_LASTMOD, make_transport


class Fetcher:
    """Transports follow 3xx chains internally; this stage
    re-canonicalizes the FINAL url (the page's real identity — stored
    under it downstream) and flags redirected rows so the wave commit
    can mark the final urls as seen (never re-fetched under an alias).

    Conditional refetch (refresh crawling): ``validators_ref`` is a
    broadcast dict url_hash → (etag, last_modified_us) recorded by a
    prior run (or an earlier wave); any URL with a recorded validator
    is fetched conditionally through ``fetch_many_cond`` — an unchanged
    page revalidates as a 304 no-op instead of re-downloading the body.
    Only refetch-override re-admissions can carry a validator (a novel
    URL was never fetched before), so no frontier schema change is
    needed. Response validators ride as ``etag`` /
    ``last_modified_us`` output columns so the sink can record the
    next baseline."""

    def __init__(self, transport_spec: dict, validators_ref=None):
        self._transport = make_transport(transport_spec)
        self._validators = (ray.get(validators_ref)
                            if validators_ref is not None else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url_canon"].to_pylist()
        conds = None
        if self._validators and "url_hash" in batch.column_names:
            v = self._validators
            conds = [v.get(h) for h in batch["url_hash"].to_pylist()]
        if hasattr(self._transport, "fetch_many_cond"):
            results = self._transport.fetch_many_cond(urls, conds)
        else:
            results = [(*r, None, NO_LASTMOD)
                       for r in self._transport.fetch_many(urls)]
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
            .append_column("etag", pa.array((r[5] for r in results),
                                            type=pa.string()))
            .append_column("last_modified_us",
                           pa.array((int(r[6]) for r in results),
                                    type=pa.int64()))
        )


def fetch_batch(batch: pa.Table, *, spec_token: str, transport_spec: dict,
                validators_ref=None) -> pa.Table:
    """Task-based form of the fetch stage: runs in Ray's long-lived
    worker processes (no per-wave actor-pool spawn — see
    taskstate.py) with the Fetcher instance memoized per
    (transport config, validators broadcast). ``spec_token`` is the
    run-scoped identity of ``transport_spec`` (dicts don't hash)."""
    from .taskstate import instance

    f = instance("Fetcher", (spec_token, validators_ref),
                 lambda: Fetcher(transport_spec, validators_ref))
    return f(batch)
