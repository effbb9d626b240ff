"""Per-worker-process instance memoization for task-based stages.

Why tasks, not actor pools, for the crawl's per-wave stages: Ray Data
creates a FRESH actor pool per Dataset execution, and the crawl runs one
Dataset per wave — measured ~1 s of pool spin-up latency (fresh process
fork + imports per actor) per class-UDF stage per wave, paid again every
wave at every CPU count. With 3–4 such stages per wave that fixed cost
dominated small waves and capped the 4→16-CPU scaling efficiency at
~0.48 (BASELINE.md round-4 diagnosis). Plain-function
``map_batches``/``map_groups`` UDFs run as TASKS in Ray's long-lived,
prestarted worker processes that persist across Dataset executions, so
stage setup costs nothing per wave — provided the constructed stage
object itself is reused, which is what this cache does.

The stage classes remain the single source of truth for behavior (and
stay directly usable as actor pools — e.g. for a transport whose state
must NOT be shared across concurrent batches). The wrappers in each
stage module build the instance once per (worker process, config
identity) and delegate.

Keying rule: every entry in the key must pin the full config identity of
the instance. Broadcast ``ObjectRef``s hash by identity and are created
fresh per run (robots) or per wave (budgets, validators), so including
them scopes the cache correctly across the many crawls a single Ray
session may run (the pytest session runs dozens). Actor HANDLES are
deliberately excluded from keys (their hash semantics are not part of
Ray's public contract); each is constant within the run that the keyed
refs already pin.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}
_MAX_ENTRIES = 64  # stale instances are tiny configs; bound, don't LRU


def instance(kind: str, key: tuple, factory: Callable[[], Any]) -> Any:
    full = (kind, key)
    inst = _CACHE.get(full)
    if inst is None:
        if len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.clear()
        inst = factory()
        _CACHE[full] = inst
    return inst
