"""A6 support: per-wave admitted-host counts folded INSIDE the frontier
build (VERDICT r1 item #4 — the round-1 driver read the whole next
frontier's host column back to count hosts; at 10^10-URL frontiers that
is a driver OOM).

Each frontier-builder group already sees every admitted row of its part,
so it counts hosts locally (a ≤ #hosts-in-part dict) and pushes the tiny
dict here, keyed by (wave, part). The keying makes retries idempotent: a
re-executed group OVERWRITES its slot instead of double-counting. Groups
``ray.get`` their put before returning, so the wave's ``write_parquet``
barrier guarantees every slot has landed before the driver drains.

The driver folds ≤ #hosts rows per wave — budgets update + hot-host
detection with no frontier re-read anywhere.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class WaveStats:
    def __init__(self):
        self._by_wave: dict[int, dict[int, dict[str, int]]] = {}
        # politeness drift: per-wave, per-batch-key → {host: (lat_sum, n)}
        self._lat: dict[int, dict[str, dict[str, tuple[float, int]]]] = {}
        # Retry-After penalties: per-wave, per-batch-key → {host: ms}
        self._pen: dict[int, dict[str, dict[str, int]]] = {}

    def put(self, wave: int, part: int, counts: dict[str, int]) -> None:
        self._by_wave.setdefault(wave, {})[part] = counts

    def drain(self, wave: int) -> dict[str, int]:
        folded: dict[str, int] = {}
        for counts in self._by_wave.pop(wave, {}).values():
            for h, n in counts.items():
                folded[h] = folded.get(h, 0) + n
        return folded

    def put_latency(self, wave: int, batch_key: str,
                    sums: dict[str, tuple[float, int]]) -> None:
        """Per-host (latency_sum_ms, n_fetches) for one parse batch; the
        deterministic batch_key (fragment digest) makes retries overwrite
        instead of double-counting."""
        self._lat.setdefault(wave, {})[batch_key] = sums

    def drain_latency(self, wave: int) -> dict[str, tuple[float, int]]:
        folded: dict[str, tuple[float, int]] = {}
        for sums in self._lat.pop(wave, {}).values():
            for h, (s, n) in sums.items():
                ps, pn = folded.get(h, (0.0, 0))
                folded[h] = (ps + s, pn + n)
        return folded

    def put_penalty(self, wave: int, batch_key: str,
                    pen: dict[str, int]) -> None:
        """Per-host max Retry-After ms observed in one parse batch
        (429/503 responses, RFC 9110 §10.2.3); same idempotent
        batch-key contract as put_latency."""
        self._pen.setdefault(wave, {})[batch_key] = pen

    def drain_penalty(self, wave: int) -> dict[str, int]:
        folded: dict[str, int] = {}
        for pen in self._pen.pop(wave, {}).values():
            for h, ms in pen.items():
                if ms > folded.get(h, -1):
                    folded[h] = ms
        return folded
