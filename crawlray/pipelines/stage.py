"""§2.10 pipeline-step API: the ``Stage`` protocol SURVEY.md promises —
a declarative pipeline step ``(name, fn_or_actor_cls, batch_size,
concurrency, num_cpus, kwargs)`` and a compiler that turns a list of
stages into a chained ``map_batches`` pipeline over one Dataset.

This is how a user of the engine composes custom pipelines without
touching Ray Data directly: stateless callables become task stages,
classes become actor-pool stages (state in ``__init__``, work in
``__call__``), exactly the execution model the crawl engine itself uses.
Batches are zero-copy Arrow unless a stage opts out.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Stage:
    name: str
    fn: Any                                  # callable OR class (actor pool)
    batch_size: int | None = None
    concurrency: int | tuple | None = None   # required for class stages
    num_cpus: float | None = None
    batch_format: str = "pyarrow"
    zero_copy: bool = True
    kwargs: dict = field(default_factory=dict)  # fn_constructor_kwargs

    def is_actor_stage(self) -> bool:
        return inspect.isclass(self.fn)

    def __post_init__(self):
        if self.is_actor_stage() and self.concurrency is None:
            raise ValueError(
                f"stage {self.name!r}: a class (actor-pool) stage needs "
                f"an explicit concurrency"
            )
        if not self.is_actor_stage() and self.kwargs:
            raise ValueError(
                f"stage {self.name!r}: kwargs are constructor arguments — "
                f"only class stages take them"
            )


def compile_stages(ds, stages: list[Stage]):
    """Dataset → Dataset through the stage chain (lazy; the streaming
    executor pipelines all stages with backpressure)."""
    for s in stages:
        opts: dict[str, Any] = {
            "batch_format": s.batch_format,
            "zero_copy_batch": s.zero_copy,
        }
        if s.batch_size is not None:
            opts["batch_size"] = s.batch_size
        if s.concurrency is not None:
            opts["concurrency"] = s.concurrency
        if s.num_cpus is not None:
            opts["num_cpus"] = s.num_cpus
        if s.is_actor_stage() and s.kwargs:
            opts["fn_constructor_kwargs"] = s.kwargs
        ds = ds.map_batches(s.fn, **opts)
    return ds


def run_stages(ds, stages: list[Stage]):
    """Alias kept for config-driven callers (job files name this)."""
    return compile_stages(ds, stages)
