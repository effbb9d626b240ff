"""§2.10 Stage protocol: declarative stages compile to a chained
map_batches pipeline — stateless callables as task stages, classes as
actor pools (constructor kwargs, per-stage batch size / concurrency /
cpus), validated eagerly.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from crawlray.pipelines.stage import Stage, compile_stages


def test_stage_chain_executes(ray_session):
    import ray.data as rd

    # closures pickle by value — module-level test symbols would not
    # resolve inside Ray workers
    double = lambda b: b.set_column(0, "x", pc.multiply(b["x"], pa.scalar(2)))  # noqa: E731

    class AddN:
        def __init__(self, n: int):
            self._n = n

        def __call__(self, b: pa.Table) -> pa.Table:
            return b.set_column(0, "x", pc.add(b["x"], pa.scalar(self._n)))

    ds = rd.from_items([{"x": i} for i in range(100)])
    out = compile_stages(ds, [
        Stage("double", double, batch_size=16),
        Stage("add7", AddN, concurrency=(1, 2), kwargs={"n": 7},
              num_cpus=0.25),
    ])
    vals = sorted(r["x"] for r in out.take_all())
    assert vals == sorted(2 * i + 7 for i in range(100))


def test_actor_stage_requires_concurrency():
    class AddN:
        def __call__(self, b):
            return b

    with pytest.raises(ValueError):
        Stage("bad", AddN, kwargs={"n": 1})


def test_task_stage_rejects_ctor_kwargs():
    with pytest.raises(ValueError):
        Stage("bad", lambda b: b, kwargs={"n": 1})
