"""User-extension surface (SURVEY §2.11): a pipeline is a declarative
list of stage objects assembled by config, mirroring the reference's
plugin points (downloader middlewares settings.py:52-55, STORAGE_MODE
pipeline selection, overridable clean_content/detect_language hooks
base_playwright.py:74-162).

A :class:`Stage` is any batch->batch callable (stateless fn -> task
pool) or callable class (-> actor pool), plus its batch/concurrency
knobs; :class:`StagePipeline` applies them in order to a Dataset. The
extraction "profile" (goldie vs playwright cleaning, M4 vs M5) and the
sink are plain config values.

Example::

    pipe = StagePipeline([
        Stage("extract", extract_batch, kwargs={"profile": "playwright"}),
        Stage("chunk", ChunkerActor, batch_size=64, concurrency=(1, 4)),
        my_custom_stage,                       # any UDF hook
    ])
    out = pipe.apply(ray.data.read_parquet(pages))
"""

from __future__ import annotations

import functools
import inspect
from dataclasses import dataclass, field

import ray.data


@dataclass
class Stage:
    name: str
    fn: object                      # callable batch->batch, or a class
    batch_size: int | None = None
    concurrency: object = None      # int | (min, max) | None
    batch_format: str = "pyarrow"
    num_cpus: float | None = None
    kwargs: dict = field(default_factory=dict)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        opts: dict = {"batch_format": self.batch_format}
        if self.batch_size is not None:
            opts["batch_size"] = self.batch_size
        if self.num_cpus is not None:
            opts["num_cpus"] = self.num_cpus
        if inspect.isclass(self.fn):
            # stateful stage -> actor pool (setup amortized in __init__)
            opts["concurrency"] = self.concurrency or (1, 4)
            if self.kwargs:
                opts["fn_constructor_kwargs"] = self.kwargs
            return ds.map_batches(self.fn, **opts)
        fn = functools.partial(self.fn, **self.kwargs) if self.kwargs else self.fn
        if self.concurrency is not None:
            opts["concurrency"] = self.concurrency
        return ds.map_batches(fn, **opts)


class StagePipeline:
    def __init__(self, stages: list):
        self.stages = [
            s if isinstance(s, Stage) else Stage(getattr(s, "__name__", "udf"), s)
            for s in stages
        ]

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        for stage in self.stages:
            ds = stage.apply(ds)
        return ds

    def names(self) -> list[str]:
        return [s.name for s in self.stages]
