"""Flagship quality-filter pipeline (SURVEY §3 E1) + step registry (§2.10).

    read_pages → prepare (extract/normalize, part_id, drop html)
      → url-dedup (newest wins; collision-only shuffle)
      → LangIdStage (actor pool) → PerplexityStage (actor pool)
      → ScoreStage (actor pool: measures + scrub + rules + keep)
      → flag_text_dedup (collision-only shuffle on digest)
      [→ write_filtered: groupby(part_id) → atomic per-partition files
         + lineage manifests]

Everything is lazy/streaming: no stage materializes the corpus; the only
all-to-all exchanges are the two collision-set shuffles and the
final partition-write groupby.  Resume (E3) diffs lineage manifests and
filters finished part_ids out right after `prepare`.

Library code never calls ray.init() (driver contract).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Protocol

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from . import io as dg_io
from . import spec
from .steps import dedup as dedup_mod
from .steps.annotate import LangIdStage, PerplexityStage, ScoreStage
from .steps.prepare import prepare_batch


class PipelineStep(Protocol):
    """User-extension surface (§2.10): a named Dataset→Dataset stage."""

    name: str

    def apply(self, ds: Dataset) -> Dataset: ...


_STEP_REGISTRY: dict[str, Callable[..., "PipelineStep"]] = {}


def register_step(name: str):
    def deco(cls):
        _STEP_REGISTRY[name] = cls
        cls.name = name
        return cls

    return deco


def make_step(name: str, **kwargs) -> "PipelineStep":
    return _STEP_REGISTRY[name](**kwargs)


@dataclass
class MapBatchesStep:
    """Wraps any ``pa.Table -> pa.Table`` UDF into a step (§2.10)."""

    name: str
    fn: Callable[[pa.Table], pa.Table]
    batch_size: int | None = None

    def apply(self, ds: Dataset) -> Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", batch_size=self.batch_size)


@register_step("prepare")
@dataclass
class PrepareStep:
    num_parts: int = spec.DEFAULT_NUM_PARTS

    def apply(self, ds: Dataset) -> Dataset:
        return ds.map_batches(
            functools.partial(prepare_batch, num_parts=self.num_parts),
            batch_format="pyarrow",
            batch_size=512,  # html rows are wide; keep heap per task bounded
        )


@register_step("url_dedup")
@dataclass
class UrlDedupStep:
    def apply(self, ds: Dataset) -> Dataset:
        return dedup_mod.dedup_by_key(
            ds, "url", [("warc_ts", "descending"), ("raw_digest", "ascending")]
        )


@register_step("langid")
@dataclass
class LangIdStep:
    concurrency: tuple[int, int] | int = (1, 8)
    batch_size: int = 2048

    def apply(self, ds: Dataset) -> Dataset:
        return ds.map_batches(
            LangIdStage,
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


@register_step("perplexity")
@dataclass
class PerplexityStep:
    concurrency: tuple[int, int] | int = (1, 8)
    batch_size: int = 2048

    def apply(self, ds: Dataset) -> Dataset:
        return ds.map_batches(
            PerplexityStage,
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


@register_step("score")
@dataclass
class ScoreStep:
    concurrency: tuple[int, int] | int = (1, 8)
    batch_size: int = 1024

    def apply(self, ds: Dataset) -> Dataset:
        return ds.map_batches(
            ScoreStage,
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
        )


@register_step("text_dedup")
@dataclass
class TextDedupStep:
    def apply(self, ds: Dataset) -> Dataset:
        return dedup_mod.flag_text_dedup(ds)


@dataclass
class FilterPipeline:
    """E1 builder. ``steps`` is the frozen default chain unless overridden."""

    num_parts: int = spec.DEFAULT_NUM_PARTS
    concurrency: tuple[int, int] | int = (1, 8)
    steps: list[PipelineStep] = field(default_factory=list)

    def __post_init__(self):
        if not self.steps:
            self.steps = [
                PrepareStep(num_parts=self.num_parts),
                UrlDedupStep(),
                LangIdStep(concurrency=self.concurrency),
                PerplexityStep(concurrency=self.concurrency),
                ScoreStep(concurrency=self.concurrency),
                TextDedupStep(),
            ]

    def annotate(self, ds: Dataset, *, skip_parts: set[int] | None = None) -> Dataset:
        """Run the full annotation chain (lazy)."""
        for step in self.steps:
            ds = step.apply(ds)
            if step.name == "prepare" and skip_parts:
                skip = pa.array(sorted(skip_parts), type=pa.int32())
                ds = ds.map_batches(
                    lambda b, s=skip: b.filter(
                        pc.invert(pc.is_in(b.column("part_id"), value_set=s))
                    ),
                    batch_format="pyarrow",
                )
        return ds

    def run(self, ds: Dataset, out_dir: str, *, resume: bool = False) -> list[dict]:
        """Annotate → write survivors + lineage. Returns lineage records."""
        skip = dg_io.done_partitions(out_dir) if resume else set()
        annotated = self.annotate(ds, skip_parts=skip)
        lineage = dg_io.write_filtered(annotated, out_dir)
        records = lineage.take_all()
        return records


def run_filter_job(
    input_path: str,
    out_dir: str,
    *,
    num_parts: int = spec.DEFAULT_NUM_PARTS,
    concurrency: tuple[int, int] | int = (1, 8),
    resume: bool = False,
) -> list[dict]:
    """`dg filter` / `dg resume` entry (jobs/filter_job.py wraps this)."""
    assert ray.is_initialized(), "caller owns the Ray session"
    ds = dg_io.read_pages(input_path)
    pipe = FilterPipeline(num_parts=num_parts, concurrency=concurrency)
    return pipe.run(ds, out_dir, resume=resume)
