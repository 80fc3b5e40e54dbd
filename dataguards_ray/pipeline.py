"""Flagship quality-filter pipeline (SURVEY §3 E1) + step registry (§2.10).

    ONE streaming pass over the corpus:
      read_pages → prepare (extract/normalize, part_id, drop html)
        → fused annotate (langid + perplexity + measures + scrub +
          rules; task pool with per-worker model cache; dropped rows'
          payloads slimmed to counter columns)
        → phase-1 write: groupby(part_id) — THE only corpus-sized
          all-to-all — each partition group does url-dedup in place
          (part_id = fnv1a64(url) % P co-locates every row of a url),
          writes kept-{pid}.parquet + 'annotated' manifest atomically,
          and RETURNS its text-dedup partials (digest, max rank, count)
        → groupby(digest) over the partials (tiny, same execution)
          → contested winners broadcast
    finalize: per-partition tasks rewrite kept → part-{pid}.parquet
        dropping text-dedup losers, upgrade manifests     [no shuffle]

Dedup collision resolution rides the write shuffle (url) or thin
metadata partials (digest) — see steps/dedup.py for the 10^12-doc
notes.  Resume (E3) skips partitions whose manifests are already at the
required stage; both phases are deterministic functions of the input,
so resumed output is byte-identical.

``annotate()`` is the in-memory variant for tests / queries(): same
semantics, but the scored dataset is materialized once (test-scale
convenience) so text-dedup winners don't re-execute the chain.

Library code never calls ray.init() (driver contract).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, ClassVar, Protocol

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset

from . import io as dg_io
from . import spec
from .steps import dedup as dedup_mod
from .steps.annotate import (FusedAnnotateStage, LangIdStage, PerplexityStage,
                             ScoreStage, fused_annotate_batch)
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
    # html rows are wide; keep heap per task bounded.  This batch size
    # also sets the FUSED prepare→annotate task granularity (Ray bundles
    # input blocks up to it), so it is the wave-packing knob for the
    # dominant compute stage.
    batch_size: int = 1024

    def apply(self, ds: Dataset) -> Dataset:
        return ds.map_batches(
            functools.partial(prepare_batch, num_parts=self.num_parts),
            batch_format="pyarrow",
            batch_size=self.batch_size,
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


@register_step("blocklist")
@dataclass
class DomainBlocklistStep:
    """Optional J1/J3 stage (RefinedWeb-style url filtering; FIXTURES.md
    F3): drop rows whose url host is on a broadcast blocklist.  Not in
    the frozen default chain (the oracle does not model it) — insert
    after 'prepare' via a custom ``steps`` list."""

    blocked: frozenset = frozenset()

    def apply(self, ds: Dataset) -> Dataset:
        import ray as _ray

        from .steps.dedup import get_broadcast

        ref = _ray.put(frozenset(self.blocked))

        def _blocked_host(host: str, blocked: frozenset) -> bool:
            # standard blocklist semantics: exact host or any parent domain
            parts = host.split(".")
            return any(".".join(parts[i:]) in blocked for i in range(len(parts)))

        def _filter(batch: pa.Table) -> pa.Table:
            blocked = get_broadcast(ref)
            from urllib.parse import urlsplit

            mask = []
            for u in batch.column("url").to_pylist():
                try:
                    host = (urlsplit(u).hostname or "").lower()
                except ValueError:
                    host = ""
                mask.append(not _blocked_host(host, blocked))
            return batch.filter(pa.array(mask, type=pa.bool_()))

        return ds.map_batches(_filter, batch_format="pyarrow")


@register_step("annotate")
@dataclass
class FusedAnnotateStep:
    """langid + perplexity + score fused (see FusedAnnotateStage /
    fused_annotate_batch) — the default chain stage.

    Runs as a stateless TASK pool with a per-worker-process model cache:
    same once-per-process init amortization as an actor pool, but fully
    elastic scheduling (no pool sizing / autoscaler ramp / CPU-slot
    starvation of the neighboring sort+write operators — all measured
    problems; see steps/annotate.py).  Set ``use_actors=True`` for an
    explicit pool (required if the stage ever pins accelerators)."""

    # batch_size 512 (round 2, measured): the fused stage runs ~1s/batch,
    # so ~4 batches per CPU per 100k docs pack into full waves — 2048
    # quantized the stage into 2 ragged waves (45 tasks × 3.9s on 32
    # CPUs = 10.4s wall where 512 gives 6.4s; 8-CPU wall unchanged)
    concurrency: tuple[int, int] | int | None = None
    batch_size: int = 512
    slim_dropped: bool = False
    use_actors: bool = False
    with_quality: bool = False

    def apply(self, ds: Dataset) -> Dataset:
        if self.use_actors:
            return ds.map_batches(
                FusedAnnotateStage,
                fn_constructor_kwargs={"slim_dropped": self.slim_dropped,
                                       "with_quality": self.with_quality},
                batch_format="pyarrow",
                batch_size=self.batch_size,
                concurrency=self.concurrency or (1, 8),
            )
        return ds.map_batches(
            functools.partial(fused_annotate_batch,
                              slim_dropped=self.slim_dropped,
                              with_quality=self.with_quality),
            batch_format="pyarrow",
            batch_size=self.batch_size,
        )


@dataclass
class FilterPipeline:
    """E1 builder.  ``steps`` is the frozen default chain unless
    overridden.  ``extra_rules`` (a RuleSet, e.g. from
    ``rules.config.rules_from_config``) merges user-declared constraints
    into the quality gate AFTER the frozen spec rules: extra hits append
    to rule_hits, keep &= clean, drop_rule prefers the spec rule — the
    DataGuards declarative DSL chained into the webtext filter.  Rows
    dropped ONLY by extra rules are not payload-slimmed before the write
    shuffle (the fused annotate slims its own drops); heavy extra-rule
    drop rates ship their text once."""

    num_parts: int = spec.DEFAULT_NUM_PARTS
    concurrency: tuple[int, int] | int = (1, 8)
    steps: list[PipelineStep] = field(default_factory=list)
    extra_rules: "object | None" = None  # rules.dsl.RuleSet
    #: model-quality gate (quality.py): when set, the fused annotate
    #: stage also emits quality_score and a RangeRule
    #: quality.model: quality_score ∈ [τ, ∞) is appended AFTER any user
    #: extra_rules (spec rules ≺ user rules ≺ model gate canonically)
    quality_tau: "float | None" = None

    def __post_init__(self):
        if self.quality_tau is not None:
            from .rules.dsl import RangeRule, RuleSet

            gate = RangeRule(name="quality.model", col="quality_score",
                             lo=float(self.quality_tau), hi=None)
            prior = list(self.extra_rules.rules) if self.extra_rules is not None else []
            self.extra_rules = RuleSet(prior + [gate])
        if not self.steps:
            self.steps = [
                PrepareStep(num_parts=self.num_parts),
                FusedAnnotateStep(concurrency=self.concurrency,
                                  with_quality=self.quality_tau is not None),
            ]

    # -- shared pieces -----------------------------------------------------

    def _score_chain(
        self,
        ds: Dataset,
        *,
        skip_parts: set[int] | None = None,
    ) -> Dataset:
        for step in self.steps:
            ds = step.apply(ds)
            if step.name == "prepare":
                if skip_parts:
                    skip = pa.array(sorted(skip_parts), type=pa.int32())
                    ds = ds.map_batches(
                        lambda b, s=skip: b.filter(
                            pc.invert(pc.is_in(b.column("part_id"), value_set=s))
                        ),
                        batch_format="pyarrow",
                    )
        # the fused annotate step drops intermediates itself; only the
        # individual-step path needs an explicit projection
        if not any(isinstance(s, FusedAnnotateStep) for s in self.steps):
            ds = ds.drop_columns(["raw_digest", "text_clean", "valid"])
        if self.extra_rules is not None:
            from .rules.dsl import merge_extra_rules

            ds = merge_extra_rules(ds, self.extra_rules)
        return ds

    # -- in-memory variant (tests / queries) -------------------------------

    def annotate(self, ds: Dataset, *, input_path: str | None = None) -> Dataset:
        """Full annotation incl. ``dedup_keep`` flag; materializes the
        scored dataset once (use run() for corpus-scale streaming).

        url-dedup (newest wins) is applied from the materialized scored
        metadata — losers are annotated (wasted work on the rare dup
        fraction) then filtered, matching run()'s in-writer dedup."""
        scored = self._score_chain(ds).materialize()
        winners = dedup_mod.url_max_ts(scored.select_columns(["url", "warc_ts"]))
        scored = dedup_mod.url_dedup_filter(scored, winners)
        kept_meta = scored.map_batches(
            lambda b: b.filter(b.column("keep")).select(["digest", "warc_ts", "url"]),
            batch_format="pyarrow",
        )
        dwinners = dedup_mod.digest_winners(kept_meta)
        return dedup_mod.flag_dedup_keep(scored, dwinners)

    # -- streaming two-phase run -------------------------------------------

    #: wall seconds of the last run()'s phases (diagnostic; read by bench
    #: tooling): phase1 = annotate+shuffle+write+winner merge (one
    #: execution), finalize = loser-drop rewrite wave
    last_phase_walls: ClassVar[dict] = {}

    def run(
        self, input_path: str, out_dir: str, *, resume: bool = False,
        input_format: str = "parquet",
    ) -> list[dict]:
        """E1/E3: annotate → phase-1 kept files → text-dedup → finalize.
        Returns the final lineage manifests (one per partition).

        ``input_format="warc"`` reads Common-Crawl-style WARC/WARC.gz
        archives directly (sources/warc.py: one streaming task per
        file, response records lifted to the pages schema with NULL
        text — the extract stage derives text from html)."""
        import os
        import time as _time

        os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
        if not resume:
            # fail fast on a dirty out_dir: phase 2 globs manifests/parquet
            # parts, so debris from an earlier run in the same directory
            # would be silently merged into this run's output.
            debris = dg_io.partitions_by_stage(out_dir)
            stray = [
                n for n in os.listdir(out_dir)
                if (n.startswith("kept-") or n.startswith("part-")) and n.endswith(".parquet")
            ]
            if debris["annotated"] or debris["final"] or stray:
                raise ValueError(
                    f"out_dir {out_dir!r} already contains run artifacts "
                    f"({len(debris['annotated'])} manifest(s), {len(stray)} parquet part(s)); "
                    "pass resume=True to continue that run or use a clean directory"
                )
        stages = dg_io.partitions_by_stage(out_dir) if resume else {"annotated": set(), "final": set()}
        if resume and stages["annotated"] and self.extra_rules is not None:
            from .rules.dsl import corpus_group_rules

            grp = [r.name for r in corpus_group_rules(self.extra_rules)]
            if grp:
                # a group-wise extra rule (unique/cfd-variable/dc-pair)
                # evaluated over only the NOT-yet-annotated partitions
                # would see partial groups and silently diverge from a
                # fresh run — refuse instead of breaking the byte-equal
                # resume invariant (row-local extra rules are fine: they
                # are pure per-row functions)
                raise ValueError(
                    f"cannot resume with group-wise extra rules {grp}: "
                    "they must see the whole corpus; rerun fresh or drop "
                    "them from the config")
        _t0 = _time.time()

        # phase 1 — annotate + write kept rows per partition (url-dedup
        # happens inside the writer: part_id co-locates each url's rows)
        if input_format == "warc":
            from .sources import pages_from_warc, read_warc

            ds = pages_from_warc(read_warc(input_path))
        elif input_format == "parquet":
            ds = dg_io.read_pages(input_path)
        else:
            raise ValueError(f"unknown input_format {input_format!r}")
        # slim_dropped: the write shuffle must not move dropped rows'
        # text (they only feed counters) — annotate() keeps full labels
        import dataclasses

        steps = [
            dataclasses.replace(s, slim_dropped=True)  # keep user batch_size/use_actors
            if isinstance(s, FusedAnnotateStep) else s
            for s in self.steps
        ]
        pipe = FilterPipeline(num_parts=self.num_parts,
                              concurrency=self.concurrency, steps=steps,
                              extra_rules=self.extra_rules)
        scored = pipe._score_chain(ds, skip_parts=stages["annotated"])
        # pre-shuffle coalesce (round 2, measured): the sort groupby's
        # overhead scales with its input block count (annotate emits one
        # small block per 512-row batch → hundreds of tiny sort
        # partitions; 300k docs: 21-27s → 16-19s wall at 32 CPUs).
        # Target = one block per CPU, floored at 128 MB blocks from the
        # parquet metadata estimate so a 100 TB corpus never coalesces
        # below a sane block size.
        try:
            est_bytes = ds.size_bytes() or 0
            cpus = int(ray.cluster_resources().get("CPU", 8))
            n_blocks = max(cpus, est_bytes // (128 << 20))
            scored = scored.repartition(n_blocks)
        except Exception:
            pass  # estimation is best-effort; the shuffle is correct either way
        partials = scored.groupby("part_id").map_groups(
            lambda g: dg_io.write_annotated_partition(g, out_dir),
            batch_format="pyarrow",
        )
        # the writer emits per-partition digest partials → merging them
        # consumes the same execution (the partition writes happen inside
        # the map_groups); the merge itself is adaptive (driver Arrow
        # C++ under the row cap, distributed groupby above — round 2)
        from ray.data.aggregate import Max, Sum

        from .aggregates import driver_merge_or_none

        merged, mat = driver_merge_or_none(
            partials, ["digest"], [("n", "sum", "n"), ("r", "max", "r")]
        )
        if merged is not None:
            bad = merged.filter(pc.greater(merged.column("n"), 1))
            dwinners = dict(
                zip(bad.column("digest").to_pylist(), bad.column("r").to_pylist())
            )
        else:
            agg = mat.groupby("digest").aggregate(
                Sum("n", alias_name="n"), Max("r", alias_name="r")
            )
            dwinners = {
                row["digest"]: row["r"] for row in agg.filter(expr="n > 1").take_all()
            }

        type(self).last_phase_walls = {"phase1": round(_time.time() - _t0, 3)}
        _t1 = _time.time()

        all_parts = dg_io.partitions_by_stage(out_dir)["annotated"]
        if resume and stages["annotated"]:
            # resumed run: partitions finished earlier didn't re-emit
            # partials — recompute winners from ALL kept files' metadata
            kept_meta = dg_io.read_kept(out_dir, columns=["digest", "warc_ts", "url"])
            dwinners = dedup_mod.digest_winners(kept_meta)

        todo = sorted(all_parts - stages["final"])
        if todo:
            # plain Ray tasks, not a Dataset execution: a P-element task
            # list needs no streaming executor / repartition barrier
            # (measured ~0.3s of flat per-run overhead — pure ratio loss
            # on the high-parallelism side of the scaling bench).  The
            # winner dict ships ONCE via the object store; [wref] keeps
            # Ray from auto-dereferencing it per task.
            wref = ray.put(dwinners)

            @ray.remote(num_cpus=1)
            def _finalize_one(pid: int, boxed_ref: list) -> int:
                w = dedup_mod.get_broadcast(boxed_ref[0])
                return dg_io.finalize_partition(pid, out_dir, w)["part_id"]

            ray.get([_finalize_one.remote(int(p), [wref]) for p in todo])
        type(self).last_phase_walls["finalize"] = round(_time.time() - _t1, 3)
        return dg_io.read_lineage(out_dir)


def run_filter_job(
    input_path: str,
    out_dir: str,
    *,
    num_parts: int = spec.DEFAULT_NUM_PARTS,
    concurrency: tuple[int, int] | int = (1, 8),
    resume: bool = False,
    rules_config: "str | dict | None" = None,
    input_format: str = "parquet",
    quality_tau: "float | None" = None,
) -> list[dict]:
    """`dg filter` / `dg resume` entry (jobs/filter_job.py wraps this).
    ``rules_config``: path/dict/JSON of extra declarative rules merged
    into the quality gate (rules/config.py schema).  ``input_format``:
    parquet (default) or warc (Common-Crawl archives).  ``quality_tau``:
    model-quality gate threshold (quality.py; drop quality_score < τ)."""
    assert ray.is_initialized(), "caller owns the Ray session"
    extra = None
    if rules_config is not None:
        from .rules.config import rules_from_config

        extra = rules_from_config(rules_config)
    pipe = FilterPipeline(num_parts=num_parts, concurrency=concurrency,
                          extra_rules=extra, quality_tau=quality_tau)
    return pipe.run(input_path, out_dir, resume=resume,
                    input_format=input_format)
