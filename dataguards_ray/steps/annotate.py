"""Stateful annotation stages (SURVEY §2.4 A1–A4).

Each stage is a callable CLASS (model weights / LM tables / compiled
regexes load once in ``__init__``, per-batch work in ``__call__``) usable
as an explicit actor pool — and the default flagship chain runs the
fused composite as an elastic TASK pool with a per-worker-process
singleton cache (same init amortization, better scheduling; see
``fused_annotate_batch``).  Scoring kernels are the same functions the
scalar oracle calls (langid.score_batch / perplexity.ppl_batch) so
annotations are bit-identical at any parallelism or batch composition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .. import langid, measures, perplexity, quality, spec


class LangIdStage:
    """A1: + (lang_id, lang_score)."""

    def __init__(self, models_dir: str | None = None):
        self.W = (
            langid.load_model()
            if models_dir is None
            else langid.load_model(f"{models_dir}/langid.npz")
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text_clean").to_pylist()
        langs, scores = langid.score_batch(texts, self.W)
        return batch.append_column("lang_id", pa.array(langs, type=pa.string())).append_column(
            "lang_score", pa.array(scores, type=pa.float32())
        )


class PerplexityStage:
    """A2: + ppl, scored with the LM of the row's OWN lang_id (CCNet §4.3).

    Rows whose lang_id has no LM (e.g. 'und') get spec.PPL_EMPTY_DOC —
    they are dropped by lang.confidence anyway.
    """

    def __init__(self, models_dir: str | None = None):
        self.lms = perplexity.load_models() if models_dir is None else perplexity.load_models(models_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text_clean").to_pylist()
        langs = batch.column("lang_id").to_pylist()
        n = len(texts)
        ppl = np.full(n, spec.PPL_EMPTY_DOC, dtype=np.float32)
        by_lang: dict[str, list[int]] = {}
        for i, lg in enumerate(langs):
            if lg in self.lms:
                by_lang.setdefault(lg, []).append(i)
        for lg, idxs in by_lang.items():
            toks = [spec.lm_tokens(texts[i]) for i in idxs]
            ppl[np.array(idxs)] = perplexity.ppl_batch(toks, self.lms[lg])
        return batch.append_column("ppl", pa.array(ppl, type=pa.float32()))


class QualityStage:
    """Model-based quality scoring (FineWeb-Edu/DCLM-style, from-scratch
    fastText machinery): + quality_score = P(clean) ∈ [0,1] float32 from
    the binary NB model over hashed char n-grams (quality.py).  OPT-IN —
    the frozen 15-rule gate stays the keep/drop authority; callers gate
    on the score via ``dg filter --quality-tau`` (a RangeRule on this
    column merged through merge_extra_rules)."""

    def __init__(self, models_dir: str | None = None):
        self.W, self.T = (
            quality.load_model()
            if models_dir is None
            else quality.load_model(f"{models_dir}/quality.npz")
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text_clean").to_pylist()
        scores = quality.score_batch(texts, self.W, self.T)
        return batch.append_column(
            "quality_score", pa.array(scores, type=pa.float32())
        )


class ScoreStage:
    """A3/A4 + §2.9 + R7 fused: quality measures, scrub, digest,
    rule evaluation → (keep, drop_rule, rule_hits, text_scrubbed, …).

    One fused per-doc pass (compiled-regex scans) — the scrub regex and
    rule thresholds come from the frozen spec; rule evaluation calls the
    same measures.evaluate_rules as the oracle.
    """

    def __init__(self):
        self.scrub_re = spec.SCRUB_RE  # compiled at import; pinned here per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text_clean").to_pylist()
        valid = batch.column("valid").to_pylist()
        langs = batch.column("lang_id").to_pylist()
        scores = batch.column("lang_score").to_pylist()
        ppls = batch.column("ppl").to_pylist()
        n = len(texts)

        keep = np.zeros(n, dtype=bool)
        drop_rule: list[str | None] = [None] * n
        rule_hits: list[list[str]] = [[]] * n
        scrubbed: list[str] = [""] * n
        scrub_count = np.zeros(n, dtype=np.int32)
        digests: list[str] = [""] * n

        for i in range(n):
            t = texts[i]
            m = measures.doc_measures(t)
            sc, pii_n, tox_n = spec.scrub_text(t)
            hits = measures.evaluate_rules(
                m,
                valid=bool(valid[i]),
                bad_marker=measures.has_bad_marker(t),
                lang_id=langs[i],
                lang_score=scores[i],
                ppl=ppls[i],
                pii_count=pii_n,
            )
            keep[i] = not hits
            drop_rule[i] = hits[0] if hits else None
            rule_hits[i] = hits
            scrubbed[i] = sc
            scrub_count[i] = pii_n + tox_n
            digests[i] = hashlib.blake2b(t.encode("utf-8"), digest_size=16).hexdigest()

        return (
            batch.append_column("keep", pa.array(keep))
            .append_column("drop_rule", pa.array(drop_rule, type=pa.string()))
            .append_column("rule_hits", pa.array(rule_hits, type=pa.list_(pa.string())))
            .append_column("text_scrubbed", pa.array(scrubbed, type=pa.string()))
            .append_column("scrub_count", pa.array(scrub_count, type=pa.int32()))
            .append_column("digest", pa.array(digests, type=pa.string()))
        )


class FusedAnnotateStage:
    """LangId + Perplexity + Score fused into ONE actor stage.

    One pool instead of three: no inter-stage object-store round trips
    for the wide text column, and no CPU-slot contention between pools
    (three (min,max) pools on N CPUs fight for slots and stall the
    stream).  Semantics identical by construction — it calls the three
    stages' __call__ in pipeline order on the same batch.
    """

    def __init__(self, models_dir: str | None = None, slim_dropped: bool = False,
                 with_quality: bool = False):
        self._langid = LangIdStage(models_dir)
        self._ppl = PerplexityStage(models_dir)
        self._quality = QualityStage(models_dir) if with_quality else None
        self._score = ScoreStage()
        self._slim = slim_dropped

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._ppl(self._langid(batch))
        if self._quality is not None:
            # before ScoreStage/slimming: scores the same text_clean the
            # frozen rules saw, on every row (dropped rows keep a real
            # score for lineage / --quality-tau chained-gate semantics)
            out = self._quality(out)
        out = self._score(out)
        if self._slim:
            # write path: blank payload strings on dropped rows so the
            # partition-write shuffle doesn't move their text (~60% of
            # rows); they only feed the per-partition counters.
            import pyarrow.compute as pc

            keep = out.column("keep")
            empty = pa.scalar("", type=pa.string())
            # NOT url: the partition writer needs true urls for its
            # in-group url-dedup and counters
            for col in ("lang", "text_scrubbed", "text_clean"):
                if col in out.schema.names:
                    idx = out.schema.get_field_index(col)
                    slimmed = pc.if_else(keep, out.column(col), empty)
                    out = out.set_column(idx, col, slimmed.combine_chunks())
        return out


# ---------------------------------------------------------------------------
# Task-pool variant: stateless function + per-worker-process model cache.
#
# Ray reuses worker processes across tasks, so a module-level singleton
# amortizes model loading exactly like an actor's __init__ — while task
# scheduling is elastic: no pool sizing, no autoscaler ramp (measured 2×
# slower than fixed pools), no CPU-slot starvation of neighboring sort /
# write operators.  The actor classes above remain for callers that want
# explicit pools (e.g. GPU stages would need them).
# ---------------------------------------------------------------------------

_FUSED_SINGLETON: dict[tuple[str, bool], FusedAnnotateStage] = {}


def fused_annotate_batch(batch: pa.Table, *, slim_dropped: bool = False,
                         with_quality: bool = False) -> pa.Table:
    key = ("slim" if slim_dropped else "full", with_quality)
    stage = _FUSED_SINGLETON.get(key)
    if stage is None:
        stage = FusedAnnotateStage(slim_dropped=slim_dropped,
                                   with_quality=with_quality)
        _FUSED_SINGLETON[key] = stage
    out = stage(batch)
    # drop intermediates here (not in a separate drop_columns op, which
    # would copy every batch through the object store once more)
    return out.drop_columns(
        [c for c in ("raw_digest", "text_clean", "valid") if c in out.schema.names]
    )
