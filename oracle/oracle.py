"""Scalar single-threaded oracle for the quality-filter pipeline (SURVEY §5.1).

Plays the role of the absent reference implementation: a deliberately
simple sequential pass over a pages table producing golden per-url labels
(keep / drop_rule / rule_hits / lang_id / ppl / byte-exact text_scrubbed),
dedup decisions and corpus stats.  The distributed Ray pipeline must
reproduce these EXACTLY at any parallelism (keep/drop F1 target 1.0,
scrub byte-identity 100% — BASELINE.md targets).

Shares only the frozen per-doc semantics with the pipeline (spec.py,
textproc.py, measures.py, model kernels — see measures.py docstring);
all *orchestration* here (url-dedup winners, text-dedup winners, stats
accumulation) is independent scalar code using plain dicts.

Frozen pipeline-level semantics (E1, SURVEY §3; steps/dedup.py):
 1. url-dedup: one winner per url — max warc_ts.  Input contract:
    (url, warc_ts) unique per corpus (asserted here).
 2. per-winner annotation: extract (if text null) → normalize → langid →
    perplexity(lang_id) → measures → scrub → rules → keep/drop_rule.
 3. exact text-dedup among KEPT rows: one winner per text_clean digest —
    max warc_ts, tie → max url.  `dedup_keep` = kept AND winner.
"""

from __future__ import annotations

import hashlib
import sys
import os

import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dataguards_ray import langid, measures, perplexity, spec, textproc  # noqa: E402


def clean_digest(text_clean: str) -> str:
    return hashlib.blake2b(text_clean.encode("utf-8"), digest_size=16).hexdigest()


def oracle_run(table: pa.Table, models_dir: str | None = None,
               quality_tau: "float | None" = None) -> dict:
    """Sequential golden run. Returns dict with 'golden' (pa.Table, one row
    per distinct url), 'rule_drops', 'lang_retention', 'survivor_urls'.

    ``quality_tau``: mirror of ``dg filter --quality-tau`` — adds a
    quality_score column (quality.score_one, bit-identical kernel) and,
    with merge_extra_rules' chained-gates semantics, drops previously-
    CLEAN rows scoring < τ under rule 'quality.model' (already-dropped
    rows keep their hits unchanged)."""
    W = langid.load_model() if models_dir is None else langid.load_model(
        os.path.join(models_dir, "langid.npz"))
    lms = perplexity.load_models() if models_dir is None else perplexity.load_models(models_dir)
    qual = None
    if quality_tau is not None:
        from dataguards_ray import quality

        qual = quality.load_model() if models_dir is None else quality.load_model(
            os.path.join(models_dir, "quality.npz"))

    rows = table.to_pylist()

    # -- 1. url dedup (newest crawl wins; (url, warc_ts) must be unique;
    #       NULL urls are schema-invalid rows and NEVER dedup against
    #       each other — SQL NULL-equality semantics, matching
    #       steps/dedup.py / io.write_annotated_partition) ----------------
    seen_ts: set[tuple[str, object]] = set()
    best: dict[str, dict] = {}
    null_url_rows: list[dict] = []
    for r in rows:
        if r["url"] is None:
            null_url_rows.append(r)
            continue
        key = (r["url"], r["warc_ts"])
        assert key not in seen_ts, f"input contract violated: duplicate (url, warc_ts) {key}"
        seen_ts.add(key)
        cur = best.get(r["url"])
        if cur is None or r["warc_ts"] > cur["warc_ts"]:
            best[r["url"]] = r

    # -- 2. per-url annotation ---------------------------------------------
    golden: list[dict] = []
    survivors = [best[url] for url in best] + null_url_rows
    for r in survivors:
        text = r["text"]
        if text is None and r["html"] is not None:
            text = textproc.extract_text_one(r["html"])
        valid = r["url"] is not None and text is not None
        text_clean = textproc.normalize_text_one(text) if text is not None else ""
        lang_id, lang_score = langid.score_one(text_clean, W)
        tokens = spec.lm_tokens(text_clean)
        if lang_id in lms:
            ppl = perplexity.ppl_one(tokens, lms[lang_id])
        else:
            ppl = float(spec.PPL_EMPTY_DOC)
        m = measures.doc_measures(text_clean)
        scrubbed, pii_n, tox_n = spec.scrub_text(text_clean)
        hits = measures.evaluate_rules(
            m, valid=valid, bad_marker=measures.has_bad_marker(text_clean),
            lang_id=lang_id, lang_score=lang_score, ppl=ppl, pii_count=pii_n,
        )
        q_score = None
        if qual is not None:
            from dataguards_ray import quality

            q_score = quality.score_one(text_clean, qual[0], qual[1])
            if not hits and q_score < quality_tau:
                hits = ["quality.model"]
        golden.append(
            {
                "quality_score": q_score,
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "keep": not hits,
                "drop_rule": hits[0] if hits else None,
                "rule_hits": hits,
                "lang_id": lang_id,
                "lang_score": lang_score,
                "ppl": ppl,
                "text_scrubbed": scrubbed,
                "scrub_count": pii_n + tox_n,
                "scrubbed_sha256": hashlib.sha256(scrubbed.encode()).hexdigest(),
                "digest": clean_digest(text_clean),
            }
        )

    # -- 3. exact text dedup among kept (max ts, tie -> max url) -----------
    dwin: dict[str, dict] = {}
    for g in golden:
        if not g["keep"]:
            continue
        cur = dwin.get(g["digest"])
        if cur is None or (g["warc_ts"], g["url"]) > (cur["warc_ts"], cur["url"]):
            dwin[g["digest"]] = g
    survivors = {id(g) for g in dwin.values()}
    for g in golden:
        g["dedup_keep"] = g["keep"] and id(g) in survivors

    # -- 4. stats ------------------------------------------------------------
    rule_drops: dict[str, int] = {}
    lang_tot: dict[str, int] = {}
    lang_kept: dict[str, int] = {}
    for g in golden:
        for h in g["rule_hits"]:
            rule_drops[h] = rule_drops.get(h, 0) + 1
        lang_tot[g["lang_id"]] = lang_tot.get(g["lang_id"], 0) + 1
        if g["keep"]:
            lang_kept[g["lang_id"]] = lang_kept.get(g["lang_id"], 0) + 1
    lang_retention = {
        lang: {
            "total": lang_tot[lang],
            "kept": lang_kept.get(lang, 0),
            "retention": lang_kept.get(lang, 0) / lang_tot[lang],
        }
        for lang in lang_tot
    }

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("keep", pa.bool_()),
            ("drop_rule", pa.string()),
            ("rule_hits", pa.list_(pa.string())),
            ("lang_id", pa.string()),
            ("lang_score", pa.float32()),
            ("ppl", pa.float32()),
            ("text_scrubbed", pa.string()),
            ("scrub_count", pa.int32()),
            ("scrubbed_sha256", pa.string()),
            ("digest", pa.string()),
            ("dedup_keep", pa.bool_()),
        ]
    )
    if qual is not None:
        schema = schema.append(pa.field("quality_score", pa.float32()))
    golden_tbl = pa.Table.from_pylist(golden, schema=schema)
    return {
        "golden": golden_tbl,
        "rule_drops": rule_drops,
        "lang_retention": lang_retention,
        "survivor_urls": sorted(g["url"] for g in golden if g["dedup_keep"]),
    }
