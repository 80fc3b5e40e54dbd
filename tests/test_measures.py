"""Unit tests for quality measures + rule evaluation on hand-computed
minis (SURVEY §5.2) and for the langid/perplexity kernels."""

from __future__ import annotations

import numpy as np

from dataguards_ray import langid, measures, perplexity, spec


def test_word_measures():
    m = measures.doc_measures("Alpha beta gamma. Delta 42 epsilon!\nZeta eta.")
    assert m["word_count"] == 8
    assert m["sentence_count"] == 3
    assert m["stopword_hits"] == 0
    # 7 of 8 words contain an alphabetic char
    assert abs(m["alpha_word_ratio"] - 7 / 8) < 1e-12


def test_bullet_and_ellipsis_lines():
    text = "- one thing\n- another\nplain line\nwaiting...\n"
    m = measures.doc_measures(text)
    assert abs(m["bullet_ratio"] - 2 / 4) < 1e-12
    assert abs(m["ellipsis_ratio"] - 1 / 4) < 1e-12


def test_dup_line_fraction():
    text = "same line\nsame line\nsame line\nunique"
    m = measures.doc_measures(text)
    # 2 duplicate occurrences × 9 chars / 33 total line chars
    assert abs(m["dup_line_frac"] - 18 / 33) < 1e-12


def test_top2gram_fraction():
    text = "ab cd ab cd ab cd"
    m = measures.doc_measures(text)
    # top bigram ('ab','cd') occurs 3× of 12 word chars → 3*4/12 = 1.0
    assert abs(m["top2gram_frac"] - 1.0) < 1e-12


def test_rule_order_first_violation():
    m = measures.doc_measures("tiny. doc.")
    hits = measures.evaluate_rules(
        m, valid=True, bad_marker=True, lang_id="en", lang_score=0.9,
        ppl=10.0, pii_count=0,
    )
    assert hits[0] == "len.word_count"  # canonical order: first in RULE_ORDER
    assert "c4.bad_markers" in hits


def test_mean_word_len_zh_exempt():
    m = {**measures.doc_measures("的 了 和 是 在 我 有 他"), "mean_word_len": 1.0}
    hits_zh = measures.evaluate_rules(
        m, valid=True, bad_marker=False, lang_id="zh", lang_score=0.99,
        ppl=10.0, pii_count=0,
    )
    assert "len.mean_word_len" not in hits_zh
    hits_en = measures.evaluate_rules(
        m, valid=True, bad_marker=False, lang_id="en", lang_score=0.99,
        ppl=10.0, pii_count=0,
    )
    assert "len.mean_word_len" in hits_en


def test_langid_deterministic_and_correct():
    from dataguards_ray import langdata
    import random

    W = langid.load_model()
    docs = [langdata.clean_doc(random.Random(i), lg) for i, lg in enumerate(spec.LANGS)]
    langs, scores = langid.score_batch(docs, W)
    assert langs == list(spec.LANGS)
    # batch-composition invariance (bit-exact)
    for i, d in enumerate(docs):
        l1, s1 = langid.score_one(d, W)
        assert l1 == langs[i] and np.float32(s1) == scores[i]


def test_ppl_batch_invariance():
    from dataguards_ray import langdata
    import random

    lms = perplexity.load_models()
    docs = [langdata.clean_doc(random.Random(100 + i), "en") for i in range(5)]
    toks = [spec.lm_tokens(d) for d in docs]
    batch = perplexity.ppl_batch(toks, lms["en"])
    for i in range(5):
        assert perplexity.ppl_one(toks[i], lms["en"]) == batch[i]
    assert perplexity.ppl_batch([[]], lms["en"])[0] == np.float32(spec.PPL_EMPTY_DOC)


def test_extract_text_frozen():
    from dataguards_ray import textproc

    html = (b"<html><head><script>var x=1;</script><title>T</title></head>"
            b"<body><p>Hello &amp; world</p><!-- c --><div>Next  line</div>"
            b"<noscript>skip me</noscript></body></html>")
    # <head> subtree (incl. title) is skipped; entities decoded; comments
    # and noscript dropped; intra-line whitespace collapsed
    assert textproc.extract_text_one(html) == "Hello & world\nNext line"


def test_normalize_frozen():
    from dataguards_ray import textproc

    assert textproc.normalize_text_one("a \r\nb\r\n\n\n\nc  \n") == "a\nb\n\nc"
