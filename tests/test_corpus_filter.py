"""Decontamination + composite keep filter: semantic invariants the oracle
SQL alone can't express — a pure-Python recomputation of the n-gram overlap
set, holdout exclusion, and the verdict precedence chain."""

from __future__ import annotations

import hashlib
import re

from fakepilot_spark.ops import load
from fakepilot_spark.ops.corpusops import (
    _DECON_EVAL_MOD,
    _DECON_W,
    _KEEP_MIN_QUALITY,
    q_corpus_keep_filter,
    q_eval_decontaminate,
)
from fakepilot_spark.ops.textops import _STOPWORD_PATTERN

SF_DIR = "/root/testdata/sf0.001"


def _grams(text: str) -> set[str]:
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + _DECON_W])
        for i in range(len(toks) - _DECON_W + 1)
    }


def _py_contaminated(texts: dict[int, str]) -> dict[int, int]:
    """Reference recomputation: distinct eval-gram hits per training doc."""
    eval_grams: set[str] = set()
    for did, text in texts.items():
        if did % _DECON_EVAL_MOD == 0:
            eval_grams |= _grams(text)
    return {
        did: len(_grams(text) & eval_grams)
        for did, text in texts.items()
        if did % _DECON_EVAL_MOD != 0
    }


def test_eval_decontaminate_matches_python(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_DIR, "documents").collect()
    }
    expect = _py_contaminated(texts)
    rows = {r["doc_id"]: r for r in q_eval_decontaminate(spark, SF_DIR).collect()}
    # universe = exactly the training docs; the holdout never appears
    assert set(rows) == set(expect)
    for did, r in rows.items():
        assert r["hit_grams"] == expect[did]
        assert r["contaminated"] == (expect[did] > 0)


def test_keep_filter_precedence_and_consistency(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_DIR, "documents").collect()
    }
    contaminated = _py_contaminated(texts)
    rows = {r["doc_id"]: r for r in q_corpus_keep_filter(spark, SF_DIR).collect()}
    assert set(rows) == set(contaminated)  # same training universe

    # python recomputation of each signal
    first_of: dict[str, int] = {}
    fp_of: dict[int, str] = {}
    for did in sorted(contaminated):
        fp = hashlib.md5(
            re.sub(r"\s+", " ", texts[did].lower()).encode()
        ).hexdigest()
        fp_of[did] = fp
        first_of.setdefault(fp, did)

    verdicts = set()
    for did, r in rows.items():
        toks = texts[did].split(" ")
        quality = round(
            min(len(toks) / 300.0, 1.0) * 0.7
            + min(len(texts[did]) / 1500.0, 1.0) * 0.3,
            4,
        )
        is_en = (
            round(len(re.findall(_STOPWORD_PATTERN, texts[did])) / len(toks), 4)
            > 0.03
        )
        if not is_en:
            expect_v = "non_english"
        elif quality < _KEEP_MIN_QUALITY:
            expect_v = "low_quality"
        elif first_of[fp_of[did]] != did:
            expect_v = "exact_duplicate"
        elif contaminated[did] > 0:
            expect_v = "contaminated"
        else:
            expect_v = "kept"
        assert r["verdict"] == expect_v, did
        assert r["keep"] == (expect_v == "kept")
        assert abs(r["quality"] - quality) < 1e-9
        assert r["is_first_copy"] == (first_of[fp_of[did]] == did)
        assert r["contaminated"] == (contaminated[did] > 0)
        verdicts.add(expect_v)
    assert "kept" in verdicts and len(verdicts) >= 2, (
        "testdata exercises only one verdict branch"
    )
