"""Golden end-to-end test — the backbone (SURVEY §5.1).

Runs the full curation DAG on the deterministic corpus and diffs every
output field against the checked-in goldens produced by the independent
pure-Python oracle: exact match for labels and BYTE-IDENTICAL match for
extracted/scrubbed text (the input_hint invariant), tolerant match for
float ratios.
"""

from __future__ import annotations

import base64
import json
import math
from pathlib import Path

import pytest

from gemproc2caom2_spark.plans.pipeline import curate
from gemproc2caom2_spark.sources.datagen import generate_corpus

GOLDENS = json.loads((Path(__file__).parent / "data" / "expected_verdicts.json").read_text())


@pytest.fixture(scope="module")
def curated(spark):
    corpus = generate_corpus(spark, 60)
    rows = curate(corpus, num_partitions=8).collect()
    return {r.url: r for r in rows}


def _b64(s: str | None) -> str | None:
    return base64.b64encode(s.encode("utf-8")).decode() if s is not None else None


def test_row_count(curated):
    assert len(curated) == len(GOLDENS) == 60


@pytest.mark.parametrize("g", GOLDENS, ids=[g["url"].rsplit("/", 1)[-1] for g in GOLDENS])
def test_golden_document(curated, g):
    r = curated[g["url"]]

    # language re-derivation
    assert r.lang_pred == g["lang_pred"], f"lang {r.lang_pred} != {g['lang_pred']}"

    # keep/drop: golden excludes the corpus-level 'duplicate' reason
    expected_reason = g["drop_reason_pre_dedup"]
    if r.drop_reason == "duplicate":
        assert expected_reason is None, (
            f"duplicate verdict must only hit docs the oracle keeps: {g['url']}"
        )
    else:
        assert r.drop_reason == expected_reason
        assert r.keep == (expected_reason is None)

    # byte-identical scrubbed text (the per-row invariant vs reference)
    assert _b64(r.scrubbed_text) == g["scrubbed_text_b64"], f"scrub bytes differ: {g['url']}"

    # perplexity: same rounded value (both sides round to 1e-6)
    if g["perplexity"] is None:
        assert r.perplexity is None
    else:
        assert r.perplexity == pytest.approx(g["perplexity"], abs=2e-6)

    # quality metrics: ints exact, ratios to 1e-9 (identical formulas)
    q, gq = r.quality, g["quality"]
    assert q.doc_len == gq["doc_len"]
    assert q.n_words == gq["n_words"]
    for fld in ("mean_line_len", "symbol_ratio", "repeated_line_frac", "rare_char_ratio"):
        got, want = getattr(q, fld), gq[fld]
        if want is None:
            assert got is None, f"{fld}: {got} != None"
        else:
            assert got == pytest.approx(want, abs=1e-9), f"{fld}"


def test_duplicate_marking(curated):
    """Near-dup pairs: exactly one of each (a, b) pair flagged duplicate;
    identical invalid_utf8 docs: all but one flagged."""
    by_cat: dict[str, list] = {}
    for g in GOLDENS:
        by_cat.setdefault(g["category"], []).append(curated[g["url"]])

    pairs = list(zip(by_cat["near_dup_a"], by_cat["near_dup_b"]))
    assert len(pairs) == 4
    flagged = sum(
        (a.drop_reason == "duplicate") + (b.drop_reason == "duplicate")
        for a, b in pairs
    )
    # each pair contributes exactly one duplicate
    assert flagged == len(pairs), [
        (a.url, a.drop_reason, b.url, b.drop_reason) for a, b in pairs
    ]

    utf8 = by_cat["invalid_utf8"]  # 4 byte-identical docs -> 3 dups
    assert sum(r.drop_reason == "duplicate" for r in utf8) == len(utf8) - 1

    # no false positives among clean singles
    for cat in ("clean_en", "clean_en_pii", "null_text_html"):
        assert all(r.drop_reason != "duplicate" for r in by_cat[cat]), cat


def test_extraction_byte_identity(curated):
    """null-text rows must extract text from html byte-identically
    (including the invalid-UTF8 and emoji fixtures)."""
    for g in GOLDENS:
        if g["category"] in ("null_text_html", "invalid_utf8"):
            r = curated[g["url"]]
            assert _b64(r.scrubbed_text) == g["scrubbed_text_b64"]
