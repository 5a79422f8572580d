"""Distributed bigram-LM training (the KenLM lmplz analog) — parity
with the embedded model, partition invariance, persistence round-trip.
Reference test analog: keyword-table assertions,
/root/reference/gemProc2caom2/tests/test_main_app.py:171-186."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gemproc2caom2_spark.functions.perplexity import (
    SEED_CORPUS,
    _train_bigram_logp,
    counts_to_logp,
    load_bigram_logp,
    make_perplexity_udf,
    perplexity_of,
    train_bigram_counts,
)


def test_trained_on_seed_equals_embedded_model(spark):
    """Training on the seed corpus itself must reproduce the embedded
    matrix exactly (char-level == byte-level on ASCII)."""
    df = spark.createDataFrame([(SEED_CORPUS,)], "text string")
    cells = train_bigram_counts(df).collect()
    got = counts_to_logp([(r.prev_idx, r.cur_idx, r.n) for r in cells])
    np.testing.assert_allclose(got, _train_bigram_logp(), rtol=0, atol=0)


def test_training_partition_invariant(spark):
    """Cell counts must not depend on partitioning (the per-doc boundary
    masking in the batch fold): 1 vs 7 partitions, with nulls, empties,
    and 1-char docs interleaved."""
    rows = [
        ("the quick brown fox jumps over the lazy dog",),
        (None,),
        ("",),
        ("x",),
        ("high quality documents are written in sentences.",),
        ("data pipelines read tables and filter rows",),
        (None,),
        ("ab",),
    ] * 9
    df = spark.createDataFrame(rows, "text string")

    def cells(frame):
        return {
            (r.prev_idx, r.cur_idx): r.n
            for r in train_bigram_counts(frame).collect()
        }

    assert cells(df.repartition(1)) == cells(df.repartition(7))


def test_trained_scorer_matches_scalar_and_guards(spark):
    """make_perplexity_udf over the seed-trained matrix == perplexity_of
    per doc on ASCII text; null and <2-char docs -> null."""
    texts = [
        "the quick brown fox jumps over the lazy dog.",
        "zqxj wvkp zzzz qqqq xxxx",
        None,
        "a",
        "",
        "language models assign low perplexity to fluent text.",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    udf = make_perplexity_udf(_train_bigram_logp())
    got = [r.p for r in df.select(udf("text").alias("p")).collect()]
    for g, t in zip(got, texts):
        want = perplexity_of(t)
        if want is None:
            assert g is None
        else:
            assert g == pytest.approx(want, rel=1e-9), t


def test_model_persistence_roundtrip(spark, tmp_path):
    """Train -> write cells parquet -> load_bigram_logp -> score: the
    stored-model probe path (same shape as the trained-IVF sim4)."""
    corpus = spark.createDataFrame(
        [(SEED_CORPUS,), ("web pages contain paragraphs of prose.",)],
        "text string",
    )
    path = str(tmp_path / "bigram_model")
    train_bigram_counts(corpus).write.mode("overwrite").parquet(path)
    logp = load_bigram_logp(spark, path)

    direct = counts_to_logp(
        [
            (r.prev_idx, r.cur_idx, r.n)
            for r in train_bigram_counts(corpus).collect()
        ]
    )
    np.testing.assert_allclose(logp, direct, rtol=0, atol=0)

    scored = (
        spark.createDataFrame([("fluent english text here",)], "text string")
        .select(make_perplexity_udf(logp)("text").alias("p"))
        .first()[0]
    )
    assert scored is not None and scored > 0
