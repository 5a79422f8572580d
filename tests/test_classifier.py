"""Model-based quality filter: distributed training sanity + stored-
weights scoring (train-store-probe, the sim4/tx6 protocol)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gemproc2caom2_spark.operators.classifier import (
    _rule_label,
    quality_logit_expr,
    train_quality_classifier,
)
from gemproc2caom2_spark.operators.heuristics import DEFAULT_RULES, quality_struct
from gemproc2caom2_spark.sources.datagen import generate_corpus


def test_distilled_classifier_agrees_with_rule_gates(spark, tmp_path):
    """Train on one datagen slice, persist, score a DISJOINT slice from
    the stored weights: the distilled model must reproduce the rule-gate
    verdicts on held-out docs (>= 95% agreement)."""
    train = generate_corpus(spark, 300)
    holdout = generate_corpus(spark, 150, seed=777)

    w_df = train_quality_classifier(train, text_col="text")
    path = str(tmp_path / "qlr")
    w_df.write.mode("overwrite").parquet(path)
    w = spark.read.parquet(path).first().asDict()
    assert w["train_acc"] >= 0.98

    scored = (
        holdout.where(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(quality_struct("text").alias("_q"))
        .select(
            (quality_logit_expr(F.col("_q"), w) > 0).alias("model_keep"),
            (_rule_label(F.col("_q"), DEFAULT_RULES) > 0.5).alias("rule_keep"),
        )
    )
    n = scored.count()
    agree = scored.where("model_keep = rule_keep").count()
    assert n > 0 and agree / n >= 0.95, (agree, n)


def test_logit_deterministic_across_partitionings(spark):
    """Scoring is a pure Column expr: identical values regardless of
    partitioning (hash-compare of sorted collect)."""
    corpus = generate_corpus(spark, 120).where(F.col("text").isNotNull())
    w_df = train_quality_classifier(corpus, text_col="text")
    w = w_df.first().asDict()

    def score(frame):
        return sorted(
            r.l
            for r in frame.select(
                quality_logit_expr(quality_struct("text"), w).alias("l")
            )
            .where(F.col("l").isNotNull())
            .collect()
        )

    base = corpus.where(F.length("text") > 0)
    assert score(base.repartition(1)) == score(base.repartition(13))


def test_confusion_f1_exact_counts(spark):
    from gemproc2caom2_spark.operators.classifier import confusion_f1

    rows = (
        [(True, True)] * 6      # tp
        + [(False, True)] * 2   # fp
        + [(True, False)] * 2   # fn
        + [(False, False)] * 5  # tn
    )
    df = spark.createDataFrame(rows, ["keep", "model_keep"])
    r = confusion_f1(df).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (6, 2, 2, 5)
    assert r["precision_r6"] == 0.75
    assert r["recall_r6"] == 0.75
    assert r["f1_r6"] == 0.75


def test_confusion_f1_degenerate_no_positive_preds(spark):
    from gemproc2caom2_spark.operators.classifier import confusion_f1

    df = spark.createDataFrame(
        [(True, False), (False, False)], ["keep", "model_keep"]
    )
    r = confusion_f1(df).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 1, 1)
    # precision undefined (no predicted positives) => null, not crash
    assert r["precision_r6"] is None and r["f1_r6"] is None
    assert r["recall_r6"] == 0.0
