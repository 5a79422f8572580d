"""Adaptive quantile thresholds: exactness vs numpy, null handling,
and the approx path for continuous scores."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gemproc2caom2_spark.operators.thresholds import (
    filter_by_group_quantile,
    group_quantile_buckets,
    group_quantiles,
)


@pytest.fixture(scope="module")
def scored(spark):
    rows = [("en", i, float(i)) for i in range(1, 101)] + [
        ("de", 100 + i, float(10 * i)) for i in range(1, 11)
    ] + [("en", 999, None)]
    return spark.createDataFrame(rows, "lang string, doc_id long, score double")


def test_group_quantiles_match_numpy_linear(spark, scored):
    got = {
        r.lang: r.q0
        for r in group_quantiles(scored, "score", "lang", (0.1,)).collect()
    }
    en = np.quantile(np.arange(1.0, 101.0), 0.1)  # numpy default = linear
    de = np.quantile(np.arange(10.0, 101.0, 10.0), 0.1)
    assert got["en"] == en
    assert got["de"] == de


def test_filter_marks_bottom_decile_and_null(spark, scored):
    out = filter_by_group_quantile(scored, "score", "lang", q=0.1)
    dropped = {r.doc_id for r in out.where(~F.col("keep")).collect()}
    # en P10 = 10.9 -> scores 1..10 dropped; null score dropped
    assert {1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 999} <= dropped
    assert 11 not in dropped
    # threshold column rides along for lineage
    thr = out.where(F.col("lang") == "en").select("threshold").first()[0]
    assert thr == pytest.approx(10.9)


def test_buckets_tercile_assignment_and_boundary(spark, scored):
    out = group_quantile_buckets(scored, "score", "lang")
    en = {r.doc_id: r.bucket for r in out.where(F.col("lang") == "en").collect()}
    assert en[1] == "head" and en[50] == "middle" and en[100] == "tail"
    assert en[999] is None  # null score -> null bucket
    counts = {
        b: sum(1 for v in en.values() if v == b)
        for b in ("head", "middle", "tail")
    }
    # terciles of 100 non-null scores split 34/33/33 under the <= rule
    assert sum(counts.values()) == 100
    assert max(counts.values()) - min(counts.values()) <= 1


def test_approx_path_close_to_exact(spark, scored):
    exact = {
        r.lang: r.q0
        for r in group_quantiles(scored, "score", "lang", (0.5,)).collect()
    }
    approx = {
        r.lang: r.q0
        for r in group_quantiles(
            scored, "score", "lang", (0.5,), accuracy=10000
        ).collect()
    }
    # percentile_approx returns a real order statistic (no interpolation),
    # so the worst case is one inter-value gap (10 for the de series)
    for lang in exact:
        assert abs(approx[lang] - exact[lang]) <= 10.0


def test_distribution_shift_psi_terms(spark):
    from gemproc2caom2_spark.operators.thresholds import distribution_shift

    # base: 8 docs in bucket 1, 2 in bucket 2; test: 5 and 5 => drift
    rows = (
        [("a", 1)] * 8 + [("a", 2)] * 2 + [("b", 1)] * 5 + [("b", 2)] * 5
    )
    df = spark.createDataFrame(rows, ["cohort", "bucket"])
    out = {
        r["bucket"]: r
        for r in distribution_shift(
            df, bucket_col="bucket", cohort_col="cohort",
            base_cohort="a", test_cohort="b",
        ).collect()
    }
    b1, b2 = out[1], out[2]
    assert (b1["n_base"], b1["n_test"]) == (8, 5)
    assert b1["p_r6"] == 0.8 and b1["q_r6"] == 0.5
    # (0.8-0.5)*ln(0.8/0.5) = 0.141001 ; (0.2-0.5)*ln(0.2/0.5) = 0.274887
    assert abs(b1["psi_term_r6"] - 0.141001) < 1e-6
    assert abs(b2["psi_term_r6"] - 0.274887) < 1e-6
    # identical cohorts => zero drift terms
    same = distribution_shift(
        spark.createDataFrame(
            [("a", 1)] * 3 + [("b", 1)] * 3, ["cohort", "bucket"]
        ),
        bucket_col="bucket", cohort_col="cohort",
        base_cohort="a", test_cohort="b",
    ).collect()
    assert all(r["psi_term_r6"] == 0.0 for r in same)
