"""Adaptive per-group quantile thresholds — the CCNet/Gopher pattern
of cutting on a score's PERCENTILE within each language rather than on
a fixed constant (a fixed perplexity cut tuned for English drops most
of every lower-resource language; the quantile self-calibrates).

Reference analog: the 2-level decision tables that pick a rule by
group (F3, /root/reference/gemProc2caom2/main_app.py:205-219) — here
the per-group rule VALUE is learned from the data distribution itself.

Engine notes:

- ``F.percentile`` is Spark's EXACT interpolated percentile — the same
  ``lower + (higher - lower) * frac`` definition as DuckDB's
  ``quantile_cont`` and NumPy's default quantile, so thresholds agree
  bit-for-bit across engines (probed: ulp-level values like
  20.700000000000003 match exactly).
- Scale shape: exact percentile aggregates a value->count map, so
  executor memory is bounded by DISTINCT score values per group — safe
  for integral scores (word counts, byte lengths) at any corpus size,
  NOT for a continuous double at 10^12 rows. For continuous scores
  either discretize first (round perplexity to 0.1 — distinct values
  then bound the map) or pass ``accuracy`` to switch to
  ``percentile_approx`` (t-digest, fixed memory; no longer
  SQL-oracle-exact, so oracle-checked queries use the exact path on
  integral scores).
- The thresholds table is |groups| rows — a broadcast dimension joined
  back map-side; no second corpus shuffle beyond the one percentile
  aggregation (map-side partial on the value->count maps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    score_col: str,
    group_col: str = "lang",
    qs: tuple[float, ...] = (0.1,),
    accuracy: int | None = None,
) -> DataFrame:
    """(group, q1, q2, ...) — one row per group, one column ``q{i}``
    per requested quantile. Exact interpolated percentile by default
    (cross-engine bit-identical); ``accuracy`` switches to the t-digest
    approximation for continuous scores at scale."""
    score = F.col(score_col)

    def agg(q: float, i: int) -> Column:
        if accuracy is not None:
            return F.percentile_approx(score, F.lit(q), F.lit(accuracy)).alias(
                f"q{i}"
            )
        return F.percentile(score, F.lit(q)).alias(f"q{i}")

    return df.groupBy(group_col).agg(*[agg(q, i) for i, q in enumerate(qs)])


def filter_by_group_quantile(
    df: DataFrame,
    score_col: str,
    group_col: str = "lang",
    q: float = 0.1,
    keep_col: str = "keep",
    thr_col: str = "threshold",
    accuracy: int | None = None,
) -> DataFrame:
    """Mark rows whose score clears their group's q-th percentile:
    ``keep = score >= P_q(group)``. Adds the (rounded) threshold column
    for lineage — the audit row a V4-style drop rule wants. Null scores
    are kept=false with a null threshold untouched groups-wise."""
    thr = group_quantiles(df, score_col, group_col, (q,), accuracy)
    thr = thr.select(group_col, F.round(F.col("q0"), 6).alias(thr_col))
    out = df.join(F.broadcast(thr), on=group_col, how="left")
    return out.withColumn(
        keep_col,
        F.coalesce(F.col(score_col) >= F.col(thr_col), F.lit(False)),
    )


def group_quantile_buckets(
    df: DataFrame,
    score_col: str,
    group_col: str = "lang",
    bounds: tuple[float, float] = (1.0 / 3, 2.0 / 3),
    bucket_col: str = "bucket",
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style head/middle/tail assignment: per group, scores below
    the first bound's percentile are ``head``, between the bounds
    ``middle``, above ``tail`` (CCNet orders by perplexity ascending —
    lower is better — so 'head' is the best tercile; plug any score
    with the same convention). Boundary rule: a score EQUAL to a
    boundary percentile falls in the lower bucket (<=), fixed here so
    engines can't disagree. Null scores get a null bucket."""
    thr = group_quantiles(df, score_col, group_col, bounds)
    thr = thr.select(
        group_col,
        F.round(F.col("q0"), 6).alias("_b0"),
        F.round(F.col("q1"), 6).alias("_b1"),
    )
    score = F.col(score_col)
    out = df.join(F.broadcast(thr), on=group_col, how="left")
    return out.withColumn(
        bucket_col,
        F.when(score.isNull(), F.lit(None).cast("string"))
        .when(score <= F.col("_b0"), F.lit(labels[0]))
        .when(score <= F.col("_b1"), F.lit(labels[1]))
        .otherwise(F.lit(labels[2])),
    ).drop("_b0", "_b1")


def distribution_shift(
    df: DataFrame,
    bucket_col: str,
    cohort_col: str,
    base_cohort,
    test_cohort,
) -> DataFrame:
    """Per-bucket distribution-drift terms between two cohorts of the
    corpus — the population-stability monitor a continuously-ingesting
    curation pipeline runs per crawl batch (is this week's crawl
    length/quality distribution the one the thresholds were calibrated
    on?). Reference analog: the cardinality/consistency guards that
    compare observed metadata against expected shape (V10/V6,
    /root/reference/gemProc2caom2/main_app.py:236-247).

    Output: one row per bucket value present in either cohort —
    ``n_base``/``n_test`` counts, ``p_r6``/``q_r6`` (cohort-relative
    frequencies) and ``psi_term_r6`` = (p - q) * ln(p / q) with the
    standard epsilon floor (1e-6) so empty cells stay finite. The
    total PSI is the SUM of the terms; emitting per-bucket terms
    instead of the folded scalar keeps every value a deterministic
    per-row expression (no cross-row float accumulation whose ordering
    an external verifier cannot replicate) and tells the operator
    WHICH buckets drifted, which is what the alert needs anyway.

    Scale shape: one map-side-combined groupBy over (bucket, cohort)
    — the result is |buckets| rows, a broadcast-sized frame; totals
    come from a window over that tiny frame, not a second corpus scan.
    """
    c = F.col(cohort_col)
    counts = (
        df.where(c.isin([base_cohort, test_cohort]))
        .groupBy(bucket_col)
        .agg(
            F.sum((c == base_cohort).cast("long")).alias("n_base"),
            F.sum((c == test_cohort).cast("long")).alias("n_test"),
        )
    )
    tot = Window.partitionBy()
    eps = 1e-6
    p = F.greatest(F.col("n_base") / F.sum("n_base").over(tot), F.lit(eps))
    q = F.greatest(F.col("n_test") / F.sum("n_test").over(tot), F.lit(eps))
    return counts.select(
        bucket_col,
        "n_base",
        "n_test",
        F.round(p, 6).alias("p_r6"),
        F.round(q, 6).alias("q_r6"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term_r6"),
    )
