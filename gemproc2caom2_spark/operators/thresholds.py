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

from pyspark.sql import Column, DataFrame
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
