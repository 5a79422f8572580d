"""Backward as-of join — the point-in-time lookup Spark's DataFrame
API lacks as a primitive (named exactly so in time-series engines;
DuckDB ships it as ``ASOF JOIN``).

For each probe row (key, probe_ts) find the most recent right-side row
with the same key and ``event_ts <= probe_ts``. The curation analog of
the reference's "state as of the last committed run" lookups
(todo/checkpoint diffing, /root/reference/gemProc2caom2/
composable.py:119-133): what was this url's/user's latest observation
at time T?

Implementation: NOT a range join (which Spark plans as a broadcast
nested loop — quadratic per key) but the union-window form:

1. union events (tagged 0) and probes (tagged 1) into one
   (key, ts, tag) stream,
2. one hash shuffle on key + per-key sort on (ts, tag),
3. running ``last(value, ignorenulls=True)`` over the growing frame
   (UNBOUNDED PRECEDING .. CURRENT ROW — an incremental running
   aggregate, constant state per partition, no full-partition buffer),
4. keep the probe rows: each now carries the latest event value at or
   before its timestamp (tag order puts an exactly-coincident event
   BEFORE the probe, giving inclusive <= semantics).

Cost: ONE shuffle of |events| + |probes| thin rows — the same shape at
any scale; skew follows the key distribution exactly like every other
keyed window here (hot keys pre-split by the caller if needed).

Tie caveat: two right-side rows with identical (key, event_ts) make
"the most recent" ambiguous; pass a ``tiebreak_col`` (e.g. event id)
to pin the winner deterministically — the same convention as
latest_crawl_wins (operators/crawl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    probes: DataFrame,
    events: DataFrame,
    key_col: str,
    probe_ts_col: str,
    event_ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Return one row per probe row: (key_col, probe_ts_col,
    *value_cols) where the values come from the latest event at or
    before the probe time (nulls when no prior event exists).
    ``probes`` needs only (key_col, probe_ts_col); join any probe
    payload back on that pair afterwards.

    ``tolerance_seconds`` bounds staleness: a match older than the
    tolerance is nulled out (kdb's ``wj`` window bound / pandas
    ``merge_asof(tolerance=...)`` semantics) — "the latest reading,
    but only if it is recent enough to still be meaningful". The
    comparison runs on exact microsecond arithmetic so an external
    INTERVAL-based verifier agrees at the boundary (<= inclusive)."""
    order = [F.col("_ts").asc(), F.col("_tag").asc()]
    ev = events.select(
        F.col(key_col),
        F.col(event_ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c) for c in value_cols],
    )
    if tiebreak_col is not None:
        ev = ev.withColumn("_tb", F.col(tiebreak_col))
        order.append(F.col("_tb").asc_nulls_first())
    pr = probes.select(
        F.col(key_col),
        F.col(probe_ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(events.schema[c].dataType).alias(c) for c in value_cols],
    )
    if tiebreak_col is not None:
        pr = pr.withColumn("_tb", F.lit(None).cast(ev.schema["_tb"].dataType))
    unioned = ev.unionByName(pr)
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    extra = []
    if tolerance_seconds is not None:
        extra = [
            F.last(
                F.when(F.col("_tag") == 0, F.col("_ts")), ignorenulls=True
            ).over(w).alias("_matched_ts")
        ]
    filled = unioned.select(key_col, "_ts", "_tag", *fill_cols, *extra)
    out = filled.where(F.col("_tag") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(F.col("_matched_ts"))
        ) <= int(tolerance_seconds) * 1_000_000
        out = out.select(
            key_col,
            "_ts",
            "_tag",
            *[
                F.when(fresh, F.col(c)).alias(c) for c in value_cols
            ],
        )
    return out.select(
        key_col,
        F.col("_ts").alias(probe_ts_col),
        *value_cols,
    )


def range_join_time_buckets(
    events: DataFrame,
    intervals: DataFrame,
    event_ts_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Interval containment join (event_ts in [start, end)) in the
    bucketized form — the second time-join primitive Spark lacks: a
    naive ``events JOIN intervals ON ts >= start AND ts < end`` has no
    equi-key, so Catalyst plans BroadcastNestedLoopJoin — |events| x
    |intervals| comparisons, a cartesian at scale.

    Form: each interval explodes to the hour buckets it covers, each
    event maps to its hour bucket, and the join becomes a hash
    equi-join on the bucket followed by the exact containment filter.
    Cost: |intervals| x avg_hours_covered exploded rows (tiny for
    bounded windows) + one hash join on a well-distributed time key —
    survives 10^12 events x 10^5 windows where the nested loop dies.
    Bucket granularity trades explode width against join selectivity;
    hours fit maintenance/incident windows.

    Returns the joined frame (all event + interval columns) for the
    caller to aggregate.
    """
    b_start = F.date_trunc("hour", F.col(start_col))
    b_end = F.date_trunc("hour", F.col(end_col))
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(b_start, b_end, F.expr("interval 1 hour")))
    )
    ev = events.withColumn("_b", F.date_trunc("hour", F.col(event_ts_col)))
    return (
        ev.join(iv, on="_b")
        .where(
            (F.col(event_ts_col) >= F.col(start_col))
            & (F.col(event_ts_col) < F.col(end_col))
        )
        .drop("_b")
    )
