"""Checkpoint/resume protocol tests (the ledger semantics,
/root/reference/config/config.yml:15,30-45,58-67): resume skips
committed work, a crashed run is invisible and retried, empty inputs
are no-ops, audit rows land with the commit."""

from __future__ import annotations

import os

from gemproc2caom2_spark.plans.checkpoint import (
    committed_results,
    committed_run_ids,
    run_incremental,
)
from gemproc2caom2_spark.sources.datagen import generate_corpus


def test_resume_crash_retry(spark, tmp_path):
    out = str(tmp_path / "o")
    corpus = generate_corpus(spark, 45)

    rid, n = run_incremental(spark, corpus, out, run_id="r1", num_partitions=8)
    assert (rid, n) == ("r1", 45)
    assert committed_run_ids(out) == ["r1"]

    # resume: nothing new
    _, n2 = run_incremental(spark, corpus, out, run_id="r2")
    assert n2 == 0

    # incremental growth: only the delta runs
    bigger = generate_corpus(spark, 60)
    _, n3 = run_incremental(spark, bigger, out, run_id="r3", num_partitions=8)
    assert n3 == 15

    # crash simulation: commit marker removed -> run invisible + retried
    os.remove(os.path.join(out, "runs", "r3", "_COMMITTED"))
    assert committed_run_ids(out) == ["r1", "r2"]  # empty r2 still committed
    assert committed_results(spark, out).count() == 45
    _, n4 = run_incremental(spark, bigger, out, run_id="r4", num_partitions=8)
    assert n4 == 15
    assert committed_results(spark, out).count() == 60

    # audit rows committed alongside results
    audit = spark.read.parquet(os.path.join(out, "runs", "r1", "audit"))
    rows = audit.collect()
    assert all(r.run_id == "r1" for r in rows)
    stages = {r.stage for r in rows}
    assert "curate" in stages          # per-partition metrics
    assert any(s not in (None, "curate") for s in stages)  # drop-reason rollup


def test_empty_input(spark, tmp_path):
    out = str(tmp_path / "o")
    corpus = generate_corpus(spark, 15).limit(0)
    _, n = run_incremental(spark, corpus, out, run_id="r0")
    assert n == 0
    assert committed_run_ids(out) == ["r0"]
