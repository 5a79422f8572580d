"""Streaming-mode tests: AvailableNow incremental processing with
checkpoint resume, and the watermarked windowed rollup (memory sink).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gemproc2caom2_spark.sources.datagen import generate_pandas, INPUT_SCHEMA
from gemproc2caom2_spark.streaming.incremental import (
    run_available_now,
    stream_source,
    windowed_quality_stream,
)


def _write_batch(spark, pdf, path: str) -> None:
    spark.createDataFrame(pdf.drop(columns=["category"]), schema=INPUT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(path)


def test_available_now_incremental(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, generate_pandas(30, seed=42), input_dir)
    run_available_now(spark, input_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 30

    # second invocation with NO new files: checkpoint makes it a no-op
    run_available_now(spark, input_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 30

    # new file arrives -> only it is processed (state.yml semantics)
    _write_batch(spark, generate_pandas(15, seed=43, offset=1000), input_dir)
    run_available_now(spark, input_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    assert out.count() == 45
    assert out.select("url").distinct().count() == 45


def test_first_occurrence_stream(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): a url seen in
    ANY earlier micro-batch — or earlier in the same batch — is dropped;
    state survives across batches via the streaming checkpoint."""
    from gemproc2caom2_spark.streaming.stateful import first_occurrence_stream

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: docs 0-14; batch 2: re-captures of 0-4 (later ts) + new 100-104
    b1 = generate_pandas(15, seed=42)
    b2 = pd.concat(
        [generate_pandas(5, seed=42), generate_pandas(5, seed=44, offset=100)],
        ignore_index=True,
    )
    b2["warc_ts"] = b2["warc_ts"] + pd.Timedelta(days=2)
    _write_batch(spark, b1, input_dir)
    _write_batch(spark, b2, input_dir)

    src = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(input_dir)
        .withColumn("url_hash", F.xxhash64("url"))
    )
    deduped = first_occurrence_stream(src, key_col="url_hash")
    q = (
        deduped.writeStream.outputMode("update")
        .format("memory")
        .queryName("first_occ")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT url, warc_ts FROM first_occ").collect()
    urls = [r.url for r in rows]
    assert len(urls) == len(set(urls)) == 20  # 15 + 5 new, 5 recaptures dropped
    # the kept capture of a recaptured url is the EARLIEST (batch-1) one
    by_url = {r.url: r.warc_ts for r in rows}
    for r in spark.createDataFrame(
        b1.drop(columns=["category"]), schema=INPUT_SCHEMA
    ).collect():
        assert by_url[r.url] == r.warc_ts, r.url


def test_windowed_quality_stream(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    _write_batch(spark, generate_pandas(45, seed=42), input_dir)

    agg = windowed_quality_stream(stream_source(spark, input_dir), window="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("quality_rollup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT verdict, sum(n_docs) AS n FROM quality_rollup GROUP BY verdict"
    ).collect()
    by_verdict = {r.verdict: r.n for r in rows}
    # 45 docs = 3 per category; row-local verdict buckets must appear
    assert sum(by_verdict.values()) == 45
    for expected in ("keep", "min_length", "max_length", "langid", "empty"):
        assert expected in by_verdict, by_verdict
