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


def test_first_occurrence_hot_key(spark, tmp_path):
    """A key that floods one micro-batch (thousands of rows) must fold
    to its earliest row WITHOUT materializing the whole group: the
    operator iterates Arrow chunks keeping one running-min row. Arrow
    batches are forced tiny so the iterator really yields many chunks,
    and the row whose timestamp is the global min is buried mid-stream."""
    from gemproc2caom2_spark.streaming.stateful import first_occurrence_stream

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    n = 5000
    base = pd.Timestamp("2025-01-01")
    ts = [base + pd.Timedelta(hours=(i * 2654435761) % n + 1) for i in range(n)]
    ts[3271] = base  # the winner, buried deep in the group
    hot = pd.DataFrame(
        {
            "url": ["https://hot.example/page"] * n,
            "warc_ts": ts,
            "html": [None] * n,
            "text": [f"row {i}" for i in range(n)],
            "lang": ["en"] * n,
        }
    )
    spark.createDataFrame(hot, schema=INPUT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        src = (
            spark.readStream.schema(INPUT_SCHEMA)
            .parquet(input_dir)
            .withColumn("url_hash", F.xxhash64("url"))
        )
        q = (
            first_occurrence_stream(src, key_col="url_hash")
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("hot_key")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    rows = spark.sql("SELECT url, warc_ts, text FROM hot_key").collect()
    assert len(rows) == 1
    assert rows[0].warc_ts == base and rows[0].text == "row 3271"


def test_near_dup_stream_cross_batch(spark, tmp_path):
    """Streaming LSH near-dup suppression: a near-duplicate (not
    exact-key) arriving in a LATER micro-batch is flagged against the
    band-bucket state of earlier batches; within one batch the smaller
    url_hash of a near-dup pair survives; distinct docs pass."""
    from gemproc2caom2_spark.operators.dedup import (
        band_keys_expr,
        with_minhash_signature,
    )
    from gemproc2caom2_spark.streaming.stateful import (
        fold_bucket_verdicts,
        near_dup_stream,
    )

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    t_a = ("the quick brown fox jumps over the lazy dog while rain falls "
           "softly on the quiet village roofs at dusk every single evening")
    t_a_near = t_a.replace("quick", "swift")
    t_b = ("completely different content about distributed query engines "
           "columnar storage formats and adaptive shuffle partitioning "
           "strategies for large analytical workloads in production")
    t_d = ("a third unrelated document describing coastal erosion patterns "
           "measured across twenty years of satellite imagery and tide "
           "gauge records collected by regional observatories")
    t_d_near = t_d.replace("third", "fourth")

    def write_batch(rows):
        pdf = pd.DataFrame(
            {
                "url": [r[0] for r in rows],
                "warc_ts": [pd.Timestamp("2025-01-01")] * len(rows),
                "html": [None] * len(rows),
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
            }
        )
        spark.createDataFrame(pdf, schema=INPUT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    write_batch([("https://x/a", t_a), ("https://x/b", t_b)])
    write_batch(
        [
            ("https://x/c", t_a_near),  # cross-batch near-dup of a
            ("https://x/d", t_d),
            ("https://x/e", t_d_near),  # within-batch near-dup pair with d
            ("https://x/f", None),      # no signature: passthrough, kept
        ]
    )

    src = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .withColumn("url_hash", F.xxhash64("url"))
    )
    src = with_minhash_signature(src, text_col="text", out_col="minhash_sig")
    src = src.withColumn(
        "lsh_bands", band_keys_expr("minhash_sig", bands=16, rows_per_band=8)
    ).drop("minhash_sig", "html")

    verdicts: dict[str, bool] = {}

    def sink(batch_df, batch_id):
        for r in fold_bucket_verdicts(batch_df).collect():
            verdicts[r.url] = bool(r.is_duplicate)

    q = (
        near_dup_stream(src)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert verdicts["https://x/a"] is False
    assert verdicts["https://x/b"] is False
    assert verdicts["https://x/c"] is True, "cross-batch near-dup must drop"
    # within-batch pair: exactly the larger-hashed of d/e is flagged
    assert verdicts["https://x/d"] != verdicts["https://x/e"]
    # a doc with no signature (null bands) must pass through, not vanish
    assert verdicts["https://x/f"] is False


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


def test_first_occurrence_string_order_col(spark, tmp_path):
    """order_col folding must work for ANY orderable dtype — strings
    arrive as object dtype after Arrow conversion (nsmallest would
    raise); earliest-by-string wins, nulls lose to any value."""
    from gemproc2caom2_spark.streaming.stateful import first_occurrence_stream

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    pdf = pd.DataFrame(
        {
            "url": ["https://x/k"] * 4 + ["https://x/m"],
            "warc_ts": [pd.Timestamp("2025-01-01")] * 5,
            "html": [None] * 5,
            "text": ["delta", None, "alpha", "beta", "only"],
            "lang": ["en"] * 5,
        }
    )
    spark.createDataFrame(pdf, schema=INPUT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    src = (
        spark.readStream.schema(INPUT_SCHEMA)
        .parquet(input_dir)
        .withColumn("url_hash", F.xxhash64("url"))
    )
    q = (
        first_occurrence_stream(src, key_col="url_hash", order_col="text")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("str_order")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.url: r.text for r in spark.sql("SELECT url, text FROM str_order").collect()}
    assert rows == {"https://x/k": "alpha", "https://x/m": "only"}


def test_near_dup_stream_hot_bucket(spark, tmp_path):
    """A boilerplate storm: thousands of docs sharing ONE bucket inside
    one micro-batch. The first-seen fold must keep exactly the min
    url_hash and flag the rest, while holding only min-ties in memory
    (Arrow chunks forced tiny so the iterator really yields many)."""
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    from gemproc2caom2_spark.streaming.stateful import (
        fold_bucket_verdicts,
        near_dup_stream,
    )

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    n = 3000
    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("url_hash", LongType()),
            StructField("lsh_bands", ArrayType(LongType())),
        ]
    )
    pdf = pd.DataFrame(
        {
            "url": [f"https://storm.example/p{i}" for i in range(n)],
            # deterministic scramble; min buried mid-stream
            "url_hash": [((i * 2654435761) % 1_000_003) + 10 for i in range(n)],
            "lsh_bands": [[42] for _ in range(n)],
        }
    )
    winner = pdf.loc[pdf.url_hash.idxmin(), "url"]
    spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)

    verdicts: dict[str, bool] = {}

    def sink(batch_df, batch_id):
        for r in fold_bucket_verdicts(batch_df).collect():
            verdicts[r.url] = bool(r.is_duplicate)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        src = spark.readStream.schema(schema).parquet(input_dir)
        q = (
            near_dup_stream(src)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    assert len(verdicts) == n
    assert verdicts[winner] is False
    assert sum(1 for v in verdicts.values() if not v) == 1
