"""Input-source abstraction — the pluggable data-source analog.

The reference swaps its work source without touching the stage chain:
todo-file list (composable.py:100-120), local-directory glob
(config.yml:17-20), or a remote VOSpace directory listing
(`VaultListDirDataSource`, composable.py:149). The Spark analog is one
reader facade over the same input schema:

- ``read_table``   — parquet directory/glob on any Hadoop-supported
                     scheme (file://, hdfs://, s3a://): the S2/S3 scan.
                     Column pruning + predicate pushdown come free.
- ``read_todo``    — an explicit work list of file paths (todo.txt
                     analog, one path per line): only the listed files
                     are scanned, the rest of the table is never read.
- ``stream_table`` — the same directory as an incremental stream
                     (streaming/incremental.stream_source wraps this).

All return the exact input schema (url, warc_ts, html, text, lang) so
every downstream stage is source-agnostic, like the reference's
unchanged visitor list across gem_proc_run / gem_proc_run_vos
(composable.py:134-159).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gemproc2caom2_spark.sources.datagen import INPUT_SCHEMA


def read_table(spark: SparkSession, path: str, *, glob: str | None = None) -> DataFrame:
    """Batch scan of an input-schema parquet table at ``path`` (any
    Hadoop scheme). ``glob`` filters file names (e.g. 'part-2025*')
    without listing-side driver code — partition/file pruning stays in
    the data source."""
    reader = spark.read.schema(INPUT_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.option("recursiveFileLookup", "true").parquet(path)


def read_todo(spark: SparkSession, todo_paths: list[str]) -> DataFrame:
    """Scan exactly the listed parquet files (the todo.txt contract:
    the work list IS the source; nothing else is read)."""
    if not todo_paths:
        return spark.createDataFrame([], schema=INPUT_SCHEMA)
    return spark.read.schema(INPUT_SCHEMA).parquet(*todo_paths)


def read_todo_file(spark: SparkSession, todo_file: str) -> DataFrame:
    """todo.txt analog: one parquet path per line, '#' comments allowed
    (/root/reference/gemProc2caom2/tests/data/todo.txt:1). The file is
    read through the Hadoop FS API, so it can live next to the data on
    any scheme."""
    from gemproc2caom2_spark.plans.checkpoint import _fs_read_lines

    paths = [
        line.strip()
        for line in _fs_read_lines(spark, todo_file)
        if line.strip() and not line.strip().startswith("#")
    ]
    return read_todo(spark, paths)


def stream_table(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """The same table as an incremental stream (run_by_state analog)."""
    return (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
