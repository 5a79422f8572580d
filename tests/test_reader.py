"""Source-abstraction tests (S2/S3: directory scan, todo-file list,
glob filter) — the pluggable-work-source contract."""

from __future__ import annotations

import os

from gemproc2caom2_spark.sources.datagen import write_corpus_parquet
from gemproc2caom2_spark.sources.reader import (
    read_table,
    read_todo,
    read_todo_file,
)


def test_read_table_and_glob(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_corpus_parquet(path, 30, n_files=3)
    assert read_table(spark, path).count() == 30
    only_first = read_table(spark, path, glob="part-00000*")
    assert 0 < only_first.count() < 30


def test_read_todo_list_and_file(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_corpus_parquet(path, 30, n_files=3)
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    two = read_todo(spark, files[:2])
    assert 0 < two.count() < 30
    assert read_todo(spark, []).count() == 0

    todo = tmp_path / "todo.txt"
    todo.write_text(f"# work list\n{files[0]}\n\n{files[1]}\n")
    from_file = read_todo_file(spark, str(todo))
    assert from_file.count() == two.count()

    # schema is the input contract regardless of source
    assert [f.name for f in from_file.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]
