"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship curation DAG over sf0.001 documents.
queries()    — one entry per implemented operator family (SURVEY.md §2
               + training-data ops), from gemproc2caom2_spark.plans.
oracle_sql() — DuckDB-equivalent SQL for EVERY query. Non-SQL-derivable
               kernels (Arrow perplexity, fake media codecs, the LSH
               duplicate set) are pinned by fixture parquets the SQL
               joins (tests/gen_fixtures.py regenerates them).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# importing these modules populates the shared registry
from gemproc2caom2_spark.plans import queries as _q  # noqa: E402
from gemproc2caom2_spark.plans import queries_text as _qt  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _qt.cur1_flagship_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracles()
