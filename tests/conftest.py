"""Shared SparkSession fixture — local mode, pinned UTC, Arrow on.

Mirrors the reference's SCRAPE test mode: local inputs, no external
services (/root/reference/config/config.yml:76,
tests/test_main_app.py:146-186).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def spark():
    from gemproc2caom2_spark.session import build_session

    s = build_session(
        app_name="gemproc2caom2_spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    import os
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
